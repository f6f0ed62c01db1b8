package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextOps}
import graft.Tables

/** Text-analysis + dedup/similarity operator invariants on sf0.001. */
class TextSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("N1: dedup stats are internally consistent") {
    val df = TextOps.exactDedupStats(spark, sf0001)
    val bad = df.filter($"n_dupes" =!= $"n_docs" - $"n_distinct_texts").count()
    assert(bad == 0)
    assert(df.agg(sum("n_docs")).first().getLong(0) ==
      Tables(spark, sf0001, "documents").count())
  }

  test("N4: token stats are positive and k-limited") {
    val rows = TextOps.tokenStats(spark, sf0001).collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getAs[Long]("n"))
    assert(counts.sameElements(counts.sorted.reverse))
  }

  test("N4: quality ratios within [0,1], labels from the closed set") {
    val df = TextOps.docQuality(spark, sf0001)
    assert(df.filter($"stop_ratio" < 0 || $"stop_ratio" > 1).count() == 0)
    val labels = df.select("quality").distinct().as[String].collect().toSet
    assert(labels.subsetOf(Set("good", "fair", "poor")))
  }

  test("N4: quality funnel partitions every source exactly") {
    val rows = TextOps.qualityFunnel(spark, sf0001).collect()
    rows.foreach { r =>
      val parts = Seq("fail_len", "fail_wordlen", "fail_symbol", "fail_stop",
        "n_keep").map(r.getAs[Long](_)).sum
      assert(parts == r.getAs[Long]("n_raw"),
        s"funnel stages don't partition source ${r.getAs[String]("source")}")
    }
    assert(rows.map(_.getAs[Long]("n_raw")).sum ==
      Tables(spark, sf0001, "documents").count())
  }

  test("N4: language-id confusion matrix covers every doc") {
    val n = TextOps.languageId(spark, sf0001)
      .agg(sum("n_docs")).first().getLong(0)
    assert(n == Tables(spark, sf0001, "documents").count())
  }

  test("simhash: 16-bit fingerprints, buckets partition the corpus") {
    val b = TextOps.simhashBuckets(spark, sf0001)
    assert(b.filter(length($"simhash16") =!= 16).count() == 0)
    assert(b.agg(sum("n_docs")).first().getLong(0) ==
      Tables(spark, sf0001, "documents").count())
  }

  test("simhash radius search: r2 pairs contain r1 pairs, distances honest") {
    def pairs(r: Int) = TextOps.simhashNeighbors(spark, sf0001, radius = r)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val r1 = pairs(1); val r2 = pairs(2)
    assert(r1.forall(_._3 <= 1) && r2.forall(_._3 <= 2))
    // widening the radius keeps every tighter pair (same distances)
    assert(r1.toSet.subsetOf(r2.toSet),
      s"r1 pairs missing from r2: ${(r1.toSet -- r2.toSet).take(3)}")
    // the widening is real on this corpus: some distance-2 pair exists
    assert(r2.exists(_._3 == 2), "r2 added no distance-2 pairs")
  }

  test("N2: per-doc gram-HASH sets are collision-free on this corpus") {
    // the verify stage computes n_inter/jaccard over xxhash64 gram-hash
    // SETS; a 64-bit collision (P ≈ 5e-8) would silently shift n_inter
    // vs the string-hashing-free oracle (r5 advice). Guard: the hash-set
    // cardinality must equal the exact distinct-gram count per doc.
    import org.apache.spark.sql.functions._
    val grams = Similarity.shinglesOf(spark,
      Tables(spark, sf0001, "documents").select($"doc_id", $"text"))
    val bad = grams
      .groupBy($"doc_id")
      .agg(countDistinct($"s").as("n_exact"),
        size(collect_set(xxhash64($"s"))).cast("long").as("n_hashed"))
      .filter($"n_exact" =!= $"n_hashed")
    assert(bad.count() == 0,
      s"xxhash64 gram collision on docs: ${bad.take(3).mkString(", ")}")
  }

  test("N2: neardup pairs have valid jaccard and ordered ids") {
    val df = Similarity.neardupPairs(spark, sf0001)
    assert(df.filter($"doc_a" >= $"doc_b").count() == 0)
    assert(df.filter($"jaccard" <= 0 || $"jaccard" > 1).count() == 0)
  }

  test("N3: cosine self-similarity is 1, topk is ordered") {
    // query vec vs itself through the same code path: vec 0 excluded by
    // the operator, so check ordering + bounds instead
    val rows = Similarity.cosineTopk(spark, sf0001, k = 5).collect()
    assert(rows.length == 5)
    val sims = rows.map(_.getAs[Double]("cosine_sim"))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("N5: multimodal join carries both modalities") {
    val df = Similarity.multimodalJoin(spark, sf0001)
    assert(df.count() > 0)
    assert(df.filter($"emb_dim" =!= 64).count() == 0)
    assert(df.filter($"emb_norm" <= 0).count() == 0)
  }

  test("N2+: degree histogram accounts for every document and every edge") {
    val hist = Similarity.neardupDegree(spark, sf0001).collect()
    val totalDocs = Tables(spark, sf0001, "documents").count()
    assert(hist.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    // sum(degree * n_docs) = 2|E| (each pair contributes to both ends)
    val edgeEndpoints = hist
      .map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_docs")).sum
    val nPairs = Similarity.neardupPairs(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.5).count()
    assert(edgeEndpoints == 2 * nPairs, s"$edgeEndpoints vs 2*$nPairs")
  }

  test("N2+: triangle census consistent with a brute-force recount") {
    val r = Similarity.neardupTriangles(spark, sf0001).collect()(0)
    val pairs = Similarity.neardupPairs(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.getAs[Long]("n_edges") == pairs.size)
    // brute-force triangle count over the (tiny) edge set
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    def edge(a: Long, b: Long) = pairs.contains((a min b, a max b))
    val adj = verts.map(v =>
      v -> verts.filter(u => u != v && edge(u, v))).toMap
    val triBrute = (for {
      x <- verts; y <- adj(x) if y > x; z <- adj(y) if z > y && edge(x, z)
    } yield 1).size
    assert(r.getAs[Long]("n_triangles") == triBrute,
      s"${r.getAs[Long]("n_triangles")} vs brute $triBrute")
    val t = r.getAs[Double]("transitivity")
    assert(t >= 0.0 && t <= 1.0)
  }

  test("N2: cluster labels are consistent with the pair graph") {
    val clusters = Similarity.neardupClusters(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    // every document is labeled, labels are component members
    val docs = Tables(spark, sf0001, "documents").select("doc_id")
      .as[Long].collect().toSet
    assert(clusters.keySet == docs)
    assert(clusters.forall { case (_, c) => clusters(c) == c }) // root labels itself
    // every thresholded edge's endpoints share a cluster
    val pairs = Similarity.neardupPairs(spark, sf0001)
      .filter($"jaccard" >= 0.5).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"edge ($a,$b) split across clusters")
    }
    // and there IS at least one non-trivial cluster in the testdata
    assert(clusters.exists { case (d, c) => d != c })
  }

  test("N3: PQ codes are a total encode; ADC top-k ranks the query's own cluster up") {
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val codes = Similarity.pqCodes(spark, sf0001)
    assert(codes.count() == n, "every vector must be encoded")
    val rows = codes.collect()
    // each code addresses the 16-entry subspace codebook
    rows.foreach { r =>
      (1 to 4).foreach { i =>
        val c = r.getLong(i)
        assert(c >= 0 && c < 16, s"code out of range: $r") } }
    // a codebook seed vector encodes to ITS OWN code in every subspace
    // (distance 0 is the unique minimum against itself)
    val seed3 = rows.find(_.getLong(0) == 3L).get
    assert((1 to 4).forall(i => seed3.getLong(i) == 3L),
      s"seed vector must self-encode: $seed3")
    val topk = Similarity.pqTopk(spark, sf0001).collect()
    assert(topk.length == 10)
    assert(topk.forall(_.getLong(0) != 0L), "query must not match itself")
    // ADC distances ascend
    val ds = topk.map(_.getDouble(1)).toSeq
    assert(ds == ds.sorted, "ADC ranking must ascend")
    // IVFADC = exhaustive ADC restricted to the query's coarse bucket:
    // its results must be a subset of the bucket and ascend too
    val ivfpq = Similarity.ivfPqTopk(spark, sf0001).collect()
    assert(ivfpq.nonEmpty && ivfpq.forall(_.getLong(0) != 0L))
    val ds2 = ivfpq.map(_.getDouble(1)).toSeq
    assert(ds2 == ds2.sorted)
    val bucket = Similarity.ivfAssign(spark, sf0001)
    val qCid = bucket.filter($"vec_id" === 0).select("cid").first().getLong(0)
    val inBucket = bucket.filter($"cid" === qCid)
      .select("vec_id").as[Long].collect().toSet
    assert(ivfpq.forall(r => inBucket(r.getLong(0))),
      "IVFADC returned a vector outside the query's coarse bucket")
    // recall diagnostic: both methods present; routing can only LOSE
    // candidates relative to the exhaustive ADC ranking's recall... not
    // strictly (set difference of top-k), so assert only well-formedness
    // NOTE: recall is NOT asserted monotone in nprobe — a wider probe
    // adds ADC-scored candidates whose quantization error can evict
    // true neighbors from the top-k (observed in the other direction:
    // bucket restriction IMPROVED recall by filtering false positives)
    val rec = Similarity.pqRecall(spark, sf0001).collect()
    assert(rec.map(_.getString(0)).toSeq ==
      Seq("adc_exhaustive", "adc_exhaustive_learned",
        "adc_exhaustive_learned2", "ivfadc", "ivfadc_learned",
        "ivfadc_probe2", "ivfadc_probe4"))
    rec.foreach { r =>
      assert(r.getLong(1) == 10L)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10L)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("N-mix: leakage-safe split never straddles a cluster; naive doc split does") {
    val audit = Similarity.splitLeakageAudit(spark, sf0001)
      .as[(String, Long, Long)].collect()
      .map { case (scheme, multi, leaky) => scheme -> ((multi, leaky)) }
      .toMap
    val (multiC, leakyC) = audit("by_cluster")
    val (multiD, leakyD) = audit("by_doc")
    assert(multiC == multiD, "both schemes see the same cluster structure")
    assert(multiC > 0, "testdata should contain multi-doc near-dup clusters")
    assert(leakyC == 0L,
      "cluster-keyed split leaked a cluster across splits — the guarantee broke")
    assert(leakyD > 0L,
      "doc-keyed split should leak on this corpus — audit is not discriminating")
    // stats consistency: every doc assigned exactly once, 3 splits max
    val stats = Similarity.splitStats(spark, sf0001)
      .as[(String, Long, Long)].collect()
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(stats.map(_._2).sum == nDocs, "split partitions the corpus")
    assert(stats.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("N2: connected components converge in O(log n) rounds on a chain") {
    // An adversarial CHAIN of 1000 vertices: diameter 999, so plain
    // min-label propagation needs ~999 rounds (round 2's 50-round guard
    // would fire). Pointer jumping must close it in ~2*log2(1000)+slack.
    val n = 1000
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val pairs = chain.toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    // the LOOP explicitly: the size gate would route a 2k-edge chain
    // to the driver-side union-find and never exercise pointer jumping
    val (labels, rounds) = Similarity.connectedComponentsLoop(edges)
    val got = labels.as[(Long, Long)].collect().toMap
    labels.unpersist()
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "one component, min label 0")
    assert(rounds <= 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 5,
      s"chain of $n vertices took $rounds rounds — pointer jumping broken?")
  }

  test("N2: size-gated local components ≡ the distributed loop") {
    val raw = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L),
      (10L, 11L), (3L, 11L))
    val pairs = raw.toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val (local, r0) = Similarity.connectedComponents(edges)
    assert(r0 == 0, "a 14-edge graph should take the local union-find path")
    val m0 = local.as[(Long, Long)].collect().toMap
    local.unpersist()
    val (looped, _) = Similarity.connectedComponentsLoop(edges)
    val m1 = looped.as[(Long, Long)].collect().toMap
    looped.unpersist()
    assert(m0 == m1, "local union-find and the loop disagree on labels")
  }

  test("N2: connected components are invariant to input partitioning") {
    val raw = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L), (10L, 11L))
    val pairs = raw.toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val (l1, _) = Similarity.connectedComponentsLoop(edges.repartition(1))
    val m1 = l1.as[(Long, Long)].collect().toMap
    l1.unpersist()
    val (l7, _) = Similarity.connectedComponentsLoop(edges.repartition(7))
    val m7 = l7.as[(Long, Long)].collect().toMap
    l7.unpersist()
    assert(m1 == m7, "labels depend on physical partitioning")
    assert(m1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      8L -> 8L, 9L -> 8L, 10L -> 8L, 11L -> 8L))
  }

  /** The loop pins its OWN parallelism with explicit repartitions —
    * it must be correct under ANY session shuffle setting and must
    * never write the session conf (the r3 set/restore pattern let a
    * concurrent query silently plan at 8). */
  test("N2: connected components ignore and never mutate session shuffle partitions") {
    val raw = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L), (10L, 11L))
    val pairs = raw.toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      8L -> 8L, 9L -> 8L, 10L -> 8L, 11L -> 8L)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (parts <- Seq("4", "8", "32")) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val (labels, _) = Similarity.connectedComponentsLoop(edges)
        val got = labels.as[(Long, Long)].collect().toMap
        labels.unpersist()
        assert(got == expect, s"wrong labels at session conf $parts")
        assert(spark.conf.get("spark.sql.shuffle.partitions") == parts,
          "connectedComponents mutated the session shuffle-partition conf")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("N2: connected components label several disjoint components correctly") {
    // two triangles + one isolated edge + self-contained pair ordering
    val raw = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (20L, 21L))
    val pairs = raw.toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val (labels, _) = Similarity.connectedComponents(edges)
    val got = labels.as[(Long, Long)].collect().toMap
    labels.unpersist()
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("N2: embedding clusters are consistent with the embedding pair graph") {
    val clusters = Similarity.embeddingClusters(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val vecs = Tables(spark, sf0001, "embeddings").select("vec_id")
      .as[Long].collect().toSet
    assert(clusters.keySet == vecs)
    assert(clusters.forall { case (_, c) => clusters(c) == c }) // root labels itself
    val pairs = Similarity.embeddingNeardup(spark, sf0001)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"edge ($a,$b) split across clusters")
    }
    if (pairs.nonEmpty) assert(clusters.exists { case (v, c) => v != c })
  }

  test("N3: batch ANN agrees with the single-query IVF path per query") {
    val batch = Similarity.cosineTopkBatch(spark, sf0001, nQueries = 8, k = 3)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
    // ranks are 1..k, scores descending within each query
    batch.foreach { case (qid, rows) =>
      val ranked = rows.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq == (1L to ranked.length))
      val sims = ranked.map(_.getAs[Double]("cosine_sim"))
      assert(sims.sameElements(sims.sorted.reverse), s"query $qid not descending")
    }
    // query 0's batch top-3 == the head of the dedicated nprobe=1 path
    val single = Similarity.cosineTopkIvf(spark, sf0001, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    val q0 = batch(0L).sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("vec_id")).toSeq
    assert(q0 == single, s"batch $q0 != single-query $single")
  }

  test("N3: multi-probe recall is monotone in nprobe") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").as[Long].collect().toSet
    val exact = ids(Similarity.cosineTopk(spark, sf0001))
    val p1 = ids(Similarity.cosineTopkIvfProbed(spark, sf0001, nprobe = 1))
    val p2 = ids(Similarity.cosineTopkIvfProbed(spark, sf0001, nprobe = 2))
    // nprobe=1 through the probed path ≡ the dedicated nprobe=1 operator
    assert(p1 == ids(Similarity.cosineTopkIvf(spark, sf0001)))
    // more probes can only improve agreement with the exact top-k
    assert((p2 intersect exact).size >= (p1 intersect exact).size)
  }

  test("N3: IVF bucket count scales as ceil(sqrt(N)) and stays balanced") {
    def bucketStats(dir: String): (Long, Long, Long, Double) = {
      val n = Tables(spark, dir, "embeddings").count()
      val sizes = Similarity.ivfAssign(spark, dir)
        .groupBy("cid").count().select("count").as[Long].collect()
      (n, sizes.length.toLong, sizes.max, n.toDouble / sizes.length)
    }
    val (n1, b1, max1, avg1) = bucketStats(sf0001)
    assert(b1 <= math.ceil(math.sqrt(n1.toDouble)).toLong)
    // bounded skew: no bucket more than 3x the mean population — the
    // property that keeps per-bucket pairwise work ~O(N·sqrt(N)) total
    assert(max1 <= (3 * avg1).ceil.toLong, s"skewed buckets: max=$max1 avg=$avg1")
    // and the bucket count GROWS with the corpus (the round-1 design
    // fixed nlist=8, which silently restores quadratic per-bucket work)
    val (n2, b2, max2, avg2) = bucketStats("/root/testdata/sf0.1")
    assert(n2 > n1 && b2 > b1, s"nlist must scale with N: ($n1,$b1) -> ($n2,$b2)")
    assert(max2 <= (3 * avg2).ceil.toLong, s"skewed buckets: max=$max2 avg=$avg2")
  }

  test("N2: char-shingle pairs are thresholded, ordered, and size-consistent") {
    val pairs = Similarity.neardupPairsChar(spark, sf0001)
    val rows = pairs.collect()
    assert(rows.nonEmpty, "char-shingle LSH found no near-dups in the corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0, s"jaccard out of band: $j")
      assert(r.getAs[Long]("n_inter") > 0)
    }
    // near-dups planted in the corpus are small EDITS of each other —
    // the char-gram view must recover the high-overlap core that the
    // word-gram view finds (both see heavy-overlap pairs; they diverge
    // only on tokenization-boundary edits)
    val word = Similarity.neardupPairs(spark, sf0001)
      .filter($"jaccard" >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val char = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(word.subsetOf(char),
      s"word-gram near-identical pairs missed by char-gram LSH: ${word -- char}")
  }

  test("N3: one Lloyd round — total assignment, bounded drift, moved centroids") {
    val n = Tables(spark, sf0001, "embeddings").count()
    val dim = Tables(spark, sf0001, "embeddings")
      .select(size($"embedding")).as[Int].first()
    // M-step output: at most nlist centroids, every one full-dimension
    val cent = Similarity.kmeansCentroids(spark, sf0001)
    assert(cent.count() <= math.ceil(math.sqrt(n.toDouble)).toLong)
    assert(cent.filter(size($"cv") =!= dim).count() == 0)
    // E-step round 2 is TOTAL: every vector gets exactly one label
    val assign = Similarity.kmeansAssign(spark, sf0001)
    assert(assign.count() == n)
    assert(assign.select("vec_id").distinct().count() == n)
    // drift is a cosine (|d| ≤ 1) and at least one centroid MOVED —
    // a drift column pinned at 1.0 would mean the Lloyd round was a
    // no-op and the "learned" boundary is just the seed boundary
    val drifts = Similarity.kmeansShift(spark, sf0001)
      .select("drift").as[Double].collect()
    assert(drifts.nonEmpty && drifts.forall(d => d >= -1.0 && d <= 1.0 + 1e-9))
    assert(drifts.exists(_ < 1.0), "no centroid moved in the Lloyd round")
    // query surface: k ordered in-bucket neighbors, self excluded
    val topk = Similarity.cosineTopkKmeans(spark, sf0001).collect()
    assert(topk.length == 10 && !topk.exists(_.getAs[Long]("vec_id") == 0L))
    val sims = topk.map(_.getAs[Double]("cosine_sim"))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("phrase_search ≡ driver-side sliding-window recount") {
    val rows = TextOps.phraseSearch(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.nonEmpty, "phrase absent at sf0.001 — pick another")
    val expected = Tables(spark, sf0001, "documents")
      .select($"source", $"text").collect()
      .map { r =>
        val occ = r.getString(1).split(" ").sliding(2).count(w =>
          w.length == 2 && w(0) == TextOps.PhraseTerms(0)
            && w(1) == TextOps.PhraseTerms(1))
        (r.getString(0), occ)
      }
      .filter(_._2 > 0)
      .groupBy(_._1)
      .map { case (src, hits) =>
        (src, hits.length.toLong, hits.map(_._2.toLong).sum)
      }.toSet
    assert(rows == expected,
      s"diff: +${(rows -- expected).take(3)} -${(expected -- rows).take(3)}")
  }

  test("heavy hitters: two-phase MG ≡ naive threshold; the candidate " +
      "superset guarantee holds under every chunking") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val got = TextOps.heavyHittersExact(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val terms = Tables(spark, sf0001, "documents")
      .select(explode(graft.functions.Shingles.sparkToks).as("t"))
      .collect().map(_.getString(0))
    val n = terms.length.toLong
    val full = terms.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = full.filter { case (_, c) => c * 30 > n }
    assert(got == expect)
    assert(got.nonEmpty && got.size < full.size,
      s"threshold must bite: ${got.size} of ${full.size}")
    // the MG guarantee, tested directly on the SHIPPED fold (shared
    // with the operator's mapPartitions — not a spec-local copy): for
    // any way of chunking the stream, the per-chunk summaries' union
    // keys cover every true heavy hitter
    for (p <- Seq(1, 2, 7, 32)) {
      val chunkSize = math.max(1, terms.length / p)
      val cands = terms.grouped(chunkSize)
        .map(c => TextOps.misraGries(c.iterator, 30))
        .reduce(_ ++ _)
      assert(expect.keySet.subsetOf(cands),
        s"P=$p lost heavies: ${expect.keySet -- cands}")
    }
  }

  test("phrase_search_indexed: the stored index scan partition-prunes " +
      "to the query terms' buckets; bucket fn in lockstep; ≡ inline") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val q = TextOps.phraseSearchIndexed(spark, sf0001)
    val rows = q.collect()
    val scans = fileScans(q.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("pos"))
    assert(scans.nonEmpty, "no postings scans found")
    val nBuckets = TextOps.PhraseTerms.map(TextOps.termBucket).distinct.size
    scans.foreach { s =>
      assert(s.partitionFilters.toString.contains("tb"),
        s"no tb partition filter: ${s.partitionFilters}")
      val pruned = s.relation.location
        .listFiles(s.partitionFilters, s.dataFilters).length
      val total = s.relation.location.listFiles(Nil, Nil).length
      assert(pruned <= nBuckets && pruned < total,
        s"scan read $pruned of $total partition dirs")
    }
    // driver-side termBucket ≡ the index's column expression, for
    // every distinct term in the corpus (the shared-addressing rule)
    val stored = spark.read.parquet(TextOps.postingsDir(spark, sf0001))
      .select(col("term"), col("tb")).distinct().collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(stored.nonEmpty)
    stored.foreach { case (t, tb) =>
      assert(TextOps.termBucket(t) == tb, s"bucket drift for term '$t'")
    }
    // layout change only: indexed ≡ inline
    val inline = TextOps.phraseSearch(spark, sf0001).collect()
    assert(rows.map(_.toSeq).toSeq == inline.map(_.toSeq).toSeq)
  }

  test("maintained postings: day-1 files untouched by the append; the " +
      "delta files alone carry exactly the day-2 postings; compaction " +
      "is a row-multiset no-op; bucket pruning holds on the grown index") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val st = TextOps.maintainedPostings(spark, sf0001)
    // the append added files without rewriting day-1 (name+length set)
    assert(st.day1Files.nonEmpty && st.deltaFiles.nonEmpty)
    assert(st.day1Files.keySet.intersect(st.deltaFiles.keySet).isEmpty)
    val now = st.day1Files.keys.map(p =>
      p -> new java.io.File(p).length).toMap
    assert(now == st.day1Files, "a day-1 posting file was rewritten")
    // day-2 docs are findable WITHOUT touching day-1 files: the delta
    // file set alone holds exactly the day-2 docs' postings
    val day2Ids = Tables(spark, sf0001, "documents")
      .filter(TextOps.isDay2).select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(day2Ids.nonEmpty)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"), r.getAs[String]("term"))
    val deltaRows = spark.read.parquet(st.deltaFiles.keys.toSeq: _*)
      .collect().map(key).toSet
    assert(deltaRows.map(_._1) == day2Ids,
      "delta files must hold day-2 docs' postings, all of them, only them")
    // grown index = one-shot index, as a row multiset
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"pos", $"term").collect().map(key)
        .groupBy(identity).view.mapValues(_.length).toMap
    val grown = multiset(spark.read.parquet(st.root))
    val oneShot = multiset(
      spark.read.parquet(TextOps.postingsDir(spark, sf0001)))
    assert(grown == oneShot, "append lost or doubled postings")
    // compaction: same multiset again, fewer-or-equal files per bucket
    val cdir = TextOps.compactedPostingsDir(spark, sf0001)
    assert(multiset(spark.read.parquet(cdir)) == oneShot)
    // bucket pruning still holds on the GROWN index
    val q = TextOps.phraseSearchMaintained(spark, sf0001)
    q.collect()
    val scans = fileScans(q.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("pos"))
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val pruned = s.relation.location
        .listFiles(s.partitionFilters, s.dataFilters).length
      val total = s.relation.location.listFiles(Nil, Nil).length
      assert(pruned < total, s"no pruning on the grown index")
    }
  }

  test("contrastive pairs: positives are exactly the cluster edge set; " +
      "no negative shares a cluster with its anchor; sets disjoint") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.contrastivePairs(spark, sf0001).collect()
      .map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    val pos = rows.filter(_._1 == 1L).map(_._2).toSet
    val neg = rows.filter(_._1 == 0L).map(_._2).toSet
    val expectPos = Similarity.neardupPairs(spark, sf0001)
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pos == expectPos)
    assert(pos.nonEmpty && neg.nonEmpty)
    assert(pos.intersect(neg).isEmpty)
    val clu = Similarity.neardupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    neg.foreach { case (a, b) =>
      assert(clu(a) != clu(b), s"negative ($a,$b) shares cluster ${clu(a)}")
      assert(a != b)
    }
    // the exclusion actually fired: raw Knuth candidates minus the
    // kept negatives must include at least the same-cluster drops
    val n = clu.size
    val raw = clu.keySet.flatMap(d => Seq(0L, 1L).map(j =>
        (d, (d * 2654435761L + 40503L * j + 12345L) % n))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))))
    assert(neg.subsetOf(raw))
    assert((raw -- neg).forall { case (a, b) => clu(a) == clu(b) },
      "a candidate was dropped without sharing a cluster")
  }

  test("survivorship: keeper is a member, dominates its cluster, and " +
    "token mass is conserved") {
    import org.apache.spark.sql.functions._
    val surv = graft.operators.Similarity
      .neardupSurvivors(spark, sf0001).collect()
    assert(surv.nonEmpty, "no multi-member clusters at sf0.001")
    val clu = graft.operators.Similarity.neardupClusters(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    surv.foreach { r =>
      val (cluster, n, keeper) =
        (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n >= 2L)
      assert(clu(keeper) == cluster, s"keeper $keeper not in $cluster")
      assert(r.getLong(4) >= n - 1,
        "every dropped member carries at least one token")
    }
    // exactly one keeper per multi-member cluster
    val multi = clu.groupBy(_._2).filter(_._2.size > 1).keySet
    assert(surv.map(_.getLong(0)).toSet == multi)
  }

  test("coreness: matches a driver-side brute-force peel, and the " +
    "fixed unroll covers the true fixpoint") {
    val pairs = Similarity.neardupPairs(spark, sf0001)
      .filter($"jaccard" >= 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute peel to TRUE fixpoint (no round cap), counting rounds
    def peel(k: Int): (Set[Long], Int) = {
      var s = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      var rounds = 0
      var changed = true
      while (changed) {
        val deg = pairs.filter(p => s(p._1) && s(p._2))
          .flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (v, o) => (v, o.length) }
        val next = s.filter(v => deg.getOrElse(v, 0) >= k)
        changed = next != s
        if (changed) rounds += 1
        s = next
      }
      (s, rounds)
    }
    val (core2, r2) = peel(2)
    val (core3, r3) = peel(3)
    assert(r2 <= Similarity.CorenessRounds &&
      r3 <= Similarity.CorenessRounds,
      s"peel needs $r2/$r3 rounds — raise CorenessRounds")
    val got = Similarity.neardupCoreness(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    got.foreach { case (v, c) =>
      val expect = if (core3(v)) 3L else if (core2(v)) 2L else 1L
      assert(c == expect, s"doc $v coreness $c, brute says $expect")
    }
    // the decomposition is non-trivial on the shipped corpus
    assert(got.values.toSet.size >= 2, "coreness is constant — vacuous")
  }

  test("nDCG board: every method sandwiched by its recall's best/worst" +
    " placements, zero iff zero hits") {
    val ndcg = Similarity.pqNdcg(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val hits = Similarity.pqRecall(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(ndcg.keySet == hits.keySet)
    val w = Similarity.DcgWeights
    val idcg = Similarity.IdcgScaled
    ndcg.foreach { case (m, n) =>
      val h = hits(m).toInt
      assert(n >= 0 && n <= 1000000L, s"$m ndcg out of range")
      if (h == 0) assert(n == 0, s"$m: hits 0 but ndcg $n")
      else {
        // h hits placed best (ranks 1..h) vs worst (ranks 10-h+1..10)
        val best = w.take(h).sum * 1000000L / idcg
        val worst = w.takeRight(h).sum * 1000000L / idcg
        assert(n <= best && n >= worst,
          s"$m: ndcg $n outside [$worst, $best] for $h hits")
      }
    }
    // the exhaustive method finds all 10 in exact ADC order at this
    // corpus only if quantization preserved the head — either way the
    // board must give it at least its recall-worst placement; and at
    // least one method scores > 0 (the board is not vacuous)
    assert(ndcg.values.max > 0)
  }

  test("kNN confusion matrix: accounts for every vector, and one " +
    "query's vote matches a driver-side recount") {
    val cm = Similarity.knnLabelConfusion(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(cm.map(_._2).sum == n, "every vector is classified once")
    assert(cm.map(_._1).distinct.length == cm.length, "dup matrix cells")
    // brute recount for query vec 7: 5 nearest by (cos desc, id),
    // majority label with smallest-label tiebreak
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "embedding", "CAST(label AS BIGINT) AS label")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getLong(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (a.indices).foreach { i =>
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
    }
    val (qid, qv, qlab) = rows.find(_._1 == 7L).get
    val nn5 = rows.filter(_._1 != qid)
      .map { case (id, v, lab) => (id, lab, cos(qv, v)) }
      .sortBy { case (id, _, s) => (-s, id) }.take(5)
    val votePred = nn5.groupBy(_._2).map { case (l, o) => (l, o.length) }
      .toSeq.sortBy { case (l, c) => (-c, l) }.head._1
    // the (qlab, votePred) cell must exist in the matrix
    assert(cm.toMap.contains((qlab, votePred)),
      s"vec 7 votes $votePred from $qlab — cell missing")
  }

  test("embedding drift: halves partition each label and the label-0 " +
    "cosine matches a driver-side fixed-point recount") {
    val d = Similarity.embeddingCentroidDrift(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(d.length == 10)
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "embedding", "CAST(label AS BIGINT) AS label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def half(id: Long) = if (md5hex(id.toString)(0) < '8') 1 else 2
    d.foreach { case (lab, n1, n2, cos) =>
      assert(n1 + n2 == rows.count(_._3 == lab), s"label $lab halves leak")
      assert(cos >= -1.0 && cos <= 1.0)
      assert(n1 > 0 && n2 > 0, s"label $lab has an empty half")
    }
    // brute fixed-point recount for label 0
    val l0 = rows.filter(_._3 == 0L)
    def sumVec(h: Int): Array[Long] = {
      val s = Array.fill(64)(0L)
      l0.filter(r => half(r._1) == h).foreach { case (_, v, _) =>
        v.indices.foreach { j =>
          s(j) += math.floor(v(j).toDouble * 1048576.0 + 0.5).toLong
        }
      }
      s
    }
    val (a, b) = (sumVec(1), sumVec(2))
    val dot = a.indices.map(j => a(j) * b(j)).sum
    val expect = math.floor(dot.toDouble /
      (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble)) * 1e6 + 0.5) / 1e6
    assert(d.find(_._1 == 0L).get._4 == expect,
      "label-0 centroid cosine drifted from the fixed-point recount")
  }

  test("source overlap matrix folds the cached pair frame exactly; keys " +
      "unordered; diagonal present") {
    import org.apache.spark.sql.functions.col
    val src = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.operators.Similarity.neardupPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b"), col("n_inter")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = pairs.groupBy { case (a, b, _) =>
        val (sa, sb) = (src(a), src(b))
        if (sa <= sb) (sa, sb) else (sb, sa)
      }.view.mapValues(ps => (ps.length.toLong, ps.map(_._3).sum)).toMap
    val got = graft.operators.Similarity
      .sourceOverlapMatrix(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1))
        -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    assert(got.keys.forall { case (a, b) => a <= b }, "matrix not normalized")
    assert(got.keys.exists { case (a, b) => a == b },
      "no within-source duplication observed — diagonal missing")
  }

  test("knn_f1_by_class is exactly derivable from the graded confusion " +
      "matrix (tp/fp/fn fold + integer harmonic F1)") {
    val cm = Similarity.knnLabelConfusion(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val labels = cm.keys.flatMap { case (a, b) => Seq(a, b) }.toSeq.distinct
    val expected = labels.sorted.map { l =>
      val tp = cm.getOrElse((l, l), 0L)
      val nTrue = cm.collect { case ((t, _), n) if t == l => n }.sum
      val nPred = cm.collect { case ((_, p), n) if p == l => n }.sum
      val fp = nPred - tp; val fn = nTrue - tp
      val prec = if (tp + fp == 0) 0L else tp * 1000000L / (tp + fp)
      val rec = if (tp + fn == 0) 0L else tp * 1000000L / (tp + fn)
      val f1 = if (2 * tp + fp + fn == 0) 0L
        else 2 * tp * 1000000L / (2 * tp + fp + fn)
      (l, nTrue, tp, fp, fn, prec, rec, f1)
    }
    val got = Similarity.knnF1ByClass(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
    // the board is non-degenerate: some class has both hits and misses
    assert(got.exists(r => r._3 > 0 && (r._4 > 0 || r._5 > 0)),
      "confusion is diagonal-only or empty — F1 untested")
  }

  test("proximity search ≡ a from-scratch band scan; every adjacent " +
      "(phrase) pair surfaces with min_dist 1") {
    import graft.operators.TextOps
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.flatMap { case (id, src, text) =>
      val toks = text.split(" ")
      val pa = toks.zipWithIndex.collect { case ("fast", i) => i }
      val pb = toks.zipWithIndex.collect { case ("table", i) => i }
      val pairs = for (x <- pa; y <- pb if math.abs(y - x) <= 5)
        yield math.abs(y - x).toLong
      if (pairs.isEmpty) None
      else Some((id, src, pairs.length.toLong, pairs.min))
    }.sortBy(e => (e._4, e._1)).toSeq
    val got = TextOps.proximitySearch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty, "no proximity hit at sf0.001 — vacuous")
    // superset law vs the exact-adjacency tier: adjacency ⇒ dist 1
    val adjacentDocs = docs.collect { case (id, _, text)
      if text.split(" ").sliding(2).exists(w =>
        w.length == 2 && w(0) == "fast" && w(1) == "table") => id
    }.toSet
    val dist1 = got.filter(_._4 == 1L).map(_._1).toSet
    assert(adjacentDocs.subsetOf(dist1),
      "a phrase-adjacent doc is missing from the slop tier at dist 1")
  }

  test("prefix-fingerprint dedup groups ≡ a from-scratch recompute; " +
      "every group shares the 32-token prefix with differing bodies") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def norm(t: String): String =
      t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fp = docs.map { case (id, t) =>
      val n = norm(t)
      (md5hex(n.split(" ", -1).take(32).mkString(" ")).take(8), id, n)
    }
    val expected = fp.groupBy(_._1).toSeq
      .map { case (f, xs) =>
        (f, xs.length.toLong, xs.map(_._3).distinct.length.toLong,
          xs.map(_._2).min)
      }
      .filter(g => g._2 >= 2 && g._3 >= 2)
      .sortBy(_._1)
    val got = graft.operators.TextOps.prefixDupGroups(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "no prefix-dup group at sf0.001 — tier vacuous")
  }
}
