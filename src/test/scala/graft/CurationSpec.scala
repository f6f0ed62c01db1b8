package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.Tables

/** Training-mix curation invariants (Curation.scala) on sf0.001. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("priority sample: k rows, weighted inclusion, reproducible") {
    val df = Curation.prioritySample(spark, sf0001, k = 50)
    val rows = df.collect()
    assert(rows.length == 50)
    val ps = rows.map(_.getAs[Double]("priority"))
    assert(ps.sameElements(ps.sortBy(-(_: Double))), "descending priorities")
    // reproducible: same top-k on a re-run (pure hash, no RNG state)
    val again = Curation.prioritySample(spark, sf0001, k = 50).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    // weighted: the sampled docs' mean n_chars should exceed the corpus
    // mean (longer docs get proportionally higher priorities)
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / 50
    val corpusMean = Tables(spark, sf0001, "documents")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighting has no effect: sample $sampleMean vs corpus $corpusMean")
  }

  test("hash sample: rates bounded, counts consistent, membership deterministic") {
    val df = Curation.hashSample(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"))
      assert(s >= 0 && s <= n)
      val rate = r.getAs[Double]("sample_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // totals: the overall realized rate lands near the 20 % threshold
    val (tot, samp) = rows.map(r =>
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled")))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(tot == Tables(spark, sf0001, "documents").count())
    val overall = samp.toDouble / tot
    assert(overall > 0.05 && overall < 0.4, s"hash threshold skewed: $overall")
    // rerun is bit-identical (pure-function membership, no rand())
    assert(df.collect().sameElements(rows))
    // the materialized sample agrees with the accounting row for row
    val docs = Curation.hashSampleDocs(spark, sf0001)
    val bySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(bySource.getOrElse(r.getAs[String]("source"), 0L) ==
        r.getAs[Long]("n_sampled"))
    }
  }

  test("decontamination: benchmark docs excluded, self-quote detected") {
    val df = Curation.decontamStats(spark, sf0001)
    val nTrain = Tables(spark, sf0001, "documents")
      .filter($"doc_id" % 97 =!= 0).count()
    assert(df.agg(sum("n_docs")).first().getLong(0) == nTrain)
    df.collect().foreach { r =>
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_docs"))
    }
    // a synthetic training doc that QUOTES a benchmark doc verbatim
    // must flag: verify the gram machinery end-to-end by checking that
    // any near-identical (jaccard>=0.9) pair straddling the benchmark
    // boundary is reported as contamination
    // restrict to pairs where BOTH docs have >= 8 tokens: two identical
    // 6-token docs have word-3-gram jaccard 1.0 but zero 8-grams, so
    // they are correctly reported clean — they must not trip the assert
    val longDocs = Tables(spark, sf0001, "documents")
      .filter(size(graft.functions.Shingles.sparkToks) >= 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = graft.operators.Similarity.neardupPairs(spark, sf0001)
      .filter($"jaccard" >= 0.9)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val straddling = pairs.filter { case (a, b) =>
      ((a % 97 == 0) != (b % 97 == 0)) &&
        longDocs.contains(a) && longDocs.contains(b) }
    if (straddling.nonEmpty) {
      val contaminatedTotal = df.agg(sum("n_contaminated")).first().getLong(0)
      assert(contaminatedTotal >= 1,
        s"benchmark-straddling near-dup pairs $straddling not flagged")
    }
  }

  test("funnel: stages are monotone and agree with the standalone queries") {
    val funnel = Curation.curationFunnel(spark, sf0001).collect()
    assert(funnel.nonEmpty)
    funnel.foreach { r =>
      val (raw, q, dc, s) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_decontam"), r.getAs[Long]("n_sampled"))
      assert(raw >= q && q >= dc && dc >= s && s >= 0,
        s"funnel not monotone: $raw >= $q >= $dc >= $s")
      assert(r.getAs[Long]("tokens_final") >= 0)
    }
    // cross-query consistency: the funnel's raw count per source equals
    // the decontamination query's doc count (same benchmark exclusion),
    // and total flagged docs = n_quality - n_decontam summed only over
    // docs that PASS quality... the simpler invariant that must hold:
    // funnel raw == decontam n_docs per source
    val drows = Curation.decontamStats(spark, sf0001).collect()
    val dstats = drows
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    funnel.foreach { r =>
      val src = r.getAs[String]("source")
      assert(dstats.contains(src), s"source $src missing from decontam_stats")
      assert(dstats(src) == r.getAs[Long]("n_raw"))
    }
    // membership twin matches the stats count in total (reuse the
    // collected rows — decontamStats shares the cached contamination
    // set but the final aggregate would still re-run)
    val nContaminated = Curation.decontamDocs(spark, sf0001).count()
    val statsTotal = drows.map(_.getAs[Long]("n_contaminated")).sum
    assert(nContaminated == statsTotal)
  }

  test("token budget: waterfill never over-grants, caps bind, rates in (0,1]") {
    val rows = Curation.tokenBudgetMix(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalAvail = rows.map(_.getAs[Long]("n_tokens_available")).sum
    val budget = 3L * totalAvail / 4L
    val allocated = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(allocated <= budget, s"over-granted: $allocated > $budget")
    rows.foreach { r =>
      val avail = r.getAs[Long]("n_tokens_available")
      val base = r.getAs[Long]("base_alloc")
      val alloc = r.getAs[Long]("alloc_tokens")
      assert(base <= alloc && alloc <= avail,
        s"waterfill monotonicity broken: base=$base alloc=$alloc avail=$avail")
      val rate = r.getAs[Double]("sampling_rate")
      assert(rate > 0.0 && rate <= 1.0)
    }
    // round 2 must actually move tokens when round 1 leaves hungry
    // sources and a leftover (otherwise it is dead code): if any source
    // was availability-bound below its round-1 cap, some other source
    // must have been topped up past base_alloc
    val leftover = budget - rows.map(_.getAs[Long]("base_alloc")).sum
    val hungry = rows.filter(r =>
      r.getAs[Long]("n_tokens_available") > r.getAs[Long]("base_alloc"))
    if (leftover > hungry.length && hungry.nonEmpty)
      assert(hungry.exists(r =>
        r.getAs[Long]("alloc_tokens") > r.getAs[Long]("base_alloc")),
        "round-2 redistribution granted nothing despite leftover")
  }

  test("stratified exact-k: salted two-phase == plain window, invariant to parallelism") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf0001, "documents")
    val k = 8
    val plain = docs
      .withColumn("skey", md5(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("skey"), col("doc_id"))))
      .filter(col("rk") <= k)
      .select("lang", "rk", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // salted two-phase at two different salt widths — same exact result
    Seq(4, 32).foreach { salt =>
      val got = Curation.stratifiedSampleK(spark, sf0001, k, salt)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == plain, s"salt=$salt diverged")
    }
    // exactly min(k, |stratum|) rows per language
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val perLang = plain.groupBy(_._1).view.mapValues(_.size).toMap
    sizes.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(k.toLong, n).toInt, lang)
    }
  }

  test("shuffle order: a bijection onto 1..N, stable across runs, " +
    "and ordered by the md5 key") {
    val o1 = graft.operators.Curation.docShuffleOrder(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = Tables(spark, sf0001, "documents").count()
    assert(o1.length == n)
    assert(o1.map(_._1).sorted.sameElements(1L to n), "not a bijection")
    assert(o1.map(_._2).distinct.length == n, "a doc appears twice")
    // deterministic: a second run derives the identical permutation
    val o2 = graft.operators.Curation.docShuffleOrder(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(o1.sameElements(o2))
    // positions follow the md5 total order
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sortedByKey = o1.sortBy { case (_, d) => (md5hex(d.toString), d) }
    assert(sortedByKey.map(_._1).sameElements(1L to n),
      "positions disagree with the md5 key order")
  }

  test("temperature_mix: α=0.5 upsamples the smallest source relative to " +
      "proportional, weights are floor(√n·10⁶), Σalloc ≈ budget") {
    val rows = graft.operators.Curation.temperatureMix(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length >= 2, "one source — temperature effect untestable")
    rows.foreach { case (_, n, wfp, _, _, _) =>
      assert(wfp == math.floor(math.sqrt(n.toDouble) * 1e6).toLong,
        s"w_fp drifted for n=$n")
    }
    val tot = rows.map(_._2).sum
    val budget = 3 * tot / 4
    val allocSum = rows.map(_._4).sum
    assert(allocSum <= budget && budget - allocSum < rows.length,
      s"Σalloc_temp=$allocSum vs budget=$budget")
    // smaller source → larger temp allocation than proportional;
    // larger source → smaller (the α<1 law)
    val smallest = rows.minBy(_._2); val largest = rows.maxBy(_._2)
    assert(smallest._4 > smallest._5,
      s"smallest source not upsampled: $smallest")
    assert(largest._4 < largest._5,
      s"largest source not downsampled: $largest")
  }

  test("quantile_normalize_sources equals a from-scratch recompute and " +
      "preserves within-source rank order") {
    val docs = Tables(spark, sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = docs.length.toLong
    val globalSorted = docs.sortBy { case (id, _, c) => (c, id) }.map(_._3)
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val srt = xs.sortBy { case (id, _, c) => (c, id) }
      srt.zipWithIndex.map { case ((id, src, c), i) =>
        val pr = if (srt.length == 1) 500000L
          else i.toLong * 1000000L / (srt.length - 1)
        val pos = pr * (n - 1) / 1000000L // 0-based into globalSorted
        (id, src, c, pr, globalSorted(pos.toInt))
      }
    }.sortBy(_._1)
    val got = graft.operators.Curation.quantileNormalizeSources(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // monotone: within a source, qnorm never decreases as raw increases
    got.groupBy(_._2).foreach { case (_, xs) =>
      val byRaw = xs.sortBy(x => (x._3, x._1)).map(_._5)
      assert(byRaw.sameElements(byRaw.sorted), "qnorm not monotone")
    }
  }

  test("source_cap_sample: conservation laws + hash-rank membership recompute") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val k = graft.operators.Curation.CapK
    val expected = docs.groupBy(_._2).toSeq.map { case (src, xs) =>
      val kept = xs.sortBy { case (id, _, _) =>
        (md5hex(id.toString).substring(0, 8), id) }.take(k)
      val nKept = kept.length.toLong
      (src, xs.length.toLong, nKept, xs.length.toLong - nKept,
        xs.map(_._3).sum, kept.map(_._3).sum,
        xs.map(_._3).sum - kept.map(_._3).sum,
        nKept * 1000000L / xs.length)
    }.sortBy(_._1)
    val got = graft.operators.Curation.sourceCapSample(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got == expected)
    // conservation laws on every row
    got.foreach { case (_, n, nk, nd, ct, ck, cd, _) =>
      assert(nk + nd == n && ck + cd == ct)
      assert(nk == math.min(n, k.toLong))
      assert(nk == k.toLong || nd == 0L, "under cap must drop nothing")
    }
  }

  test("source_cap_topk: the bounded-heap twin lands on the window " +
      "form's rows exactly (select-k ≡ rank-k, ties included)") {
    val a = Curation.sourceCapSample(spark, sf0001).collect()
      .map(_.toSeq).toSeq
    val b = Curation.sourceCapTopk(spark, sf0001).collect()
      .map(_.toSeq).toSeq
    assert(b == a)
  }

  test("source_cap_maintained: re-rank recompute, conservation, live evictions") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val k = graft.operators.Curation.CapK
    def ing(id: Long) = Set("0", "1")(md5hex(id.toString).substring(0, 1))
    def admits(xs: Seq[(Long, String)]): Set[(String, Long)] =
      xs.groupBy(_._2).toSeq.flatMap { case (src, ys) =>
        ys.sortBy { case (id, _) => (md5hex(id.toString).substring(0, 8), id) }
          .take(k).map(d => src -> d._1)
      }.toSet
    val day1 = admits(docs.filterNot(d => ing(d._1)).toSeq)
    val fin = admits(docs.toSeq)
    val expected = docs.map(_._2).distinct.sorted.map { src =>
      val d1 = day1.count(_._1 == src).toLong
      val fN = fin.count(_._1 == src).toLong
      val ev = day1.count(a => a._1 == src && !fin(a)).toLong
      val d2 = fin.count(a => a._1 == src && ing(a._2)).toLong
      (src, d1, fN, ev, d2)
    }.toSeq
    val got = graft.operators.Curation.sourceCapMaintained(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // conservation: final = day1 − evicted + day2, on every row
    got.foreach { case (_, d1, fN, ev, d2) => assert(fN == d1 - ev + d2) }
    // the honest law is non-vacuous: hash-rank admission really churns
    assert(got.map(_._4).sum > 0, "no evictions anywhere — vacuous")
  }
}
