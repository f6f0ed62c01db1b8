package graft

import org.apache.spark.sql.functions._
import graft.operators.ChunkRetrieval

/** Chunk-level retrieval board: an independent from-scratch JVM
  * pipeline at sf0.001 — own chunking, rational BM25, hashed-BoW
  * cosine, RRF and recall code path — plus the ground-truth laws. */
class ChunkRetrievalSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def u32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)
  private def round6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  private case class Ch(doc: Long, idx: Long, grams: Seq[String])

  /** Chunk → word-bigram universe (chunks with ≥ 2 tokens only — the
    * operator's retrieval-universe rule). */
  private lazy val chunks: Seq[Ch] =
    Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect().toIndexedSeq
      .flatMap { r =>
        val id = r.getLong(0)
        val t = r.getString(1).split(" ").filter(_.nonEmpty).toSeq
        val n = t.length
        if (n < 1) Seq.empty[Ch]
        else (0 to ((n - 1) / 24) * 24 by 24)
          .filter(s => s == 0 || s + 8 < n)
          .flatMap { s =>
            val ct = t.slice(s, math.min(s + 32, n))
            if (ct.length < 2) None
            else Some(Ch(id, (s / 24).toLong,
              ct.sliding(2).map(_.mkString(" ")).toSeq))
          }
      }

  private def bandsOf(grams: Seq[String]): Seq[(Int, String)] =
    (0 to 3).map(i => i -> grams.map(g => md5hex(g).substring(8 * i, 8 * i + 8)).min)

  private lazy val expected: Seq[(Long, Long, Long, Long)] =
    fusedLists(banded = false).map { case (qd, nRel, fused) =>
      val hits = fused.count(_._1 == qd).toLong
      (qd, nRel, hits, hits * 1000000L / nRel)
    }
  private lazy val expectedBanded: Seq[(Long, Long, Long, Long)] =
    fusedLists(banded = true).map { case (qd, nRel, fused) =>
      val hits = fused.count(_._1 == qd).toLong
      (qd, nRel, hits, hits * 1000000L / nRel)
    }
  private lazy val expectedNdcg: Seq[(Long, Long, Long, Long)] =
    fusedLists(banded = false).map { case (qd, nRel, fused) =>
      val w = graft.operators.Similarity.DcgWeights
      val dcg = fused.zipWithIndex.collect {
        case ((d, _, _), i) if d == qd => w(i)
      }.sum
      val idcg = w.take(math.min(nRel, 10L).toInt).sum
      (qd, nRel, dcg, dcg * 1000000L / idcg)
    }

  /** Per query: (qdoc, n_relevant, fused top-10 in rank order). */
  private def fusedLists(banded: Boolean)
      : Seq[(Long, Long, Seq[(Long, Long, Double)])] = {
    val nn = chunks.length.toLong
    val sumdl = chunks.map(_.grams.length.toLong).sum
    val tf: Map[(Long, Long, String), Long] = chunks.flatMap(c =>
      c.grams.groupBy(identity).map { case (w, os) =>
        (c.doc, c.idx, w) -> os.size.toLong
      }).toMap
    val df: Map[String, Long] = tf.keys.toSeq.map(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byChunk = chunks.map(c => (c.doc, c.idx) -> c).toMap
    val qdocs = chunks.groupBy(_.doc).filter(_._2.size >= 2)
      .keys.toSeq.sorted.take(ChunkRetrieval.NQ)
    def vec(gs: Seq[String]): Map[Long, Long] =
      gs.groupBy(w => u32(w) % 256).view.mapValues(_.size.toLong).toMap
    qdocs.map { qd =>
      val q = byChunk((qd, 0L))
      val nRel = chunks.count(_.doc == qd).toLong - 1
      val cands = chunks.filterNot(c => c.doc == qd && c.idx == 0L)
      // sparse: exact-rational BM25 in ppm over distinct query bigrams
      val qterms = q.grams.distinct
      val sparse = cands.flatMap { c =>
        val dl = c.grams.length.toLong
        val s = qterms.flatMap { w =>
          tf.get((c.doc, c.idx, w)).map { f =>
            (BigInt(2 * (nn - df(w)) + 1) * 22 * f * sumdl * 1000000) /
              (BigInt(2 * df(w) + 1) *
                (10 * f * sumdl + 3 * sumdl + 9 * dl * nn))
          }
        }
        if (s.isEmpty) None else Some((c.doc, c.idx, s.sum))
      }.sortBy { case (d, i, s) => (-s, d, i) }.take(50)
        .zipWithIndex.map { case ((d, i, _), r) => (d, i) -> (r + 1L) }.toMap
      // dense: hashed-BoW cosine, 6-dp floor-rounded; the banded arm
      // scores only candidates sharing a band minhash with the query
      val qbands = bandsOf(q.grams).toSet
      val denseCands =
        if (!banded) cands
        else cands.filter(c => bandsOf(c.grams).exists(qbands))
      val qv = vec(q.grams)
      val qn2 = qv.values.map(v => v * v).sum
      val dense = denseCands.flatMap { c =>
        val cv = vec(c.grams)
        val dot = qv.map { case (b, v) => v * cv.getOrElse(b, 0L) }.sum
        if (dot == 0L) None
        else {
          val cn2 = cv.values.map(v => v * v).sum
          Some((c.doc, c.idx, round6(dot.toDouble /
            (math.sqrt(qn2.toDouble) * math.sqrt(cn2.toDouble)))))
        }
      }.sortBy { case (d, i, s) => (-s, d, i) }.take(50)
        .zipWithIndex.map { case ((d, i, _), r) => (d, i) -> (r + 1L) }.toMap
      // RRF fusion, top 10, sibling recall
      val fused = (sparse.keySet ++ dense.keySet).toSeq.map { k =>
        val rrf = round6(
          sparse.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          dense.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
        (k._1, k._2, rrf)
      }.sortBy { case (d, i, s) => (-s, d, i) }.take(ChunkRetrieval.TopK)
      (qd, nRel, fused)
    }.sortBy(_._1)
  }

  test("chunk_retrieval_recall equals a from-scratch JVM pipeline") {
    val got = ChunkRetrieval.chunkRetrievalRecall(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("banded variant equals a from-scratch JVM pipeline whose dense " +
      "candidates share a band minhash, and banding really prunes") {
    val got = ChunkRetrieval.chunkRetrievalRecallBanded(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expectedBanded)
    // banding is a real restriction somewhere: at least one query's
    // candidate set shrinks (else the scale-path grade is vacuous)
    val qdocs = chunks.groupBy(_.doc).filter(_._2.size >= 2)
      .keys.toSeq.sorted.take(ChunkRetrieval.NQ)
    val byChunk = chunks.map(c => (c.doc, c.idx) -> c).toMap
    val pruned = qdocs.exists { qd =>
      val q = byChunk((qd, 0L))
      val qbands = bandsOf(q.grams).toSet
      chunks.exists(c => !(c.doc == qd && c.idx == 0L) &&
        !bandsOf(c.grams).exists(qbands))
    }
    assert(pruned, "band candidates = all pairs everywhere — vacuous")
  }

  test("chunk_retrieval_ndcg equals the from-scratch fold with the " +
      "shared integer weight table") {
    val got = ChunkRetrieval.chunkRetrievalNdcg(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expectedNdcg)
    // order-sensitivity is live: some query's nDCG differs from its
    // recall share (a pure set metric could not distinguish them)
    val recallPpm = expected.map(x => x._1 -> x._4).toMap
    assert(expectedNdcg.exists(x => x._4 != recallPpm(x._1)),
      "nDCG ≡ recall everywhere — the order grade is vacuous")
  }

  test("ground truth is non-vacuous and self-exclusion holds") {
    assert(expected.nonEmpty, "no multi-chunk query docs at sf0.001")
    assert(expected.forall(_._2 >= 1), "a query with no siblings")
    // overlap-correlated siblings: retrieval must find SOMETHING
    assert(expected.map(_._3).sum > 0, "zero recall everywhere")
    // n_hits can never exceed min(n_relevant, TopK)
    assert(expected.forall { case (_, rel, hits, _) =>
      hits <= math.min(rel, ChunkRetrieval.TopK.toLong) })
  }
}
