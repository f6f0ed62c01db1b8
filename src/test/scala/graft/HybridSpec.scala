package graft

import org.apache.spark.sql.functions._
import graft.operators.Hybrid

/** Hybrid retrieval: RRF / min-max fusion internal consistency (scores
  * recomputed from the output's own ranks/norms), the anchor-doc pin,
  * the top-k plan shape of both tiers, and a full independent
  * brute-force recompute of the batched MMR greedy at sf0.001. */
class HybridSpec extends SparkSpec {

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("rrf: scores are exactly 1/(60+rs) + 1/(60+rd) of the emitted ranks, " +
      "descending, and the dense anchor (vec_id 0) holds dense rank 1") {
    val rows = Hybrid.hybridSearchRrf(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map { r =>
      val rs = r.getAs[Long]("r_sparse"); val rd = r.getAs[Long]("r_dense")
      assert(rs > 0 || rd > 0, "a fused row must come from at least one tier")
      val want = round6((if (rs > 0) 1.0 / (60 + rs) else 0.0) +
        (if (rd > 0) 1.0 / (60 + rd) else 0.0))
      assert(r.getAs[Double]("rrf") == want, s"rrf mismatch at $r")
      r.getAs[Double]("rrf")
    }
    assert(scores.sameElements(scores.sortBy(-_)), "rrf not descending")
    // the anchor doc (vec_id 0) is its own dense nearest neighbor: IF it
    // surfaces in the fused top 10, its dense rank must be exactly 1
    rows.find(_.getAs[Long]("doc_id") == 0L).foreach { r =>
      assert(r.getAs[Long]("r_dense") == 1L,
        "vec_id 0 is the dense query anchor — cosine 1.0 → dense rank 1")
    }
    assert(rows.forall(r => r.getAs[Long]("r_sparse") <= 50 &&
      r.getAs[Long]("r_dense") <= 50), "ranks exceed the tier depth")
  }

  test("min-max fusion: norms lie in [0,1] and fused = 0.5·ns + 0.5·nd") {
    val rows = Hybrid.hybridSearchFused(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ns = r.getAs[Double]("norm_sparse"); val nd = r.getAs[Double]("norm_dense")
      assert(ns >= 0.0 && ns <= 1.0 && nd >= 0.0 && nd <= 1.0)
      assert(r.getAs[Double]("fused") == round6(0.5 * ns + 0.5 * nd))
    }
  }

  test("both tiers plan as TakeOrderedAndProject — fusion joins 2·N rows, " +
      "never the corpus") {
    Seq(Hybrid.hybridSearchRrf(spark, sf0001),
        Hybrid.hybridSearchFused(spark, sf0001)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"expected top-k tiers, got:\n$plan")
    }
  }

  /** Independent MMR recompute: collect the sf0.001 embeddings, mirror
    * the cosine kernel (left-fold dot / (√na·√nb)) and the floor
    * rounding, run the greedy from scratch, compare every output row. */
  test("mmr_rerank_batch equals a from-scratch greedy over brute cosines") {
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 8L).flatMap { qid =>
      val qv = embs(qid)
      val cands = embs.keys.filter(_ >= 8L).toSeq
        .map(v => v -> round6(cos(embs(v), qv)))
        .sortBy { case (v, s) => (-s, v) }.take(20)
      val qsim = cands.toMap
      var remaining = cands.map(_._1).sorted
      var selected = Vector.empty[Long]
      (1L to 5L).map { pick =>
        val scored = remaining.map { c =>
          val m =
            if (selected.isEmpty) round6(0.7 * qsim(c))
            else round6(0.7 * qsim(c) - (1.0 - 0.7) *
              selected.map(s => round6(cos(embs(c), embs(s)))).max)
          (c, m)
        }
        val (best, m) = scored.minBy { case (c, mm) => (-mm, c) }
        selected :+= best
        remaining = remaining.filterNot(_ == best)
        (qid, pick, best, m)
      }
    }
    val got = Hybrid.mmrRerankBatch(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("pick"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("mmr"))).toSeq
    assert(got == expected)
  }
}
