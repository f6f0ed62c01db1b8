package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** SemDeDup election: the candidate set stays cell-bounded (never
  * all-pairs) and the survivor is exactly the paper's rule — lowest
  * centroid similarity in each multi-member component. */
class SemDedupSpec extends SparkSpec {

  private lazy val pairs =
    Similarity.semanticDedupPairs(spark, sf0001).collect()

  private lazy val centSim: Map[Long, (Long, Double)] =
    Similarity.assignCentroidSim(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("candidate set is cell-bounded: every pair's members share the " +
      "row's assigned cell, and the plan has no cartesian join") {
    assert(pairs.nonEmpty, "no semantic near-dup pairs — vacuous")
    pairs.foreach { r =>
      val (cid, a, b) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(centSim(a)._1 == cid && centSim(b)._1 == cid,
        s"pair ($a,$b) claims cell $cid but assignments are " +
          s"${centSim(a)._1}/${centSim(b)._1}")
    }
    val plan = Similarity.semanticDedupPairs(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pair generation fell back to a cartesian product")
  }

  test("election keys on the pair rows agree with the assignment-side " +
      "centroid cosine") {
    pairs.foreach { r =>
      assert(r.getDouble(4) == centSim(r.getLong(1))._2)
      assert(r.getDouble(5) == centSim(r.getLong(2))._2)
    }
  }

  test("survivors: keeper is the component member with the LOWEST " +
      "centroid similarity (ties to the smaller vec_id), components " +
      "are exactly the multi-member ones, dropped count consistent") {
    val comp: Map[Long, Long] =
      Similarity.embeddingClusters(spark, sf0001).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = comp.groupBy(_._2).map { case (c, m) => c -> m.keySet }
      .filter(_._2.size > 1)
    val rows = Similarity.semanticDedupSurvivors(spark, sf0001).collect()
    assert(rows.nonEmpty, "no multi-member semantic components — vacuous")
    assert(rows.map(_.getLong(0)).toSet == members.keySet)
    rows.foreach { r =>
      val (c, n, keeper, ks, dropped) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getLong(4))
      val ms = members(c)
      assert(n == ms.size && dropped == n - 1)
      val expect = ms.minBy(v => (centSim(v)._2, v))
      assert(keeper == expect,
        s"component $c elected $keeper, paper rule says $expect")
      assert(ks == centSim(keeper)._2)
      assert(ms.forall(v => centSim(v)._2 >= ks))
    }
  }
}
