package graft

import graft.operators.Skyline

/** Skyline: antichain + completeness against a quadratic recompute. */
class SkylineSpec extends SparkSpec {

  private def dominates(q: (Double, Int), p: (Double, Int)): Boolean =
    q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2)

  private lazy val all: Array[(Long, Double, Int)] =
    Tables(spark, sf0001, "part")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))

  private lazy val sky: Array[(Long, Double, Int)] =
    Skyline.partSkyline(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))

  test("frontier equals the quadratic ground truth") {
    val expect = all.filter(p => !all.exists(q =>
      dominates((q._2, q._3), (p._2, p._3)))).map(_._1).toSet
    assert(sky.map(_._1).toSet == expect)
    assert(sky.nonEmpty)
  }

  test("frontier is an antichain") {
    for (a <- sky; b <- sky if a._1 != b._1)
      assert(!dominates((a._2, a._3), (b._2, b._3)),
        s"$a dominates $b inside the frontier")
  }

  test("every non-frontier part is dominated by a frontier part") {
    val skySet = sky.map(_._1).toSet
    all.filterNot(p => skySet(p._1)).foreach { p =>
      assert(sky.exists(q => dominates((q._2, q._3), (p._2, p._3))),
        s"$p outside frontier but undominated by it")
    }
  }
}
