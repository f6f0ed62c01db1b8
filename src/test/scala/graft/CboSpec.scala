package graft

import graft.operators.Cbo

/** CBO join reorder: with catalog stats + cbo.enabled the optimizer
  * abandons the user's fact⋈fact-first order; without, it keeps it.
  * Both plans must compute identical results. */
class CboSpec extends SparkSpec {

  /** Depth-first leaf-relation order of the optimized plan — the join
    * order fingerprint. */
  private def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().map { l =>
      val s = l.toString
      Seq("lineitem", "orders", "part").find(t => s.contains(t))
        .getOrElse("?")
    }

  test("stats + CBO change the join ORDER; the stats-free clone keeps " +
      "the stated fact-first order; results identical") {
    val withCbo = Cbo.planned(spark, sf0001, cbo = true)
    val without = Cbo.planned(spark, sf0001, cbo = false)
    val a = leafOrder(withCbo)
    val b = leafOrder(without)
    assert(a.toSet == Set("lineitem", "orders", "part"))
    assert(b.toSet == Set("lineitem", "orders", "part"))
    // the stats-free plan keeps the user's order: lineitem ⋈ orders
    // first, part last
    assert(b == Seq("lineitem", "orders", "part"),
      s"stats-free clone should keep the stated order, got $b")
    assert(a != b,
      s"CBO did not reorder: both plans are $a")
    // pure cost: identical results
    val ra = withCbo.collect().map(_.toSeq).toSeq
    val rb = without.collect().map(_.toSeq).toSeq
    assert(ra == rb)
    assert(ra.nonEmpty)
  }

  test("broadcast-threshold flip: the stats arm broadcasts the " +
      "filtered dim, the stats-free arm shuffles it, results identical") {
    val withCbo = Cbo.broadcastArm(spark, sf0001, cbo = true)
    val without = Cbo.broadcastArm(spark, sf0001, cbo = false)
    val pa = withCbo.queryExecution.executedPlan.toString
    val pb = without.queryExecution.executedPlan.toString
    assert(pa.contains("BroadcastHashJoin"),
      s"stats arm did not broadcast:\n$pa")
    assert(!pb.contains("BroadcastHashJoin") &&
      pb.contains("SortMergeJoin"),
      s"stats-free arm should shuffle (SMJ), got:\n$pb")
    val ra = withCbo.collect().map(_.toSeq).toSeq
    val rb = without.collect().map(_.toSeq).toSeq
    assert(ra == rb && ra.nonEmpty)
  }

  test("the analyzed catalog really carries rowCount + column stats") {
    val (lT, _, pT) = Cbo.analyzedTables(spark, sf0001)
    val lStats = spark.sql(s"DESCRIBE EXTENDED $lT")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(lStats.contains("Statistics"))
    val pSize = spark.sql(s"DESCRIBE EXTENDED $pT p_size")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pSize.get("distinct_count").exists(_ != "NULL"))
    assert(pSize.get("min").exists(_ != "NULL"))
  }
}
