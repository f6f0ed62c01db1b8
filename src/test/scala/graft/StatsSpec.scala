package graft

import graft.operators.Stats

/** Deterministic second-moment statistics (Stats). */
class StatsSpec extends SparkSpec {

  test("corr_stats: one row per returnflag, corr in [-1,1], stddevs positive") {
    val rows = Stats.corrStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getDouble(2)
      assert(corr >= -1.0 && corr <= 1.0, s"corr $corr")
      assert(r.getDouble(4) > 0.0 && r.getDouble(5) > 0.0)
    }
  }

  test("corr_stats: agrees with Spark's built-in corr to float tolerance") {
    import org.apache.spark.sql.functions._
    val ours = Stats.corrStats(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_extendedprice"), col("l_quantity")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-6, s"$k: $v vs ${builtin(k)}")
    }
  }

  test("chi2: cells partition the corpus, expected margins match observed") {
    import org.apache.spark.sql.functions._
    val cells = Stats.chi2Cells(spark, sf0001).collect()
    val total = Tables(spark, sf0001, "documents").count()
    assert(cells.map(_.getAs[Long]("n_obs")).sum == total)
    // per-row: E > 0 and contribution consistent with (O-E)^2/E
    cells.foreach { r =>
      val o = r.getAs[Long]("n_obs").toDouble
      val e = r.getAs[Double]("n_exp")
      val c = r.getAs[Double]("contrib")
      assert(e > 0.0)
      assert(math.abs(c - (o - e) * (o - e) / e) < 0.01, s"$r")
    }
    val stat = Stats.chi2Stat(spark, sf0001).collect()(0)
    assert(stat.getAs[Long]("n_cells") == cells.length)
    assert(stat.getAs[Double]("chi2") >= 0.0)
    val dof = stat.getAs[Long]("dof")
    val ns = cells.map(_.getString(0)).distinct.length
    val nl = cells.map(_.getString(1)).distinct.length
    assert(dof == (ns - 1).toLong * (nl - 1))
  }

  test("corr_stats: deterministic across shuffle-partition settings") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = Stats.corrStats(spark, sf0001).collect().map(_.toString).toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Stats.corrStats(spark, sf0001).collect().map(_.toString).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
