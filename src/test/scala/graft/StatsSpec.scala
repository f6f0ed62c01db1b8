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
