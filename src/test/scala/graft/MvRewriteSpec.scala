package graft

import org.apache.spark.sql.functions._

import graft.operators.MvServe

/** Transparent MV rewrite: the aggregate-over-base query must be
  * SERVED from the stored MV (plan-asserted — without the scan
  * assertion the graded query would pass trivially off the base), the
  * answer must be indistinguishable from the from-scratch aggregate,
  * and any shape outside the registered contract must NOT rewrite. */
class MvRewriteSpec extends SparkSpec {

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect()
    fileScans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
  }

  test("served aggregate reads the MV parquet, not orders.parquet") {
    val mv = MvServe.mvDir(spark, sf0001)
    val df = MvServe.ordersAggMvServed(spark, sf0001)
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains(
      new java.io.File(mv).getName)), s"expected only MV scans, got $paths")
    assert(!paths.exists(_.contains("orders.parquet")))
  }

  test("served answer equals the from-scratch aggregate row-for-row") {
    val served = MvServe.ordersAggMvServed(spark, sf0001).collect().toSeq
    val scratch = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(served == scratch && served.nonEmpty)
  }

  test("a filtered aggregate is NOT rewritten (reads the base table)") {
    MvServe.ready(spark, sf0001)
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_totalprice") > 1000)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
    assert(scanPaths(df).exists(_.contains("orders.parquet")))
  }

  test("a different grouping key is NOT rewritten") {
    MvServe.ready(spark, sf0001)
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(df).exists(_.contains("orders.parquet")))
  }

  test("an out-of-contract aggregate function is NOT rewritten") {
    MvServe.ready(spark, sf0001)
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(col("o_orderstatus"))
      .agg(max(col("o_totalprice")).as("mx"))
    assert(scanPaths(df).exists(_.contains("orders.parquet")))
  }
}
