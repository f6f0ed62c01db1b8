package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4.2 "salting for skew"). AQE's runtime
  * skew-join split covers most cases; explicit salting is for the
  * pathological hot key (one promoter with 10⁸ fans) where even a
  * split partition of one key overwhelms an executor.
  *
  * Shape: the huge/skewed PROBE side gets a deterministic salt in
  * [0, n) derived from caller-chosen columns; the smaller BUILD side is
  * replicated n times (one copy per salt). The join key becomes
  * (key, salt), so one hot key spreads over n partitions. Replication
  * multiplies the build side by n — choose n ≈ hot-key-rows /
  * target-partition-rows, and keep the build side the smaller input.
  */
object Skew {

  /** Graded form: nation-level revenue through an 8-way SALTED
    * orders⋈customer join — result must equal the unsalted join
    * exactly (the oracle is the plain SQL join), proving salting is
    * pure redistribution with no semantic cost. */
  def saltedRevenue(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val o = graft.Tables(spark, dir, "orders")
    val c = graft.Tables(spark, dir, "customer")
    saltedJoin(o, c, "o_custkey", "c_custkey", col("o_orderkey"), n = 8)
      .groupBy(col("c_nationkey"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_nationkey")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("salted_revenue" -> (saltedRevenue _))

  val oracles: Map[String, String] = Map(
    "salted_revenue" ->
      """SELECT c.c_nationkey,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** Equi-join `left(leftKey) = right(rightKey)` with an n-way salt.
    * `saltBy` must be deterministic per row (e.g. a unique id column on
    * the probe side) — it only needs to DISTRIBUTE, not be unique. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltBy: Column, n: Int): DataFrame = {
    require(n > 0, s"salt fan-out must be positive, got $n")
    // withColumn would silently OVERWRITE a pre-existing __salt column
    // (e.g. a caller chaining salted joins) — fail loudly instead.
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin inputs must not already carry a __salt column")
    val l = left.withColumn("__salt", pmod(hash(saltBy), lit(n)))
    val r = right.withColumn("__salt",
      explode(lit((0 until n).toArray)))
    val joined = l.join(r,
      l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
    joined.drop(l("__salt")).drop(r("__salt"))
  }
}
