package graft

import org.apache.spark.sql.functions._
import graft.operators.Concentration

/** Revenue concentration: the two-phase distributed rank against the
  * naive single-window form, plus Lorenz/Gini identities. */
class ConcentrationSpec extends SparkSpec {

  test("two-phase global rank ≡ naive single-window row_number") {
    val two = Concentration.rankedSpend(spark, sf0001)
      .select("o_custkey", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("spend"), col("o_custkey"))
    val naive = Tables(spark, sf0001, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select("o_custkey", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(two == naive)
    assert(two.values.toSeq.sorted == (1L to two.size).toSeq,
      "ranks must be a permutation of 1..n")
  }

  test("deciles: headcounts and revenue partition the base; " +
      "cumulative share ends at 100%") {
    val d = Concentration.spendDeciles(spark, sf0001).collect()
    assert(d.map(_.getLong(0)).toSeq == (0L to 9L))
    val buyers = Tables(spark, sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(d.map(_.getLong(1)).sum == buyers)
    assert(math.abs(d.map(_.getDouble(3)).sum - 100.0) < 0.01)
    assert(d.last.getDouble(4) == 100.0)
    // Lorenz: ascending-rank deciles have nondecreasing revenue share
    val shares = d.map(_.getDouble(3))
    shares.sliding(2).foreach(p => assert(p(0) <= p(1) + 1e-9,
      s"Lorenz shares must be nondecreasing: ${shares.toSeq}"))
  }

  test("gini matches a driver-side recompute and sits in [0, 1)") {
    val g = Concentration.spendGini(spark, sf0001).collect().head
    val spends = Tables(spark, sf0001, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("s"))
      .select("s").collect().map(_.getDouble(0)).sorted
    val n = spends.length
    val srx = spends.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expect = 2.0 * srx / (n * spends.sum) - (n + 1.0) / n
    assert(g.getLong(0) == n)
    assert(math.abs(g.getDouble(2) - expect) < 1e-4, s"$g vs $expect")
    assert(g.getDouble(2) >= 0.0 && g.getDouble(2) < 1.0)
  }
}
