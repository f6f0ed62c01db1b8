package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join ≡ plain join (same rows, spread partitioning). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-equivalent to the plain equi-join") {
    val orders = Tables(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val customer = Tables(spark, sf0001, "customer")
      .select($"c_custkey", $"c_mktsegment")

    val plain = orders.join(customer, $"o_custkey" === $"c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).as("rev"))

    val salted = Skew.saltedJoin(orders, customer,
        "o_custkey", "c_custkey", col("o_orderkey"), n = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).as("rev"))

    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salt actually spreads a hot key over multiple partitions") {
    // one hot key: every probe row has key 1
    val probe = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "id")
    val build = Seq((1L, "hot")).toDF("k", "tag")
    val joined = Skew.saltedJoin(probe, build, "k", "k", col("id"), n = 8)
    assert(joined.count() == 1000)
    // the pre-join salted probe occupies all 8 salt values
    val salts = probe.withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts == 8)
  }
}
