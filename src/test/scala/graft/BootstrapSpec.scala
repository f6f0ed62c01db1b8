package graft

import org.apache.spark.sql.functions._
import graft.operators.Bootstrap

/** Poisson-bootstrap invariants on sf0.001. */
class BootstrapSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def expectedCnt(key: String, replica: Int): Long = {
    val u = java.lang.Long.parseLong(
      md5hex(s"$key:$replica").substring(0, 8), 16)
    val k = Bootstrap.CdfThresholds.indexWhere(u < _)
    if (k < 0) 6L else k.toLong
  }

  test("the per-row multiplicity is the exact inverse-CDF draw " +
    "(independent JVM-md5 recount of replica 0)") {
    val keys = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey").cast("string"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expectedN = keys.map(k => expectedCnt(k._1, 0)).sum
    val expectedS = keys.map(k => expectedCnt(k._1, 0) * k._2).sum
    val r0 = Bootstrap.bootstrapPriceMeans(spark, sf0001)
      .filter(col("replica") === 0).collect()(0)
    assert(r0.getLong(1) == expectedN, "replica-0 draw count drifted")
    val expectedMean = BigInt(expectedS) * 1000000 / BigInt(expectedN)
    assert(r0.getLong(2) == expectedMean.toLong,
      "replica-0 micro-cent mean drifted")
  }

  test("every replica draws ~n rows; the CI brackets the point " +
    "estimate and matches the order statistics") {
    val means = Bootstrap.bootstrapPriceMeans(spark, sf0001).collect()
    assert(means.length == Bootstrap.B)
    val n = Tables(spark, sf0001, "orders").count()
    means.foreach { r =>
      val draws = r.getLong(1)
      assert(draws > (0.8 * n).toLong && draws < (1.2 * n).toLong,
        s"replica ${r.getLong(0)} drew $draws of $n — not Poisson(1)-like")
    }
    val ci = Bootstrap.bootstrapPriceCi(spark, sf0001).collect()(0)
    val sorted = means.map(_.getLong(2)).sorted
    // percentile_disc(0.05)/(0.95) over 32 values = the 2nd and 31st
    // order statistics (ceil(.05*32)=2, ceil(.95*32)=31)
    assert(ci.getLong(2) == sorted(1), "ci_lo is not the 2nd order stat")
    assert(ci.getLong(3) == sorted(30), "ci_hi is not the 31st order stat")
    assert(ci.getLong(2) <= ci.getLong(1) && ci.getLong(1) <= ci.getLong(3),
      "point estimate outside the 90% CI")
  }

  test("grouped CI: one row per priority, each interval brackets its " +
    "own point estimate and is non-degenerate") {
    val g = Bootstrap.bootstrapGroupCi(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val prios = Tables(spark, sf0001, "orders")
      .select("o_orderpriority").distinct().count()
    assert(g.length == prios)
    g.foreach { case (p, point, lo, hi) =>
      assert(lo <= hi, s"$p: inverted interval")
      assert(lo <= point && point <= hi, s"$p: point outside CI")
      assert(lo < hi, s"$p: degenerate interval (replicas identical)")
    }
  }
}
