package graft

import org.apache.spark.sql.functions._
import graft.operators.Rfm

/** RFM segmentation invariants on sf0.001. */
class RfmSpec extends SparkSpec {

  test("cells census the purchasing customers exactly; codes in range;" +
    " quintile axes balanced by the floor rule") {
    val cells = Rfm.customerRfmSegments(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val buyers = Tables(spark, sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(cells.map(_._2).sum == buyers,
      "cells must partition the purchasing customers")
    cells.foreach { case (code, n, spend) =>
      val (r, f, m) = (code / 100, code / 10 % 10, code % 10)
      assert(Seq(r, f, m).forall(q => q >= 1 && q <= 5), s"code $code")
      assert(n > 0 && spend > 0)
    }
    // floor rule: each axis puts between floor(n/5) and ceil(n/5)
    // customers in every quintile
    val lo = buyers / 5; val hi = (buyers + 4) / 5
    Seq[Long => Long](_ / 100, c => c / 10 % 10, _ % 10).foreach { ax =>
      val byQ = cells.groupBy(c => ax(c._1)).view
        .mapValues(_.map(_._2).sum).toMap
      (1L to 5L).foreach { q =>
        assert(byQ.getOrElse(q, 0L) >= lo && byQ.getOrElse(q, 0L) <= hi,
          s"axis quintile $q holds ${byQ.getOrElse(q, 0L)} of $buyers")
      }
    }
    // spend mass conserved
    val total = Tables(spark, sf0001, "orders")
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"))).first().getLong(0)
    assert(cells.map(_._3).sum == total, "spend mass leaked")
  }
}
