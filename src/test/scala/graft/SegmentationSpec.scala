package graft

import org.apache.spark.sql.functions._
import graft.operators.Segmentation
import graft.operators.Segmentation.SegmentFilter

class SegmentationSpec extends SparkSpec {
  import spark.implicits._

  // Tiny literal fixture in the customer/orders shape (FIXTURES.md §1
  // boundary cases: exact-threshold spend, boundary recency, no orders).
  lazy val customer = Seq(
    (1L, "Ann Chicago", 1, 10.0, "BUILDING"),
    (2L, "Bob", 1, 20.0, "building"),
    (3L, "Cat", 2, 30.0, "MACHINERY"),
    (4L, "Dan", 2, 40.0, "BUILDING") // no orders
  ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  lazy val orders = Seq(
    // custkey, price, date           (asOf = 2001-08-01)
    (1L, 500.0, "2001-07-30"),  // 0.07 months ago
    (1L, 600.0, "2000-01-01"),
    (2L, 1000.0, "2001-01-01"), // ~7 months ago, spend exactly 1000
    (3L, 5000.0, "2000-06-01")
  ).map { case (k, p, d) => (k, p, java.sql.Timestamp.valueOf(d + " 00:00:00")) }
    .toDF("o_custkey", "o_totalprice", "o_orderdate")

  lazy val act = Segmentation.activity(customer, orders, "2001-08-01").cache()

  test("P1: all-absent filter is identity") {
    assert(Segmentation.stats(act, SegmentFilter()).first().getLong(0) == 4L)
  }

  test("P1: falsiness — empty segments/name disable, Some(0) stays active") {
    val f = SegmentFilter(segments = Nil, nameContains = "",
      minTotalSpent = Some(0.0))
    // spend >= 0 still excludes Dan (null spend), like SQL WHERE
    assert(Segmentation.stats(act, f).first().getLong(0) == 3L)
  }

  test("P2 analog: segment match is case-insensitive equality") {
    val f = SegmentFilter(segments = Seq("Building"))
    assert(Segmentation.stats(act, f).first().getLong(0) == 3L)
    // not substring: "BUILD" must NOT match
    val f2 = SegmentFilter(segments = Seq("build"))
    assert(Segmentation.stats(act, f2).first().getLong(0) == 0L)
  }

  test("P3/P5: recency + spend thresholds (boundary inclusive)") {
    val f = SegmentFilter(minMonthsSinceLast = Some(3.0),
      minTotalSpent = Some(1000.0))
    // cust2: 212 days / 30.44 = 6.96 months, spend == 1000 → in
    // cust1: last order 2 days ago → out; cust3: spend 5000, 14 months → in
    assert(Segmentation.stats(act, f).first().getLong(0) == 2L)
  }

  test("P6: name filter is case-insensitive SUBSTRING") {
    val f = SegmentFilter(nameContains = "chi")
    assert(Segmentation.stats(act, f).first().getLong(0) == 1L)
  }

  test("P8: empty segment yields zero-struct, not empty frame") {
    val f = SegmentFilter(segments = Seq("nosuch"))
    val r = Segmentation.stats(act, f).first()
    assert(r.getLong(0) == 0L)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    assert(r.getString(3).startsWith("seg_") && r.getString(3).length == 12)
  }

  test("A2: avg is decimal-sum-then-divide, rounded 2dp") {
    val f = SegmentFilter(segments = Seq("building"),
      minMonthsSinceLast = Some(0.0))
    // cust1 spend 1100, cust2 spend 1000 → avg 1050.0
    val r = Segmentation.stats(act, f).first()
    assert(r.getDouble(1) == 1050.0)
  }

  test("L1/P7: preview is id-ordered prefix with 9 columns") {
    val nation = Seq((1, "NATION_1"), (2, "NATION_2"))
      .toDF("n_nationkey", "n_name")
    val p = Segmentation.preview(act, nation, SegmentFilter(), k = 2)
    assert(p.columns.length == 9)
    assert(p.select("c_custkey").as[Long].collect().toSeq == Seq(1L, 2L))
  }

  test("monotonicity: adding a predicate never increases count") {
    val base = Segmentation.stats(act, SegmentFilter(segments = Seq("building")))
      .first().getLong(0)
    val more = Segmentation.stats(act,
      SegmentFilter(segments = Seq("building"), minTotalSpent = Some(1050.0)))
      .first().getLong(0)
    assert(more <= base)
  }

  test("flagship entry returns a row on sf0.001") {
    assert(SparkEntry.entry(spark).count() == 1L)
  }
}
