package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** The custom as-of join exec vs a window-function reference
  * implementation, plus edge semantics. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val trades = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 11:00:00")),
    (3L, 20L, ts("2024-01-01 10:30:00")),
    (4L, 30L, ts("2024-01-01 09:00:00")) // key with no quotes at all
  ).toDF("trade_id", "t_key", "t_ts")

  lazy val quotes = Seq(
    (10L, ts("2024-01-01 09:55:00"), 1.0),
    (10L, ts("2024-01-01 10:30:00"), 2.0), // between trade 1 and 2
    (10L, ts("2024-01-01 12:00:00"), 3.0), // after everything
    (20L, ts("2024-01-01 10:30:00"), 5.0)  // exactly equal time: matches
  ).toDF("q_key", "q_ts", "price")

  test("as-of picks the latest right row at-or-before each left time") {
    val r = AsOf.join(trades, quotes,
        trades("t_key"), quotes("q_key"), trades("t_ts"), quotes("q_ts"))
      .select($"trade_id", $"price").orderBy("trade_id").collect()
    assert(r.map(x => (x.getLong(0), Option(x.get(1)))).toSeq == Seq(
      (1L, Some(1.0)), // 09:55 quote
      (2L, Some(2.0)), // 10:30 quote; 12:00 one is in the future
      (3L, Some(5.0)), // boundary: q_ts == t_ts matches (<=)
      (4L, None)))     // no quotes for key 30 → left outer null
  }

  test("matches the window-function reference implementation on real data") {
    val e = Tables(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"ts")
    val o = Tables(spark, sf0001, "orders")
      .select($"o_custkey", $"o_orderdate")
    val viaAsof = graft.operators.Joins.asofOrderBeforeEvent(spark, sf0001)
      .select("event_id", "last_order_date")

    val viaWindow = e.join(o,
        e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"), "left")
      .withColumn("rn", row_number().over(Window.partitionBy("event_id")
        .orderBy(col("o_orderdate").desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"event_id", to_date($"o_orderdate").as("last_order_date"))

    assert(viaAsof.count() == e.count()) // exactly one output row per left row
    assert(viaAsof.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAsof).count() == 0)
  }

  test("survives repartitioning of inputs (distribution requirement works)") {
    val r = AsOf.join(trades.repartition(7), quotes.repartition(3),
        trades("t_key"), quotes("q_key"), trades("t_ts"), quotes("q_ts"))
      .count()
    assert(r == 4L)
  }

  test("forward direction picks the EARLIEST right row at-or-after") {
    val r = AsOf.join(trades, quotes,
        trades("t_key"), quotes("q_key"), trades("t_ts"), quotes("q_ts"),
        forward = true)
      .select($"trade_id", $"price").orderBy("trade_id").collect()
    assert(r.map(x => (x.getLong(0), Option(x.get(1)))).toSeq == Seq(
      (1L, Some(2.0)), // next quote after 10:00 is 10:30
      (2L, Some(3.0)), // next after 11:00 is 12:00
      (3L, Some(5.0)), // boundary: q_ts == t_ts matches (>=)
      (4L, None)))
  }

  test("forward match is not consumed: several lefts can share one right") {
    val lefts = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:05:00")),
      (3L, 10L, ts("2024-01-01 10:10:00"))).toDF("trade_id", "t_key", "t_ts")
    val r = AsOf.join(lefts, quotes,
        lefts("t_key"), quotes("q_key"), lefts("t_ts"), quotes("q_ts"),
        forward = true)
      .select($"price").as[Double].collect()
    assert(r.toSeq == Seq(2.0, 2.0, 2.0)) // all resolve to the 10:30 quote
  }

  test("tolerance with non-timestamp time columns is rejected at plan time") {
    // epoch-SECONDS Long columns would make the micros-encoded tolerance
    // silently off by 1e6 — the API must refuse, not mis-join
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 90L)).toDF("rk", "rt")
    val ex = intercept[IllegalArgumentException] {
      AsOf.join(l, r, l("k"), r("rk"), l("t"), r("rt"),
        tolerance = Some(java.time.Duration.ofSeconds(30)))
    }
    assert(ex.getMessage.contains("tolerance requires timestamp time columns"))
    // without tolerance, raw Long time columns remain legal (compared
    // in their own encoding, as documented)
    assert(AsOf.join(l, r, l("k"), r("rk"), l("t"), r("rt")).count() == 1)
  }

  test("duplicate left timestamps: every tied left row gets the same match") {
    // the merge cursor must not consume the right match on the first of
    // several equal-time left rows
    val l = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:00:00")), // tie with trade 1
      (3L, 10L, ts("2024-01-01 10:00:00")), // and again
      (4L, 10L, ts("2024-01-01 11:00:00"))
    ).toDF("id", "k", "t")
    val r = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 10:30:00"), 2.0)
    ).toDF("rk", "rt", "v")
    val back = AsOf.join(l, r, l("k"), r("rk"), l("t"), r("rt"))
      .select($"id", $"v").orderBy("id").collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(back == Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 2.0)))
    val r2 = Seq(
      (10L, ts("2024-01-01 10:30:00"), 2.0),
      (10L, ts("2024-01-01 12:00:00"), 3.0)
    ).toDF("rk", "rt", "v")
    val fwd = AsOf.join(l, r2, l("k"), r2("rk"), l("t"), r2("rt"),
        forward = true)
      .select($"id", $"v").orderBy("id").collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(fwd == Seq((1L, 2.0), (2L, 2.0), (3L, 2.0), (4L, 3.0)))
  }

  test("tolerance nulls out matches beyond the bound (both directions)") {
    val tol = Some(java.time.Duration.ofMinutes(10))
    val back = AsOf.join(trades, quotes,
        trades("t_key"), quotes("q_key"), trades("t_ts"), quotes("q_ts"),
        tolerance = tol)
      .select($"trade_id", $"price").orderBy("trade_id").collect()
    assert(back.map(x => (x.getLong(0), Option(x.get(1)))).toSeq == Seq(
      (1L, Some(1.0)), // 5 min back: within
      (2L, None),      // 30 min back: beyond tolerance
      (3L, Some(5.0)), // 0 min: within
      (4L, None)))
    val fwd = AsOf.join(trades, quotes,
        trades("t_key"), quotes("q_key"), trades("t_ts"), quotes("q_ts"),
        forward = true, tolerance = tol)
      .select($"trade_id", $"price").orderBy("trade_id").collect()
    assert(fwd.map(x => (x.getLong(0), Option(x.get(1)))).toSeq == Seq(
      (1L, None),      // 30 min forward: beyond
      (2L, None),      // 60 min forward: beyond
      (3L, Some(5.0)), // 0 min: within
      (4L, None)))
  }
}
