package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Event-funnel invariants on sf0.001: hop counts are monotone
  * (views ≥ clicked ≥ converted per day and in total), the totals
  * reconcile with direct per-hop recounts, and the composition matches
  * a window-function reference derivation computed without the custom
  * as-of exec. */
class FunnelSpec extends SparkSpec {

  test("funnel totals reconcile and are monotone") {
    val rows = Joins.eventFunnel(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, c, p) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(v >= c && c >= p, s"non-monotone day ${r.get(0)}: $v/$c/$p")
      assert(r.getLong(4) <= p, "more converted users than conversions")
    }
    val totalViews = rows.map(_.getLong(1)).sum
    val nViews = Tables(spark, sf0001, "events")
      .filter(col("event_type") === "view").count()
    assert(totalViews == nViews, s"$totalViews vs $nViews views")
  }

  test("as-of composition matches a min-over-future window reference") {
    // reference: for each view, min future same-user click within 24h,
    // then min future purchase within 24h of that click — derived with
    // plain joins + groupBy (quadratic but fine at sf0.001)
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id").as("u"), col("ts").as("vts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val tolSec = 24L * 3600
    val firstClick = v.join(c, col("u") === col("cu") &&
        col("cts") >= col("vts") &&
        unix_micros(col("cts")) - unix_micros(col("vts")) <= tolSec * 1000000L,
        "left")
      .groupBy(col("event_id"), col("u"), col("vts"))
      .agg(min(col("cts")).as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val firstPurchase = firstClick.filter(col("cts").isNotNull)
      .join(p, col("u") === col("pu") &&
        col("pts") >= col("cts") &&
        unix_micros(col("pts")) - unix_micros(col("cts")) <= tolSec * 1000000L,
        "left")
      .groupBy(col("event_id"), col("vts"))
      .agg(min(col("pts")).as("pts"))
    val refDaily = firstClick
      .join(firstPurchase.select(col("event_id"), col("pts")),
        Seq("event_id"), "left")
      .groupBy(to_date(col("vts")).as("day"))
      .agg(count(lit(1)).as("n_views"), count(col("cts")).as("n_clicked"),
        count(col("pts")).as("n_converted"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = Joins.eventFunnel(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == refDaily)
  }

  test("funnel latency quartiles equal a from-scratch recompute with " +
      "member-value (disc) semantics") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val views = ev.filter(_._4 == "view")
    val lat = ev.filter(_._4 == "purchase").flatMap { case (u, pts, _, _) =>
      val vs = views.filter(v => v._1 == u && v._2 <= pts &&
        v._2 >= pts - 3600000000L)
      if (vs.isEmpty) None
      else Some(((pts / 1000000L / 3600L) % 24L, (pts - vs.map(_._2).min) / 1000000L))
    }
    def disc(xs: Seq[Long], q: Double): Long = {
      val s = xs.sorted
      s(math.ceil(q * s.length).toInt.max(1) - 1)
    }
    val expected = lat.groupBy(_._1).toSeq.map { case (h, xs) =>
      val ls = xs.map(_._2).toSeq
      (h, ls.length.toLong, disc(ls, 0.25), disc(ls, 0.5), disc(ls, 0.75),
        ls.max)
    }.sortBy(_._1)
    val got = graft.operators.EventOps.funnelLatencyQuartiles(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    got.foreach { r =>
      assert(r._3 <= r._4 && r._4 <= r._5 && r._5 <= r._6,
        s"quartiles not monotone: $r")
    }
  }
}
