package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MULTI-TOUCH ATTRIBUTION — the marketing-analytics operator the
  * reference's event-marketing domain runs daily: credit each
  * purchase's value to the touchpoints (views) that preceded it. The
  * repo already grades the LAST-touch family (the as-of joins:
  * `asof_order_before_event` — one winner per outcome); LINEAR
  * attribution is the genuinely multi-touch case: every view of the
  * same user within the lookback window before a purchase receives an
  * equal share of that purchase's value.
  *
  * Determinism (the hash gate): shares are 1/n with n data-dependent,
  * so float division would smear cross-engine. All credit arithmetic
  * is INTEGER: value → exact decimal(18,4) → micro-units (×10⁴, a
  * BIGINT), each view's credit = `(vu · 10⁶) div n` (floor — both
  * engines, nonneg operands), summed as BIGINT; the displayed value
  * is ONE double division by a constant at the very end. The ppm
  * remainder a floor loses is ≤ n·10⁻⁶ micro-units per purchase —
  * reported exactly by construction since the oracle floors
  * identically.
  *
  * Scale: views ⋈ purchases is a user-keyed equi-join with an
  * interval predicate riding it (never a cross join); the per-purchase
  * fan-out n is bounded by the lookback window, and the credit
  * aggregation is one partial-agg shuffle at (hour) granularity. At
  * 100 TB this is the classic sessionized-attribution shape: both
  * sides partition by user, the window predicate evaluates inside the
  * joined partition.
  */
object Attribution {

  /** GRADED: per view-hour linear attribution — how much purchase
    * value each hour's touchpoints earned, in exact micro-units. */
  def attributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("vid"), col("ts").as("vts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"),
        (col("value").cast("decimal(18,4)") * 10000).cast("long").as("vu"))
    val j = v.join(p, Seq("user_id"))
      .filter(col("vts") <= col("pts") &&
        col("vts") >= col("pts") - expr("INTERVAL 1 HOUR"))
    // per-purchase touch count: the 1/n denominator
    val n = j.groupBy(col("pid")).agg(count(lit(1)).as("n"))
    j.join(n, Seq("pid"))
      .withColumn("credit", expr("(vu * 1000000L) div n"))
      .groupBy(hour(col("vts")).cast("long").as("view_hour"))
      .agg(count(lit(1)).as("n_views"),
        countDistinct(col("pid")).as("n_purchases"),
        sum(col("credit")).as("credited_micro"))
      .select(col("view_hour"), col("n_views"), col("n_purchases"),
        col("credited_micro"),
        graft.functions.ScalarFns.roundN(
          col("credited_micro").cast("double") / 1e10, 4)
          .as("credited_value"))
      .orderBy("view_hour")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attribution_linear" -> (attributionLinear(_, _)))

  val oracles: Map[String, String] = Map(
    "attribution_linear" ->
      s"""WITH v AS (
         |  SELECT user_id, event_id AS vid, ts AS vts
         |  FROM events WHERE event_type = 'view'),
         |p AS (
         |  SELECT user_id, event_id AS pid, ts AS pts,
         |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS vu
         |  FROM events WHERE event_type = 'purchase'),
         |j AS (
         |  SELECT v.vts, p.pid, p.vu
         |  FROM v JOIN p ON v.user_id = p.user_id
         |    AND v.vts <= p.pts
         |    AND v.vts >= p.pts - INTERVAL 1 HOUR),
         |nn AS (SELECT pid, count(*) AS n FROM j GROUP BY 1),
         |c AS (
         |  SELECT j.vts, j.pid, (j.vu * 1000000) // nn.n AS credit
         |  FROM j JOIN nn USING (pid))
         |SELECT CAST(hour(vts) AS BIGINT) AS view_hour,
         |  count(*) AS n_views,
         |  CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
         |  CAST(sum(credit) AS BIGINT) AS credited_micro,
         |  ${graft.functions.ScalarFns.roundSql(
            "sum(credit) / 10000000000.0", 4)} AS credited_value
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)
}
