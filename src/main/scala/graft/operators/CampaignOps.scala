package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ScalarFns._

/** The reference's non-relational tools re-expressed as deterministic
  * column pipelines:
  *
  *  - U1 `generate_campaign_copy` (`tools.py:84-154`): prompt → LLM →
  *    regex+JSON parse → fallback template. The fallback path
  *    (`tools.py:146-154`) is a pure function of (event, date) — that is
  *    what we implement (zero-egress: no model calls in this repo). The
  *    LLM path is the same shape: text in → struct out.
  *  - S4 `schedule_campaign` (`tools.py:159-185`): builds confirmation
  *    rows; F10 ids become content hashes (deterministic, oracle-safe).
  *  - S5 idempotent writes (`SCALING.md:120`): duplicate schedule
  *    requests collapse to one row via dropDuplicates on the natural key.
  *  - F7 SMS length budget (`CampaignPreview.tsx:92-93`: >160 flagged).
  *
  * Everything is a codegen'd expression over a grouped frame — the "per
  * segment" cardinality is tiny relative to the fact tables, and the copy
  * template runs post-aggregation, so at 100 TB this is a no-shuffle tail
  * on an already-reduced result.
  */
object CampaignOps {

  /** Deterministic copy template — the reference's fallback copy
    * (`tools.py:147-153`) as columns. */
  def copyTemplate(eventName: Column, sendDate: Column): Seq[Column] = Seq(
    concat(lit("You're invited: "), eventName).as("email_subject"),
    concat(lit("Don't miss "), eventName, lit(" on "), sendDate).as("email_preview"),
    concat(lit("Hi there, "), eventName, lit(" is happening on "), sendDate,
      lit(". We'd love to see you there. Tickets are moving fast!")).as("email_body"),
    concat(eventName, lit(" - "), sendDate,
      lit(". Get your tickets now!")).as("sms_body"))

  /** Per-segment audiences with campaign copy + schedule confirmation.
    * One row per market segment: audience stats (A4), copy struct
    * (U1, flattened for oracle hashing), schedule row (S4), SMS length
    * flag (F7). */
  def campaignDrafts(spark: SparkSession, dir: String): DataFrame = {
    val sendDate = lit("2001-09-15")
    val c = Tables(spark, dir, "customer")
    val seg = c.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("audience_size"), rateAvg(col("c_acctbal")).as("avg_acctbal"))
      .withColumn("event_name",
        concat(lit("The "), lower(col("c_mktsegment")), lit(" sessions")))
    val withCopy = seg.select(
      (Seq(col("c_mktsegment"), col("audience_size"), col("avg_acctbal"),
        col("event_name")) ++ copyTemplate(col("event_name"), sendDate)): _*)
    withCopy
      // L2 remainder arithmetic (`AudienceCard.tsx:34-37`: "N more fans"
      // beyond the 5-row preview)
      .withColumn("more_fans",
        greatest(col("audience_size") - 5, lit(0L)).cast("bigint"))
      .withColumn("sms_len", length(col("sms_body")).cast("bigint"))
      .withColumn("sms_over_budget", length(col("sms_body")) > 160)
      .withColumn("segment_id", contentId("seg_", col("c_mktsegment")))
      .withColumn("campaign_id",
        contentId("cmp_", concat_ws("|", col("c_mktsegment"), col("event_name"), sendDate)))
      .withColumn("send_at", to_timestamp(concat(sendDate, lit(" 10:00:00"))))
      .withColumn("status", lit("scheduled"))
      .orderBy("c_mktsegment")
  }

  /** S5: the same schedule request submitted twice produces one row per
    * campaign (idempotent-write semantics via natural-key dedup). */
  def idempotentSchedule(spark: SparkSession, dir: String): DataFrame = {
    val once = campaignDrafts(spark, dir)
      .select(col("campaign_id"), col("segment_id"), col("event_name"),
        col("audience_size"), col("send_at"), col("status"))
    once.union(once).dropDuplicates("campaign_id").orderBy("campaign_id")
  }

  /** F-coverage showcase (F2/F3/F5/F7/F10/F12/F13 + length) — scalar
    * library over customers, projection-only (no shuffle). */
  def scalarShowcase(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .filter(containsIgnoreCase(col("c_name"), "customer#00000"))
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("name_lower"),
        substring(col("c_name"), 1, 1).as("initial"),
        length(col("c_name")).cast("bigint").as("name_len"),
        contentId("cmp_", col("c_name")).as("content_id"),
        concat(lit("You're invited: "), col("c_name")).as("invite"),
        roundN(col("c_acctbal"), 2).as("acctbal_2dp"))
      .orderBy("c_custkey")
      .limit(100)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "campaign_drafts"     -> (campaignDrafts _),
    "idempotent_schedule" -> (idempotentSchedule _),
    "scalar_showcase"     -> (scalarShowcase _))

  val oracles: Map[String, String] = Map(
    "campaign_drafts" ->
      s"""WITH seg AS (
        |  SELECT c_mktsegment, count(*) AS audience_size,
        |    ${roundSql("CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)", 2)} AS avg_acctbal,
        |    'The ' || lower(c_mktsegment) || ' sessions' AS event_name
        |  FROM customer GROUP BY 1)
        |SELECT c_mktsegment, audience_size, avg_acctbal, event_name,
        |  CAST(greatest(audience_size - 5, 0) AS BIGINT) AS more_fans,
        |  'You''re invited: ' || event_name AS email_subject,
        |  'Don''t miss ' || event_name || ' on 2001-09-15' AS email_preview,
        |  'Hi there, ' || event_name || ' is happening on 2001-09-15. We''d love to see you there. Tickets are moving fast!' AS email_body,
        |  event_name || ' - 2001-09-15. Get your tickets now!' AS sms_body,
        |  CAST(length(event_name || ' - 2001-09-15. Get your tickets now!') AS BIGINT) AS sms_len,
        |  length(event_name || ' - 2001-09-15. Get your tickets now!') > 160 AS sms_over_budget,
        |  'seg_' || substr(md5(c_mktsegment), 1, 8) AS segment_id,
        |  'cmp_' || substr(md5(c_mktsegment || '|' || event_name || '|' || '2001-09-15'), 1, 8) AS campaign_id,
        |  TIMESTAMP '2001-09-15 10:00:00' AS send_at,
        |  'scheduled' AS status
        |FROM seg ORDER BY c_mktsegment""".stripMargin,
    "idempotent_schedule" ->
      """WITH seg AS (
        |  SELECT c_mktsegment, count(*) AS audience_size,
        |    'The ' || lower(c_mktsegment) || ' sessions' AS event_name
        |  FROM customer GROUP BY 1)
        |SELECT DISTINCT
        |  'cmp_' || substr(md5(c_mktsegment || '|' || event_name || '|' || '2001-09-15'), 1, 8) AS campaign_id,
        |  'seg_' || substr(md5(c_mktsegment), 1, 8) AS segment_id,
        |  event_name, audience_size,
        |  TIMESTAMP '2001-09-15 10:00:00' AS send_at,
        |  'scheduled' AS status
        |FROM seg ORDER BY campaign_id""".stripMargin,
    "scalar_showcase" ->
      s"""SELECT c_custkey,
        |  lower(c_name) AS name_lower,
        |  substr(c_name, 1, 1) AS initial,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  'cmp_' || substr(md5(c_name), 1, 8) AS content_id,
        |  'You''re invited: ' || c_name AS invite,
        |  ${roundSql("c_acctbal", 2)} AS acctbal_2dp
        |FROM customer
        |WHERE contains(lower(c_name), 'customer#00000')
        |ORDER BY c_custkey LIMIT 100""".stripMargin)
}
