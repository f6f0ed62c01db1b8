package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ScalarFns

/** COHORT RETENTION MATRIX — the classic product-analytics rollup the
  * reference's recency/activity segmentation (`tools.py:60-72`,
  * months-since-last-purchase) is a point query of: bucket every
  * customer by FIRST-purchase month (the cohort), then for each
  * (cohort, months-since-first) cell count how many of that cohort's
  * customers were active again — the full retention triangle instead
  * of one "active in the last N months" slice.
  *
  * Scale shape — the one-shuffle cohort build: a per-customer
  * `collect_set` of active months is BOUNDED BY THE CALENDAR (≤ one
  * entry per month the table spans, ~84 at TPC-H date range), never by
  * order count, so the whole matrix derives from ONE customer-keyed
  * partial aggregation carrying (first-month, month-set) — no
  * activity×first-purchase self-join of the orders fact, which is the
  * naive two-scan formulation. The explode that follows fans out to at
  * most |cohorts|·|offsets| rows per customer (calendar-bounded), and
  * the final (cohort, offset) aggregation is a tiny rollup. Cohort
  * sizes are the matrix's own offset-0 column — broadcast back (the
  * dimension is |months|, trivially broadcastable at any corpus
  * scale) to attach denominators and retention percentages.
  *
  * Month arithmetic is pure integers ((Δyear)·12 + Δmonth) — no
  * date-diff function semantics to reconcile across engines — and the
  * percentage goes through the [[ScalarFns.roundN]]/`roundSql` pair,
  * so every cell is bit-exact against the DuckDB twin.
  */
object Cohorts {

  /** GRADED: (cohort_month, month_offset) → active distinct customers,
    * cohort size, retention %. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables(spark, dir, "orders").select(
      col("o_custkey"),
      date_trunc("month", col("o_orderdate")).as("am"))
    // ONE customer-keyed shuffle; per-customer state calendar-bounded
    val per = m.groupBy(col("o_custkey"))
      .agg(min(col("am")).as("cm"), collect_set(col("am")).as("months"))
    val x = per.select(col("cm"), explode(col("months")).as("am"))
      .withColumn("month_offset",
        ((year(col("am")) - year(col("cm"))) * 12 +
          (month(col("am")) - month(col("cm")))).cast("long"))
    val counts = x.groupBy(col("cm"), col("month_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = counts.filter(col("month_offset") === 0)
      .select(col("cm").as("scm"), col("n_active").as("cohort_size"))
    counts.join(broadcast(sizes), col("cm") === col("scm"))
      .select(
        to_date(col("cm")).as("cohort_month"),
        col("month_offset"),
        col("n_active"),
        col("cohort_size"),
        ScalarFns.roundN(
          col("n_active") * lit(100.0) / col("cohort_size"), 2)
          .as("retention_pct"))
      .orderBy(col("cohort_month"), col("month_offset"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cohort_retention" -> (cohortRetention(_, _)))

  val oracles: Map[String, String] = Map(
    "cohort_retention" ->
      s"""WITH m AS (
         |  SELECT DISTINCT o_custkey,
         |    date_trunc('month', o_orderdate) AS am
         |  FROM orders),
         |f AS (SELECT o_custkey, min(am) AS cm FROM m GROUP BY 1),
         |x AS (
         |  SELECT f.cm,
         |    CAST((year(m.am) - year(f.cm)) * 12 +
         |         (month(m.am) - month(f.cm)) AS BIGINT) AS month_offset
         |  FROM m JOIN f USING (o_custkey)),
         |c AS (
         |  SELECT cm, month_offset, count(*) AS n_active
         |  FROM x GROUP BY 1, 2),
         |s AS (SELECT cm, n_active AS cohort_size FROM c
         |      WHERE month_offset = 0)
         |SELECT CAST(c.cm AS DATE) AS cohort_month, c.month_offset,
         |  c.n_active, s.cohort_size,
         |  ${ScalarFns.roundSql(
             "c.n_active * 100.0 / s.cohort_size", 2)} AS retention_pct
         |FROM c JOIN s USING (cm)
         |ORDER BY 1, 2""".stripMargin)
}
