package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** KEYSET (seek) PAGINATION — the serving-layer page query every
  * dashboard needs past page 1 (reference provenance: the demo's
  * preview endpoints, `crm_demo/app.py:141-166`, return row pages).
  * OFFSET pagination is O(offset) per page — page 10 000 of a 100 TB
  * fact scans and discards 10 000 pages of rows; keyset pagination
  * turns the page boundary into a PREDICATE on the total order
  * ((date, key) > cursor), so the scan prunes to the cursor's tail and
  * the page costs filter + top-k regardless of page number.
  *
  * The graded query answers page 3 (rows 41–60) of orders in
  * (o_orderdate, o_orderkey) order BOTH ways at once: the Spark side
  * is the keyset form (cursor = max (date, key) of the first 40 rows,
  * derived in-plan by a top-40 TakeOrderedAndProject — in production
  * the client carries it), the ORACLE is the OFFSET form (`ORDER BY …
  * LIMIT 20 OFFSET 40`) — a genuinely different formulation, so the
  * hash match proves the keyset ≡ offset equivalence, which holds IFF
  * the sort is TOTAL (the tie-breaking key column is the entire
  * point: the corpus has duplicate dates, so date-only pages would be
  * ambiguous — PagingSpec pins both facts).
  */
object Paging {

  private val PageSize = 20
  private val Skip = 40 // two pages — the graded page is page 3

  def ordersPageKeyset(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val cursor = o.orderBy(col("o_orderdate"), col("o_orderkey"))
      .limit(Skip)
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("cur"))
    o.crossJoin(broadcast(cursor))
      .filter(col("o_orderdate") > col("cur.o_orderdate") ||
        (col("o_orderdate") === col("cur.o_orderdate") &&
          col("o_orderkey") > col("cur.o_orderkey")))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .limit(PageSize)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_page_keyset" -> (ordersPageKeyset _))

  val oracles: Map[String, String] = Map(
    // the OFFSET formulation — independent of the keyset predicate
    "orders_page_keyset" ->
      s"""SELECT o_orderkey, o_custkey, o_orderdate
         |FROM orders
         |ORDER BY o_orderdate, o_orderkey
         |LIMIT $PageSize OFFSET $Skip""".stripMargin)
}
