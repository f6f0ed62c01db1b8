package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ScalarFns.{roundN, roundSql}

/** FREQUENT-PAIR MARKET-BASKET MINING — association rules over the
  * order/part bipartite graph: which parts co-occur in the same order
  * more often than minimum support, with support / confidence / lift
  * (the Agrawal-Srikant a-priori family, pair depth — the analytics
  * behind "customers who bought X also bought Y", and in a training
  * -data pipeline the co-occurrence statistic behind token/tag
  * affinity audits). Generalizes the reference's genre-overlap
  * segment filter (`tools.py:30-41` matches fans whose genre SETS
  * overlap a query set) from filter to corpus-wide mining.
  *
  * A-PRIORI PRUNING IN-PLAN: support is antimonotone — a pair seen s
  * times needs both items seen ≥ s times — so baskets are first
  * semi-joined against the frequent-ITEM set (broadcast; map-only over
  * the basket stream) before any pair forms. On this corpus every part
  * clears the threshold (uniform TPC-H-ish part draw), so the prune
  * passes everything through — the GRADE proves it LOSSLESS (the
  * oracle mines without pruning), and on the long-tail distributions
  * real corpora have, the same plan drops the tail before the
  * quadratic-in-basket-size pair explosion.
  *
  * Scale shape: pairs come from the orderkey equi-self-join of the
  * deduplicated basket stream — one hash shuffle on orderkey, pair
  * blowup Σ|basket|²/2 bounded by small baskets (≈4 items here;
  * pathological mega-baskets would be salted or capped upstream) —
  * then ONE pair-granularity partial agg. Item counts and the order
  * count ride broadcast frames. Never a per-order collect_list.
  *
  * Determinism: counts are exact BIGINTs; support/confidence/lift are
  * single pinned-order double divisions of exact integers, rounded.
  */
object Baskets {

  /** Absolute minimum support (pair AND item occurrence count). */
  private[graft] val MinSup = 3L

  /** GRADED: frequent part pairs with association measures. */
  def basketPairs(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val itemCounts = b.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_item"))
    val frequent = itemCounts.filter(col("n_item") >= MinSup)
    // a-priori prune: only frequent items can appear in frequent pairs
    val fb = b.join(broadcast(frequent.select(col("l_partkey"))),
      Seq("l_partkey"), "left_semi")
    val pairs = fb.as("x")
      .join(fb.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey")
          && col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("part_a"),
        col("y.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= MinSup)
    val nOrders = b.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    pairs
      .join(broadcast(itemCounts.select(col("l_partkey").as("part_a"),
        col("n_item").as("n_a"))), Seq("part_a"))
      .join(broadcast(itemCounts.select(col("l_partkey").as("part_b"),
        col("n_item").as("n_b"))), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_pair"),
        col("n_a"), col("n_b"),
        roundN(col("n_pair").cast("double")
          / col("n_orders").cast("double"), 6).as("support"),
        roundN(col("n_pair").cast("double")
          / col("n_a").cast("double"), 4).as("confidence_a_b"),
        roundN((col("n_pair") * col("n_orders")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 4).as("lift"))
      .orderBy("part_a", "part_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "basket_pairs" -> (basketPairs(_, _)))

  /** DuckDB twin mines WITHOUT the a-priori prune — ground truth; the
    * hash can only match if the prune is lossless. */
  val oracles: Map[String, String] = Map(
    "basket_pairs" ->
      s"""WITH b AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |ic AS (
         |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
         |  FROM b GROUP BY 1),
         |nn AS (
         |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
         |  FROM b),
         |p AS (
         |  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
         |    CAST(count(*) AS BIGINT) AS n_pair
         |  FROM b x JOIN b y
         |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
         |  GROUP BY 1, 2
         |  HAVING count(*) >= $MinSup)
         |SELECT p.part_a, p.part_b, p.n_pair, a.n_item AS n_a,
         |  c.n_item AS n_b,
         |  ${roundSql("CAST(n_pair AS DOUBLE) / CAST(n_orders AS DOUBLE)",
            6)} AS support,
         |  ${roundSql("CAST(n_pair AS DOUBLE) / CAST(a.n_item AS DOUBLE)",
            4)} AS confidence_a_b,
         |  ${roundSql("CAST(n_pair * n_orders AS DOUBLE)" +
            " / CAST(a.n_item * c.n_item AS DOUBLE)", 4)} AS lift
         |FROM p
         |JOIN ic a ON p.part_a = a.l_partkey
         |JOIN ic c ON p.part_b = c.l_partkey
         |CROSS JOIN nn
         |ORDER BY part_a, part_b""".stripMargin)
}
