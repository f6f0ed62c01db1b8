package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ScalarFns

/** Distributed descriptive statistics with DETERMINISTIC results —
  * correlation / covariance / standard deviation per group (A-family
  * extension, SURVEY.md §2.6; generalizes the reference's avg-spend /
  * avg-open-rate aggregates in `tools.py:70-76` to second-moment
  * statistics).
  *
  * Why not Spark's built-in `corr`/`covar_samp`/`stddev`: they fold
  * doubles in partition order, so the last few bits of the result vary
  * run-to-run and NEVER match another engine bit-for-bit — fine for
  * exploration, useless under a hash-match gate (and genuinely
  * unpleasant at 100 TB, where a rerun of the same pipeline "changes"
  * metrics). The fix is the moneyAvg discipline applied to second
  * moments:
  *
  *  1. cast each input to `decimal(18,2)` FIRST (the inputs carry ≤2
  *     meaningful decimals, so the cast is exact on both engines);
  *  2. every moment (Σx, Σy, Σxy, Σx², Σy²) is a sum of EXACT decimal
  *     products — `decimal(18,2) × decimal(18,2) → decimal(37,4)` is
  *     exact integer arithmetic in both Spark and DuckDB, and decimal
  *     sums are order-independent;
  *  3. the closed-form corr/covar/stddev formulas run ONCE per group on
  *     the exact moments, in IEEE double with pinned operand order, and
  *     round via [[ScalarFns.roundN]].
  *
  * Scale shape: one partial-agg shuffle at group granularity (the
  * moments are algebraic, so map-side combine applies); the formulas
  * cost O(groups). Never a second pass over the data — this is the
  * textbook one-pass sufficient-statistics layout.
  */
object Stats {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** n·Σxy − Σx·Σy etc., written once; operand order mirrored in the
    * oracle SQL below — double ops are exactly rounded, so identical
    * trees give identical bits. */
  def corrStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val x = dec(col("l_extendedprice"))
    val y = dec(col("l_quantity"))
    val m = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val n = col("n_rows").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val covN = n * sxy - sx * sy
    val varXN = n * sxx - sx * sx
    val varYN = n * syy - sy * sy
    m.select(col("l_returnflag"), col("n_rows"),
        ScalarFns.roundN(covN / sqrt(varXN) / sqrt(varYN), 6)
          .as("corr_price_qty"),
        ScalarFns.roundN(covN / n / (n - lit(1.0)), 4).as("covar_samp"),
        ScalarFns.roundN(sqrt(varXN / n / (n - lit(1.0))), 4)
          .as("stddev_price"),
        ScalarFns.roundN(sqrt(varYN / n / (n - lit(1.0))), 4)
          .as("stddev_qty"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corr_stats" -> (corrStats _))

  val oracles: Map[String, String] = Map(
    "corr_stats" -> {
      val covN = "(n * sxy - sx * sy)"
      val varXN = "(n * sxx - sx * sx)"
      val varYN = "(n * syy - sy * sy)"
      s"""WITH m AS (
         |  SELECT l_returnflag, count(*) AS n_rows,
         |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
         |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sy,
         |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
         |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxy,
         |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
         |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxx,
         |    sum(CAST(l_quantity AS DECIMAL(18,2))
         |      * CAST(l_quantity AS DECIMAL(18,2))) AS syy
         |  FROM lineitem GROUP BY 1),
         |d AS (
         |  SELECT l_returnflag, n_rows,
         |    CAST(n_rows AS DOUBLE) AS n,
         |    CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
         |    CAST(sxy AS DOUBLE) AS sxy,
         |    CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy
         |  FROM m)
         |SELECT l_returnflag, n_rows,
         |  ${ScalarFns.roundSql(s"$covN / sqrt($varXN) / sqrt($varYN)", 6)}
         |    AS corr_price_qty,
         |  ${ScalarFns.roundSql(s"$covN / n / (n - 1.0)", 4)} AS covar_samp,
         |  ${ScalarFns.roundSql(s"sqrt($varXN / n / (n - 1.0))", 4)}
         |    AS stddev_price,
         |  ${ScalarFns.roundSql(s"sqrt($varYN / n / (n - 1.0))", 4)}
         |    AS stddev_qty
         |FROM d ORDER BY l_returnflag""".stripMargin
    })
}
