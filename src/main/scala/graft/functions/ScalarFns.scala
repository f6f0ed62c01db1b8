package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library mirroring the reference's helpers
  * (SURVEY.md §2.8), expressed as codegen-friendly Column combinators —
  * no UDFs, so every one of these stays inside WholeStageCodegen.
  */
object ScalarFns {

  /** Months between `d` and a fixed as-of date, as float months
    * (reference: `tools.py:31-34`, divisor 30.44). The reference uses
    * `date.today()`; we take an explicit as-of literal so results are
    * deterministic (SURVEY.md §7.4 determinism contract).
    */
  def monthsSince(d: Column, asOf: String): Column =
    datediff(lit(java.sql.Date.valueOf(asOf)), d) / lit(30.44)

  /** Deterministic replacement for the reference's `uuid4().hex[:8]`
    * segment/campaign ids (`tools.py:74,179`): content-hash of the
    * filter descriptor. Same md5 hex on DuckDB → oracle-verifiable.
    */
  def contentId(prefix: String, descriptor: Column): Column =
    concat(lit(prefix), substring(md5(descriptor), 1, 8))

  /** Case-insensitive substring containment (reference `tools.py:66`,
    * the city filter: partial match, not equality).
    */
  def containsIgnoreCase(haystack: Column, needle: String): Column =
    lower(haystack).contains(lit(needle.toLowerCase))

  /** Case-insensitive any-overlap between an array column and a wanted
    * set (reference `tools.py:62`, the genre filter: element equality
    * after lowercasing, NOT substring — SURVEY.md §7.4 pt 7).
    */
  def overlapsIgnoreCase(arr: Column, wanted: Seq[String]): Column =
    arrays_overlap(
      transform(arr, x => lower(x)),
      lit(wanted.map(_.toLowerCase).distinct.toArray))

  /** Cross-engine-deterministic rounding to n decimal places.
    *
    * Spark's `round()` rounds the SHORTEST DECIMAL REPRESENTATION of the
    * double (it goes through `BigDecimal.valueOf`, i.e. `Double.toString`),
    * while DuckDB rounds the binary value — a double just below x.xx5
    * whose shortest repr IS "x.xx5" rounds UP in Spark and DOWN in
    * DuckDB. `floor(x·10ⁿ + 0.5)/10ⁿ` is pure IEEE double arithmetic,
    * bit-identical on both engines. Mirror in oracle SQL via
    * [[roundSql]].
    */
  def roundN(x: Column, n: Int): Column = {
    val p = math.pow(10, n) // exact powers of ten up to 1e15
    floor(x * lit(p) + lit(0.5)) / lit(p)
  }

  /** DuckDB-side twin of [[roundN]] — keep the two in lockstep. */
  def roundSql(e: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"floor(($e) * $p.0 + 0.5) / $p.0"
  }

  /** Money-safe average: exact decimal sum (order-independent across
    * partitions), then one double division, then deterministic round(2)
    * — the formula is replicated verbatim in the DuckDB oracle SQL so
    * both engines produce bit-identical doubles (SURVEY.md §7.4 pt 3).
    */
  def moneyAvg(x: Column): Column =
    roundN(sum(x.cast("decimal(18,2)")).cast("double") / count(lit(1)), 2)

  /** Same for 0-1 rates: 4 decimal digits of exactness before the sum. */
  def rateAvg(x: Column): Column =
    roundN(sum(x.cast("decimal(18,4)")).cast("double") / count(lit(1)), 2)

  /** Exact decimal sum surfaced as double (deterministic money total). */
  def moneySum(x: Column): Column =
    sum(x.cast("decimal(18,2)")).cast("double")
}
