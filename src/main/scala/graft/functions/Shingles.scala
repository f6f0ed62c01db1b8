package graft.functions

/** The word-3-gram shingle construction shared by MinHash/LSH near-dup
  * (Similarity) and winnowing fingerprints (TextOps). These strings are
  * ORACLE-CRITICAL: the Spark expression and its DuckDB twin must stay
  * in lockstep or Spark↔DuckDB hash-parity silently breaks — which is
  * why they live in exactly one place.
  *
  * Both operate on a column `t` = the document's non-empty token array.
  */
object Shingles {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, filter, split}

  /** Spark-side tokenizer (non-empty whitespace tokens of `text`) — the
    * Column twin of [[duckToks]]'s list_filter/string_split. */
  def sparkToks: Column = filter(split(col("text"), " "), t => t =!= "")
  /** Spark SQL: list of word-n-grams of token array `t` (1-based
    * element_at; empty list when size(t) < n is NOT handled here — the
    * caller must filter `size(t) >= n` first, because Spark's
    * `sequence(1, m)` counts DOWN for m < 1 while DuckDB's
    * generate_series returns empty). */
  def sparkExprN(n: Int): String = {
    val els = (0 until n).map {
      case 0 => "element_at(t, i)"
      case k => s"element_at(t, i + $k)"
    }.mkString(", ")
    s"transform(sequence(1, size(t) - ${n - 1}), i -> concat_ws(' ', $els))"
  }

  /** DuckDB twin (1-based list indexing). */
  def duckExprN(n: Int): String = {
    val els = (0 until n).map {
      case 0 => "t[i]"
      case k => s"t[i + $k]"
    }.mkString(" || ' ' || ")
    s"list_transform(generate_series(1, len(t) - ${n - 1}), i -> $els)"
  }

  /** The LSH/winnowing word-3-gram instances. */
  val sparkExpr: String = sparkExprN(3)
  val duckExpr: String = duckExprN(3)

  /** DuckDB CTE body producing (doc_id, t) from documents. */
  val duckToks: String =
    "SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t " +
      "FROM documents"

  /** [[duckToks]] + the source column (the Chunking provenance twin). */
  val duckToksWithSource: String =
    "SELECT doc_id, source, " +
      "list_filter(string_split(text, ' '), x -> x <> '') AS t " +
      "FROM documents"
}
