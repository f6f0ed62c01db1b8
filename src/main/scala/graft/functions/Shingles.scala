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
  /** Spark SQL: list of word-3-grams of token array `t` (1-based
    * element_at; empty list when size(t) < 3 is NOT handled here — the
    * caller must filter `size(t) >= 3` first, because Spark's
    * `sequence(1, n)` counts DOWN for n < 1 while DuckDB's
    * generate_series returns empty). */
  val sparkExpr: String =
    "transform(sequence(1, size(t) - 2), i -> " +
      "concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))"

  /** DuckDB twin (1-based list indexing). */
  val duckExpr: String =
    "list_transform(generate_series(1, len(t) - 2), " +
      "i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])"

  /** DuckDB CTE body producing (doc_id, t) from documents. */
  val duckToks: String =
    "SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t " +
      "FROM documents"
}
