package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** POSITION-DELETE erasure (deletion vectors) — the modern lakehouse
  * answer to right-to-erasure on an immutable table (Iceberg v2
  * position deletes / Delta deletion vectors): deleting scattered rows
  * from parquet without rewriting data files. A copy-on-write delete
  * of rows spread across every file IS a full table rewrite — a
  * non-plan at 100 TB; tombstone logs ([[MergeOnRead]]) solve it for
  * KEYED upserts, but an erasure request targets ROWS matching a
  * predicate, and the position-delete file is the standard encoding:
  * a table of (data file, row position) pairs that the read path
  * anti-joins against.
  *
  * The physical row address comes from Spark's parquet metadata
  * columns: `_metadata.file_path` + `_metadata.row_index` (the row's
  * ordinal within its file — stable for immutable files, which is the
  * whole premise of the format). Build: one scan of the frozen copy
  * with the erasure predicate (here an md5 class of `user_id` — the
  * "all data for these users" GDPR shape) emits the delete file,
  * O(deleted rows). Read: scan ∪ anti join on (file, position) —
  * at scale the delete file is partitioned alongside the data files
  * so each task anti-joins only its own file's vector; here the
  * per-file vectors ride one broadcast.
  *
  * The GRADE pins the mechanism to predicate semantics: the erased
  * view's aggregate is judged against plain SQL with `NOT (predicate)`
  * — the position-addressed read must deliver exactly what the
  * logical erasure promises, at every SF. (Erasure here is LOGICAL
  * until a [[Compaction]]-style rewrite folds the vectors in —
  * physical erasure is the compaction pass's job, same as tombstone
  * retirement.)
  */
object Erasure {

  /** Erased class: users whose md5 first nibble is 'a' (~1/16). */
  private val EraseHex = "a"

  private def erasePred =
    substring(md5(col("user_id").cast("string")), 1, 1) === EraseHex

  // frozen multi-file events copy + its position-delete file, once per
  // (JVM, corpus); the DV build must address the COPY's files, so both
  // live together
  private val states = new ConcurrentHashMap[String, (String, String)]()
  private[graft] def state(spark: SparkSession, dir: String): (String, String) =
    states.computeIfAbsent(dir, { _ =>
      val data = Tables.scratchDir("graft_dv_data_").getAbsolutePath
      Tables(spark, dir, "events")
        .repartition(4, col("event_id"))
        .write.mode("overwrite").parquet(data)
      val dv = Tables.scratchDir("graft_dv_del_").getAbsolutePath
      spark.read.parquet(data)
        .select(col("_metadata.file_path").as("file"),
          col("_metadata.row_index").as("pos"), col("user_id"))
        .filter(erasePred)
        .select(col("file"), col("pos"))
        .write.mode("overwrite").parquet(dv)
      (data, dv)
    })

  /** The erased VIEW: data files untouched, deletes applied at read
    * time by position. */
  private[graft] def erasedView(spark: SparkSession, dir: String): DataFrame = {
    val (data, dv) = state(spark, dir)
    spark.read.parquet(data)
      .withColumn("file", col("_metadata.file_path"))
      .withColumn("pos", col("_metadata.row_index"))
      .join(broadcast(spark.read.parquet(dv)), Seq("file", "pos"),
        "left_anti")
      .drop("file", "pos")
  }

  /** GRADED: per-type aggregate over the position-deleted view — must
    * equal the logical erasure predicate's answer exactly. */
  def eventsPositionDelete(spark: SparkSession, dir: String): DataFrame =
    erasedView(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("total_value"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_position_delete" -> (eventsPositionDelete(_, _)))

  /** Plain predicate SQL — deliberately knows nothing about files or
    * positions: the mechanism must reduce to the semantics. */
  val oracles: Map[String, String] = Map(
    "events_position_delete" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
         |    AS total_value
         |FROM events
         |WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <> '$EraseHex'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
