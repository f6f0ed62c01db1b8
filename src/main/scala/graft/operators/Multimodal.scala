package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns (north-star [N], SURVEY.md §2.11 N5 extended):
  * image/audio/video as opaque `binary` payloads with typed metadata.
  *
  * The real decode/resize/frame-sample step needs native media libraries
  * that are NOT in this container — per the build contract it is STUBBED
  * with a deterministic fake (`fakeDecode`, clearly marked below). What
  * IS real and tested: the schema (binary payload + struct metadata),
  * the partition-preserving `mapPartitions` batch shape (the Scala
  * analog of `mapInPandas` — one iterator per partition so a real
  * decoder could amortize model/codec init per partition, the way a
  * Pandas UDF amortizes per batch), and the feature-extraction plumbing
  * into ordinary columns.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collection); feature extraction is map-only; downstream joins/aggs
  * see only small typed columns. At 100 TB the media bytes live in
  * parquet binary columns or object-store pointers — same plan shape.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, kind: String,
      f0: Double, f1: Double, f2: Double, f3: Double)

  /** Deterministic media table derived from `documents`: payload =
    * md5(text) bytes (a stand-in for real image/audio bytes), kind
    * round-robins over the three modalities, metadata from n_chars. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        element_at(lit(Array("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        unhex(md5(col("text"))).as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))

  /** STUB — deterministic fake decode. A real implementation would
    * decode the image/audio payload and emit learned features; this
    * derives 4 floats from the first 4 payload bytes so the pipeline is
    * testable end-to-end without media libs. */
  private def fakeDecode(payload: Array[Byte]): (Double, Double, Double, Double) = {
    def b(i: Int): Double = (payload(i) & 0xff) / 255.0
    (b(0), b(1), b(2), b(3))
  }

  /** The mapPartitions batch shape (mapInPandas analog): per-partition
    * iterator in → iterator out, decoder init once per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: init decoder/model HERE, once per partition
      rows.map { r =>
        val (f0, f1, f2, f3) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.kind, f0, f1, f2, f3)
      }
    }
  }

  /** Graded query: modality stats over the binary payloads. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        max(col("width")).as("max_width"))
      .orderBy("kind")

  /** Graded query: feature extraction expressed in pure columns (the
    * hex-digit trick keeps it DuckDB-oracle-checkable); parity with the
    * mapPartitions path is asserted in MultimodalSpec. Features are the
    * first 4 payload bytes scaled to [0,1]. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    def hexVal(c: org.apache.spark.sql.Column) =
      instr(lit("0123456789abcdef"), c) - 1
    def byteAt(i: Int) = // md5 hex chars 2i+1, 2i+2 form payload byte i
      (hexVal(substring(md5(col("text")), 2 * i + 1, 1)) * 16 +
        hexVal(substring(md5(col("text")), 2 * i + 2, 1))).cast("double") / 255.0
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        element_at(lit(Array("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        byteAt(0).as("f0"), byteAt(1).as("f1"),
        byteAt(2).as("f2"), byteAt(3).as("f3"))
      .orderBy("doc_id")
  }

  /** Graded query: resize (metadata transform — STUB: a real resize
    * would transform payload bytes; the metadata/plan shape is the real
    * part) + frame sampling for video rows: every 8th frame index up to
    * `width`, exploded to one row per sampled frame with a
    * deterministic frame id. Generator (U4) over a sequence — the
    * frame-sample plumbing a video pipeline needs. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .filter(col("kind") === "video")
      .withColumn("resized_w", least(col("width"), lit(224)))
      .withColumn("resized_h", least(col("height"), lit(224)))
      .select(col("doc_id"), col("resized_w"), col("resized_h"),
        posexplode(expr("sequence(0, width, 8)")).as(Seq("frame_no", "frame_idx")))
      .withColumn("frame_id",
        concat(lit("frm_"), substring(md5(concat_ws(":",
          col("doc_id"), col("frame_idx"))), 1, 8)))
      .select(col("doc_id"), col("frame_no").cast("bigint").as("frame_no"),
        col("frame_idx").cast("bigint").as("frame_idx"),
        col("resized_w"), col("resized_h"), col("frame_id"))
      .orderBy("doc_id", "frame_no")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_stats"    -> (mediaStats _),
    "media_features" -> (mediaFeatures _),
    "frame_sample"   -> (frameSample _))

  private val byteSql = (0 to 3).map { i =>
    val hi = s"strpos('0123456789abcdef', substr(md5(text), ${2 * i + 1}, 1)) - 1"
    val lo = s"strpos('0123456789abcdef', substr(md5(text), ${2 * i + 2}, 1)) - 1"
    s"CAST(($hi) * 16 + ($lo) AS DOUBLE) / 255.0 AS f$i"
  }.mkString(",\n  ")

  val oracles: Map[String, String] = Map(
    "media_stats" ->
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  count(*) AS n,
        |  CAST(sum(octet_length(unhex(md5(text)))) AS BIGINT) AS total_bytes,
        |  max(CAST(n_chars % 640 AS INT)) AS max_width
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "frame_sample" ->
      """WITH vids AS (
        |  SELECT doc_id,
        |    CAST(n_chars % 640 AS INT) AS width,
        |    CAST(least(CAST(n_chars % 640 AS INT), 224) AS INT) AS resized_w,
        |    CAST(least(CAST(n_chars % 480 AS INT), 224) AS INT) AS resized_h
        |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
        |frames AS (
        |  SELECT doc_id, resized_w, resized_h,
        |    unnest(range(0, len(generate_series(0, width, 8)))) AS frame_no,
        |    unnest(generate_series(0, width, 8)) AS frame_idx
        |  FROM vids)
        |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  CAST(frame_idx AS BIGINT) AS frame_idx, resized_w, resized_h,
        |  'frm_' || substr(md5(doc_id || ':' || frame_idx), 1, 8) AS frame_id
        |FROM frames ORDER BY doc_id, frame_no""".stripMargin,
    "media_features" ->
      s"""SELECT doc_id,
         |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
         |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  $byteSql
         |FROM documents ORDER BY doc_id""".stripMargin)
}
