package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ST7 as a DRIVER-VISIBLE graded query: the events table replayed
  * through a REAL Structured Streaming execution (file streaming source
  * → watermarked tumbling-window aggregate → memory sink), then read
  * back as a batch frame.
  *
  * Until now every ST operator was exercised only by ScalaTest and by
  * oracle-graded BATCH twins (SURVEY §7.4.5); this entry puts an actual
  * `writeStream.start()` on the driver's correctness path. Because a
  * complete-mode replay of a bounded source computes exactly the batch
  * aggregate, the result is not rows-only: it reuses the
  * `hourly_event_stats` oracle VERBATIM and hash-matches it.
  *
  * Scale/semantics notes:
  *  - the source is `readStream` over the same parquet directory the
  *    batch twin scans (schema from a footer read — file streaming
  *    sources require an explicit schema);
  *  - Trigger.AvailableNow processes everything then stops — the
  *    bounded-replay trigger (a production deployment would run the
  *    identical plan unbounded with the memory sink swapped for
  *    kafka/delta);
  *  - Complete output mode: the sink holds the full aggregate, so the
  *    final table is deterministic regardless of how the source chops
  *    files into micro-batches (decimal sums — no float fold order);
  *  - the memory sink collects only the AGGREGATE (windows × types
  *    rows), never raw events.
  *
  * Like the LSH pair build, CONSTRUCTING this frame executes work (the
  * streaming query must finish before the sink table exists) — the
  * documented eager-build exception to the otherwise-lazy contract. */
object StreamReplay {
  private val replaySeq = new AtomicLong()

  def hourlyEventStatsStreamed(spark: SparkSession, dir: String): DataFrame = {
    // same TIMESTAMP(NANOS) shim as Tables.apply — the streaming source
    // hits the identical parquet files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the driver's tables are single FILES (<sf>/events.parquet), and a
    // file streaming source requires a directory — stream the parent
    // with a glob pinned to exactly this table's file
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = StreamOps.tumblingCounts(events)
    // unique sink name per replay: bench/verify call this repeatedly in
    // one session and sinks must never shadow each other
    val name = s"graft_replay_${replaySeq.incrementAndGet()}"
    val query = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try query.awaitTermination() finally query.stop()
    val out = spark.table(name)
      .select(col("window_start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("hour_start", "event_type")
    // the resolved plan references the sink's rows directly; dropping
    // the view only removes the catalog name, so repeated replays don't
    // accumulate temp views
    spark.catalog.dropTempView(name)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hourly_event_stats_streamed" -> (hourlyEventStatsStreamed _))

  /** Same oracle as the batch twin — a bounded complete-mode replay is
    * exactly the batch aggregate. */
  val oracles: Map[String, String] = Map(
    "hourly_event_stats_streamed" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
