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

  /** Shared replay plumbing: stream the events table through
    * `transform`, drain it with AvailableNow into a uniquely-named
    * complete-mode memory sink, and return the sink's table. The
    * resolved plan references the sink's rows directly, so the temp
    * view is dropped immediately — repeated replays don't accumulate
    * catalog entries. */
  private def replayEvents(spark: SparkSession, dir: String)
      (transform: DataFrame => DataFrame): DataFrame = {
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
    // unique sink name per replay: bench/verify call this repeatedly in
    // one session and sinks must never shadow each other
    val name = s"graft_replay_${replaySeq.incrementAndGet()}"
    val query = transform(events).writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try query.awaitTermination() finally query.stop()
    val out = spark.table(name)
    spark.catalog.dropTempView(name)
    out
  }

  def hourlyEventStatsStreamed(spark: SparkSession, dir: String): DataFrame =
    replayEvents(spark, dir)(StreamOps.tumblingCounts(_))
      .select(col("window_start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("hour_start", "event_type")

  /** ST3 on the driver's path: the SLIDING-window rate limit as a real
    * streaming execution. Unlike the batch `sliding_rate_limit` twin (a
    * trailing per-event range frame), this is the streaming fixed-grid
    * form — 1 h windows sliding every 5 min — so it carries its own
    * oracle: an event at time t belongs to exactly the 12 windows
    * starting at bucket5min(t) − k·5 min for k = 0..11, which DuckDB
    * expands with a generate_series join. Both engines align 5-minute
    * buckets to the epoch grid, so window_start values agree exactly. */
  def rateLimitStreamed(spark: SparkSession, dir: String,
      limit: Long = 5): DataFrame =
    replayEvents(spark, dir)(StreamOps.rateLimitViolations(_, limit))
      .select(col("window_start"), col("user_id"), col("n_requests"))
      .orderBy("window_start", "user_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hourly_event_stats_streamed" -> (hourlyEventStatsStreamed _),
    "rate_limit_streamed" -> ((s: SparkSession, d: String) =>
      rateLimitStreamed(s, d)))

  val oracles: Map[String, String] = Map(
    // same oracle as the batch twin — a bounded complete-mode replay is
    // exactly the batch aggregate
    "hourly_event_stats_streamed" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rate_limit_streamed" ->
      """WITH m AS (
        |  SELECT e.user_id,
        |    time_bucket(INTERVAL 5 MINUTE, e.ts) - k.k * (INTERVAL 5 MINUTE)
        |      AS window_start
        |  FROM events e, (SELECT unnest(generate_series(0, 11)) AS k) k)
        |SELECT window_start, user_id, count(*) AS n_requests
        |FROM m GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY 1, 2""".stripMargin)
}
