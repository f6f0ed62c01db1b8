package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.streaming.PhaseMachine.SseEvent

/** S3 (SURVEY.md §2.1): the reference's SSE streaming sink —
  * `data: {json}\n\n` frames, flushed incrementally, always terminated
  * with a `done` frame (`backend/agent.py:110-111,182-185`,
  * `main.py:51-57`).
  *
  * Spark shape: frame serialization is a column expression (`to_json`
  * over the event struct); delivery is the `text` file sink in append
  * mode (exactly-once per epoch via the checkpoint + file-sink log —
  * the streaming-native analog of "flush each frame"). The terminal
  * `done` is a data-level guarantee from PhaseMachine (ST6), not a
  * side-channel, so it survives restarts and replays.
  */
object SseSink {

  /** Serialize typed events to SSE frames (one frame per row; the text
    * sink appends a newline, completing the `\n\n` delimiter). */
  def frames(events: Dataset[SseEvent]): DataFrame =
    events.select(concat(
      lit("data: "),
      to_json(struct(
        col("conversation_id"), col("seq"),
        col("event_type").as("type"), col("phase"), col("status"),
        col("data"))),
      lit("\n")).as("value"))

  /** Start the SSE file sink (micro-batch flush = incremental delivery). */
  def start(events: Dataset[SseEvent], path: String,
      checkpoint: String): StreamingQuery =
    frames(events).writeStream
      .format("text")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
}
