package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming transforms (SURVEY.md §2.9). Each is a plain
  * `DataFrame => DataFrame` so the SAME operator runs in batch (driver
  * correctness gate) and as a streaming query (`readStream` → transform
  * → `writeStream`) — Spark's unified model makes the distinction a
  * property of the source, not the operator.
  *
  * Event-time discipline (100 TB / unbounded-stream scale): every
  * stateful transform bounds its state with a watermark — windows are
  * dropped once late data can no longer arrive, dedup keys expire with
  * the watermark (`dropDuplicatesWithinWatermark`), and session state
  * closes `gap` after the last event. Without these bounds, state grows
  * without limit and the job dies at scale.
  */
object StreamOps {

  /** ST7: tumbling event-time window counts per type. `extraKeys` are
    * additional grouping columns carried through to the output — e.g.
    * the sentinel-replay flag, so a sink-side consumer can drop
    * sentinel-derived rows without a magic value in a data column. */
  def tumblingCounts(events: DataFrame,
      win: String = "1 hour", watermark: String = "10 minutes",
      extraKeys: Seq[String] = Nil): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win) +: col("event_type") +:
        extraKeys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        col("event_type") +: extraKeys.map(col) :+
        col("n_events") :+ col("total_value"): _*)

  /** ST3: sliding-window rate limit — the reference's Redis sliding
    * window (`SCALING.md:109-118`) as a streaming windowed count; rows
    * over the limit are the reject set. */
  def rateLimitViolations(events: DataFrame, limit: Long,
      win: String = "1 hour", slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, slide), col("user_id"))
      .agg(count(lit(1)).as("n_requests"))
      // >= to match the batch twin (Windows.slidingRateLimit): a user AT
      // the limit is in the reject set in both forms
      .filter(col("n_requests") >= limit)
      .select(col("window.start").as("window_start"), col("user_id"),
        col("n_requests"))

  /** ST4: idempotent ingestion (`SCALING.md:120`) — duplicate event ids
    * within the watermark horizon are dropped exactly once. */
  def dedupWithinWatermark(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** ST5+A6: streaming distinct-user estimation — the custom HLL sketch
    * ([[graft.plans.Hll]]) carried as `mapGroupsWithState` state. Per
    * event type the state is the 256-byte register array (constant per
    * key — the whole point of a sketch as streaming state: distinct-user
    * cardinality costs 256 bytes instead of one state row per user),
    * updated per micro-batch and re-estimated on emit. Because batch
    * and stream share ONE sketch implementation, a stream fed the same
    * rows produces the IDENTICAL estimate as `EventOps.hllUsers`
    * (asserted in StreamingSpec).
    *
    * State is deliberately NOT timed out: a running distinct count is a
    * monotone all-time aggregate; bound it per window by keying on
    * (window, type) instead. */
  /** Output rows: (event_type, estimate, n_events_seen). The ESTIMATE
    * is not monotone (the linear-counting → raw-estimate branch switch
    * can step down), but n_events_seen is strictly increasing per key —
    * consumers pick the latest update per key by max(n_events_seen). */
  def streamingHllUsers(events: DataFrame): Dataset[(String, Double, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Array[Byte], Long), (String, Double, Long)](
          GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
            state: GroupState[(Array[Byte], Long)]) =>
          var (regs, seen) = state.getOption
            .getOrElse((graft.plans.Hll.emptyRegisters, 0L))
          val md5 = java.security.MessageDigest.getInstance("MD5")
          rows.foreach { case (_, uid) =>
            if (uid != null) graft.plans.Hll.add(regs, md5, uid.getBytes("UTF-8"))
            seen += 1
          }
          state.update((regs, seen))
          (key, graft.plans.Hll.estimate(regs)._1, seen)
      }
  }

  /** Output mode for [[streamingHllUsers]] sinks. */
  val hllOutputMode: OutputMode = OutputMode.Update()

  /** ST5+A6 KMV twin: the k-minimum-values sketch
    * ([[graft.plans.Kmv]]) carried as `mapGroupsWithState` state — the
    * third point on the streaming distinct-state curve: HLL (256 B,
    * union-only), KMV (≤2 KiB, supports downstream set algebra on the
    * emitted blobs), bitmap (2 B/user, exact). State = the canonical
    * serialized blob + a seen counter; batch and stream share ONE
    * sketch implementation and the k-smallest merge is
    * order-independent, so a bounded replay's final (est, kth, n_kept)
    * is EXACTLY the batch aggregate and the batch oracle grades it. */
  def streamingKmvUsers(events: DataFrame): Dataset[(String, Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Array[Byte], Long), (String, Long, Long, Long, Long)](
          GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
            state: GroupState[(Array[Byte], Long)]) =>
          val (blob, seen0) = state.getOption
            .getOrElse((Array.emptyByteArray, 0L))
          val buf = graft.plans.Kmv.deserialize(blob)
          var seen = seen0
          val md5 = java.security.MessageDigest.getInstance("MD5")
          rows.foreach { case (_, uid) =>
            if (uid != null)
              graft.plans.Kmv.add(buf, graft.plans.Kmv.u32(md5, uid.getBytes("UTF-8")))
            seen += 1
          }
          state.update((graft.plans.Kmv.serialize(buf), seen))
          val (est, kth, nKept) = graft.plans.Kmv.estimate(buf)
          (key, est, kth, nKept, seen)
      }
  }

  /** ST5+A6 EXACT twin: streaming exact distinct-user counting — the
    * canonical roaring-style bitmap ([[graft.plans.RBitmap]]) carried
    * as `mapGroupsWithState` state instead of the 256-byte HLL
    * registers: per event type the state is the serialized container
    * set (2 B/user sparse, 8 KiB/65536-id chunk worst case — the
    * bounded-state trade one tier above the sketch, and the same
    * blob the batch rollup tables store). Batch and stream share ONE
    * bitmap implementation and union is order-independent, so a
    * bounded replay's final counts are EXACTLY the batch aggregate —
    * graded by the `bitmap_distinct_users` oracle verbatim.
    * Output rows: (event_type, n_users, n_events_seen); both monotone,
    * so consumers compact by max per key. */
  def streamingBitmapUsers(events: DataFrame): Dataset[(String, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Array[Byte], Long), (String, Long, Long)](
          GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
            state: GroupState[(Array[Byte], Long)]) =>
          val (blob, seen0) = state.getOption.getOrElse((null: Array[Byte], 0L))
          val buf = if (blob == null) graft.plans.RBitmap.empty
            else graft.plans.RBitmap.deserialize(blob)
          var seen = seen0
          rows.foreach { case (_, uid) =>
            graft.plans.RBitmap.add(buf, uid)
            seen += 1
          }
          state.update((graft.plans.RBitmap.serialize(buf), seen))
          (key, graft.plans.RBitmap.cardinality(buf), seen)
      }
  }

  /** ST7: session windows (gap-based) per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** ST1/ST5: per-key SESSION MACHINE as `flatMapGroupsWithState` —
    * the ARBITRARY-stateful form of sessionization (the reference's
    * ordered-phases-per-key-with-timeout conversation shape, SURVEY
    * ST1/ST5), where [[sessionCounts]] is the built-in
    * `session_window` form. State per user is ONE open session
    * (start, last-event ms, count) — constant size per key, the whole
    * point: a 100 TB clickstream's session state is O(active users),
    * not O(events). Each batch folds the user's arrivals (sorted by
    * event time within the batch — cross-batch continuity is the
    * state's job) into the open session, EMITS sessions proven closed
    * by a later arrival (gap ≥ `gapMs`), and arms an event-time
    * timeout at last + gap: when the watermark passes it — no
    * activity for the gap — the machine emits the held session and
    * clears the key. Emission is exactly-once per session (append
    * mode), the semantics a downstream session store needs.
    *
    * Determinism vs the batch gaps-and-islands oracle: same-gap
    * boundary uses the same `< gap` continuation rule as
    * `session_window` (a gap exactly equal starts a new session), and
    * a bounded single-data-batch replay presents each user's events
    * in one sorted fold, so per-session counts match the batch twin
    * row for row. Output rows: (user_id, n_events-in-session). */
  def sessionMachine(events: DataFrame, gapMs: Long = 30L * 60 * 1000,
      watermark: String = "10 minutes"): Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long)](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[(Long, Long, Long)]) =>
          if (!rows.hasNext) {
            // timeout invocation: the watermark passed last + gap, so
            // the open session can never extend — emit and clear
            if (state.hasTimedOut) {
              val out = state.getOption.map { case (_, _, n) => (user, n) }
              state.remove()
              out.iterator
            } else Iterator.empty
          } else {
            val ts = rows.map(_._2.getTime).toArray
            java.util.Arrays.sort(ts)
            val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            var cur = state.getOption
            ts.foreach { t =>
              cur = cur match {
                case Some((st, last, n)) if t - last < gapMs =>
                  Some((st, math.max(last, t), n + 1))
                case Some((_, _, n)) =>
                  closed += ((user, n)); Some((t, t, 1L))
                case None => Some((t, t, 1L))
              }
            }
            val s = cur.get
            state.update(s)
            state.setTimeoutTimestamp(s._2 + gapMs)
            closed.iterator
          }
      }
  }

  /** ST5+: per-user DEBOUNCE machine — the streaming form of
    * [[graft.operators.EventOps.eventsDebounced]]'s gaps-and-islands
    * gate, as `flatMapGroupsWithState`: state per user is ONE long
    * (the last RAW arrival in exact microseconds — the decision for
    * an arriving event depends on nothing else, which is what makes
    * the gate a constant-state streaming operator). Every event is
    * emitted IMMEDIATELY with its verdict (an island head iff > gap
    * from the previous raw arrival) — debounce never holds rows back,
    * so no timeout and no watermark flush are needed; batch arrivals
    * fold in (event-time, event_id) order, cross-batch continuity is
    * the state's job. Microsecond arithmetic mirrors the batch twin
    * exactly (a millisecond fold would flip sub-second boundaries). */
  def debounceMachine(events: DataFrame, gapUs: Long = 300L * 1000 * 1000)
      : Dataset[(Long, Long, Boolean)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Boolean)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[Long]) =>
          def us(t: java.sql.Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          val sorted = rows.map(r => (us(r._3), r._2)).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Boolean)]
          var last = state.getOption.getOrElse(Long.MinValue)
          sorted.foreach { case (t, id) =>
            val head = last == Long.MinValue || t - last > gapUs
            out += ((user, id, head))
            last = t // distance to the previous RAW event
          }
          if (last != Long.MinValue) state.update(last)
          out.iterator
      }
  }

  /** ST10: CEP PATTERN machine — the Flink-CEP shape as
    * `flatMapGroupsWithState`: [[graft.operators.Cep.step]]'s 3-state
    * automaton (`v+c+p`, no backtracking) run per user with the phase
    * carried across micro-batches — which is exactly why the automaton
    * form exists: the regex the batch twin runs needs the whole
    * sequence, the machine needs ONE int of state per key. Each batch
    * emits the user's CUMULATIVE (n_events, n_funnels); both are
    * monotone, so the sink rollup takes max() per user and a bounded
    * replay lands on the batch answer regardless of batch chopping
    * (CepSpec pins chop-invariance of the fold as a pure property). */
  def cepMachine(events: DataFrame): Dataset[(Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id"), col("ts"),
        graft.operators.Cep.initialExpr(col("event_type")).as("ini"))
      .as[(Long, Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long, Long), (Long, Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, String)],
            state: GroupState[(Int, Long, Long)]) =>
          def us(t: java.sql.Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          val sorted = rows.map(r => (us(r._3), r._2, r._4.charAt(0)))
            .toArray.sortBy(x => (x._1, x._2))
          var (phase, ne, nf) = state.getOption.getOrElse((0, 0L, 0L))
          sorted.foreach { case (_, _, ch) =>
            val (p2, hit) = graft.operators.Cep.step(phase, ch)
            phase = p2
            ne += 1
            if (hit) nf += 1
          }
          state.update((phase, ne, nf))
          Iterator.single((user, ne, nf))
      }
  }

  /** ST9: STREAM-STATIC enrichment join — the most common production
    * streaming topology: every micro-batch of the event stream joins a
    * broadcast dimension table (no state, no watermark needed on the
    * static side; the dimension is re-resolvable per batch, which is
    * how slowly-changing dims get picked up), then feeds a windowless
    * grouped aggregate. Decimal value sums keep the result independent
    * of micro-batch slicing. */
  def enrichedCounts(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("total_value"))

  /** ST8: STREAM-STREAM event-time interval join — attribution (view →
    * purchase by the same user within `horizon`), the canonical
    * funnel-conversion join. Both sides carry watermarks and the join
    * condition bounds purchase_ts to [view_ts, view_ts + horizon], so
    * Spark's symmetric hash join can PRUNE state: a buffered view older
    * than watermark − horizon can never match again and is dropped —
    * bounded state on an unbounded stream, which is the entire reason
    * this operator exists (an unconstrained stream join would buffer
    * both streams forever). Inner-join matches emit as soon as both
    * rows are buffered, so a bounded replay emits every match without
    * any watermark flushing trick. */
  def viewToPurchase(events: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    views.join(purchases,
        col("user_id") === col("p_user")
          && col("purchase_ts") >= col("view_ts")
          && col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"))
  }

  /** ST8+: the LEFT-OUTER stream-stream interval join — attribution
    * WITH the non-converting views ("every view, did it convert?"),
    * the harder emission regime: a matched pair emits as soon as both
    * rows are buffered, but an UNMATCHED view may only emit its
    * null-extended row once the watermark proves no in-horizon
    * purchase can still arrive (view_ts + horizon < watermark) —
    * early emission would be wrong (the purchase might come), late
    * emission never happens because state for a provably-closed view
    * is dropped. Same bounded-state pruning as the inner form.
    *
    * Both side filters keep the replay SENTINEL (`user_id` = −1, the
    * [[graft.streaming.StreamReplay]] convention) — an event-type
    * filter alone would push below the watermark operator and drop it
    * before the accountant on that side, pinning the JOIN watermark
    * (= min of both sides) at the last real event and silently
    * holding every view in the trailing horizon open forever. The
    * sentinel joins only itself (user −1 on both sides, equal
    * timestamps) and is dropped at the sink. */
  def viewToPurchaseLeftOuter(events: DataFrame,
      horizon: String = "1 hour"): DataFrame = {
    val isSentinel = col("user_id") <=> lit(-1L)
    val views = events
      .filter(col("event_type") === "view" || isSentinel)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val purchases = events
      .filter(col("event_type") === "purchase" || isSentinel)
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    views.join(purchases,
        col("user_id") === col("p_user")
          && col("purchase_ts") >= col("view_ts")
          && col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
        "left_outer")
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"))
  }

  /** ST8++ FULL-OUTER stream-stream interval join — both outer arms at
    * once: unmatched views null-extend when the watermark proves no
    * in-horizon purchase can still arrive (the LEFT form's rule), and
    * unmatched purchases null-extend symmetrically once the watermark
    * passes their own eviction point (no view in [p_ts − horizon,
    * p_ts] can still arrive). State pruning is identical to the inner
    * form — the interval bounds both sides' buffers. The emitting user
    * key is COALESCEd across sides (a purchase-only row has a null
    * view-side user), which also routes the self-joining sentinel pair
    * to user −1 for the sink filter. Both side filters keep the
    * sentinel for the same watermark-accounting reason as the LEFT
    * form (see [[viewToPurchaseLeftOuter]]). */
  def viewToPurchaseFullOuter(events: DataFrame,
      horizon: String = "1 hour"): DataFrame = {
    val isSentinel = col("user_id") <=> lit(-1L)
    val views = events
      .filter(col("event_type") === "view" || isSentinel)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val purchases = events
      .filter(col("event_type") === "purchase" || isSentinel)
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    views.join(purchases,
        col("user_id") === col("p_user")
          && col("purchase_ts") >= col("view_ts")
          && col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
        "full_outer")
      .select(coalesce(col("user_id"), col("p_user")).as("user_id"),
        col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"))
  }
}
