package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's typed SSE event stream (ST1/ST5/ST6, SURVEY.md §2.9):
  * an ordered, closed-union event stream per conversation with a
  * phase state machine (`backend/agent.py:122-185`,
  * `ENGINEERING.md:95-134`).
  *
  * Reference invariants reproduced exactly:
  *  - per tool: `running` precedes `done`; typed payload event follows
  *    the tool's `done` (`agent.py:131-163`);
  *  - pseudo-phase `strategy` opens after a non-empty `query_crm` result
  *    and closes when copy generation starts (`agent.py:132-134,156-157`);
  *  - phase `analyzing` opens the conversation (`agent.py:122`);
  *  - `error` is followed by terminal `done` — the stream NEVER ends
  *    unterminated (`agent.py:182-185`, ST6);
  *  - closed event vocabulary: agent_step / token / audience_result /
  *    campaign_draft / scheduled / error / done (`lib/api.ts:50-57`).
  *
  * Implementation: `flatMapGroupsWithState` keyed by conversation —
  * the keyed-state analog of the reference's per-`thread_id` checkpoint
  * (`SCALING.md:68-81`). State is one small case class per live
  * conversation; with a real stream, pair with a checkpointLocation for
  * exactly-once recovery.
  */
object PhaseMachine {

  /** Input: normalized agent-runtime lifecycle event. kind ∈
    * {on_tool_start, on_tool_end, token, error, end}. */
  final case class ToolEvent(
      conversation_id: String, seq: Long, kind: String,
      tool: String, payload: String, nonEmpty: Boolean)

  /** Output: SSE-shaped typed event (`ENGINEERING.md:99-132`). */
  final case class SseEvent(
      conversation_id: String, seq: Long, event_type: String,
      phase: String, status: String, data: String)

  /** `_TOOL_TO_PHASE` (`agent.py:33-37`). */
  val toolPhase: Map[String, String] = Map(
    "query_crm" -> "audience_research",
    "generate_campaign_copy" -> "copy_writing",
    "schedule_campaign" -> "scheduling")

  /** Payload event type per tool (`agent.py:154-163`). */
  val toolPayload: Map[String, String] = Map(
    "query_crm" -> "audience_result",
    "generate_campaign_copy" -> "campaign_draft",
    "schedule_campaign" -> "scheduled")

  final case class ConvState(started: Boolean, strategyOpen: Boolean,
      analyzingOpen: Boolean, nextSeq: Long = 0L, closed: Boolean = false)

  /** Pure per-conversation transition function: events (seq-ordered) →
    * SSE events. Also usable directly in batch tests. */
  def transition(convId: String, events: Iterator[ToolEvent],
      state: GroupState[ConvState]): Iterator[SseEvent] = {
    var st = state.getOption.getOrElse(ConvState(false, false, true))
    val out = Seq.newBuilder[SseEvent]
    var seq = st.nextSeq // output ordering continues across micro-batches
    def emit(tpe: String, phase: String, status: String, data: String = ""): Unit = {
      out += SseEvent(convId, seq, tpe, phase, status, data); seq += 1
    }
    if (!st.started) { // synthetic warm-up (agent.py:122)
      emit("agent_step", "analyzing", "running")
      st = st.copy(started = true)
    }
    events.toSeq.sortBy(_.seq).foreach { e =>
      if (st.closed) () // terminal done already sent — ignore stragglers
      else e.kind match {
        case "on_tool_start" =>
          if (st.analyzingOpen) { // first tool ends the analyzing phase
            emit("agent_step", "analyzing", "done")
            st = st.copy(analyzingOpen = false)
          }
          if (e.tool == "generate_campaign_copy" && st.strategyOpen) {
            emit("agent_step", "strategy", "done") // agent.py:132-134
            st = st.copy(strategyOpen = false)
          }
          emit("agent_step", toolPhase.getOrElse(e.tool, e.tool), "running")
        case "on_tool_end" =>
          emit("agent_step", toolPhase.getOrElse(e.tool, e.tool), "done")
          emit(toolPayload.getOrElse(e.tool, "result"),
            toolPhase.getOrElse(e.tool, e.tool), "payload", e.payload)
          if (e.tool == "query_crm" && e.nonEmpty && !st.strategyOpen) {
            emit("agent_step", "strategy", "running") // agent.py:156-157
            st = st.copy(strategyOpen = true)
          }
        case "token" => emit("token", "", "", e.payload)
        case "error" =>
          // ST6 (agent.py:182-185): the catch-all emits `error` and the
          // FINALLY emits terminal `done` — the stream must terminate
          // even if the runtime dies and no `end` event ever arrives.
          emit("error", "", "", e.payload)
          emit("done", "", "")
          st = st.copy(closed = true)
        case "end" =>
          emit("done", "", "")
          st = st.copy(closed = true)
        case _ => ()
      }
    }
    state.update(st.copy(nextSeq = seq))
    out.result().iterator
  }

  /** ST2 token micro-batching (`Chat.tsx:67-92`): accumulate token
    * payloads per conversation and flush the WHOLE buffer once it
    * reaches `minChars` (the reference flushes its entire buffer at
    * ~50 chars, it does not split into exact-size chunks); `end`
    * flushes any remainder. Keyed state = one pending string per live
    * conversation. */
  final case class Chunk(conversation_id: String, chunk_seq: Long, text: String)
  final case class BufState(pending: String, nextChunk: Long,
      closed: Boolean = false)

  def batchTokens(spark: SparkSession, events: Dataset[ToolEvent],
      minChars: Int = 50): Dataset[Chunk] = {
    implicit val ce = Encoders.product[Chunk]
    implicit val be = Encoders.product[BufState]
    events
      .groupByKey(_.conversation_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, evs: Iterator[ToolEvent], state: GroupState[BufState]) =>
          var st = state.getOption.getOrElse(BufState("", 0L))
          val out = Seq.newBuilder[Chunk]
          def flush(): Unit = if (st.pending.nonEmpty) {
            out += Chunk(id, st.nextChunk, st.pending)
            st = st.copy(pending = "", nextChunk = st.nextChunk + 1)
          }
          evs.toSeq.sortBy(_.seq).foreach { e =>
            if (st.closed) () // terminated — ignore straggler tokens (ST6)
            else e.kind match {
              case "token" =>
                st = st.copy(pending = st.pending + e.payload)
                if (st.pending.length >= minChars) flush()
              case "end" | "error" => // error terminates too (ST6)
                flush()
                st = st.copy(closed = true)
              case _ => ()
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Wire the machine over a (batch or streaming) Dataset of ToolEvents. */
  def run(spark: SparkSession, events: Dataset[ToolEvent]): Dataset[SseEvent] = {
    implicit val se = Encoders.product[SseEvent]
    implicit val cs = Encoders.product[ConvState]
    events
      .groupByKey(_.conversation_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        transition)
  }
}
