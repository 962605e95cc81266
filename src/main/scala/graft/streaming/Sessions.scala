package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.domain.Schemas.Message

/** T2–T4 — the session message pipeline (`services/
  * message_batch_analysis.py`): per-session batches of `batchSize` messages
  * trigger an analysis step that (a) decides which messages are
  * memory-worthy and (b) folds rolling short/medium/long summaries
  * (`ConversationSummaries`, message_batch_analysis.py:75-121).
  *
  * Structured Streaming shape: `groupByKey(session_id)` +
  * `flatMapGroupsWithState` holding `SessionState`; the summarizer and the
  * worthiness classifier are pluggable (LLM in production, deterministic
  * stubs here — FIXTURES.md §C). Works identically under a streaming query
  * (MemoryStream/kafka) and in batch backfill via the `analyzeBatch`
  * twin.
  */
object Sessions {

  /** Rolling summaries + pending buffer per session. (No shortSummary
    * field: the short summary is last-batch-only by definition, recomputed
    * from "" each batch — persisting it would be dead bytes in the state
    * store. NOTE: changing this schema invalidates existing streaming
    * checkpoints — restart streams from fresh checkpoints after upgrading.) */
  case class SessionState(
      pending: Seq[Message],
      mediumSummary: String,
      longSummary: String,
      processedCount: Int)

  object SessionState {
    val empty: SessionState = SessionState(Nil, "", "", 0)
  }

  /** Emitted once per completed batch: the memory-worthy candidates plus the
    * summary snapshot (→ feeds the §3.2 ingest pipeline downstream). */
  case class BatchAnalysis(
      session_id: String,
      batch_index: Int,
      memory_candidates: Seq[String],     // message contents worth storing
      short_summary: String,
      medium_summary: String,
      long_summary: String)

  /** Deterministic summarizer stub: fold = truncate(prev + " | " + batch
    * digest). Production impl is an LLM behind the same trait. */
  trait Summarizer extends Serializable {
    def fold(prev: String, batch: Seq[Message]): String
  }
  final class ConcatSummarizer(maxLen: Int) extends Summarizer {
    def fold(prev: String, batch: Seq[Message]): String = {
      val digest = batch.map(_.content.split("\\s+").take(3).mkString(" ")).mkString("; ")
      val merged = if (prev.isEmpty) digest else prev + " | " + digest
      merged.takeRight(maxLen)
    }
  }

  /** Memory-worthiness classifier stub (T4): content with ≥ minTokens tokens
    * from a user turn is worth storing. */
  trait WorthinessClassifier extends Serializable {
    def worthy(m: Message): Boolean
  }
  final class LengthClassifier(minTokens: Int = 5) extends WorthinessClassifier {
    def worthy(m: Message): Boolean =
      m.role == "user" && m.content.split("\\s+").length >= minTokens
  }

  val BatchSize = 15                     // message_batch_analysis.py trigger

  def analyze(batch: Seq[Message], state: SessionState, sessionId: String,
              summarizer: Summarizer, classifier: WorthinessClassifier,
              batchIndex: Int): (BatchAnalysis, SessionState) = {
    val shortS = summarizer.fold("", batch)                       // last batch only
    val mediumS = summarizer.fold(state.mediumSummary, batch)     // ~rolling window
    val longS = summarizer.fold(state.longSummary, batch)         // whole session
    val candidates = batch.filter(classifier.worthy).map(_.content)
    (BatchAnalysis(sessionId, batchIndex, candidates, shortS, mediumS, longS),
      state.copy(pending = Nil, mediumSummary = mediumS,
        longSummary = longS, processedCount = state.processedCount + batch.size))
  }

  /** The stateful core, shared by streaming and batch-backfill paths. */
  def processGroup(sessionId: String, msgs: Iterator[Message],
                   state: GroupState[SessionState],
                   summarizer: Summarizer,
                   classifier: WorthinessClassifier): Iterator[BatchAnalysis] = {
    val st = state.getOption.getOrElse(SessionState.empty)
    val all = (st.pending ++ msgs.toSeq).sortBy(m => (m.ts.getTime, m.message_id))
    val fullBatches = all.grouped(BatchSize).filter(_.size == BatchSize).toSeq
    val leftover = all.drop(fullBatches.size * BatchSize)
    var cur = st.copy(pending = Nil)
    val out = fullBatches.zipWithIndex.map { case (b, i) =>
      // ceil-based: a prior partial FLUSH advances processedCount past a
      // multiple of BatchSize; plain division would re-issue its index
      val (analysis, next) = analyze(b, cur, sessionId, summarizer, classifier,
        batchIndex = (cur.processedCount + BatchSize - 1) / BatchSize)
      cur = next
      analysis
    }
    state.update(cur.copy(pending = leftover))
    out.iterator
  }

  /** Timeout branch: a session idle past the flush window emits its
    * sub-batchSize leftover as a final (short) batch — without this,
    * trailing messages were never analyzed. The state is kept as a SMALL
    * tombstone (empty pending, summaries + processedCount retained) rather
    * than removed: a session that resumes later continues its batch
    * numbering and summary chain instead of restarting at batch 0 and
    * overwriting earlier analyses in keyed sinks. Per-session state is
    * bounded (truncated summaries + counters), so retention cost is
    * O(sessions), not O(messages). */
  def flushExpired(sessionId: String, state: GroupState[SessionState],
                   summarizer: Summarizer,
                   classifier: WorthinessClassifier): Iterator[BatchAnalysis] = {
    val st = state.getOption.getOrElse(SessionState.empty)
    if (st.pending.isEmpty) Iterator.empty
    else {
      val (analysis, next) = analyze(st.pending, st.copy(pending = Nil), sessionId,
        summarizer, classifier,
        batchIndex = (st.processedCount + BatchSize - 1) / BatchSize)
      state.update(next)
      Iterator(analysis)
    }
  }

  /** Streaming entry: messages stream → per-session batch analyses.
    * `flushAfter` (e.g. "30 minutes") arms a processing-time timeout that
    * flushes trailing sub-batchSize messages, leaving a bounded per-session
    * tombstone; None preserves the reference's pure count-trigger behavior
    * (its `/sessions/{id}/process` endpoint is the manual flush analog). */
  def sessionStream(spark: SparkSession, messages: Dataset[Message],
                    summarizer: Summarizer = new ConcatSummarizer(400),
                    classifier: WorthinessClassifier = new LengthClassifier(5),
                    flushAfter: Option[String] = None)
      : Dataset[BatchAnalysis] = {
    import spark.implicits._
    val timeoutConf = if (flushAfter.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    messages
      .groupByKey(_.session_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (sid: String, it: Iterator[Message], st: GroupState[SessionState]) =>
          if (st.hasTimedOut) flushExpired(sid, st, summarizer, classifier)
          else {
            val out = processGroup(sid, it, st, summarizer, classifier)
            flushAfter.foreach(st.setTimeoutDuration)
            out
          })
  }
}
