package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The incremental alert-analytics surface (SURVEY §2.7; the streaming
  * shape of the reference's alert feeds — GLAD/VIIRS appends that the
  * batch path dedups and the analysis path aggregates by date):
  *
  *   - [[windowedCounts]] — event-time windowed aggregation with a
  *     watermark: per (window, cell) alert counts that finalize in
  *     append mode once the watermark passes, the streaming analog of
  *     the per-date zonal counts (state bounded by the horizon; the
  *     shuffle keys on (window, cell) exactly like the batch groupBy);
  *   - [[sessionize]] — arbitrary stateful logic via
  *     `flatMapGroupsWithState`: gap-based sessions per cell
  *     (`w3_sessionize`'s semantics incrementally), with event-time
  *     timeout so closed sessions emit exactly once and state is
  *     dropped — the `KeyValueGroupedDataset` custom-state path.
  */
object AlertStream {

  final case class Alert(cell: Long, ts: Timestamp)
  final case class SessionState(start: Long, last: Long, count: Long)
  final case class Session(cell: Long, startTs: Timestamp, endTs: Timestamp,
                           alerts: Long)

  /** Per-(1 hour window, cell) alert counts; late events beyond the
    * watermark are dropped, finalized windows emit in append mode. */
  def windowedCounts(input: DataFrame, watermarkDelay: String = "10 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    input
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("cell"))
      .agg(count(lit(1)).as("alert_count"))
      .select(col("window.start").as("window_start"), col("cell"),
        col("alert_count"))

  /** Gap-based sessions per cell: a session closes when no alert
    * arrives within `gapMs` of the previous one (event time). Uses
    * `flatMapGroupsWithState` with an event-time timeout: the state
    * for a cell is one small (start, last, count) record, dropped when
    * its session emits — bounded regardless of stream length. */
  def sessionize(spark: SparkSession, input: DataFrame,
                 gapMs: Long = 600000L,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import spark.implicits._
    input.withWatermark("ts", watermarkDelay)
      .as[Alert]
      .groupByKey(_.cell)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (cell: Long, events: Iterator[Alert], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap horizon: the open session closes
            val s = state.get
            state.remove()
            Iterator.single(Session(cell,
              new Timestamp(s.start), new Timestamp(s.last), s.count))
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // a late (out-of-order, above-watermark) event can
                  // extend the session BACKWARD too — batch
                  // sessionization (w3) sorts globally and would have
                  // started the session at the earlier timestamp
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t),
                    count = s.count + 1))
                case Some(s) =>
                  closed ::= Session(cell, new Timestamp(s.start),
                    new Timestamp(s.last), s.count)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close once the watermark is `gapMs` past the last event
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
