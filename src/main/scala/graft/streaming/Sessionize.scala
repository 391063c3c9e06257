package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of an event stream: consecutive events of the
  * same user belong to one session while their gap stays under
  * `gapMinutes`.
  *
  * Two implementations with identical semantics:
  *  - [[batch]]: lag/cumulative-sum window assignment — SQL-expressible,
  *    registered with a DuckDB oracle (`e1_sessionize`). One shuffle on
  *    user_id + per-user sort; fine for offline jobs.
  *  - [[stream]]: `flatMapGroupsWithState` with event-time timeout — the
  *    online form. Per-user state is one (start, last, count) triple;
  *    sessions close either in-batch (a later event arrives past the gap)
  *    or via watermark timeout (no more events). At 100 TB-rate streams
  *    state is bounded by |active users|, not event volume — this is the
  *    operator class (custom keyed state) that plain groupBy aggregation
  *    cannot express.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, ts_us: Long)
  final case class SessionState(start_us: Long, last_us: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Batch twin: deterministic ordering on (ts_us, event_id). Output:
    * user_id, session_idx (1-based per user), n_events, start_us, end_us.
    */
  def batch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val withTs = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"))
    val prev = lag(col("ts_us"), 1).over(order)
    withTs
      .withColumn("_new",
        when(prev.isNull || col("ts_us") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("_new")).over(order))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
  }

  /** Streaming form: append-mode closed sessions. Requires a watermark on
    * the event-time column `ts` (set by the caller or here via
    * `watermarkDelay`).
    */
  def stream(events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          val out = Seq.newBuilder[ClosedSession]
          if (state.hasTimedOut) {
            // watermark passed last_us + gap: the session is over
            val s = state.get
            out += ClosedSession(user, s.start_us, s.last_us, s.n)
            state.remove()
          } else {
            val sorted = rows.map { case (_, ts) =>
              ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
            }.toArray.sorted
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last_us > gapUs =>
                  out += ClosedSession(user, s.start_us, s.last_us, s.n)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) =>
                  // a LATE but within-watermark event from a later
                  // micro-batch may precede the stored bounds — extend,
                  // never regress (last_us = t would move the session end
                  // backwards and re-arm the gap timeout early, closing
                  // sessions the batch twin keeps open)
                  cur = Some(SessionState(math.min(s.start_us, t),
                    math.max(s.last_us, t), s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close via timeout when the watermark passes last + gap
              state.setTimeoutTimestamp(s.last_us / 1000 + gapMinutes * 60L * 1000)
            }
          }
          out.result().iterator
      }
  }
}
