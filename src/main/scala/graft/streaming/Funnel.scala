package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.pipeline.EventAnalytics.funnel]]: per-user
  * ordered conversion progress as a LIVE update-mode changelog, keyed
  * state via `flatMapGroupsWithState` (the custom-state operator class —
  * same family as [[Sessionize.stream]]; at most one output row per
  * updated key per batch, none for timeout-only invocations).
  *
  * State per user is one fixed-width Array[Long] (first-completion time
  * per step, sentinel for "not yet"). By DEFAULT (`idleRetention =
  * None`) state is retained for every user ever seen — bounded by the
  * user population, not event volume, and appropriate when that
  * population is itself bounded. For unbounded populations (100 TB/day
  * public traffic) pass `idleRetention = Some("7 days")` or similar: a
  * user idle past the retention (processing time) is evicted and a
  * returning evicted user restarts the funnel from scratch — the
  * standard trade of bounded state. Note the cost: a timeout-bearing
  * stateful query schedules micro-batches continuously to evaluate
  * timeouts even with no data arriving, so pair it with a real
  * processing-time trigger in production (and in tests, which is why
  * eviction is opt-in rather than the default).
  *
  * Semantics note (the streaming approximation, stated honestly): a step
  * completion is FINAL once recorded. Within a micro-batch, events sort
  * by event time, so in-order feeds reproduce the batch funnel exactly
  * (asserted in StreamingTutorialSpec); an out-of-order earlier `view`
  * arriving in a LATER batch cannot retroactively unlock a `click` that
  * already streamed past — the batch operator on the full history is the
  * exact form, this is its online approximation (the standard trade for
  * not retaining per-user event history in state).
  */
object Funnel {

  final case class FunnelProgress(user_id: Long,
      t_view_us: Option[Long], t_click_us: Option[Long],
      t_purchase_us: Option[Long], stage: Int)

  private val Unset = Long.MinValue

  def stream(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      idleRetention: Option[String] = None):
      Dataset[FunnelProgress] = {
    require(steps.size == 3, "streaming funnel emits the fixed 3-step shape")
    val spark = events.sparkSession
    import spark.implicits._
    val timeout = idleRetention
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], FunnelProgress](
        OutputMode.Update, timeout) { case (user, rows, state) =>
        if (state.hasTimedOut) {
          // idle past retention: evict, emit nothing (the last emitted
          // progress row for this user remains the changelog's final word)
          state.remove()
          Iterator.empty
        } else {
          val ts = state.getOption.getOrElse(Array.fill(steps.size)(Unset))
          // event-time order within the batch: in-order feeds match the
          // batch funnel's chained window minima exactly
          rows.toSeq.sortBy(_._3).foreach { case (_, et, t) =>
            val i = steps.indexOf(et)
            if (i >= 0 && ts(i) == Unset &&
                (i == 0 || (ts(i - 1) != Unset && t >= ts(i - 1))))
              ts(i) = t
          }
          state.update(ts)
          idleRetention.foreach(state.setTimeoutDuration)
          // ts has the prefix property by construction (step i only sets
          // once step i-1 is set), so stage = defined prefix length
          Iterator.single(FunnelProgress(user,
            Some(ts(0)).filter(_ != Unset),
            Some(ts(1)).filter(_ != Unset),
            Some(ts(2)).filter(_ != Unset),
            ts.takeWhile(_ != Unset).length))
        }
      }
  }
}
