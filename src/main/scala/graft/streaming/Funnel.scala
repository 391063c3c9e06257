package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming twin of [[graft.pipeline.EventAnalytics.funnel]]: per-user
  * ordered conversion progress as a LIVE update-mode changelog, keyed
  * state via `mapGroupsWithState` (the custom-state operator class —
  * same family as [[Sessionize.stream]]'s flatMapGroupsWithState, but
  * exactly one output row per updated key per batch).
  *
  * State per user is one fixed-width Array[Long] (first-completion time
  * per step, sentinel for "not yet") — bounded by |users| × steps, never
  * by event volume; at 100 TB/day the state store holds active users
  * only.
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
      steps: Seq[String] = Seq("view", "click", "purchase")):
      Dataset[FunnelProgress] = {
    require(steps.size == 3, "streaming funnel emits the fixed 3-step shape")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], FunnelProgress](
        GroupStateTimeout.NoTimeout) { case (user, rows, state) =>
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
        // ts has the prefix property by construction (step i only sets
        // once step i-1 is set), so stage = defined prefix length
        FunnelProgress(user,
          Some(ts(0)).filter(_ != Unset),
          Some(ts(1)).filter(_ != Unset),
          Some(ts(2)).filter(_ != Unset),
          ts.takeWhile(_ != Unset).length)
      }
  }
}
