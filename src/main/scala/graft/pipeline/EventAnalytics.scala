package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond windowed aggregation (which lives in
  * `streaming.Sessionize` / the e2/e3 window entries): ordered conversion
  * funnels over a user's event history.
  */
object EventAnalytics {

  /** Ordered conversion funnel: for each user, the first time each funnel
    * step completes GIVEN the previous step already had (view → click →
    * purchase by default; a click before the first view does not count).
    *
    * Implementation is `steps.size` chained per-user window minima —
    * step i's timestamp is `min(ts where type = step_i and ts >= t_{i-1})`
    * over the user partition. All windows share one partitioning, so
    * Catalyst plans ONE user_id exchange + sort reused across the chain;
    * no self-joins, no event-list collection. Per-user output row via
    * distinct on the (constant-per-user) window values.
    *
    * Output: (user_id, t_<step>_us... , stage) — stage = number of steps
    * completed in order; step timestamps are µs-since-epoch, NULL once a
    * step (and thus all later ones) never completes.
    *
    * Scale: one hash exchange on user_id + per-user sort — the same shape
    * as any per-entity history pass; state is bounded by a user's events.
    */
  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy("user_id")
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("_ts_us"))
    // chain: each step's first-completion time conditions on the previous
    // step's window value, so each needs its own projection stage (Catalyst
    // still reuses the single user_id exchange+sort beneath them)
    val withSteps = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val prevOk = if (i == 0) lit(true)
        else col(s"_t$i").isNotNull && col("_ts_us") >= col(s"_t$i")
      df.withColumn(s"_t${i + 1}",
        min(when(col("event_type") === step && prevOk, col("_ts_us"))).over(w))
    }
    val stage = steps.indices.foldLeft(lit(0)) { case (acc, i) =>
      when(col(s"_t${i + 1}").isNotNull, i + 1).otherwise(acc)
    }
    withSteps
      .select(col("user_id") +:
        steps.zipWithIndex.map { case (s, i) =>
          col(s"_t${i + 1}").as(s"t_${s}_us")
        } :+ stage.as("stage"): _*)
      .distinct()
  }

  /** Cohort retention: users grouped by signup week (their first
    * `cohortEvent`), counted as retained in every week offset where they
    * show ANY activity at or after signup. The standard growth-analytics
    * triangle: `(cohort_week, week_offset, n_users)`.
    *
    * All week math is EXACT integer division on µs epochs (`div`, not a
    * double divide whose one-ulp error at a week boundary would misplace a
    * user — and would hash-mismatch an oracle computing `//`).
    *
    * Scale: the signup relation aggregates per user (map-side partials),
    * the activity join is user-keyed (both sides hash-partition on
    * user_id — one exchange each), and the final count-distinct runs on
    * (cohort, offset, user) triples ≪ events. No window, no self-join on
    * the event table.
    */
  def cohortRetention(events: DataFrame,
      cohortEvent: String = "signup"): DataFrame = {
    val weekUs = 604800000000L // 7 × 86400 × 1e6
    val signup = events.filter(col("event_type") === cohortEvent)
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("_signup_us"))
    events.select(col("user_id"), unix_micros(col("ts")).as("_ts_us"))
      .join(signup, "user_id")
      .filter(col("_ts_us") >= col("_signup_us"))
      .groupBy(
        expr(s"_signup_us div $weekUs").as("cohort_week"),
        expr(s"(_ts_us - _signup_us) div $weekUs").as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }
}
