package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream — the ordered funnel
  * and cohort-retention operators a product-analytics workload runs
  * beside the temporal joins (north-star extension; the reference has no
  * events surface — its closest analogue is the per-type hit counting of
  * SURVEY §2.3 P8).
  *
  * Scale design: both operators reduce to user-keyed aggregations and
  * equi joins — one partitioning (the user key) carries every stage, no
  * windows, no per-user unbounded state. A funnel of k steps is k
  * map-side-combinable `min` aggregations chained through k−1 user-keyed
  * joins whose build sides shrink monotonically (each step's survivors);
  * retention is two aggregations and one join. Nothing here materializes
  * per-event state beyond the shuffles Catalyst already plans. */
object EventAnalytics {

  /** Ordered-funnel completion: for `steps` event types s₁…s_k, count
    * the users who performed them in strict timestamp order. Semantics
    * are GREEDY-EARLIEST (the standard funnel definition): step 1's
    * anchor is the user's earliest s₁ event, step i's the earliest s_i
    * event strictly after the step-(i−1) anchor. Greedy-earliest is
    * maximal for strict ordering — choosing the earliest anchor only
    * widens later steps' options — so a user completes the funnel here
    * iff ANY strictly-increasing assignment of their events exists.
    *
    * Returns one row PER STEP — `(step_idx, step, n_users)` — including
    * zero-user steps (a global count, not a groupBy, so an empty funnel
    * tail still reports), making drop-off ratios directly readable.
    *
    * Relational shape: step i is `min(ts)` over the type-s_i slice
    * joined to step i−1's survivors on the user key with a `ts >`
    * residual — aggregation before join, so each join's build side is at
    * most one row per surviving user, never raw events. */
  def funnel(events: DataFrame, steps: Seq[String], tsCol: String = "ts",
             userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct event types, got $steps")
    def slice(st: String) = events.where(col(typeCol) === st)
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
    val reached = steps.tail.scanLeft(
      slice(steps.head).groupBy("__u").agg(min(col("__ts")).as("__t"))) {
      (prev, st) =>
        slice(st).join(prev, Seq("__u"))
          .where(col("__ts") > col("__t"))
          .groupBy("__u").agg(min(col("__ts")).as("__t"))
    }
    reached.zip(steps).zipWithIndex.map { case ((r, st), i) =>
      r.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"), lit(st).as("step"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention at day granularity: users cohort by the calendar
    * day of their FIRST event; each `(cohort, day_offset)` cell counts
    * the cohort's users active (≥1 event) on cohort-day + offset. The
    * classic retention triangle — `day_offset = 0` is cohort size by
    * construction (every user is active on their first day).
    *
    * Two map-side-combinable aggregations (first-day per user, distinct
    * active (user, day) pairs) and one user-keyed join; the output is
    * bounded by cohorts × horizon days, not by users or events. */
  def retentionCohorts(events: DataFrame, tsCol: String = "ts",
                       userCol: String = "user_id"): DataFrame = {
    val firsts = events.groupBy(col(userCol).as("__u"))
      .agg(date_trunc("day", min(col(tsCol))).as("cohort"))
    val active = events
      .select(col(userCol).as("__u"), date_trunc("day", col(tsCol)).as("__d"))
      .distinct()
    // (user, day) is distinct and cohort is functional on user, so the
    // plain count IS the distinct active-user count per cell
    active.join(firsts, Seq("__u"))
      .groupBy(col("cohort"),
        datediff(col("__d"), col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
