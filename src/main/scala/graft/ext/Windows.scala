package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Event-time windowing over the events stream table (extension — the
  * reference's streaming is a pure upsert changelog with no event-time
  * semantics, SURVEY.md §2.6; these are the operators a training-data
  * pipeline adds on top). Batch forms here; the streaming forms in
  * [[graft.streaming.Ingest]] reuse the same expressions behind a
  * watermark. */
object Windows {

  /** Tumbling window aggregation (fixed-size, non-overlapping). */
  def tumbling(events: DataFrame, tsCol: String, sizeSpec: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.groupBy(window(col(tsCol), sizeSpec).as("w") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start")).drop("w")

  /** Sliding window aggregation (overlapping). */
  def sliding(events: DataFrame, tsCol: String, sizeSpec: String, slideSpec: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.groupBy(window(col(tsCol), sizeSpec, slideSpec).as("w") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start")).drop("w")

  /** Session windows: gaps-and-islands per key — a new session starts when
    * the gap since the previous event exceeds `gapSeconds`. Expressed with
    * lag + a running sum (two window functions over one partition-by-key
    * shuffle); the streaming form is [[streamingSessions]]. */
  def sessionize(events: DataFrame, tsCol: String, keyCol: String,
                 gapSeconds: Long): DataFrame = {
    val byKey = W.partitionBy(col(keyCol)).orderBy(col(tsCol))
    // gap compared in exact integer microseconds (second-granularity
    // truncation would disagree with the oracle on fractional timestamps)
    val newSession = when(
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(byKey))
        > gapSeconds * 1000000L, 1).otherwise(0)
    events
      .withColumn("__new", coalesce(newSession, lit(0)))
      .withColumn("session_seq",
        sum(col("__new")).over(byKey.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .drop("__new")
  }

  /** Session summary: bounds + event count per (key, session). */
  def sessions(events: DataFrame, tsCol: String, keyCol: String,
               gapSeconds: Long): DataFrame =
    sessionize(events, tsCol, keyCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Time-series resampling with forward fill (the feature-engineering
    * regularizer: metrics/sensor streams arrive irregularly, models want
    * a fixed grid). Three steps, each scale-shaped:
    *
    *  1. last-observation-per-(key, bucket) via ONE map-side-combinable
    *     `max(struct(ts, id, value))` aggregation — no window, so a hot
    *     bucket combines on the map side instead of sorting through one
    *     task; the (ts, id) prefix makes the winner deterministic even
    *     under equal timestamps (no reliance on fixture uniqueness);
    *  2. the per-key bucket grid from `sequence(min, max, interval)` —
    *     grid size is (time span / granularity) per key, bounded by the
    *     CALENDAR, not the event count;
    *  3. one per-key ordered window carries the last observation forward
    *     across empty buckets — per-partition state is the key's grid
    *     length, again calendar-bounded.
    *
    * Output: `(key, bucket, n_obs, value_ffill)`; the first grid bucket
    * always holds an observation (the grid starts at the key's first
    * event), so `value_ffill` is never NULL.
    *
    * Corrupt-data guard: the per-key grid is bounded by the observed ts
    * SPAN, so one bad far-future timestamp would otherwise explode an
    * enormous `sequence` (Spark hard-errors past ~2^31 elements, and the
    * job drowns well before that). A key whose span exceeds
    * `maxGridBuckets` buckets FAILS the job loudly (`assert_true` naming
    * the key) instead of materializing garbage — batch can fail-and-fix,
    * and silent truncation would misreport the series as complete. The
    * streaming form ([[graft.streaming.StreamResample]]) must instead
    * DROP such events (append mode can never retract), so the two guards
    * differ deliberately. */
  def resampleFfill(events: DataFrame, keyCol: String = "user_id",
                    tsCol: String = "ts", idCol: String = "event_id",
                    valCol: String = "value", unit: String = "hour",
                    maxGridBuckets: Long = 1000000L): DataFrame = {
    val agg = events
      .select(col(keyCol).as("key"), date_trunc(unit, col(tsCol)).as("bucket"),
        struct(col(tsCol).as("t"), col(idCol).as("i"), col(valCol).as("v")).as("__m"))
      .groupBy("key", "bucket")
      .agg(count(lit(1)).as("n_obs"), max(col("__m")).as("__last"))
      .select(col("key"), col("bucket"), col("n_obs"), col("__last.v").as("obs"))
    // assert_true is NULL when the span is in bounds (so mx passes
    // through untouched) and throws otherwise; routing mx THROUGH the
    // guard keeps Catalyst from pruning the assertion away
    // coalesce: a key whose every ts is NULL has mn = mx = NULL — a NULL
    // condition would make assert_true THROW, turning data the old path
    // silently omitted (sequence(NULL, NULL) → NULL → explode drops)
    // into a job failure with a misleading span message
    val spanOk = assert_true(
      coalesce(col("mx") <= col("mn") + expr(s"interval $maxGridBuckets $unit"),
        lit(true)),
      concat(lit(s"resampleFfill: key "), col("key").cast("string"),
        lit(s" spans more than $maxGridBuckets $unit buckets (corrupt timestamp?)")))
    val grid = agg.groupBy("key")
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("key"),
        explode(sequence(col("mn"), when(spanOk.isNull, col("mx")),
          expr(s"interval 1 $unit"))).as("bucket"))
    val ffill = W.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    grid.join(agg, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("obs"), ignoreNulls = true).over(ffill).as("value_ffill"))
  }

  /** The streaming form of [[sessions]]: Spark's native `session_window`
    * behind a watermark. State is bounded by the watermark (closed
    * sessions are emitted and evicted — the unbounded-key-cardinality
    * safety a 100 TB stream needs); in append mode a session row is
    * emitted exactly once, when the watermark passes its close. Also
    * valid on batch frames. Gap-merge grouping matches [[sessions]] except
    * at the exact-gap boundary: `session_window`'s half-open
    * `[start, last+gap)` interval splits two events spaced EXACTLY `gap`
    * apart, where [[sessions]]'s strictly-greater test merges them. Output
    * also differs: `session_end` here is the window close (last event +
    * gap), not the last event time, and there is no `session_seq`. */
  def streamingSessions(events: DataFrame, tsCol: String, keyCol: String,
                        gap: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
