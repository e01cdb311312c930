package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** The streaming form of [[graft.ext.Windows.resampleFfill]]: closed grid
  * buckets stream out of managed state instead of a batch grid join —
  * the continuous regularizer a feature store runs on live metrics.
  *
  * Per key the state is ONE open bucket (index, within-bucket winning
  * observation by the same `(ts, id)` tiebreak as the batch struct-max,
  * observation count) — fixed-size per key, independent of history. An
  * event in a LATER bucket closes the open one: the closed bucket emits
  * with its own last observation, every skipped bucket in between emits
  * as a gap row (`n_obs = 0`) carrying the closed bucket's value forward,
  * and the new bucket opens. Append-mode semantics: a bucket emits
  * exactly once, when the key's timeline passes it; the currently-open
  * bucket is not yet visible (its winner could still change) — so the
  * streamed output equals the batch rebuild MINUS each key's final
  * bucket, which StreamingSpec pins across a REAL micro-batch boundary
  * (maxFilesPerTrigger = 1 forces state to survive batches).
  *
  * Bucketing is epoch-aligned (`floorDiv(ts, bucketMicros)`), which
  * coincides with the batch form's `date_trunc` exactly when the session
  * timezone is UTC — the convention every entry point of this engine
  * pins (Verify/Bench/tests) — so [[run]] REQUIRES it rather than
  * silently diverging in an offset zone (where `date_trunc('hour')`
  * truncates to :30 boundaries floorDiv knows nothing about).
  *
  * PRECONDITION (same as [[Ingest.applyBatch]]): per-key event-time order
  * must hold ACROSS batches (within a batch, events are sorted here); an
  * event older than the open bucket is dropped — the watermark-expired
  * analogue — rather than silently rewriting an already-emitted bucket. */
object StreamResample {

  case class Obs(key: Long, ts_micros: Long, event_id: Long, value: Double)

  /** Managed per-key state. `candBucket`/`candCount` track the pending
    * heal candidacy when no watermark anchor is available: the bucket of
    * the last far-side event and how many consecutive, mutually-consistent
    * far-side events have agreed with it (see [[HealConsensus]]). Both
    * reset to zero whenever a plausible near event vouches for the open
    * bucket. */
  case class OpenBucket(bucket: Long, lastTs: Long, lastId: Long,
                        lastV: Double, nObs: Long,
                        candBucket: Long = 0L, candCount: Int = 0)

  case class Out(key: Long, bucket: Long, n_obs: Long, value_ffill: Double)

  /** Max gap buckets filled per bucket transition. A single corrupt
    * far-future timestamp would otherwise make the gap loop materialize
    * millions of rows into the per-group buffer (executor OOM) — and in
    * append mode those rows could never be retracted. An event jumping
    * more than this many buckets away from the open one enters the
    * far-jump ARBITRATION below instead of the normal close/gap/open
    * path. Deliberate asymmetry with the batch form, which fails the job
    * instead (see resampleFfill's scaladoc): batch can fail-and-fix, a
    * stream must keep serving. Size it above the longest plausible idle
    * period for a key — a legitimate event beyond it is treated as
    * evidence in the arbitration, not applied directly. */
  val MaxGapBuckets: Long = 100000L

  /** Consecutive mutually-consistent far-side events required to out-vote
    * the open bucket when no watermark anchor exists. One corrupt event
    * (an epoch-zero timestamp, a far-future fat-finger) can never reach
    * this alone against a healthy key — it is dropped and merely opens a
    * candidacy that the next plausible event cancels — while a genuinely
    * poisoned key recovers after this many live events, because real
    * traffic lands within [[MaxGapBuckets]] of itself. */
  val HealConsensus: Int = 3

  def update(bucketMicros: Long)(key: Long, events: Iterator[Obs],
             state: GroupState[OpenBucket]): Iterator[Out] =
    update(bucketMicros, MaxGapBuckets)(key, events, state)

  /** Far-jump arbitration (the heart of the corrupt-timestamp defence).
    * When an event lands more than `maxGapBuckets` buckets from the open
    * bucket, exactly one side is wrong but the pair alone cannot say
    * which — a far-past EVENT against a healthy key and a healthy event
    * against far-future STATE look identical from inside the pair. The
    * decision therefore uses an external plausibility anchor:
    *
    *  1. The event-time watermark, when the query defines one
    *     (`state.getCurrentWatermarkMs`): whichever side sits more than
    *     `maxGapBuckets` buckets from the watermark is the corrupt one.
    *     State corrupt + event plausible → heal immediately; state
    *     plausible + event corrupt → drop the event; both implausible →
    *     drop the event AND clear the state (nothing trustworthy
    *     remains for the key).
    *  2. Without a watermark, consensus: [[HealConsensus]] consecutive
    *     far-side events that agree with EACH OTHER (each within
    *     `maxGapBuckets` of the previous candidate) out-vote the open
    *     bucket. Until the quorum is reached, far events are dropped
    *     (the pre-heal behavior — harmless) and the candidacy is
    *     persisted in state so recovery works across micro-batches.
    *
    * Healing direction decides the open bucket's fate: a FORWARD heal
    * (state behind the live events — a far-past first event, or a key
    * returning from a longer-than-`maxGapBuckets` idle period) EMITS the
    * open bucket as a closed row with no gap fill, because that bucket
    * lies in the key's past and may be legitimate pre-idle data; a
    * BACKWARD heal (state implausibly in the future) DISCARDS it
    * unemitted, because appending a future-timestamped row could never
    * be retracted. */
  def update(bucketMicros: Long, maxGapBuckets: Long)(key: Long,
             events: Iterator[Obs],
             state: GroupState[OpenBucket]): Iterator[Out] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_micros, e.event_id))
    val hadState = state.exists
    var st = state.getOption.orNull
    val out = scala.collection.mutable.ArrayBuffer.empty[Out]
    val log = java.util.logging.Logger.getLogger(getClass.getName)
    // overflow-safe distance (corrupt extremes can straddle the Long
    // range: a pre-epoch open bucket minus a far-future event overflows
    // and would sign-flip PAST the guard it exists to arm)
    def distance(hi: Long, lo: Long): Long =
      try Math.subtractExact(hi, lo)
      catch { case _: ArithmeticException => Long.MaxValue }
    def far(a: Long, b: Long): Boolean =
      (if (a >= b) distance(a, b) else distance(b, a)) > maxGapBuckets
    // external plausibility anchor: a defined, advanced event-time
    // watermark (batch queries report -1; a streaming query without
    // `withWatermark` throws — both mean "no anchor", as does a
    // watermark still at its initial 0)
    val anchorBucket: Option[Long] =
      (try state.getCurrentWatermarkMs()
       catch { case _: Exception => -1L }) match {
        case wm if wm > 0L =>
          try Some(Math.floorDiv(Math.multiplyExact(wm, 1000L), bucketMicros))
          catch { case _: ArithmeticException => None }
        case _ => None
      }
    sorted.foreach { e =>
      val b = Math.floorDiv(e.ts_micros, bucketMicros)
      if (st == null) {
        // init path: with an anchor, refuse to install implausible state
        // in the first place — the corrupt-first-event poisoning the
        // heals exist to undo
        if (anchorBucket.exists(wb => far(b, wb)))
          log.warning(s"StreamResample: dropped implausible first event " +
            s"(key=$key, id=${e.event_id}, bucket=$b) vs watermark")
        else st = OpenBucket(b, e.ts_micros, e.event_id, e.value, 1L)
      } else if (b == st.bucket) {
        // the same LEXICOGRAPHIC (ts, id, value) ordering as the batch
        // form's max(struct(t, i, v)) — value included, so even a full
        // (ts, id) collision (a replayed/corrected event) resolves
        // identically in both forms instead of by encounter order
        val wins = e.ts_micros > st.lastTs ||
          (e.ts_micros == st.lastTs && (e.event_id > st.lastId ||
            (e.event_id == st.lastId && e.value > st.lastV)))
        st = if (wins)
          OpenBucket(b, e.ts_micros, e.event_id, e.value, st.nObs + 1)
        else st.copy(nObs = st.nObs + 1, candBucket = 0L, candCount = 0)
      } else if (b > st.bucket && distance(b, st.bucket) <= maxGapBuckets) {
        // normal close + bounded gap fill + re-open
        out += Out(key, st.bucket, st.nObs, st.lastV)
        var g = st.bucket + 1
        while (g < b) { out += Out(key, g, 0L, st.lastV); g += 1 }
        st = OpenBucket(b, e.ts_micros, e.event_id, e.value, 1L)
      } else if (b < st.bucket && distance(st.bucket, b) <= maxGapBuckets) {
        // ordinary cross-batch time regression: dropped (see the
        // PRECONDITION above). A plausible NEAR event also vouches for
        // the open bucket, so any pending heal candidacy is cancelled.
        if (st.candCount != 0) st = st.copy(candBucket = 0L, candCount = 0)
      } else {
        // far jump, either direction — arbitrate (see method scaladoc)
        val decided: Option[Boolean] = anchorBucket.map { wb =>
          val stateCorrupt = far(st.bucket, wb)
          val eventCorrupt = far(b, wb)
          if (stateCorrupt && eventCorrupt) {
            log.warning(s"StreamResample: key=$key — open bucket " +
              s"${st.bucket} AND event bucket $b both implausible vs " +
              s"watermark bucket $wb; clearing state, dropping event")
            st = null
            false
          } else stateCorrupt // state corrupt, event plausible → heal
        }
        val healNow = decided.getOrElse {
          if (st != null) {
            val consistent = st.candCount > 0 && !far(b, st.candBucket)
            val cnt = if (consistent) st.candCount + 1 else 1
            st = st.copy(candBucket = b, candCount = cnt)
            cnt >= HealConsensus
          } else false
        }
        if (healNow && st != null) {
          if (b > st.bucket) {
            // forward heal: the open bucket is in the key's PAST — emit
            // it (no gap fill; the gap exceeds maxGapBuckets by
            // definition) so a legitimate pre-idle bucket is not lost
            log.warning(s"StreamResample: forward heal (key=$key) — " +
              s"closed stale bucket ${st.bucket}, re-opened at $b")
            out += Out(key, st.bucket, st.nObs, st.lastV)
          } else
            // backward heal: the open bucket sits implausibly in the
            // future — discard it UNEMITTED (an appended future row
            // could never be retracted)
            log.warning(s"StreamResample: backward heal (key=$key) — " +
              s"discarded corrupt open bucket ${st.bucket}, re-opened " +
              s"at $b")
          st = OpenBucket(b, e.ts_micros, e.event_id, e.value, 1L)
        } else if (!healNow && st != null && decided.isEmpty)
          log.warning(s"StreamResample: dropped far event (key=$key, " +
            s"id=${e.event_id}, bucket=$b vs open ${st.bucket}); heal " +
            s"candidacy ${st.candCount}/$HealConsensus")
        else if (!healNow && st != null)
          log.warning(s"StreamResample: dropped implausible event " +
            s"(key=$key, id=${e.event_id}, bucket=$b) vs watermark")
      }
    }
    if (st != null) state.update(st)
    else if (hadState) state.remove()
    out.iterator
  }

  /** Drive a JSON observation stream through the stateful resampler into
    * `outDir` (one closed-bucket row per emission, append-only).
    * `maxFilesPerTrigger` lets tests force multi-batch consumption so the
    * cross-batch state carry-over is actually exercised.
    * `watermarkDelay` (e.g. `"1 hour"`) attaches an event-time watermark
    * to the observation stream, which (a) lets Spark expire genuinely
    * late rows before the operator and (b) arms the watermark ANCHOR in
    * [[update]]'s far-jump arbitration, so a poisoned key heals on the
    * first plausible event instead of waiting for [[HealConsensus]].
    * `validRangeMicros` is the watermark's OWN defense: Spark computes
    * the watermark as max-seen-event-time minus delay, so a single
    * corrupt far-FUTURE timestamp drags it past every legitimate event
    * and the stream silently expires all real traffic — a poisoning the
    * per-key state heals cannot undo because it happens upstream of the
    * operator. Rows outside the deployment's declared plausible range
    * are therefore dropped BEFORE `withWatermark` (the per-key
    * arbitration still handles corrupt values INSIDE the range). */
  def run(spark: SparkSession, obsDir: String, outDir: String,
          checkpointDir: String, bucketMicros: Long,
          maxFilesPerTrigger: Option[Int] = None,
          watermarkDelay: Option[String] = None,
          validRangeMicros: Option[(Long, Long)] = None): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import org.apache.spark.sql.types._
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "StreamResample's epoch-aligned buckets match resampleFfill's " +
        "date_trunc only under the engine's pinned-UTC convention")
    val schema = StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("ts_micros", LongType, nullable = false),
      StructField("event_id", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    StreamDrive.jsonToParquet(spark, schema, obsDir, outDir, checkpointDir,
      maxFilesPerTrigger) { df =>
      val ranged = validRangeMicros.fold(df) { case (lo, hi) =>
        df.where(col("ts_micros").between(lo, hi))
      }
      val anchored = watermarkDelay.fold(ranged)(d =>
        ranged.withColumn("ts", timestamp_micros(col("ts_micros")))
          .withWatermark("ts", d))
      val closed: Dataset[Out] = anchored.as[Obs]
        .groupByKey(_.key)
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.NoTimeout())(update(bucketMicros))
      closed.toDF()
    }
  }
}
