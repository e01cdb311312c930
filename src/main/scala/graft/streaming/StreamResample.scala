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
  case class OpenBucket(bucket: Long, lastTs: Long, lastId: Long,
                        lastV: Double, nObs: Long)
  case class Out(key: Long, bucket: Long, n_obs: Long, value_ffill: Double)

  /** Max gap buckets filled per bucket transition. A single corrupt
    * far-future timestamp would otherwise make the gap loop materialize
    * millions of rows into the per-group buffer (executor OOM) — and in
    * append mode those rows could never be retracted. An event jumping
    * more than this many buckets ahead of the open one is treated like
    * the time-regression case: DROPPED (state unchanged), logged for the
    * operator to route to a DLQ feed. Deliberate asymmetry with the batch
    * form, which fails the job instead (see resampleFfill's scaladoc):
    * batch can fail-and-fix, a stream must keep serving. */
  val MaxGapBuckets: Long = 100000L

  def update(bucketMicros: Long)(key: Long, events: Iterator[Obs],
             state: GroupState[OpenBucket]): Iterator[Out] =
    update(bucketMicros, MaxGapBuckets)(key, events, state)

  def update(bucketMicros: Long, maxGapBuckets: Long)(key: Long,
             events: Iterator[Obs],
             state: GroupState[OpenBucket]): Iterator[Out] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_micros, e.event_id))
    var st = state.getOption.orNull
    val out = scala.collection.mutable.ArrayBuffer.empty[Out]
    // overflow-safe distance (corrupt extremes can straddle the Long
    // range: a pre-epoch open bucket minus a far-future event overflows
    // and would sign-flip PAST the guard it exists to arm)
    def distance(hi: Long, lo: Long): Long =
      try Math.subtractExact(hi, lo)
      catch { case _: ArithmeticException => Long.MaxValue }
    sorted.foreach { e =>
      val b = Math.floorDiv(e.ts_micros, bucketMicros)
      if (st == null) {
        st = OpenBucket(b, e.ts_micros, e.event_id, e.value, 1L)
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
        else st.copy(nObs = st.nObs + 1)
      } else if (b > st.bucket && distance(b, st.bucket) > maxGapBuckets) {
        // corrupt far-future event: filling the gap would materialize
        // b - st.bucket rows (unbounded) into the buffer — drop it,
        // keep the open bucket (see MaxGapBuckets)
        java.util.logging.Logger.getLogger(getClass.getName).warning(
          s"StreamResample: dropped event (key=$key, id=${e.event_id}) " +
            s"jumping ahead of the open bucket (max $maxGapBuckets)")
      } else if (b > st.bucket) {
        out += Out(key, st.bucket, st.nObs, st.lastV)
        var g = st.bucket + 1
        while (g < b) { out += Out(key, g, 0L, st.lastV); g += 1 }
        st = OpenBucket(b, e.ts_micros, e.event_id, e.value, 1L)
      } else if (distance(st.bucket, b) > maxGapBuckets) {
        // the OPEN BUCKET is the corrupt side: the forward guard bounds
        // every later jump, so state this far AHEAD of a plausible event
        // can only have been installed by a corrupt FIRST event for the
        // key (the init path has no prior state to gauge against).
        // Without healing, that one bad record silently drops every
        // subsequent legitimate event for the key forever. Heal: discard
        // the poisoned open bucket UNEMITTED (appending it would write
        // garbage no retraction can remove) and re-open at the event.
        java.util.logging.Logger.getLogger(getClass.getName).warning(
          s"StreamResample: healed corrupt open bucket (key=$key, " +
            s"bucket=${st.bucket}) — re-opened at event ${e.event_id}")
        st = OpenBucket(b, e.ts_micros, e.event_id, e.value, 1L)
      } // else: event-time regression across batches — dropped (see doc)
    }
    if (st != null) state.update(st)
    out.iterator
  }

  /** Drive a JSON observation stream through the stateful resampler into
    * `outDir` (one closed-bucket row per emission, append-only).
    * `maxFilesPerTrigger` lets tests force multi-batch consumption so the
    * cross-batch state carry-over is actually exercised. */
  def run(spark: SparkSession, obsDir: String, outDir: String,
          checkpointDir: String, bucketMicros: Long,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import spark.implicits._
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
      val closed: Dataset[Out] = df.as[Obs]
        .groupByKey(_.key)
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.NoTimeout())(update(bucketMicros))
      closed.toDF()
    }
  }
}
