package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** The streaming form of [[graft.ext.EventAnalytics.funnelWindowed]]:
  * the running-max anchor DP has FIXED per-key state (k−1 anchor maxima
  * + the reached level + a regression fence), so it maps directly onto
  * `flatMapGroupsWithState` — live conversion tracking without
  * reprocessing history.
  *
  * Output is the LEVEL-COMPLETION LOG, which is append-safe by
  * construction: reach is monotone per user and each level emits exactly
  * once (at the event that first certifies it, carrying that event's
  * time), so a user contributes at most k rows ever and nothing needs
  * retraction. The streamed log's max level per user equals the batch
  * DP's reach on the same events — StreamingSpec pins that equivalence
  * across real micro-batch boundaries.
  *
  * PRECONDITION (same as [[StreamResample]]/[[Ingest.applyBatch]]):
  * per-key `(ts, event_id)` order must hold ACROSS batches (within a
  * batch, events are sorted here). A regressing event is DROPPED via the
  * state's `(lastTs, lastId)` fence: the DP's "strictly preceding"
  * reads would otherwise see future anchors and overcount. */
object StreamFunnel {

  case class Ev(user_id: Long, ts_micros: Long, event_id: Long,
                event_type: String)
  /** `b(i)` = max anchor of a chain reaching level i+1 over events
    * strictly before the fence; MinValue = unset. */
  case class FunnelState(b: Array[Long], reach: Int, lastTs: Long,
                         lastId: Long)
  case class Completion(user_id: Long, level: Long, step: String,
                        ts_micros: Long)

  def update(steps: Seq[String], windowMicros: Long)(key: Long,
             events: Iterator[Ev],
             state: GroupState[FunnelState]): Iterator[Completion] = {
    val k = steps.size
    val idx = steps.zipWithIndex.toMap
    val sorted = events.toSeq.sortBy(e => (e.ts_micros, e.event_id))
      .filter(e => idx.contains(e.event_type))
    // a key whose batch carried only non-step events must not ALLOCATE
    // state (run() pre-filters, but update() is also a public kernel)
    if (sorted.isEmpty && !state.exists) return Iterator.empty
    var st = state.getOption.getOrElse(
      FunnelState(Array.fill(math.max(k - 1, 1))(Long.MinValue), 0,
        Long.MinValue, Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer.empty[Completion]
    sorted.foreach { e =>
      idx.get(e.event_type).foreach { i =>
        val after = e.ts_micros > st.lastTs ||
          (e.ts_micros == st.lastTs && e.event_id > st.lastId)
        if (after) { // regression fence: see PRECONDITION
          // reads see only STRICTLY PRECEDING events: this event's type
          // is i, and the transition reads b(i-1) / writes b(i), so the
          // read side cannot observe its own write
          val anchor = if (i == 0) e.ts_micros else st.b(i - 1)
          val certifies =
            if (i == 0) st.reach < 1
            else anchor != Long.MinValue &&
              e.ts_micros - anchor <= windowMicros && st.reach < i + 1
          if (certifies) {
            out += Completion(key, (i + 1).toLong, steps(i), e.ts_micros)
            st = st.copy(reach = i + 1)
          }
          if (i < k - 1 && anchor != Long.MinValue && anchor > st.b(i)) {
            val nb = st.b.clone(); nb(i) = anchor
            st = st.copy(b = nb)
          }
          st = st.copy(lastTs = e.ts_micros, lastId = e.event_id)
        }
      }
    }
    state.update(st)
    out.iterator
  }

  /** Drive a JSON event stream through the stateful funnel into `outDir`
    * (one completion row per first level achievement, append-only). */
  def run(spark: SparkSession, evDir: String, outDir: String,
          checkpointDir: String, steps: Seq[String], windowMicros: Long,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType, nullable = false),
      StructField("ts_micros", LongType, nullable = false),
      StructField("event_id", LongType, nullable = false),
      StructField("event_type", StringType, nullable = false)))
    StreamDrive.jsonToParquet(spark, schema, evDir, outDir, checkpointDir,
      maxFilesPerTrigger) { df =>
      // pre-filter to funnel types: non-step events neither shuffle nor
      // allocate per-user state (a catalog-wide stream is mostly noise
      // relative to any one funnel)
      val log: Dataset[Completion] = df
        .where(org.apache.spark.sql.functions.col("event_type")
          .isin(steps: _*))
        .as[Ev]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.NoTimeout())(update(steps, windowMicros))
      log.toDF()
    }
  }
}
