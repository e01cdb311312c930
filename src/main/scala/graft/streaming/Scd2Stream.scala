package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** [[Ingest.scd2History]] as STATEFUL streaming: each key's OPEN version
  * lives in Spark's managed state store; every arriving event closes it
  * and emits the finished interval downstream. The emitted stream is
  * append-only — exactly the immutable-closed-rows property
  * [[Ingest.scd2Merge]] exploits in batch — so the sink can be a plain
  * append table; the open rows are the (bounded, one-per-live-key) state,
  * reconstructed on restart from the checkpoint. This is the form that
  * maintains the history table continuously at billions of live keys,
  * where re-folding the log per batch would not.
  *
  * Same reference lineage as the rest of the pipeline: the async indexer
  * (`/root/reference/src/utils/rabbitMq.ts:92-115`) applies an
  * at-least-once changelog; the monotonic `seq` guard makes replayed
  * events no-ops, so delivery retries cannot double-close an interval.
  */
object Scd2Stream {

  /** Per-key carried state: highest seq applied (the replay fence) plus
    * the open version, if any (none right after a delete). */
  case class OpenState(lastSeq: Long, from: Long, doc: String, open: Boolean)

  /** A finished validity interval — the append-only output row. */
  case class ClosedVersion(key: String, doc: String,
                           valid_from_seq: Long, valid_to_seq: Long)

  /** Fold one key's batch slice into its open-version state, emitting
    * every interval the slice closes. Events sort by the SAME
    * (seq, delete-last, null-doc-first, doc) order as
    * [[Ingest.scd2History]]'s window; equal-seq collisions WITHIN a
    * batch apply in that order (they are distinct events the batch
    * rebuild resolves the same way — including the degenerate [s, s)
    * interval it emits), while an event at or below the fence that
    * nothing in this invocation applied is an at-least-once REPLAY and
    * is a no-op. The one ambiguity this leaves — a genuinely new event
    * arriving in a LATER batch with a seq equal to the fence — is
    * indistinguishable from redelivery by seq alone and resolves as
    * replay, so equal-seq collisions must co-arrive in one batch (true
    * for a file log, where the batch is the file). A slice that applies
    * nothing (all replays / unknown ops) leaves state UNTOUCHED — no
    * state row materializes for garbage keys. */
  def updateKey(key: String, changes: Iterator[StatefulKv.Change],
                state: GroupState[OpenState]): Iterator[ClosedVersion] = {
    var st = state.getOption.getOrElse(OpenState(Long.MinValue, 0L, null, open = false))
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedVersion]
    var applied = false
    changes.toSeq
      .filter(c => c.op == "insert" || c.op == "update" || c.op == "delete")
      .sortBy(c => (c.seq, c.op == "delete", c.doc != null, Option(c.doc).getOrElse("")))
      .foreach { c =>
        if (c.seq > st.lastSeq || (applied && c.seq == st.lastSeq)) {
          if (st.open) out += ClosedVersion(key, st.doc, st.from, c.seq)
          st =
            if (c.op == "delete") OpenState(c.seq, 0L, null, open = false)
            else OpenState(c.seq, c.seq, c.doc, open = true)
          applied = true
        }
      }
    if (applied) state.update(st)
    out.iterator
  }

  /** Drive a JSON-file changelog through managed state, appending closed
    * intervals to `outDir` (parquet). `Trigger.AvailableNow` is the same
    * read-your-writes barrier the rest of the pipeline uses. */
  def run(spark: SparkSession, changelogDir: String, outDir: String,
          checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val closed: Dataset[ClosedVersion] = spark.readStream
      .schema(Ingest.changelogSchema).json(changelogDir)
      .as[StatefulKv.Change]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateKey)
    val q = closed.toDF()
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
    q
  }
}
