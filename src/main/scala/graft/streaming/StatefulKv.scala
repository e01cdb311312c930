package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** The changelog upsert as STATEFUL streaming — the
  * `mapGroupsWithState` formulation of ST3, complementing
  * [[Ingest.run]]'s `foreachBatch` table-rewrite formulation.
  *
  * Each key's latest `(seq, doc)` lives in Spark's managed state store
  * (checkpointed, partitioned by key across executors — this is the form
  * that scales to billions of live keys, where rewriting a state table
  * per batch would not). Out-of-order and replayed events are ignored via
  * the monotonic `seq` guard, so at-least-once input still converges.
  */
object StatefulKv {

  case class Change(seq: Long, op: String, key: String, doc: String)
  case class KvState(seq: Long, doc: String, deleted: Boolean)
  case class KvUpdate(key: String, seq: Long, doc: String, deleted: Boolean)

  def updateKey(key: String, changes: Iterator[Change],
                state: GroupState[KvState]): Iterator[KvUpdate] = {
    val latest = changes.foldLeft(state.getOption.getOrElse(KvState(Long.MinValue, null, deleted = true))) {
      (cur, c) =>
        if (c.seq <= cur.seq) cur // stale / replayed event: ignore
        else if (c.op == "delete") KvState(c.seq, null, deleted = true)
        else KvState(c.seq, c.doc, deleted = false)
    }
    if (state.getOption.contains(latest)) Iterator.empty
    else {
      state.update(latest)
      Iterator.single(KvUpdate(key, latest.seq, latest.doc, latest.deleted))
    }
  }

  /** Run the changelog through managed state, emitting one update row per
    * changed key per batch to `outDir` (shared [[StreamDrive]] loop). */
  def run(spark: SparkSession, changelogDir: String, outDir: String,
          checkpointDir: String): StreamingQuery =
    StreamDrive.jsonToParquet(spark, Ingest.changelogSchema, changelogDir,
      outDir, checkpointDir) { df =>
      import spark.implicits._
      val updates: Dataset[KvUpdate] = df.as[Change]
        .groupByKey(_.key)
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateKey)
      updates.toDF()
    }
}
