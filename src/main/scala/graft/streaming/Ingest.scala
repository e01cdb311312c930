package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** ST1–ST5 — the async indexing pipeline as Structured Streaming.
  *
  * The reference publishes `{doc, type: insert|update}` messages to
  * RabbitMQ (`/root/reference/src/utils/rabbitMq.ts:5-17,34-42`), consumes
  * them with manual ack (`:92-115`, at-least-once), applies each by
  * re-shredding into ES (`:50-91`), and makes writes read-your-writes by
  * polling every 200 ms until the doc is visible
  * (`apiLogicForCRUD.ts:17-58`). Structured Streaming gives each piece a
  * principled replacement:
  *
  *  - changelog rows `(seq, op, key, doc)` in a streaming source (files
  *    locally; Kafka in production) — ST1;
  *  - `foreachBatch` + checkpointing ≡ consume + manual ack: a batch is
  *    reprocessed on failure, never lost — at-least-once — ST2;
  *  - the batch apply is an idempotent last-writer-wins upsert keyed by
  *    `key` ordered by `seq`, so at-least-once replay converges — exactly
  *    why the reference's silent-retry design is sound (README v2
  *    updates) — ST3/ST5;
  *  - `Trigger.AvailableNow` / `processAllAvailable()` is a real barrier
  *    replacing the 200 ms poll loop — ST4.
  */
object Ingest {

  val changelogSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("op", StringType, nullable = false), // insert | update | delete
    StructField("key", StringType, nullable = false),
    StructField("doc", StringType)))

  /** ST3 kernel — apply a (micro-)batch of changelog rows to the current
    * state: last event per key wins (by `seq`), deletes drop the key.
    * Pure function of (state, batch) → state; idempotent under replay of
    * any suffix of the log, which is what makes at-least-once delivery
    * converge. Rows whose `op` is not one of insert/update/delete
    * (including NULL — PERMISSIVE JSON reads don't enforce the schema's
    * nullability) are ignored entirely; without the filter such a row's
    * key would be anti-joined out of state but re-added by neither branch:
    * a silent delete. PRECONDITION: per-key seq order must hold across
    * batches (true for a replayed file log and for Kafka with key-hash
    * partitioning); the state carries no seq, so a stale event surfacing
    * in a LATER batch would win — [[applyBatchVersioned]] (used by
    * [[run]]) and [[StatefulKv]] carry the seq and tolerate cross-batch
    * disorder. */
  def applyBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    // seq desc picks the latest; the trailing terms make a genuine equal-seq
    // collision deterministic (deletes beat updates, then doc order) instead
    // of leaving the winner to shuffle arrival order
    val w = Window.partitionBy(col("key"))
      .orderBy(col("seq").desc, (col("op") === "delete").desc, col("doc").desc_nulls_last)
    val latest = batch.where(col("op").isin("insert", "update", "delete"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val upserts = latest.where(col("op") =!= "delete").select("key", "doc")
    val deletes = latest.where(col("op") === "delete").select("key")
    state.join(latest.select("key"), Seq("key"), "left_anti") // untouched keys
      .unionByName(upserts)
      .join(deletes, Seq("key"), "left_anti")
  }

  /** ST3 kernel, versioned form: state rows carry `(key, doc, seq,
    * deleted)` and the higher seq wins between state and batch, so a stale
    * event arriving in a LATER micro-batch (late file, out-of-order Kafka
    * partition) cannot regress a newer write. Deletes persist as
    * tombstones — the seq fence against a stale pre-delete update
    * resurrecting the key; at scale a compaction pass ages them out past
    * the source's reordering horizon. */
  def applyBatchVersioned(state: DataFrame, batch: DataFrame): DataFrame = {
    // Equal-seq collisions resolve deterministically: deletes win ties
    // (then doc order), never shuffle arrival order. Exact replays are
    // unaffected (the colliding rows are identical); this pins the verdict
    // for GENUINE seq collisions between a tombstone and an update.
    val wBatch = Window.partitionBy(col("key"))
      .orderBy(col("seq").desc, (col("op") === "delete").desc, col("doc").desc_nulls_last)
    val latest = batch.where(col("op").isin("insert", "update", "delete"))
      .withColumn("__rn", row_number().over(wBatch))
      .where(col("__rn") === 1)
      .select(col("key"),
        when(col("op") === "delete", lit(null)).otherwise(col("doc")).as("doc"),
        col("seq"), (col("op") === "delete").as("deleted"))
    val wMerge = Window.partitionBy(col("key"))
      .orderBy(col("seq").desc, col("deleted").desc, col("doc").desc_nulls_last)
    state.unionByName(latest)
      .withColumn("__rn", row_number().over(wMerge))
      .where(col("__rn") === 1).drop("__rn")
  }

  private val stateSchema = StructType(Seq(
    StructField("key", StringType), StructField("doc", StringType),
    StructField("seq", LongType), StructField("deleted", BooleanType)))

  /** FileSystem for `dir` resolved through the session's Hadoop conf — the
    * same abstraction Spark's own sinks use, so the versioned-state
    * protocol works unchanged on local FS, HDFS, or an object store with a
    * Hadoop connector (s3a/gs/abfs). */
  private def fsFor(spark: SparkSession, dir: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  /** Latest COMPLETE state version under `stateDir` (parquet's _SUCCESS
    * marker is the completeness witness). */
  private def latestVersion(spark: SparkSession, stateDir: String): Option[org.apache.hadoop.fs.Path] = {
    val (fs, root) = fsFor(spark, stateDir)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v") &&
        st.getPath.getName.stripPrefix("v").forall(_.isDigit) &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .sortBy(_.getPath.getName.stripPrefix("v").toLong)
      .lastOption.map(_.getPath)
  }

  /** Read the current state table as live `(key, doc)` rows — tombstones
    * are an implementation detail of the versioned store and filtered out
    * (empty before the first batch). A version written by the pre-versioned
    * `(key, doc)` format reads `deleted` as NULL under [[stateSchema]];
    * such rows are LIVE (missing tombstone flag = not deleted) — a bare
    * `!deleted` would silently drop every legacy row. */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    readVersionedState(spark, stateDir)
      .where(coalesce(col("deleted"), lit(false)) === false).select("key", "doc")

  private def readVersionedState(spark: SparkSession, stateDir: String): DataFrame =
    latestVersion(spark, stateDir) match {
      case Some(dir) => spark.read.schema(stateSchema).parquet(dir.toString)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    }

  /** ST2+ST4 — run the changelog through a streaming query into a
    * versioned parquet state table, with `Trigger.AvailableNow` as the
    * read-your-writes barrier.
    *
    * Crash-safety: each batch computes the next state from the latest
    * `_SUCCESS`-marked version, writes it to a STAGING dir, and renames it
    * into place as `v<batchId>` — never overwriting the directory it is
    * reading from (a direct overwrite of `v<batchId>` would fail exactly
    * on checkpoint-replay of batch N, whose input version IS `v<batchId>`
    * — "cannot overwrite a path that is also being read from" — bricking
    * the stream). Readers take the highest complete version; a crash
    * mid-write leaves a staging dir the replay overwrites; a crash between
    * rename and checkpoint commit replays the batch, recomputing the same
    * rows (the versioned apply is idempotent) and swapping them in again.
    * Superseded versions are pruned only after the new one is complete.
    * At 100 TB the same `foreachBatch` body targets a MERGE-capable table
    * format (this function is the seam).
    */
  def run(spark: SparkSession, changelogDir: String, stateDir: String,
          checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream.schema(changelogSchema).json(changelogDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val (fs, root) = fsFor(s, stateDir)
        val target = new org.apache.hadoop.fs.Path(root, s"v$batchId")
        // Checkpoint-replay of batch N can arrive when v<batchId> is
        // already the ONLY complete version (older ones were pruned after
        // the rename, before the checkpoint commit). Deleting it before
        // re-renaming would open a crash window with ZERO complete
        // versions: a crash between delete and rename would make the next
        // replay read empty state and silently rebuild from this batch
        // alone, losing every earlier key. A complete target is exactly
        // what this replay would recompute (the versioned apply is
        // idempotent), so reuse it and skip straight to pruning; only an
        // INCOMPLETE leftover (no _SUCCESS) is deleted before the rename.
        if (!fs.exists(new org.apache.hadoop.fs.Path(target, "_SUCCESS"))) {
          val current = readVersionedState(s, stateDir)
          val staging = new org.apache.hadoop.fs.Path(root, s"_staging_v$batchId")
          applyBatchVersioned(current, batch)
            .write.mode("overwrite").parquet(staging.toString)
          if (fs.exists(target)) fs.delete(target, true) // incomplete leftover
          if (!fs.rename(staging, target))
            throw new java.io.IOException(s"state swap failed: $staging -> $target")
        }
        // prune strictly older versions now that v<batchId> is complete
        fs.listStatus(root)
          .filter { st =>
            val n = st.getPath.getName
            n.startsWith("v") && n.stripPrefix("v").forall(_.isDigit) &&
              n.stripPrefix("v").toLong < batchId
          }
          .foreach(st => fs.delete(st.getPath, true))
        ()
      }
      .start()
    q.awaitTermination()
    q
  }

  /** ST5 — dead-letter split: rows that fail validation go to a side table
    * instead of poisoning the stream (the reference retries invisibly;
    * here the DLQ is explicit and queryable). */
  def withDlq(batch: DataFrame, isValid: org.apache.spark.sql.Column): (DataFrame, DataFrame) =
    (batch.where(isValid), batch.where(!isValid))
}
