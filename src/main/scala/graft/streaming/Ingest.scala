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
    * converge. */
  def applyBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("seq").desc)
    val latest = batch.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val upserts = latest.where(col("op") =!= "delete").select("key", "doc")
    val deletes = latest.where(col("op") === "delete").select("key")
    state.join(latest.select("key"), Seq("key"), "left_anti") // untouched keys
      .unionByName(upserts)
      .join(deletes, Seq("key"), "left_anti")
  }

  private val stateSchema = StructType(Seq(
    StructField("key", StringType), StructField("doc", StringType)))

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

  /** Read the current state table (empty before the first batch). */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    latestVersion(spark, stateDir) match {
      case Some(dir) => spark.read.schema(stateSchema).parquet(dir.toString)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    }

  /** ST2+ST4 — run the changelog through a streaming query into a
    * versioned parquet state table, with `Trigger.AvailableNow` as the
    * read-your-writes barrier.
    *
    * Crash-safety: each batch writes a NEW version dir `v<batchId>` (never
    * mutating the previous one) and readers take the highest version with
    * a `_SUCCESS` marker. A crash mid-write leaves a marker-less dir that
    * the checkpoint replay overwrites; a crash after write but before
    * checkpoint commit replays the batch into the same version —
    * idempotent either way, so at-least-once delivery always converges to
    * the same state. Superseded versions are pruned after the new one is
    * complete. At 100 TB the same `foreachBatch` body targets a
    * MERGE-capable table format (this function is the seam).
    */
  def run(spark: SparkSession, changelogDir: String, stateDir: String,
          checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream.schema(changelogSchema).json(changelogDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val current = readState(s, stateDir)
        applyBatch(current, batch)
          .write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        // prune strictly older versions now that v<batchId> is complete
        val (fs, root) = fsFor(s, stateDir)
        if (fs.exists(root)) fs.listStatus(root)
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
