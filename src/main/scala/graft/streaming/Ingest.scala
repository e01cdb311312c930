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

  /** ST2+ST4 — run the changelog through a streaming query into a parquet
    * state table, with `Trigger.AvailableNow` as the read-your-writes
    * barrier. `stateDir` is rewritten per batch via the batch apply —
    * locally that is a full-file swap; at scale the same `foreachBatch`
    * body targets a MERGE-capable table (the seam is this function).
    * Returns the query (already awaited). */
  def run(spark: SparkSession, changelogDir: String, stateDir: String,
          checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream.schema(changelogSchema).json(changelogDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val current =
          if (new java.io.File(stateDir).exists())
            s.read.schema(StructType(Seq(
              StructField("key", StringType), StructField("doc", StringType))))
              .parquet(stateDir)
          else s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("key", StringType), StructField("doc", StringType))))
        val next = applyBatch(current, batch).cache()
        next.count() // materialize before overwriting the input path
        next.write.mode("overwrite").parquet(stateDir + ".tmp")
        next.unpersist()
        // atomic-ish swap: the tmp dir becomes the state dir
        val tmp = new java.io.File(stateDir + ".tmp")
        val dst = new java.io.File(stateDir)
        if (dst.exists()) {
          val old = new java.io.File(stateDir + ".old")
          deleteRec(old); dst.renameTo(old)
        }
        tmp.renameTo(dst)
        deleteRec(new java.io.File(stateDir + ".old"))
        ()
      }
      .start()
    q.awaitTermination()
    q
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    if (f.exists()) { f.delete(); () }
  }

  /** ST5 — dead-letter split: rows that fail validation go to a side table
    * instead of poisoning the stream (the reference retries invisibly;
    * here the DLQ is explicit and queryable). */
  def withDlq(batch: DataFrame, isValid: org.apache.spark.sql.Column): (DataFrame, DataFrame) =
    (batch.where(isValid), batch.where(!isValid))
}
