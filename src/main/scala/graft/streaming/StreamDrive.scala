package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The one JSON-stream → transform → parquet-append drive loop the
  * stateful pipelines share ([[StatefulKv.run]], [[StreamResample.run]]).
  * One definition of the trigger/checkpoint/commit shape means a change
  * to it (or a test forcing multi-batch consumption via
  * `maxFilesPerTrigger`) lands everywhere at once instead of drifting
  * across copy-pasted drivers. */
private[streaming] object StreamDrive {
  def jsonToParquet(spark: SparkSession, schema: StructType, inDir: String,
                    outDir: String, checkpointDir: String,
                    maxFilesPerTrigger: Option[Int] = None)
                   (transform: DataFrame => DataFrame): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val withTrigger = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    val q = transform(withTrigger.json(inDir))
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
