package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time exact dedup — the streaming face of
  * [[graft.ext.Dedup.exact]]: suppress re-deliveries and content
  * duplicates AS THEY ARRIVE, with state that expires instead of growing
  * with stream history. Keyed on the 16-byte content hash and bounded by
  * `dropDuplicatesWithinWatermark`: the state store holds one entry per
  * distinct hash until the event-time watermark passes its horizon, so an
  * at-least-once changelog replay inside the horizon is suppressed while
  * total state stays ∝ (arrival rate × watermark delay) — the only
  * feasible contract at an unbounded 100 TB/day ingest (an exact forever
  * dedup is the batch job's business; see
  * [[graft.ext.Curation.decontaminate]] siblings for corpus-wide passes).
  */
object StreamDedup {

  def exactWithinWatermark(docs: DataFrame, tsCol: String,
                           textCol: String = "text",
                           delay: String = "10 minutes"): DataFrame =
    docs.withColumn("__h", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
}
