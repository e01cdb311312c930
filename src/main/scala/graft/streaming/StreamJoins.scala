package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterpart of [[graft.operators.TemporalJoins.rangeCount]]:
  * a watermarked stream-stream interval join. Both sides carry event-time
  * watermarks and the join condition is an equality plus a bounded time
  * range, which is exactly the shape Structured Streaming's state manager
  * needs to PRUNE join state: a buffered right row is dropped as soon as
  * the left watermark passes the latest left timestamp it could ever match
  * (and vice versa), so state stays proportional to the window span times
  * the arrival rate — not to the stream's history. An unbounded condition
  * would grow state forever; this operator makes the bound structural. */
object StreamJoins {

  /** Inner-join right rows whose `rt` falls in `[lt + lowerSec, lt +
    * upperSec)` for the same `key`, both sides watermarked by
    * `watermarkDelay`. Matches the batch [[graft.operators.TemporalJoins
    * .rangeCount]] bounds (inclusive lower, exclusive upper). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   lt: String, rt: String, lowerSec: Long, upperSec: Long,
                   watermarkDelay: String = "10 minutes"): DataFrame = {
    require(upperSec > lowerSec, "empty interval")
    val l = left.withWatermark(lt, watermarkDelay).alias("l")
    val r = right.withWatermark(rt, watermarkDelay).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key " +
        s"AND r.$rt >= l.$lt + INTERVAL $lowerSec SECONDS " +
        s"AND r.$rt < l.$lt + INTERVAL $upperSec SECONDS"))
  }
}
