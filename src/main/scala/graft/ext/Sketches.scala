package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch tables (north-star extension): distinct-count and
  * quantile summaries that a 100 TB corpus maintains INCREMENTALLY — each
  * ingest batch sketches only its own shard, and corpus-wide answers come
  * from unioning stored sketch binaries, never from rescanning data.
  * Built on Spark's DataSketches-backed `hll_sketch_agg` family (binary,
  * mergeable, fixed-size state) rather than exact aggregations whose state
  * grows with cardinality. Exactness is traded for mergeability; the
  * sketch answers are spec-tested against exact counts (no DuckDB oracle —
  * sketch binaries are implementation-defined). */
object Sketches {

  /** One HLL sketch (+ row count) per group: the persistable summary
    * table. Map-side combinable; state per group is the fixed sketch size
    * (lgK=12 ≈ 4 KB), independent of the group's cardinality. */
  def hllByGroup(df: DataFrame, valueCol: Column, groupCol: String,
                 lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Union stored sketches (any subset of groups, any number of increments)
    * into one distinct-count estimate — reads only the sketch table. */
  def unionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true)))
        .as("approx_distinct"),
      sum(col("n_rows")).as("n_rows"))
}
