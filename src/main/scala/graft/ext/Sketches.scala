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

  /** Seed base for the Count-Min hash rows — `seededHash(item, CmsSeed+d)`
    * is row d's hash function; md5-derived, so the DuckDB oracle computes
    * identical buckets. */
  val CmsSeed: Int = 9000

  /** Count-Min sketch as a TABLE: `(d, bucket, counter)` with depth·width
    * bounded rows — the frequency analogue of the HLL table above. One
    * corpus pass (posexplode of the d bucket assignments per item, then a
    * map-side-combinable count); MERGEABLE by construction: the sketch of
    * a union is the bucket-wise SUM of the shards' sketches, so each
    * ingest batch sketches only itself and stored sketches add up —
    * SketchesSpec pins the merge law. Unlike the HLL binaries this is
    * plain integer arithmetic end-to-end, so `x_sketch_cms` gets a full
    * DuckDB oracle, not just a spec. */
  def cmsTable(items: DataFrame, itemCol: Column,
               depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"cms($depth x $width)")
    val buckets = array((0 until depth).map(d =>
      graft.functions.TextFunctions.seededHash(itemCol, CmsSeed + d) % width): _*)
    items.select(posexplode(buckets).as(Seq("d", "bucket")))
      .groupBy("d", "bucket").agg(count(lit(1)).as("counter"))
  }

  /** Point-estimate probe frequencies from a stored sketch table:
    * `est = min_d counter[d][h_d(term)]` — the classic one-sided bound
    * (est ≥ true count, exact absent collisions). Probes explode to
    * (term, d, bucket) and join the depth·width-bounded sketch; an absent
    * bucket row means zero. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, probeCol: Column,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    val pb = probes.select(probeCol.as("term"),
      posexplode(array((0 until depth).map(d =>
        graft.functions.TextFunctions.seededHash(probeCol, CmsSeed + d) % width): _*))
        .as(Seq("d", "bucket")))
    pb.join(cms, Seq("d", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("counter"), lit(0L))).as("est"))
  }
}
