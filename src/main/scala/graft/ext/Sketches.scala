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
               depth: Int = 4, width: Int = 256): DataFrame =
    cmsTableWeighted(items.select(itemCol.as("__item"), lit(1L).as("__w")),
      col("__item"), col("__w"), depth, width)

  /** Weighted build — for pre-aggregated `(item, count)` relations (e.g.
    * a memoized term-count table): counter = Σ weight, identical to
    * sketching each occurrence but without re-scanning the corpus. The
    * table carries its `width` so reads are self-describing: estimation
    * derives (depth, width) from the table instead of trusting the
    * caller to repeat the build parameters — a mismatch cannot silently
    * undercount. */
  def cmsTableWeighted(items: DataFrame, itemCol: Column, weightCol: Column,
                       depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"cms($depth x $width)")
    val buckets = array((0 until depth).map(d =>
      graft.functions.TextFunctions.seededHash(itemCol, CmsSeed + d) % width): _*)
    items.select(posexplode(buckets).as(Seq("d", "bucket")), weightCol.as("__w"))
      .groupBy("d", "bucket").agg(sum(col("__w")).as("counter"))
      .withColumn("width", lit(width))
  }

  /** Point-estimate probe frequencies from a stored sketch table:
    * `est = min_d counter[d][h_d(term)]` — the classic one-sided bound
    * (est ≥ true count, exact absent collisions). (depth, width) are
    * READ FROM THE TABLE (bounded metadata: ≤ depth distinct rows), so
    * a probe can never hash with parameters the sketch wasn't built
    * with; a table mixing widths (a mis-merged pair of sketches) fails
    * loudly. Probes explode to (term, d, bucket) and join the
    * depth·width-bounded sketch; an absent bucket row means zero. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, probeCol: Column): DataFrame = {
    val params = cms.select(col("d"), col("width")).distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    require(params.nonEmpty, "cmsEstimate: empty sketch table")
    require(params.map(_._2).distinct.length == 1,
      s"cmsEstimate: sketch table mixes widths ${params.map(_._2).distinct.mkString(",")}")
    val pb = probes.select(probeCol.as("term"),
      explode(array(params.map { case (d, w) =>
        struct(lit(d).as("d"),
          (graft.functions.TextFunctions.seededHash(probeCol, CmsSeed + d) % w).as("bucket"))
      }: _*)).as("p"))
      .select(col("term"), col("p.d").as("d"), col("p.bucket").as("bucket"))
    pb.join(cms.drop("width"), Seq("d", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("counter"), lit(0L))).as("est"))
  }
}
