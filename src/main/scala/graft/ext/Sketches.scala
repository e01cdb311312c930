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

  /** KMV (k-minimum-values / bottom-k, the theta-sketch core — Bar-Yossef
    * et al. 2002): per group, the k SMALLEST distinct item-hash values.
    * Where HLL answers only distinct-count, a KMV sketch is a uniform
    * sample of the hash space that supports SET ALGEBRA — union is
    * "merge + re-take bottom-k" and intersection/Jaccard fall out of the
    * union sample ([[kmvPairJaccard]]) — which HLL binaries cannot do.
    * Plain integer rows, so unlike the HLL path the whole family gets a
    * full DuckDB oracle.
    *
    * Two-phase bottom-k, same contract as stratified sampling / the ANN
    * search path: rank within (group, physical partition) first — a
    * group's items never funnel through one window task — then the final
    * per-group rank sees ≤ partitions·k survivors. Input arrives
    * pre-hashed (`hashCol`) so callers reuse stored hash artifacts (the
    * dedup family's shingle table) instead of re-hashing the corpus. */
  def kmvTable(items: DataFrame, hashCol: Column, groupCol: String,
               k: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"kmv(k=$k)")
    val dist = items.select(col(groupCol), hashCol.as("h")).distinct()
    val local = Window.partitionBy(col(groupCol), col("__pid")).orderBy(col("h"))
    val global = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    dist.withColumn("__pid", spark_partition_id())
      .withColumn("__lrk", row_number().over(local)).where(col("__lrk") <= k)
      .withColumn("rk", row_number().over(global).cast("long")).where(col("rk") <= k)
      .drop("__pid", "__lrk")
  }

  /** Distinct-count estimate from a KMV sketch: with the k-th smallest of
    * n uniform draws on [0, space) at h_k, n ≈ (k−1)·space / h_k (the
    * unbiased bottom-k estimator). A group with fewer than k distinct
    * values IS its own sketch — the estimate is exact. All-integer
    * arithmetic (`DIV`), so both engines floor identically. */
  def kmvEstimate(kmv: DataFrame, groupCol: String, k: Int = 128,
                  space: Long = graft.functions.TextFunctions.MinhashP): DataFrame =
    kmv.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_topk"), max(col("h")).as("kth_h"))
      .withColumn("est_distinct",
        when(col("n_topk") < k, col("n_topk"))
          .otherwise(expr(s"${(k - 1).toLong * space} DIV kth_h")))

  /** Merge stored sketches (the law SketchesSpec pins:
    * kmv(A ∪ B) == merge(kmv(A), kmv(B)) — bottom-k of bottom-ks is
    * bottom-k of the union, because anything in the union's true bottom-k
    * is in its own side's bottom-k). Re-keys each input to one group. */
  def kmvMerge(sketches: Seq[DataFrame], asGroup: Long, groupCol: String,
               k: Int = 128): DataFrame = {
    val u = sketches.map(_.select(lit(asGroup).as(groupCol), col("h")))
      .reduce(_.unionByName(_))
    kmvTable(u, col("h"), groupCol, k)
  }

  /** The ordered group-pair frame `(g_a < g_b)`, built DRIVER-SIDE from
    * the collected distinct group list — bounded metadata (one value per
    * stored sketch group: shards, days, partitions — never data), same
    * contract as the ANN centroid collects. A relational `g_a < g_b`
    * self-join would plan as BroadcastNestedLoop (banned by
    * PlanAuditSpec); groups² literal rows cost nothing. Group ids are
    * integral (shard ids) so the ordering matches the oracle's numeric
    * `<`. */
  private def groupPairs(src: DataFrame, groupCol: String): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    val groups = src.select(col(groupCol).cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    (for { a <- groups; b <- groups if a < b } yield (a, b))
      .toSeq.toDF("g_a", "g_b")
  }

  /** Pairwise Jaccard estimate between every two groups' sketches: take
    * the bottom-k of the PAIR UNION's hash sample (a uniform sample of
    * A ∪ B — computable from the two sketches alone) and count how many
    * members lie in both sketches: J ≈ common / k. Everything here reads
    * ONLY the sketch table — groups·k rows of bounded metadata — never
    * the corpus; that is the point of storing sketches per shard. The
    * group-pair frame is groups² rows (groups is small: shards,
    * partitions, days), and both joins against it broadcast. Output:
    * (g_a, g_b, n_topk, est_common, est_jaccard_ppm) with the ppm as
    * exact integer floor — no cross-engine float. */
  def kmvPairJaccard(kmv: DataFrame, groupCol: String, k: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = groupPairs(kmv, groupCol)
    val m = kmv.select(col(groupCol).as("__g"), col("h"))
    // membership-flagged union of the two sketches per pair (two equi-join
    // legs instead of one OR-join — keeps the plan hash/broadcast, not BNL)
    val left = broadcast(pairs).join(m, col("g_a") === col("__g"))
      .select(col("g_a"), col("g_b"), col("h"), lit(1L).as("in_a"), lit(0L).as("in_b"))
    val right = broadcast(pairs).join(m, col("g_b") === col("__g"))
      .select(col("g_a"), col("g_b"), col("h"), lit(0L).as("in_a"), lit(1L).as("in_b"))
    val uni = left.unionByName(right)
      .groupBy("g_a", "g_b", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("g_a"), col("g_b")).orderBy(col("h"))
    uni.withColumn("__rk", row_number().over(w)).where(col("__rk") <= k)
      .groupBy("g_a", "g_b")
      .agg(count(lit(1)).as("n_topk"),
        sum(col("in_a") * col("in_b")).as("est_common"),
        // the rest of the set algebra from the same union sample:
        // members in exactly one sketch estimate the differences A∖B / B∖A
        sum(col("in_a") * (lit(1L) - col("in_b"))).as("est_only_a"),
        sum(col("in_b") * (lit(1L) - col("in_a"))).as("est_only_b"))
      .withColumn("est_jaccard_ppm", expr("(1000000 * est_common) DIV n_topk"))
      .withColumn("est_only_a_ppm", expr("(1000000 * est_only_a) DIV n_topk"))
      .withColumn("est_only_b_ppm", expr("(1000000 * est_only_b) DIV n_topk"))
  }

  /** Contract bound for [[pairJaccardExact]]: the h-keyed self-join
    * yields up to groups²-per-hash pair rows, so the exact side is only
    * sane while the group cardinality stays demo-sized. The guard below
    * fails the JOB by name when a caller exceeds it (the
    * [[graft.ext.Windows.resampleFfill]] span-clamp idiom) instead of
    * silently planning a quadratic blow-up against a corpus-scale
    * relation. */
  val MaxExactJaccardGroups: Long = 4096L

  /** Exact pairwise set statistics `(g_a, g_b, n_inter, n_a, n_b,
    * n_union)` over the full distinct (group, h) relation — the shared
    * verification side that makes the sketch estimates oracle-visible
    * (mirrors how x_sketch_hll/x_sketch_cms pin estimates next to exact
    * counts); [[pairJaccardExact]] and [[pairContainmentExact]] are its
    * projections. This side scans data and exists for the demo/oracle; a
    * 100 TB deployment keeps only the sketches. Callers are held to
    * [[MaxExactJaccardGroups]] groups — outside that the O(groups² per
    * hash) shape fails loudly rather than running.
    *
    * Shape: intersections come from ONE h-keyed self-join (a hash in c
    * groups yields c·(c−1)/2 pair rows — bounded by groups² per hash, and
    * groups is small), unions by inclusion-exclusion against the
    * group-cardinality-sized `sizes` relation. This replaces the naive
    * per-pair replication form (every row × groups−1 copies through a
    * (pair, h) aggregation), which was the whole cost of the first cut. */
  def pairSetStatsExact(dist: DataFrame, groupCol: String,
                        maxGroups: Long = MaxExactJaccardGroups): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = dist.select(col(groupCol).cast("long").as("__g"), col("h")).distinct()
    val rawSizes = m.groupBy("__g").agg(count(lit(1)).as("__n"))
    // group-count clamp: an empty-partition window over the GROUP-
    // CARDINALITY-sized sizes relation (bounded metadata — the accepted
    // single-task pattern of the two-phase top-k finals; a 1-row-join
    // form constant-folds its literal key away and plans the
    // BroadcastNestedLoop shape the audit bans); __n routes THROUGH the
    // assert so Catalyst cannot prune the guard (assert_true is NULL
    // when in bounds, throws otherwise — resampleFfill's span-clamp
    // idiom)
    val guard = assert_true(col("__ng") <= maxGroups,
      concat(lit("pairJaccardExact: "), col("__ng").cast("string"),
        lit(s" groups exceed the exact-side bound of $maxGroups " +
          s"(demo/oracle contract — keep only the sketches at corpus " +
          s"scale)")))
    val sizes = rawSizes
      .withColumn("__ng", count(lit(1)).over(Window.partitionBy()))
      .select(col("__g"), when(guard.isNull, col("__n")).as("__n"))
    val inter = m.select(col("__g").as("g_a"), col("h"))
      .join(m.select(col("__g").as("g_b"), col("h")), Seq("h"))
      .where(col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b").agg(count(lit(1)).as("n_inter"))
    groupPairs(dist, groupCol) // zero-intersection pairs must still report
      .join(inter, Seq("g_a", "g_b"), "left")
      .join(sizes.select(col("__g").as("g_a"), col("__n").as("__na")), Seq("g_a"))
      .join(sizes.select(col("__g").as("g_b"), col("__n").as("__nb")), Seq("g_b"))
      .select(col("g_a"), col("g_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        (col("__na") + col("__nb") - coalesce(col("n_inter"), lit(0L))).as("n_union"))
  }

  /** Exact pairwise Jaccard — [[pairSetStatsExact]] reduced to the
    * (n_inter, n_union, ppm) columns x_sketch_kmv_jaccard pins. */
  def pairJaccardExact(dist: DataFrame, groupCol: String,
                       maxGroups: Long = MaxExactJaccardGroups): DataFrame =
    pairSetStatsExact(dist, groupCol, maxGroups)
      .select(col("g_a"), col("g_b"), col("n_inter"), col("n_union"))
      .withColumn("exact_jaccard_ppm", expr("(1000000 * n_inter) DIV n_union"))

  /** Containment asymmetry from the SAME union sample as
    * [[kmvPairJaccard]]: C(A in B) = |A∩B| / |A|, estimated as
    * `est_common / (est_common + est_only_a)` over the union's bottom-k
    * (the sample's A-members partition into {both, only-A}). Jaccard is
    * symmetric and misses subset relations — a small shard fully
    * contained in a big one scores near-zero Jaccard but 100%
    * containment, which is what quote/partial-scrape duplication looks
    * like. NULL when the sample holds no A member at all (no evidence
    * either way — the caller keeps, a 0 would claim disjointness). Same
    * shards²·k bounded cost as the Jaccard estimate; sketches only. */
  def kmvPairContainment(kmv: DataFrame, groupCol: String, k: Int): DataFrame =
    kmvPairJaccard(kmv, groupCol, k)
      .withColumn("est_contain_a_ppm",
        expr("(1000000 * est_common) DIV nullif(est_common + est_only_a, 0)"))
      .withColumn("est_contain_b_ppm",
        expr("(1000000 * est_common) DIV nullif(est_common + est_only_b, 0)"))
      .select("g_a", "g_b", "n_topk", "est_common", "est_only_a",
        "est_only_b", "est_contain_a_ppm", "est_contain_b_ppm")

  /** Exact pairwise containment (both directions) — the verification
    * side for [[kmvPairContainment]], same contract/bound as
    * [[pairJaccardExact]]. Group sizes are ≥ 1 by construction, so the
    * exact ratios never divide by zero. */
  def pairContainmentExact(dist: DataFrame, groupCol: String,
                           maxGroups: Long = MaxExactJaccardGroups): DataFrame =
    pairSetStatsExact(dist, groupCol, maxGroups)
      .select(col("g_a"), col("g_b"), col("n_inter"), col("n_a"), col("n_b"))
      .withColumn("exact_contain_a_ppm", expr("(1000000 * n_inter) DIV n_a"))
      .withColumn("exact_contain_b_ppm", expr("(1000000 * n_inter) DIV n_b"))

  /** Equi-width histogram as a TABLE `(bin, cnt)` — the quantile
    * analogue of [[cmsTable]], completing the mergeable-sketch quartet
    * (distinct: HLL/KMV, frequency: CMS, quantile: here). One
    * map-side-combinable pass; MERGEABLE by construction (the histogram
    * of a union is the bin-wise SUM), so per-shard histograms stored at
    * ingest answer corpus quantiles without rescans. All-integer like
    * CMS — full DuckDB oracle, unlike the binary `approx_percentile`
    * sketches. Bin width is fixed up front ([[graft.ext.Layout.quantize]]
    * does the cell arithmetic both engines share); resolution is the
    * declared trade. */
  def histogramTable(df: DataFrame, valueCol: Column, lo: Double, hi: Double,
                     bits: Int = 6): DataFrame =
    df.select(Layout.quantize(valueCol, lo, hi, bits).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a stored histogram: for each q = num/den,
    * the smallest bin whose cumulative count reaches ceil(q · total) —
    * `percentile_disc` at bin resolution. The histogram is bounded
    * metadata (≤ 2^bits rows), so the cumulative window is driver-scale
    * work; the threshold test cross-multiplies (`cum·den ≥ total·num` ⟺
    * `cum ≥ ceil(q·total)`) so everything stays integer — no
    * cross-engine float. */
  def histogramQuantiles(hist: DataFrame, qs: Seq[(Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the explicit constant partition key states the intent (ONE ≤2^bits
    // row group by construction) and keeps WindowExec's single-partition
    // warning out of every run's log — real warnings must stand out
    val one = Window.partitionBy(lit(0))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(one.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum(col("cnt")).over(
        one.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    qs.map { case (num, den) =>
      cum.where(col("cum") * den >= col("total") * num)
        .orderBy(col("bin")).limit(1)
        .select(lit(num * 1000 / den).as("q_permille"), col("bin").as("q_bin"),
          col("total").as("n_total"))
    }.reduce(_.unionByName(_))
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

  /** Equi-join SIZE estimate from two CMS tables over the join key: per
    * depth row, the bucket-wise inner product Σ_b cmsA[d][b]·cmsB[d][b]
    * overestimates |A ⋈ B| (colliding keys only ADD cross terms), so the
    * min over rows is a one-sided upper bound that sharpens with depth —
    * the AMS/Count-Min inner-product estimator (Alon-Matias-Szegedy's F2
    * when A = B). This is the cardinality gauge an optimizer consults
    * before committing 100 TB to a shuffle: both sketches are
    * depth·width-bounded MERGEABLE tables built at ingest, so the
    * estimate costs a depth·width-sized join — the data is never
    * touched. Returns one row `(est_rows)`; integer end-to-end, so the
    * oracle re-derives it exactly. */
  def cmsJoinSize(cmsA: DataFrame, cmsB: DataFrame): DataFrame = {
    val widths = (cmsA.select("width").distinct().collect() ++
      cmsB.select("width").distinct().collect()).map(_.getInt(0)).distinct
    require(widths.length == 1,
      s"cmsJoinSize: sketches built with different widths ${widths.mkString(",")}")
    cmsA.select(col("d"), col("bucket"), col("counter").as("__ca"))
      .join(cmsB.select(col("d"), col("bucket"), col("counter").as("__cb")),
        Seq("d", "bucket"))
      .groupBy(col("d")).agg(sum(col("__ca") * col("__cb")).as("__dot"))
      .agg(min(col("__dot")).as("est_rows"))
  }

  /** Shard-hash seed for [[mgSummary]]. */
  val MgSeed = 41

  /** Misra-Gries heavy-hitters summary table — the deterministic
    * UNDER-estimating frequency sketch (CMS above one-sidedly
    * OVER-estimates; together they bracket). Mergeable-summaries form
    * (Agarwal et al., PODS'12): the input multiset is sharded by
    * `shardCol % nShards`, each shard's exact histogram — itself a
    * zero-error MG summary — is compressed to ≤ k counters by
    * subtracting its (k+1)-th largest count `d_s` and dropping
    * non-positives, and the global estimate is the counter-wise SUM of
    * shard summaries. Every term then satisfies
    * `est(t) ≤ exact(t) ≤ est(t) + Σ_s d_s` (each shard's counter
    * undercounts its slice by at most d_s; absent terms had shard counts
    * ≤ d_s by the rank cut). Returns `(summary, shardErr)`:
    * `summary (sh, item, counter)` with ≤ nShards·k rows — the stored,
    * mergeable artifact — and `shardErr (sh, d)` whose sum is the bound.
    *
    * The rank-(k+1) cut is TWO-PHASE (the ANN top-k pattern): a partial
    * top-(k+1) inside each (shard, scan-partition) slice first, so the
    * final per-shard rank sorts ≤ partitions·(k+1) survivors — never a
    * vocabulary-sized single-shard sort, which is what makes the
    * summary computable when the distinct-item count is billions while
    * nShards stays small. */
  def mgSummary(items: DataFrame, itemCol: Column, weightCol: Column,
                shardCol: Column, k: Int = 8,
                nShards: Int = 8): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && nShards >= 1, s"mg($k x $nShards)")
    val pc = items
      .select((shardCol % nShards).as("sh"), itemCol.as("item"),
        weightCol.as("__w"))
      .groupBy("sh", "item").agg(sum("__w").as("cnt"))
    // phase 1: top-(k+1) within each (shard, physical partition) — local
    // prune; phase 2 ranks the bounded survivor set per shard
    val partial = pc.withColumn("__pid", spark_partition_id())
      .withColumn("__prk", row_number().over(
        Window.partitionBy("sh", "__pid")
          .orderBy(col("cnt").desc, col("item"))))
      .where(col("__prk") <= k + 1).drop("__pid", "__prk")
    val rk = partial.withColumn("__rk", row_number().over(
      Window.partitionBy("sh").orderBy(col("cnt").desc, col("item"))))
    // d_s = the (k+1)-th largest per-shard count (with multiplicity —
    // the VALUE at row_number rank k+1 is tiebreak-independent); 0 when
    // the shard holds ≤ k distinct items (summary exact)
    val ds = rk.groupBy("sh")
      .agg(coalesce(max(when(col("__rk") === k + 1, col("cnt"))), lit(0L))
        .as("d"))
    val summary = rk.join(ds, Seq("sh"))
      .where(col("__rk") <= k && col("cnt") - col("d") > 0)
      .select(col("sh"), col("item"), (col("cnt") - col("d")).as("counter"))
    (summary, ds)
  }

  /** The PODS'12 MERGE of MG summaries into one k-counter summary:
    * counter-wise sum per item, then the same rank-(k+1) compression —
    * which is exactly [[mgSummary]] on the summed counters with a single
    * shard. Error ADDS: the merged summary undercounts any item by at
    * most (Σ input shards' d) + the merge's own cut d, so a summary tree
    * of any shape keeps a computable bound — the property that makes MG
    * a STORED, incrementally-maintained artifact at 100 TB (each ingest
    * batch summarizes itself; merges touch only summaries). Returns
    * `((item, counter) ≤ k rows, the merge's d)`. */
  def mgMerge(summaries: DataFrame, k: Int): (DataFrame, Long) = {
    val (m, ds) = mgSummary(summaries, col("item"), col("counter"),
      lit(0L), k, 1)
    val dRow = ds.collect() // ≤ 1 row: bounded driver metadata
    (m.select("item", "counter"),
      if (dRow.isEmpty) 0L else dRow.head.getLong(1))
  }
}
