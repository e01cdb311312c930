package graft.ext

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star extension).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — the exactness baseline: broadcast the (small)
  *    query set against the corpus, cosine per pair, per-query top-k via
  *    window. One corpus scan, no corpus shuffle: this is the right plan
  *    even at 100 TB when the query set is small (queries broadcast;
  *    ranking is a per-partition top-k then a tiny final merge).
  *  - [[lshTopK]] — the scale path for large query sets: bucket both sides
  *    with deterministic random-hyperplane LSH (multi-probe by flipping one
  *    bit) and run the exact cosine only within co-bucketed pairs: the
  *    shuffle is on bucket keys, pair space shrinks ~2^planes-fold.
  *    Recall is probabilistic; ExtSpec asserts ≥0.5 recall@10 vs brute
  *    force on unclustered (hardest-case) data — clustered real corpora
  *    bucket better.
  */
object Similarity {

  /** Verification hook: the most recent [[learnedCentroids]] result.
    * `graft.Verify` runs every query BEFORE dumping oracle SQL, so the
    * x_knn_ivf oracle can embed these centroids as plain literals — the
    * learning pass is Spark-side (shared by result and oracle), and the
    * assignment + probe + top-k it leaves behind is deterministic SQL.
    * Bounded metadata (kCells·dim floats), never a data collect. */
  @volatile var lastLearned: Seq[(Long, Array[Float])] = Nil

  /** Learned-model memo: (session, canonicalized corpus plan, params) →
    * trained model. Training is deterministic given the corpus (seeded
    * sample, seeded Lloyd's), so a memo hit returns exactly what
    * retraining would — while skipping the sample scan + `iters` driver
    * round trips per call. The values are kilobytes of driver metadata
    * (the [[lastLearned]] contract), not cached data; at 100 TB this is
    * the stored model artifact beside the index. Swept by
    * [[graft.Caches.invalidate]]. */
  private val modelMemo = new graft.ModelMemo[AnyRef]

  private def memoModel[T <: AnyRef](corpus: DataFrame, tag: String)(train: => T): T =
    modelMemo(corpus, tag)(train).asInstanceOf[T]

  /** Persisted-relation memo for the PQ code table — the stored ANN index
    * at scale (dim/m·32× smaller than the raw vectors; the search scan
    * reads only it). Same contract as Dedup's signature tables; swept by
    * [[graft.PlanMemo.invalidateAll]] automatically. */
  private val dfMemo = new graft.PlanMemo

  private def memoDf(corpus: DataFrame, tag: String)(build: => DataFrame): DataFrame =
    dfMemo(corpus, tag)(build)


  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus.join(q, col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol), cosine(col("__qv"), col(vecCol)).as("cos"))
    topKPerQuery(scored, k, idCol)
  }

  /** Hard-negative mining for contrastive training pairs (the standard
    * dense-retrieval recipe — e.g. Karpukhin et al., "Dense Passage
    * Retrieval", EMNLP'20 §4.2: the strongest negatives are the nearest
    * neighbors that do NOT share the query's label): per query, the
    * exact top-k by cosine among corpus vectors whose `labelCol`
    * DIFFERS from the query's. The label predicate rides IN the
    * broadcast join condition — pre-filtering, like [[bruteForceTopK]]'s
    * self-exclusion, so a query surrounded by same-label vectors still
    * fills its k from the nearest other-label ones rather than starving.
    * Same scan/top-k shape as the brute-force baseline: one corpus pass,
    * the two-phase skew-free top-k; at scale the same label-inequality
    * predicate composes after an IVF probe instead (filter before the
    * top-k, exactly the [[ivfTopK]] pattern with x_knn_filtered's
    * pre-filter contract). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                    vecCol: String = "embedding", idCol: String = "vec_id",
                    labelCol: String = "label"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), col(labelCol).as("__ql")))
    val scored = corpus.join(q,
        col("query_id") =!= col(idCol) && col("__ql") =!= col(labelCol))
      .select(col("query_id"), col(idCol), cosine(col("__qv"), col(vecCol)).as("cos"))
    topKPerQuery(scored, k, idCol)
  }

  /** Per-query top-k WITHOUT a q-way skewed window: ranking n·q scored
    * rows by `Window.partitionBy(query_id)` alone would shuffle everything
    * onto q tasks (with a handful of queries, a handful of tasks own the
    * whole corpus). Phase 1 takes the top-k within (query, source
    * partition) — parallelism #partitions × q, and only narrow
    * (query_id, id, cos) rows cross the wire; phase 2 ranks the q·P·k
    * survivors. The total order (cos DESC, id) makes the result identical
    * to the single-window form. */
  private def topKPerQuery(scored: DataFrame, k: Int, idCol: String): DataFrame = {
    val wp = Window.partitionBy(col("query_id"), col("__p"))
      .orderBy(col("cos").desc, col(idCol))
    // NULL cosine = no defined angle (NULL/zero-norm/mismatched-dim corpus
    // vector): such rows are not neighbors — without the filter they'd
    // pad out the tail ranks with cos_sim NULL whenever a query has fewer
    // than k valid neighbors (and the ANN paths, which filter degenerate
    // rows before bucketing, would disagree with this exact baseline)
    val survivors = scored.where(col("cos").isNotNull)
      .withColumn("__p", spark_partition_id())
      .withColumn("__r", row_number().over(wp))
      .where(col("__r") <= k).drop("__r", "__p")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col(idCol))
    survivors.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col(idCol).as("neighbor_id"), graft.functions.DetRound.round6(col("cos")).as("cos_sim"))
  }

  /** IVF-style ANN over PRECOMPUTED cells (`cellCol`): centroids are the
    * per-cell mean vectors (one posexplode + groupBy — deterministic, no
    * RNG), each query probes only its `nprobe` nearest. Use
    * [[ivfTopKLearned]] when no cell assignment exists — it learns one
    * with deterministic Lloyd's k-means. Pair-space shrinks
    * cells/nprobe-fold; recall depends on how well cells capture the
    * metric structure. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              vecCol: String = "embedding", idCol: String = "vec_id",
              cellCol: String = "label", nprobe: Int = 2): DataFrame = {
    val withCell = corpus.withColumnRenamed(cellCol, "cell")
    // per-cell means are kCells·dim floats — bounded metadata, the same
    // driver-side contract as learnedCentroids
    val cents = cellMeans(withCell, vecCol).collect()
      .map(r => (r.getAs[Number]("cell").longValue(),
        r.getSeq[Float](r.fieldIndex("centroid")).toArray))
      .toSeq.sortBy(_._1)
    ivfSearch(withCell, cents, queries, k, vecCol, idCol, nprobe)
  }

  /** IVF with LEARNED cells: deterministic Lloyd's k-means (seeded by the
    * `kCells` lowest-id vectors — no RNG), then the same probe machinery
    * as [[ivfTopK]]. The scale path when the corpus carries no usable
    * partitioning column. */
  def ivfTopKLearned(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     vecCol: String = "embedding", idCol: String = "vec_id",
                     kCells: Int = 8, iters: Int = 2, nprobe: Int = 2): DataFrame = {
    val cents = learnedCentroids(corpus, kCells, iters, vecCol, idCol)
    ivfSearch(assignCells(corpus, cents, vecCol), cents,
      queries, k, vecCol, idCol, nprobe)
  }

  /** The delta query's base-trained centroids — a SEPARATE stash from
    * [[lastLearned]] so the full-corpus x_knn_ivf oracle can never be
    * clobbered by the delta run, whatever the execution order. */
  @volatile var lastLearnedDelta: Seq[(Long, Array[Float])] = Nil

  /** x_cluster_profile's centroid stash (same contract as [[lastLearned]];
    * separate so the profile query can never clobber the IVF oracle). */
  @volatile var lastLearnedProfile: Seq[(Long, Array[Float])] = Nil

  /** x_kmeans_step's centroid stash (separate for the same reason). */
  @volatile var lastLearnedStep: Seq[(Long, Array[Float])] = Nil

  /** Incremental IVF maintenance: new embeddings join a LIVE index
    * without retraining it. The model (centroids learned on the base
    * corpus) is FROZEN; indexing the delta batch is [[assignCells]] —
    * a map-only projection against the centroid literals, O(batch) with
    * zero exchanges and zero base reads — and search runs over the
    * stored base assignment ∪ the delta assignment. This is how a
    * 100 TB vector index absorbs a continuous embedding feed: the
    * once-per-corpus-version training and base assignment are stored
    * tables (the [[graft.ArtifactStore]] contract), each arriving batch
    * pays only its own assignment, and cell-balance drift is repaired by
    * an OFFLINE periodic retrain — the same base+delta+compaction shape
    * as the LSM store and the inverted-index delta. Frozen-model law
    * (spec-pinned): the delta's arrival changes no centroid, so
    * assignment of any vector is identical before and after the merge —
    * which is also what lets the oracle replay base and delta through
    * one shared assignment formula. */
  def ivfDeltaTopK(base: DataFrame, delta: DataFrame, queries: DataFrame,
                   k: Int = 10, vecCol: String = "embedding",
                   idCol: String = "vec_id", kCells: Int = 8, iters: Int = 2,
                   nprobe: Int = 2): DataFrame = {
    val cents = learnedCentroids(base, kCells, iters, vecCol, idCol, stash = false)
    lastLearnedDelta = cents
    ivfSearch(
      assignCells(base, cents, vecCol)
        .unionByName(assignCells(delta, cents, vecCol)),
      cents, queries, k, vecCol, idCol, nprobe)
  }

  /** x_knn_ivf_delete's centroid stash (the [[lastLearned]] contract;
    * separate so the delete query can never clobber the other IVF
    * oracles, whatever the execution order). */
  @volatile var lastLearnedTomb: Seq[(Long, Array[Float])] = Nil

  /** The DELETE side of incremental IVF maintenance — [[ivfDeltaTopK]]'s
    * missing direction (a training-data pipeline that DROPS documents
    * after a dedup pass should not re-train its vector index): removed
    * ids arrive as TOMBSTONES, applied at READ time. The model stays
    * frozen and the stored base assignment is NEVER rewritten; search
    * merges base ∪ delta and anti-joins the probed candidates against
    * the tombstone set — the anti-join input is the cells/nprobe-bounded
    * candidate relation, so a delete batch costs O(|tombstones|) to
    * store and O(|candidates|) per search, zero index I/O. This is
    * exactly the LSM/base+delta+compaction contract the rest of the
    * engine's index family uses (delete markers in the LSM store, the
    * inverted-index delta): an OFFLINE periodic compaction folds
    * tombstones into a rewritten assignment and re-trains when drift
    * warrants — the same cadence that already repairs cell balance.
    * Tombstoned ids may still appear as QUERIES (an external probe
    * vector is not an index row); they are only excluded as NEIGHBORS. */
  def ivfTombstoneTopK(base: DataFrame, delta: DataFrame, deletes: DataFrame,
                       queries: DataFrame, k: Int = 10,
                       vecCol: String = "embedding", idCol: String = "vec_id",
                       kCells: Int = 8, iters: Int = 2,
                       nprobe: Int = 2): DataFrame = {
    val cents = learnedCentroids(base, kCells, iters, vecCol, idCol, stash = false)
    lastLearnedTomb = cents
    ivfSearch(
      assignCells(base, cents, vecCol)
        .unionByName(assignCells(delta, cents, vecCol)),
      cents, queries, k, vecCol, idCol, nprobe, tombstones = Some(deletes))
  }

  /** The rebuild-warranted detector for [[ivfTombstoneTopK]] — third
    * member of the engine's refresh-premise-audit family (the ER
    * capCrossings and `Graph.ssspInvalidations` contract): a cell whose
    * LIVE fraction fell below `liveFloorPpm` is hollowed out — probes
    * routed there scan mostly tombstones and return thin candidate sets
    * (recall sags while cost stays flat), which no read-time merge can
    * repair. Non-empty ⇒ compact + retrain is warranted; empty ⇒ the
    * tombstone merge stays sound. Consult it once per arriving delete
    * batch (the per-version changelog audit, not a per-query cost).
    *
    * Cost: one map-only assignment pass over base ∪ delta (at 100 TB:
    * read the STORED assignment instead — this recomputation is the
    * local stand-in), one tombstone left join on the id key, one
    * per-cell agg — kCells-bounded output `(cell, n_total, n_live,
    * live_ppm)`, exact integer ppm. */
  def ivfTombstoneInvalidations(base: DataFrame, delta: DataFrame,
                                deletes: DataFrame,
                                cents: Seq[(Long, Array[Float])],
                                vecCol: String = "embedding",
                                idCol: String = "vec_id",
                                liveFloorPpm: Long = 500000L): DataFrame = {
    val assigned = assignCells(base, cents, vecCol)
      .unionByName(assignCells(delta, cents, vecCol))
    assigned
      .join(deletes.select(col(idCol), lit(1L).as("__tomb")), Seq(idCol), "left")
      .groupBy("cell").agg(count(lit(1)).as("n_total"),
        sum(when(col("__tomb").isNull, 1L).otherwise(0L)).as("n_live"))
      .withColumn("live_ppm", expr("n_live * 1000000 DIV n_total"))
      .where(col("live_ppm") < liveFloorPpm)
  }

  /** Deterministic bounded training sample: the `n` rows with the
    * smallest `xxhash64(id)` (ties to the lowest id). k-means/PQ model
    * quality saturates far below corpus size (FAISS trains on ~100–256
    * points per centroid), so training reads a TakeOrdered sample — ONE
    * corpus scan to select, then every Lloyd pass runs over ≤ n rows —
    * instead of re-scanning 100 TB per iteration to learn kilobytes of
    * metadata. xxhash64 is seed-fixed (no RNG): the same corpus always
    * yields the same sample, and a corpus with ≤ n rows yields the WHOLE
    * corpus (PqSpec pins this), so small-fixture results are unchanged. */
  private[graft] def trainSample(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.orderBy(xxhash64(col(idCol)), col(idCol)).limit(n)

  /** Training-sample size: ~`perCentroid` points per centroid, floored at
    * 100k so small k still sees a representative slice. */
  private def sampleN(k: Int, perCentroid: Int = 100): Int =
    math.max(perCentroid * k, 100000)

  /** Seeded Lloyd's iteration over a BOUNDED training sample: seeds = the
    * `kCells` lowest-id sample vectors (`TakeOrdered`, no global sort) —
    * no RNG anywhere, so reruns in the single-process harness are
    * bit-identical (ExtSpec pins this). On a multi-executor cluster the
    * per-cell means still merge partial double sums in shuffle-fetch
    * order, so centroids are deterministic only up to FP low-order bits —
    * boundary vectors could flip cells between runs; seed choice and
    * everything else stays fixed. Each pass assigns every sample vector
    * to its nearest centroid with the map-only literal arg-max of
    * [[assignCells]] and recomputes per-cell means (partial aggregation
    * collapses to ~kCells·dim rows per task before the only exchange).
    * Centroids live on the driver between passes — kCells·dim floats of
    * bounded metadata, NOT a data collect. Cost: ONE corpus scan (sample
    * selection via [[trainSample]], persisted) + `iters` passes over
    * ≤ max(100·kCells, 100k) rows — at 100 TB the corpus is never
    * scanned per-iteration for model training. */
  def learnedCentroids(corpus: DataFrame, kCells: Int, iters: Int = 2,
                       vecCol: String = "embedding", idCol: String = "vec_id",
                       stash: Boolean = true): Seq[(Long, Array[Float])] = {
    val cents = memoModel(corpus, graft.PlanMemo.tag("ivf", kCells, iters, vecCol, idCol)) {
      trainCentroids(corpus, kCells, iters, vecCol, idCol)
    }
    // the stash is per-CALL state (the oracle replays the most recent
    // learn), so a memo hit still re-stashes
    if (stash) lastLearned = cents
    cents
  }

  private def trainCentroids(corpus: DataFrame, kCells: Int, iters: Int,
                             vecCol: String, idCol: String): Seq[(Long, Array[Float])] = {
    val train = trainSample(
      corpus.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
        .select(col(idCol), col(vecCol)),
      idCol, sampleN(kCells)).persist()
    var cents: Seq[(Long, Array[Float])] =
      train.orderBy(col(idCol)).limit(kCells)
        .select(col(idCol).cast("long").as("cell"),
          col(vecCol).cast("array<float>").as("centroid"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    var i = 0
    while (i < iters && cents.nonEmpty) {
      cents = cellMeans(assignCells(train, cents, vecCol), vecCol).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
      i += 1
    }
    train.unpersist(blocking = false)
    cents
  }

  /** Nearest-centroid cell for every corpus vector, as a MAP-ONLY
    * projection: the centroid set is a literal array of structs (bounded
    * driver-side metadata), so the arg-max cosine is one expression per
    * row — no join blow-up, no aggregation, zero corpus shuffle. Ties
    * break to the lowest cell id; zero-norm vectors (NULL cosine) fall to
    * the lowest cell rather than dropping out. */
  def assignCells(corpus: DataFrame, cents: Seq[(Long, Array[Float])],
                  vecCol: String = "embedding"): DataFrame = {
    if (cents.isEmpty) return corpus.withColumn("cell", lit(0L))
    val centLit = array(cents.map { case (c, v) =>
      struct(lit(c).as("cell"), typedlit(v).as("centroid")) }: _*)
    val best = array_max(transform(centLit, c =>
      struct(coalesce(cosine(col(vecCol), c("centroid")), lit(-2d)).as("d"),
        (-c("cell")).as("nc"))))
    corpus.withColumn("cell", -best("nc"))
  }

  /** One EXACT Lloyd update over an assigned corpus: per-(cell, dim)
    * integer mean of the fixed-point components. Each coordinate maps to
    * floor(x·10⁶ + ½) + 10⁶ — the shift keeps every value non-negative
    * for unit-scaled embeddings (x ≥ −1), which is what makes Spark's
    * truncating `DIV` and DuckDB's flooring `//` produce the SAME
    * quotient (they disagree on negatives); the shift is subtracted back
    * after the division. Output is k·dim bounded rows `(cell, dim,
    * n_vecs, mean_fp)` — the next superstep's centroids with their
    * membership counts, small enough to collect and literal-broadcast
    * the way [[assignCells]] consumes them. One (cell, dim)-keyed
    * map-side-combinable agg; callers guarantee x ≥ −1 (filter or
    * contract), else the shifted value goes negative and the floor/
    * truncate divergence returns. */
  def lloydUpdateFp(withCell: DataFrame, vecCol: String = "embedding"): DataFrame =
    withCell
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col("cell"), (col("__p") + 1).as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("__x").cast("double") * 1000000.0 + 0.5).cast("long")
          + 1000000L).as("__s"))
      .select(col("cell"), col("dim"), col("n_vecs"),
        (expr("__s DIV n_vecs") - 1000000L).as("mean_fp"))

  /** Per-cell elementwise mean vectors (posexplode + two hash aggs). */
  private def cellMeans(withCell: DataFrame, vecCol: String): DataFrame =
    withCell
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        p => p("m").cast("float")).as("centroid"))

  /** Shared IVF probe: each query visits its `nprobe` nearest centroids,
    * exact cosine only within the probed cells. Centroids are bounded
    * driver-side metadata (kCells·dim floats), so probe selection is a
    * pure PROJECTION over a literal array — rank cells per row with
    * `array_sort`, slice the top `nprobe`, explode — rather than the
    * query×centroid cross join + window the naive form plans (a
    * BroadcastNestedLoop the global PlanAuditSpec would reject). Ranking
    * matches the window form exactly: cosine desc then cell asc, with the
    * −2 floor ranking null-cosine (degenerate) pairs last. */
  private def ivfSearch(corpusWithCell: DataFrame, cents: Seq[(Long, Array[Float])],
                        queries: DataFrame, k: Int, vecCol: String, idCol: String,
                        nprobe: Int,
                        excludeLabelCol: Option[String] = None,
                        tombstones: Option[DataFrame] = None): DataFrame = {
    if (cents.isEmpty)
      return topKPerQuery(queries
        .select(col(idCol).as("query_id"), col(idCol), lit(0d).as("cos"))
        .limit(0), k, idCol)
    val centLit = array(cents.map { case (c, v) =>
      struct(lit(c).as("cell"), typedlit(v).as("centroid")) }: _*)
    val ranked = reverse(array_sort(transform(centLit, c =>
      struct(coalesce(cosine(col("__qv"), c("centroid")), lit(-2d)).as("d"),
        (-c("cell")).as("nc")))))
    // excludeLabelCol (the hard-negative miner): the query's label rides
    // the probe rows and the inequality filters INSIDE the probed cells,
    // before the top-k — per-query pre-filtering, same contract as the
    // brute-force miner's join predicate
    val qCols = Seq(col(idCol).as("query_id"), col(vecCol).as("__qv")) ++
      excludeLabelCol.map(c => col(c).as("__ql"))
    val qCells = queries.select(qCols: _*)
      .withColumn("__probe", explode(slice(ranked, 1, nprobe)))
      .select(Seq(col("query_id"), col("__qv"),
        (-col("__probe.nc")).as("cell")) ++
        excludeLabelCol.map(_ => col("__ql")): _*)
    val probed = corpusWithCell
      .join(qCells, Seq("cell"))
      .where(col("query_id") =!= col(idCol))
    // tombstones (the delete path): anti-join AFTER the cell probe, so
    // its input is the cells/nprobe-bounded candidate set — never a
    // full-index rewrite or a corpus-sized scan per search
    val live = tombstones.fold(probed)(t =>
      probed.join(t.select(col(idCol)), Seq(idCol), "left_anti"))
    val filtered = excludeLabelCol.fold(live)(c =>
      live.where(col("__ql") =!= col(c)))
    val scored = filtered
      .select(col("query_id"), col(idCol), cosine(col("__qv"), col(vecCol)).as("cos"))
    topKPerQuery(scored, k, idCol)
  }

  /** x_hard_negatives_ann's centroid stash (the [[lastLearned]] contract;
    * separate so the miner can never clobber the x_knn_ivf oracle). */
  @volatile var lastLearnedHardNeg: Seq[(Long, Array[Float])] = Nil

  /** The hard-negative miner's SCALE path: [[hardNegatives]]' label-
    * disjoint top-k over the IVF index instead of the full corpus — the
    * query probes its `nprobe` nearest learned cells and the label
    * inequality filters within them, so the scan is cells/nprobe-fold
    * smaller and nothing broadcasts the corpus. Same approximate-recall /
    * deterministic-computation contract as [[ivfTopKLearned]]: the
    * learned centroids are stashed ([[lastLearnedHardNeg]]) and the
    * oracle replays assignment + probe + label-filtered top-k as literal
    * SQL. */
  def hardNegativesAnn(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                       vecCol: String = "embedding", idCol: String = "vec_id",
                       labelCol: String = "label", kCells: Int = 8,
                       iters: Int = 2, nprobe: Int = 2): DataFrame = {
    val cents = learnedCentroids(corpus, kCells, iters, vecCol, idCol,
      stash = false)
    lastLearnedHardNeg = cents
    ivfSearch(assignCells(corpus, cents, vecCol), cents, queries, k, vecCol,
      idCol, nprobe, excludeLabelCol = Some(labelCol))
  }

  // ---------- product quantization ----------

  /** Verification hook for [[pqTopK]] (same contract as [[lastLearned]]):
    * the most recent codebooks as (subspace, code, codeword) — m·kCodes
    * subvectors of bounded driver-side metadata. A SEPARATE stash from
    * the IVF one, so learning PQ codebooks can never clobber the
    * centroids the x_knn_ivf oracle replays. */
  @volatile var lastLearnedPq: Seq[(Int, Int, Array[Float])] = Nil

  /** Squared L2 between two double vectors — left fold in element order,
    * the same op order the DuckDB oracle's `list_sum(list_transform(...))`
    * computes. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** rows whose vector can participate in L2 math at this dim: right
    * length, no NULL elements (zero-norm is FINE for L2, unlike cosine) */
  private def validVec(v: Column, dim: Int): Column =
    v.isNotNull && size(v) === dim && !exists(v, _.isNull)

  /** PQ codebooks: the vector space split into `m` contiguous subspaces,
    * each quantized with seeded Lloyd's under squared-L2 (k-means
    * proper — cosine is the wrong metric inside a subspace). ALL
    * subspaces train together, one pass per iteration: a single map-only
    * projection computes every subspace's nearest-code assignment against
    * the literal codebooks, then ONE posexplode + aggregation keyed by
    * (sub, cell, subpos) — m·kCodes·(dim/m) = kCodes·dim group keys, so
    * partial aggregation collapses each task's contribution to bounded
    * rows before the only exchange. Codebooks live on the driver between
    * passes (kCodes·dim floats of bounded metadata, the
    * [[learnedCentroids]] contract); per iteration the corpus is scanned
    * once, never shuffled. Seeds are the kCodes lowest-id vectors'
    * subvectors; cells that go empty are re-numbered densely per
    * subspace. Only the FINAL codebook needs cross-engine determinism
    * (the oracle takes it as literals), not the learning path.
    *
    * Training reads a bounded deterministic sample ([[trainSample]],
    * ≤ max(100·kCodes, 100k) rows, persisted across passes): one corpus
    * scan selects it, every Lloyd pass thereafter is O(sample) — the
    * corpus is never re-scanned per iteration to learn the kCodes·dim
    * floats of codebook metadata. A corpus with ≤ n valid rows trains on
    * ALL of it, so small-fixture codebooks are unchanged. */
  def pqCodebooks(corpus: DataFrame, m: Int, kCodes: Int, iters: Int, dim: Int,
                  vecCol: String = "embedding", idCol: String = "vec_id",
                  stash: Boolean = true): Seq[(Int, Int, Array[Float])] = {
    val out =
      if (m > 0 && dim / m > 0)
        memoModel(corpus, graft.PlanMemo.tag("pq", m, kCodes, iters, dim, vecCol, idCol)) {
          trainPqCodebooks(corpus, m, kCodes, iters, dim, vecCol, idCol)
        }
      else Seq.empty[(Int, Int, Array[Float])]
    // callers that learn codebooks for a DIFFERENT query pass stash=false
    // so they can never clobber the books the x_knn_pq oracle replays; a
    // memo hit still re-stashes (per-call state)
    if (stash) lastLearnedPq = out
    out
  }

  private def trainPqCodebooks(corpus: DataFrame, m: Int, kCodes: Int, iters: Int,
                               dim: Int, vecCol: String,
                               idCol: String): Seq[(Int, Int, Array[Float])] = {
    val ds = dim / m
    val valid = trainSample(
      corpus.where(validVec(col(vecCol), dim))
        .select(col(idCol), col(vecCol).cast("array<double>").as("__v")),
      idCol, sampleN(kCodes)).persist()
    val seeds = valid.orderBy(col(idCol)).limit(kCodes)
      .select("__v").collect().map(_.getSeq[Double](0).toArray)
    var books: IndexedSeq[IndexedSeq[Array[Double]]] =
      (0 until m).map(j => seeds.toIndexedSeq.map(_.slice(j * ds, (j + 1) * ds)))
    var i = 0
    while (i < iters && books.head.nonEmpty) {
      // assignment via the fused encode kernel (one codegen'd pass for
      // all m argmins, not m·kCodes interpreted HOF chains per row —
      // ×iters this dominated codebook-build time). The kernel's
      // 6dp-rounded distances match the FINAL encode exactly; inside
      // Lloyd's the rounding only matters when two codewords sit within
      // 1e-6 of a training point — tie noise, not model quality.
      val codes = graft.plans.PqEncodeExpression.pqEncodeDoubles(
        col("__v"), books.map(_.map(_.toSeq)), ds)
      val sub = (col("pos") / ds).cast("int")
      val rows = valid.withColumn("__codes", codes)
        .select(posexplode(col("__v")).as(Seq("pos", "x")), col("__codes"))
        .select(sub.as("sub"), element_at(col("__codes"), sub + 1).as("cell"),
          (col("pos") % ds).as("subpos"), col("x"))
        .groupBy("sub", "cell", "subpos").agg(avg("x").as("mval"))
        .collect()
      books = (0 until m).map { j =>
        rows.filter(_.getInt(0) == j)
          .groupBy(_.getInt(1)).toIndexedSeq.sortBy(_._1)
          .map { case (_, cellRows) =>
            cellRows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
          }
      }
      i += 1
    }
    valid.unpersist(blocking = false)
    val out = for (j <- 0 until m; (cw, c) <- books(j).zipWithIndex)
      yield (j, c, cw.map(_.toFloat))
    out
  }

  /** PQ ANN search with asymmetric distance (ADC). The corpus is ENCODED
    * to m small codes per row — a map-only projection against literal
    * codebooks; at scale that code table is the stored index, dim/m·32×
    * smaller than the raw vectors, and the search scan reads only it.
    * Queries stay exact: per pair, the approximate distance is the sum
    * over subspaces of squared-L2 between the query's subvector and the
    * corpus row's CODEWORD. Each subspace distance is rounded to 6
    * decimals and the sum runs over DECIMAL(18,6) — exact, order-
    * independent, and bit-reproducible in the oracle's LUT-join replay
    * regardless of either engine's FP low-order bits. Queries broadcast
    * (the [[bruteForceTopK]] contract, whitelisted BNLJ); ranking is the
    * two-phase top-k, ascending distance, ties to the lowest id. */
  /** Per-subspace codeword literal arrays (`cwLit(j)(code+1)` = codeword). */
  private def codebookLits(books: Seq[(Int, Int, Array[Float])], m: Int): IndexedSeq[Column] = {
    val bySub = books.groupBy(_._1).map { case (j, cws) =>
      j -> cws.sortBy(_._2).map(_._3)
    }
    (0 until m).map(j => array(bySub(j).map(v => typedlit(v.map(_.toDouble))): _*))
  }

  /** All m nearest codes for a `__v` double vector as ONE `__codes`
    * array<int> column — the fused codegen kernel
    * ([[graft.plans.PqEncodeExpression]]), bit-identical to the
    * compositional m·kCodes `array_min(transform(...))` form it
    * replaced (PqSpec pins codes + search output). One expression per
    * row also keeps the encode inside a single whole-stage-codegen
    * projection instead of m interpreted HOF chains. */
  private def encodeCodes(books: Seq[(Int, Int, Array[Float])], m: Int, ds: Int): Column =
    graft.plans.PqEncodeExpression.pqEncode(col("__v"), books, m, ds).as("__codes")

  /** Per-query ADC lookup tables `__lut0..__lut(m-1)`: for each subspace,
    * the 6dp-rounded squared-L2 from the query's subvector to EVERY
    * codeword (kCodes doubles). Computed once per QUERY row — m·kCodes
    * vector folds per query — instead of recomputing the fold per
    * (query, corpus-row) pair, which made ADC scoring O(pairs·m·ds)
    * instead of O(pairs·m) lookups. This is the textbook PQ asymmetric-
    * distance structure (and literally the oracle's `lut` CTE). */
  private def lutCols(cwLit: IndexedSeq[Column], m: Int, ds: Int): Seq[Column] =
    (0 until m).map { j =>
      transform(cwLit(j), cw =>
        graft.functions.DetRound.round6(l2sq(slice(col("__qv"), j * ds + 1, ds), cw))).as(s"__lut$j")
    }

  /** ADC distance of a row's `__codes` against the query's LUTs: m array
    * lookups summed over DECIMAL(18,6) — exact, order-independent, and
    * value-identical to re-deriving each subspace distance (the LUT holds
    * the same 6dp-rounded doubles). */
  private def adcExpr(m: Int): Column =
    (0 until m).map { j =>
      element_at(col(s"__lut$j"), element_at(col("__codes"), j + 1) + 1)
        .cast("decimal(18,6)")
    }.reduce(_ + _)

  /** Ascending-distance two-phase top-k over `(query_id, id, ad)` rows. */
  private def topKByDist(scored: DataFrame, k: Int, idCol: String): DataFrame = {
    val wp = Window.partitionBy(col("query_id"), col("__p"))
      .orderBy(col("ad").asc, col(idCol))
    val survivors = scored
      .withColumn("__p", spark_partition_id())
      .withColumn("__r", row_number().over(wp))
      .where(col("__r") <= k).drop("__r", "__p")
    val w = Window.partitionBy(col("query_id")).orderBy(col("ad").asc, col(idCol))
    survivors.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col(idCol).as("neighbor_id"), col("ad").as("adist"))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
             m: Int = 4, kCodes: Int = 16, iters: Int = 2,
             vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val dim = probeDim(corpus, vecCol)
    require(m > 0 && (dim == 0 || dim % m == 0), s"dim $dim not divisible into $m subspaces")
    val ds = if (dim == 0) 0 else dim / m
    val books = pqCodebooks(corpus, m, kCodes, iters, dim, vecCol, idCol)
    if (books.isEmpty || dim == 0)
      return queries.select(col(idCol).as("query_id"), lit(1).as("rank"),
        col(idCol).as("neighbor_id"), lit(0d).as("adist")).limit(0)
    val cwLit = codebookLits(books, m)
    // the encoded code table IS the stored PQ index — memoized/persisted
    // so search reps scan codes, not re-encode the corpus
    val enc = memoDf(corpus, graft.PlanMemo.tag("pqenc", m, kCodes, iters, dim, vecCol, idCol)) {
      corpus.where(validVec(col(vecCol), dim))
        .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
        .select(col(idCol), encodeCodes(books, m, ds))
    }
    val q = broadcast(queries.where(validVec(col(vecCol), dim))
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("__qv"))
      .select(Seq(col("query_id")) ++ lutCols(cwLit, m, ds): _*))
    val scored = enc.join(q, col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol), adcExpr(m).cast("double").as("ad"))
    topKByDist(scored, k, idCol)
  }

  /** Verification hook for [[ivfPqTopK]]: its own (cells, codebooks) pair
    * so neither the x_knn_ivf nor the x_knn_pq oracle stash is clobbered. */
  @volatile var lastLearnedIvfPq: (Seq[(Long, Array[Float])], Seq[(Int, Int, Array[Float])]) =
    (Nil, Nil)

  /** IVF-PQ composed ANN — the standard billion-scale shape: the coarse
    * IVF cells BOUND the candidate set (each query scores only its
    * `nprobe` cells' rows, cells/nprobe-fold fewer pairs) and the PQ code
    * table COMPRESSES what gets scored (the scan reads m codes per row,
    * not dim floats; ADC against the query's exact subvectors). Codes
    * quantize cell RESIDUALS `v − centroid[cell(v)]` (FAISS IVFPQ,
    * faiss/IndexIVFPQ.cpp `by_residual`): within a cell, residuals occupy
    * a far tighter ball than raw vectors do globally, so the same
    * m·kCodes code budget quantizes finer — the standard recall lever at
    * fixed code size (PqSpec pins the clustered-fixture recall at ≥ the
    * pre-residual marks). The cost is per-(query, probed-cell) ADC
    * lookup tables instead of per-query — nprobe·m·kCodes bounded folds
    * per query, the same trade FAISS makes. Both models remain bounded
    * driver-side metadata; assignment, residual, and encoding are one
    * map-only projection, so the only corpus shuffle is the cell-keyed
    * search join, and every stage is oracle-replayable from the stashed
    * literals. Approximate recall, deterministic computation (the
    * ANN-family contract). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                kCells: Int = 8, ivfIters: Int = 2, nprobe: Int = 2,
                m: Int = 4, kCodes: Int = 16, pqIters: Int = 2,
                vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val dim = probeDim(corpus, vecCol)
    require(m > 0 && (dim == 0 || dim % m == 0), s"dim $dim not divisible into $m subspaces")
    val ds = if (dim == 0) 0 else dim / m
    val valid = corpus.where(validVec(col(vecCol), dim))
    val cents = learnedCentroids(valid, kCells, ivfIters, vecCol, idCol, stash = false)
    // cell-id → centroid(double) literal map: residual derivation is a
    // pure projection (kCells·dim floats of driver-side metadata, the
    // assignCells contract — no corpus join)
    val centMapD = if (cents.isEmpty) lit(null) else
      map(cents.flatMap { case (c, v) =>
        Seq(lit(c), typedlit(v.map(_.toDouble))) }: _*)
    val assigned = assignCells(valid, cents, vecCol)
      .select(col("cell"), col(idCol),
        zip_with(col(vecCol).cast("array<double>"), element_at(centMapD, col("cell")),
          (a, b) => a - b).as("__res"))
    // codebooks train on the residual relation — same bounded trainSample
    // machinery, just a different derived vector column
    val books = if (cents.isEmpty) Nil
      else pqCodebooks(assigned, m, kCodes, pqIters, dim, "__res", idCol, stash = false)
    lastLearnedIvfPq = (cents, books)
    if (cents.isEmpty || books.isEmpty || dim == 0)
      return queries.select(col(idCol).as("query_id"), lit(1).as("rank"),
        col(idCol).as("neighbor_id"), lit(0d).as("adist")).limit(0)
    val cwLit = codebookLits(books, m)
    // the stored index row: (cell, id, m codes) — assignment, residual,
    // and encoding are one map-only projection over the corpus
    val enc = assigned
      .select(col("cell"), col(idCol), col("__res").as("__v"))
      .select(col("cell"), col(idCol), encodeCodes(books, m, ds))
    // query probe selection: pure projection over the literal centroids
    // (the ivfSearch contract — no query×centroid join)
    val centLit = array(cents.map { case (c, v) =>
      struct(lit(c).as("cell"), typedlit(v).as("centroid")) }: _*)
    val ranked = reverse(array_sort(transform(centLit, c =>
      struct(coalesce(cosine(col("__qvf"), c("centroid")), lit(-2d)).as("d"),
        (-c("cell")).as("nc")))))
    // LUTs are per (query, PROBED CELL) under residual quantization — the
    // query's residual against each probed centroid differs per cell, so
    // the m·kCodes folds run nprobe times per query (bounded, the FAISS
    // precomputed-table shape) after the probe explode
    val q = queries.where(validVec(col(vecCol), dim))
      .select(col(idCol).as("query_id"), col(vecCol).as("__qvf"),
        col(vecCol).cast("array<double>").as("__qd"))
      .withColumn("__probe", explode(slice(ranked, 1, nprobe)))
      .select(col("query_id"), (-col("__probe.nc")).as("cell"), col("__qd"))
      .withColumn("__qv",
        zip_with(col("__qd"), element_at(centMapD, col("cell")), (a, b) => a - b))
      .select(Seq(col("query_id"), col("cell")) ++ lutCols(cwLit, m, ds): _*)
    val scored = enc.join(q, Seq("cell"))
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol), adcExpr(m).cast("double").as("ad"))
    topKByDist(scored, k, idCol)
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              vecCol: String = "embedding", idCol: String = "vec_id",
              nPlanes: Int = 4): DataFrame = {
    val dim = probeDim(corpus, vecCol)
    // rows with a NULL / empty / off-dim vector hash to a degenerate
    // (short) bucket — they have no defined angle to anything, so they opt
    // OUT of the ANN search entirely rather than co-bucketing into one
    // mega-bucket of wasted pairs (and the multi-probe bit-flip below
    // would ANSI-crash casting an empty substring to int)
    val c = corpus.withColumn("__b", hyperplaneBucket(col(vecCol), nPlanes, dim))
      .where(length(col("__b")) === nPlanes)
    // multi-probe on the query side: also visit every bucket at Hamming
    // distance 1, recovering most cross-boundary neighbors
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__b0", hyperplaneBucket(col("__qv"), nPlanes, dim))
      .where(length(col("__b0")) === nPlanes)
      .withColumn("__b", explode(array(
        col("__b0") +: (0 until nPlanes).map { i =>
          concat(substring(col("__b0"), 1, i),
            (lit(1) - substring(col("__b0"), i + 1, 1).cast("int")).cast("string"),
            substring(col("__b0"), i + 2, nPlanes - i - 1))
        }: _*)))
      .drop("__b0")
    val scored = c.join(q, Seq("__b"))
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol), cosine(col("__qv"), col(vecCol)).as("cos"))
      .groupBy(col("query_id"), col(idCol)).agg(max(col("cos")).as("cos")) // dedupe multi-probe hits
    topKPerQuery(scored, k, idCol)
  }
}
