package graft.ext

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
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

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus.join(q, col("query_id") =!= col(idCol))
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
        col(idCol).as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
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

  /** Seeded Lloyd's iteration: seeds = the `kCells` lowest-id corpus
    * vectors (`TakeOrdered`, no global sort) — no RNG anywhere, so reruns
    * in the single-process harness are bit-identical (ExtSpec pins this).
    * On a multi-executor cluster the per-cell means still merge partial
    * double sums in shuffle-fetch order, so centroids are deterministic
    * only up to FP low-order bits — boundary vectors could flip cells
    * between runs; seed choice and everything else stays fixed.
    * Each pass assigns
    * every vector to its nearest centroid with the map-only literal
    * arg-max of [[assignCells]] and recomputes per-cell means (partial
    * aggregation collapses to ~kCells·dim rows per task before the only
    * exchange). Centroids live on the driver between passes — kCells·dim
    * floats of bounded metadata, NOT a data collect — so each Lloyd pass
    * costs one corpus SCAN and zero corpus shuffles. */
  def learnedCentroids(corpus: DataFrame, kCells: Int, iters: Int = 2,
                       vecCol: String = "embedding", idCol: String = "vec_id"): Seq[(Long, Array[Float])] = {
    var cents: Seq[(Long, Array[Float])] =
      corpus.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
        .orderBy(col(idCol)).limit(kCells)
        .select(col(idCol).cast("long").as("cell"),
          col(vecCol).cast("array<float>").as("centroid"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    var i = 0
    while (i < iters && cents.nonEmpty) {
      cents = cellMeans(assignCells(corpus, cents, vecCol), vecCol).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
      i += 1
    }
    lastLearned = cents
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
                        nprobe: Int): DataFrame = {
    if (cents.isEmpty)
      return topKPerQuery(queries
        .select(col(idCol).as("query_id"), col(idCol), lit(0d).as("cos"))
        .limit(0), k, idCol)
    val centLit = array(cents.map { case (c, v) =>
      struct(lit(c).as("cell"), typedlit(v).as("centroid")) }: _*)
    val ranked = reverse(array_sort(transform(centLit, c =>
      struct(coalesce(cosine(col("__qv"), c("centroid")), lit(-2d)).as("d"),
        (-c("cell")).as("nc")))))
    val qCells = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__probe", explode(slice(ranked, 1, nprobe)))
      .select(col("query_id"), col("__qv"), (-col("__probe.nc")).as("cell"))
    val scored = corpusWithCell
      .join(qCells, Seq("cell"))
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol), cosine(col("__qv"), col(vecCol)).as("cos"))
    topKPerQuery(scored, k, idCol)
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
