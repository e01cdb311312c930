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

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus.join(q, col("query_id") =!= col(idCol))
      .withColumn("cos", cosine(col("__qv"), col(vecCol)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col(idCol).as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF-style ANN: corpus partitioned into coarse cells, each query
    * probes only the `nprobe` nearest cell centroids. Centroids are the
    * per-cell mean vectors (computed with one posexplode + groupBy —
    * deterministic, no RNG); here the fixture's `label` column provides
    * the cell assignment (a k-means pass would produce one at scale — the
    * probe/search machinery is identical). Pair-space shrinks
    * cells/nprobe-fold; recall depends on how well cells capture the
    * metric structure.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              vecCol: String = "embedding", idCol: String = "vec_id",
              cellCol: String = "label", nprobe: Int = 2): DataFrame = {
    // per-cell centroid: elementwise mean via posexplode + regroup
    val centroids = corpus
      .select(col(cellCol).as("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        p => p("m").cast("float")).as("centroid"))
    // each query probes its nprobe nearest centroids
    val qCells = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .join(broadcast(centroids))
      .withColumn("__d", cosine(col("__qv"), col("centroid")))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__d").desc, col("cell"))))
      .where(col("__r") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cell"))
    val scored = corpus.withColumnRenamed(cellCol, "cell")
      .join(qCells, Seq("cell"))
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol), cosine(col("__qv"), col(vecCol)).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col(idCol).as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              vecCol: String = "embedding", idCol: String = "vec_id",
              nPlanes: Int = 4): DataFrame = {
    val c = corpus.withColumn("__b", hyperplaneBucket(col(vecCol), nPlanes))
    // multi-probe on the query side: also visit every bucket at Hamming
    // distance 1, recovering most cross-boundary neighbors
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__b0", hyperplaneBucket(col("__qv"), nPlanes))
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
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col(idCol).as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
  }
}
