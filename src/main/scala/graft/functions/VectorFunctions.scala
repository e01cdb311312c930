package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float|double>` columns, as pure
  * higher-order-function expressions (codegen'd, no UDFs, no MLlib types —
  * the embedding column stays a plain parquet list the whole way).
  *
  * All arithmetic is done in DOUBLE with a sequential left-fold, which both
  * DuckDB's `list_cosine_similarity` and a scalar loop reproduce exactly —
  * verified bit-for-bit against the oracle.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity via the custom codegen'd kernel
    * ([[graft.plans.CosineSimilarity]]) — the HOF formulation
    * (`dot/(norm·norm)`) computes the same value but falls out of
    * whole-stage codegen and allocates per row; the kernel is ~20× faster
    * on all-pairs workloads. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosineSim(a, b)

  /** Deterministic pseudo-random hyperplane component for plane `p`,
    * dimension `i`: a seeded hash mapped to [-1, 1). Gives reproducible
    * random-projection LSH without any RNG state. Expression form — the
    * formula of record; [[planeWeights]] evaluates it driver-side. */
  def planeComponent(p: Int, i: Column): Column =
    (conv(substring(md5(concat_ws("|", lit("plane"), lit(p), i)), 1, 15), 16, 10)
      .cast("double") / lit(math.pow(2, 60) / 2.0)) - lit(1.0)

  /** [[planeComponent]] evaluated driver-side: same md5 → [-1,1) mapping,
    * bit-identical (VectorSpec pins it), computed once per (plane, dim)
    * instead of once per ROW × plane × dim. At corpus scale the expression
    * path spends O(n·d·p) md5/string work re-deriving what is a model
    * constant; the weights are ~d·p doubles — literal-sized. */
  def planeWeights(p: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val hex = md.digest(s"plane|$p|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
        .toDouble / (math.pow(2, 60) / 2.0) - 1.0
    }
  }

  /** Sign bit of the projection of `v` onto deterministic hyperplane `p`.
    * The plane is a driver-side literal array; the per-row work is the
    * d-element dot product only. A vector whose length differs from `dim`
    * (or is NULL) yields a NULL sign — `zip_with` null-pads the shorter
    * side and the null poisons the sum — so its bucket string comes out
    * SHORT of nPlanes chars; callers filter on bucket length to keep such
    * rows out of the pair space (they have no defined angle at this dim). */
  def planeSign(v: Column, p: Int, dim: Int): Column = {
    val prods = zip_with(d(v), typedlit(planeWeights(p, dim)), (x, w) => x * w)
    (aggregate(prods, lit(0.0), (acc, x) => acc + x) > 0).cast("int")
  }

  /** Random-hyperplane LSH bucket key: `nPlanes` sign bits concatenated.
    * Cosine-similar vectors collide with high probability; used to
    * pre-bucket ANN search so the exact cosine runs only within buckets.
    * `dim` is the embedding dimensionality (a model constant — probe it
    * with [[probeDim]] when not statically known). */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int): Column =
    concat_ws("", (0 until nPlanes).map(p => planeSign(v, p, dim)): _*)

  /** Embedding dimensionality, probed from the first row with a non-empty
    * vector (metadata-scale read — every real corpus has a single
    * model-constant dim). Returns 0 when no such row exists (empty corpus
    * or all-NULL/empty column) — zero-length vectors then bucket to a
    * constant key, and every cosine over them is NULL, so the search
    * paths return no rows for them (the NULL-cos filter in top-k) rather
    * than fabricated neighbors. NOTE: runs a (tiny) Spark job at
    * plan-construction time. */
  def probeDim(df: org.apache.spark.sql.DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol)).as("d")).where(col("d") > 0)
      .head(1).headOption.map(_.getInt(0)).getOrElse(0)
}
