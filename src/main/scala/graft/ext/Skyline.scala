package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points no other point beats on both
  * criteria — minimize `x`, maximize `y` (Börzsönyi, Kossmann & Stocker,
  * "The Skyline Operator", ICDE'01). The curation use: "cheapest
  * non-dominated configurations" over any (cost, quality) pair.
  *
  * The naive formulation is the quadratic NOT-EXISTS self-join; the scale
  * path here is the standard coarse-grid prune made relational:
  *
  *  1. bucket `x` integrally (`x DIV bucketWidth` — exact in both
  *     engines), aggregate each bucket's max `y`: a relation of ≤
  *     #buckets rows — bounded METADATA, like the PageRank vertex count;
  *  2. prefix-max those bucket summaries over strictly-lower buckets
  *     (a window over the bucket relation — single partition, but over
  *     #buckets rows, not data rows);
  *  3. prune: any point whose `y` ≤ the prefix max is dominated by some
  *     strictly-cheaper point (every lower-bucket point has strictly
  *     smaller `x`, and the prefix witness has `y` ≥ this point's `y`) —
  *     one broadcast join + filter over the data, no shuffle;
  *  4. residual: survivors can only be dominated by SAME-bucket
  *     survivors (a lower-bucket dominator would have pruned the point
  *     in step 3 — and if a same-bucket dominator was itself pruned, its
  *     lower-bucket witness dominates this point transitively, so it was
  *     pruned too); one self-join keyed on the bucket, anti-joined —
  *     candidate volume Σ survivors-per-bucket², quadratic only in the
  *     frontier band the prune already thinned.
  *
  * So the full scan is touched twice (bucket agg + prune filter), the
  * quadratic step runs over the near-frontier only, and every comparison
  * is integer — the DuckDB oracle can re-derive the skyline from the
  * DEFINITION (NOT EXISTS) and hash-match exactly. */
object Skyline {

  /** Loud-failure valve on the residual self-join: survivors past this
    * mean the bucket width is far too coarse for the data's frontier
    * band — re-bucket, don't commit the cluster to a quadratic join. */
  val MaxSurvivors: Long = 10000000L

  /** Skyline members of `points` under (min `xCol`, max `yCol`), both
    * integer columns. Output: the input's three columns renamed
    * `(id, x, y)`. Ties kept: two incomparable points (equal on one
    * criterion, or equal on both) both survive — the ICDE'01 semantics.
    *
    * `bucketWidth` trades prune sharpness against bucket-relation size;
    * anything putting 10–10⁴ buckets over the x-range works (the bucket
    * relation stays broadcastable either way). */
  def skyline2d(points: DataFrame, idCol: String, xCol: String, yCol: String,
                bucketWidth: Long, maxSurvivors: Long = MaxSurvivors): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth")
    val pts = points.select(col(idCol).as("__id"), col(xCol).as("__x"),
      col(yCol).as("__y"), expr(s"${xCol} DIV $bucketWidth").as("__bk"))
    // bounded bucket summary → prefix max over strictly-lower buckets
    val bmax = pts.groupBy("__bk").agg(max(col("__y")).as("__bm"))
    val prefix = bmax.select(col("__bk"),
      max(col("__bm")).over(Window.orderBy(col("__bk"))
        .rowsBetween(Window.unboundedPreceding, -1)).as("__pm"))
    // prune: dominated by a strictly-cheaper bucket's witness
    val survivors = pts.join(prefix, Seq("__bk"))
      .where(col("__pm").isNull || col("__y") > col("__pm"))
      .select("__id", "__x", "__y", "__bk")
      .localCheckpoint(true) // scanned by the guard agg + both join sides
    val nSurv = survivors.count() // bounded driver scalar (the valve)
    require(nSurv <= maxSurvivors,
      s"skyline2d: $nSurv near-frontier survivors exceed $maxSurvivors — " +
        "narrow bucketWidth before committing the residual self-join")
    // residual: same-bucket dominance among survivors only (see proof in
    // the module doc); strict-in-one keeps incomparable ties
    val dominated = survivors.alias("p").join(survivors.alias("q"),
        col("p.__bk") === col("q.__bk") &&
          col("q.__x") <= col("p.__x") && col("q.__y") >= col("p.__y") &&
          (col("q.__x") < col("p.__x") || col("q.__y") > col("p.__y")),
        "left_semi")
    survivors.join(dominated.select(col("__id")), Seq("__id"), "left_anti")
      .select(col("__id").as("id"), col("__x").as("x"), col("__y").as("y"))
  }
}
