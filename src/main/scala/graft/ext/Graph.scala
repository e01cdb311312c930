package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as relational plans — PageRank as the
  * representative: each iteration is one edge⋈rank equi-join plus one
  * destination-keyed aggregation, the exact shape a 1000-executor
  * cluster runs it in (Pregel's superstep IS a shuffle on the vertex
  * key). Connected components live with the dedup family
  * (Dedup large-star/small-star); this module holds the rank/degree
  * side.
  *
  * All arithmetic is INTEGER (ranks are fixed-point at [[Scale]], damping
  * is a rational 85/100, division is floor division), so the result is
  * bit-identical however partitions sum — the property that lets a DuckDB
  * oracle re-derive every iteration exactly. The mass floor-division
  * drops is bounded by one unit per (edge, iteration) and is the
  * documented price of cross-engine determinism.
  *
  * The only driver-side value is the vertex COUNT (one scalar — bounded
  * metadata, same contract as the sketch/centroid collects). */
object Graph {

  /** Fixed-point scale for rank mass: 10^12 keeps three iterations of
    * 85% damping well inside Long (85 · 10^12 ≪ 2^63) while leaving six
    * decimal digits of rank resolution above the floor-division noise. */
  val Scale: Long = 1000000000000L

  /** Damping as a rational: rank_{k+1} = Scale·15/(100·n) + 85·contrib/100. */
  val DampNum = 85L
  val DampDen = 100L

  /** PageRank over a DIRECTED edge list `(src, dst)` (symmetrize before
    * calling for an undirected walk). Every vertex must appear as a
    * source at least once (true for symmetrized lists) — dangling mass
    * is therefore structurally impossible rather than patched.
    *
    * Plan shape per iteration: edges ⋈ ranks on src (shuffle on src) →
    * groupBy dst (shuffle on dst) — 2·iters exchanges total, each
    * map-side combinable. `edges` is scanned once per iteration, so pass
    * a persisted/memoized relation; at cluster scale it is the bucketed
    * edge table and the src-join is co-located. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters=$iters out of the unrolled range")
    val deg = edges.groupBy(col(srcCol).as("__id"))
      .agg(count(lit(1)).as("__deg"))
    val n: Long = deg.count() // the one driver scalar (vertex count)
    require(n > 0, "pageRank on an empty edge list")
    val withDeg = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .join(deg, col("__src") === col("__id"))
      .select(col("__src"), col("__dst"), col("__deg"))
    val base = (Scale * (DampDen - DampNum)) / (DampDen * n)
    var ranks = deg.select(col("__id"), lit(Scale / n).as("__r"))
    for (_ <- 1 to iters) {
      // DIV truncates toward zero = floor for this all-positive mass
      // (and matches DuckDB's // on the oracle side exactly)
      val contribs = withDeg
        .join(ranks, col("__src") === col("__id"))
        .select(col("__dst"), expr("__r DIV __deg").as("__c"))
        .groupBy(col("__dst"))
        .agg(sum(col("__c")).as("__sum"))
      ranks = contribs.select(col("__dst").as("__id"),
        (lit(base) + expr(s"($DampNum * __sum) DIV $DampDen")).as("__r"))
    }
    ranks.select(col("__id").as("node"), col("__r").as("rank_scaled"))
  }
}
