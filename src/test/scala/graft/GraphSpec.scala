package graft

import graft.ext.Graph
import org.apache.spark.sql.functions._

/** The distributed PageRank against an in-memory reference fold: the
  * integer fixed-point contract means the two must agree EXACTLY, on any
  * partitioning — which is also what lets the DuckDB oracle replay the
  * iterations. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of Graph.pageRank's arithmetic (all floor
    * divisions on positive longs). */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size.toLong
    val base = (Graph.Scale * (Graph.DampDen - Graph.DampNum)) / (Graph.DampDen * n)
    var r = deg.keys.map(k => k -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = contrib.map { case (id, c) =>
        id -> (base + (Graph.DampNum * c) / Graph.DampDen)
      }
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  parts: Int = 5): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-cycle reaches the uniform stationary ranks") {
    val edges = Seq((1L, 2L), (2L, 1L))
    val got = run(edges, 3)
    assert(got == ref(edges, 3))
    // symmetric graph: both nodes carry identical mass
    assert(got(1L) == got(2L))
  }

  test("a star's hub outranks its leaves, exactly as the reference fold says") {
    // hub 1 ↔ leaves 2..5 (symmetrized)
    val edges = (2L to 5L).flatMap(l => Seq((1L, l), (l, 1L)))
    val got = run(edges, 3)
    assert(got == ref(edges, 3))
    assert((2L to 5L).forall(l => got(1L) > got(l)))
    assert((3L to 5L).forall(l => got(l) == got(2L)), "leaves are symmetric")
  }

  test("pseudo-random graph matches the reference on every node, independent of partitioning") {
    val rnd = new scala.util.Random(9200)
    val edges0 = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = (edges0 ++ edges0.map(_.swap)).distinct
    val expected = ref(edges, 4)
    assert(run(edges, 4, parts = 7) == expected)
    assert(run(edges, 4, parts = 1) == expected, "partitioning must not change ranks")
  }

  test("rank mass is conserved up to the documented floor-division loss") {
    val rnd = new scala.util.Random(17)
    val edges0 = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = (edges0 ++ edges0.map(_.swap)).distinct
    val iters = 3
    val total = run(edges, iters).values.sum
    val n = edges.map(_._1).distinct.size
    // each iteration floors once per edge, once per vertex (damp term),
    // once in the base term — a crude but sufficient loss bound
    val maxLoss = iters.toLong * (edges.size + 2L * n)
    assert(total <= Graph.Scale && total >= Graph.Scale - maxLoss,
      s"mass $total outside [${Graph.Scale - maxLoss}, ${Graph.Scale}]")
  }

  test("x_pagerank query: ranks positive, one row per co-purchase node") {
    val q = SparkEntry.queries("x_pagerank")(spark, sf)
    val degs = SparkEntry.queries("x_degree_stats")(spark, sf)
    val nNodes = degs.agg(sum("n_nodes")).collect()(0).getLong(0)
    assert(q.count() == nNodes, "one rank row per node")
    assert(q.where(col("rank_scaled") <= 0).isEmpty, "all mass positive")
  }
}
