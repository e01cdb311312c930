package graft

/** Global plan hygiene: EVERY driver query must plan without a cartesian
  * product or nested-loop join — the two shapes that turn a 100× scale-up
  * into a 10000× cost — except the explicitly documented broadcast-bounded
  * exact paths, which are listed here so adding one is a reviewed decision
  * rather than an accident. */
class PlanAuditSpec extends SparkSpec {

  /** Paths whose CONTRACT is a broadcast-bounded all-pairs/top-k scan:
    * the exact kNN baseline (broadcast query set × corpus), the exact
    * embedding-pairs oracle path (broadcast one side; documented as
    * infeasible-beyond-broadcast by construction in Dedup.scala), and the
    * PQ/ADC scan (broadcast query set × the m-byte code table — the scan
    * side is the compressed index, which is the point). */
  private val broadcastBounded =
    // x_knn_recall composes the exact baseline + PQ/ADC scan, so it
    // inherits their broadcast-bounded shapes
    Set("x_knn_cosine", "x_dedup_embed", "x_knn_pq", "x_knn_recall")

  test("no query plans a cartesian product or an unbounded nested loop") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val nlj = plan.contains("BroadcastNestedLoop")
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (nlj && !broadcastBounded(name)) Some(s"$name: BroadcastNestedLoop")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
