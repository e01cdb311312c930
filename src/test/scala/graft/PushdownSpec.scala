package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-shape assertions for the scan layer (SCALE.md "push down and
  * prune"): predicates reach the parquet scan as PushedFilters and
  * projections prune ReadSchema — checked on the executed plans of real
  * queries, not assumed. */
class PushdownSpec extends SparkSpec {

  private def nodesIn[T <: org.apache.spark.sql.execution.SparkPlan](
      plan: org.apache.spark.sql.execution.SparkPlan)(implicit ct: scala.reflect.ClassTag[T]): Seq[T] =
    plan.collect {
      case s if ct.runtimeClass.isInstance(s) => Seq(s.asInstanceOf[T])
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodesIn[T](a.executedPlan)
    }.flatten

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
    nodesIn[FileSourceScanExec](df.queryExecution.executedPlan)

  test("P1 conjunctive equality pushes both predicates into the scan") {
    val q = SparkEntry.queries("p1_conj_eq")(spark, sf)
    val s = scans(q)
    assert(s.nonEmpty)
    val pushed = s.head.metadata("PushedFilters")
    assert(pushed.contains("EqualTo(o_orderstatus,F)") &&
      pushed.contains("EqualTo(o_orderpriority,1-URGENT)"), pushed)
  }

  test("P7 point lookup pushes the key predicate (partition-prunable at scale)") {
    val q = SparkEntry.queries("p7_by_id")(spark, sf)
    val pushed = scans(q).head.metadata("PushedFilters")
    assert(pushed.contains("EqualTo(o_orderkey,7)"), pushed)
  }

  test("projection prunes the read schema to referenced columns") {
    val q = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
      .where(col("l_quantity") > 45)
    val schema = scans(q).head.metadata("ReadSchema")
    assert(schema.contains("l_orderkey") && schema.contains("l_quantity"))
    assert(!schema.contains("l_extendedprice") && !schema.contains("l_shipdate"), schema)
  }

  test("P3 semi-join filters the child side before the join (range pushed to child scan)") {
    val q = SparkEntry.queries("p3_child_range_gt")(spark, sf)
    val childScan = scans(q).find(_.metadata("Location").contains("lineitem"))
    assert(childScan.isDefined)
    assert(childScan.get.metadata("PushedFilters").contains("GreaterThan(l_quantity,45.0)"),
      childScan.get.metadata("PushedFilters"))
  }

  test("P10 filters before assembling: every collect_list aggregate has the semi-join upstream") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val q = SparkEntry.queries("p10_search_renest")(spark, sf)
    q.collect() // finalize the adaptive plan before walking it
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val aggs = allNodes(q.queryExecution.executedPlan).filter(n =>
      n.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectList])))
    assert(aggs.nonEmpty, "expected collect_list aggregates in the renest plan")
    aggs.foreach { a =>
      assert(allNodes(a).drop(1).exists {
        case j: BaseJoinExec => j.joinType == LeftSemi
        case _ => false
      }, s"collect_list aggregate assembles unfiltered input (no semi-join below it):\n$a")
    }
  }

  test("funnel pushes each step's event-type equality into its events scan") {
    // the funnel's per-step slices are type-filtered BEFORE any agg/join;
    // at 100 TB each slice must reach the scan as a pushed predicate (and
    // prune whole files on a type-partitioned layout), not filter
    // post-scan
    val q = SparkEntry.queries("x_funnel")(spark, sf)
    val pushed = scans(q).map(_.metadata("PushedFilters"))
    assert(pushed.nonEmpty)
    SparkEntryEvt.FunnelSteps.foreach { st =>
      assert(pushed.exists(_.contains(s"EqualTo(event_type,$st)")),
        s"step '$st' equality must be pushed; scans: $pushed")
    }
  }

  test("corpus-cleaning pipeline plans one scan and one exchange (SCALE.md claim)") {
    val q = SparkEntry.queries("x_pipeline_clean")(spark, sf)
    assert(scans(q).size == 1, "expected a single corpus scan")
    val exchanges = nodesIn[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec](
      q.queryExecution.executedPlan)
    // the computation itself demands exactly ONE shuffle (the dedup
    // hash-agg, planned ENSURE_REQUIREMENTS); the deliberate r16
    // single-row-group scan fan-out (Tables.documents — REPARTITION_BY_NUM
    // keyed on doc_id, a no-op on a many-split table at scale) is allowed
    // and anything else still fails
    val (fanOut, required) = exchanges.partition(
      _.shuffleOrigin == org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
    assert(required.size == 1,
      s"expected exactly the dedup hash-agg exchange, got ${required.size}")
    assert(fanOut.size <= 1, s"at most the scan fan-out, got ${fanOut.size}")
  }
}
