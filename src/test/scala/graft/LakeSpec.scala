package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.{Lake, Tables}

/** Executed-plan proofs for the stored lake layouts (SCALE.md
  * "partitioning & shuffle"): a bucketed fact↔fact join must run with no
  * exchange and no sort under the join, and a partition-column filter
  * must prune directories at planning time — asserted on the plans that
  * actually ran, not on intent. */
class LakeSpec extends SparkSpec {

  private def nodesIn[T <: org.apache.spark.sql.execution.SparkPlan](
      plan: org.apache.spark.sql.execution.SparkPlan)(
      implicit ct: scala.reflect.ClassTag[T]): Seq[T] =
    plan.collect {
      case s if ct.runtimeClass.isInstance(s) => Seq(s.asInstanceOf[T])
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodesIn[T](a.executedPlan)
      // materialized AQE stages are leaves wrapping their own tree
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        nodesIn[T](qs.plan)
    }.flatten

  test("bucketed join: both scans are bucketed and zero exchange sits below the join") {
    val q = SparkEntry.queries("x_bucketed_join")(spark, sf)
    q.collect() // materialize the final adaptive plan
    val plan = q.queryExecution.executedPlan
    val joins = nodesIn[org.apache.spark.sql.execution.joins.SortMergeJoinExec](plan)
    assert(joins.size == 1, s"expected one sort-merge join, got:\n$plan")
    val below = joins.head
    assert(nodesIn[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec](below).isEmpty,
      s"bucketed join must not shuffle its inputs:\n$below")
    // NOTE the remaining Sort nodes are LOCAL per-bucket sorts of
    // already-sorted input (linear, no shuffle): Spark trusts a bucketed
    // table's written sort order only behind
    // spark.sql.legacy.bucketedTableScan.outputOrdering, because buckets
    // holding >1 file would need a merge-read. The engine keeps the
    // default; the win under test is the EXCHANGE elision.
    val scans = nodesIn[FileSourceScanExec](below)
    assert(scans.size == 2 && scans.forall(_.bucketedScan),
      s"both join inputs must be bucketed scans:\n$below")
    // the only shuffle in the whole query is the final 5-row rollup
    // (count_distinct plans its two-phase agg over one reused exchange)
    val all = plan.toString
    val printed = all.linesIterator.count(l =>
      l.dropWhile(c => !c.isLetter).startsWith("Exchange "))
    assert(printed <= 2, s"expected only the rollup exchange(s), got $printed:\n$all")
  }

  test("bucketed writes land one file per bucket (sort-order trust depends on it)") {
    val l = Lake.bucketed(spark, sf, "lineitem", "l_orderkey")
    val files = l.select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    assert(files.length == Lake.DefaultBuckets,
      s"expected ${Lake.DefaultBuckets} files (one per bucket), got ${files.length}")
  }

  test("bucketed join result equals the plain shuffled join") {
    val q = SparkEntry.queries("x_bucketed_join")(spark, sf)
    val l = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        count_distinct(col("o_orderkey")).as("n_orders"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE) - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
    assert(q.exceptAll(plain).isEmpty && plain.exceptAll(q).isEmpty)
  }

  test("partition-column filter becomes a PartitionFilter and only probed directories are read") {
    val q = SparkEntry.queries("x_partition_prune")(spark, sf)
    q.collect()
    val scans = nodesIn[FileSourceScanExec](q.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val pf = scans.head.metadata("PartitionFilters")
    assert(pf.contains("lang"), s"lang filter must resolve against partitions: $pf")
    val files = Lake.partitioned(spark, sf, "documents", "lang")
      .where(col("lang").isin(SparkEntryLay.PruneLangs: _*))
      .select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f =>
      SparkEntryLay.PruneLangs.exists(l => f.contains(s"lang=$l"))),
      s"scan escaped the probed partitions: ${files.mkString(", ")}")
  }

  test("a broken store root degrades LOUDLY to the plain frame, never a wrong result") {
    // fault injection: point the layout store at a path that is a FILE,
    // so directory creation throws — the production degrade path
    val prev = System.getProperty("graft.buckets.dir")
    val notADir = java.nio.file.Files.createTempFile("graft_not_a_dir", "").toString
    System.setProperty("graft.buckets.dir", notADir)
    try {
      val before = Lake.degradeEvents.get()
      // fresh (table, key, buckets) triple so no healthy catalog table
      // from an earlier test can satisfy the lookup before the store IO
      val df = Lake.bucketed(spark, sf, "orders", "o_custkey", nBuckets = 4)
      assert(Lake.degradeEvents.get() > before,
        "store failure must be counted/logged, not swallowed")
      // correctness contract of the degrade: the plain unbucketed rows
      assert(df.exceptAll(Tables.orders(spark, sf)).isEmpty &&
        Tables.orders(spark, sf).exceptAll(df).isEmpty)
      // and the plan honestly shows an unbucketed scan
      val scans = nodesIn[FileSourceScanExec](df.queryExecution.executedPlan)
      assert(scans.nonEmpty && scans.forall(!_.bucketedScan),
        "degraded frame must not claim a bucketed scan")
    } finally {
      if (prev == null) System.clearProperty("graft.buckets.dir")
      else System.setProperty("graft.buckets.dir", prev)
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(notADir))
    }
  }

  test("partitioned copy round-trips the source table exactly") {
    val p = Lake.partitioned(spark, sf, "documents", "lang")
    val d = Tables.documents(spark, sf)
    assert(p.columns.toSeq == d.columns.toSeq, p.columns.mkString(","))
    assert(p.exceptAll(d).isEmpty && d.exceptAll(p).isEmpty)
  }
}
