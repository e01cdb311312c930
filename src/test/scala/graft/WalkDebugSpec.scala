package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEMPORARY debug harness: phase-level timing of the walk refresh. */
class WalkDebugSpec extends SparkSpec {
  test("debug3: where do the refresh seconds go at 10x") {
    val G = graft.ext.Graph
    def t[A](tag: String)(body: => A): A = {
      System.gc(); Thread.sleep(1500) // let the ContextCleaner drain
      val t0 = System.nanoTime(); val r = body
      println(f"DBG $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def salt(e: DataFrame): DataFrame = (0 until 10).map(i => e.select(
      (col("ua") + lit(i.toLong * 4000000000L)).as("ua"),
      (col("ub") + lit(i.toLong * 4000000000L)).as("ub")))
      .reduce(_ unionByName _).repartition(32)
    import spark.implicits._
    val pe1 = SparkEntryEvt.projectedCustomerEdges(spark, "/root/testdata/sf0.01")
    val attach = pe1.agg(min("ua")).head.getLong(0)
    val base10 = salt(pe1).persist()
    val newEdges = (0 until 10).flatMap { i =>
      val off = i.toLong * 4000000000L
      Seq((3900000000L + off, attach + off), (3900000001L + off, attach + off),
        (3900000000L + off, 3900000001L + off))
    }.toDF("ua", "ub")
    val full10 = base10.unionByName(newEdges).persist()
    println(s"DBG attach=$attach full=${full10.count()} base=${base10.count()}")
    val stored = t("stored build")(
      { val s = G.randomWalks(base10, "ua", "ub", 2, 4).persist(); s.count(); s })
    val changed = t("invalidations count")(
      { val c = G.walkInvalidations(base10, full10, "ua", "ub").persist()
        println(s"DBG changed=${c.count()}"); c })
    t("invalidations 2nd")(G.walkInvalidations(base10, full10, "ua", "ub").count())
    val refresh1 = t("refresh #1 (incl full-adj artifact build)")(
      { val r = G.walksFrom(stored, full10, "ua", "ub", changed, 2, 4)
        r.agg(count(lit(1))).head.getLong(0) })
    val refresh2 = t("refresh #2 (warm artifacts)")(
      { val r = G.walksFrom(stored, full10, "ua", "ub", changed, 2, 4)
        r.agg(count(lit(1))).head.getLong(0) })
    val rebuild = t("rebuild (warm artifacts)")(
      { val r = G.randomWalks(full10, "ua", "ub", 2, 4)
        r.agg(count(lit(1))).head.getLong(0) })
    val rebuild2 = t("rebuild 2nd")(
      { val r = G.randomWalks(full10, "ua", "ub", 2, 4)
        r.agg(count(lit(1))).head.getLong(0) })
    println(s"DBG refresh1=$refresh1 refresh2=$refresh2 rebuild=$rebuild/$rebuild2")
    // phase split of one more refresh, by hand
    val affStarts = t("affStarts")(
      { val a = stored.join(changed.select("node"), Seq("node"))
          .select("start").distinct().localCheckpoint(true)
        println(s"DBG affStarts=${a.count()}"); a })
    t("keep count")(println("DBG keep=" +
      stored.join(affStarts, Seq("start"), "left_anti").count()))
  }
}
