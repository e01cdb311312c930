package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def tsDf(rows: Seq[(String, Long, Long)], t: String, id: String) =
    rows.toDF("k", "__sec", id)
      .select(col("k"), timestamp_seconds(col("__sec")).as(t), col(id))

  test("asofLastBefore: inclusive match, ties, and no-match nulls") {
    val left = tsDf(Seq(("k1", 10L, 100L), ("k1", 20L, 101L), ("k2", 5L, 102L)), "ts", "lid")
    val right = tsDf(Seq(("k1", 5L, 1L), ("k1", 10L, 2L), ("k1", 10L, 3L), ("k1", 15L, 4L)),
      "rts", "rid")
    val out = TemporalJoins.asofLastBefore(left, right, Seq("k"), "ts", "rts", "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // left@10: right rows at t=10 win over t=5 (inclusive); rid 3 beats 2 (tie)
    assert(out(100L).contains(3L))
    // left@20: most recent is t=15
    assert(out(101L).contains(4L))
    // k2 has no right rows at all -> null payload, row still present
    assert(out(102L).isEmpty)
  }

  test("asofLastBefore: plan has no join operator, one partition exchange") {
    val left = tsDf(Seq(("k1", 10L, 100L)), "ts", "lid")
    val right = tsDf(Seq(("k1", 5L, 1L)), "rts", "rid")
    val plan = TemporalJoins.asofLastBefore(left, right, Seq("k"), "ts", "rts", "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    // the whole operator costs ONE hash-partition of the unioned sides —
    // the tiebreak rides the window sort instead of a second shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }

  test("rangeCount: bin-boundary windows, zero-match rows, exact bounds") {
    // window [t-10s, t): right at t-10 included, right at t excluded
    val left = tsDf(Seq(("k1", 100L, 1L), ("k1", 1000L, 2L), ("k2", 100L, 3L)), "ts", "lid")
    val right = tsDf(Seq(
      ("k1", 90L, 0L),   // == lower bound, included
      ("k1", 95L, 0L),   // strictly inside; in the NEXT bin of 90 (bin width 10)
      ("k1", 100L, 0L),  // == upper bound, excluded
      ("k1", 89L, 0L),   // below window
      ("k2", 999L, 0L)), "rts", "rid")
    val out = TemporalJoins.rangeCount(left, right.select("k", "rts"), Seq("k"),
        "ts", "rts", lowerSec = -10, upperSec = 0, leftIdCols = Seq("lid"), outCol = "n")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("asofFirstAfter and maxGap: forward direction, staleness bound") {
    val left = tsDf(Seq(("k1", 10L, 100L), ("k1", 50L, 101L)), "ts", "lid")
    val right = tsDf(Seq(("k1", 10L, 1L), ("k1", 20L, 2L), ("k1", 9L, 3L)), "rts", "rid")
    val fwd = TemporalJoins.asofFirstAfter(left, right, Seq("k"), "ts", "rts", "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // left@10 matches the inclusive rt=10; left@50 has nothing after it
    assert(fwd == Map(100L -> Some(1L), 101L -> None))
    // staleness bound: a backward match farther than maxGap is dropped
    val gated = TemporalJoins.asofLastBefore(left, right, Seq("k"), "ts", "rts", "rid",
        maxGapSec = Some(5L))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // left@10 matches rt=10 (gap 0); left@50's nearest is rt=20 (gap 30 > 5)
    assert(gated == Map(100L -> Some(1L), 101L -> None))
  }

  test("property: asof and rangeCount match a brute-force reference on random events") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val keys = Vector("a", "b", "c")
      val lefts = (1 to 40).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(1000).toLong, i.toLong))
      val rights = (1 to 120).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(1000).toLong, 1000L + i))
      val lDf = lefts.toDF("k", "__sec", "lid")
        .select(col("k"), timestamp_seconds(col("__sec")).as("ts"), col("lid"))
      val rDf = rights.toDF("k", "__sec", "rid")
        .select(col("k"), timestamp_seconds(col("__sec")).as("rts"), col("rid"))

      val asofGot = TemporalJoins.asofLastBefore(lDf, rDf, Seq("k"), "ts", "rts", "rid")
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      val asofExp = lefts.map { case (k, lt, lid) =>
        val cands = rights.filter(r => r._1 == k && r._2 <= lt)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(asofGot == asofExp)

      val rangeGot = TemporalJoins.rangeCount(lDf, rDf.select("k", "rts"), Seq("k"),
          "ts", "rts", lowerSec = -50, upperSec = 0, leftIdCols = Seq("lid"), outCol = "n")
        .as[(Long, Long)].collect().toMap
      val rangeExp = lefts.map { case (k, lt, lid) =>
        lid -> rights.count(r => r._1 == k && r._2 >= lt - 50 && r._2 < lt).toLong
      }.toMap
      assert(rangeGot == rangeExp)
    }
  }

  test("rangeCount: plans a hash/merge join, never a nested loop") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.where(col("event_type") === "purchase").select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.where(col("event_type") === "click").select(col("user_id"), col("ts"))
    val plan = TemporalJoins.rangeCount(p, c, Seq("user_id"), "ts", "ts",
      -3600, 0, Seq("event_id"), "n").queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must stay an equi-join:\n$plan")
  }
}
