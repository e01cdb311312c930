package graft

import graft.ext.{Dedup, EventAnalytics, Sketches}
import org.apache.spark.sql.functions._

/** Event-sequence analytics (ordered funnel, cohort retention) and the
  * round-12 dedup/sketch additions (soft weights, KMV containment). */
class EventAnalyticsSpec extends SparkSpec {

  private def ev(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "tss", "event_type")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_type"))
  }

  test("funnel: strict order enforced, greedy-earliest maximal, empty tails report") {
    val events = ev(
      // u1 completes in order
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      // u2: purchase BEFORE click — must stop at signup+click
      (2L, "2024-01-01 10:00:00", "signup"),
      (2L, "2024-01-01 10:30:00", "purchase"),
      (2L, "2024-01-01 11:00:00", "click"),
      // u3: greedy trap — the EARLIEST signup is followed by everything;
      // a non-greedy anchor (the 13:00 signup) would strand the click
      (3L, "2024-01-01 09:00:00", "signup"),
      (3L, "2024-01-01 13:00:00", "signup"),
      (3L, "2024-01-01 10:00:00", "click"),
      (3L, "2024-01-01 10:30:00", "purchase"),
      // u4 never signs up
      (4L, "2024-01-01 10:00:00", "click"),
      (4L, "2024-01-01 11:00:00", "purchase"))
    val got = EventAnalytics.funnel(events, Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "signup", 3L), (2L, "click", 3L), (3L, "purchase", 2L)),
      s"got $got")
    // equal timestamps do NOT satisfy the strict order
    val tied = ev((9L, "2024-01-01 10:00:00", "signup"),
      (9L, "2024-01-01 10:00:00", "click"))
    val g2 = EventAnalytics.funnel(tied, Seq("signup", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(g2 == Set(("signup", 1L), ("click", 0L)),
      s"strictly-after must exclude ties and the empty tail must still report: $g2")
  }

  test("windowed funnel: window binds on the endpoint span; a later anchor rescues a stale chain") {
    val H = 3600L * 1000000L // one hour in micros
    def run(rows: (Long, String, String)*) =
      EventAnalytics.funnelWindowed(
        ev(rows: _*).withColumn("event_id", unix_micros(col("ts"))),
        Seq("signup", "click", "purchase"), windowMicros = 2 * H)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // u1: full chain inside 2h; u2: same chain but the purchase lands
    // 2h01 after its signup anchor — level 3 must NOT count (level 2,
    // 30 min after anchor, still does)
    val a = run(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 10:30:00", "click"),
      (1L, "2024-01-01 11:30:00", "purchase"),
      (2L, "2024-01-01 10:00:00", "signup"),
      (2L, "2024-01-01 10:30:00", "click"),
      (2L, "2024-01-01 12:01:00", "purchase"))
    assert(a == Map(1L -> 2L, 2L -> 2L, 3L -> 1L), s"got $a")
    // a FRESH signup re-anchors: the first chain's window expires, but
    // the second signup+click pair brings the purchase back inside 2h —
    // greedy-from-earliest would miss this; the running-max DP must not
    val b = run(
      (3L, "2024-01-01 00:00:00", "signup"),
      (3L, "2024-01-01 00:10:00", "click"),
      (3L, "2024-01-01 09:00:00", "signup"),
      (3L, "2024-01-01 09:10:00", "click"),
      (3L, "2024-01-01 10:00:00", "purchase"))
    assert(b == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $b")
    // out-of-order steps never chain, window or not
    val c = run(
      (4L, "2024-01-01 10:00:00", "click"),
      (4L, "2024-01-01 10:30:00", "signup"),
      (4L, "2024-01-01 10:40:00", "purchase"))
    assert(c == Map(1L -> 1L, 2L -> 0L, 3L -> 0L), s"got $c")
  }

  test("funnel latency: per-user MIN chain span, band edges inclusive, overflow band, no phantom rows") {
    val H = 3600L * 1000000L
    def run(rows: (Long, String, String)*) =
      EventAnalytics.funnelLatency(
        ev(rows: _*).withColumn("event_id", unix_micros(col("ts"))),
        Seq("signup", "click", "purchase"), bandsMicros = Seq(1 * H, 6 * H))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = run(
      // u1: two chains — 5h via the early signup, 1h (exactly) via the
      // later one; the MIN (and the inclusive <= edge) must place it in
      // the 1h band
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-01 04:00:00", "signup"),
      (1L, "2024-01-01 04:30:00", "click"),
      (1L, "2024-01-01 05:00:00", "purchase"),
      // u2: only chain spans 5h30 -> 6h band
      (2L, "2024-01-01 00:00:00", "signup"),
      (2L, "2024-01-01 05:00:00", "click"),
      (2L, "2024-01-01 05:30:00", "purchase"),
      // u3: completes in 20h -> overflow band (-1)
      (3L, "2024-01-01 00:00:00", "signup"),
      (3L, "2024-01-01 10:00:00", "click"),
      (3L, "2024-01-01 20:00:00", "purchase"),
      // u4: never purchases -> absent
      (4L, "2024-01-01 00:00:00", "signup"),
      (4L, "2024-01-01 00:30:00", "click"))
    assert(got == Map(1 * H -> 1L, 6 * H -> 1L, -1L -> 1L), s"got $got")
  }

  test("property: windowed funnel + latency DP equal brute-force chain search on random streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val steps = Vector("a", "b", "c")
    val W = 50L
    val bands = Seq(10L, 30L)
    val eventsGen: Gen[Seq[(Long, Long, Long, String)]] = for {
      nUsers <- Gen.choose(1, 3)
      n <- Gen.choose(1, 24)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(0, nUsers - 1)
        t <- Gen.choose(0L, 120L) // small range -> tie collisions
        ty <- Gen.oneOf("a", "b", "c", "noise")
      } yield (u.toLong, t, ty))
    } yield rows.zipWithIndex.map { case ((u, t, ty), id) =>
      (u, t, id.toLong, ty)
    }
    // brute force: max level over ALL strictly-(t,id)-increasing chains
    // matching the step prefix with endpoint span <= W; min span of full
    // chains. Exponential, fine at n <= 12.
    def brute(rows: Seq[(Long, Long, Long, String)])
        : (Map[Int, Long], Map[Long, Long]) = {
      val byUser = rows.groupBy(_._1)
      val reach = scala.collection.mutable.Map.empty[Long, Int]
      val best = scala.collection.mutable.Map.empty[Long, Long]
      byUser.foreach { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3)).toVector
        def chains(level: Int, fromIdx: Int, anchor: Long): Unit = {
          if (level > 0) {
            val lvlReached = level
            // window binds on the endpoint: the level event that got us
            // here is sorted(fromIdx - 1)
            val endT = sorted(fromIdx - 1)._2
            if (level == 1 || endT - anchor <= W)
              reach(u) = math.max(reach.getOrElse(u, 0), lvlReached)
            if (level == steps.size)
              best(u) = math.min(best.getOrElse(u, Long.MaxValue), endT - anchor)
          }
          if (level < steps.size)
            (fromIdx until sorted.size).foreach { i =>
              if (sorted(i)._4 == steps(level))
                chains(level + 1, i + 1, if (level == 0) sorted(i)._2 else anchor)
            }
        }
        chains(0, 0, 0L)
      }
      val perStep = (1 to steps.size).map(i =>
        i -> reach.values.count(_ >= i).toLong).toMap
      val hist = best.toSeq.map { case (_, s) =>
        bands.find(s <= _).getOrElse(-1L)
      }.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
      (perStep, hist)
    }
    import spark.implicits._
    (0 until 30).foreach { i =>
      val rows = eventsGen.pureApply(Gen.Parameters.default, Seed(1234L + i))
      val df = rows.toDF("user_id", "t", "event_id", "event_type")
        .select(col("user_id"), timestamp_micros(col("t")).as("ts"),
          col("event_id"), col("event_type"))
      val (wantReach, wantHist) = brute(rows)
      val gotReach = EventAnalytics.funnelWindowed(df, steps, W)
        .collect().map(r => (r.getLong(0).toInt, r.getLong(2))).toMap
      assert(gotReach == wantReach,
        s"sample $i: windowed reach $gotReach != brute $wantReach for $rows")
      val gotHist = EventAnalytics.funnelLatency(df, steps, bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(gotHist == wantHist,
        s"sample $i: latency hist $gotHist != brute $wantHist for $rows")
    }
  }

  test("event paths: adjacency (not subsequence), per-hop gap bound, cross-user isolation") {
    val H = 3600L * 1000000L
    def run(rows: (Long, String, String)*) =
      EventAnalytics.eventPaths(
        ev(rows: _*).withColumn("event_id", unix_micros(col("ts"))),
        maxGapMicros = H)
        .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)),
          r.getLong(3))).toMap
    val got = run(
      // u1: a->b->c and the overlapping b->c->a (sliding triples)
      (1L, "2024-01-01 10:00:00", "a"),
      (1L, "2024-01-01 10:10:00", "b"),
      (1L, "2024-01-01 10:20:00", "c"),
      (1L, "2024-01-01 10:30:00", "a"),
      // u2: a->X->c — the intervening X breaks a,?,c adjacency
      (2L, "2024-01-01 10:00:00", "a"),
      (2L, "2024-01-01 10:10:00", "x"),
      (2L, "2024-01-01 10:20:00", "c"),
      // u3: second hop exceeds the 1h gap — no triple
      (3L, "2024-01-01 10:00:00", "a"),
      (3L, "2024-01-01 10:30:00", "b"),
      (3L, "2024-01-01 12:00:00", "c"))
    assert(got == Map(("a", "b", "c") -> 1L, ("b", "c", "a") -> 1L,
      ("a", "x", "c") -> 1L), s"got $got")
    // u1's last pair + u2's first event must NOT chain across users
    assert(!got.keySet.exists { case (a, b, c) => Seq(a, b, c).contains("x") &&
      (a, b, c) != ("a", "x", "c") }, s"cross-user leakage: $got")
  }

  test("attribution: last touch wins, lookback gates, ties break on event id, revenue partitions") {
    import spark.implicits._
    val events = Seq(
      // u1: view then click then purchase -> click (last touch)
      (1L, "2024-01-01 09:00:00", 1L, "view", 0.0),
      (1L, "2024-01-01 10:00:00", 2L, "click", 0.0),
      (1L, "2024-01-01 11:00:00", 3L, "purchase", 100.0),
      // u2: only touch is 7h old -> outside the 6h lookback -> (none)
      (2L, "2024-01-01 03:00:00", 4L, "view", 0.0),
      (2L, "2024-01-01 10:00:00", 5L, "purchase", 50.0),
      // u3: click and view at the SAME ts — larger event id (view) wins
      (3L, "2024-01-01 10:00:00", 6L, "click", 0.0),
      (3L, "2024-01-01 10:00:00", 7L, "view", 0.0),
      (3L, "2024-01-01 10:30:00", 8L, "purchase", 25.0),
      // u4: no touches at all -> (none)
      (4L, "2024-01-01 10:00:00", 9L, "purchase", 10.0))
      .toDF("user_id", "tss", "event_id", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_id"), col("event_type"), col("value"))
    val got = EventAnalytics.attributionLastTouch(events, "purchase",
      Seq("click", "view"), lookbackSec = 21600L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map("click" -> (1L, 100.0), "view" -> (1L, 25.0),
      "(none)" -> (2L, 60.0)), s"got $got")
    // the report PARTITIONS total revenue — nothing dropped or doubled
    assert(got.values.map(_._2).sum == 185.0)
  }

  test("fixture laws: funnel drop-off is monotone; retention offset-0 sums to the user count") {
    val events = graft.sources.Tables.events(spark, sf)
    val f = EventAnalytics.funnel(events, SparkEntryEvt.FunnelSteps)
      .collect().sortBy(_.getLong(0)).map(_.getLong(2))
    assert(f.zip(f.tail).forall { case (a, b) => a >= b },
      s"completion counts must not increase down the funnel: ${f.toSeq}")
    val r = EventAnalytics.retentionCohorts(events)
    val cohortTotal = r.where(col("day_offset") === 0)
      .agg(sum("n_active")).collect().head.getLong(0)
    val users = events.select("user_id").distinct().count()
    assert(cohortTotal == users,
      s"offset-0 cells must partition the user base: $cohortTotal vs $users")
  }

  test("retention: offset 0 is cohort size; later offsets count distinct active users") {
    val events = ev(
      // cohort Jan-1: u1 active d0,d1; u2 active d0,d2 (twice that day)
      (1L, "2024-01-01 10:00:00", "view"), (1L, "2024-01-02 10:00:00", "view"),
      (2L, "2024-01-01 23:59:59", "view"), (2L, "2024-01-03 00:00:01", "view"),
      (2L, "2024-01-03 15:00:00", "view"),
      // cohort Jan-2: u3
      (3L, "2024-01-02 05:00:00", "view"))
    val got = EventAnalytics.retentionCohorts(events)
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L)), s"got $got")
  }

  test("soft dedup: each duplicate class renormalizes to ~unit mass; NULL text excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "unique"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val w = Dedup.softWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L), s"NULL text must not report: $w")
    assert(w(1L) == (3L, 333333L) && w(2L) == w(1L) && w(3L) == w(1L))
    assert(w(4L) == (1L, 1000000L))
    // class mass: 3 * 333333 = 999999 ppm (floor division — never OVER unit)
    assert(w(1L)._2 * 3 <= 1000000L)
  }

  test("KMV containment: a contained subset scores full containment but low Jaccard") {
    import spark.implicits._
    // group 0 = {0..199}, group 1 = {0..19} (strict subset, 10%)
    val items = (spark.range(200).select(lit(0L).as("g"), col("id").as("h")))
      .unionByName(spark.range(20).select(lit(1L).as("g"), col("id").as("h")))
    val k = 64
    val kmv = Sketches.kmvTable(items, col("h"), "g", k)
    val est = Sketches.kmvPairContainment(kmv, "g", k).collect().head
    val exact = Sketches.pairContainmentExact(items, "g").collect().head
    // exact: C(B in A) = 20/20 = 100%, C(A in B) = 20/200 = 10%
    assert(exact.getAs[Long]("exact_contain_b_ppm") == 1000000L)
    assert(exact.getAs[Long]("exact_contain_a_ppm") == 100000L)
    // estimate: the sampled sides must agree within KMV error (k=64)
    val eb = est.getAs[Long]("est_contain_b_ppm")
    val ea = est.getAs[Long]("est_contain_a_ppm")
    assert(eb > 750000L, s"subset side must estimate near-full containment: $eb")
    assert(ea < 350000L, s"superset side must estimate low containment: $ea")
  }

  test("activeUsers: dau exact; rolling window unions the trailing days only") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "click"),
      (2L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-02 10:00:00", "click"),
      // day 3 empty; u3 appears alone on day 4
      (3L, "2024-01-04 10:00:00", "click"),
      // duplicate (day, user) must not double-count
      (3L, "2024-01-04 23:00:00", "click"))
    val got = EventAnalytics.activeUsers(events, windowDays = 2)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      "2024-01-01" -> ((2L, 2L)), // {u1,u2} both dau and 2-day window
      "2024-01-02" -> ((1L, 2L)), // dau {u1}; window day1-2 = {u1,u2}
      "2024-01-04" -> ((1L, 1L))), // empty day 3 not reported, not counted
      s"got $got")
    intercept[IllegalArgumentException] {
      EventAnalytics.activeUsers(events, windowDays = 0)
    }
  }

  test("activeUsersHll: at toy cardinality the sketch path equals the exact expansion") {
    // HLL is exact far below 2^lgK registers, so the day-sketch merge
    // must reproduce the exact path's dau AND rolling numbers here —
    // the law that makes it a drop-in wide-window replacement
    val events = ev(
      (1L, "2024-01-01 10:00:00", "click"),
      (2L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-02 10:00:00", "click"),
      (3L, "2024-01-04 10:00:00", "click"),
      (3L, "2024-01-04 23:00:00", "click"))
    val exact = EventAnalytics.activeUsers(events, windowDays = 2)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val est = EventAnalytics.activeUsersHll(events, windowDays = 2)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(est.keySet == exact.keySet, "same event-bearing days reported")
    est.foreach { case (d, (dauExact, dauEst, rollEst)) =>
      assert((dauExact, dauEst, rollEst) ==
        ((exact(d)._1, exact(d)._1, exact(d)._2)), s"day $d")
    }
  }

  test("anomalousDays flags exactly the spike day, never the flat user") {
    import spark.implicits._
    import graft.ext.EventAnalytics
    def ev(u: Long, day: Int, v: Double, id: Long) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), u, "e", v)
    // user 1: 10.0 on nine days, 500.0 on day 10 (avg 59 → spike > 3x avg)
    // user 2: flat 50.0 across ten days (no day can exceed 3x its own avg)
    val rows = (1 to 9).map(d => ev(1L, d, 10.0, d.toLong)) ++
      Seq(ev(1L, 10, 500.0, 10L)) ++
      (1 to 10).map(d => ev(2L, d, 50.0, 100L + d))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventAnalytics.anomalousDays(df, factor = 3).collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
    assert(got.head.getTimestamp(1).toString.startsWith("2024-01-10"))
    assert(got.head.getDouble(3) == 500.0 && got.head.getLong(4) == 10L)
    // boundary exactness (strict >): two equal days at factor 1 sit
    // EXACTLY at the average — decimal arithmetic must exclude both,
    // where a double ratio could flip either way
    val boundary = Seq(ev(3L, 1, 10.0, 201L), ev(3L, 2, 10.0, 202L))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventAnalytics.anomalousDays(boundary, factor = 1).collect().isEmpty,
      "a day exactly at the average must not flag")
  }
}
