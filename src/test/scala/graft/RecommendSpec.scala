package graft

import graft.ext.Recommend

/** Market-basket rules and neighborhood-vote recommendations against
  * hand-computed and brute-force folds: the exact-ppm contract means the
  * engine must reproduce every scored rule bit-identically, on any
  * partitioning — which is what lets the DuckDB oracle replay them. */
class RecommendSpec extends SparkSpec {
  import spark.implicits._

  private def rules(baskets: Seq[(Long, Long)], minSupport: Long,
                    maxItems: Long = Recommend.DefaultMaxBasketItems,
                    parts: Int = 5): Map[(Long, Long), (Long, Long, Long, Long)] =
    Recommend.basketRules(baskets.toDF("bk", "it").repartition(parts),
        "bk", "it", minSupport, maxItems)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("basketRules: hand-checked support/confidence/lift in exact ppm") {
    // baskets: b1={A,B,C} b2={A,B} b3={A,C} b4={B,D}; items A=1 B=2 C=3 D=4
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L),
      (4L, 2L), (4L, 4L))
    val got = rules(baskets, minSupport = 2)
    // frequent unordered pairs: AB (b1,b2), AC (b1,b3); BC/BD/AD have
    // support 1 and fall to the floor. nB=4, nA=3, nBmarg=3, nC=2.
    assert(got.keySet == Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)))
    // A→B: n_ab=2, support=2·10⁶/4, conf=2·10⁶/3, lift=2·4·10⁶/(3·3)
    assert(got((1L, 2L)) == ((2L, 500000L, 666666L, 888888L)))
    // B→A: same pair, denominator swaps to n_B=3 — here symmetric
    assert(got((2L, 1L)) == ((2L, 500000L, 666666L, 888888L)))
    // A→C: conf=2·10⁶/3; C→A: conf=2·10⁶/2 = 10⁶ (C only appears with A)
    assert(got((1L, 3L)) == ((2L, 500000L, 666666L, 1333333L)))
    assert(got((3L, 1L)) == ((2L, 500000L, 1000000L, 1333333L)))
  }

  test("basketRules: duplicate (basket, item) rows collapse before counting") {
    val base = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    assert(rules(base ++ base ++ base, minSupport = 2) ==
      rules(base, minSupport = 2))
  }

  test("basketRules: a mega-basket is excluded from counts AND the denominator") {
    val normal = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    // basket 9 holds 5 items incl. the frequent pair — over a cap of 4
    val mega = (1L to 5L).map(i => (9L, i))
    val got = rules(normal ++ mega, minSupport = 2, maxItems = 4)
    val plain = rules(normal, minSupport = 2, maxItems = 4)
    assert(got == plain,
      "the capped basket must not contribute pairs, marginals, or a " +
        "denominator slot — rules over the retained baskets only")
    // and with the cap lifted it counts: support rises from 2 to 3
    assert(rules(normal ++ mega, minSupport = 2, maxItems = 64)
      .apply((1L, 2L))._1 == 3L)
  }

  private def rulesFrom(base: Seq[(Long, Long)], delta: Seq[(Long, Long)],
                        minSupport: Long,
                        maxItems: Long = Recommend.DefaultMaxBasketItems)
  : Map[(Long, Long), (Long, Long, Long, Long)] = {
    val b = base.toDF("bk", "it")
    Recommend.basketRulesFrom(
        Recommend.pairCountsOf(Recommend.keptOf(b, "bk", "it", maxItems)),
        Recommend.itemCountsOf(Recommend.keptOf(b, "bk", "it", maxItems)),
        Recommend.basketSizesOf(b, "bk", "it"),
        delta.toDF("bk", "it"), "bk", "it", minSupport, maxItems)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
  }

  test("basketRulesFrom: delta refresh equals the full rebuild on random splits") {
    val rnd = new scala.util.Random(909)
    for (trial <- 1 to 3) {
      val all = Seq.fill(300)(((rnd.nextInt(50) + trial * 100).toLong,
        rnd.nextInt(12).toLong)).distinct
      val (base, delta) = all.partition { case (bk, _) => bk % 10 != 0 }
      assert(rulesFrom(base, delta, minSupport = 2) ==
        rules(all, minSupport = 2), s"trial $trial")
    }
  }

  test("basketRulesFrom: an arriving batch promotes a sub-floor pair across the support floor") {
    // base: pair (1,2) co-occurs once — below floor 2, but the UNFLOORED
    // stored index retains it; the delta's second co-occurrence must
    // surface the rule WITHOUT any base rescan
    val base = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L))
    val delta = Seq((10L, 1L), (10L, 2L))
    val got = rulesFrom(base, delta, minSupport = 2)
    assert(got.keySet == Set((1L, 2L), (2L, 1L)))
    assert(got == rules(base ++ delta, minSupport = 2))
    // and the base alone serves no rule (floor sanity)
    assert(rules(base, minSupport = 2).isEmpty)
  }

  test("basketRulesFrom: a chunked arrival (existing basket id) refuses loudly") {
    val base = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    // basket 1 arrives AGAIN with a new item: the cross-chunk pairs
    // (1,3)x(1,1)... are invisible to the composition — must throw
    val chunked = Seq((1L, 3L))
    intercept[IllegalArgumentException] {
      rulesFrom(base, chunked, minSupport = 1)
    }
    // disjoint ids with the same ITEMS are fine (items are shared keys,
    // baskets are the additivity unit)
    assert(rulesFrom(base, Seq((9L, 1L), (9L, 2L)), minSupport = 1).nonEmpty)
  }

  test("basketRules: partitioning does not change any scored rule") {
    val rnd = new scala.util.Random(42)
    val baskets = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(15).toLong))
    assert(rules(baskets, 2, parts = 1) == rules(baskets, 2, parts = 7))
  }

  /** Brute-force neighborhood vote (the engine's documented semantics). */
  private def refRecs(simEdges: Seq[(Long, Long)], owned: Seq[(Long, Long)],
                      k: Int): Set[(Long, Long, Long, Long)] = {
    val nbrs = (simEdges ++ simEdges.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2) }
    val own = owned.toSet
    val byUser = owned.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    nbrs.toSeq.flatMap { case (u, ns) =>
      val votes = ns.flatMap(n => byUser.getOrElse(n, Nil))
        .filterNot(i => own((u, i)))
        .groupBy(identity).map { case (i, vs) => (i, vs.size.toLong) }.toSeq
      votes.sortBy { case (i, v) => (-v, i) }.zipWithIndex.take(k)
        .map { case ((i, v), idx) => (u, i, v, idx + 1L) }
    }.toSet
  }

  private def recs(simEdges: Seq[(Long, Long)], owned: Seq[(Long, Long)],
                   k: Int, parts: Int = 5): Set[(Long, Long, Long, Long)] =
    Recommend.neighborVoteRecs(
        simEdges.toDF("ua", "ub").repartition(parts), "ua", "ub",
        owned.toDF("u", "i").repartition(parts), "u", "i", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("neighborVoteRecs: owned items never recommended; votes count distinct neighbors") {
    // similarity: 1-2, 2-3; ownership: 1:{10} 2:{10,11} 3:{12}
    val sim = Seq((1L, 2L), (2L, 3L))
    val owned = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L))
    val got = recs(sim, owned, k = 5)
    assert(got == Set(
      (1L, 11L, 1L, 1L), // from neighbor 2; 10 is owned by 1 itself
      (2L, 12L, 1L, 1L), // from neighbor 3; 10 is owned by 2 itself
      // user 3's neighbor 2 offers both 10 and 11 at one vote each:
      // the tie ranks by item ascending
      (3L, 10L, 1L, 1L), (3L, 11L, 1L, 2L)), s"got $got")
    assert(got == refRecs(sim, owned, 5))
  }

  test("neighborVoteRecs: deterministic tie-break (votes desc, then item asc) under top-k") {
    // user 1's two neighbors both own {20, 21}: tie at 2 votes each —
    // k=1 must pick item 20, never 21, on any partitioning
    val sim = Seq((1L, 2L), (1L, 3L))
    val owned = Seq((2L, 20L), (2L, 21L), (3L, 20L), (3L, 21L))
    for (parts <- Seq(1, 7)) {
      val got = recs(sim, owned, k = 1, parts)
      assert(got.filter(_._1 == 1L) == Set((1L, 20L, 2L, 1L)), s"parts=$parts: $got")
    }
  }

  test("neighborVoteRecs matches brute force on pseudo-random data") {
    val rnd = new scala.util.Random(1007)
    val sim = Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a < b }.distinct
    val owned = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(30).toLong + 100))
      .distinct
    assert(recs(sim, owned, k = 3) == refRecs(sim, owned, 3))
    assert(recs(sim, owned, k = 3, parts = 1) == refRecs(sim, owned, 3))
  }

  private def raRecs(edges: Seq[(Long, Long)], k: Int,
                     parts: Int = 5): Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    Recommend.resourceAllocationRecs(
        edges.toDF("ua", "ub").repartition(parts), "ua", "ub", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  /** Driver-side replica of the resource-allocation scorer. */
  private def refRa(edges: Seq[(Long, Long)], k: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val sym = (edges ++ edges.map(_.swap)).distinct
    val nbrs = sym.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).toSet }
    val deg = nbrs.view.mapValues(_.size.toLong).toMap
    val out = for {
      (u, ns) <- nbrs.toSeq
      w <- nbrs.keys if w != u && !ns.contains(w)
      shared = ns & nbrs(w) if shared.nonEmpty
    } yield (u, w, shared.size.toLong,
      shared.toSeq.map(z => 1000000L / deg(z)).sum)
    out.groupBy(_._1).flatMap { case (_, cands) =>
      cands.sortBy { case (_, w, _, ra) => (-ra, w) }.take(k)
        .zipWithIndex.map { case ((u, w, cn, ra), i) => (u, w, cn, ra, i + 1L) }
    }.toSet
  }

  test("resourceAllocationRecs: path endpoints predict each other through the shared middle") {
    // 1-2-3: the only missing link with a common neighbor is (1,3) via 2
    // (deg 2) — score 10⁶ DIV 2, both directions, rank 1
    val got = raRecs(Seq((1L, 2L), (2L, 3L)), k = 5)
    assert(got == Set((1L, 3L, 1L, 500000L, 1L), (3L, 1L, 1L, 500000L, 1L)))
  }

  test("resourceAllocationRecs: 4-cycle opposites share TWO neighbors, scores add") {
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val got = raRecs(c4, k = 5)
    assert(got == Set((1L, 3L, 2L, 1000000L, 1L), (3L, 1L, 2L, 1000000L, 1L),
      (2L, 4L, 2L, 1000000L, 1L), (4L, 2L, 2L, 1000000L, 1L)))
  }

  test("resourceAllocationRecs: rare bridges outscore hubs (the measure's point)") {
    // u=1 reaches 6 via hub 2 (degree 4) and 7 via rare bridge 3
    // (degree 2): the rare-bridge candidate must rank first
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (2L, 6L), (3L, 7L))
    val got = raRecs(g, k = 2).filter(_._1 == 1L)
    assert(got == Set((1L, 7L, 1L, 500000L, 1L), (1L, 4L, 1L, 250000L, 2L)))
  }

  test("resourceAllocationRecs matches the reference fold on pseudo-random graphs, any partitioning") {
    val rnd = new scala.util.Random(2203)
    val edges = Seq.fill(70)((rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
      .filter { case (a, b) => a < b }.distinct
    val expected = refRa(edges, 4)
    assert(raRecs(edges, k = 4, parts = 7) == expected)
    assert(raRecs(edges, k = 4, parts = 1) == expected,
      "partitioning must not change predictions")
  }

  test("resourceAllocationRecs: the wedge valve refuses an over-budget join loudly") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    intercept[IllegalArgumentException] {
      raRecs(k4.toSeq, k = 2) // fine at the default bound
      import spark.implicits._
      Recommend.resourceAllocationRecs(k4.toDF("ua", "ub"), "ua", "ub",
        k = 2, maxWedges = 3).collect()
    }
  }
}
