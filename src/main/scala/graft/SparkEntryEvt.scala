package graft

import graft.ext.{Audit, Dedup, EventAnalytics, Graph, Recommend, Sketches, Skyline}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fifth query batch: event-sequence analytics (ordered funnel, cohort
  * retention) and soft dedup — round-12 extensions, all with fully
  * re-deriving integer DuckDB oracles. */
object SparkEntryEvt {

  /** The funnel under test: acquisition → engagement → conversion over
    * the events fixture's type vocabulary. Shared with the oracle so the
    * two sides can never measure different funnels. */
  private[graft] val FunnelSteps = Seq("signup", "click", "purchase")

  /** Conversion window for the windowed funnel: 24 h in micros, shared
    * with the oracle. */
  private[graft] val FunnelWindowMicros = 86400000000L

  /** Latency bands for the time-to-convert histogram: 1 h / 6 h / 24 h
    * in micros (ascending), shared with the oracle. */
  private[graft] val LatencyBandsMicros =
    Seq(3600000000L, 21600000000L, 86400000000L)

  /** PageRank iteration count — shared with the oracle's unrolled CTEs. */
  private[graft] val PageRankIters = 3
  /** Hub cap for the degree-capped census: sits in the fixture's p90–p99
    * part-degree band at sf0.01 (max 49, p90 37, p99 43), so the valve
    * demonstrably BINDS — some hubs are excluded and counted — while
    * leaving a non-trivial retained census to verify. */
  private[graft] val ButterflyCap = 40L

  /** Undirected customer↔part co-purchase graph, as a symmetrized edge
    * list with disjoint integer node ids (customer c → 2c, part p →
    * 2p+1). Shared (memoized + persisted) by every graph query: the
    * orders⋈lineitem distinct is one shuffle paid once per corpus, the
    * same derived-edge-table contract a cluster materializes at ingest. */
  private val edgesMemo = new graft.PlanMemo
  private def edgesOf(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cp = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = cp.union(cp.select(col("dst").as("src"), col("src").as("dst")))
    edgesMemo(sym, "cpEdges")(sym)
  }
  private[graft] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    edgesOf(Tables.orders(s, dir), Tables.lineitem(s, dir))
  /** The bipartite (customer, part) projection of the co-purchase
    * artifact — distinct BY CONSTRUCTION (the symmetric artifact holds
    * each undirected pair once per direction; the even-src filter keeps
    * exactly the customer→part direction of each). Memoized+persisted so
    * both census queries' metric branches scan one materialized relation. */
  private val bipMemo = new graft.PlanMemo
  private[graft] def bipartiteEdges(s: SparkSession, dir: String): DataFrame = {
    val cp = coPurchaseEdges(s, dir)
    bipMemo(cp, "bipEdges")(cp.where(col("src") % 2 === 0)
      .select(expr("src DIV 2").as("u"), expr("dst DIV 2").as("v")))
  }
  /** Minimum shared parts for the customer-projection edge (x_triangles):
    * two customers link only when they co-purchased at least this many
    * (capped-degree) parts. A raw one-shared-part projection of the
    * fixture is near-complete (sf0.01: 560 k pairs over ~1.5 k customers,
    * 82 M triangles — exact counting would be committing the cluster to
    * an Ω(triangles) join), so the threshold is what makes the projected
    * graph a GRAPH rather than a clique soup: ≥3 shared parts keeps
    * 57 k edges / 323 k triangles at sf0.01 — non-trivial but bounded.
    * Shared with the oracle's HAVING clause. */
  private[graft] val MinSharedParts = 3L

  /** Teleport segment for x_ppr: NATION_0's customers (55 at sf0.01, all
    * order-bearing, so the semi-join against the graph keeps them all).
    * Shared with the oracle's seed CTE. */
  private[graft] val PprSeedNation = 0L
  /** k for x_kcore over the projected customer graph: 40 sits where the
    * peel CASCADES at the fixtures (7 simultaneous-drop rounds to a
    * 961-vertex core at sf0.01) instead of converging in one sweep, so
    * the iterative semantics are actually exercised. Shared with the
    * oracle's unrolled WHERE. */
  private[graft] val KCoreK = 40L
  /** Oracle unroll depth for x_kcore: ≥ the engine's observed peel depth
    * (7 at sf0.01) with margin — peeling a CONVERGED core is the
    * identity, so extra unrolled rounds are no-ops and oracle rounds ≥
    * engine rounds replay exactly (the kCore contract). */
  private[graft] val KCoreOracleRounds = 10
  /** Pair-support floor for x_basket_rules: ≥2 co-occurrences keeps the
    * 3.4 k frequent pairs (of 116 k candidates) at sf0.01 — the floor
    * demonstrably BINDS while leaving a non-trivial rule set. */
  private[graft] val RulesMinSupport = 2L
  /** Top-k per user for x_copurchase_recs. */
  private[graft] val RecsTopK = 5
  /** x_skyline bucket width in cents ($500): puts ~200 buckets over the
    * lineitem price range and thins 60 k points to 48 near-frontier
    * survivors across 2 buckets at sf0.01 — the prune genuinely prunes
    * AND the residual same-bucket join is genuinely exercised. */
  private[graft] val SkylineBucketCents = 50000L
  /** HITS iterations — shared with the oracle's unrolled CTEs. */
  private[graft] val HitsIters = 3
  /** Synchronous LPA rounds for x_lpa_communities — a FIXED horizon (not
    * convergence detection) so the oracle replays the loop as this many
    * unrolled CTEs; shared with x_modularity, which scores the same
    * stored partition. */
  private[graft] val LpaRounds = 3
  /** Landmark set for the multi-source BFS: customers 0..3 (node ids
    * 2c). Four sweeps in one loop — the landmark-budget knob, shared
    * with the oracle's seed CTE. */
  private[graft] val LandmarkMaxCust = 4L

  /** The STORED basket-rules index — yesterday's unfloored pair counts,
    * item marginals and basket sizes over the 90%-of-orders base corpus
    * (the storedBaseRanks/storedBaseDists contract: the delta refresh's
    * operational premise is that these additive relations already exist
    * as tables). Keeping pairs UNFLOORED is what lets an arriving batch
    * promote a pair across the support floor without any rescan. */
  private val brPairsMemo = new graft.PlanMemo
  private val brItemsMemo = new graft.PlanMemo
  private val brSizesMemo = new graft.PlanMemo
  private def baseBasketRows(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).where(col("l_orderkey") % 10 =!= 0)
  private[graft] def storedBasketPairs(s: SparkSession, dir: String): DataFrame = {
    val base = baseBasketRows(s, dir)
    brPairsMemo(base, "brBasePairs")(Recommend.pairCountsOf(
      Recommend.keptOf(base, "l_orderkey", "l_partkey",
        Recommend.DefaultMaxBasketItems)))
  }
  private[graft] def storedBasketItems(s: SparkSession, dir: String): DataFrame = {
    val base = baseBasketRows(s, dir)
    brItemsMemo(base, "brBaseItems")(Recommend.itemCountsOf(
      Recommend.keptOf(base, "l_orderkey", "l_partkey",
        Recommend.DefaultMaxBasketItems)))
  }
  private[graft] def storedBasketSizes(s: SparkSession, dir: String): DataFrame = {
    val base = baseBasketRows(s, dir)
    brSizesMemo(base, "brBaseSizes")(Recommend.basketSizesOf(base,
      "l_orderkey", "l_partkey"))
  }

  /** The landmark-distance relation (source, node, dist) — memoized +
    * persisted like every derived artifact: x_landmarks reads it raw,
    * x_closeness aggregates it, one BFS loop serves both (at 100 TB the
    * landmark sweep is a stored table refreshed with the corpus). */
  private val lmMemo = new graft.PlanMemo
  private[graft] def landmarkDists(s: SparkSession, dir: String): DataFrame = {
    val e = coPurchaseEdges(s, dir)
    lmMemo(e, s"lmBfs$LandmarkMaxCust") {
      val seeds = Tables.customer(s, dir)
        .where(col("c_custkey") < LandmarkMaxCust)
        .select((col("c_custkey") * 2).as("lmid"))
      Graph.multiSourceBfs(e, "src", "dst", seeds, "lmid")
    }
  }

  /** The projected customer–customer co-purchase graph — the stored
    * derived-edge artifact the triangle census reads: the capped v-keyed
    * wedge join (the butterfly census's own bounded join: ≤ cap·|E|/2
    * candidate rows regardless of hub skew) aggregated per customer pair
    * and thresholded on shared-part support. Canonical (ua < ub) and
    * distinct BY CONSTRUCTION (groupBy output). Memoized+persisted:
    * built once per corpus version like the other edge artifacts. */
  private val projMemo = new graft.PlanMemo
  private[graft] def projectedCustomerEdges(s: SparkSession, dir: String): DataFrame = {
    val bip = bipartiteEdges(s, dir)
    projMemo(bip, "cpProjEdges") {
      val deg = bip.groupBy("v").agg(count(lit(1)).as("__d"))
      val kept = bip.join(deg.where(col("__d") <= ButterflyCap).select("v"), Seq("v"))
      kept.alias("a").join(kept.alias("b"),
          col("a.v") === col("b.v") && col("a.u") < col("b.u"))
        .groupBy(col("a.u").as("ua"), col("b.u").as("ub"))
        .agg(count(lit(1)).as("__w"))
        .where(col("__w") >= MinSharedParts)
        .select("ua", "ub")
    }
  }

  /** The stored community assignment — LPA labels over the projected
    * customer graph, memoized+persisted like the rank/distance artifacts
    * (at 100 TB the community table is refreshed with the corpus and
    * read by every downstream consumer): x_lpa_communities reads it raw,
    * x_modularity scores it, ONE propagation loop serves both. */
  private val lpaMemo = new graft.PlanMemo
  private[graft] def storedLpaLabels(s: SparkSession, dir: String): DataFrame = {
    val pe = projectedCustomerEdges(s, dir)
    lpaMemo(pe, s"lpa$LpaRounds")(
      Graph.labelPropagation(pe, "ua", "ub", LpaRounds))
  }

  /** Walk-corpus parameters for x_random_walks / x_walk_pairs: 2 walks
    * of 4 steps per start vertex — enough to exercise revisits and the
    * window-2 pair extraction while keeping the sf0.1 corpus ~150 k
    * rows. Shared with the oracle's unrolled step CTEs. */
  private[graft] val WalkN = 2
  private[graft] val WalkSteps = 4
  /** Degree-threshold ladder for x_rich_club: {32, 64, 128, 256} spans
    * the projected graph's degree distribution (median 64, p99 270 at
    * sf0.01), so the rich sets shrink ~{70%, 50%, 15%, 1.5%} — each rung
    * non-degenerate. Shared with the oracle's unnest. */
  private[graft] val RichClubKs: Seq[Long] = Seq(32L, 64L, 128L, 256L)

  /** Pair-support floor for x_walk_ppmi: ≥2 co-occurrences — a window-2
    * pair seen once carries no association signal, and the 1-count mass
    * (most of the relation) would drown the ranking in T/(c·x) noise.
    * Shared with the oracle. */
  private[graft] val WalkPpmiFloor = 2L

  /** The stored walk corpus — memoized+persisted off the projected edge
    * artifact (at 100 TB: the embeddings-pipeline table a nightly job
    * refreshes); x_random_walks reads it raw, x_walk_pairs derives the
    * skip-gram relation, ONE walk build serves both. */
  private val walkMemo = new graft.PlanMemo
  private val n2vMemo = new graft.PlanMemo
  private[graft] def storedWalks(s: SparkSession, dir: String): DataFrame = {
    val pe = projectedCustomerEdges(s, dir)
    walkMemo(pe, s"walks|$WalkN|$WalkSteps")(
      Graph.randomWalks(pe, "ua", "ub", WalkN, WalkSteps))
  }
  /** The stored skip-gram pair relation (x_walk_pairs' output, memoized —
    * the SGNS co-occurrence table x_walk_ppmi scores). */
  private[graft] def storedWalkPairs(s: SparkSession, dir: String): DataFrame = {
    val pe = projectedCustomerEdges(s, dir)
    walkMemo(pe, s"walkpairs|$WalkN|$WalkSteps")(
      Graph.walkPairs(storedWalks(s, dir), window = 2))
  }
  /** The BASE projected customer graph — the same capped/support-
    * thresholded projection chain over the 90%-of-orders base corpus
    * (the storedBaseRanks/storedBaseDists delta convention). Arriving
    * orders ADD projected edges (new shared support) and can also REMOVE
    * them — a part whose degree crosses [[ButterflyCap]] drops out of
    * `kept` and takes its support with it — so the base→full edge delta
    * is genuinely two-directional, exactly the no-monotonicity-premise
    * case [[Graph.walksFrom]] exists to absorb (contrast `ssspFrom`,
    * whose premise a detector must guard). */
  private val baseProjMemo = new graft.PlanMemo
  private[graft] def baseProjectedCustomerEdges(s: SparkSession,
                                                dir: String): DataFrame = {
    val cp = Tables.orders(s, dir).where(col("o_orderkey") % 10 =!= 0)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("v"))
      .distinct()
    baseProjMemo(cp, "cpProjEdgesBase") {
      val deg = cp.groupBy("v").agg(count(lit(1)).as("__d"))
      val kept = cp.join(deg.where(col("__d") <= ButterflyCap).select("v"),
        Seq("v"))
      kept.alias("a").join(kept.alias("b"),
          col("a.v") === col("b.v") && col("a.u") < col("b.u"))
        .groupBy(col("a.u").as("ua"), col("b.u").as("ub"))
        .agg(count(lit(1)).as("__w"))
        .where(col("__w") >= MinSharedParts)
        .select("ua", "ub")
    }
  }
  /** Yesterday's walk corpus — walks over the BASE projection, stored
    * (the delta refresh's operational premise). */
  private[graft] def storedBaseWalks(s: SparkSession, dir: String): DataFrame = {
    val basePe = baseProjectedCustomerEdges(s, dir)
    walkMemo(basePe, s"walksBase|$WalkN|$WalkSteps")(
      Graph.randomWalks(basePe, "ua", "ub", WalkN, WalkSteps))
  }

  /** Weighted co-purchase edges for the shortest-path family: weight =
    * 1 + min(l_quantity % 3) per (customer, part) pair — a deterministic
    * positive integer in {1,2,3} both engines re-derive exactly, small
    * enough that weighted distances stay tiny on the small-world graph
    * (oracle recursion stays bounded) while still exercising the
    * cheaper-longer-path cases BFS cannot see. The mod sits INSIDE the
    * min: min over per-row transforms is monotone under adding lineitems
    * (more rows can only lower it), which is what entitles the delta
    * refresh to treat base → full as pure additions + weight drops —
    * `1 + min(qty) % 3` would let an arriving order RAISE a weight
    * (min 3 → 2 flips wt 1 → 3) and silently void ssspFrom's
    * upper-bound premise. Memoized+persisted like the unweighted
    * artifact (ONE orders⋈lineitem agg per corpus). */
  private val wEdgesMemo = new graft.PlanMemo
  private def weightedEdgesOf(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cp = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      // floor BEFORE the integer cast pins the truncation semantics:
      // Spark's cast("long") truncates while DuckDB's CAST AS BIGINT
      // rounds half-even, so a non-integral quantity in a future fixture
      // would silently diverge engine vs oracle without the shared floor
      // (r14 advice; the oracle applies the same floor)
      .agg((lit(1) + min(floor(col("l_quantity")).cast("long") % 3)).as("wt"))
    val sym = cp.union(cp.select(col("dst").as("src"), col("src").as("dst"),
      col("wt")))
    wEdgesMemo(sym, "cpWeightedEdges")(sym)
  }
  private[graft] def weightedEdges(s: SparkSession, dir: String): DataFrame =
    weightedEdgesOf(Tables.orders(s, dir), Tables.lineitem(s, dir))
  /** The delta scenario's base WEIGHTED graph (same arriving-orders split
    * as [[baseEdges]]). Fewer orders can only RAISE a pair's min-quantity
    * weight or remove the pair, so going base → full is monotone
    * (additions + weight decreases) — exactly the regime where
    * [[graft.ext.Graph.ssspFrom]]'s composition is exact. */
  private[graft] def baseWeightedEdges(s: SparkSession, dir: String): DataFrame =
    weightedEdgesOf(Tables.orders(s, dir).where(col("o_orderkey") % 10 =!= 0),
      Tables.lineitem(s, dir))
  /** STORED base distances — yesterday's x_sssp output over the base
    * graph, the delta refresh's operational premise (the storedBaseRanks
    * contract). */
  private val distsMemo = new graft.PlanMemo
  private[graft] def storedBaseDists(s: SparkSession, dir: String): DataFrame = {
    val base = baseWeightedEdges(s, dir)
    distsMemo(base, "baseSssp")(Graph.sssp(base, "src", "dst", "wt", source = 0L))
  }
  /** The arriving edge batch for the SSSP refresh: new pairs plus pairs
    * whose weight dropped. Memoized — in deployment the delta ARRIVES
    * with the ingest (it is the changelog, not a computation); deriving
    * it here by diffing the two stored edge artifacts is fixture
    * machinery, so it is built once like any other stored relation
    * rather than re-diffed per execution. */
  private val wDeltaMemo = new graft.PlanMemo
  private[graft] def weightedDeltaEdges(s: SparkSession, dir: String): DataFrame = {
    val fullW = weightedEdges(s, dir)
    val baseW = baseWeightedEdges(s, dir)
    wDeltaMemo(fullW, "cpWeightedDelta")(
      fullW.join(
          baseW.select(col("src"), col("dst"), col("wt").as("__bw")),
          Seq("src", "dst"), "left")
        .where(col("__bw").isNull || col("wt") < col("__bw"))
        .select("src", "dst", "wt"))
  }
  /** Per-delta-version premise check for the SSSP refresh (the ER guard's
    * memo pattern): removed/raised arcs void ssspFrom's upper-bound
    * argument, so the refresh must refuse rather than compose a
    * silently-stale distance map. Memoized — a deployment pays the one
    * arc-keyed anti-scan once per arriving batch, not once per query. */
  private val ssspGuardMemo = new graft.PlanMemo

  /** The delta scenario's BASE graph: every 10th order's purchases have
    * not arrived yet (shared with the oracle's filtered CTE). */
  private[graft] def baseEdges(s: SparkSession, dir: String): DataFrame =
    edgesOf(Tables.orders(s, dir).where(col("o_orderkey") % 10 =!= 0),
      Tables.lineitem(s, dir))
  /** STORED base ranks — the operational premise of a delta refresh is
    * that the previous rank table exists (it was yesterday's x_pagerank
    * output); memoizing it through the artifact store makes the query
    * measure what a deployment pays — ONE warm-start iteration — instead
    * of silently re-running the base chain every execution. */
  private val ranksMemo = new graft.PlanMemo
  private[graft] def storedBaseRanks(s: SparkSession, dir: String): DataFrame = {
    val base = baseEdges(s, dir)
    ranksMemo(base, s"basePr$PageRankIters")(
      Graph.pageRank(base, "src", "dst", PageRankIters))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_bfs_levels" -> { (s, dir) =>
      // single-source BFS over the co-purchase graph from customer 0:
      // frontier-bounded iterative expansion (one join + distinct +
      // anti-join per round, each round checkpointed), O(E) total work;
      // the oracle re-derives every level with a recursive CTE. Unreached
      // nodes are absent on both sides.
      Graph.bfsLevels(coPurchaseEdges(s, dir), "src", "dst", source = 0L)
        .select(
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"),
          col("level"))
    },
    "x_rich_club" -> { (s, dir) =>
      // rich-club profile (Colizza et al. Nature Phys.'06): for each
      // degree threshold k in a fixed ladder, the density of the
      // subgraph induced by nodes of degree > k —
      // φ_ppm = 2·E_k·10⁶ DIV (N_k·(N_k−1)), exact integers (the
      // hub-interconnection gauge: φ rising with k = hubs form a club).
      // Fully relational over the ladder: degrees × ladder filter, the
      // edge list joined against the rich set on BOTH endpoints — ladder
      // size × |E| bounded, one pass, no per-k jobs.
      val pe = projectedCustomerEdges(s, dir)
      val deg = pe.select(col("ua").as("node"))
        .unionAll(pe.select(col("ub").as("node")))
        .groupBy("node").agg(count(lit(1)).as("__d"))
      val rich = deg.select(
          explode(array(RichClubKs.map(lit): _*)).as("k"),
          col("node"), col("__d"))
        .where(col("__d") > col("k"))
        .select("k", "node")
      val nk = rich.groupBy("k").agg(count(lit(1)).as("n_rich"))
      val ek = pe
        .join(rich.select(col("k"), col("node").as("ua")), Seq("ua"))
        .join(rich.select(col("k"), col("node").as("ub")), Seq("ub", "k"))
        .groupBy("k").agg(count(lit(1)).as("e_rich"))
      nk.join(ek, Seq("k"), "left")
        .select(col("k"), col("n_rich"),
          coalesce(col("e_rich"), lit(0L)).as("e_rich"))
        .withColumn("phi_ppm",
          expr("CASE WHEN n_rich > 1 THEN 2 * e_rich * 1000000 " +
            "DIV (n_rich * (n_rich - 1)) ELSE 0 END"))
    },
    "x_diameter" -> { (s, dir) =>
      // double-sweep diameter lower bound (Magnien-Latapy-Habib JEA'09):
      // BFS from customer 0, then BFS from the farthest vertex found —
      // the second eccentricity lower-bounds the true diameter and is
      // exact on trees. Two frontier-bounded BFS loops over the stored
      // co-purchase artifact; the two argmax picks are bounded driver
      // scalars off checkpointed distance relations (ties to lowest id
      // on both engines).
      val e = coPurchaseEdges(s, dir)
      val far1 = Graph.bfsLevels(e, "src", "dst", source = 0L)
        .orderBy(col("level").desc, col("node")).limit(1).head
      val (u, ecc0) = (far1.getLong(0), far1.getLong(1))
      val far2 = Graph.bfsLevels(e, "src", "dst", source = u)
        .orderBy(col("level").desc, col("node")).limit(1).head
      import s.implicits._
      Seq((0L, ecc0, u, far2.getLong(1), far2.getLong(0)))
        .toDF("sweep1_source", "ecc_source", "sweep2_source",
          "diameter_lb", "peripheral_node")
    },
    "x_sssp" -> { (s, dir) =>
      // weighted single-source shortest paths from customer 0: min-plus
      // relaxation with an improved-vertex frontier (checkpointed per
      // round, O(E) per round, rounds = weighted hop diameter); the
      // oracle re-derives every distance with a bounded recursive walk +
      // min. Exercises what BFS cannot: a 2-hop path of weight-1 edges
      // must beat a direct weight-3 edge.
      Graph.sssp(weightedEdges(s, dir), "src", "dst", "wt", source = 0L)
        .select(
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"),
          col("dist"))
    },
    "x_sssp_delta" -> { (s, dir) =>
      // incremental shortest paths: the arriving 10% of orders adds
      // co-purchase edges and cheapens existing ones (min-quantity can
      // only drop); the STORED base distances are refreshed by relaxing
      // through the CHANGED edges only, then propagating improvements
      // over the full edge list — delta-sized iterative work, exact by
      // min-plus monotonicity. Oracled against the full rebuild (the
      // delta == rebuild law, driver-red-able like x_er_delta).
      //
      // The monotonicity premise is CHECKED, not assumed (r14 item 1, the
      // capCrossings move one family over): ssspInvalidations surfaces
      // any base arc the delta removed or made heavier — changes the
      // refresh cannot retract (min-plus never raises a stale-low prior)
      // — and the query refuses loudly instead of composing a silently
      // wrong distance map. The fixture is safe by construction
      // (mod-inside-min monotonicity), so the memoized guard relation is
      // empty and reps read the cached emptiness, the x_er_delta shape.
      val fullW = weightedEdges(s, dir)
      val invalidations = ssspGuardMemo(fullW, "ssspInvalidations")(
        Graph.ssspInvalidations(baseWeightedEdges(s, dir), fullW,
          "src", "dst", "wt"))
      require(invalidations.isEmpty,
        "x_sssp_delta: the delta removed or raised base arcs — the refresh " +
          "cannot retract the prior's distances; rebuild with x_sssp instead")
      Graph.ssspFrom(storedBaseDists(s, dir), fullW,
          weightedDeltaEdges(s, dir), "src", "dst", "wt")
        .select(
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"),
          col("dist"))
    },
    "x_pagerank" -> { (s, dir) =>
      // damped PageRank over the co-purchase graph: per iteration one
      // src-keyed join + one dst-keyed agg (2 exchanges, map-side
      // combinable) — the Pregel superstep as a relational plan. Integer
      // fixed-point mass makes every iteration bit-reproducible in the
      // oracle's unrolled CTEs.
      Graph.pageRank(coPurchaseEdges(s, dir), "src", "dst", PageRankIters)
        .select(
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"),
          col("rank_scaled"))
    },
    "x_pagerank_weighted" -> { (s, dir) =>
      // edge-weighted importance walk over the SAME stored weighted-edge
      // artifact the SSSP family reads: mass splits ∝ purchase-derived
      // weight ((r·w) DIV Σw_out, all integer), 2 map-side-combinable
      // exchanges per iteration; a constant weight provably reduces to
      // the unweighted walk (GraphSpec pins the law)
      Graph.pageRankWeighted(weightedEdges(s, dir), "src", "dst", "wt",
          PageRankIters)
        .select(
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"),
          col("rank_scaled"))
    },
    "x_pagerank_delta" -> { (s, dir) =>
      // incremental maintenance: rank the 90%-of-orders base graph with
      // the full 3 iterations, then absorb the arriving 10% as ONE
      // warm-start refresh iteration over the full edge list — the
      // delta-index contract (x_index_delta / x_knn_ivf_delta) applied
      // to the iterative-graph family. GraphSpec proves the refresh
      // tracks the full rebuild strictly closer than a cold iteration.
      Graph.pageRankFrom(storedBaseRanks(s, dir), coPurchaseEdges(s, dir),
          "src", "dst", 1)
        .select(
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"),
          col("rank_scaled"))
    },
    "x_degree_stats" -> { (s, dir) =>
      // degree histogram per node class — the skew gauge that decides
      // salting/AQE settings for the iteration joins; output bounded by
      // the distinct degree count
      coPurchaseEdges(s, dir)
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .groupBy(when(col("src") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"), col("deg"))
        .agg(count(lit(1)).as("n_nodes"))
    },
    "x_anomaly_days" -> { (s, dir) =>
      // spend-spike report: days where a user ran >3x their own cross-day
      // average, decided division-free in exact decimal arithmetic
      EventAnalytics.anomalousDays(Tables.events(s, dir), factor = 3)
    },
    "x_funnel" -> { (s, dir) =>
      // ordered-funnel completion with greedy-earliest anchors: one row
      // per step including empty tails, so drop-off is directly readable
      EventAnalytics.funnel(Tables.events(s, dir), FunnelSteps)
    },
    "x_funnel_window" -> { (s, dir) =>
      // conversion-window funnel: completions only count when the whole
      // chain fits in 24h of its first-step anchor — the DP runs as
      // chained running-max window passes over one user-keyed sort
      EventAnalytics.funnelWindowed(Tables.events(s, dir), FunnelSteps,
        FunnelWindowMicros)
    },
    "x_funnel_latency" -> { (s, dir) =>
      // time-to-convert histogram: each completing user's MINIMUM chain
      // span (exact, via the same running-max anchor DP), bucketed into
      // 1h/6h/24h bands with an overflow band
      EventAnalytics.funnelLatency(Tables.events(s, dir), FunnelSteps,
        LatencyBandsMicros)
    },
    "x_event_paths" -> { (s, dir) =>
      // top-paths flow report: consecutive same-user event-type triples
      // with every hop within 30 min; output bounded by |types|^3
      EventAnalytics.eventPaths(Tables.events(s, dir),
        maxGapMicros = 1800000000L)
    },
    "x_attribution" -> { (s, dir) =>
      // last-touch revenue attribution with a 6h lookback: the as-of
      // join's staleness gate IS the lookback; unattributed purchases
      // land in the (none) bucket so revenue always partitions
      EventAnalytics.attributionLastTouch(Tables.events(s, dir),
        purchaseType = "purchase", touchTypes = Seq("click", "view"),
        lookbackSec = 21600L)
    },
    "x_retention" -> { (s, dir) =>
      // day-cohort retention triangle: (first-event day, day offset) ->
      // active users; offset 0 is cohort size by construction
      EventAnalytics.retentionCohorts(Tables.events(s, dir))
    },
    "x_dedup_soft" -> { (s, dir) =>
      // soft dedup: per-doc ppm sampling weight that renormalizes each
      // exact-duplicate class to unit mass instead of dropping copies
      Dedup.softWeights(Tables.documents(s, dir))
    },
    "x_drift_report" -> { (s, dir) =>
      // corpus-drift monitor: value histogram (width-25 buckets) of the
      // month's first half vs second half, per event type — one scan,
      // cross-multiplied integer L1 so no division touches the compare
      Audit.histogramDrift(Tables.events(s, dir), col("event_type"),
          floor(col("value") / lit(25.0)).cast("long"),
          dayofmonth(col("ts")) <= 15)
        .select(col("grp").as("event_type"), col("n_a"), col("n_b"),
          col("n_buckets"), col("l1_cross"))
    },
    "x_join_size_est" -> { (s, dir) =>
      // join-size estimation from ingest-time sketches: the CMS
      // inner-product upper bound for the events self-join on user_id
      // (= AMS F2) next to the exact Σc² — the cardinality gauge an
      // optimizer reads BEFORE committing the corpus to a shuffle
      val ev = Tables.events(s, dir)
      val cms = Sketches.cmsTable(ev, col("user_id"))
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c") * col("__c")).as("join_rows"))
        .select(lit("exact").as("method"), col("join_rows"))
      exact.unionByName(Sketches.cmsJoinSize(cms, cms)
        .select(lit("cms_est").as("method"), col("est_rows").as("join_rows")))
    },
    "x_join_skew_report" -> { (s, dir) =>
      // pre-join explosion audit: top-10 keys by output contribution for
      // the orders⋈events enrichment join — two counts + two-phase top-k
      Audit.joinSkewReport(Tables.orders(s, dir), col("o_custkey"),
        Tables.events(s, dir), col("user_id"), topK = 10)
    },
    "x_butterfly" -> { (s, dir) =>
      // bipartite 4-cycle census of the co-purchase graph, off the SAME
      // persisted symmetric edge artifact as pagerank (even src = the
      // customer side, so each bipartite edge appears exactly once).
      // bipartiteEdges is memoized+distinct by construction, so the
      // census's metric branches all scan one materialized relation
      // (assumeDistinct) instead of re-running the dedup per branch.
      Graph.butterflyCensus(bipartiteEdges(s, dir), "u", "v",
        assumeDistinct = true)
    },
    "x_butterfly_capped" -> { (s, dir) =>
      // the census's scale valve exercised as a first-class query: part-
      // side hubs above degree 40 (the fixture's p90–p99 band, so the cap
      // genuinely BINDS here) are excluded from the wedge join and counted
      // visibly; join cost becomes ≤ cap·|E|/2 rows regardless of skew
      Graph.butterflyCensusCapped(bipartiteEdges(s, dir), "u", "v",
        maxVDegree = ButterflyCap, assumeDistinct = true)
    },
    "x_triangles" -> { (s, dir) =>
      // triangle census of the projected customer co-purchase graph
      // (≥ MinSharedParts shared capped-degree parts — the stored
      // projected-edge artifact), counted with degree-ordered orientation:
      // every edge oriented low→high (degree, id), closed wedges counted
      // once at their lowest-order vertex — join volume O(|E|^{3/2})
      // regardless of hub skew, the published scale-safe form. The
      // n_wedges_oriented row doubles as the loud-failure guard's bound.
      Graph.triangleCensus(projectedCustomerEdges(s, dir), "ua", "ub",
        assumeCanonical = true)
    },
    "x_recon_report" -> { (s, dir) =>
      // stored-rollup vs re-derived-children reconciliation in exact
      // cents (the fixture's o_totalprice ≠ Σ extendedprice by design —
      // non-zero diffs prove the report surfaces corruption)
      Audit.moneyReconcile(Tables.orders(s, dir), col("o_orderkey"),
          col("o_totalprice"), Tables.lineitem(s, dir), col("l_orderkey"),
          col("l_extendedprice"), col("o_orderstatus"))
        .withColumnRenamed("grp", "o_orderstatus")
    },
    "x_active_users" -> { (s, dir) =>
      // DAU + exact 7-day rolling distinct users via the window-end
      // expansion (equi-shuffles only — no range join, no sliding
      // count_distinct window)
      EventAnalytics.activeUsers(Tables.events(s, dir), windowDays = 7)
    },
    "x_active_users_hll" -> { (s, dir) =>
      // the wide-window path the exact expansion documents: day-level
      // HLL sketches merged per window — the expansion is over the
      // BOUNDED day relation, so a 365-day MAU costs days·window sketch
      // merges, never users·window rows. Estimates stash for the oracle
      // (x_sketch_hll's contract); exact DAU rides beside them.
      val out = EventAnalytics.activeUsersHll(Tables.events(s, dir),
        windowDays = 7)
      lastActiveHll = out.select("day", "dau_est", "rolling_est").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
      out
    },
    "x_ppr" -> { (s, dir) =>
      // personalized PageRank: the importance walk RELATIVE to one
      // nation's customer segment — teleport mass returns to the seeds,
      // so iteration-k state is the seeds' k-hop neighborhood, never |V|
      // (a 55-seed segment query touches thousands of vertices of a
      // billion-vertex graph). Same integer fixed point and superstep
      // shape as x_pagerank; GraphSpec pins the seeds=ALL reduction law.
      val seeds = Tables.customer(s, dir)
        .where(col("c_nationkey") === PprSeedNation)
        .select((col("c_custkey") * 2).as("sid"))
      Graph.personalizedPageRank(coPurchaseEdges(s, dir), "src", "dst",
          seeds, "sid", PageRankIters)
        .select(
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"),
          col("rank_scaled"))
    },
    "x_kcore" -> { (s, dir) =>
      // k-core of the projected customer co-purchase graph: the cohesion
      // filter as an iterative simultaneous peel — per round one degree
      // agg + two semi-joins over the (shrinking) survivor edges, rounds
      // bounded by the cascade depth (7 here), never |V|. Reads the SAME
      // stored projected-edge artifact as x_triangles.
      Graph.kCore(projectedCustomerEdges(s, dir), "ua", "ub",
        k = KCoreK.toInt, assumeCanonical = true)
    },
    "x_basket_rules" -> { (s, dir) =>
      // association rules over order baskets: support/confidence/lift in
      // exact ppm for every directed pair co-bought in ≥2 baskets.
      // Candidate volume is Σ C(|basket|,2) — linear under the basket
      // size valve — and the support floor lands BEFORE the marginal
      // joins, so the joined side is already the small frequent set.
      Recommend.basketRules(Tables.lineitem(s, dir), "l_orderkey",
        "l_partkey", minPairSupport = RulesMinSupport)
    },
    "x_basket_rules_delta" -> { (s, dir) =>
      // incremental rule maintenance: the 90%-of-orders base is served
      // from the STORED index (unfloored pair counts + marginals +
      // basket sizes — all additive), the arriving 10% pays only its own
      // pair expansion + one merge agg; composition is EXACT over
      // disjoint basket ids and the chunked-arrival guard refuses the
      // one delta that voids it. Shares x_basket_rules' full-corpus
      // oracle — the delta == rebuild law is driver-red-able.
      val li = Tables.lineitem(s, dir)
      Recommend.basketRulesFrom(
        storedBasketPairs(s, dir), storedBasketItems(s, dir),
        storedBasketSizes(s, dir),
        li.where(col("l_orderkey") % 10 === 0),
        "l_orderkey", "l_partkey", minPairSupport = RulesMinSupport)
    },
    "x_copurchase_recs" -> { (s, dir) =>
      // "customers like you bought": neighborhood-vote CF over the SAME
      // stored projected similarity graph as x_triangles/x_kcore, votes
      // from ONE neighbor-keyed equi-join (|E|·avg-ownership candidates,
      // never users×items), owned items anti-joined away, deterministic
      // top-5 per customer
      Recommend.neighborVoteRecs(projectedCustomerEdges(s, dir), "ua", "ub",
          bipartiteEdges(s, dir), "u", "v", k = RecsTopK)
        .select(col("user").as("cust"), col("item"), col("votes"),
          col("rank").as("rnk"))
    },
    "x_skyline" -> { (s, dir) =>
      // Pareto frontier (min price, max quantity) over lineitems: bucket
      // prefix-max prune (60 k → 48 near-frontier survivors) then the
      // same-bucket residual join — the quadratic step runs over the
      // frontier band only, the full scan is touched twice. The shared
      // floor(x*100+0.5) cents derivation is the x_recon_report one.
      val pts = Tables.lineitem(s, dir).select(
        (col("l_orderkey") * 100 + col("l_linenumber")).as("lid"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")
          .as("price_cents"),
        floor(col("l_quantity")).cast("long").as("qty"))
      Skyline.skyline2d(pts, "lid", "price_cents", "qty",
          bucketWidth = SkylineBucketCents)
        .select(col("id").as("lid"), col("x").as("price_cents"),
          col("y").as("qty"))
    },
    "x_hits" -> { (s, dir) =>
      // HITS hubs & authorities over the DIRECTED customer→part purchase
      // graph (the even-src half of the stored symmetric artifact —
      // customers are the hubs, parts the authorities, Kleinberg's
      // bipartite case): two equi-join+agg supersteps per iteration,
      // vectors L1-renormalized in DECIMAL(38,0) so the oracle replays
      // every iteration bit-exactly; on a symmetric list hub == auth
      // (GraphSpec law)
      // the artifact is distinct by construction (the even-src half of
      // the distinct symmetric list) — assumeDistinct skips a full-edge
      // dedup shuffle per execution
      Graph.hits(coPurchaseEdges(s, dir).where(col("src") % 2 === 0),
          "src", "dst", HitsIters, assumeDistinct = true)
        .select(
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"),
          col("hub_scaled"), col("auth_scaled"))
    },
    "x_landmarks" -> { (s, dir) =>
      // exact hop distances from 4 landmark customers in ONE BFS loop
      // (composite (source, node) state — L sweeps for one loop's
      // rounds, the landmark-distance primitive billion-vertex distance
      // estimation is built on); reads the stored landmark relation
      landmarkDists(s, dir)
        .select(expr("source DIV 2").as("landmark_cust"),
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"),
          col("dist"))
    },
    "x_closeness" -> { (s, dir) =>
      // harmonic centrality ESTIMATED from the same stored landmark
      // relation (Σ 1/dist over landmarks, exact integer ppm — floor
      // division, no float): the scale path for "how central is every
      // node" on a graph where true closeness would need all-pairs BFS
      landmarkDists(s, dir)
        .where(col("dist") > 0)
        .groupBy(
          when(col("node") % 2 === 0, lit("customer"))
            .otherwise(lit("part")).as("node_type"),
          expr("node DIV 2").as("node_id"))
        .agg(sum(expr("1000000 DIV dist")).as("harmonic_ppm"),
          count(lit(1)).as("n_landmarks"))
    },
    "x_random_walks" -> { (s, dir) =>
      // DeepWalk corpus (Perozzi'14) over the projected customer graph:
      // deterministic truncated walks — step t picks neighbor
      // md5(seed|start|walk|t|cur) mod deg in the sorted-neighbor
      // ranking. The stored artifact an embedding pipeline trains from.
      storedWalks(s, dir)
    },
    "x_walk_pairs" -> { (s, dir) =>
      // the skip-gram training relation derived from the SAME stored
      // walk corpus: symmetric window-2 context pairs, counted
      storedWalkPairs(s, dir)
    },
    "x_walk_ppmi" -> { (s, dir) =>
      // PPMI association over the stored skip-gram relation — the matrix
      // SGNS implicitly factorizes (Levy-Goldberg NIPS'14), as an
      // integer lift in ppm (log is monotone, so no float in the
      // ranking — the x_collocations arithmetic on the walk graph):
      // lift_ppm = cnt·T·10⁶ DIV (cnt_center · cnt_context), marginals
      // derived FROM the pair relation, support-floored, top-50 under a
      // total order. One bounded driver scalar (T, off the persisted
      // pair relation).
      val pairs = storedWalkPairs(s, dir)
      val t = pairs.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
      val cm = pairs.groupBy("center").agg(sum("cnt").as("c_cnt"))
      val xm = pairs.groupBy("context").agg(sum("cnt").as("x_cnt"))
      pairs.join(cm, Seq("center")).join(xm, Seq("context"))
        .where(col("cnt") >= WalkPpmiFloor)
        .select(col("center"), col("context"), col("cnt"), col("c_cnt"),
          col("x_cnt"),
          expr(s"CAST(CAST(cnt AS DECIMAL(38,0)) * $t * 1000000 " +
            "DIV (CAST(c_cnt AS DECIMAL(38,0)) * x_cnt) AS BIGINT)")
            .as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("center"), col("context"))
        .limit(50)
    },
    "x_walks_delta" -> { (s, dir) =>
      // incremental walk-corpus refresh: the stored base walks, with
      // ONLY the walks that visited a changed-adjacency vertex (the
      // two-anti-join invalidation relation — additions AND removals,
      // no monotonicity premise) recomputed on the full graph. Exact:
      // shares x_random_walks' full-rebuild oracle, so the
      // refresh == rebuild law is driver-red-able.
      val fullPe = projectedCustomerEdges(s, dir)
      val changed = Graph.walkInvalidations(
        baseProjectedCustomerEdges(s, dir), fullPe, "ua", "ub")
      Graph.walksFrom(storedBaseWalks(s, dir), fullPe, "ua", "ub", changed,
        WalkN, WalkSteps)
    },
    "x_node2vec_walks" -> { (s, dir) =>
      // node2vec (Grover-Leskovec'16) 2nd-order biased walks at the
      // default (1, 4, 2) = p=4, q=2 regime: return discouraged,
      // triangle-closing favored; per step one Σdeg candidate join +
      // two per-walk deg-bounded windows — the honest 2nd-order price.
      // Uniform weights provably collapse to x_random_walks (spec law).
      val pe = projectedCustomerEdges(s, dir)
      n2vMemo(pe, s"n2v|$WalkN|$WalkSteps")(
        Graph.node2vecWalks(pe, "ua", "ub", WalkN, WalkSteps))
    },
    "x_lpa_communities" -> { (s, dir) =>
      // deterministic synchronous label propagation (Raghavan'07) over
      // the projected customer graph: LpaRounds supersteps, each ONE
      // edges⋈labels equi-join + a two-level argmax agg (most frequent
      // neighbor label, ties to smallest) — the stored community
      // assignment x_modularity scores
      storedLpaLabels(s, dir)
        .select(col("node").as("cust"), col("community"))
    },
    "x_modularity" -> { (s, dir) =>
      // Newman modularity profile of the stored LPA partition, EXACT
      // integers only: per community the member count, internal edge
      // count, degree mass, and the modularity numerator
      // q_num = 4·m·m_c − D_c² (so Q = Σ q_num / 4m² for the reader) —
      // no division anywhere, hence no truncation-vs-floor semantics to
      // pin across engines. One bounded driver scalar (the edge count m,
      // off the persisted artifact — the kCore/hits contract).
      val pe = projectedCustomerEdges(s, dir)
      val labels = storedLpaLabels(s, dir)
      val m = pe.count()
      val deg = pe.select(col("ua").as("node"))
        .unionAll(pe.select(col("ub").as("node")))
        .groupBy("node").agg(count(lit(1)).as("__d"))
      val byC = labels.join(deg, Seq("node"))
        .groupBy("community").agg(count(lit(1)).as("n_members"),
          sum(col("__d")).as("degree_total"))
      val inner = pe
        .join(labels.select(col("node").as("ua"), col("community").as("__ca")),
          Seq("ua"))
        .join(labels.select(col("node").as("ub"), col("community").as("__cb")),
          Seq("ub"))
        .where(col("__ca") === col("__cb"))
        .groupBy(col("__ca").as("community"))
        .agg(count(lit(1)).as("internal_edges"))
      byC.join(inner, Seq("community"), "left")
        .select(col("community"), col("n_members"),
          coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
          col("degree_total"),
          (lit(4L * m) * coalesce(col("internal_edges"), lit(0L)) -
            col("degree_total") * col("degree_total")).as("q_num"))
    },
    "x_conductance" -> { (s, dir) =>
      // conductance profile of the stored LPA partition — the cut-quality
      // complement of x_modularity (low φ = well-separated community):
      // per community the boundary-edge count, volume, and
      // φ_ppm = cut·10⁶ DIV min(vol, 2m − vol). Exact integers only;
      // the one driver scalar (m) reads off the persisted edge artifact
      // (the kCore/modularity contract). Same one-labels-join shape as
      // the modularity scorer — at 100 TB this is a stored-partition
      // scoring pass, never a re-propagation.
      Graph.conductanceProfile(projectedCustomerEdges(s, dir),
        storedLpaLabels(s, dir), "ua", "ub")
    },
    "x_clustering_coeff" -> { (s, dir) =>
      // per-vertex local clustering coefficient over the projected
      // customer graph: the SAME degree-ordered oriented wedge join as
      // x_triangles (O(|E|^{3/2}) regardless of hub skew), each closed
      // wedge exploded to its three corners and counted per vertex;
      // cc_ppm = 2·tri·10⁶ DIV (d·(d−1)) — floor division on
      // non-negative longs only
      Graph.triangleCounts(projectedCustomerEdges(s, dir), "ua", "ub",
          assumeCanonical = true)
        .select(col("node").as("cust"), col("degree"), col("triangles"),
          col("cc_ppm"))
    },
    "x_assortativity" -> { (s, dir) =>
      // degree-assortativity sufficient statistics of the projected
      // customer graph — one exact-integer row (2m directed pairs,
      // Σd, Σd², Σd·d'), no division or float on either engine; the
      // reader derives Newman's r from the four sums
      Graph.assortativityProfile(projectedCustomerEdges(s, dir), "ua", "ub",
        assumeCanonical = true)
    },
    "x_link_prediction" -> { (s, dir) =>
      // resource-allocation link prediction (Zhou'09) over the stored
      // projected graph: Σ 10⁶ DIV deg(z) over shared neighbors —
      // the integer-exact common-neighbor score that up-weights rare
      // bridges; candidates from the center-keyed wedge join (the
      // census-guarded volume), already-adjacent pairs anti-joined away
      // before scoring, deterministic per-vertex top-k
      Recommend.resourceAllocationRecs(projectedCustomerEdges(s, dir),
          "ua", "ub", RecsTopK)
        .select(col("user").as("cust"), col("cand"),
          col("common_neighbors"), col("ra_ppm"), col("rank"))
    },
  )

  /** x_active_users_hll's estimate stash (bounded: one row per day). */
  @volatile private var lastActiveHll: Seq[(String, Long, Long)] = Nil

  /** Estimates replay as VALUES literals; the exact DAU side is
    * re-derived from the raw events (the x_sketch_hll oracle contract —
    * HLL register binaries have no DuckDB counterpart, exactness rides
    * in the same row instead). */
  private def activeHllOracle: Map[String, String] = lastActiveHll match {
    case est if est.nonEmpty =>
      val rows = est.map { case (d, de, re) => s"(DATE '$d', $de, $re)" }
        .mkString(", ")
      Map("x_active_users_hll" ->
        (s"WITH est(day, dau_est, rolling_est) AS (VALUES $rows), " +
          "du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events), " +
          "dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau_exact FROM du GROUP BY 1) " +
          "SELECT d.day, d.dau_exact, CAST(e.dau_est AS BIGINT) AS dau_est, " +
          "CAST(e.rolling_est AS BIGINT) AS rolling_est " +
          "FROM dau d JOIN est e USING (day)"))
    case _ => Map.empty
  }

  /** Graph CTE builder: edge list + out-degrees + vertex count for one
    * edge set, name-prefixed so the delta oracle can hold the base and
    * full graphs side by side. Mirrors [[coPurchaseEdges]]/[[baseEdges]]
    * (symmetrized ⇒ out-degree = degree). */
  private def graphCteFor(p: String, where: String): String =
    s"cp$p AS (SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst " +
      s"FROM orders JOIN lineitem ON o_orderkey = l_orderkey$where), " +
      s"e$p AS (SELECT src, dst FROM cp$p UNION ALL SELECT dst AS src, src AS dst FROM cp$p), " +
      s"deg$p AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM e$p GROUP BY 1), " +
      s"n$p AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg$p)"
  private val graphCte = "WITH " + graphCteFor("", "")

  /** One PageRank iteration as SQL over the `p`-prefixed graph: the same
    * fixed-point arithmetic as [[Graph]] — floor divisions (DuckDB // =
    * Spark DIV on this all-positive mass) keep the chain exact, so the
    * compares stay hash-strict. */
  private def prIterSql(p: String, out: String, in: String): String = {
    val S = Graph.Scale
    val (dn, dd) = (Graph.DampNum, Graph.DampDen)
    // CAST back to BIGINT: DuckDB's sum(BIGINT) yields HUGEINT, which would
    // otherwise infect `r` (and downstream rank_scaled) and break the
    // driver's type-sensitive hash even though the values match Spark's.
    s"$out AS (SELECT e$p.dst AS id, CAST((SELECT ($S * ${dd - dn}) // ($dd * n) FROM n$p) + " +
      s"($dn * sum(r.r // d.deg)) // $dd AS BIGINT) AS r " +
      s"FROM e$p JOIN $in r ON r.id = e$p.src JOIN deg$p d ON d.id = e$p.src " +
      s"GROUP BY e$p.dst)"
  }

  /** Full-rebuild shortest paths (bounded walk + min) — the oracle for
    * BOTH x_sssp and x_sssp_delta. Every path of total weight <= 48 is
    * enumerated (UNION dedups (id, d) states, so the recursion is finite
    * on the cyclic graph); 48 sits 3x above the structural bound
    * max_weight(3) * eccentricity(<=5 at these fixtures), and the
    * engine's relaxation can only produce distances under that bound, so
    * the cap never truncates a true distance. */
  private val ssspRebuildSql: String =
    "WITH RECURSIVE cpw AS (SELECT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst, " +
      "1 + CAST(min(CAST(floor(l_quantity) AS BIGINT) % 3) AS BIGINT) AS wt " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2), " +
      "e AS (SELECT src, dst, wt FROM cpw UNION ALL SELECT dst, src, wt FROM cpw), " +
      "w(id, d) AS (SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d " +
      "UNION SELECT e.dst, w.d + e.wt FROM w JOIN e ON e.src = w.id " +
      "WHERE w.d + e.wt <= 48) " +
      "SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type, " +
      "id // 2 AS node_id, CAST(min(d) AS BIGINT) AS dist FROM w GROUP BY 1, 2"

  private val prSelect =
    "SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type, " +
      "id // 2 AS node_id, r AS rank_scaled FROM "

  /** The projected-customer-graph CTE chain (the x_triangles oracle's
    * own prefix, factored so the community/coefficient oracles re-derive
    * the SAME graph): cp → capped k → thresholded canonical pe. */
  private def projCtes(): String =
    "cp AS (SELECT DISTINCT o_custkey AS u, l_partkey AS v " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
      "deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM cp GROUP BY 1), " +
      s"k AS (SELECT u, cp.v FROM cp JOIN deg USING (v) WHERE d <= $ButterflyCap), " +
      "pe AS (SELECT a.u AS ua, b.u AS ub FROM k a JOIN k b " +
      "ON a.v = b.v AND a.u < b.u GROUP BY 1, 2 " +
      s"HAVING count(*) >= $MinSharedParts)"

  /** The full-graph walk rebuild — x_random_walks' oracle AND
    * x_walks_delta's (the shared-oracle delta law). */
  private def walksRebuildSql: String =
    s"WITH ${walkCtes()} " +
      "SELECT CAST(start AS BIGINT) AS start, CAST(walk_id AS BIGINT) AS walk_id, " +
      "CAST(step AS BIGINT) AS step, CAST(node AS BIGINT) AS node FROM walks"

  /** [[projCtes]] plus the walk corpus unrolled: ranked undirected
    * adjacency, degrees, and [[WalkSteps]] step CTEs each replaying the
    * engine's md5 pick — `rk = (md5-hash % deg) + 1` — term for term. */
  private def walkCtes(): String = {
    // every step CTE is referenced TWICE (the next step and the final
    // union) — DuckDB 1.0 INLINES non-materialized CTEs, so without the
    // MATERIALIZED keyword the chain expands 2^steps copies of the
    // md5-heavy projection (measured: minutes vs 0.2 s at sf0.01)
    val stepCtes = (1 to WalkSteps).map { t =>
      val v = s"s.start::VARCHAR || '|' || s.walk_id::VARCHAR || '|' || '$t' || '|' || s.node::VARCHAR"
      s"s$t AS MATERIALIZED (SELECT s.start, s.walk_id, $t AS step, n.v AS node " +
        s"FROM s${t - 1} s JOIN wdg d ON d.u = s.node JOIN wnbr n ON n.u = s.node " +
        s"AND n.rk = (${SparkEntryExt.seedHashSql(Graph.WalkSeed.toString, v)} % d.deg) + 1)"
    }
    s"${projCtes()}, " +
      "wadj AS MATERIALIZED (SELECT ua AS u, ub AS v FROM pe UNION ALL SELECT ub, ua FROM pe), " +
      "wnbr AS MATERIALIZED (SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) AS rk FROM wadj), " +
      "wdg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM wadj GROUP BY 1), " +
      s"s0 AS MATERIALIZED (SELECT u AS start, w.walk_id, 0 AS step, u AS node " +
      s"FROM (SELECT DISTINCT u FROM wadj), range($WalkN) w(walk_id)), " +
      stepCtes.mkString(", ") + ", " +
      "walks AS MATERIALIZED (" + (0 to WalkSteps).map(t => s"SELECT * FROM s$t")
        .mkString(" UNION ALL ") + ")"
  }

  /** The node2vec walk replay: per step the Σdeg candidate join with the
    * (prev, cand) adjacency probe, the (1, 4, 2) bias CASE, the two
    * per-walk windows and the interval pick — the engine's chain term
    * for term. */
  private def node2vecCtes(): String = {
    // MATERIALIZED for the same reason as [[walkCtes]]: each n$t is
    // referenced twice, and DuckDB's default inlining would re-derive
    // the whole prior chain per reference — exponential in steps
    val stepCtes = (1 to WalkSteps).flatMap { t =>
      val v = s"s.start::VARCHAR || '|' || s.walk_id::VARCHAR || '|' || '$t' || '|' || s.node::VARCHAR"
      val h = SparkEntryExt.seedHashSql(Graph.WalkSeed.toString, v)
      Seq(
        s"c$t AS MATERIALIZED (SELECT s.start, s.walk_id, s.node, n.v, n.rk, " +
          "CASE WHEN n.v = s.prev THEN 1 WHEN a.u IS NOT NULL THEN 4 ELSE 2 END AS w, " +
          s"($h) AS hs " +
          s"FROM n${t - 1} s JOIN wnbr n ON n.u = s.node " +
          "LEFT JOIN wadj a ON a.u = s.prev AND a.v = n.v)",
        s"p$t AS MATERIALIZED (SELECT *, sum(w) OVER (PARTITION BY start, walk_id ORDER BY rk) AS cum, " +
          s"sum(w) OVER (PARTITION BY start, walk_id) AS tot FROM c$t)",
        s"n$t AS MATERIALIZED (SELECT start, walk_id, node AS prev, v AS node FROM p$t " +
          "WHERE cum - w <= (hs % tot) AND (hs % tot) < cum)")
    }
    s"${projCtes()}, " +
      "wadj AS MATERIALIZED (SELECT ua AS u, ub AS v FROM pe UNION ALL SELECT ub, ua FROM pe), " +
      "wnbr AS MATERIALIZED (SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) AS rk FROM wadj), " +
      s"n0 AS MATERIALIZED (SELECT u AS start, w.walk_id, u AS prev, u AS node " +
      s"FROM (SELECT DISTINCT u FROM wadj), range($WalkN) w(walk_id)), " +
      stepCtes.mkString(", ") + ", " +
      "n2v AS MATERIALIZED (" + (0 to WalkSteps).map(t =>
        s"SELECT start, walk_id, $t AS step, node FROM n$t")
        .mkString(" UNION ALL ") + ")"
  }

  /** [[projCtes]] plus [[LpaRounds]] unrolled synchronous LPA rounds:
    * l0 = own id; l{i} = per-vertex (count DESC, label ASC) argmax over
    * neighbors' l{i-1} — the engine's max(struct(count, -label)) exactly. */
  private def projLpaCtes(): String = {
    val rounds = (1 to LpaRounds).map { i =>
      s"c$i AS (SELECT sym.u AS x, l${i - 1}.l AS l, count(*) AS c " +
        s"FROM sym JOIN l${i - 1} ON l${i - 1}.x = sym.nb GROUP BY 1, 2), " +
        s"l$i AS (SELECT x, l FROM (SELECT x, l, row_number() OVER " +
        s"(PARTITION BY x ORDER BY c DESC, l) AS rn FROM c$i) WHERE rn = 1)"
    }
    s"${projCtes()}, " +
      "sym AS (SELECT ua AS u, ub AS nb FROM pe UNION ALL SELECT ub, ua FROM pe), " +
      "l0 AS (SELECT DISTINCT u AS x, u AS l FROM sym), " +
      rounds.mkString(", ")
  }

  def oracleSql: Map[String, String] = Map(
    "x_bfs_levels" ->
      ("WITH RECURSIVE " + graphCteFor("", "") + ", " +
        // UNION (not UNION ALL): distinct (id, lvl) pairs bound the walk
        // on a cyclic graph; the lvl cap is the same loud-failure bound
        // as the engine's maxRounds
        "b(id, lvl) AS (SELECT CAST(0 AS BIGINT) AS id, 0 AS lvl " +
        "UNION SELECT e.dst, b.lvl + 1 FROM b JOIN e ON e.src = b.id WHERE b.lvl < 64) " +
        "SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type, " +
        "id // 2 AS node_id, CAST(min(lvl) AS BIGINT) AS level FROM b GROUP BY 1, 2"),
    // the rich-club profile re-derived: same ladder, same induced-edge
    // double join, same guarded ppm floor division
    "x_rich_club" ->
      (s"WITH ${projCtes()}, " +
        "pd AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM " +
        "(SELECT ua AS x FROM pe UNION ALL SELECT ub FROM pe) GROUP BY 1), " +
        s"lad AS (SELECT unnest([${RichClubKs.mkString(", ")}]) AS k), " +
        "rich AS (SELECT l.k, pd.x AS node FROM pd, lad l WHERE pd.d > l.k), " +
        "nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rich FROM rich GROUP BY 1), " +
        "ek AS (SELECT a.k, CAST(count(*) AS BIGINT) AS e_rich FROM pe " +
        "JOIN rich a ON a.node = pe.ua JOIN rich b ON b.node = pe.ub AND b.k = a.k " +
        "GROUP BY 1) " +
        "SELECT CAST(nk.k AS BIGINT) AS k, nk.n_rich, " +
        "CAST(coalesce(ek.e_rich, 0) AS BIGINT) AS e_rich, " +
        "CAST(CASE WHEN nk.n_rich > 1 THEN 2 * coalesce(ek.e_rich, 0) * 1000000 " +
        "// (nk.n_rich * (nk.n_rich - 1)) ELSE 0 END AS BIGINT) AS phi_ppm " +
        "FROM nk LEFT JOIN ek USING (k)"),

    // both sweeps replayed as bounded recursive walks; the argmax picks
    // use the same (lvl DESC, id) total order
    "x_diameter" ->
      ("WITH RECURSIVE " + graphCteFor("", "") + ", " +
        "b1(id, lvl) AS (SELECT CAST(0 AS BIGINT) AS id, 0 AS lvl " +
        "UNION SELECT e.dst, b1.lvl + 1 FROM b1 JOIN e ON e.src = b1.id WHERE b1.lvl < 64), " +
        "d1 AS (SELECT id, CAST(min(lvl) AS BIGINT) AS lvl FROM b1 GROUP BY 1), " +
        "u1 AS (SELECT id, lvl FROM d1 ORDER BY lvl DESC, id LIMIT 1), " +
        "b2(id, lvl) AS (SELECT (SELECT id FROM u1) AS id, 0 AS lvl " +
        "UNION SELECT e.dst, b2.lvl + 1 FROM b2 JOIN e ON e.src = b2.id WHERE b2.lvl < 64), " +
        "d2 AS (SELECT id, CAST(min(lvl) AS BIGINT) AS lvl FROM b2 GROUP BY 1), " +
        "u2 AS (SELECT id, lvl FROM d2 ORDER BY lvl DESC, id LIMIT 1) " +
        "SELECT CAST(0 AS BIGINT) AS sweep1_source, " +
        "(SELECT lvl FROM u1) AS ecc_source, " +
        "(SELECT id FROM u1) AS sweep2_source, " +
        "(SELECT lvl FROM u2) AS diameter_lb, " +
        "(SELECT id FROM u2) AS peripheral_node"),

    "x_sssp" -> ssspRebuildSql,
    // the delta == rebuild law: min-plus monotonicity makes the
    // incremental composition EXACTLY the full rebuild, so it shares
    // the rebuild oracle (the x_er_delta pattern)
    "x_sssp_delta" -> ssspRebuildSql,
    "x_pagerank" -> {
      val init = s"r0 AS (SELECT id, ${Graph.Scale} // (SELECT n FROM n) AS r FROM deg)"
      val its = (1 to PageRankIters).map(i => prIterSql("", s"r$i", s"r${i - 1}"))
      s"$graphCte, $init, ${its.mkString(", ")} $prSelect r$PageRankIters"
    },
    "x_pagerank_weighted" -> {
      // the weighted-edge derivation shared with the SSSP oracles, then
      // the same unrolled fixed-point iterations with mass split ∝ weight
      val S = Graph.Scale
      val (dn, dd) = (Graph.DampNum, Graph.DampDen)
      val g = "cpw AS (SELECT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst, " +
        "1 + CAST(min(CAST(floor(l_quantity) AS BIGINT) % 3) AS BIGINT) AS wt " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2), " +
        "e AS (SELECT src, dst, wt FROM cpw UNION ALL SELECT dst, src, wt FROM cpw), " +
        "d AS (SELECT src AS id, CAST(sum(wt) AS BIGINT) AS ws FROM e GROUP BY 1), " +
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)"
      val init = s"w0 AS (SELECT id, $S // (SELECT n FROM n) AS r FROM d)"
      val its = (1 to PageRankIters).map { i =>
        s"w$i AS (SELECT e.dst AS id, CAST((SELECT ($S * ${dd - dn}) // ($dd * n) FROM n) + " +
          s"($dn * sum((r.r * e.wt) // d.ws)) // $dd AS BIGINT) AS r " +
          s"FROM e JOIN w${i - 1} r ON r.id = e.src JOIN d ON d.id = e.src " +
          "GROUP BY e.dst)"
      }
      s"WITH $g, $init, ${its.mkString(", ")} $prSelect w$PageRankIters"
    },
    "x_pagerank_delta" -> {
      // base chain (orders % 10 <> 0) at full depth, then ONE refresh
      // iteration over the full graph, initialized from the base ranks
      // (new vertices seed at the uniform mass) — exactly pageRankFrom
      val S = Graph.Scale
      val baseInit = s"b0 AS (SELECT id, $S // (SELECT n FROM nb) AS r FROM degb)"
      val baseIts = (1 to PageRankIters).map(i => prIterSql("b", s"b$i", s"b${i - 1}"))
      // seed + exact mass renormalization back to Scale (HUGEINT mirrors
      // Spark's DECIMAL(38,0) IntegralDivide — see Graph.pageRankFrom)
      val warm = s"fraw AS (SELECT deg.id, coalesce(b$PageRankIters.r, " +
        s"$S // (SELECT n FROM n)) AS r FROM deg " +
        s"LEFT JOIN b$PageRankIters ON b$PageRankIters.id = deg.id), " +
        s"ftot AS (SELECT CAST(sum(r) AS HUGEINT) AS t FROM fraw), " +
        s"f0 AS (SELECT id, CAST(CAST(r AS HUGEINT) * $S // (SELECT t FROM ftot) " +
        "AS BIGINT) AS r FROM fraw)"
      "WITH " + graphCteFor("b", " WHERE o_orderkey % 10 <> 0") + ", " +
        graphCteFor("", "") + ", " +
        s"$baseInit, ${baseIts.mkString(", ")}, $warm, " +
        prIterSql("", "f1", "f0") + " " + prSelect + "f1"
    },
    "x_degree_stats" ->
      (s"$graphCte SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type, " +
        "deg, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1, 2"),
    "x_anomaly_days" ->
      ("WITH d AS (SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, " +
        "CAST(count(*) AS BIGINT) AS n_events, " +
        "sum(CAST(value AS DECIMAL(18,2))) AS day_sum FROM events GROUP BY 1, 2), " +
        "u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS days_active, " +
        "sum(day_sum) AS total FROM d GROUP BY 1) " +
        "SELECT d.user_id, CAST(d.day AS TIMESTAMP) AS day, d.n_events, " +
        "CAST(d.day_sum AS DOUBLE) AS day_value, u.days_active, " +
        "CAST(u.total AS DOUBLE) AS user_total " +
        "FROM d JOIN u USING (user_id) " +
        "WHERE d.day_sum * u.days_active > 3 * u.total"),
    "x_funnel" -> {
      // the same greedy-earliest chain, one CTE per step: step i is the
      // earliest type-s_i event strictly after step i-1's anchor
      val ctes = FunnelSteps.zipWithIndex.map { case (st, i) =>
        if (i == 0)
          s"s1 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t " +
            s"FROM events WHERE event_type = '$st' GROUP BY 1)"
        else
          s"s${i + 1} AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t " +
            s"FROM events e JOIN s$i ON e.user_id = s$i.user_id " +
            s"WHERE e.event_type = '$st' AND CAST(e.ts AS TIMESTAMP) > s$i.t " +
            s"GROUP BY 1)"
      }.mkString("WITH ", ", ", " ")
      val branches = FunnelSteps.zipWithIndex.map { case (st, i) =>
        s"SELECT CAST(${i + 1} AS BIGINT) AS step_idx, '$st' AS step, " +
          s"CAST(count(*) AS BIGINT) AS n_users FROM s${i + 1}"
      }.mkString(" UNION ALL ")
      ctes + branches
    },
    "x_funnel_window" -> {
      // the same running-max DP, as DuckDB window functions: b_i = max
      // anchor (over strictly-preceding rows in (t, event_id) order) of
      // a chain reaching level i+1; a step row completes its level iff
      // the endpoint span fits the window
      val over = "OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
      val types = FunnelSteps.map(s => s"'$s'").mkString(", ")
      val base = s"WITH s AS (SELECT user_id, event_id, event_type, " +
        s"epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events " +
        s"WHERE event_type IN ($types)), " +
        s"w0 AS (SELECT *, max(CASE WHEN event_type = '${FunnelSteps.head}' " +
        s"THEN t END) $over AS b0 FROM s)"
      val chain = (1 until FunnelSteps.size - 1).map { i =>
        s"w$i AS (SELECT *, max(CASE WHEN event_type = '${FunnelSteps(i)}' " +
          s"THEN b${i - 1} END) $over AS b$i FROM w${i - 1})"
      }
      val lvlCases = FunnelSteps.zipWithIndex.map { case (st, i) =>
        if (i == 0) s"WHEN event_type = '$st' THEN 1"
        else s"WHEN event_type = '$st' AND b${i - 1} IS NOT NULL AND " +
          s"t - b${i - 1} <= $FunnelWindowMicros THEN ${i + 1}"
      }.mkString(" ")
      val reach = s"r AS (SELECT user_id, max(CASE $lvlCases END) AS lvl " +
        s"FROM w${FunnelSteps.size - 2} GROUP BY 1)"
      val branches = FunnelSteps.zipWithIndex.map { case (st, i) =>
        s"SELECT CAST(${i + 1} AS BIGINT) AS step_idx, '$st' AS step, " +
          s"CAST(count(*) AS BIGINT) AS n_users FROM r WHERE lvl >= ${i + 1}"
      }.mkString(" UNION ALL ")
      (Seq(base) ++ chain ++ Seq(reach)).mkString(", ") + " " + branches
    },
    "x_funnel_latency" -> {
      // same chain CTEs as x_funnel_window; the span at a final-step row
      // is t - b_{k-2} (the DP maximizes the anchor, so that difference
      // IS the minimal span of any chain ending there)
      val over = "OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
      val types = FunnelSteps.map(s => s"'$s'").mkString(", ")
      val base = s"WITH s AS (SELECT user_id, event_id, event_type, " +
        s"epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events " +
        s"WHERE event_type IN ($types)), " +
        s"w0 AS (SELECT *, max(CASE WHEN event_type = '${FunnelSteps.head}' " +
        s"THEN t END) $over AS b0 FROM s)"
      val chain = (1 until FunnelSteps.size - 1).map { i =>
        s"w$i AS (SELECT *, max(CASE WHEN event_type = '${FunnelSteps(i)}' " +
          s"THEN b${i - 1} END) $over AS b$i FROM w${i - 1})"
      }
      val last = FunnelSteps.size - 2
      val best = s"best AS (SELECT user_id, min(t - b$last) AS b " +
        s"FROM w$last WHERE event_type = '${FunnelSteps.last}' " +
        s"AND b$last IS NOT NULL GROUP BY 1)"
      val bandCase = LatencyBandsMicros.map(e => s"WHEN b <= $e THEN $e")
        .mkString("CASE ", " ", " ELSE -1 END")
      (Seq(base) ++ chain ++ Seq(best)).mkString(", ") +
        s" SELECT CAST($bandCase AS BIGINT) AS band_micros, " +
        "CAST(count(*) AS BIGINT) AS n_users FROM best GROUP BY 1"
    },
    "x_event_paths" ->
      ("WITH s AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events), " +
        "tri AS (SELECT event_type AS step1, " +
        "lead(event_type, 1) OVER w AS step2, " +
        "lead(event_type, 2) OVER w AS step3, " +
        "lead(t, 1) OVER w - t AS g1, " +
        "lead(t, 2) OVER w - lead(t, 1) OVER w AS g2 " +
        "FROM s WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) " +
        "SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths " +
        "FROM tri WHERE step2 IS NOT NULL AND step3 IS NOT NULL " +
        "AND g1 <= 1800000000 AND g2 <= 1800000000 GROUP BY 1, 2, 3"),
    "x_attribution" ->
      // DuckDB's native ASOF LEFT JOIN, with the same (user, ts)
      // tie pre-dedup the engine's tiebreak implies and the lookback
      // applied as a post-join CASE (stale match -> the (none) bucket,
      // mirroring the as-of staleness gate nulling the payload)
      ("WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value " +
        "FROM events WHERE event_type = 'purchase'), " +
        "t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS touch_ts, " +
        "event_id AS touch_id, event_type AS channel " +
        "FROM events WHERE event_type IN ('click', 'view') " +
        "QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP) " +
        "ORDER BY event_id DESC) = 1), " +
        "j AS (SELECT p.value, CASE WHEN t.touch_ts IS NOT NULL AND " +
        "epoch_us(p.ts) - epoch_us(t.touch_ts) <= 21600000000 " +
        "THEN t.channel ELSE '(none)' END AS channel " +
        "FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND t.touch_ts <= p.ts) " +
        "SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value " +
        "FROM j GROUP BY 1"),
    "x_retention" ->
      ("WITH f AS (SELECT user_id, date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS cohort " +
        "FROM events GROUP BY 1), " +
        "a AS (SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d " +
        "FROM events) " +
        "SELECT CAST(f.cohort AS TIMESTAMP) AS cohort, " +
        "CAST(date_diff('day', f.cohort, a.d) AS BIGINT) AS day_offset, " +
        "CAST(count(*) AS BIGINT) AS n_active " +
        "FROM a JOIN f USING (user_id) GROUP BY 1, 2"),
    "x_dedup_soft" ->
      ("WITH c AS (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS n_dupes " +
        "FROM documents WHERE text IS NOT NULL GROUP BY 1) " +
        "SELECT d.doc_id, c.n_dupes, 1000000 // c.n_dupes AS weight_ppm " +
        "FROM documents d JOIN c ON md5(d.text) = c.h " +
        "WHERE d.text IS NOT NULL"),

    // same bucketing (floor of IEEE double division is exact in both
    // engines), same NULL-free integer cross-multiplied L1
    "x_drift_report" ->
      ("WITH h AS (SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS ca, " +
        "CAST(sum(CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END) AS BIGINT) AS cb " +
        "FROM events GROUP BY 1, 2), " +
        "t AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS na, " +
        "CAST(sum(cb) AS BIGINT) AS nb FROM h GROUP BY 1) " +
        "SELECT h.event_type AS event_type, t.na AS n_a, t.nb AS n_b, " +
        "CAST(count(*) AS BIGINT) AS n_buckets, " +
        "CAST(sum(abs(ca * t.nb - cb * t.na)) AS BIGINT) AS l1_cross " +
        "FROM h JOIN t USING (event_type) GROUP BY h.event_type, t.na, t.nb"),

    // the CMS build replayed bucket-for-bucket (same md5-derived row
    // hashes as x_sketch_cms), then the per-depth inner product
    "x_join_size_est" -> {
      val hash = s"(${SparkEntryExt.seedHashSql(s"(${Sketches.CmsSeed} + td.d)",
        "CAST(user_id AS VARCHAR)")} % 256)"
      "WITH cms AS (SELECT d, bucket, CAST(count(*) AS BIGINT) AS c FROM (" +
        s"SELECT td.d, $hash AS bucket FROM events, range(4) td(d)) GROUP BY 1, 2), " +
        "dots AS (SELECT d, sum(c * c) AS dot FROM cms GROUP BY 1), " +
        "ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS join_rows FROM (" +
        "SELECT count(*) AS c FROM events GROUP BY user_id)) " +
        "SELECT 'exact' AS method, join_rows FROM ex " +
        "UNION ALL SELECT 'cms_est' AS method, CAST(min(dot) AS BIGINT) AS join_rows FROM dots"
    },

    "x_join_skew_report" ->
      ("WITH lc AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n_left " +
        "FROM orders GROUP BY 1), " +
        "rc AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_right " +
        "FROM events GROUP BY 1) " +
        "SELECT key, n_left, n_right, n_left * n_right AS out_rows " +
        "FROM lc JOIN rc USING (key) " +
        "QUALIFY row_number() OVER (ORDER BY out_rows DESC, key) <= 10"),

    // wedge/butterfly identities re-derived from the raw bipartite edge
    // set (the engine side counts off the symmetrized artifact)
    // identical pre-filter over the degree relation: hubs above the cap
    // leave the join and surface in n_hub_vs_capped instead
    "x_butterfly_capped" ->
      (s"WITH cp AS (SELECT DISTINCT o_custkey AS u, l_partkey AS v " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM cp GROUP BY 1), " +
        s"k AS (SELECT u, cp.v FROM cp JOIN deg USING (v) WHERE d <= $ButterflyCap), " +
        "w AS (SELECT a.u AS u1, b.u AS u2, CAST(count(*) AS BIGINT) AS w " +
        "FROM k a JOIN k b ON a.v = b.v AND a.u < b.u GROUP BY 1, 2) " +
        "SELECT 'n_hub_vs_capped' AS metric, " +
        s"(SELECT CAST(count(*) AS BIGINT) FROM deg WHERE d > $ButterflyCap) AS value " +
        "UNION ALL SELECT 'n_edges_kept' AS metric, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM k) AS value " +
        "UNION ALL SELECT 'n_wedges' AS metric, " +
        "(SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) " +
        s"FROM deg WHERE d <= $ButterflyCap) AS value " +
        "UNION ALL SELECT 'n_butterflies' AS metric, " +
        "(SELECT CAST(coalesce(sum(w * (w - 1) // 2), 0) AS BIGINT) FROM w) AS value"),

    "x_butterfly" ->
      ("WITH cp AS (SELECT DISTINCT o_custkey AS u, l_partkey AS v " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM cp GROUP BY 1), " +
        "w AS (SELECT a.u AS u1, b.u AS u2, CAST(count(*) AS BIGINT) AS w " +
        "FROM cp a JOIN cp b ON a.v = b.v AND a.u < b.u GROUP BY 1, 2) " +
        "SELECT 'n_edges' AS metric, (SELECT CAST(count(*) AS BIGINT) FROM cp) AS value " +
        "UNION ALL SELECT 'n_wedges' AS metric, " +
        "(SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) FROM deg) AS value " +
        "UNION ALL SELECT 'n_butterflies' AS metric, " +
        "(SELECT CAST(coalesce(sum(w * (w - 1) // 2), 0) AS BIGINT) FROM w) AS value"),

    // the same capped projection (HAVING mirrors MinSharedParts), the
    // same (deg, id) orientation for the wedge row, and triangles
    // re-derived INDEPENDENTLY as the canonical three-edge join over
    // x<y<z — so an orientation mistake on the engine side cannot be
    // mirrored into the oracle
    "x_triangles" ->
      ("WITH cp AS (SELECT DISTINCT o_custkey AS u, l_partkey AS v " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM cp GROUP BY 1), " +
        s"k AS (SELECT u, cp.v FROM cp JOIN deg USING (v) WHERE d <= $ButterflyCap), " +
        "pe AS (SELECT a.u AS ua, b.u AS ub FROM k a JOIN k b " +
        "ON a.v = b.v AND a.u < b.u GROUP BY 1, 2 " +
        s"HAVING count(*) >= $MinSharedParts), " +
        "pd AS (SELECT x, CAST(sum(c) AS BIGINT) AS d FROM (" +
        "SELECT ua AS x, count(*) AS c FROM pe GROUP BY 1 " +
        "UNION ALL SELECT ub, count(*) FROM pe GROUP BY 1) GROUP BY 1), " +
        "o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND pe.ua < pe.ub) " +
        "THEN pe.ua ELSE pe.ub END AS s FROM pe " +
        "JOIN pd da ON da.x = pe.ua JOIN pd db ON db.x = pe.ub), " +
        "od AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM o GROUP BY 1) " +
        "SELECT 'n_edges' AS metric, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM pe) AS value " +
        "UNION ALL SELECT 'n_wedges_oriented' AS metric, " +
        "(SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) FROM od) AS value " +
        "UNION ALL SELECT 'n_triangles' AS metric, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM pe e1 " +
        "JOIN pe e2 ON e2.ua = e1.ua AND e2.ub > e1.ub " +
        "JOIN pe e3 ON e3.ua = e1.ub AND e3.ub = e2.ub) AS value"),

    // identical floor-based cents derivation — no round() rounding-mode
    // dependence in either engine
    "x_recon_report" ->
      ("WITH k AS (SELECT l_orderkey AS okey, " +
        "CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS kc " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_parents, " +
        "CAST(sum(CASE WHEN d <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch, " +
        "CAST(sum(abs(d)) AS BIGINT) AS sum_abs_diff_cents, " +
        "CAST(max(abs(d)) AS BIGINT) AS max_abs_diff_cents FROM (" +
        "SELECT o_orderstatus, CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) " +
        "- coalesce(k.kc, 0) AS d FROM orders LEFT JOIN k ON o_orderkey = k.okey) " +
        "GROUP BY 1"),

    // the same window-end expansion: each (day, user) supports the 7
    // window days it falls in; only event-bearing days are reported
    "x_active_users" ->
      ("WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events), " +
        "dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1), " +
        "ex AS (SELECT DISTINCT du.day + CAST(t.o AS INTEGER) AS day, du.user_id " +
        "FROM du, range(7) t(o)), " +
        "roll AS (SELECT day, CAST(count(*) AS BIGINT) AS rolling FROM ex GROUP BY 1) " +
        "SELECT day, dau, rolling FROM dau JOIN roll USING (day)"),

    // same seed restriction (semi-join against the graph), same integer
    // recurrence with ABSENT = 0: contribs per reached dst, then a full
    // join against the seed relation puts the teleport base on seeds only
    "x_ppr" -> {
      val S = Graph.Scale
      val (dn, dd) = (Graph.DampNum, Graph.DampDen)
      val seeds = "s AS (SELECT DISTINCT c_custkey * 2 AS sid FROM customer " +
        s"WHERE c_nationkey = $PprSeedNation " +
        "AND EXISTS (SELECT 1 FROM deg WHERE deg.id = c_custkey * 2)), " +
        "ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s), " +
        s"p0 AS (SELECT sid AS id, $S // (SELECT n FROM ns) AS r FROM s)"
      val its = (1 to PageRankIters).map { i =>
        s"c$i AS (SELECT e.dst AS dst, CAST(sum(r.r // d.deg) AS BIGINT) AS sm " +
          s"FROM e JOIN p${i - 1} r ON r.id = e.src JOIN deg d ON d.id = e.src " +
          "GROUP BY e.dst), " +
          s"p$i AS (SELECT coalesce(c.dst, s.sid) AS id, " +
          "CAST((CASE WHEN s.sid IS NOT NULL THEN " +
          s"(SELECT ($S * ${dd - dn}) // ($dd * n) FROM ns) ELSE 0 END) + " +
          s"coalesce(($dn * c.sm) // $dd, 0) AS BIGINT) AS r " +
          s"FROM c$i c FULL JOIN s ON c.dst = s.sid)"
      }
      s"$graphCte, $seeds, ${its.mkString(", ")} $prSelect p$PageRankIters"
    },

    // the same projected-edge derivation as x_triangles, then the peel
    // UNROLLED: each round recomputes degrees over the prior survivor
    // edges and keeps edges whose BOTH endpoints hold degree >= k —
    // exactly the engine's simultaneous drop. Peeling a converged core
    // is the identity, so unrolling past the cascade depth is safe.
    "x_kcore" -> {
      // every e_i is referenced twice by round i+1 (its degree agg and
      // its edge filter) — MATERIALIZED stops DuckDB's inliner from
      // turning the 10-round chain into 2^10 base scans
      val proj = "cp AS (SELECT DISTINCT o_custkey AS u, l_partkey AS v " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "bdeg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM cp GROUP BY 1), " +
        s"kk AS (SELECT u, cp.v FROM cp JOIN bdeg USING (v) WHERE d <= $ButterflyCap), " +
        "e0 AS MATERIALIZED (SELECT a.u AS ua, b.u AS ub FROM kk a JOIN kk b " +
        "ON a.v = b.v AND a.u < b.u GROUP BY 1, 2 " +
        s"HAVING count(*) >= $MinSharedParts)"
      val rounds = (1 to KCoreOracleRounds).map { i =>
        s"d$i AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM " +
          s"(SELECT ua AS x FROM e${i - 1} UNION ALL SELECT ub FROM e${i - 1}) " +
          "GROUP BY 1), " +
          s"e$i AS MATERIALIZED (SELECT e.ua, e.ub FROM e${i - 1} e " +
          s"JOIN d$i a ON a.x = e.ua JOIN d$i b ON b.x = e.ub " +
          s"WHERE a.d >= $KCoreK AND b.d >= $KCoreK)"
      }
      s"WITH $proj, ${rounds.mkString(", ")} " +
        "SELECT x AS node, CAST(count(*) AS BIGINT) AS core_deg FROM " +
        s"(SELECT ua AS x FROM e$KCoreOracleRounds " +
        s"UNION ALL SELECT ub FROM e$KCoreOracleRounds) GROUP BY 1"
    },

    // identical basket-cap / support-floor / ppm floor-division chain;
    // HUGEINT mirrors the engine's DECIMAL(38,0) products
    "x_basket_rules" ->
      ("WITH b0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem), " +
        "sz AS (SELECT bk FROM b0 GROUP BY bk " +
        s"HAVING count(*) <= ${Recommend.DefaultMaxBasketItems}), " +
        "kept AS (SELECT b0.bk, b0.it FROM b0 JOIN sz USING (bk)), " +
        "nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM kept), " +
        "ic AS (SELECT it, CAST(count(*) AS BIGINT) AS ni FROM kept GROUP BY 1), " +
        "pr AS (SELECT a.it AS ia, b.it AS ib, CAST(count(*) AS BIGINT) AS n_ab " +
        "FROM kept a JOIN kept b ON a.bk = b.bk AND a.it < b.it GROUP BY 1, 2 " +
        s"HAVING count(*) >= $RulesMinSupport), " +
        "dr AS (SELECT ia AS ant, ib AS cons, n_ab FROM pr " +
        "UNION ALL SELECT ib, ia, n_ab FROM pr) " +
        "SELECT ant, cons, n_ab, " +
        s"CAST(CAST(n_ab AS HUGEINT) * ${Recommend.Ppm} // (SELECT n FROM nb) AS BIGINT) AS support_ppm, " +
        s"CAST(CAST(n_ab AS HUGEINT) * ${Recommend.Ppm} // a.ni AS BIGINT) AS conf_ppm, " +
        s"CAST(CAST(n_ab AS HUGEINT) * (SELECT n FROM nb) * ${Recommend.Ppm} // " +
        "(CAST(a.ni AS HUGEINT) * c.ni) AS BIGINT) AS lift_ppm " +
        "FROM dr JOIN ic a ON a.it = dr.ant JOIN ic c ON c.it = dr.cons"),

    // delta == rebuild: composition over disjoint basket ids is exact
    // term for term, so the refresh shares the FULL-corpus oracle (the
    // x_sssp_delta / x_er_delta shared-oracle contract — a composition
    // bug driver-reds against the rebuild, not against itself)
    "x_basket_rules_delta" ->
      ("WITH b0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem), " +
        "sz AS (SELECT bk FROM b0 GROUP BY bk " +
        s"HAVING count(*) <= ${Recommend.DefaultMaxBasketItems}), " +
        "kept AS (SELECT b0.bk, b0.it FROM b0 JOIN sz USING (bk)), " +
        "nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM kept), " +
        "ic AS (SELECT it, CAST(count(*) AS BIGINT) AS ni FROM kept GROUP BY 1), " +
        "pr AS (SELECT a.it AS ia, b.it AS ib, CAST(count(*) AS BIGINT) AS n_ab " +
        "FROM kept a JOIN kept b ON a.bk = b.bk AND a.it < b.it GROUP BY 1, 2 " +
        s"HAVING count(*) >= $RulesMinSupport), " +
        "dr AS (SELECT ia AS ant, ib AS cons, n_ab FROM pr " +
        "UNION ALL SELECT ib, ia, n_ab FROM pr) " +
        "SELECT ant, cons, n_ab, " +
        s"CAST(CAST(n_ab AS HUGEINT) * ${Recommend.Ppm} // (SELECT n FROM nb) AS BIGINT) AS support_ppm, " +
        s"CAST(CAST(n_ab AS HUGEINT) * ${Recommend.Ppm} // a.ni AS BIGINT) AS conf_ppm, " +
        s"CAST(CAST(n_ab AS HUGEINT) * (SELECT n FROM nb) * ${Recommend.Ppm} // " +
        "(CAST(a.ni AS HUGEINT) * c.ni) AS BIGINT) AS lift_ppm " +
        "FROM dr JOIN ic a ON a.it = dr.ant JOIN ic c ON c.it = dr.cons"),

    // the same projection CTE, symmetrized; owned anti-join as NOT
    // EXISTS; the identical (votes DESC, item ASC) deterministic rank
    "x_copurchase_recs" ->
      ("WITH cp AS (SELECT DISTINCT o_custkey AS u, l_partkey AS v " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "bdeg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM cp GROUP BY 1), " +
        s"kk AS (SELECT u, cp.v FROM cp JOIN bdeg USING (v) WHERE d <= $ButterflyCap), " +
        "pe AS (SELECT a.u AS ua, b.u AS ub FROM kk a JOIN kk b " +
        "ON a.v = b.v AND a.u < b.u GROUP BY 1, 2 " +
        s"HAVING count(*) >= $MinSharedParts), " +
        "sym AS (SELECT ua AS u, ub AS nb FROM pe UNION ALL SELECT ub, ua FROM pe), " +
        "vt AS (SELECT sym.u, cp.v AS cand, CAST(count(*) AS BIGINT) AS votes " +
        "FROM sym JOIN cp ON cp.u = sym.nb " +
        "WHERE NOT EXISTS (SELECT 1 FROM cp o WHERE o.u = sym.u AND o.v = cp.v) " +
        "GROUP BY 1, 2) " +
        "SELECT u AS cust, cand AS item, votes, CAST(rn AS BIGINT) AS rnk FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY u ORDER BY votes DESC, cand) AS rn " +
        s"FROM vt) WHERE rn <= $RecsTopK"),

    // HITS unrolled: each iteration's raw vectors, HUGEINT mass totals
    // and Scale-renormalizations mirror the engine's DECIMAL(38,0)
    // floor chain term for term
    "x_hits" -> {
      val S = Graph.Scale
      val g = "cp AS (SELECT DISTINCT o_custkey * 2 AS s, l_partkey * 2 + 1 AS d " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "nh AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM cp), " +
        s"h0 AS (SELECT DISTINCT s AS u, $S // (SELECT n FROM nh) AS h FROM cp)"
      val its = (1 to HitsIters).map { i =>
        s"a${i}r AS (SELECT d AS v, CAST(sum(h) AS BIGINT) AS a " +
          s"FROM cp JOIN h${i - 1} ON h${i - 1}.u = cp.s GROUP BY 1), " +
          s"a${i}t AS (SELECT CAST(sum(a) AS HUGEINT) AS t FROM a${i}r), " +
          s"a$i AS (SELECT v, CAST(CAST(a AS HUGEINT) * $S // " +
          s"(SELECT t FROM a${i}t) AS BIGINT) AS a FROM a${i}r), " +
          s"h${i}r AS (SELECT s AS u, CAST(sum(a) AS BIGINT) AS h " +
          s"FROM cp JOIN a$i ON a$i.v = cp.d GROUP BY 1), " +
          s"h${i}t AS (SELECT CAST(sum(h) AS HUGEINT) AS t FROM h${i}r), " +
          s"h$i AS (SELECT u, CAST(CAST(h AS HUGEINT) * $S // " +
          s"(SELECT t FROM h${i}t) AS BIGINT) AS h FROM h${i}r)"
      }
      s"WITH $g, ${its.mkString(", ")}, " +
        s"f AS (SELECT coalesce(h.u, a.v) AS id, coalesce(h.h, 0) AS hub, " +
        s"coalesce(a.a, 0) AS auth FROM h$HitsIters h " +
        s"FULL JOIN a$HitsIters a ON h.u = a.v) " +
        "SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type, " +
        "id // 2 AS node_id, CAST(hub AS BIGINT) AS hub_scaled, " +
        "CAST(auth AS BIGINT) AS auth_scaled FROM f"
    },

    // the projection re-derived from scratch (the x_triangles CTE chain),
    // then LpaRounds synchronous label-propagation rounds unrolled — each
    // round's argmax as a (count DESC, label ASC) row_number, mirroring
    // the engine's max(struct(count, -label)) term for term
    "x_lpa_communities" ->
      (s"WITH ${projLpaCtes()} " +
        s"SELECT CAST(x AS BIGINT) AS cust, CAST(l AS BIGINT) AS community " +
        s"FROM l$LpaRounds"),

    // the same unrolled partition, scored: per community the exact
    // integer profile and the modularity numerator 4·m·m_c − D_c² —
    // no division on either side, so no rounding semantics to pin
    "x_modularity" ->
      (s"WITH ${projLpaCtes()}, " +
        "mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pe), " +
        "pd AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM " +
        "(SELECT ua AS x FROM pe UNION ALL SELECT ub FROM pe) GROUP BY 1), " +
        s"byc AS (SELECT lf.l AS community, CAST(count(*) AS BIGINT) AS n_members, " +
        s"CAST(sum(pd.d) AS BIGINT) AS degree_total FROM l$LpaRounds lf " +
        "JOIN pd ON pd.x = lf.x GROUP BY 1), " +
        s"ie AS (SELECT la.l AS community, CAST(count(*) AS BIGINT) AS internal_edges " +
        s"FROM pe JOIN l$LpaRounds la ON la.x = pe.ua " +
        s"JOIN l$LpaRounds lb ON lb.x = pe.ub WHERE la.l = lb.l GROUP BY 1) " +
        "SELECT CAST(byc.community AS BIGINT) AS community, n_members, " +
        "CAST(coalesce(ie.internal_edges, 0) AS BIGINT) AS internal_edges, " +
        "degree_total, " +
        "CAST(4 * (SELECT m FROM mm) * coalesce(ie.internal_edges, 0) " +
        "- degree_total * degree_total AS BIGINT) AS q_num " +
        "FROM byc LEFT JOIN ie USING (community)"),

    // the walk corpus replayed step by step (same md5 picks over the
    // same sorted-neighbor ranking)
    "x_random_walks" -> walksRebuildSql,

    // the delta refresh SHARES the full-rebuild oracle: refresh ==
    // rebuild is exact with no monotonicity premise (every kept walk's
    // visited neighborhoods are unchanged; every walk that could
    // diverge is in the recompute set) — a drifting refresh goes
    // driver-red, the x_sssp_delta/x_er_delta contract
    "x_walks_delta" -> walksRebuildSql,

    // the PPMI lift re-derived off the same replayed pair relation in
    // HUGEINT (the x_collocations arithmetic — // == DIV on positives)
    "x_walk_ppmi" ->
      (s"WITH ${walkCtes()}, " +
        "co AS MATERIALIZED (SELECT a.node AS na, b.node AS nb FROM walks a JOIN walks b " +
        "ON a.start = b.start AND a.walk_id = b.walk_id " +
        "AND b.step - a.step BETWEEN 1 AND 2), " +
        "pr AS MATERIALIZED (SELECT center, context, CAST(count(*) AS BIGINT) AS cnt FROM " +
        "(SELECT na AS center, nb AS context FROM co " +
        "UNION ALL SELECT nb, na FROM co) GROUP BY 1, 2), " +
        "tt AS (SELECT sum(cnt) AS t FROM pr), " +
        "cm AS (SELECT center, CAST(sum(cnt) AS BIGINT) AS c_cnt FROM pr GROUP BY 1), " +
        "xm AS (SELECT context, CAST(sum(cnt) AS BIGINT) AS x_cnt FROM pr GROUP BY 1) " +
        "SELECT CAST(pr.center AS BIGINT) AS center, CAST(pr.context AS BIGINT) AS context, " +
        "pr.cnt, cm.c_cnt, xm.x_cnt, " +
        "CAST(CAST(pr.cnt AS HUGEINT) * (SELECT t FROM tt) * 1000000 " +
        "// (CAST(cm.c_cnt AS HUGEINT) * xm.x_cnt) AS BIGINT) AS lift_ppm " +
        "FROM pr JOIN cm USING (center) JOIN xm USING (context) " +
        s"WHERE pr.cnt >= $WalkPpmiFloor " +
        "ORDER BY lift_ppm DESC, center, context LIMIT 50"),

    // the biased walks replayed with the same md5 interval picks over
    // the same per-walk weight windows
    "x_node2vec_walks" ->
      (s"WITH ${node2vecCtes()} " +
        "SELECT CAST(start AS BIGINT) AS start, CAST(walk_id AS BIGINT) AS walk_id, " +
        "CAST(step AS BIGINT) AS step, CAST(node AS BIGINT) AS node FROM n2v"),

    // the skip-gram relation off the same replayed walks: ordered pairs
    // at step distance 1..2, both directions, counted
    "x_walk_pairs" ->
      (s"WITH ${walkCtes()}, " +
        "co AS MATERIALIZED (SELECT a.node AS na, b.node AS nb FROM walks a JOIN walks b " +
        "ON a.start = b.start AND a.walk_id = b.walk_id " +
        "AND b.step - a.step BETWEEN 1 AND 2) " +
        "SELECT CAST(center AS BIGINT) AS center, CAST(context AS BIGINT) AS context, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM " +
        "(SELECT na AS center, nb AS context FROM co " +
        "UNION ALL SELECT nb, na FROM co) GROUP BY 1, 2"),

    // the same unrolled partition, cut-scored: boundary edges double-
    // counted onto both sides' communities, φ in ppm by floor division
    // over non-negative integers (DIV == // exactly)
    "x_conductance" ->
      (s"WITH ${projLpaCtes()}, " +
        "mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pe), " +
        "pd AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM " +
        "(SELECT ua AS x FROM pe UNION ALL SELECT ub FROM pe) GROUP BY 1), " +
        s"byc AS (SELECT lf.l AS community, CAST(count(*) AS BIGINT) AS n_members, " +
        s"CAST(sum(pd.d) AS BIGINT) AS volume FROM l$LpaRounds lf " +
        "JOIN pd ON pd.x = lf.x GROUP BY 1), " +
        s"bd AS (SELECT la.l AS ca, lb.l AS cb FROM pe " +
        s"JOIN l$LpaRounds la ON la.x = pe.ua " +
        s"JOIN l$LpaRounds lb ON lb.x = pe.ub WHERE la.l <> lb.l), " +
        "cut AS (SELECT c AS community, CAST(count(*) AS BIGINT) AS cut_edges FROM " +
        "(SELECT ca AS c FROM bd UNION ALL SELECT cb FROM bd) GROUP BY 1) " +
        "SELECT CAST(byc.community AS BIGINT) AS community, n_members, " +
        "CAST(coalesce(cut.cut_edges, 0) AS BIGINT) AS cut_edges, volume, " +
        "CAST(CASE WHEN least(volume, 2 * (SELECT m FROM mm) - volume) = 0 THEN 0 " +
        "ELSE coalesce(cut.cut_edges, 0) * 1000000 " +
        "// least(volume, 2 * (SELECT m FROM mm) - volume) END AS BIGINT) AS conductance_ppm " +
        "FROM byc LEFT JOIN cut USING (community)"),

    // triangles re-derived as the canonical x<y<z three-edge join
    // (independent of the engine's orientation), exploded to corners;
    // the coefficient's floor division touches non-negative values only
    "x_clustering_coeff" ->
      (s"WITH ${projCtes()}, " +
        "pd AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM " +
        "(SELECT ua AS x FROM pe UNION ALL SELECT ub FROM pe) GROUP BY 1), " +
        "tr AS (SELECT e1.ua AS x, e1.ub AS y, e2.ub AS z FROM pe e1 " +
        "JOIN pe e2 ON e2.ua = e1.ua AND e2.ub > e1.ub " +
        "JOIN pe e3 ON e3.ua = e1.ub AND e3.ub = e2.ub), " +
        "tv AS (SELECT x AS v FROM tr UNION ALL SELECT y FROM tr " +
        "UNION ALL SELECT z FROM tr), " +
        "tc AS (SELECT v, CAST(count(*) AS BIGINT) AS tri FROM tv GROUP BY 1) " +
        "SELECT CAST(pd.x AS BIGINT) AS cust, pd.d AS degree, " +
        "CAST(coalesce(tc.tri, 0) AS BIGINT) AS triangles, " +
        "CAST(coalesce(tc.tri, 0) * 2000000 // (pd.d * (pd.d - 1)) AS BIGINT) AS cc_ppm " +
        "FROM pd LEFT JOIN tc ON tc.v = pd.x WHERE pd.d >= 2"),

    // the four sufficient statistics re-derived over the same
    // re-projected graph — counts and sums only, no division to pin
    "x_assortativity" ->
      (s"WITH ${projCtes()}, " +
        "sym AS (SELECT ua AS u, ub AS nb FROM pe UNION ALL SELECT ub, ua FROM pe), " +
        "pd AS (SELECT u AS x, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(du.d) AS BIGINT) AS sum_deg, " +
        "CAST(sum(du.d * du.d) AS BIGINT) AS sum_deg_sq, " +
        "CAST(sum(du.d * dv.d) AS BIGINT) AS sum_deg_prod " +
        "FROM sym JOIN pd du ON du.x = sym.u JOIN pd dv ON dv.x = sym.nb"),

    // the wedge-centered score re-derived from the definition: shared
    // neighbor z contributes 10⁶ // deg(z); adjacency exclusion as
    // NOT EXISTS; the identical (score DESC, cand ASC) deterministic rank
    "x_link_prediction" ->
      (s"WITH ${projCtes()}, " +
        "sym AS (SELECT ua AS u, ub AS nb FROM pe UNION ALL SELECT ub, ua FROM pe), " +
        "pd AS (SELECT u AS x, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1), " +
        "wd AS (SELECT s1.u AS u, s2.nb AS w, pd.d FROM sym s1 " +
        "JOIN sym s2 ON s2.u = s1.nb JOIN pd ON pd.x = s1.nb " +
        "WHERE s1.u <> s2.nb AND NOT EXISTS " +
        "(SELECT 1 FROM sym o WHERE o.u = s1.u AND o.nb = s2.nb)), " +
        "sc AS (SELECT u, w, CAST(count(*) AS BIGINT) AS common_neighbors, " +
        "CAST(sum(1000000 // d) AS BIGINT) AS ra_ppm FROM wd GROUP BY 1, 2) " +
        "SELECT CAST(u AS BIGINT) AS cust, CAST(w AS BIGINT) AS cand, " +
        "common_neighbors, ra_ppm, CAST(rn AS BIGINT) AS rank FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY u ORDER BY ra_ppm DESC, w) AS rn " +
        s"FROM sc) WHERE rn <= $RecsTopK"),

    // the same recursive bounded walk as x_bfs_levels, widened to the
    // (source, id) composite state
    "x_landmarks" ->
      ("WITH RECURSIVE " + graphCteFor("", "") + ", " +
        "lm AS (SELECT DISTINCT c_custkey * 2 AS s FROM customer " +
        s"WHERE c_custkey < $LandmarkMaxCust), " +
        "w(s, id, d) AS (SELECT s, s AS id, 0 AS d FROM lm " +
        "UNION SELECT w.s, e.dst, w.d + 1 FROM w JOIN e ON e.src = w.id " +
        "WHERE w.d < 64) " +
        "SELECT s // 2 AS landmark_cust, " +
        "CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type, " +
        "id // 2 AS node_id, CAST(min(d) AS BIGINT) AS dist " +
        "FROM w GROUP BY 1, 2, 3"),

    // harmonic centrality re-derived from the same walk: Σ 10⁶ // dist
    // over landmarks, self-rows (dist 0) excluded
    "x_closeness" ->
      ("WITH RECURSIVE " + graphCteFor("", "") + ", " +
        "lm AS (SELECT DISTINCT c_custkey * 2 AS s FROM customer " +
        s"WHERE c_custkey < $LandmarkMaxCust), " +
        "w(s, id, d) AS (SELECT s, s AS id, 0 AS d FROM lm " +
        "UNION SELECT w.s, e.dst, w.d + 1 FROM w JOIN e ON e.src = w.id " +
        "WHERE w.d < 64), " +
        "md AS (SELECT s, id, CAST(min(d) AS BIGINT) AS dist FROM w GROUP BY 1, 2) " +
        "SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type, " +
        "id // 2 AS node_id, CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_ppm, " +
        "CAST(count(*) AS BIGINT) AS n_landmarks " +
        "FROM md WHERE dist > 0 GROUP BY 1, 2"),

    // the skyline re-derived from the ICDE'01 DEFINITION (NOT EXISTS a
    // dominator) — independent of the engine's bucket-prune path, so a
    // prune mistake cannot be mirrored into the oracle
    "x_skyline" ->
      ("WITH p AS (SELECT l_orderkey * 100 + l_linenumber AS lid, " +
        "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_cents, " +
        "CAST(floor(l_quantity) AS BIGINT) AS qty FROM lineitem) " +
        "SELECT lid, price_cents, qty FROM p WHERE NOT EXISTS (" +
        "SELECT 1 FROM p q WHERE q.price_cents <= p.price_cents " +
        "AND q.qty >= p.qty " +
        "AND (q.price_cents < p.price_cents OR q.qty > p.qty))"),
  ) ++ activeHllOracle
}
