package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket analytics and co-occurrence recommendation — the
  * "customers who bought X also bought Y" layer a training-data /
  * commerce corpus asks of its interaction log. Both operators are
  * pure equi-join/agg plans over relations the engine already stores
  * (baskets, the projected similarity graph), and both carry the
  * bounded-blowup discipline the 100 TB brief demands: candidate volume
  * is per-basket (Σ C(|basket|,2), linear when basket sizes are capped)
  * or per-similarity-edge (|E|·avg basket), never all-pairs.
  *
  * All scores are exact integers (parts-per-million via floor division,
  * products in DECIMAL(38,0) so no intermediate wraps), so a DuckDB
  * oracle replays every rule bit-identically — the same cross-engine
  * determinism contract as the PageRank/PMI families. */
object Recommend {

  /** ppm scale shared with the oracles. */
  val Ppm: Long = 1000000L

  /** Default basket-size valve for [[basketRules]]. */
  val DefaultMaxBasketItems: Long = 64L

  /** Association rules over `(basket, item)` pairs — support, confidence
    * and lift for every DIRECTED item pair co-occurring in at least
    * `minPairSupport` baskets (Agrawal & Srikant's Apriori level 2, the
    * level that matters for co-purchase recommendation; higher levels
    * compose by re-joining the output against the basket relation).
    *
    *   support_ppm(A→B) = 10⁶·n_AB div n_baskets
    *   conf_ppm(A→B)    = 10⁶·n_AB div n_A
    *   lift_ppm(A→B)    = 10⁶·n_AB·n_baskets div (n_A·n_B)
    *
    * (lift > 10⁶ ⇔ positive association; the ranking is exact because
    * every division is a floor over DECIMAL(38,0) products — no float.)
    *
    * Plan: one distinct over (basket, item) (one shuffle, the relation a
    * deployment stores), one per-basket self-join keyed on the basket id
    * (candidate volume Σ C(|b|,2) — LINEAR in baskets when sizes are
    * bounded), two broadcast-sized marginal joins. Baskets larger than
    * `maxBasketItems` are EXCLUDED — visibly, by the returned rules being
    * computed over the retained baskets only (denominator included): a
    * degenerate mega-basket (one bot order touching 10⁵ items) would
    * otherwise contribute C(10⁵,2) ≈ 5·10⁹ candidate rows on its own,
    * the quadratic tail the cap removes — the ButterflyCap contract.
    * The support floor is applied on the PAIR count before the marginal
    * joins, so the joined side is already the (small) frequent set. */
  def basketRules(baskets: DataFrame, basketCol: String, itemCol: String,
                  minPairSupport: Long,
                  maxBasketItems: Long = DefaultMaxBasketItems): DataFrame = {
    require(minPairSupport >= 1, s"minPairSupport=$minPairSupport")
    val kept = keptOf(baskets, basketCol, itemCol, maxBasketItems)
    // ONE driver scalar: the retained-basket count (the support/lift
    // denominator) — bounded metadata, the pageRank vertex-count contract
    val nB = kept.select("__b").distinct().count()
    require(nB > 0, "basketRules: no baskets under the size cap")
    scoreRules(pairCountsOf(kept), itemCountsOf(kept), nB, minPairSupport)
  }

  /** (basket, item) distinct pairs restricted to under-cap baskets. */
  private[graft] def keptOf(baskets: DataFrame, basketCol: String, itemCol: String,
                            maxBasketItems: Long): DataFrame = {
    val b0 = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sizes = b0.groupBy("__b").agg(count(lit(1)).as("__bs"))
    b0.join(sizes.where(col("__bs") <= maxBasketItems).select("__b"), Seq("__b"))
  }

  /** Canonical UNFLOORED pair counts `(__ia < __ib, n_ab)` — the stored
    * index relation of the delta path: counts are ADDITIVE over disjoint
    * basket sets, and keeping sub-floor pairs is what lets an arriving
    * batch promote a pair across the support floor without a rescan. */
  private[graft] def pairCountsOf(kept: DataFrame): DataFrame =
    kept.alias("l").join(kept.alias("r"), col("l.__b") === col("r.__b")
        && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("__ia"), col("r.__i").as("__ib"))
      .agg(count(lit(1)).as("n_ab"))

  /** Per-item retained-basket counts `(__it, __ni)` — additive like the
    * pair counts. */
  private[graft] def itemCountsOf(kept: DataFrame): DataFrame =
    kept.groupBy(col("__i").as("__it")).agg(count(lit(1)).as("__ni"))

  /** Per-basket item counts `(__b, __bs)` over ALL baskets (pre-cap):
    * the delta guard's membership relation AND the retained-denominator
    * source (`__bs <= cap` filters within). */
  private[graft] def basketSizesOf(baskets: DataFrame, basketCol: String,
                                   itemCol: String): DataFrame =
    baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct().groupBy("__b").agg(count(lit(1)).as("__bs"))

  /** The shared scoring tail: floor the pair counts, direct them, join
    * the marginals, score in exact ppm. Used verbatim by the full build
    * and the delta composition so the two can never diverge
    * arithmetically. */
  private def scoreRules(pairCounts: DataFrame, itemCnt: DataFrame,
                         nB: Long, minPairSupport: Long): DataFrame = {
    // the support floor lands on the PAIR count before the marginal
    // joins, so the joined side is already the (small) frequent set
    val pairs = pairCounts.where(col("n_ab") >= minPairSupport)
    // directed rules: each frequent unordered pair yields A→B and B→A
    // (same n_ab, different confidence denominators)
    val directed = pairs.select(col("__ia").as("ant"), col("__ib").as("cons"), col("n_ab"))
      .unionByName(pairs.select(col("__ib").as("ant"), col("__ia").as("cons"), col("n_ab")))
    directed
      .join(itemCnt.select(col("__it").as("ant"), col("__ni").as("__na")), Seq("ant"))
      .join(itemCnt.select(col("__it").as("cons"), col("__ni").as("__nc")), Seq("cons"))
      .select(col("ant"), col("cons"), col("n_ab"),
        expr(s"CAST(CAST(n_ab AS DECIMAL(38,0)) * $Ppm DIV $nB AS BIGINT)")
          .as("support_ppm"),
        expr(s"CAST(CAST(n_ab AS DECIMAL(38,0)) * $Ppm DIV __na AS BIGINT)")
          .as("conf_ppm"),
        expr(s"CAST(CAST(n_ab AS DECIMAL(38,0)) * $nB * $Ppm DIV " +
          "(CAST(__na AS DECIMAL(38,0)) * __nc) AS BIGINT)").as("lift_ppm"))
  }

  /** Incremental rule maintenance: compose the STORED base index
    * (unfloored pair counts, item marginals, basket sizes — the three
    * additive relations [[pairCountsOf]]/[[itemCountsOf]]/
    * [[basketSizesOf]] derive) with an arriving batch of WHOLE new
    * baskets. Every count is a per-basket sum, so over DISJOINT basket
    * ids composition is EXACT: merged = base + delta, term for term —
    * the delta == rebuild law the oracle red-flags (it recomputes the
    * full corpus). The batch pays only its own Σ C(|b|,2) expansion plus
    * one merge agg over the (pair-bounded) stored index — the full
    * corpus is never re-expanded.
    *
    * The premise is CHECKED, not assumed (the ssspInvalidations /
    * capCrossings contract): a delta row whose basket id ALREADY exists
    * in the base is a CHUNKED arrival — its cross-chunk pairs are
    * invisible to both sides of the composition, so the refresh REFUSES
    * loudly (one delta-bounded semi-join) rather than serving silently
    * incomplete counts; chunked feeds are a rebuild. */
  def basketRulesFrom(basePairs: DataFrame, baseItems: DataFrame,
                      baseSizes: DataFrame, deltaBaskets: DataFrame,
                      basketCol: String, itemCol: String,
                      minPairSupport: Long,
                      maxBasketItems: Long = DefaultMaxBasketItems): DataFrame = {
    require(minPairSupport >= 1, s"minPairSupport=$minPairSupport")
    // lazy checkpoint: the guard count right below is the materializing
    // job (it scans d0), so the former eager-count + guard-count pair
    // collapses into one blocking job (r17)
    val d0 = deltaBaskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct().localCheckpoint(false)
    // the guard: delta basket ids must be NEW (delta-bounded semi-join)
    val chunked = d0.select("__b").distinct()
      .join(baseSizes.select("__b"), Seq("__b"), "left_semi").count()
    require(chunked == 0,
      s"basketRulesFrom: $chunked arriving basket id(s) already exist in " +
        "the base — chunked arrivals void the additive premise (cross-" +
        "chunk pairs are invisible to the composition); rebuild instead")
    val dSizes = d0.groupBy("__b").agg(count(lit(1)).as("__bs"))
    val dKept = d0.join(dSizes.where(col("__bs") <= maxBasketItems)
      .select("__b"), Seq("__b"))
    // bounded driver scalars: the two retained-basket counts
    val nB = baseSizes.where(col("__bs") <= maxBasketItems).count() +
      dKept.select("__b").distinct().count()
    require(nB > 0, "basketRulesFrom: no baskets under the size cap")
    val mergedPairs = basePairs.unionByName(pairCountsOf(dKept))
      .groupBy("__ia", "__ib").agg(sum(col("n_ab")).as("n_ab"))
    val mergedItems = baseItems.unionByName(itemCountsOf(dKept))
      .groupBy("__it").agg(sum(col("__ni")).as("__ni"))
    scoreRules(mergedPairs, mergedItems, nB, minPairSupport)
  }

  /** Item recommendation over a precomputed similarity graph: for each
    * user, the top-`k` items owned by SIMILAR users (canonical
    * `(ua < ub)` edges — the stored projected co-purchase artifact) that
    * the user does not own, scored by how many similar neighbors own the
    * item — the neighborhood-vote collaborative filter (the item-based
    * CF shape of Sarwar et al., WWW'01, with the similarity graph
    * already thresholded at build time).
    *
    * Plan: symmetrize the edge list (map-side), ONE equi-join on the
    * neighbor key against the ownership relation (candidate volume
    * |E|·avg ownership — linear in the similarity graph, never
    * users×items), one owned-pair anti-join, one per-user count agg and
    * one per-user top-k window. The window partitions on the user key —
    * skew-bounded because a user's candidate rows are ≤ Σ ownership of
    * its neighbors, which the similarity graph's degree cap already
    * bounds. Ties rank deterministically (votes desc, then item asc) so
    * the output is hash-stable cross-engine. */
  def neighborVoteRecs(simEdges: DataFrame, uaCol: String, ubCol: String,
                       owned: DataFrame, userCol: String, itemCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val e = simEdges.select(col(uaCol).as("__u"), col(ubCol).as("__n"))
    val sym = e.unionByName(e.select(col("__n").as("__u"), col("__u").as("__n")))
    val own = owned.select(col(userCol).as("__ou"), col(itemCol).as("__oi"))
    val votes = sym.join(own, col("__n") === col("__ou"))
      .select(col("__u"), col("__oi").as("__cand"))
      .join(own.select(col("__ou").as("__u"), col("__oi").as("__cand")),
        Seq("__u", "__cand"), "left_anti")
      .groupBy(col("__u"), col("__cand"))
      .agg(count(lit(1)).as("votes"))
    votes.withColumn("rank", row_number().over(
        Window.partitionBy(col("__u")).orderBy(col("votes").desc, col("__cand"))))
      .where(col("rank") <= k)
      .select(col("__u").as("user"), col("__cand").as("item"),
        col("votes"), col("rank").cast("long").as("rank"))
  }

  /** Link prediction by RESOURCE ALLOCATION (Zhou, Lü & Zhang, "Predicting
    * missing links via local information", Eur. Phys. J. B 71, 2009):
    * score(u, w) = Σ_{z ∈ N(u) ∩ N(w)} 1/deg(z) — the common-neighbor
    * measure that up-weights RARE bridges (a shared low-degree neighbor
    * says far more than a shared hub), and the one whose published form
    * is a plain reciprocal — integer-exact here as `10⁶ DIV deg(z)`
    * summed in ppm (floor division on non-negative longs only, so Spark
    * and DuckDB cannot disagree; Adamic-Adar's 1/log deg would put an
    * irrational in the score). Candidates come from the center-keyed
    * wedge join over the symmetrized similarity graph — volume
    * Σ deg(z)·(deg(z)−1), the same quantity the triangle census bounds,
    * guarded by the SAME eager valve before the join is committed —
    * already-adjacent pairs anti-joined away BEFORE the score agg, then
    * one per-vertex top-k window (skew-bounded: a vertex's candidate
    * rows are ≤ Σ neighbor degrees, which the projection's degree cap
    * bounds). Ties rank (score desc, candidate asc) — a total order.
    *
    * Output: `(user, cand, common_neighbors, ra_ppm, rank)`, top `k`
    * predicted links per vertex. `simEdges` is assumed canonical and
    * distinct (the stored projected-artifact contract, as
    * [[neighborVoteRecs]]). */
  def resourceAllocationRecs(simEdges: DataFrame, uaCol: String, ubCol: String,
                             k: Int,
                             maxWedges: Long = graft.ext.Graph.MaxExactWedges): DataFrame = {
    require(k >= 1, s"k=$k")
    val e = simEdges.select(col(uaCol).as("__u"), col(ubCol).as("__n"))
    val sym = e.unionByName(e.select(col("__n").as("__u"), col("__u").as("__n")))
    val deg = sym.groupBy(col("__u").as("__z")).agg(count(lit(1)).as("__d"))
    // the wedge valve: one eager bounded scalar off the degree agg, the
    // triangleCensus contract — refuse the join, don't launch it
    val wedges = deg.agg(coalesce(sum(expr("__d * (__d - 1)")), lit(0L)))
      .head.getLong(0)
    require(wedges <= maxWedges,
      s"resourceAllocationRecs: $wedges directed wedges exceed the " +
        s"exact-join bound of $maxWedges — raise the projection's " +
        "thresholds (degree cap / min support) before link prediction")
    // deg(z) rides the edge side INTO the wedge join (one |E|-sized join,
    // never a per-wedge one), and the pair agg runs BEFORE the adjacency
    // anti-join: the agg is map-side combinable so the Σd(d−1) wedge rows
    // collapse toward distinct pairs ahead of the (u, w) shuffle, and the
    // anti-join then probes pair-sized input — anti-joining the raw wedge
    // rows instead measured 112× (not 10×) at the 10× soak (the wedge
    // relation outgrew the adjacency broadcast and every wedge row paid
    // the sort-merge). Filtering after the agg is the same result: the
    // adjacency predicate is per (u, w).
    val symD = sym.select(col("__u"), col("__n").as("__z"))
      .join(deg, Seq("__z"))
    val scored = symD
      .join(sym.select(col("__u").as("__z"), col("__n").as("__w")),
        Seq("__z"))
      .where(col("__u") =!= col("__w"))
      .groupBy(col("__u"), col("__w"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr("1000000 DIV __d")).as("ra_ppm"))
      // predicted links only: already-adjacent pairs anti-joined away
      .join(sym.select(col("__u"), col("__n").as("__w")),
        Seq("__u", "__w"), "left_anti")
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("__u")).orderBy(col("ra_ppm").desc, col("__w"))))
      .where(col("rank") <= k)
      .select(col("__u").as("user"), col("__w").as("cand"),
        col("common_neighbors"), col("ra_ppm"),
        col("rank").cast("long").as("rank"))
  }
}
