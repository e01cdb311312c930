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
    val b0 = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sizes = b0.groupBy("__b").agg(count(lit(1)).as("__bs"))
    val kept = b0.join(sizes.where(col("__bs") <= maxBasketItems)
      .select("__b"), Seq("__b"))
    // ONE driver scalar: the retained-basket count (the support/lift
    // denominator) — bounded metadata, the pageRank vertex-count contract
    val nB = kept.select("__b").distinct().count()
    require(nB > 0, "basketRules: no baskets under the size cap")
    val itemCnt = kept.groupBy(col("__i").as("__it"))
      .agg(count(lit(1)).as("__ni"))
    val pairs = kept.alias("l").join(kept.alias("r"), col("l.__b") === col("r.__b")
        && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("__ia"), col("r.__i").as("__ib"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairSupport)
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
}
