package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) as a blocked relational pipeline —
  * the training-data-curation operator that links dirty string records
  * (typo'd names, OCR'd titles, near-identical author strings) to their
  * canonical rows without an all-pairs comparison.
  *
  * Blocking is FastSS-style delete-1 neighborhoods (Bocek et al., "Fast
  * Similarity Search in Large Dictionaries", 2007): every record emits
  * its name plus each single-character-deletion variant; two strings at
  * edit distance ≤ 1 ALWAYS share a variant (equal → the name itself;
  * substitution → both delete the differing position; indel → the short
  * string is a delete-1 of the long one), so an equi-join on the variant
  * column finds every qualifying pair while candidate volume stays
  * Σ(len+1) per record — linear in corpus size, never quadratic. A
  * `levenshtein` verify then discards the false candidates the
  * neighborhood join admits (shared-variant pairs at distance 2).
  *
  * At 100 TB the variant relation is one explode (map-side), the join
  * one hash shuffle on the variant string, and the verify a codegen'd
  * scalar — the same plan family as the MinHash-LSH dedup path
  * ([[Dedup]]), with the same skew valve: ultra-common variants are
  * non-discriminative blocks (a variant shared by k records admits
  * C(k,2) candidates), so buckets past `maxBucket` are EXCLUDED and
  * counted visibly rather than silently joined (InvertedIndex's
  * df-pruning / Dedup's bucket-cap contract). */
object EntityResolution {

  /** Variant-bucket cap: a delete-1 variant shared by more records than
    * this admits a quadratic candidate set and is a non-discriminative
    * block (mass-duplicate strings are exact-dedup's job, not ER's).
    * Excluded buckets are observable via [[stopVariants]]. */
  val DefaultMaxBucket = 1024

  /** The delete-1 neighborhood relation: one row per (rec, variant),
    * where variants are the name itself plus each delete-1 string.
    * Wholly map-side (explode over a codegen'd transform — no UDF).
    * The caller's columns are rebound to fixed aliases FIRST, so the
    * expr() below never interpolates a user column name into SQL text —
    * a name needing backticks (space, dot, reserved word) resolves
    * through col() exactly like idCol does. */
  def delete1Variants(recs: DataFrame, idCol: String = "rec_id",
                      nameCol: String = "name"): DataFrame =
    recs.select(col(idCol).as("rec_id"), col(nameCol).as("name"))
      .select(col("rec_id"), col("name"),
        explode(expr(
          "array_distinct(concat(array(name), transform(" +
            "sequence(1, length(name)), " +
            "p -> concat(substring(name, 1, p - 1), substring(name, p + 1)))))"
        )).as("variant"))

  /** Variants whose bucket exceeds `maxBucket` — the visible exclusion
    * report (what [[fuzzyPairs]] refused to join on). */
  def stopVariants(recs: DataFrame, maxBucket: Int = DefaultMaxBucket,
                   idCol: String = "rec_id", nameCol: String = "name"): DataFrame =
    delete1Variants(recs, idCol, nameCol)
      .groupBy("variant").agg(count(lit(1)).as("bucket_size"))
      .where(col("bucket_size") > maxBucket)

  /** The df-pruned variant INDEX — (variant, rec_id, name) for every
    * surviving block. This is the ER family's stored artifact (the
    * inverted-index analogue): built once per corpus version, persisted,
    * and probed by both the self-join pair search and the delta probe.
    * Bucket sizes over `maxBucket` are pruned here (the skew valve: a
    * windowless two-pass agg on the same shuffle key the joins use). */
  def variantIndex(recs: DataFrame, maxBucket: Int = DefaultMaxBucket,
                   idCol: String = "rec_id", nameCol: String = "name"): DataFrame = {
    val v = delete1Variants(recs, idCol, nameCol)
    val keep = v.groupBy("variant").agg(count(lit(1)).as("__bs"))
      .where(col("__bs") <= maxBucket)
      .select("variant")
    v.join(keep, Seq("variant"))
  }

  /** All record pairs (rec_a < rec_b) within edit distance ≤ `maxDist`,
    * found via delete-1 blocking and verified with `levenshtein`.
    *
    * `maxDist` must be ≤ 1: the delete-1 neighborhood is complete only
    * for distance 1 (deeper distances need delete-k neighborhoods, whose
    * variant count grows combinatorially — at that point MinHash/n-gram
    * Jaccard [[Dedup]] is the right tool, not edit distance). */
  def fuzzyPairs(recs: DataFrame, maxDist: Int = 1,
                 maxBucket: Int = DefaultMaxBucket,
                 idCol: String = "rec_id", nameCol: String = "name"): DataFrame =
    fuzzyPairsIdx(variantIndex(recs, maxBucket, idCol, nameCol), maxDist)

  /** [[fuzzyPairs]] over a prebuilt (persisted/stored) [[variantIndex]] —
    * what repeated executions pay in deployment: one self-join on the
    * index, no variant rebuild. */
  def fuzzyPairsIdx(index: DataFrame, maxDist: Int = 1): DataFrame = {
    require(maxDist >= 0 && maxDist <= 1,
      s"delete-1 blocking is complete only for maxDist ≤ 1 (got $maxDist); " +
        "use Dedup's MinHash/n-gram paths for looser matching")
    val cand = index.select(col("variant"), col("rec_id").as("rec_a"), col("name").as("__na"))
      .join(index.select(col("variant"), col("rec_id").as("rec_b"), col("name").as("__nb")),
        Seq("variant"))
      .where(col("rec_a") < col("rec_b"))
      .select("rec_a", "rec_b", "__na", "__nb")
      .distinct()
    cand.where(levenshtein(col("__na"), col("__nb")) <= maxDist)
      .select(col("rec_a"), col("rec_b"),
        levenshtein(col("__na"), col("__nb")).cast("long").as("dist"))
  }

  /** Entity ids: connected components over [[fuzzyPairs]] (transitive
    * closure — A~B, B~C ⇒ one entity), labeled by the component's
    * minimum rec_id. Reuses the dedup family's large-star/small-star
    * loop, so the O(log n) round bound and the soak evidence carry over. */
  def entities(recs: DataFrame, maxDist: Int = 1,
               maxBucket: Int = DefaultMaxBucket,
               idCol: String = "rec_id", nameCol: String = "name"): DataFrame =
    entitiesFromPairs(fuzzyPairs(recs, maxDist, maxBucket, idCol, nameCol),
      recs, idCol)

  /** [[entities]] over a prebuilt [[variantIndex]]. */
  def entitiesIdx(index: DataFrame, recs: DataFrame, maxDist: Int = 1,
                  idCol: String = "rec_id"): DataFrame =
    entitiesFromPairs(fuzzyPairsIdx(index, maxDist), recs, idCol)

  private def entitiesFromPairs(pairs: DataFrame, recs: DataFrame,
                                idCol: String): DataFrame = {
    val nodes = recs.select(col(idCol).as("doc_id"))
    Dedup.clusters(pairs.select(col("rec_a").as("id_a"), col("rec_b").as("id_b")),
        nodes)
      .select(col("doc_id").as("rec_id"), col("cluster").as("entity_id"))
  }

  /** Pairs with at least one endpoint in `delta`: the incremental probe —
    * the delta's variants equi-join the FULL registry's variant relation
    * (at scale the stored side is the persisted variant index; the
    * iterative work is bounded by the delta). The bucket cap is evaluated
    * over the FULL registry's bucket sizes, exactly as [[fuzzyPairs]]
    * would over base ∪ delta — required for the delta == rebuild law. */
  def fuzzyPairsDelta(all: DataFrame, delta: DataFrame, maxDist: Int = 1,
                      maxBucket: Int = DefaultMaxBucket,
                      idCol: String = "rec_id", nameCol: String = "name"): DataFrame =
    fuzzyPairsDeltaIdx(variantIndex(all, maxBucket, idCol, nameCol), delta,
      maxDist, idCol, nameCol)

  /** [[fuzzyPairsDelta]] over a prebuilt [[variantIndex]] of the FULL
    * registry: the delta's (unpruned) variants probe the index — a
    * delta-side variant whose block was pruned from the index simply
    * finds no partner, which is exactly the cap semantics the full
    * rebuild applies. */
  def fuzzyPairsDeltaIdx(index: DataFrame, delta: DataFrame, maxDist: Int = 1,
                         idCol: String = "rec_id", nameCol: String = "name"): DataFrame = {
    require(maxDist >= 0 && maxDist <= 1, s"delete-1 blocking: maxDist ≤ 1 (got $maxDist)")
    val vDelta = delete1Variants(delta, idCol, nameCol)
    // canonical orientation + symmetric distance, so the (a, b) and
    // (b, a) probe hits collapse under the distinct
    vDelta.select(col("variant"), col("rec_id").as("__ra"), col("name").as("__na"))
      .join(index.select(col("variant"), col("rec_id").as("__rb"), col("name").as("__nb")),
        Seq("variant"))
      .where(col("__ra") =!= col("__rb"))
      .where(levenshtein(col("__na"), col("__nb")) <= maxDist)
      .select(least(col("__ra"), col("__rb")).as("rec_a"),
        greatest(col("__ra"), col("__rb")).as("rec_b"),
        levenshtein(col("__na"), col("__nb")).cast("long").as("dist"))
      .distinct()
  }

  /** Incremental entity refresh: compose a STORED base assignment
    * (`prior`: rec_id → entity_id over the base registry) with the
    * delta-bounded pair probe — the ER analogue of the engine's other
    * delta maintainers (x_cc_delta / x_index_delta / x_pagerank_delta).
    * Equals [[entities]] over the full registry exactly, by
    * [[Dedup.clustersDelta]]'s quotient-graph argument: base-base pairs
    * are already contracted inside the prior's components, and every
    * pair the full rebuild would add beyond them has a delta endpoint —
    * which is precisely [[fuzzyPairsDelta]]'s output. The corpus pays
    * the one prior-label join; the star loop runs on delta-sized input.
    *
    * Cap caveat (shared with every blocked-index delta maintainer): the
    * prior's cap decisions were made over BASE bucket sizes; a delta that
    * pushes a block past `maxBucket` changes which pairs the full rebuild
    * admits, and the refresh cannot retract the prior's pairs — a
    * cap-crossing refresh warrants a rebuild, the same way a
    * cell-imbalanced IVF delta warrants a retrain. [[capCrossings]]
    * computes that predicate cheaply — consult it before trusting the
    * refresh, rebuild when it is non-empty. */
  def entitiesDelta(all: DataFrame, delta: DataFrame, prior: DataFrame,
                    maxDist: Int = 1, maxBucket: Int = DefaultMaxBucket,
                    idCol: String = "rec_id", nameCol: String = "name"): DataFrame =
    entitiesDeltaFromPairs(
      fuzzyPairsDelta(all, delta, maxDist, maxBucket, idCol, nameCol),
      all, prior, idCol)

  /** [[entitiesDelta]] over a prebuilt FULL-registry [[variantIndex]]. */
  def entitiesDeltaIdx(index: DataFrame, all: DataFrame, delta: DataFrame,
                       prior: DataFrame, maxDist: Int = 1,
                       idCol: String = "rec_id", nameCol: String = "name"): DataFrame =
    entitiesDeltaFromPairs(
      fuzzyPairsDeltaIdx(index, delta, maxDist, idCol, nameCol),
      all, prior, idCol)

  /** The rebuild-warranted predicate for [[entitiesDelta]], operational
    * instead of documentation (r13 item): variant blocks that were
    * ADMITTED under the base corpus (base bucket ≤ `maxBucket`) but
    * would be PRUNED by a full rebuild over base ∪ delta (base + delta
    * bucket > `maxBucket`). Pairs the prior contracted through such a
    * block cannot be retracted by the refresh, so a non-empty result
    * means the delta composition may diverge from the rebuild — rebuild
    * instead (the IVF retrain-on-imbalance contract). Cost: the delta's
    * variant explode plus one agg per side joined on the variant key —
    * delta-sized iterative work against the base's bucket-size relation
    * (at scale: a stored side table of the variant index). Returns
    * `(variant, base_n, delta_n)` per crossing block. */
  def capCrossings(base: DataFrame, delta: DataFrame,
                   maxBucket: Int = DefaultMaxBucket,
                   idCol: String = "rec_id", nameCol: String = "name"): DataFrame = {
    val b = delete1Variants(base, idCol, nameCol)
      .groupBy("variant").agg(count(lit(1)).as("base_n"))
    val d = delete1Variants(delta, idCol, nameCol)
      .groupBy("variant").agg(count(lit(1)).as("delta_n"))
    // inner join: a crossing needs delta mass in the block; an
    // all-delta block is pruned identically by refresh and rebuild
    // (nothing admitted either way), so only shared variants can diverge
    b.join(d, Seq("variant"))
      .where(col("base_n") <= maxBucket &&
        col("base_n") + col("delta_n") > maxBucket)
  }

  /** [[capCrossings]] off the prebuilt (pruned) BASE-side [[variantIndex]]
    * — yesterday's index, which a deployment has stored. The base index's
    * pruning loses nothing: a retained block carries its FULL base
    * membership (so base_n is exact), and a pruned block was already
    * over the cap under base alone — admitted nothing into the prior,
    * prunes identically in the rebuild, cannot diverge. So every
    * possible crossing is visible from the pruned base index, at the
    * cost of one delta variant explode + two aggs on the index's own
    * join key. It MUST be the base index, not the post-delta one: a
    * crossing block (base ≤ cap < base+delta) is exactly the block the
    * FULL index prunes, so the full index cannot see it. */
  def capCrossingsIdx(index: DataFrame, delta: DataFrame,
                      maxBucket: Int = DefaultMaxBucket,
                      idCol: String = "rec_id", nameCol: String = "name"): DataFrame = {
    val b = index.groupBy("variant").agg(count(lit(1)).as("base_n"))
    val d = delete1Variants(delta, idCol, nameCol)
      .groupBy("variant").agg(count(lit(1)).as("delta_n"))
    // base_n <= maxBucket mirrors capCrossings exactly: a no-op when
    // maxBucket equals the cap the index was built with (the index holds
    // no over-cap block), but REQUIRED when a caller probes with a
    // smaller cap — without it, base blocks already over that cap (which
    // admitted nothing, so refresh and rebuild prune them identically)
    // would be misreported as crossings (r14 advice)
    b.join(d, Seq("variant"))
      .where(col("base_n") <= maxBucket &&
        col("base_n") + col("delta_n") > maxBucket)
  }

  /** Two-table linkage: each `probe` record's BEST reference match
    * (lowest distance, ties to the lowest reference id — a total order,
    * so the top-1 is deterministic) against a prebuilt reference-side
    * [[variantIndex]]. The master-table link API: "which canonical row
    * is this incoming record?". Candidates are blocked (delete-1
    * neighborhood equi-join), so the per-probe top-1 window runs over a
    * blocked candidate set, not the reference table. Probes with no
    * qualifying match are absent from the output (the caller's 404). */
  def bestMatch(refIndex: DataFrame, probe: DataFrame, maxDist: Int = 1,
                idCol: String = "rec_id", nameCol: String = "name"): DataFrame = {
    require(maxDist >= 0 && maxDist <= 1, s"delete-1 blocking: maxDist ≤ 1 (got $maxDist)")
    val vp = delete1Variants(probe, idCol, nameCol)
    val scored = vp.select(col("variant"), col("rec_id"), col("name").as("__pn"))
      .join(refIndex.select(col("variant"), col("rec_id").as("__mid"),
        col("name").as("__rn")), Seq("variant"))
      .where(levenshtein(col("__pn"), col("__rn")) <= maxDist)
      .select(col("rec_id"), col("__mid"),
        levenshtein(col("__pn"), col("__rn")).cast("long").as("dist"))
      .distinct()
    scored.withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("rec_id"))
          .orderBy(col("dist"), col("__mid"))))
      .where(col("__r") === 1)
      .select(col("rec_id"), col("__mid").as("match_id"), col("dist"))
  }

  private def entitiesDeltaFromPairs(newPairs: DataFrame, all: DataFrame,
                                     prior: DataFrame, idCol: String): DataFrame = {
    val nodes = all.select(col(idCol).as("doc_id"))
    val pr = prior.select(col("rec_id").as("doc_id"), col("entity_id").as("cluster"))
    Dedup.clustersDelta(pr,
        newPairs.select(col("rec_a").as("id_a"), col("rec_b").as("id_b")), nodes)
      .select(col("doc_id").as("rec_id"), col("cluster").as("entity_id"))
  }
}
