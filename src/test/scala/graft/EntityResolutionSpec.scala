package graft

import graft.ext.EntityResolution
import org.apache.spark.sql.functions._

/** Correctness evidence for the delete-1 (FastSS) record-linkage path:
  * an EXHAUSTIVE small-universe ground truth (every string of length
  * 1–3 over {a,b} — completeness of the neighborhood blocking is a
  * theorem only for distance ≤ 1, so test it against brute force, not
  * intuition), plus the skew valve and the transitive-closure contract
  * the entity-id query rests on. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  /** plain reference Levenshtein (DP) — the spec's independent oracle */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocking+verify equals brute force over the exhaustive ≤3-char universe") {
    val strs = (1 to 3).flatMap(l =>
      Seq.fill(l)(Seq("a", "b")).foldLeft(Seq(""))((acc, cs) =>
        acc.flatMap(p => cs.map(p + _))))
    val recs = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("rec_id", "name")
    val got = EntityResolution.fuzzyPairs(recs)
      .select("rec_a", "rec_b", "dist").as[(Long, Long, Long)]
      .collect().toSet
    val want = (for {
      (a, i) <- strs.zipWithIndex; (b, j) <- strs.zipWithIndex
      if i < j && lev(a, b) <= 1
    } yield (i.toLong, j.toLong, lev(a, b).toLong)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "universe must actually contain qualifying pairs")
  }

  test("identical names pair at distance 0") {
    val recs = Seq((1L, "same title"), (2L, "same title"), (3L, "other")).toDF("rec_id", "name")
    val got = EntityResolution.fuzzyPairs(recs).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 2L, 0L)))
  }

  test("shared-variant pairs past distance 1 are verified away") {
    // "abc" and "acb" share delete-1 variants ("ab", "ac") but lev = 2
    val recs = Seq((1L, "abc"), (2L, "acb")).toDF("rec_id", "name")
    assert(EntityResolution.fuzzyPairs(recs).isEmpty)
  }

  test("over-cap variant buckets are excluded from the join and visible in stopVariants") {
    // a mass-duplicate string (cap+2 copies) plus one genuine typo pair
    val dup = (0 until 6).map(i => (100L + i, "mass duplicate"))
    val pair = Seq((1L, "abcd"), (2L, "abce"))
    val recs = (dup ++ pair).toDF("rec_id", "name")
    val pairs = EntityResolution.fuzzyPairs(recs, maxBucket = 3)
      .select("rec_a", "rec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"dup-block pairs must be excluded by the cap, typo pair kept: $pairs")
    val stops = EntityResolution.stopVariants(recs, maxBucket = 3)
      .select("variant").as[String].collect()
    assert(stops.contains("mass duplicate"),
      s"excluded block must be observable: ${stops.take(5).mkString(",")}")
    // and without the cap the dup block pairs normally
    val uncapped = EntityResolution.fuzzyPairs(recs)
    assert(uncapped.count() == 15 + 1) // C(6,2) dup pairs + the typo pair
  }

  test("entities are the transitive closure, labeled by component minimum") {
    // chain: aaaa ~ aaab ~ aabb (ends at distance 2 — linked only through
    // the middle), plus an isolated record
    val recs = Seq((10L, "aaaa"), (11L, "aaab"), (12L, "aabb"), (13L, "zzzz"))
      .toDF("rec_id", "name")
    val ents = EntityResolution.entities(recs)
      .select("rec_id", "entity_id").as[(Long, Long)].collect().toMap
    assert(ents == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 13L), ents.toString)
  }

  test("bestMatch: exact beats near, ties go to the lowest reference id, no-match is absent") {
    val ref = Seq((1L, "alpha title"), (2L, "alphb title"), (5L, "alpha titlx"))
      .toDF("rec_id", "name")
    val probe = Seq(
      (100L, "alpha title"),  // exact (dist 0) must beat the dist-1 refs
      (101L, "alphc title"),  // dist 1 from refs 1 AND 2 → tie → ref 1
      (102L, "zzz unrelated") // no qualifying match → absent
    ).toDF("rec_id", "name")
    val got = EntityResolution.bestMatch(
        EntityResolution.variantIndex(ref), probe)
      .select("rec_id", "match_id", "dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((100L, 1L, 0L), (101L, 1L, 1L)), got.toString)
  }

  test("x_er_best_match: every probe links, typos resolve to a dist-1 canonical") {
    val m = SparkEntry.queries("x_er_best_match")(spark, sf)
    val reg = SparkEntryEr.registry(spark, sf)
    val probes = reg.where(col("rec_id") >= 1000000L).count()
    assert(m.count() == probes, "every injected typo must find a canonical")
    assert(m.where(col("dist") > 1L || col("match_id") >= 1000000L).isEmpty)
  }

  test("incremental linkage equals the full rebuild, including a cross-entity merge") {
    // base holds TWO separate entities ("brydge" and "bridgx" are at
    // distance 2 — unlinked); the delta record "bridge" is at distance 1
    // from BOTH, so the refresh must merge prior components, not just
    // attach new rows — the hard case for any label-composition shortcut
    val base = Seq((1L, "brydge"), (2L, "bridgx"), (10L, "unrelated title"))
      .toDF("rec_id", "name")
    val delta = Seq((100L, "bridge")).toDF("rec_id", "name")
    val all = base.unionByName(delta)
    val prior = EntityResolution.entities(base)
    val pm = prior.select("rec_id", "entity_id").as[(Long, Long)].collect().toMap
    assert(pm == Map(1L -> 1L, 2L -> 2L, 10L -> 10L), s"prior must start split: $pm")
    val refreshed = EntityResolution.entitiesDelta(all, delta, prior)
      .select("rec_id", "entity_id").as[(Long, Long)].collect().toMap
    val rebuilt = EntityResolution.entities(all)
      .select("rec_id", "entity_id").as[(Long, Long)].collect().toMap
    assert(refreshed == rebuilt, s"delta $refreshed != rebuild $rebuilt")
    assert(refreshed == Map(1L -> 1L, 2L -> 1L, 100L -> 1L, 10L -> 10L))
  }

  test("capCrossings flags exactly the deltas whose refresh can diverge from the rebuild") {
    // base block at the cap: "ab" and "ac" share only variant "a"
    // (bucket size 2). With maxBucket = 2 the prior links them. The
    // delta "ad" pushes the "a" bucket to 3 > cap: a full rebuild
    // prunes the block and admits NO pairs, but the refresh cannot
    // retract the prior's link — the documented divergence the
    // detector exists to catch (consult it before trusting a refresh;
    // non-empty ⇒ rebuild).
    val base = Seq((1L, "ab"), (2L, "ac")).toDF("rec_id", "name")
    val delta = Seq((3L, "ad")).toDF("rec_id", "name")
    val all = base.unionByName(delta)
    val crossings = EntityResolution.capCrossings(base, delta, maxBucket = 2)
      .select("variant", "base_n", "delta_n").as[(String, Long, Long)]
      .collect().toSet
    assert(crossings == Set(("a", 2L, 1L)), crossings.toString)
    // the divergence is real: refresh keeps the prior's link, rebuild
    // has none — so a refresher that skips the detector ships wrong labels
    val prior = EntityResolution.entities(base, maxBucket = 2)
    val refreshed = EntityResolution.entitiesDelta(all, delta, prior, maxBucket = 2)
      .select("rec_id", "entity_id").as[(Long, Long)].collect().toMap
    val rebuilt = EntityResolution.entities(all, maxBucket = 2)
      .select("rec_id", "entity_id").as[(Long, Long)].collect().toMap
    assert(rebuilt == Map(1L -> 1L, 2L -> 2L, 3L -> 3L), rebuilt.toString)
    assert(refreshed != rebuilt,
      "if this ever agrees, the refresh learned to retract — update the contract")
    // the deployment form — off the stored BASE index — sees the same
    // crossing (the base index retains at-cap blocks with full
    // membership; the POST-delta index would prune exactly this block
    // and miss it, which is why the guard must read yesterday's index)
    val baseIdx = EntityResolution.variantIndex(base, maxBucket = 2)
    val idxCrossings = EntityResolution.capCrossingsIdx(baseIdx, delta, maxBucket = 2)
      .select("variant", "base_n", "delta_n").as[(String, Long, Long)]
      .collect().toSet
    assert(idxCrossings == crossings, idxCrossings.toString)
    val fullIdx = EntityResolution.variantIndex(all, maxBucket = 2)
    assert(EntityResolution.capCrossingsIdx(fullIdx, delta, maxBucket = 2)
      .where(col("variant") === "a").isEmpty,
      "the post-delta index prunes the crossing block — it must not be the guard's input")
    // a non-crossing delta (block stays within cap) is NOT flagged, and
    // there the delta == rebuild law holds as always
    val okDelta = Seq((4L, "xy")).toDF("rec_id", "name")
    assert(EntityResolution.capCrossings(base, okDelta, maxBucket = 2).isEmpty)
    assert(EntityResolution.capCrossingsIdx(baseIdx, okDelta, maxBucket = 2).isEmpty)
    // an all-delta over-cap block is pruned identically by both paths —
    // not a crossing either
    val newBlock = Seq((5L, "qr"), (6L, "qs"), (7L, "qt")).toDF("rec_id", "name")
    assert(EntityResolution.capCrossings(base, newBlock, maxBucket = 2).isEmpty)
  }

  test("capCrossingsIdx with a cap below the index's build cap doesn't misreport over-cap base blocks") {
    // index built at cap 3 retains the size-3 "a" block ("ab"/"ac"/"ad"
    // all share variant "a"); probing with maxBucket = 2 must NOT report
    // it as a crossing — at cap 2 that base block was already over-cap,
    // admitted nothing into any cap-2 prior, and prunes identically in a
    // cap-2 rebuild (r14 advice: the base_n <= maxBucket predicate the
    // Idx variant used to omit)
    val base = Seq((1L, "ab"), (2L, "ac"), (3L, "ad")).toDF("rec_id", "name")
    val delta = Seq((4L, "ae")).toDF("rec_id", "name")
    val idxCap3 = EntityResolution.variantIndex(base, maxBucket = 3)
    assert(EntityResolution.capCrossingsIdx(idxCap3, delta, maxBucket = 2)
      .where(col("variant") === "a").isEmpty,
      "a base block already over the probe cap is not a crossing")
    // at the matching cap 3 the same delta IS a crossing (3 <= 3 < 4)
    val got = EntityResolution.capCrossingsIdx(idxCap3, delta, maxBucket = 3)
      .select("variant", "base_n", "delta_n").as[(String, Long, Long)]
      .collect().toSet
    assert(got.contains(("a", 3L, 1L)), got.toString)
  }

  test("x_er_delta equals x_er_clusters on the fixture (the shared-oracle law, locally)") {
    val full = SparkEntry.queries("x_er_clusters")(spark, sf)
    val inc = SparkEntry.queries("x_er_delta")(spark, sf)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("x_er fixture scenario: every injected typo links back to its canonical") {
    val pairs = SparkEntry.queries("x_er_pairs")(spark, sf)
    val reg = SparkEntryEr.registry(spark, sf)
    val dirty = reg.where(col("rec_id") >= 1000000L).count()
    val linked = pairs.where(col("rec_b") === col("rec_a") + 1000000L).count()
    assert(dirty > 0, "fixture must inject typos")
    assert(linked == dirty, s"all $dirty typos must link, got $linked")
    // clusters assign every registry row, entity = min member
    val ents = SparkEntry.queries("x_er_clusters")(spark, sf)
    assert(ents.count() == reg.count())
    assert(ents.where(col("entity_id") > col("rec_id")).isEmpty,
      "entity label must be the component minimum")
  }
}
