package graft

import graft.ext.{EntityResolution, EventAnalytics}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 additions: entity resolution (record linkage) and event-
  * sequence mining.
  *
  * The ER scenario derives a deterministic "dirty registry" from the
  * documents fixture (the m7_key_gate idiom — corrupt a slice via modular
  * arithmetic so both engines can re-derive it): every 7th long-enough
  * document's 40-char text prefix also appears under a synthetic rec_id
  * with ONE character deleted at a key-dependent position (see
  * [[registry]]). The engine must link each typo'd row back to its
  * canonical without an all-pairs scan —
  * [[graft.ext.EntityResolution]]'s delete-1 (FastSS) blocking + exact
  * levenshtein verify, then connected components for entity ids, an
  * incremental refresh, and a two-table best-match probe.
  *
  * The sequence queries are the Markov view of the events stream: the
  * per-user transition matrix (which event follows which, row-normalized
  * to ppm), the top day-leading paths, and per-user L1 surprise against
  * the global matrix — all rollups over ONE shared stored transition-cell
  * relation ([[transitionCells]]) in the same user-time ordering the
  * funnel/session queries already pin. */
object SparkEntryEr {

  /** Synthetic rec_id shift for the dirty-registry derivation: typo'd
    * variants land at doc_id + ShiftBase, and the best-match probe split
    * reads `rec_id >= ShiftBase` as "synthetic". [[registry]] guards the
    * assumption (doc_id < ShiftBase) with an in-row raise_error, so a
    * future fixture large enough to collide fails loudly instead of
    * silently misclassifying clean rows as probes. Mirrored into every
    * ER oracle via [[registrySql]]. */
  private[graft] val ShiftBase = 1000000L

  /** Stored base-entity assignment for the delta query (x_er_delta's
    * operational premise — the prior run's output, not recomputed per
    * execution). */
  private val priorMemo = new graft.PlanMemo

  /** Stored variant index over the current registry version — the ER
    * family's shared artifact (built once, persisted; every ER query
    * probes it instead of re-exploding Σ(len+1) variants per execution). */
  private val vIdxMemo = new graft.PlanMemo

  /** Per-delta-version premise-check results (the cap-crossing guard):
    * one delta-bounded scan per arriving batch, cached for every query
    * that composes against it. */
  private val guardMemo = new graft.PlanMemo

  /** Shared (user, prev, cur, n) transition-cell relation — the sequence
    * family's stored artifact (the unigram/bigram count-relation
    * pattern): ONE corpus lag-window pass serves the transition matrix,
    * the surprise scorer's user and global branches, and any future
    * sequence reader, instead of each branch re-planning the window. */
  private val seqMemo = new graft.PlanMemo
  private def transitionCells(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    seqMemo(e, "seqTransitionCells") {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      e.select(col("user_id"),
          lag("event_type", 1).over(w).as("prev_type"), col("event_type"))
        .where(col("prev_type").isNotNull)
        // reuses the window's user_id partitioning (subset clustering)
        .groupBy("user_id", "prev_type", "event_type")
        .agg(count(lit(1)).as("__n"))
    }
  }
  /** Max in-sequence gap for episode steps: successive episode events may
    * be up to this many POSITIONS apart in the user's timeline (gap 1 =
    * contiguous — the x_event_paths case episodes generalize; intervening
    * noise events up to the gap are skipped). Shared with the oracle. */
  private[graft] val EpisodeMaxGap = 3
  /** Top-k for the episode report (total order, deterministic LIMIT). */
  private[graft] val EpisodeK = 20
  /** Max wall-clock gap for the TIME-bounded episode variant: successive
    * episode steps must land within 6 h of each other (the attribution
    * lookback's band — the fixture's per-user event spacing makes 6 h a
    * genuinely selective funnel window: ~5.5 k qualifying pairs of 10 k
    * events at sf0.01). Shared with the oracle. */
  private[graft] val EpisodeTimeGapMicros = 21600000000L

  /** Ordered per-user event positions — the episode family's stored
    * relation (one (user, ts, event_id) sort per corpus serving any
    * position-window self-join). */
  private val ordMemo = new graft.PlanMemo
  private def orderedEvents(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    ordMemo(e, "seqOrderedEvents") {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      e.select(col("user_id"), col("event_type"),
        row_number().over(w).as("rn"))
    }
  }

  private def storedIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val reg = registry(s, dir)
    (vIdxMemo(reg, "erVariantIndex")(
      graft.ext.EntityResolution.variantIndex(reg)), reg)
  }

  /** Dirty-registry derivation shared by both ER queries (and mirrored
    * in [[registrySql]]): records are document-text prefixes (40 chars —
    * a title-like string with natural entropy, so edit-distance-1
    * collisions between UNRELATED records are rare; a serial-key name
    * like "Customer#000000042" would chain the whole registry into one
    * entity, every neighbor one digit-substitution away). Clean rows
    * keep doc_id as rec_id; every 7th long-enough document adds a
    * variant at rec_id + 10^6 whose name drops the character at
    * key-dependent position (doc_id mod 20) + 5 — a single deletion, so
    * each typo lands at edit distance exactly 1 from its canonical. */
  private[graft] def registry(s: SparkSession, dir: String): DataFrame = {
    val named = Tables.load(s, dir, "documents").where(col("text").isNotNull)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("name"),
        length(col("text")).as("__len"))
    // the synthetic-rec_id shift assumes doc_id < 10^6; a larger fixture
    // would collide clean and typo'd rec_ids and silently misclassify
    // clean rows as probes (while staying oracle-green — both sides share
    // the constant). Loud-failure valve INSIDE the rec_id expression (a
    // separate assert column would be pruned as unused; the Curation
    // weightedSample idiom): any out-of-range doc_id fails the job by name.
    val cleanId = when(col("doc_id") >= ShiftBase, raise_error(concat(
      lit("erRegistry: doc_id "), col("doc_id").cast("string"),
      lit(s" >= $ShiftBase collides with the synthetic rec_id shift — " +
        "raise ShiftBase past the fixture's key range"))).cast("long"))
      .otherwise(col("doc_id"))
    val clean = named.select(cleanId.as("rec_id"), col("name"))
    val dirty = named.where(col("__len") >= 30 && col("doc_id") % 7 === 0)
      .select((col("doc_id") + lit(ShiftBase)).as("rec_id"),
        expr("concat(substring(name, 1, CAST(doc_id % 20 AS INT) + 4), " +
          "substring(name, CAST(doc_id % 20 AS INT) + 6))").as("name"))
    clean.unionByName(dirty)
  }

  private val registrySql: String =
    "reg AS (SELECT doc_id AS rec_id, substr(text, 1, 40) AS name " +
      "FROM documents WHERE text IS NOT NULL " +
      s"UNION ALL SELECT doc_id + $ShiftBase AS rec_id, " +
      "substr(substr(text, 1, 40), 1, (doc_id % 20) + 4) || " +
      "substr(substr(text, 1, 40), (doc_id % 20) + 6) AS name " +
      "FROM documents WHERE text IS NOT NULL AND length(text) >= 30 " +
      "AND doc_id % 7 = 0)"

  /** The delete-1 variant enumeration as SQL — shared by every ER oracle. */
  private def variantsSql(src: String, out: String): String =
    s"$out AS (SELECT rec_id, name, unnest(list_distinct(list_append(" +
      "list_transform(range(1, length(name) + 1), " +
      s"p -> substr(name, 1, p - 1) || substr(name, p + 1)), name))) AS variant FROM $src)"

  /** The delete-1 neighborhood + verified-pair CTEs (FastSS re-derived in
    * SQL — the oracle enumerates the same variants, applies the same
    * `maxBucket` block pruning, and runs the same levenshtein verify the
    * engine does; at fixture scale no block nears the 1024 cap, but the
    * mirror keeps the oracle exact rather than coincidentally equal). */
  private val pairsCte: String =
    registrySql + ", " +
      variantsSql("reg", "v") + ", " +
      "keep AS (SELECT variant FROM v GROUP BY 1 HAVING count(*) <= " +
      s"${EntityResolution.DefaultMaxBucket}), " +
      "vk AS (SELECT v.* FROM v JOIN keep USING (variant)), " +
      "cand AS (SELECT DISTINCT a.rec_id AS rec_a, b.rec_id AS rec_b, " +
      "a.name AS na, b.name AS nb FROM vk a JOIN vk b " +
      "ON a.variant = b.variant AND a.rec_id < b.rec_id), " +
      "p AS (SELECT rec_a, rec_b, CAST(levenshtein(na, nb) AS BIGINT) AS dist " +
      "FROM cand WHERE levenshtein(na, nb) <= 1)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_er_pairs" -> { (s, dir) =>
      // linked record pairs: delete-1 blocked (via the stored variant
      // index), levenshtein-verified — candidate volume Σ(len+1) per
      // record, never all-pairs
      EntityResolution.fuzzyPairsIdx(storedIndex(s, dir)._1)
    },

    "x_er_clusters" -> { (s, dir) =>
      // entity ids: transitive closure over the verified pairs (the CC
      // loop the dedup family already soak-proves logarithmic)
      val (idx, reg) = storedIndex(s, dir)
      EntityResolution.entitiesIdx(idx, reg)
    },

    "x_er_delta" -> { (s, dir) =>
      // incremental linkage: records with rec_id ≡ 3 (mod 10) arrive as
      // the delta; the STORED base assignment (memoized — yesterday's
      // x_er_clusters output, the operational premise) is refreshed by
      // probing the stored variant index with the delta's variants only,
      // then quotient-graph CC. Oracled against the FULL rebuild — the
      // delta == rebuild law, driver-red if the composition diverges.
      val (idx, reg) = storedIndex(s, dir)
      val base = reg.where(col("rec_id") % 10 =!= 3)
      val delta = reg.where(col("rec_id") % 10 === 3)
      val prior = priorMemo(base, "erBaseEntities")(
        EntityResolution.entities(base))
      // the refresh's premise check, OPERATIONAL (r13 item 4): a delta
      // that pushes a block past the cap changes which pairs the rebuild
      // admits and the refresh can't retract — consult the stored
      // BASE-side index (yesterday's — the post-delta index prunes
      // exactly the crossing blocks, so it cannot see them) and refuse
      // loudly rather than compose a silently-divergent assignment. The
      // crossings relation is memoized per DELTA VERSION: a deployment
      // pays the check once per arriving batch, not once per query that
      // reuses it — so reps read the (empty) cached relation while a new
      // delta re-pays the delta-bounded scan.
      val baseIdx = vIdxMemo(base, "erBaseVariantIndex")(
        EntityResolution.variantIndex(base))
      val crossings = guardMemo(delta, "erCapCrossings")(
        EntityResolution.capCrossingsIdx(baseIdx, delta))
      require(crossings.isEmpty,
        "x_er_delta: cap-crossing delta — the refresh cannot retract the " +
          "prior's pairs; rebuild the entity assignment instead")
      EntityResolution.entitiesDeltaIdx(idx, reg, delta, prior)
    },

    "x_er_best_match" -> { (s, dir) =>
      // two-table linkage: the typo'd slice arrives as a probe batch and
      // links to its best CANONICAL row (lowest distance, ties to lowest
      // reference id) against the stored reference-side variant index —
      // the master-table link API, top-1 per probe over a blocked
      // candidate set
      val reg = registry(s, dir)
      val ref = reg.where(col("rec_id") < ShiftBase)
      val probe = reg.where(col("rec_id") >= ShiftBase)
      val refIdx = vIdxMemo(ref, "erRefVariantIndex")(
        EntityResolution.variantIndex(ref))
      EntityResolution.bestMatch(refIdx, probe)
    },

    "x_seq_transitions" -> { (s, dir) =>
      // per-user Markov transition counts, row-normalized to ppm — one
      // rollup over the stored transition-cell relation. Row totals via
      // a window over the COUNTS relation (≤ |alphabet|² rows), not a
      // self-join: a join back onto the counts would plan the subtree
      // twice; the window costs one tiny exchange instead.
      transitionCells(s, dir)
        .groupBy("prev_type", "event_type")
        .agg(sum(col("__n")).as("n_trans"))
        .select(col("prev_type"), col("event_type"), col("n_trans"),
          expr("CAST(n_trans * 1000000 DIV " +
            "sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)").as("ppm"))
    },

    "x_seq_surprise" -> { (s, dir) =>
      // behavioral outliers: per-user L1 distance (ppm) between the
      // user's transition distribution and the corpus-wide one, summed
      // over the full global cell set — a user missing a cell contributes
      // that cell's global mass, computed WITHOUT exploding users×cells:
      // L1(u) = Σ_present |u−g| + (G_total − Σ_present g). All integer
      // (the division-free outlier idiom of x_anomaly_days); top 10 under
      // a total order so the LIMIT is deterministic.
      val cells = transitionCells(s, dir)
      val uc = cells
        .select(col("user_id"), col("prev_type"), col("event_type"),
          expr("CAST(__n * 1000000 DIV sum(__n) OVER " +
            "(PARTITION BY user_id, prev_type) AS BIGINT)").as("__uppm"))
      // global cells (≤ |alphabet|² rows) — derived from the same stored
      // cell relation (Σ over users), broadcast onto the user cells
      val gc = cells.groupBy("prev_type", "event_type")
        .agg(sum(col("__n")).as("__gn"))
        .select(col("prev_type"), col("event_type"),
          expr("CAST(__gn * 1000000 DIV sum(__gn) OVER " +
            "(PARTITION BY prev_type) AS BIGINT)").as("__gppm"))
        // the grand total rides each broadcast cell row (unpartitioned
        // window over ≤ |alphabet|² rows — structurally fine, the
        // compaction-planner pattern) so no scalar cross join is needed
        .withColumn("__gt", expr("sum(__gppm) OVER ()"))
      val joined = uc.join(broadcast(gc), Seq("prev_type", "event_type"))
      joined.groupBy("user_id")
        .agg(sum(abs(col("__uppm") - col("__gppm"))).as("__present_l1"),
          sum(col("__gppm")).as("__present_g"), max(col("__gt")).as("__gt"))
        .select(col("user_id"),
          (col("__present_l1") + col("__gt") - col("__present_g")).as("l1_ppm"))
        .orderBy(col("l1_ppm").desc, col("user_id")).limit(10)
    },

    "x_seq_episodes" -> { (s, dir) =>
      // gap-bounded sequential patterns: top-20 length-3 episodes where
      // each step follows the previous within EpisodeMaxGap POSITIONS of
      // the user's timeline (noise events in between are skipped — the
      // generalization of the contiguous x_event_paths triples). The gap
      // is EXPANDED into explicit (rn + g) keys so every hop is a pure
      // EQUI-join on (user_id, position) — candidate volume gap²·N,
      // linear in the corpus, where the naive user-only join with a
      // range filter would go quadratic per user. Episode LENGTH is a
      // library parameter (EventAnalytics.episodesTopK folds one
      // equi-join leg per step — r14 item 8); all legs share the stored
      // ordered relation.
      EventAnalytics.episodesTopK(orderedEvents(s, dir), EpisodeMaxGap,
        length = 3, topK = EpisodeK)
    },

    "x_seq_episodes_time" -> { (s, dir) =>
      // wall-clock funnels: top-20 length-3 episodes where each step
      // follows the previous within 6 h of EVENT TIME (position gaps
      // can't see elapsed time — a click 3 events later might be a week
      // later). The range predicate becomes an equi-join via banded
      // time buckets of width = the gap (an in-gap successor can only
      // sit in the event's own or the next bucket), so candidate volume
      // is bounded by per-(user, 6h-bucket) occupancy — never per-user
      // quadratic. Oracled against DuckDB's native range join.
      EventAnalytics.episodesTimeTopK(Tables.events(s, dir),
        EpisodeTimeGapMicros, length = 3, topK = EpisodeK)
    },

    "x_seq_top_paths" -> { (s, dir) =>
      // top day-leading paths: first 4 events per (user, day) joined into
      // a path string; global top 20 with a total order (count desc,
      // path) so the LIMIT is deterministic. The rank window and the
      // path agg share the (user_id, day) hash partitioning — one
      // exchange serves both.
      val e = Tables.events(s, dir)
      val day = date_trunc("day", col("ts")).as("day")
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      val ranked = e.select(col("user_id"), day, col("ts"), col("event_id"),
          col("event_type"))
        .select(col("user_id"), col("day"), col("event_type"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 4)
      val paths = ranked.groupBy("user_id", "day")
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(rn, event_type))), " +
            "x -> x.event_type)"), ">").as("path"))
      paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(20)
    }
  )

  /** Full-rebuild transitive closure (recursive CTE) — the oracle for
    * BOTH x_er_clusters and x_er_delta. */
  private val clustersRebuildSql: String =
    s"WITH RECURSIVE $pairsCte, " +
      "edges AS (SELECT rec_a AS src, rec_b AS dst FROM p " +
      "UNION SELECT rec_b, rec_a FROM p), " +
      "walk(id, lbl) AS (SELECT rec_id, rec_id FROM reg " +
      "UNION SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id) " +
      "SELECT id AS rec_id, min(lbl) AS entity_id FROM walk GROUP BY 1"

  def oracleSql: Map[String, String] = Map(

    "x_er_pairs" ->
      (s"WITH $pairsCte SELECT rec_a, rec_b, dist FROM p"),

    "x_er_clusters" -> clustersRebuildSql,

    // the delta == rebuild law: the incremental composition must equal
    // the full-rebuild closure EXACTLY, so it shares the rebuild oracle
    "x_er_delta" -> clustersRebuildSql,

    "x_er_best_match" ->
      (s"WITH $registrySql, " +
        s"ref AS (SELECT * FROM reg WHERE rec_id < $ShiftBase), " +
        s"probe AS (SELECT * FROM reg WHERE rec_id >= $ShiftBase), " +
        variantsSql("ref", "vr") + ", " +
        "rkeep AS (SELECT variant FROM vr GROUP BY 1 HAVING count(*) <= " +
        s"${EntityResolution.DefaultMaxBucket}), " +
        "vrk AS (SELECT vr.* FROM vr JOIN rkeep USING (variant)), " +
        variantsSql("probe", "vp") + ", " +
        "scored AS (SELECT DISTINCT p.rec_id, r.rec_id AS match_id, " +
        "CAST(levenshtein(p.name, r.name) AS BIGINT) AS dist " +
        "FROM vp p JOIN vrk r ON p.variant = r.variant " +
        "WHERE levenshtein(p.name, r.name) <= 1) " +
        "SELECT rec_id, match_id, dist FROM (SELECT *, row_number() OVER (" +
        "PARTITION BY rec_id ORDER BY dist, match_id) AS rn FROM scored) " +
        "WHERE rn = 1"),

    "x_seq_transitions" ->
      ("WITH seq AS (SELECT event_type, lag(event_type) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events), " +
        "c AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n_trans " +
        "FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2), " +
        "t AS (SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS tot FROM c GROUP BY 1) " +
        "SELECT c.prev_type, c.event_type, c.n_trans, " +
        "CAST(c.n_trans * 1000000 // t.tot AS BIGINT) AS ppm " +
        "FROM c JOIN t USING (prev_type)"),

    "x_seq_surprise" ->
      ("WITH tr AS (SELECT user_id, event_type, lag(event_type) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events), " +
        "t AS (SELECT user_id, prev_type, event_type FROM tr WHERE prev_type IS NOT NULL), " +
        "ucn AS (SELECT user_id, prev_type, event_type, CAST(count(*) AS BIGINT) AS n " +
        "FROM t GROUP BY 1, 2, 3), " +
        "uc AS (SELECT user_id, prev_type, event_type, CAST(n * 1000000 // " +
        "sum(n) OVER (PARTITION BY user_id, prev_type) AS BIGINT) AS uppm FROM ucn), " +
        "gcn AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n " +
        "FROM t GROUP BY 1, 2), " +
        "gc AS (SELECT prev_type, event_type, CAST(n * 1000000 // " +
        "sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS gppm FROM gcn), " +
        "gt AS (SELECT CAST(sum(gppm) AS BIGINT) AS g FROM gc), " +
        "j AS (SELECT u.user_id, CAST(sum(abs(u.uppm - g.gppm)) AS BIGINT) AS pl1, " +
        "CAST(sum(g.gppm) AS BIGINT) AS pg FROM uc u JOIN gc g " +
        "USING (prev_type, event_type) GROUP BY 1) " +
        "SELECT user_id, CAST(pl1 + (SELECT g FROM gt) - pg AS BIGINT) AS l1_ppm " +
        "FROM j ORDER BY l1_ppm DESC, user_id LIMIT 10"),

    "x_seq_episodes" ->
      // same position-window semantics, as range-bounded joins (DuckDB's
      // planner handles the small range natively; the engine side uses
      // the expanded equi-join form for shuffle-key locality)
      (s"WITH r AS (SELECT user_id, event_type, row_number() OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) " +
        "SELECT a.event_type AS step1, b.event_type AS step2, " +
        "c.event_type AS step3, CAST(count(*) AS BIGINT) AS n_occurrences " +
        "FROM r a JOIN r b ON b.user_id = a.user_id " +
        s"AND b.rn BETWEEN a.rn + 1 AND a.rn + $EpisodeMaxGap " +
        "JOIN r c ON c.user_id = b.user_id " +
        s"AND c.rn BETWEEN b.rn + 1 AND b.rn + $EpisodeMaxGap " +
        "GROUP BY 1, 2, 3 " +
        s"ORDER BY n_occurrences DESC, step1, step2, step3 LIMIT $EpisodeK"),

    "x_seq_episodes_time" ->
      // DuckDB replays the TIME-gap semantics as native range-bounded
      // joins (strictly-after on (t, event_id), within the gap); the
      // engine side uses the banded-bucket equi-join form for shuffle-key
      // locality — the two derivations are independent, so a banding
      // mistake (an in-gap pair dropped at a bucket boundary) mismatches
      (s"WITH e AS (SELECT user_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id FROM events) " +
        "SELECT a.event_type AS step1, b.event_type AS step2, " +
        "c.event_type AS step3, CAST(count(*) AS BIGINT) AS n_occurrences " +
        "FROM e a JOIN e b ON b.user_id = a.user_id " +
        "AND (b.t > a.t OR (b.t = a.t AND b.event_id > a.event_id)) " +
        s"AND b.t - a.t <= $EpisodeTimeGapMicros " +
        "JOIN e c ON c.user_id = b.user_id " +
        "AND (c.t > b.t OR (c.t = b.t AND c.event_id > b.event_id)) " +
        s"AND c.t - b.t <= $EpisodeTimeGapMicros " +
        "GROUP BY 1, 2, 3 " +
        s"ORDER BY n_occurrences DESC, step1, step2, step3 LIMIT $EpisodeK"),

    "x_seq_top_paths" ->
      ("WITH r AS (SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, " +
        "event_type, row_number() OVER (PARTITION BY user_id, " +
        "date_trunc('day', CAST(ts AS TIMESTAMP)) ORDER BY ts, event_id) AS rn FROM events), " +
        "p AS (SELECT user_id, day, string_agg(event_type, '>' ORDER BY rn) AS path " +
        "FROM r WHERE rn <= 4 GROUP BY 1, 2) " +
        "SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p " +
        "GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20")
  )
}
