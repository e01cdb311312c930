package graft.ext

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for pretraining-scale corpora (north-star
  * extension; the reference has no dedup surface — closest is its
  * content-identity MD5 ETag, SURVEY.md §2.4 M2).
  *
  * Scale design: every variant is shuffle-frugal —
  *  - exact dedup is one hash-groupBy (map-side combinable);
  *  - MinHash-LSH shuffles once on band buckets (candidates only — never
  *    the O(n²) pair space) and verifies exact Jaccard only on candidates;
  *  - SimHash emits one 60-bit signature per doc (scan + projection);
  *  - embedding near-dup buckets by random-hyperplane LSH before the exact
  *    cosine.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the lowest id.
    * At 100 TB this is the cheapest possible dedup — one shuffle on a
    * 16-byte key with map-side pre-aggregation. NULL-text rows are
    * excluded: md5(NULL) is NULL and would collapse every contentless doc
    * into one bogus "duplicate" class (SQL itself says NULL ≠ NULL). */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.where(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Soft dedup: instead of DROPPING duplicates, emit a per-doc sampling
    * weight that down-weights each exact-duplicate class to unit total
    * mass — `weight_ppm = 1e6 DIV n_dupes` for a doc in a class of
    * n_dupes (the SoftDeDup idea: repetition carries signal about
    * distribution mass, so reweight rather than discard; integer ppm so
    * the oracle re-derives it exactly). Every non-NULL-text doc reports —
    * the pipeline multiplies these into its sampling rates, so a missing
    * row would silently zero a document. Same one-shuffle shape as
    * [[exact]] (group on the 16-byte content hash) plus the join back,
    * which at 100 TB broadcasts the class-size relation only when the
    * duplicate-class count is dimension-sized — otherwise it is one more
    * hash-keyed shuffle, still never the O(n²) pair space. */
  def softWeights(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val classes = docs.where(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("__h"))
      .agg(count(lit(1)).as("n_dupes"))
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), md5(col(textCol)).as("__h"))
      .join(classes, Seq("__h"))
      .select(col(idCol), col("n_dupes"),
        expr("1000000 DIV n_dupes").as("weight_ppm"))
  }

  /** The memoized positional k-gram relation `(idCol, pos, gram)` — a
    * corpus-version artifact shared by [[exactSubstringSpans]] and
    * [[cdcChunks]] (one explode pass serves both). */
  private def posGramTable(docs: DataFrame, k: Int, textCol: String,
                           idCol: String): DataFrame =
    gramMemo(docs, graft.PlanMemo.tag("grams", textCol, idCol, k)) {
      val toks = tokens(col(textCol))
      docs.where(col(textCol).isNotNull)
        .select(col(idCol), explode(when(size(toks) >= k,
          transform(sequence(lit(1), size(toks) - (k - 1)),
            i => struct(i.cast("long").as("pos"),
              concat_ws(" ", slice(toks, i, lit(k))).as("gram"))))
          .otherwise(array().cast("array<struct<pos:bigint,gram:string>>"))).as("g"))
        .select(col(idCol), col("g.pos").as("pos"), col("g.gram").as("gram"))
    }

  /** Exact-substring duplicate spans (the suffix-array dedup of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022, re-expressed relationally): find every MAXIMAL token span
    * that some other document also contains verbatim, at k-token
    * granularity. A span of ≥ k tokens is cross-doc duplicated iff every
    * one of its k-grams is — so positional k-grams stand in for suffix
    * arrays: grams seen in ≥ 2 distinct docs mark their positions
    * covered, and merging overlapping/adjacent covered intervals yields
    * the maximal spans (start/end are 1-based token positions,
    * inclusive). Intra-doc repetition alone does NOT mark a span (that is
    * repetition scoring's domain, [[Curation.repetitionMetrics]]).
    *
    * Scale: one shuffle to aggregate grams (map-side combinable min/max —
    * never a distinct-count), one inner join back to positions (build
    * side is one row per duplicated gram; a boilerplate mega-gram skews
    * the probe side but inner joins are AQE-skew-splittable, unlike the
    * LeftSemi in has_child), and the island merge runs under a window
    * PARTITIONED BY doc — per-doc state only, no global ordering. Grams
    * ship as strings for oracle parity; at 100 TB swap the join key for
    * [[graft.functions.TextFunctions.seededHash]] (DuckDB-reproducible)
    * to shuffle 8 bytes instead of k words. */
  def exactSubstringSpans(docs: DataFrame, k: Int = 8, textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"k-gram width must be >= 2, got $k")
    val grams = posGramTable(docs, k, textCol, idCol)
    val dup = grams.groupBy("gram")
      .agg(min(col(idCol)).as("d1"), max(col(idCol)).as("d2"))
      .where(col("d1") =!= col("d2")).select("gram")
    val covered = grams.join(dup, Seq("gram")).select(col(idCol), col("pos"))
    mergeCoveredSpans(covered, k, idCol)
  }

  /** Merge covered `(idCol, pos)` k-gram start positions into MAXIMAL
    * inclusive token spans (1-based) — the island merge shared by
    * [[exactSubstringSpans]] and [[decontaminateSpans]]. Windows are
    * doc-partitioned: per-doc state only, no global ordering. */
  private def mergeCoveredSpans(covered: DataFrame, k: Int,
                                idCol: String): DataFrame = {
    val prevEnd = max(col("pos") + (k - 1)).over(
      Window.partitionBy(col(idCol)).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, -1))
    val islands = covered
      .withColumn("brk",
        when(col("pos") > coalesce(prevEnd, lit(-2L)) + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col(idCol), col("island"))
      .agg(min("pos").as("span_start"), (max("pos") + (k - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Substring-level benchmark decontamination (the form Lee et al. and
    * most eval-hygiene pipelines actually apply): report every MAXIMAL
    * verbatim token span (≥ k tokens) that a non-benchmark document
    * shares with ANY benchmark document — with its exact 1-based
    * positions, so the caller can excise the leaked passage instead of
    * dropping the whole doc. Complements [[Curation.decontaminate]]'s
    * distinct-n-gram OVERLAP COUNT: that gauges how contaminated a doc
    * is; this localizes the contamination. A span qualifies iff every
    * one of its k-grams occurs in the benchmark side, mirroring the
    * cross-doc rule of [[exactSubstringSpans]] with "some other doc"
    * replaced by "some benchmark doc".
    *
    * Scale: reads the SAME memoized positional k-gram artifact (no new
    * corpus pass); the benchmark gram set is one distinct over the
    * benchmark slice (small by definition); the probe back is one inner
    * gram join (AQE-skew-splittable); the island merge is doc-local. */
  def decontaminateSpans(docs: DataFrame, isBench: Column, k: Int = 8,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame =
    // the span REPORT is itself a memoized corpus-version artifact (not
    // just the gram table under it): [[exciseSpans]] starts from exactly
    // this relation, so without the memo the report's gram join re-ran
    // once for the report query and once more inside every excision —
    // r11 benched the pair at 4.5 s for one 2.2 s derivation. The
    // isBench predicate is part of the tag (a different benchmark split
    // is a different report).
    spanMemo(docs, graft.PlanMemo.tag("deconSpans",
      isBench.toString, k, textCol, idCol)) {
      val grams = posGramTable(docs, k, textCol, idCol)
      val benchIds = docs.where(isBench).select(col(idCol).as("__bid"))
      val benchGrams = grams.join(benchIds, grams(idCol) === col("__bid"))
        .select("gram").distinct()
      val corpusGrams = grams.join(benchIds, grams(idCol) === col("__bid"), "left_anti")
      val covered = corpusGrams.join(benchGrams, Seq("gram"))
        .select(col(idCol), col("pos"))
      mergeCoveredSpans(covered, k, idCol)
    }

  /** The remediation [[decontaminateSpans]] localizes for: rebuild each
    * contaminated document's text WITHOUT the leaked passages, instead
    * of dropping the document (dropping loses the clean majority of a
    * long doc over one quoted benchmark item). Tokens whose 1-based
    * position falls inside any leaked span are excised; the rest rejoin
    * in order. Only contaminated docs report (the clean corpus is
    * unchanged by definition — emitting it would rewrite 100 TB to edit
    * a sliver). One shuffle beyond the span derivation: spans aggregate
    * per doc, join back to the doc row, and the excision itself is one
    * nested higher-order expression — no explode, no per-token rows.
    * `n_removed` (= Σ span_tokens, exact because maximal spans are
    * disjoint) lets the caller audit total excised volume.
    *
    * REPRESENTATION: spans are positions in the NORMALIZED token stream
    * (`TextFunctions.tokens`: lowercased, whitespace-collapsed — the
    * stream every token-level operator here works in), so `text_clean`
    * is that normalized stream re-joined, not the original raw text with
    * a window cut out. Pipelines tokenize downstream anyway; a caller
    * who must preserve raw bytes should treat the span REPORT
    * ([[decontaminateSpans]]) as the product and map positions back
    * through an offset-preserving tokenizer of their own. */
  def exciseSpans(docs: DataFrame, isBench: Column, k: Int = 8,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spans = decontaminateSpans(docs, isBench, k, textCol, idCol)
      .groupBy(col(idCol))
      .agg(collect_list(array(col("span_start"), col("span_end"))).as("__sps"),
        sum(col("span_tokens")).as("n_removed"))
    val toks = tokens(col(textCol))
    docs.join(spans, Seq(idCol))
      .select(col(idCol), col("n_removed"),
        concat_ws(" ", filter(toks, (t, i) =>
          !exists(col("__sps"), s =>
            (i + 1) >= s.getItem(0) && (i + 1) <= s.getItem(1))))
          .as("text_clean"))
  }

  /** Content-defined chunking (LBFS/FastCDC family, token granularity):
    * a chunk boundary falls wherever the rolling-window content hash —
    * here the k-gram hash at each position — lands in a fixed residue
    * class (`gh % boundaryMod == 0`, expected chunk ≈ boundaryMod
    * grams). Boundaries depend only on LOCAL content, so an insertion
    * early in a document shifts every fixed-size chunk but re-aligns
    * content-defined ones within a window — the property that makes CDC
    * the storage-dedup chunker. No min/max length normalization (a
    * per-doc fold the analysis doesn't need; the raw rule keeps the
    * oracle one window expression).
    *
    * Reads the SAME memoized positional k-gram artifact as
    * [[exactSubstringSpans]] — no extra corpus pass. One doc-partitioned
    * running-sum window labels chunks (per-doc state only), one
    * map-side-combinable agg forms `(sig = bit_xor(gh), n_grams)` chunk
    * signatures, and the corpus-wide signature frequency join flags
    * chunks whose content recurs anywhere. Output per doc:
    * `(idCol, n_chunks, n_shared_chunks)`. */
  def cdcChunks(docs: DataFrame, k: Int = 8, boundaryMod: Int = 16,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"k-gram width must be >= 2, got $k")
    require(boundaryMod >= 2, s"boundaryMod must be >= 2, got $boundaryMod")
    val grams = posGramTable(docs, k, textCol, idCol)
    val withH = grams.withColumn("gh",
      graft.functions.TextFunctions.baseShingleHash(col("gram")))
    val run = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val chunks = withH
      .withColumn("b", when(col("gh") % boundaryMod === 0, 1L).otherwise(0L))
      .withColumn("chunk", sum(col("b")).over(run))
      .groupBy(col(idCol), col("chunk"))
      .agg(count(lit(1)).as("n_grams"), expr("bit_xor(gh)").as("sig"))
    val freq = chunks.groupBy("sig", "n_grams").agg(count(lit(1)).as("cnt"))
    chunks.join(freq, Seq("sig", "n_grams"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_shared_chunks"))
  }

  /** Per-doc MinHash signature (k affine minima over hashed n-word
    * shingles — one md5 per shingle), from the memoized signature table.
    * Synchronized across BOTH memo steps so [[invalidate]] cannot
    * interleave between them and strand a just-swept session's rebuild. */
  def minhashSignatures(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", k: Int = 16, shingleN: Int = 3): DataFrame =
    synchronized { sigTable(shingleTable(docs, textCol, idCol, shingleN), idCol, k) }

  // Shared-artifact memos: shingle/signature tables are persisted ONCE per
  // distinct (input plan, params) and reused by every caller — repeated
  // benchmark reps and the lsh→jaccard pipeline hit the same entries
  // instead of stacking duplicate cache registrations. Keys use the
  // CANONICALIZED logical plan, so structurally-equal reads of the same
  // parquet dedupe even when the DataFrame instances differ. Guarded by
  // the object lock so a concurrent [[invalidate]] cannot race a rebuild
  // into an untracked cache entry.
  private val shingleMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String, String, Int), DataFrame]()
  // keyed on (session, canonicalized shingle plan, k) — NOT DataFrame
  // identity — so a caller passing a structurally-equal but fresh shingle
  // DataFrame hits the same entry instead of stacking one persist per call
  private val sigMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      Int), DataFrame]()
  // LSH candidate pairs are consumed by three queries (the pair listing,
  // the Jaccard verify, the cluster closure) — in production a materialized
  // candidates table, here the same plan-keyed persist
  private val candMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      Int, Int, Double, Int), DataFrame]()

  private def repersist(df: DataFrame): DataFrame = {
    // rebuilt transparently if something (e.g. clearCache) dropped it
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist()
    df
  }

  // positional k-gram relation for exact-substring span dedup: the
  // explode is the dominant cost of the query, and the relation is a
  // corpus-level artifact (at 100 TB: a stored table beside the corpus,
  // rebuilt per corpus version) — memoized like the shingle/signature
  // tables, swept via the PlanMemo registry
  private val gramMemo = new graft.PlanMemo

  // decontamination span REPORT (gram join + island merge over the gram
  // artifact): shared verbatim between the report query and every
  // excision — a per-(corpus, bench-split) artifact like the tables above
  private val spanMemo = new graft.PlanMemo

  /** Release this session's memoized shingle/signature/gram/candidate
    * tables (cache entries included) — the valve long-lived multi-tenant
    * sessions need so the shared-artifact memos cannot accumulate
    * unboundedly. The shingle/signature/candidate maps stay hand-rolled
    * (not [[graft.PlanMemo]]) because [[minhashSignatures]] needs the
    * two-step build and this sweep to exclude each other under ONE
    * monitor; the gram memo sweeps here too so direct callers of this
    * valve release everything Dedup memoized, not only the
    * registry-swept subset. */
  def invalidate(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    gramMemo.invalidate(spark)
    val ci = candMemo.entrySet().iterator()
    while (ci.hasNext) {
      val e = ci.next()
      if (e.getKey._1 eq spark) { e.getValue.unpersist(); ci.remove() }
    }
    val si = sigMemo.entrySet().iterator()
    while (si.hasNext) {
      val e = si.next()
      if (e.getKey._1 eq spark) { e.getValue.unpersist(); si.remove() }
    }
    val hi = shingleMemo.entrySet().iterator()
    while (hi.hasNext) {
      val e = hi.next()
      if (e.getKey._1 eq spark) { e.getValue.unpersist(); hi.remove() }
    }
  }

  /** Shingle sets, persisted: the expensive split/distinct/md5 pipeline
    * runs once; every downstream expression reads the materialized arrays.
    * Without this boundary Catalyst's project collapsing inlines the
    * pipeline into each of the k seed-minima and every band key —
    * measured ~30× slower. At 100 TB this persists as a signatures table
    * on storage instead of executor memory; the shape is identical. */
  private def shingleTable(docs: DataFrame, textCol: String, idCol: String,
                           shingleN: Int): DataFrame = synchronized {
    val key = (docs.sparkSession, docs.queryExecution.analyzed.canonicalized,
      textCol, idCol, shingleN)
    repersist(shingleMemo.computeIfAbsent(key, _ =>
      // hashed shingle SET, sorted+distinct (the contract of the merge-scan
      // Jaccard kernel), built by the fused codegen kernel in one pass;
      // disk-backed (ArtifactStore) — the stored signatures table
      graft.ArtifactStore.getOrBuildDf(docs.sparkSession,
        graft.ArtifactStore.dfKey(
          graft.PlanMemo.tag("shingles", textCol, idCol, shingleN), Seq(docs)))(
        docs.select(col(idCol),
          graft.plans.ShingleExpression.hashedShingles(tokens(col(textCol)), shingleN).as("hs")))))
  }

  /** Public shared-artifact accessor to the memoized hashed-shingle table
    * (`idCol`, `hs: array<long>` — sorted distinct md5-mod-P gram hashes).
    * Callers outside the dedup family (e.g.
    * [[graft.ext.Curation.decontaminate]]) reuse the SAME persisted
    * artifact instead of re-deriving the tokenize+shingle+hash pipeline. */
  def hashedShingleTable(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id", shingleN: Int = 3): DataFrame =
    shingleTable(docs, textCol, idCol, shingleN)

  /** Per-doc MinHash signature table over a (memoized) shingle table. */
  private def sigTable(sh: DataFrame, idCol: String, k: Int): DataFrame = synchronized {
    val key = (sh.sparkSession, sh.queryExecution.analyzed.canonicalized, k)
    repersist(sigMemo.computeIfAbsent(key, _ =>
      sh.select(col(idCol), minhashFromHashes(col("hs"), k).as("sig"))))
  }

  /** MinHash-LSH candidate pairs with estimated Jaccard ≥ `minEst`.
    *
    * explode band keys → self-join per bucket (the only shuffle, on the
    * band key) → distinct pairs → estimate = matching signature positions /
    * k. The candidate set is linear in the number of true near-dups, not
    * quadratic in corpus size.
    *
    * Skew guard: a band bucket larger than `maxBucket` is exactly the
    * mega-duplicate cluster dedup exists to find, and an all-pairs
    * self-join inside it is O(n²) — quadratic in the very thing that
    * grows. Oversized buckets therefore degrade to STAR pairs around the
    * bucket's min-id member: (anchor, other) for every other member,
    * O(n) per bucket. Star edges BYPASS the `minEst` pre-filter and go
    * straight to downstream verification — the anchor shares the bucket
    * with every member but need not share `minEst` of the full signature,
    * and dropping its edges would disconnect members whose own pairwise
    * edges were never emitted. The capped trade-off, stated honestly:
    * within a mega-bucket, two NON-anchor members similar to each other
    * but to nothing else are connected only if they also reach the anchor
    * at verification; a bucket that is one near-dup class (the common
    * mega-bucket cause) clusters identically via the anchor. Buckets at
    * or under the cap keep exact all-pairs semantics (the oracle-checked
    * path at test scale).
    */
  def lshCandidates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                    k: Int = 16, bands: Int = 4, shingleN: Int = 3,
                    minEst: Double = 0.5, maxBucket: Int = DefaultMaxBucket): DataFrame =
    synchronized {
      lshCandidatesFrom(shingleTable(docs, textCol, idCol, shingleN), idCol, k, bands,
        minEst, maxBucket)
    }

  /** Band buckets beyond this size switch from all-pairs to star pairs. */
  val DefaultMaxBucket: Int = 4096

  private def lshCandidatesFrom(sh: DataFrame, idCol: String, k: Int, bands: Int,
                                minEst: Double, maxBucket: Int): DataFrame = synchronized {
    val key = (sh.sparkSession, sh.queryExecution.analyzed.canonicalized,
      k, bands, minEst, maxBucket)
    repersist(candMemo.computeIfAbsent(key, _ =>
      buildCandidates(sh, idCol, k, bands, minEst, maxBucket)))
  }

  private def buildCandidates(sh: DataFrame, idCol: String, k: Int, bands: Int,
                              minEst: Double, maxBucket: Int): DataFrame = {
    val rowsPerBand = k / bands
    // NULL signatures (docs with fewer than shingleN words) carry no LSH
    // signal — concat_ws would fold their band keys into one constant
    // md5("") key, co-bucketing every short doc into the largest buckets
    // in the job just to discard their pairs later. Drop them up front.
    val sigs = sigTable(sh, idCol, k).where(col("sig").isNotNull)
    val banded = sigs.withColumn("band", explode(bandKeys(col("sig"), bands, rowsPerBand)))
    // per-bucket size + anchor (min id, with its signature) in ONE pass;
    // the stats side is one row per bucket — AQE broadcasts it, so tagging
    // every banded row costs no extra shuffle beyond the band-key exchange
    // the join below needs anyway
    val stats = banded.groupBy("band").agg(
      count(lit(1)).as("__n"),
      min(struct(col(idCol).as("id"), col("sig").as("sig"))).as("__anchor"))
    val tagged = banded.join(stats, Seq("band"))
    val small = tagged.where(col("__n") <= maxBucket)
    val a = small.alias("a")
    val b = small.alias("b")
    val allPairs = a.join(b, col("a.band") === col("b.band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"), lit(false).as("__star"))
    // anchor is the bucket minimum, so id_a < id_b holds by construction
    val starPairs = tagged.where(col("__n") > maxBucket && col(idCol) =!= col("__anchor.id"))
      .select(col("__anchor.id").as("id_a"), col(idCol).as("id_b"),
        col("__anchor.sig").as("sig_a"), col("sig").as("sig_b"), lit(true).as("__star"))
    // a pair can surface from several bands (and as both all-pairs and
    // star); collapse to one row, keeping the star flag if ANY band set it
    allPairs.unionByName(starPairs)
      .groupBy("id_a", "id_b")
      .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"),
        max(col("__star")).as("__star")) // sigs are constant per id
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          t => t)).cast("double") / k)
      // star edges skip the estimate gate — anchor↔member similarity can
      // be low even inside a genuine duplicate class; verification decides
      .where(col("est_jaccard") >= minEst || col("__star"))
      .select("id_a", "id_b", "est_jaccard")
  }

  /** n-gram Jaccard verification on candidate pairs: joins the shingle
    * sets back and computes exact Jaccard (the LSH estimate promotes to
    * the true value only for the candidate set). */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", shingleN: Int = 3,
                        minJaccard: Double = 0.8,
                        k: Int = 16, bands: Int = 4,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (sh, cands) = synchronized {
      val s = shingleTable(docs, textCol, idCol, shingleN)
      (s, lshCandidatesFrom(s, idCol, k, bands, minEst = 0.3, maxBucket))
    }
    // exact Jaccard over the hashed shingle sets (equal to the string-set
    // value up to md5 collisions) via the O(n+m) codegen merge kernel
    cands
      .join(sh.select(col(idCol).as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("jaccard",
        graft.functions.DetRound.round6(graft.plans.ArrayExpressions.sortedJaccard(col("hs_a"), col("hs_b"))))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Incremental dedup: match an INCOMING batch against the STORED corpus
    * — the ingest-time question ("is this new doc a duplicate of anything
    * we already hold?") that a full-corpus self-join cannot answer
    * affordably per batch. The stored side contributes only its INDEXES
    * (md5 hash set, memoized shingle/signature tables — at cluster scale,
    * tables maintained on storage): no stored raw text is rescanned.
    *
    * Exact matches (identical text) join the 16-byte hash set; near
    * matches band-join the incoming signatures against the stored band
    * index (join work ∝ |batch| × bucket occupancy, bounded by the batch
    * size — the self-join mega-bucket cap protects the OTHER path; here
    * the batch side bounds every bucket product) and verify exact
    * shingle-set Jaccard via the O(n+m) merge kernel. One row per matched
    * incoming doc: the best stored match (exact wins over near; then
    * highest Jaccard, then lowest stored id). */
  def dedupeAgainstStored(stored: DataFrame, incoming: DataFrame,
                          textCol: String = "text", idCol: String = "doc_id",
                          k: Int = 16, bands: Int = 4, shingleN: Int = 3,
                          minJaccard: Double = 0.8, minEst: Double = 0.3): DataFrame = {
    val rowsPerBand = k / bands
    val sHash = stored.groupBy(md5(col(textCol)).as("h")).agg(min(col(idCol)).as("match_id"))
    val exact = incoming.select(col(idCol), md5(col(textCol)).as("h"))
      .join(sHash, "h")
      .select(col(idCol), col("match_id"), lit("exact").as("kind"),
        lit(1.0).as("jaccard"))
    val (sSh, iSh, sSig, iSig) = synchronized {
      val s = shingleTable(stored, textCol, idCol, shingleN)
      val i = shingleTable(incoming, textCol, idCol, shingleN)
      (s, i, sigTable(s, idCol, k), sigTable(i, idCol, k))
    }
    def banded(sig: DataFrame) = sig.where(col("sig").isNotNull)
      .withColumn("band", explode(bandKeys(col("sig"), bands, rowsPerBand)))
    val cands = banded(iSig).alias("i")
      .join(banded(sSig).alias("s"), col("i.band") === col("s.band"))
      .select(col(s"i.$idCol").as("in_id"), col(s"s.$idCol").as("st_id"),
        col("i.sig").as("sig_i"), col("s.sig").as("sig_s"))
      .distinct()
      .withColumn("est",
        size(filter(zip_with(col("sig_i"), col("sig_s"), (x, y) => x === y),
          t => t)).cast("double") / k)
      .where(col("est") >= minEst)
    val verified = cands
      .join(iSh.select(col(idCol).as("in_id"), col("hs").as("hs_i")), "in_id")
      .join(sSh.select(col(idCol).as("st_id"), col("hs").as("hs_s")), "st_id")
      .withColumn("jaccard",
        graft.functions.DetRound.round6(graft.plans.ArrayExpressions.sortedJaccard(col("hs_i"), col("hs_s"))))
      .where(col("jaccard") >= minJaccard)
    val bestNear = verified
      .withColumn("__r", row_number().over(Window.partitionBy(col("in_id"))
        .orderBy(col("jaccard").desc, col("st_id"))))
      .where(col("__r") === 1)
      .select(col("in_id").as(idCol), col("st_id").as("match_id"),
        lit("near").as("kind"), col("jaccard"))
    exact.unionByName(
      bestNear.join(exact.select(idCol), Seq(idCol), "left_anti"))
  }

  /** Connected components over near-dup pairs: the cluster closure a real
    * dedup job needs (pairs alone can't answer "keep one per class" —
    * a~b, b~c must collapse a, b, c together even when a~c was never
    * emitted). Alternating large-star/small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC 2014):
    * large-star hangs every neighbor larger than a node off that node's
    * local minimum; small-star re-hangs each node's smaller neighbors
    * (and itself) off the same minimum. Each round halves tree heights,
    * so ANY graph — including the adversarial long chains (serial
    * boilerplate edits) the earlier diameter-bounded min-label
    * propagation refused — converges in O(log n) rounds to a star forest
    * whose roots are the component minima. Each half-round is one keyed
    * min-aggregation (map-side combinable) plus one join, both on
    * dup-mass-sized edge data only (isolated corpus nodes never enter the
    * loop); `localCheckpoint` truncates the iterative lineage. Edge count
    * never grows past the bidirectional input (each emitted edge replaces
    * the one it came from), so a round costs what the candidate-pair set
    * costs regardless of iteration.
    *
    * Output: (`idCol`, `cluster`) for EVERY node — the cluster id is the
    * smallest member id, so `cluster == id` selects the kept
    * representatives. */
  def clusters(pairs: DataFrame, nodes: DataFrame, idCol: String = "doc_id",
               maxIter: Int = 40): DataFrame =
    clustersWithRounds(pairs, nodes, idCol, maxIter)._1

  /** Representative selection over a [[clusters]] assignment: per
    * duplicate class keep the BEST member — highest `scoreCol`, ties to
    * the lowest id (a total order, so the choice is hash-stable
    * cross-engine) — rather than the arbitrary min-id the cluster label
    * happens to be. This is the curation step that decides which copy of
    * a near-dup class actually trains: dropping to the label keeps
    * whichever document got the smallest ingest id; keeping the
    * longest/highest-quality copy is the published practice.
    *
    * Plan: one id-keyed equi-join of the assignment with the quality
    * relation, a per-class top-1 window (partition-bounded — a class's
    * rows are its membership, which the candidate generator's band cap
    * already bounds) and the class-size rollup sharing the cluster key.
    *
    * Output: one row per class — (`cluster`, `kept_doc`, score under its
    * original name, `n_members`). */
  def keepBest(assignment: DataFrame, quality: DataFrame, scoreCol: String,
               idCol: String = "doc_id"): DataFrame = {
    val j = assignment.select(col(idCol), col("cluster"))
      .join(quality.select(col(idCol), col(scoreCol)), Seq(idCol))
    val sz = j.groupBy("cluster").agg(count(lit(1)).as("n_members"))
    val byQuality = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col(scoreCol).desc, col(idCol))
    j.withColumn("__rn", row_number().over(byQuality))
      .where(col("__rn") === 1)
      .join(sz, Seq("cluster"))
      .select(col("cluster"), col(idCol).as("kept_doc"), col(scoreCol),
        col("n_members"))
  }

  /** [[clusters]] plus the number of alternating rounds the star loop
    * actually ran — the observable SkewSpec pins O(log n) convergence on
    * (rounds ≪ diameter for a chain fixture). */
  private[graft] def clustersWithRounds(pairs: DataFrame, nodes: DataFrame,
                                        idCol: String = "doc_id",
                                        maxIter: Int = 40): (DataFrame, Int) = {
    // canonical undirected edge set, oriented (larger u, smaller v);
    // self-loops dropped. All loop state lives in this orientation so the
    // fixpoint test is plain set equality.
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v")).distinct()

    // large-star: per node u over ALL neighbors, m = min(Γ(u) ∪ {u});
    // emit (v, m) for each strictly-larger neighbor v. Connectivity is
    // preserved because the dropped smaller-neighbor edges re-emit from
    // the smaller endpoint's own perspective. The output is oriented but
    // NOT deduplicated — its only consumer is smallStar, whose min
    // aggregations are duplicate-insensitive and whose own output runs
    // through canon's distinct; skipping the intermediate distinct saves
    // one exchange per round (the loop is job-latency-bound on the tiny
    // converged edge sets real dup graphs produce).
    def largeStar(e: DataFrame): DataFrame = {
      val bi = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bi.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      bi.where(col("v") > col("u")).join(mins, "u")
        .select(greatest(col("v"), col("m")).as("u"), least(col("v"), col("m")).as("v"))
        .where(col("u") =!= col("v"))
    }

    // small-star: per node u over its SMALLER neighbors N(u), m = min;
    // emit (v, m) for each v ∈ N(u) ∪ {u} — re-rooting u's subtree at m.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("m"))
      canon(e.join(mins, "u").select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins.select(col("u"), col("m").as("v"))))
    }

    var edges = canon(pairs.select(col("id_a").as("u"), col("id_b").as("v")))
      .localCheckpoint(false)
    // LAZY checkpoints (r17): the per-round count is the loop control
    // anyway, and counting a lazy checkpoint materializes its cache on
    // the way — so each round pays ONE blocking job (the count) instead
    // of the former eager-materialize + count pair. The counts gate the
    // equality check: both sides are DISTINCT canonical sets, so
    // (a) unequal cardinality ⇒ not converged, no join needed at all,
    // and (b) equal cardinality means next ⊆ edges ⟺ next == edges —
    // ONE anti-join, not two. On a converging graph most rounds change
    // the edge count, so the typical round pays zero fixpoint-check jobs.
    var nEdges = edges.count()
    var i = 0
    var done = nEdges == 0L
    while (i < maxIter && !done) {
      val next = smallStar(largeStar(edges)).localCheckpoint(false)
      val nNext = next.count()
      done = nNext == nEdges &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edges = next
      nEdges = nNext
      i += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"star CC did not converge in $maxIter rounds — impossible for " +
          "any graph with < 2^(maxIter/2) nodes; check for NULL ids in pairs")
    // fixpoint is a star forest rooted at component minima: the edge set
    // IS the non-root label map
    val out = nodes.select(col(idCol).as("id"))
      .join(edges.select(col("u").as("id"), col("v").as("__cl")), Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("__cl"), col("id")).as("cluster"))
    (out, i)
  }

  /** Incremental connected components — refresh a stored [[clusters]]
    * assignment after an edge DELTA without re-running the star loop
    * over the corpus-sized pair set. The prior labels are component
    * minima, so contracting each prior component to its label gives a
    * QUOTIENT graph whose edges are the delta pairs mapped through the
    * prior assignment (endpoints unseen by the prior run label as
    * themselves); running [[clusters]] on that delta-bounded quotient
    * and composing the relabel map back over the prior assignment equals
    * a full rebuild over base ∪ delta edges exactly (labels stay the
    * overall min id: every quotient node is its base component's min, and
    * quotient CC takes the min of those). This is the graph analogue of
    * x_index_delta / x_knn_ivf_delta / x_pagerank_delta: the O(log n)
    * iterative work runs on |delta| edges, the corpus pays ONE pass — the
    * prior-assignment join — and the relabel map (only labels the delta
    * MERGED, almost always ≪ the corpus) broadcasts.
    *
    * `prior` is a previous [[clusters]] output (`idCol`, `cluster`) over
    * the base edges; `newPairs` the since-arrived `(id_a, id_b)` edges;
    * `nodes` the full current node set (prior nodes ∪ any new ones). */
  def clustersDelta(prior: DataFrame, newPairs: DataFrame, nodes: DataFrame,
                    idCol: String = "doc_id", maxIter: Int = 40): DataFrame = {
    val lbl = prior.select(col(idCol).as("__id"), col("cluster").as("__lbl"))
    // current label of every node: prior assignment, self for new nodes
    val labeled = nodes.select(col(idCol).as("__id"))
      .join(lbl, Seq("__id"), "left")
      .select(col("__id"), coalesce(col("__lbl"), col("__id")).as("__lbl"))
    // quotient edges: delta pairs mapped endpoint → current label; pairs
    // inside one prior component vanish here, so the star loop's input is
    // bounded by the delta's cross-component mass
    // materialized (eager, delta-bounded rows): qe feeds the star loop,
    // `touched`, AND the relabel join — left lazy, each consumer would
    // re-plan the whole newPairs+labeled subtree (the print-level plan
    // blow-up x_cc_delta's budgets used to absorb); the checkpoint costs
    // one delta-sized pass and truncates all three lineages
    val qe = newPairs
      .join(labeled.select(col("__id"), col("__lbl").as("__la")),
        col("id_a") === col("__id"), "left").drop("__id")
      .join(labeled.select(col("__id"), col("__lbl").as("__lb")),
        col("id_b") === col("__id"), "left").drop("__id")
      .select(coalesce(col("__la"), col("id_a")).as("id_a"),
        coalesce(col("__lb"), col("id_b")).as("id_b"))
      .where(col("id_a") =!= col("id_b"))
      .localCheckpoint(true)
    val touched = qe.select(col("id_a").as("__q"))
      .unionByName(qe.select(col("id_b").as("__q"))).distinct()
    // CC over the quotient: (label → merged component min label); only
    // rows that actually RELABEL matter, and that set is delta-bounded —
    // broadcast it over the corpus-sized prior assignment
    val relabel = clusters(qe, touched, "__q", maxIter)
      .where(col("__q") =!= col("cluster"))
      .select(col("__q").as("__from"), col("cluster").as("__to"))
    labeled.join(broadcast(relabel), col("__lbl") === col("__from"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__to"), col("__lbl")).as("cluster"))
  }

  /** Per-doc SimHash (near-identical docs land on close signatures;
    * equal signatures → near-certain dups). */
  def simhashes(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), simhash(col(textCol)).as("simhash"))

  /** Embedding-cosine near-dup pairs above `minCos`, bucketed by
    * random-hyperplane LSH first so the exact cosine join is per-bucket.
    * `exactPairs` skips bucketing for oracle-checkable inputs — it
    * BROADCASTS the corpus, which bounds it to broadcast-sized inputs by
    * construction (the honest contract: a corpus too big to broadcast is
    * far too big for O(n²) all-pairs anyway — use the LSH path). */
  def embeddingNearDups(embs: DataFrame, vecCol: String = "embedding",
                        idCol: String = "vec_id", minCos: Double = 0.45,
                        exactPairs: Boolean = false, nPlanes: Int = 4): DataFrame = {
    val pairs = if (exactPairs) {
      // all-pairs, parallelized: broadcast one side and nested-loop over
      // the other side's partitions. (A constant-bucket equi-join would
      // hash EVERY row into one partition and serialize the O(n²) cosine
      // work on a single task.) The probe side is spread to full
      // parallelism first: a corpus small enough for all-pairs is often
      // one input split, which would put the O(n²) work on one task; the
      // repartition moves only n narrow rows to unlock n²/P per task.
      val spread = embs.repartition(embs.sparkSession.sparkContext.defaultParallelism)
      spread.alias("a").join(broadcast(embs.alias("b")),
        col(s"a.$idCol") < col(s"b.$idCol"))
    } else {
      // NULL / empty / off-dim vectors hash to a degenerate short bucket,
      // and ZERO-NORM vectors all share the all-zeros bucket (every
      // projection is 0 > 0 = false) — either way they cannot clear the
      // cosine threshold (no defined angle), so drop them up front instead
      // of letting a degenerate flood co-bucket into one mega-bucket of
      // O(m²) wasted NULL-cosine pairs (SkewSpec pins this)
      val base = embs.withColumn("__b", VectorFunctions.hyperplaneBucket(col(vecCol),
          nPlanes, VectorFunctions.probeDim(embs, vecCol)))
        .where(length(col("__b")) === nPlanes &&
          VectorFunctions.norm(col(vecCol)) > 0)
      base.alias("a").join(base.alias("b"),
        col("a.__b") === col("b.__b") && col(s"a.$idCol") < col(s"b.$idCol"))
    }
    pairs
      .withColumn("cos", VectorFunctions.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .where(col("cos") > minCos)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        graft.functions.DetRound.round6(col("cos")).as("cos_sim"))
  }

  /** Verification hook (the [[Similarity.lastLearned]] contract): the
    * centroids the most recent [[semanticNearDups]] run learned — its OWN
    * stash, so the x_knn_ivf oracle's centroids are never clobbered. */
  @volatile var lastLearnedSem: Seq[(Long, Array[Float])] = Nil

  /** [[semanticDecontaminate]]'s own centroid stash (same contract). */
  @volatile var lastLearnedXsem: Seq[(Long, Array[Float])] = Nil

  /** Semantic decontamination — the embedding-level eval-leakage check
    * n-gram [[Curation.decontaminate]] cannot do: a benchmark item
    * PARAPHRASED into the training corpus shares no shingles but sits at
    * high cosine. Cells are learned on the CORPUS side (seeded Lloyd's),
    * both sides take the map-only literal assignment, and the exact
    * cosine runs only across-sides within a cell; each flagged corpus
    * vector reports its best bench match (max cosine, min-id tiebreak).
    *
    * Scale shape: the pair space is Σ\|corpus cell\|·\|bench cell\| —
    * the bench side is eval-set-sized, so this is ~\|corpus\|·(bench/
    * kCells) pairs, one cell-keyed exchange, no broadcast requirement on
    * either side. Approximate recall across cell boundaries (the ANN
    * contract), deterministic computation given the stashed centroids. */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
                            kCells: Int = 8, iters: Int = 2, minCos: Double = 0.45,
                            vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val dim = VectorFunctions.probeDim(corpus, vecCol)
    def valid(df: DataFrame) = df.where(col(vecCol).isNotNull &&
      size(col(vecCol)) === dim && !exists(col(vecCol), _.isNull) &&
      VectorFunctions.norm(col(vecCol)) > 0)
    val cents = Similarity.learnedCentroids(valid(corpus), kCells, iters, vecCol, idCol,
      stash = false)
    lastLearnedXsem = cents
    val c = Similarity.assignCells(valid(corpus), cents, vecCol)
      .select(col("cell"), col(idCol), col(vecCol))
    val b = Similarity.assignCells(valid(bench), cents, vecCol)
      .select(col("cell"), col(idCol).as("__bid"), col(vecCol).as("__bv"))
    c.join(b, Seq("cell"))
      .withColumn("cos", graft.functions.DetRound.round6(VectorFunctions.cosine(col(vecCol), col("__bv"))))
      .where(col("cos") > minCos)
      .groupBy(col(idCol))
      .agg(max(struct(col("cos"), (-col("__bid")).as("nb"))).as("__m"))
      .select(col(idCol), (-col("__m.nb")).as("bench_id"), col("__m.cos").as("cos_sim"))
  }

  /** SemDeDup-shape semantic dedup (cluster-then-prune): learn `kCells`
    * centroids with the deterministic seeded Lloyd's of
    * [[Similarity.learnedCentroids]], assign every valid embedding to its
    * nearest cell with the map-only literal arg-max of
    * [[Similarity.assignCells]], then run the exact cosine ONLY within a
    * cell and emit `(vec_id, keeper_id, cos_to_keeper)` for every row
    * with a smaller-id in-cell neighbor above `minCos` — keep the min id,
    * drop the rest.
    *
    * Scale shape: the pair space is Σ|cell|² instead of n² — at real
    * scale `kCells` grows with the corpus (n/1k-ish cells) so cells stay
    * bounded, and the only corpus shuffle is the one cell-keyed exchange
    * feeding the in-cell join (assignment itself is a projection).
    * Degenerate vectors (NULL / off-dim / NULL-element / zero-norm) have
    * no defined angle and opt out up front — same contract as
    * [[embeddingNearDups]]'s LSH path. Like the ANN family: approximate
    * RECALL (cross-cell near-dups are missed by design), deterministic
    * COMPUTATION given the learned centroids (which the oracle replays as
    * literals via [[lastLearnedSem]]). */
  def semanticNearDups(embs: DataFrame, kCells: Int = 8, iters: Int = 2,
                       minCos: Double = 0.45, vecCol: String = "embedding",
                       idCol: String = "vec_id"): DataFrame = {
    val dim = VectorFunctions.probeDim(embs, vecCol)
    val valid = embs.where(col(vecCol).isNotNull && size(col(vecCol)) === dim &&
      !exists(col(vecCol), _.isNull) && VectorFunctions.norm(col(vecCol)) > 0)
    val cents = Similarity.learnedCentroids(valid, kCells, iters, vecCol, idCol,
      stash = false)
    lastLearnedSem = cents
    val withCell = Similarity.assignCells(valid, cents, vecCol)
      .select(col("cell"), col(idCol), col(vecCol))
    // round to 6dp BEFORE thresholding (the semanticDecontaminate
    // convention): Spark evaluates the cosine in float-sourced doubles
    // and DuckDB's replay in its own FP path, so a pair sitting within
    // FP noise of minCos could otherwise flip membership between the
    // run and its oracle
    val pairs = withCell.alias("a").join(withCell.alias("b"),
        col("a.cell") === col("b.cell") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos", graft.functions.DetRound.round6(VectorFunctions.cosine(col(s"a.$vecCol"), col(s"b.$vecCol"))))
      .where(col("cos") > minCos)
    // keeper of a dropped row = its SMALLEST qualifying in-cell neighbor;
    // min over (keeper_id, cos) structs is deterministic (one cos per pair)
    pairs
      .groupBy(col(s"b.$idCol").as(idCol))
      .agg(min(struct(col(s"a.$idCol").as("keeper_id"),
        col("cos").as("cos_to_keeper"))).as("__k"))
      .select(col(idCol), col("__k.keeper_id").as("keeper_id"),
        col("__k.cos_to_keeper").as("cos_to_keeper"))
  }
}
