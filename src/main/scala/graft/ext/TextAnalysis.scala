package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level text analysis (north-star extension): language-ID,
  * quality scoring, token counting, fingerprinting — all single-pass
  * projections over the documents table (no shuffle at any scale). */
object TextAnalysis {

  /** Shared derived relations — (doc, bigram, c) counts, (doc, term, c)
    * counts, exploded (doc, pos, line) rows — memoized per (session,
    * canonicalized doc plan, tag) and PERSISTED: the
    * [[InvertedIndex.postings]] shared-artifact contract. Each consumer
    * needs its relation twice (an LM's model numerators and per-doc
    * scoring; global line dedup's keeper aggregation and join-back);
    * without the boundary Catalyst re-inlines the tokenize/split explode
    * into both branches, doubling the heaviest stage — and because the
    * aggregate branch exchanges partial-agg rows, not raw rows,
    * ReuseExchange can never dedupe them. At 100 TB these are stored
    * tables derived once per corpus version. */
  private val relMemo = new graft.PlanMemo

  /** Cross-engine-deterministic 6dp rounding — the one formula of record
    * lives in [[graft.functions.DetRound]]; this is just a local alias. */
  private def r6(c: Column): Column = graft.functions.DetRound.round6(c)

  private def memoized(docs: DataFrame, tag: String)(build: => DataFrame): DataFrame =
    relMemo(docs, tag)(build)

  private[ext] def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    memoized(docs, graft.PlanMemo.tag("bg", textCol)) {
      docs.select(col("doc_id"),
          explode(Curation.ngramsAll(TextFunctions.tokens(col(textCol)), 2)).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
    }

  private[graft] def termCounts(docs: DataFrame, textCol: String): DataFrame =
    memoized(docs, graft.PlanMemo.tag("tc", textCol)) {
      docs.select(col("doc_id"), explode(TextFunctions.tokens(col(textCol))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    }

  private[ext] def explodedLines(docs: DataFrame, sep: String, textCol: String,
                                 idCol: String): DataFrame =
    memoized(docs, graft.PlanMemo.tag("lines", sep, textCol, idCol)) {
      docs.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
    }

  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("pred_lang", TextFunctions.langId(col(textCol)))

  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("__q", TextFunctions.qualityMetrics(col(textCol)))
      .select(col("*"), col("__q.*")).drop("__q")

  def withTokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens", size(TextFunctions.tokens(col(textCol))).cast("long"))
      // BPE-ish subword estimate: words + punctuation clusters + digit runs
      // counted separately (a cheap, deterministic proxy for tokenizer load)
      .withColumn("n_subtokens",
        size(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]{1,8}|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long"))

  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))

  /** Intra-document exact line dedup (the C4/Gopher preprocessing step:
    * boilerplate lines — headers, nav bars, cookie banners — repeat
    * verbatim inside a page and are dropped keeping the FIRST
    * occurrence). Per doc: split on `sep`, keep each distinct line's
    * minimum position, reassemble in original order, and report the
    * duplicate-line fraction for downstream quality gating.
    *
    * Shape: posexplode → one (doc, line)-keyed aggregation (map-side
    * combinable; the repetitionMetrics scaladoc's argument against
    * O(len·distinct) per-row HOFs applies verbatim here) → one per-doc
    * assembly whose `collect_list` is bounded by document length — the
    * renest contract, not an unbounded group. Reassembly order is by
    * first-occurrence position, so the result is deterministic under any
    * partitioning. Zero-line docs (empty text) keep one empty line: SQL
    * split of '' is [''] in both engines. */
  def dedupeLines(docs: DataFrame, sep: String = "\n", textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val lines = explodedLines(docs, sep, textCol, idCol)
    lines.groupBy(col(idCol), col("line"))
      .agg(min("pos").as("pos"), count(lit(1)).as("cnt"))
      .groupBy(idCol)
      .agg(sum("cnt").as("n_lines"), count(lit(1)).as("n_unique"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s("line"))).as("cleaned"))
      .select(col(idCol), col("n_lines"), col("n_unique"),
        r6(lit(1.0) - col("n_unique").cast("double") / col("n_lines"))
          .as("dup_line_frac"),
        col("cleaned"))
  }

  /** The COMPLETE Gopher document filter (Rae et al.'21 §A1.1) as ONE
    * relation — a pipeline applies "the Gopher filter" with a single
    * join-free read instead of stitching the word-statistics rules
    * (x_quality_gopher) and the line rules by hand. One row per doc with
    * every rule verdict in EXACT integer form (each ratio threshold
    * cross-multiplied, so no division or float exists on either engine):
    *
    *  - word count ∈ [50, 100k]; mean word length ∈ [3, 10]
    *    (3n ≤ Σlen ≤ 10n); ≥80% alphabetic words (5·n_alpha ≥ 4n);
    *    ≤10% symbol words (10·n_sym ≤ n); ≥2 distinct stop words —
    *    the sufficient statistics fold off the shared memoized
    *    [[termCounts]] relation, zero new tokenizes;
    *  - duplicate-line fraction ≤ 30% (10·(n_lines − n_unique) ≤
    *    3·n_lines); ≤30% of lines end in an ellipsis; ≤10% of lines
    *    start with a bullet — off the shared memoized [[explodedLines]]
    *    relation via the dedupeLines two-level agg shape (per-(doc, line)
    *    counts first, so a mega-duplicated line combines map-side to one
    *    row before the doc-level fold).
    *
    * Docs whose text yields no tokens are absent (the x_quality_gopher
    * contract — there is nothing to measure); `pass` is the conjunction
    * of all eight rules. */
  def gopherRules(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val st = termCounts(docs, textCol).groupBy("doc_id").agg(
      sum("c").as("n_words"),
      sum(length(col("term")).cast("long") * col("c")).as("sum_len"),
      sum(when(col("term").rlike("[a-z]"), col("c")).otherwise(0L)).as("n_alpha"),
      sum(when(col("term").contains("#") || col("term").contains("..."),
        col("c")).otherwise(0L)).as("n_symbol"),
      count_distinct(when(col("term").isin(stops: _*), col("term")))
        .as("stop_hits"))
    val perLine = explodedLines(docs, "\n", textCol, "doc_id")
      .groupBy(col("doc_id"), col("line")).agg(count(lit(1)).as("__c"))
    val ls = perLine.groupBy("doc_id").agg(
      sum("__c").as("n_lines"), count(lit(1)).as("n_unique"),
      sum(when(col("line").rlike("\\.\\.\\.$"), col("__c")).otherwise(0L))
        .as("n_ellipsis"),
      sum(when(col("line").rlike("^[\\-\\*\\u2022]"), col("__c")).otherwise(0L))
        .as("n_bullet"))
    st.join(ls, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("sum_len"), col("n_alpha"),
        col("n_symbol"), col("stop_hits"), col("n_lines"), col("n_unique"),
        col("n_ellipsis"), col("n_bullet"),
        (col("n_words") >= 50L && col("n_words") <= 100000L).as("f_word_count"),
        (lit(3L) * col("n_words") <= col("sum_len") &&
          col("sum_len") <= lit(10L) * col("n_words")).as("f_mean_len"),
        (lit(5L) * col("n_alpha") >= lit(4L) * col("n_words")).as("f_alpha_words"),
        (lit(10L) * col("n_symbol") <= col("n_words")).as("f_symbol"),
        (col("stop_hits") >= 2L).as("f_stopwords"),
        (lit(10L) * (col("n_lines") - col("n_unique")) <= lit(3L) * col("n_lines"))
          .as("f_dup_lines"),
        (lit(10L) * col("n_ellipsis") <= lit(3L) * col("n_lines"))
          .as("f_ellipsis_lines"),
        (lit(10L) * col("n_bullet") <= col("n_lines")).as("f_bullet_lines"))
      .withColumn("pass",
        col("f_word_count") && col("f_mean_len") && col("f_alpha_words") &&
          col("f_symbol") && col("f_stopwords") && col("f_dup_lines") &&
          col("f_ellipsis_lines") && col("f_bullet_lines"))
  }

  /** CORPUS-WIDE exact line dedup (C4's global boilerplate removal: a
    * cookie banner appearing in a million pages survives exactly once):
    * each distinct line is kept only at its first occurrence corpus-wide —
    * the minimum `(doc_id, pos)` — and dropped everywhere else. Returns
    * per doc the original/kept line counts and the reassembled text
    * (empty string, not NULL, when every line was seen earlier).
    *
    * Shape: ONE explode — the [[explodedLines]] memoized relation feeds
    * BOTH branches (without the memo boundary Catalyst re-inlines the
    * split+posexplode into each, and the aggregate branch exchanges
    * partial-agg rows so ReuseExchange cannot merge them — two corpus
    * scans would execute; shared with [[dedupeLines]], so running both
    * operators costs one explode total) — then TWO-PHASE first-occurrence
    * selection: a line-keyed `min(struct(doc, pos))` aggregation
    * (map-side partial combine collapses a mega-duplicated line to ONE
    * row per source partition before the exchange, so the final min reads
    * ≤ #partitions rows per line) and a join-back that flags each
    * occurrence as keeper or duplicate. The earlier one-shuffle window form
    * (`row_number() over (partition by line)`) routed EVERY copy of a
    * hot line through a single task — precisely the key distribution
    * this operator exists for (corpus-wide boilerplate) — and window
    * skew is not AQE-splittable. The join-back IS: a skewed line
    * partition splits under AQE skew-join (and when the distinct-line
    * set is small the keeper side broadcasts, costing no line shuffle at
    * all). SkewSpec pins plan shape (no Window operator) and output
    * equality under a every-doc-shares-one-line corpus. Keeper choice is
    * the lexicographic struct min — identical to the window's
    * `orderBy(doc, pos)` first row. */
  def dedupeLinesGlobal(docs: DataFrame, sep: String = "\n",
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lines = explodedLines(docs, sep, textCol, idCol)
    val keepers = lines.groupBy("line")
      .agg(min(struct(col(idCol).as("d"), col("pos").as("p"))).as("__k"))
      .select(col("line"), col("__k.d").as("__kd"), col("__k.p").as("__kp"))
    val flagged = lines.join(keepers, Seq("line"))
      .withColumn("__kept", col(idCol) === col("__kd") && col("pos") === col("__kp"))
    flagged.groupBy(idCol)
      .agg(count(lit(1)).as("n_lines"),
        sum(col("__kept").cast("long")).as("n_kept"),
        concat_ws(sep, transform(
          array_sort(collect_list(when(col("__kept"), struct(col("pos"), col("line"))))),
          s => s("line"))).as("cleaned"))
  }

  /** Unigram-LM surprisal per document: mean −log₂ p(token) under the
    * corpus's own unigram distribution — the classic cheap LM-quality
    * signal (gibberish and boilerplate sit far from the corpus mode in
    * bits/token). The ONE corpus explode lives in the memoized
    * [[termCounts]] relation (the bigram-LM pattern): model, corpus total
    * and per-doc scoring all derive from (doc_id, term, c) — scoring sums
    * c·lp over distinct (doc, term) rows, exactly equal (decimal
    * arithmetic is exact) to summing lp per occurrence. The corpus token
    * total is ONE number — bounded driver-side metadata, the same
    * contract as the IVF centroids — so it is collected and inlined as a
    * literal rather than joined (a 1-row join constant-folds into the
    * nested-loop cross join PlanAuditSpec bans, and a partition-less
    * window funnels the vocabulary through one task); the collecting
    * action scans the PERSISTED count relation, not the corpus — before
    * the memo it forced a second tokenize of every document. The per-doc
    * sum runs over DECIMAL(18,6) so it is exact and ORDER-INDEPENDENT —
    * a double sum would vary with shuffle-merge order across cluster
    * runs (and against the oracle). Like TF/DF, the vocabulary join is
    * not broadcast-forced: AQE broadcasts when the vocabulary genuinely
    * fits. */
  def unigramSurprisal(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val cnt = termCounts(docs, textCol)
    // corpus token total: ONE number of driver metadata. The 1-row total
    // relation is itself memoized+persisted (and swept with everything
    // else, so it can never go stale against the count relation it
    // derives from), and the per-call action is a read of that cached
    // single row — not a corpus aggregation, and never under the memo
    // monitor (the memo body stays pure plan construction).
    // Empty corpus -> sum is NULL; 1 keeps the plan valid (no rows flow).
    val totalRow = memoized(docs, graft.PlanMemo.tag("ugtot", textCol)) {
      cnt.agg(sum("c").as("t"))
    }.first()
    val total = if (totalRow.isNullAt(0)) 1L else totalRow.getLong(0)
    // the MODEL — (term, lp) under the corpus unigram MLE — is itself a
    // memoized corpus-level artifact (a stored table at 100 TB, rebuilt
    // once per corpus version): scoring reps pay one join + one agg, not
    // a model rebuild
    val lp = memoized(docs, graft.PlanMemo.tag("uglm", textCol, total)) {
      val freq = cnt.groupBy("term").agg(sum("c").as("cnt"))
      freq.select(col("term"),
        r6(log(2.0, col("cnt").cast("double") / lit(total.toDouble))).as("lp"))
    }
    cnt.join(lp, Seq("term"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        sum(col("c") * col("lp").cast("decimal(18,6)")).as("__s"))
      .select(col("doc_id"), col("n_tokens"),
        r6(-col("__s").cast("double") / col("n_tokens")).as("bits_per_token"))
  }

  /** Bigram-LM surprisal per document: mean −log₂ p(w₂|w₁) under the
    * corpus's own conditional MLE bigram model — the next strength tier
    * of LM-quality signal above [[unigramSurprisal]] (word-salad text
    * has plausible unigrams but improbable transitions). The history
    * count c(w₁·) is derived FROM the bigram table itself (sum of c₂
    * over bigrams sharing the prefix — no second corpus pass), so the
    * model costs one bigram explode + two map-side-combinable aggs, and
    * scoring is one join on the bigram key. Same determinism contract as
    * the unigram form: 6dp-rounded conditional log-probs, per-doc
    * DECIMAL(18,6) sums. Docs with < 2 tokens have no bigrams and drop
    * out. */
  def bigramSurprisal(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // ONE corpus explode: the memoized (doc_id, bg, c) relation feeds
    // both the model (c2 = Σc per bigram) and scoring. Scoring sums
    // c·lp over DISTINCT (doc, bigram) rows — exactly equal (decimal
    // arithmetic is exact) to summing lp per occurrence, with join input
    // shrunk to the distinct-bigram stream.
    val cnt = bigramCounts(docs, textCol)
    // conditional-MLE model (bg, lp): memoized corpus artifact, same
    // contract as the unigram model above
    val lp = memoized(docs, graft.PlanMemo.tag("bglm", textCol)) {
      val num = cnt.groupBy("bg").agg(sum("c").as("c2"))
      val hist = num.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
        .agg(sum("c2").as("c1"))
      num.select(col("bg"),
          substring_index(col("bg"), " ", 1).as("w1"), col("c2"))
        .join(hist, Seq("w1"))
        .select(col("bg"),
          r6(log(2.0, col("c2").cast("double") / col("c1").cast("double"))).as("lp"))
    }
    cnt.join(lp, Seq("bg"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
        sum(col("c") * col("lp").cast("decimal(18,6)")).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        r6(-col("__s").cast("double") / col("n_bigrams")).as("bits_per_bigram"))
  }

  /** Top-k collocations: word pairs whose co-occurrence beats their
    * unigram expectation — PMI's argument as an INTEGER lift in ppm,
    * `lift_ppm = n₁₂ · N · 10⁶ div (n₁ · n₂)` (the log is monotone, so
    * ranking by lift ranks by PMI without a float in sight; the product
    * runs in DECIMAL(38,0) / HUGEINT so the chain is bit-replayable).
    * Both marginals derive FROM the corpus bigram relation itself
    * (prefix and suffix sums — no second corpus pass, the
    * [[bigramSurprisal]] pattern), the corpus bigram total is one
    * driver-metadata scalar read off the persisted 1-row memo, and
    * `minCount` floors the support so singleton noise (two hapaxes
    * meeting once score the maximal lift) never crowds the report. The
    * final rank runs over the support-filtered pair relation under a
    * total order (lift desc, then the pair), so the LIMIT is
    * deterministic. The classic curation read on a corpus: boilerplate
    * templates, glued entities and stock phrases surface at the top. */
  def collocations(docs: DataFrame, textCol: String = "text",
                   minCount: Long = 5, k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1, s"minCount=$minCount k=$k")
    val cnt = bigramCounts(docs, textCol)
    // corpus-level (w1, w2, n12) — a stored artifact like the LM models
    val pairs = memoized(docs, graft.PlanMemo.tag("colloc", textCol)) {
      cnt.groupBy("bg").agg(sum("c").as("n12"))
        .select(substring_index(col("bg"), " ", 1).as("w1"),
          substring_index(col("bg"), " ", -1).as("w2"), col("n12"))
    }
    // corpus bigram total: ONE driver scalar off the persisted relation
    // (the unigramSurprisal contract — bounded metadata, never a corpus
    // aggregation per call)
    val totalRow = memoized(docs, graft.PlanMemo.tag("colloctot", textCol)) {
      pairs.agg(sum("n12").as("t"))
    }.first()
    val total = if (totalRow.isNullAt(0)) 1L else totalRow.getLong(0)
    val left = pairs.groupBy("w1").agg(sum(col("n12")).as("n1"))
    val right = pairs.groupBy("w2").agg(sum(col("n12")).as("n2"))
    pairs.where(col("n12") >= minCount)
      .join(left, Seq("w1")).join(right, Seq("w2"))
      .select(col("w1"), col("w2"), col("n12"), col("n1"), col("n2"),
        expr(s"CAST(CAST(n12 AS DECIMAL(38,0)) * $total * 1000000 " +
          "DIV (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Top-k most frequent terms per group (vocabulary reporting / frequent
    * items). Two map-side-combinable aggregations reduce the corpus to
    * per-(group, term) counts, then two-phase top-k (the [[Similarity]] /
    * stratified-sampling contract): a pre-rank within (group, physical
    * partition) — a heavy-tailed vocabulary never funnels through one
    * window task — and a final rank over the ≤ partitions·k survivors.
    * Any globally top-k row is top-k within its own partition, so the
    * output is independent of partitioning. Deterministic: ties break on
    * the term itself. */
  def topTerms(docs: DataFrame, groupCol: String = "lang", k: Int = 10,
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(groupCol, "term").agg(count(lit(1)).as("cnt"))
    val local = Window.partitionBy(col(groupCol), col("__pid"))
      .orderBy(col("cnt").desc, col("term"))
    counts
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrk", row_number().over(local)).where(col("__lrk") <= k)
      .withColumn("rk", row_number()
        .over(Window.partitionBy(col(groupCol)).orderBy(col("cnt").desc, col("term")))
        .cast("long"))
      .where(col("rk") <= k)
      .drop("__pid", "__lrk")
  }

  // ---------- BPE merge training (Sennrich et al. 2016, public algorithm) ----------

  /** Verification hook for the BPE oracles — the most recent stashed
    * training result. `graft.Verify` runs every query BEFORE dumping
    * oracle SQL (the [[Similarity.lastLearned]] contract), so the oracle
    * can pin the learned merges as literals and then INDEPENDENTLY
    * re-derive each round's argmax in DuckDB — the pins carry state
    * between rounds, every choice is still externally verified. */
  @volatile var lastBpeMerges: Seq[(String, String, Long)] = Nil

  /** Learned-merge memo: (session, canonicalized corpus plan, params) →
    * merge table. Training is deterministic (integer pair counts, total
    * tie-break order), so a hit returns exactly what retraining would;
    * the value is a few dozen strings of driver metadata — at 100 TB the
    * stored tokenizer artifact beside the corpus. A self-registering
    * [[graft.ModelMemo]], so [[graft.Caches.invalidate]] sweeps it
    * structurally and training runs outside any map lock. */
  private val bpeMemo = new graft.ModelMemo[Seq[(String, String, Long)]]

  /** A word as its initial BPE symbols: characters plus the end-of-word
    * sentinel (the marker that keeps merges from crossing word
    * boundaries and distinguishes suffix from infix pairs). */
  private def charSymbols(w: Column): Column =
    concat(array_remove(split(w, ""), ""), array(lit("</w>")))

  /** One merge applied to a symbol array — the greedy left-to-right
    * pair rewrite as a single fold: append each symbol, collapsing
    * `…, l | r` into `…, lr` as it arrives. Fold ≡ greedy for a single
    * pair per pass: a collapse could only re-trigger if `l + r == l`,
    * i.e. an empty `r`, which character symbols can't produce (the spec
    * fuzzes this equivalence against a reference scan). The same fold
    * runs in the DuckDB oracle via `list_reduce`. */
  private def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) >= 1 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  private[graft] def bpeApplyMerges(w: Column, merges: Seq[(String, String, Long)]): Column =
    merges.foldLeft(charSymbols(w)) { case (c, (l, r, _)) => mergeFold(c, l, r) }

  /** Test hook: the fold on a pre-split symbol array (BpeSpec fuzzes it
    * against a reference greedy scan). */
  private[graft] def testMergeFold(syms: Column, l: String, r: String): Column =
    mergeFold(syms, l, r)

  /** Train `nMerges` BPE merges over the corpus. The corpus is scanned
    * ONCE (word frequencies — one map-side-combinable aggregation); every
    * subsequent round runs over the vocab-bounded `(freq, symbols)`
    * relation: explode adjacent symbol pairs, weighted count, argmax.
    * Each round's argmax is ONE collected row (bounded driver metadata);
    * the winning pair is folded into the symbols and the relation
    * re-persisted. Deterministic end-to-end: integer counts and a total
    * (count desc, left, right) tie-break — which is what lets the DuckDB
    * oracle re-derive every round. Stops early when no pair is left. */
  def bpeTrainMerges(docs: DataFrame, nMerges: Int = 8, textCol: String = "text",
                     stash: Boolean = false): Seq[(String, String, Long)] = {
    require(nMerges >= 1 && nMerges <= 4096, s"nMerges=$nMerges out of range")
    val merges = bpeMemo(docs, graft.PlanMemo.tag("bpe", textCol, nMerges)) {
      bpeTrainImpl(docs, nMerges, textCol)
    }
    if (stash) lastBpeMerges = merges
    merges
  }

  private def bpeTrainImpl(docs: DataFrame, nMerges: Int,
                           textCol: String): Seq[(String, String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    // word frequencies fold off the shared memoized [[termCounts]]
    // relation (r15 verdict item 5): Σ per-doc counts == the corpus
    // count, so BPE training adds a vocab-sized agg to a pipeline that
    // already tokenized the corpus once — never a second tokenize
    var vocab = termCounts(docs, textCol)
      .groupBy(col("term").as("w")).agg(sum("c").as("f"))
      .select(col("f"), charSymbols(col("w")).as("syms"))
      .persist()
    try {
      var rounds = 0
      var exhausted = false
      while (rounds < nMerges && !exhausted) {
        // the size >= 2 guard matters: sequence(1, 0) would DESCEND and
        // element_at(syms, 0) is an ANSI error on a fully-merged word
        val best = vocab.select(col("f"),
            explode(when(size(col("syms")) >= 2,
              transform(sequence(lit(1), size(col("syms")) - 1),
                j => struct(element_at(col("syms"), j).as("l"),
                  element_at(col("syms"), j + 1).as("r"))))
              .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("f")).as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          out += ((l, r, c))
          val next = vocab
            .select(col("f"), mergeFold(col("syms"), l, r).as("syms")).persist()
          next.count() // materialize THROUGH the old cache before dropping it
          vocab.unpersist()
          vocab = next
        }
        rounds += 1
      }
    } finally vocab.unpersist()
    out.toSeq
  }

  /** Per-doc token counts under a trained merge table. Merges apply once
    * per DISTINCT word (the vocab relation), never per occurrence; the
    * per-doc totals come from joining the doc→word counts back — at
    * 100 TB the corpus pays one word-count aggregation and one
    * vocab-sized broadcast join, not a per-token rewrite. */
  def bpeTokenCounts(docs: DataFrame, merges: Seq[(String, String, Long)],
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // the standard id column rides the shared memoized termCounts
    // relation (no second tokenize — the bpeTrainImpl note); a custom id
    // column keeps the direct plan, since the memo is keyed on doc_id
    val docWords =
      if (idCol == "doc_id")
        termCounts(docs, textCol)
          .select(col(idCol), col("term").as("w"), col("c").as("n"))
      else docs.where(col(textCol).isNotNull)
        .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
        .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("n"))
    val wordLen = docWords.select("w").distinct()
      .select(col("w"), size(bpeApplyMerges(col("w"), merges)).as("n_sym"))
    docWords.join(broadcast(wordLen), Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_sym")).as("n_bpe_tokens"))
  }
}
