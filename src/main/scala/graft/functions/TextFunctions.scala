package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline extensions
  * (BASELINE.json north star; no counterpart in the reference, which has no
  * scalar function library beyond MD5 — SURVEY.md §2.7).
  *
  * Everything here is a pure Column expression (codegen'd, no UDFs), so
  * these compose into whole-stage codegen over a 100 TB documents table.
  * Hashes derive from `md5` so the DuckDB oracle can reproduce them
  * bit-for-bit (Spark's `hash`/`xxhash64` are Spark-specific).
  */
object TextFunctions {

  /** Whitespace tokenization after trim+lowercase. The empty-token strip
    * matters only for empty/whitespace-only text, where `split` returns
    * `[""]` — one phantom token that would make every token-count quality
    * gate miss exactly the empty documents it exists to catch. For any
    * text with a real token the strip is a no-op (the oracle's `toksSql`
    * applies the same `list_filter`). */
  def tokens(text: Column): Column =
    array_remove(split(trim(lower(text)), "\\s+"), "")

  /** n-word shingles (distinct), the MinHash/Jaccard unit. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Deterministic 60-bit hash of a string under a seed: the first 15 hex
    * digits of md5(seed|s). Reproducible in DuckDB as
    * `('0x' || substr(md5(seed || '|' || s), 1, 15))::BIGINT`. */
  def seededHash(s: Column, seed: Int): Column =
    conv(substring(md5(concat_ws("|", lit(seed), s)), 1, 15), 16, 10).cast("long")

  /** Carter-Wegman universal-hash modulus (2^31 - 1, prime) and per-seed
    * affine constants for MinHash. All arithmetic stays below 2^62 so
    * int64 never overflows — the DuckDB oracle computes identical values
    * (it *errors* on overflow rather than wrapping, so this bound is a
    * correctness requirement, not a nicety). */
  val MinhashP: Long = 2147483647L
  def minhashConsts(i: Int): (Long, Long) =
    (((1103515245L * (i + 1) + 12345L) % MinhashP) | 1L,
      (987654321L * (i + 3) + 55555L) % MinhashP)

  /** Base shingle hash: ONE md5 per shingle, folded to [0, P). The k
    * MinHash permutations derive from this by cheap affine maps instead of
    * k separate md5 passes. */
  def baseShingleHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinhashP

  /** MinHash signature from pre-hashed shingles (`array<long>`): k minima
    * of affine permutations (a_i·h + b_i) mod P, computed in one codegen'd
    * pass ([[graft.plans.MinHashSignature]] — the compositional
    * `k × array_min(transform(...))` form makes k interpreted passes).
    * Pair with a persisted hashed-shingle column — otherwise Catalyst's
    * project collapsing re-inlines the md5 pipeline into every use. */
  def minhashFromHashes(hashes: Column, k: Int = 16): Column =
    graft.plans.MinHashExpression.minhashSig(hashes, k)

  /** Convenience one-shot signature (hashing inlined; fine for single use). */
  def minhashSignature(shingleCol: Column, k: Int = 16): Column =
    minhashFromHashes(transform(shingleCol, s => baseShingleHash(s)), k)

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`
    * values, each band hashed to one bucket string. Docs sharing any band
    * bucket are candidate near-duplicates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      concat_ws(":", lit(b),
        md5(concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand))))): _*)

  /** Seed offset separating the SimHash affine constants from MinHash's. */
  val SimhashSeedBase: Int = 100

  /** SimHash over the token multiset: bit i is the sign of the sum of ±1
    * votes, where token t votes by the parity of an affine permutation of
    * its (single) md5 hash — computed by the fused kernel
    * [[graft.plans.SimHashTokens]] (the compositional form cost
    * bits×tokens md5 calls, ~13 s at sf0.1 vs ~0.5 s fused). */
  def simhash(text: Column, bits: Int = 32): Column =
    graft.plans.ShingleExpression.simhashTokens(tokens(text), bits)

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    when(size(a) === 0 && size(b) === 0, lit(1.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))

  /** Stopword sets for the n-gram language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "pas"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "una"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "不", "人"))

  /** Per-language stopword hit count over the token list. */
  def langScore(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang).map(x => x: Any): _*)))

  /** Language-ID: argmax of stopword hits, fixed tie-break order. Scores
    * come from ONE pass over the tokens ([[graft.plans.StopwordScores]] —
    * the per-language filter form re-ran the tokenizer ~15× per row under
    * project collapsing); the argmax then works over the 5-int array. */
  def langId(text: Column): Column = {
    val langs = Seq("en", "de", "fr", "es", "zh")
    val scores = graft.plans.ShingleExpression.stopwordScores(
      tokens(text), langs.map(stopwords))
    val s = (i: Int) => element_at(scores, i + 1)
    val best = langs.indices.map(s).reduce((a, b) => greatest(a, b))
    langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), els) =>
      when(s(i) === best && s(i) > 0, lit(l)).otherwise(els)
    }
  }

  /** Quality metrics: token count, mean token length, stopword ratio,
    * alphanumeric ratio — the usual cheap pretraining-quality signals. */
  def qualityMetrics(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val sw = langScore(toks, "en").cast("double")
    // ratio over an empty doc is undefined, not NaN: 0/0 double division
    // is IEEE NaN in both engines, which compares unequal to itself and
    // poisons every downstream threshold — NULL filters cleanly instead
    struct(
      size(toks).cast("long").as("n_tokens"),
      when(n === 0, lit(null).cast("double"))
        .otherwise(DetRound.round6(length(trim(text)).cast("double") / n)).as("mean_tok_len"),
      when(n === 0, lit(null).cast("double"))
        .otherwise(DetRound.round6(sw / n)).as("stop_ratio"),
      when(length(text) === 0, lit(null).cast("double"))
        .otherwise(DetRound.round6(
          length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast("double") /
            length(text))).as("alnum_ratio"))
  }

  /** Document fingerprint: order-insensitive content hash — md5 over the
    * sorted distinct token list (a canonicalized bag-of-words identity,
    * robust to shuffling; the rolling-hash analogue of the reference's
    * whole-string ETag M2). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))
}
