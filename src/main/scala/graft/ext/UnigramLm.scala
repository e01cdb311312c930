package graft.ext

import graft.functions.TextFunctions
import graft.plans.ViterbiExpression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece family, Kudo 2018)
  * beside [[TextAnalysis]]'s BPE: where BPE grows a vocabulary bottom-up
  * by merge frequency, the unigram model starts from a substring seed
  * vocabulary and refits piece probabilities by EM, segmenting with a
  * min-cost Viterbi DP. This implementation is the deterministic
  * hard-EM (Viterbi-EM) variant, engineered so a DuckDB oracle can
  * RE-DERIVE the entire training chain:
  *
  *  - costs are INTEGERS: `cost(p) = floor(-ln(count(p)/total)·1e6 + .5)`
  *    — the one `ln` per piece is the only float op, immediately pinned
  *    to an integer, so the Viterbi DP (sums and comparisons of longs)
  *    is exact and engine-independent;
  *  - the E-step counts each piece's occurrences in the Viterbi path of
  *    every DISTINCT word, weighted by word frequency (hard counts, not
  *    forward-backward expectations — deterministic, SQL-expressible);
  *  - the M-step recosts from the counts; pieces whose count hits zero
  *    drop out, EXCEPT that every piece used by some word's current path
  *    has count ≥ its word's frequency, so every word stays segmentable
  *    round over round (singles seed the base case);
  *  - ties in the DP break to the smallest split point (longest final
  *    piece), a total order both engines implement identically.
  *
  * Scale shape: the corpus is scanned ONCE (word-frequency aggregation,
  * map-side combinable — shared shape with BPE training); the seed
  * substring pass and every EM round run over the DISTINCT-WORD relation
  * (vocabulary-bounded, not corpus-bounded); the model is driver-side
  * bounded metadata (≤ maxVocab + alphabet pieces), memoized per
  * (corpus, params) like every stored tokenizer artifact. Segmentation
  * of a corpus applies the codegen'd DP once per distinct word and joins
  * occurrences back — never a per-token rewrite. */
object UnigramLm {

  /** Full training trace: seed costs, per-round E-step counts and
    * M-step costs, plus the structural bounds the oracle's SQL unroll
    * needs. All bounded driver metadata. */
  case class Trained(seedCosts: Seq[(String, Long)],
                     roundCounts: Seq[Seq[(String, Long)]],
                     roundCosts: Seq[Seq[(String, Long)]],
                     maxWordLen: Int, maxPieceLen: Int, maxVocab: Int) {
    def finalCosts: Seq[(String, Long)] = roundCosts.last
  }

  /** Verification hook (the `Similarity.lastLearned` contract): the most
    * recent stashed training, read by the oracle builders AFTER Verify
    * has run the queries. */
  @volatile var lastUnigram: Option[Trained] = None

  private val memo = new graft.ModelMemo[Trained]

  /** The M-step: integer costs from integer counts. The single ln is
    * floor-pinned to a long immediately, so a sub-ulp libm difference
    * between engines could only matter within ~1e-9 of a rounding
    * boundary — and everything downstream of the pin is exact. */
  private[graft] def recost(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = counts.iterator.map(_._2).sum.toDouble
    counts.map { case (p, c) =>
      p -> math.floor(-math.log(c.toDouble / total) * 1e6 + 0.5).toLong
    }
  }

  def train(docs: DataFrame, rounds: Int = 2, maxPieceLen: Int = 4,
            maxVocab: Int = 64, textCol: String = "text",
            stash: Boolean = false): Trained = {
    require(rounds >= 1 && rounds <= 16, s"rounds=$rounds out of range")
    val t = memo(docs, graft.PlanMemo.tag("unigram", textCol, rounds,
      maxPieceLen, maxVocab)) {
      trainImpl(docs, rounds, maxPieceLen, maxVocab, textCol)
    }
    if (stash) lastUnigram = Some(t)
    t
  }

  /** `(w, f)` corpus word frequencies — the ONE corpus scan training
    * pays (map-side combinable agg, the same relation BPE training
    * reads). */
  private def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  private def trainImpl(docs: DataFrame, rounds: Int, maxPieceLen: Int,
                        maxVocab: Int, textCol: String): Trained = {
    val words = wordFreqs(docs, textCol).persist()
    try {
      // empty/all-NULL corpus: max(length) aggregates to NULL and a
      // primitive getInt would NPE mid-training — return the empty model
      val maxLenRow = words.agg(max(length(col("w")))).head
      if (maxLenRow.isNullAt(0))
        return Trained(Seq.empty, Seq.empty, Seq(Seq.empty), 0, maxPieceLen, maxVocab)
      val maxWordLen = maxLenRow.getInt(0)
      // seed vocabulary: every ≤maxPieceLen substring of every distinct
      // word, weighted by word frequency; kept = top maxVocab by
      // (count desc, piece) PLUS all single characters (the DP base
      // case — guarantees every corpus word is segmentable in round 1).
      // `substring`/`char_length` count code points in BOTH engines.
      val subs = words.select(col("f"), explode(expr(
        s"flatten(transform(sequence(1, char_length(w)), i -> " +
          s"transform(sequence(i, least(char_length(w), i + ${maxPieceLen - 1})), " +
          "e -> substring(w, i, e - i + 1))))")).as("p"))
      val seedCnt = subs.groupBy("p").agg(sum(col("f")).as("c")).persist()
      val top = seedCnt.orderBy(col("c").desc, col("p")).limit(maxVocab)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val singles = seedCnt.where(length(col("p")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      seedCnt.unpersist()
      val kept = (top ++ singles).distinct.sortBy(_._1)
      val seedCosts = recost(kept)

      val roundCounts = Seq.newBuilder[Seq[(String, Long)]]
      val roundCosts = Seq.newBuilder[Seq[(String, Long)]]
      var costs = seedCosts
      var r = 0
      while (r < rounds) {
        // E-step: piece occurrences along each distinct word's Viterbi
        // path, weighted by word frequency — one vocabulary-bounded job
        val cnt = words
          .select(col("f"), explode(ViterbiExpression.unigramSegment(
            col("w"), costs, maxPieceLen)).as("p"))
          .groupBy("p").agg(sum(col("f")).as("c"))
          .orderBy("p")
          .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
        roundCounts += cnt
        costs = recost(cnt) // M-step; zero-count pieces drop out here
        roundCosts += costs
        r += 1
      }
      Trained(seedCosts, roundCounts.result(), roundCosts.result(),
        maxWordLen, maxPieceLen, maxVocab)
    } finally words.unpersist()
  }

  /** Per-doc segmentation stats under a trained model: `(doc_id,
    * n_words, n_pieces)`. The DP runs once per DISTINCT word; per-doc
    * totals come from one vocab-sized broadcast join back — the same
    * scale shape as [[TextAnalysis.bpeTokenCounts]]. */
  // Shared consumer-side artifacts: the (doc, word, n) relation and the
  // per-DISTINCT-word segmentation stats (piece count + summed piece
  // cost) are the expensive halves of BOTH downstream readers
  // (segmentCounts and docLmCost), so they are memoized+persisted like
  // every other shared derived relation — the second reader pays one agg
  // and a broadcast join, not a re-tokenize and a re-segmentation. The
  // segmentation memo's tag carries a content hash of the cost table, so
  // two different models never share an entry (and MurmurHash3 over the
  // (piece, cost) pairs is content-deterministic, so the disk artifact
  // key is stable across JVMs).
  private val wordsMemo = new graft.PlanMemo
  private val segMemo = new graft.PlanMemo

  private def docWordsOf(docs: DataFrame, textCol: String,
                         idCol: String): DataFrame =
    wordsMemo(docs, graft.PlanMemo.tag("uniwords", textCol, idCol))(
      docs.where(col(textCol).isNotNull)
        .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
        .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("n")))

  private def wordSegOf(docs: DataFrame, model: Trained, textCol: String,
                        idCol: String): DataFrame = {
    val docWords = docWordsOf(docs, textCol, idCol)
    val costMap = typedLit(model.finalCosts.toMap)
    segMemo(docWords,
      graft.PlanMemo.tag("uniseg", model.finalCosts.hashCode, model.maxPieceLen))(
      docWords.select("w").distinct()
        .withColumn("__ps", ViterbiExpression.unigramSegment(
          col("w"), model.finalCosts, model.maxPieceLen))
        // element_at is ANSI-strict on maps: a piece outside the vocab
        // throws instead of silently scoring 0 — structurally impossible
        // (the DP only emits vocab pieces), and loud if that ever breaks
        .select(col("w"), size(col("__ps")).as("n_sym"),
          aggregate(col("__ps"), lit(0L),
            (acc, p) => acc + element_at(costMap, p)).as("w_cost")))
  }

  def segmentCounts(docs: DataFrame, model: Trained,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val docWords = docWordsOf(docs, textCol, idCol)
    docWords.join(broadcast(wordSegOf(docs, model, textCol, idCol)), Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_sym")).as("n_pieces"))
  }

  /** Per-doc negative log-likelihood under a trained model — the
    * SentencePiece-family QUALITY SCORE a corpus filter thresholds on
    * (gibberish and boilerplate segment into expensive rare pieces;
    * fluent text into cheap frequent ones). Everything is the model's
    * own fixed-point integers: `lm_cost` is the summed Viterbi cost in
    * micro-nats (each piece cost is floor(−ln p·10⁶ + ½), see
    * [[recost]]), `ppl_micronats` the floor mean per piece — so the
    * DuckDB oracle replays the score bit-for-bit; a float NLL would
    * hash-drift.
    *
    * Scale shape = [[segmentCounts]]: the codegen'd Viterbi runs once
    * per DISTINCT word, each word's cost folds through a VOCAB-BOUNDED
    * literal cost map (driver metadata, same contract as the centroid /
    * codebook literals), and per-doc totals are one (doc, word) agg plus
    * a broadcast join — no per-token rewrite of the corpus. */
  def docLmCost(docs: DataFrame, model: Trained,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val docWords = docWordsOf(docs, textCol, idCol)
    docWords.join(broadcast(wordSegOf(docs, model, textCol, idCol)), Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("n") * col("n_sym")).as("n_pieces"),
        sum(col("n") * col("w_cost")).as("lm_cost"))
      .select(col(idCol), col("n_pieces"), col("lm_cost"),
        expr("lm_cost DIV n_pieces").as("ppl_micronats"))
  }
}
