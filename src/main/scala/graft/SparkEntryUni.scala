package graft

import graft.ext.UnigramLm
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fourth query batch: the unigram-LM (SentencePiece-family) tokenizer.
  * Two entries with a FULLY RE-DERIVING oracle — unlike the ANN oracles
  * (which replay stashed models as literals), the DuckDB side re-runs the
  * whole training chain from the corpus: seed substring counts → integer
  * costs → per-round Viterbi DP (unrolled SQL over word positions) →
  * hard-EM counts → recost → final segmentation. Integer costs make every
  * DP comparison exact in both engines; the only float op is the one
  * `-ln(count/total)` per piece per M-step, floor-pinned to a long
  * immediately (see [[UnigramLm.recost]]). The only stashed value the
  * oracle needs is the max word length — a structural unroll bound, not
  * model content. */
object SparkEntryUni {

  /** Training configuration shared by both entries (and their oracles):
    * 2 hard-EM rounds, pieces up to 4 code points, top-64 seed pieces
    * plus all single characters. */
  private val Rounds = 2
  private val L = 4
  private val V = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_unigram_train" -> { (s, dir) =>
      // the E-step trace: (round, piece, cnt) for every EM round — the
      // integer counts each round's Viterbi segmentation produced, which
      // the oracle re-derives from scratch
      import s.implicits._
      val t = UnigramLm.train(Tables.documents(s, dir), rounds = Rounds,
        maxPieceLen = L, maxVocab = V, stash = true)
      t.roundCounts.zipWithIndex.flatMap { case (cs, i) =>
        cs.map { case (p, c) => (i + 1, p, c) }
      }.toDF("round", "piece", "cnt")
    },
    "x_unigram_segment" -> { (s, dir) =>
      // per-doc (n_words, n_pieces) under the final trained model: the
      // codegen'd Viterbi runs once per DISTINCT word, occurrences join
      // back via a vocab-sized broadcast — never a per-token rewrite
      val docs = Tables.documents(s, dir)
      val t = UnigramLm.train(docs, rounds = Rounds, maxPieceLen = L,
        maxVocab = V, stash = true)
      UnigramLm.segmentCounts(docs, t)
    },
    "x_unigram_ppl" -> { (s, dir) =>
      // per-doc NLL quality score under the SAME trained model — the
      // corpus-filter gauge (mean micro-nats per piece); integer end to
      // end, so the oracle replays the score exactly
      val docs = Tables.documents(s, dir)
      val t = UnigramLm.train(docs, rounds = Rounds, maxPieceLen = L,
        maxVocab = V, stash = true)
      UnigramLm.docLmCost(docs, t)
    },
  )

  // ---- oracle SQL: the training chain as pure DuckDB ----

  /** One unrolled Viterbi DP over the distinct-word relation `dw` under
    * cost table `costCte(p, cost)`: CTEs `<pfx>0 … <pfx>ml` hold the best
    * (cost, pieces) per word prefix length, `<pfx>seg` the full-word
    * segmentations. Mirrors [[graft.plans.ViterbiKernel.segment]] exactly:
    * candidates are splits j in [i−L, i), ranked by (cost, j) — the
    * smallest j (longest final piece) wins ties. */
  private def viterbiChain(costCte: String, pfx: String, ml: Int): String = {
    val dp0 = s"${pfx}0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS cost, []::VARCHAR[] AS ps FROM dw)"
    val dps = (1 to ml).map { i =>
      val branches = (math.max(0, i - L) until i).map { j =>
        s"SELECT d.w, d.cost + c.cost AS cost, " +
          s"d.ps || [substr(d.w, ${j + 1}, ${i - j})] AS ps, $j AS j " +
          s"FROM ${pfx}$j d JOIN $costCte c ON c.p = substr(d.w, ${j + 1}, ${i - j}) " +
          s"WHERE len(d.w) >= $i"
      }.mkString(" UNION ALL ")
      s"${pfx}$i AS MATERIALIZED (SELECT w, cost, ps FROM (SELECT w, cost, ps, " +
        s"row_number() OVER (PARTITION BY w ORDER BY cost, j) AS rn " +
        s"FROM ($branches)) WHERE rn = 1)"
    }
    val fin = (1 to ml).map(i => s"SELECT w, cost, ps FROM ${pfx}$i WHERE len(w) = $i")
      .mkString(" UNION ALL ")
    (dp0 +: dps :+ s"${pfx}seg AS MATERIALIZED ($fin)").mkString(", ")
  }

  /** M-step: integer costs from a count CTE — same ln/floor pin as
    * [[UnigramLm.recost]]. */
  private def costCte(name: String, cnt: String): String =
    s"$name AS MATERIALIZED (SELECT p, CAST(floor(-ln(CAST(c AS DOUBLE) / t) * 1000000.0 + 0.5) AS BIGINT) AS cost " +
      s"FROM $cnt, (SELECT CAST(sum(c) AS DOUBLE) AS t FROM $cnt) tt)"

  /** E-step: frequency-weighted piece counts over a segmentation CTE. */
  private def cntCte(name: String, seg: String): String =
    s"$name AS MATERIALIZED (SELECT p, CAST(sum(f) AS BIGINT) AS c FROM " +
      s"(SELECT v.f, unnest(s.ps) AS p FROM $seg s JOIN vocab v USING (w)) GROUP BY 1)"

  /** Everything through the last EM round: word freqs, seed substring
    * counts, the top-V+singles keep rule, seed costs, and per round r a
    * Viterbi chain under `c{r-1}` producing `cnt{r}` and `c{r}`. */
  private def trainingCtes(ml: Int): String = {
    val seed =
      s"toks AS MATERIALIZED (SELECT doc_id, ${SparkEntryExt.toksSql} AS t FROM documents WHERE text IS NOT NULL), " +
        "vocab AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f FROM " +
        "(SELECT unnest(t) AS w FROM toks) GROUP BY 1), " +
        "dw AS MATERIALIZED (SELECT w FROM vocab), " +
        "pos AS MATERIALIZED (SELECT w, f, unnest(range(1, len(w) + 1)) AS i FROM vocab), " +
        s"subs AS MATERIALIZED (SELECT f, substr(w, i, l) AS p FROM pos, range(1, ${L + 1}) tl(l) " +
        "WHERE i + l <= len(w) + 1), " +
        "seedcnt AS MATERIALIZED (SELECT p, CAST(sum(f) AS BIGINT) AS c FROM subs GROUP BY 1), " +
        s"seedkept AS MATERIALIZED (SELECT p, c FROM (SELECT p, c, " +
        s"row_number() OVER (ORDER BY c DESC, p) AS rk FROM seedcnt) " +
        s"WHERE rk <= $V OR len(p) = 1), " +
        costCte("c0", "seedkept")
    val rounds = (1 to Rounds).map { r =>
      val pfx = ('a' + r - 1).toChar.toString
      viterbiChain(s"c${r - 1}", pfx, ml) + ", " +
        cntCte(s"cnt$r", s"${pfx}seg") + ", " +
        costCte(s"c$r", s"cnt$r")
    }
    (seed +: rounds).mkString(", ")
  }

  /** Oracles only exist once a run has stashed the trained model — the
    * stash supplies the max word length (the SQL unroll bound); Verify
    * runs every query before dumping oracle SQL, so it is always set. */
  def oracleSql: Map[String, String] = UnigramLm.lastUnigram match {
    case Some(t) =>
      val ml = t.maxWordLen
      val trainSelect = (1 to Rounds).map(r =>
        s"SELECT CAST($r AS INT) AS round, p AS piece, c AS cnt FROM cnt$r")
        .mkString(" UNION ALL ")
      Map(
        "x_unigram_train" -> s"WITH ${trainingCtes(ml)} $trainSelect",
        "x_unigram_segment" ->
          (s"WITH ${trainingCtes(ml)}, " +
            viterbiChain(s"c$Rounds", "z", ml) + ", " +
            "dwc AS MATERIALIZED (SELECT doc_id, w, count(*) AS n FROM " +
            "(SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY 1, 2), " +
            "wl AS MATERIALIZED (SELECT w, CAST(len(ps) AS BIGINT) AS n_sym FROM zseg) " +
            "SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words, " +
            "CAST(sum(n * n_sym) AS BIGINT) AS n_pieces " +
            "FROM dwc JOIN wl USING (w) GROUP BY 1"),
        // the same final-round chain, reading the DP's cumulative COST
        // beside the piece count — floor-mean per piece in micro-nats
        "x_unigram_ppl" ->
          (s"WITH ${trainingCtes(ml)}, " +
            viterbiChain(s"c$Rounds", "z", ml) + ", " +
            "dwc AS MATERIALIZED (SELECT doc_id, w, count(*) AS n FROM " +
            "(SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY 1, 2), " +
            "wc AS MATERIALIZED (SELECT w, CAST(len(ps) AS BIGINT) AS n_sym, cost FROM zseg) " +
            "SELECT doc_id, CAST(sum(n * n_sym) AS BIGINT) AS n_pieces, " +
            "CAST(sum(n * cost) AS BIGINT) AS lm_cost, " +
            "CAST(sum(n * cost) // sum(n * n_sym) AS BIGINT) AS ppl_micronats " +
            "FROM dwc JOIN wc USING (w) GROUP BY 1"))
    case None => Map.empty
  }
}
