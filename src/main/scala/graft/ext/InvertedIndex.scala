package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed inverted index over the documents table (north-star
  * extension — the namesake "big-data indexing" capability): build the
  * posting relation, serve conjunctive term queries by posting
  * intersection, and rank free-text queries with BM25.
  *
  * The index IS a relation: one `(term, doc_id, tf)` row per posting.
  * That is the 100 TB representation — posting "lists" as rows, hash
  * partitioned (bucketable) by `term`, so a term lookup touches one
  * partition's worth of postings and never assembles an unbounded
  * in-memory list. Everything downstream (directory stats, intersection,
  * BM25) is a map-side-combinable aggregation over that relation sharing
  * the same term- or doc-keyed shuffle.
  */
object InvertedIndex {

  // the posting relations are memoized per (session, canonicalized doc
  // plan) and PERSISTED — the [[graft.ext.Dedup]] shared-artifact
  // contract: the index is derived once and every consumer (directory
  // stats AND head, conjunctive lookup, BM25's tf/df/dl reads, each
  // phrase term's pruned scan) reads the materialized relation, instead
  // of Catalyst re-inlining the tokenize+aggregate pipeline into every
  // branch. At 100 TB this is the stored, term-bucketed index TABLE;
  // here the same shape lives in executor memory.
  private val postMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String), DataFrame]()
  private val posMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String), DataFrame]()

  private def repersist(df: DataFrame): DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist()
    df
  }

  /** Release this session's memoized posting relations (the
    * [[graft.Caches]] sweep). */
  def invalidate(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    Seq(postMemo, posMemo).foreach { memo =>
      val it = memo.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 eq spark) { e.getValue.unpersist(); it.remove() }
      }
    }
  }

  /** The tokenize→aggregate pipeline alone — no memo, no persist. The
    * streaming delta fold ([[applyDocDelta]]) uses this for its batches:
    * memoizing per-batch plans would leave one persisted DataFrame
    * behind PER MICRO-BATCH on a long-running stream (each batch's plan
    * canonicalizes differently), growing executor memory without bound.
    * A batch's postings are consumed exactly once in the merge union, so
    * there is nothing worth caching. */
  private def tokenizePostings(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** The posting relation `(term, doc_id, tf)` — one explode + one
    * map-side-combinable aggregation, derived once per doc plan (memo
    * above). Bucket-by-term writable: this is the layout a term lookup
    * wants at any scale.
    *
    * Built FROM the shared [[TextAnalysis.termCounts]] relation (r15
    * verdict item 5 — the artifact-pass audit): `(doc_id, term, c)` and
    * `(term, doc_id, tf)` are the same aggregation, so a corpus that
    * already pays the TF/DF/LM tokenize never tokenizes a second time
    * for its search index — the postings build is a rename over the
    * persisted relation. A fresh JVM still faults THIS artifact straight
    * from disk without touching the termCounts one. */
  def postings(docs: DataFrame, textCol: String = "text"): DataFrame = synchronized {
    val key = (docs.sparkSession, docs.queryExecution.analyzed.canonicalized, textCol)
    repersist(postMemo.computeIfAbsent(key, _ =>
      graft.ArtifactStore.getOrBuildDf(docs.sparkSession, // the stored index
        graft.ArtifactStore.dfKey(graft.PlanMemo.tag("postings", textCol), Seq(docs)))(
        TextAnalysis.termCounts(docs, textCol)
          .select(col("term"), col("doc_id"), col("c").as("tf")))))
  }

  /** Per-term directory (the index's "dictionary" page): document
    * frequency, total term frequency, doc-id range, and a BOUNDED posting
    * head (the `headCap` smallest doc ids, comma-joined). The head is
    * two-phase — row_number within (term, physical partition) first, so a
    * stopword term with df ≈ N never funnels its full posting list
    * through one window task or one `collect_list`; at most
    * partitions·headCap narrow rows reach the final per-term rank. Stats
    * and head share the term-keyed shuffle. */
  def directory(post: DataFrame, headCap: Int = 8): DataFrame = {
    val local = Window.partitionBy(col("term"), col("__p")).orderBy(col("doc_id"))
    val global = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    val head = post
      .withColumn("__p", spark_partition_id())
      .withColumn("__r", row_number().over(local)).where(col("__r") <= headCap)
      .withColumn("__g", row_number().over(global)).where(col("__g") <= headCap)
      .groupBy("term")
      .agg(concat_ws(",", array_sort(collect_list(col("doc_id")))).as("posting_head"))
    val stats = post.groupBy("term").agg(
      count(lit(1)).as("df"), sum("tf").as("tf_total"),
      min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    stats.join(head, Seq("term"))
  }

  /** The POSITIONAL posting relation `(term, doc_id, pos)` — one
    * posexplode, no aggregation (a term's tf is its row count, its
    * positions are its rows). Same bucketing story as [[postings]]: hash
    * partition / bucket by `term` and a phrase's candidate set is a few
    * partitions' worth of rows, never the corpus. ~`dl` rows per doc, the
    * standard positional-index space trade. */
  def positionalPostings(docs: DataFrame, textCol: String = "text"): DataFrame = synchronized {
    val key = (docs.sparkSession, docs.queryExecution.analyzed.canonicalized, textCol)
    repersist(posMemo.computeIfAbsent(key, _ =>
      graft.ArtifactStore.getOrBuildDf(docs.sparkSession, // the stored index
        graft.ArtifactStore.dfKey(graft.PlanMemo.tag("pospostings", textCol), Seq(docs)))(
        docs.select(col("doc_id"),
            posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
          .select("term", "doc_id", "pos"))))
  }

  /** Exact phrase query over the positional index: an occurrence is an
    * adjacency chain `t0@p, t1@p+1, …`. Each phrase term PRUNES the
    * posting relation first (`term = tᵢ` pushes down / partition-prunes on
    * the term-bucketed layout), then the chain is assembled with
    * |phrase|−1 equi-joins keyed `(doc_id, pos)` — the joined sides are
    * each one term's postings, so join input is O(Σ tf(tᵢ)), never O(corpus),
    * and the rarest term caps the chain's cardinality from the first join
    * AQE reorders it into. Occurrences then collapse into one
    * map-side-combinable per-doc count. */
  def phraseSearch(post: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val first = post.where(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val occurrences = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (t, i)) =>
        // shift the i-th term's positions back by i: a chain start is then
        // a plain (doc_id, pos) equality
        acc.join(
          post.where(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    occurrences.groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
  }

  /** Conjunctive (AND) term query by posting intersection: keep docs whose
    * matched-term count equals the query arity. One partition-pruned scan
    * of the posting relation (the `term IN` predicate pushes to the
    * bucketed layout) + one doc-keyed aggregation — never a per-term
    * self-join chain, which would be |terms|−1 shuffles. */
  def lookupAll(post: DataFrame, terms: Seq[String]): DataFrame =
    post.where(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"), sum("tf").as("tf_total"))
      .where(col("n_matched") === terms.size)
      .select("doc_id", "tf_total")

  /** Incremental index maintenance: fold a document changelog into an
    * EXISTING posting relation without re-tokenizing the stored corpus.
    * Every doc the batch touches (upserts and deletes alike) first drops
    * its stale postings via one anti-join against the touched-id set —
    * batch-sized, so it broadcasts and the base relation never shuffles —
    * then the upserted docs' fresh postings (tokenized from the BATCH
    * only, O(delta) work) union back in. The output keeps the
    * `(term, doc_id, tf)` layout, so [[directory]], [[lookupAll]] and
    * [[bm25TopK]]'s scoring run on the merged relation unchanged; at
    * scale this is the nightly-index-refresh path — O(batch) tokenize +
    * one linear pass over the stored postings, instead of an O(corpus)
    * rebuild. A doc in BOTH `upserts` and `deletedIds` is treated as
    * upserted (its postings re-enter) — callers fold a raw changelog to
    * one latest-wins operation per doc first, as the StreamingSpec
    * micro-batch form does. */
  def applyDocDelta(basePost: DataFrame, upserts: DataFrame,
                    deletedIds: DataFrame, textCol: String = "text"): DataFrame = {
    val touched = broadcast(
      upserts.select(col("doc_id"))
        .unionByName(deletedIds.select(col("doc_id"))).distinct())
    basePost.join(touched, Seq("doc_id"), "left_anti")
      .select("term", "doc_id", "tf") // using-join moved doc_id first
      // non-memoized batch tokenize: each micro-batch's plan is unique,
      // so the memo would accrete one persisted relation per batch
      .unionByName(tokenizePostings(upserts, textCol))
  }

  /** BM25 ranking of one bag-of-terms query (Robertson/Sparck Jones;
    * k1/b defaults are the standard Okapi constants).
    *
    * Determinism contract (shared with unigramSurprisal): corpus scalars
    * N and avgdl are TWO numbers — bounded driver-side metadata, inlined
    * as literals rather than joined (a 1-row join constant-folds into the
    * BroadcastNestedLoop PlanAuditSpec bans). avgdl is an exact
    * integer-sum / count division, bit-identical across engines. Each
    * per-term score is rounded to 6 decimals BEFORE the per-doc sum and
    * summed as DECIMAL(18,6), so the total is exact and order-independent
    * under any shuffle-merge order. Top-k is the two-phase
    * (pre-rank within physical partition, then final rank over ≤ P·k
    * survivors) pattern — no partition-less window funneling the corpus
    * through one task. */
  /** Corpus-wide sparse-cosine top-k document pairs off the SAME stored
    * posting relation — the lexical analogue of the embedding near-dup
    * family (Similarity.scala), and the posting-join realization of
    * all-pairs similarity search (Bayardo, Ma, Srikant, "Scaling Up All
    * Pairs Similarity Search", WWW'07 — this is their df-based
    * candidate-pruning idea expressed relationally).
    *
    * The cost driver is the term-keyed posting self-join: Σ_term df²
    * pair rows. That sum is dominated by exactly the stop-terms whose
    * IDF ≈ 0 — quadratic cost, no cosine contrast — so terms whose df
    * exceeds `dfCapPpm` of the corpus are pruned BEFORE the join
    * (division-free: df·10⁶ ≤ cap·N). After the cut the join output is
    * ≤ dfCap·Σdf rows — a bound the CAP sets, not whatever the hottest
    * stop-word happens to be; every stage shuffles on term or doc_id
    * (equi-keys, map-side combinable), so the plan survives a 100×
    * scale-up by partitioning alone.
    *
    * Similarity is integer ppm of cos²: (dot²·10⁶) div (‖a‖²·‖b‖²),
    * computed in DECIMAL(38,0) so million-token outliers can't overflow
    * — monotone in cosine for the all-positive tf vectors, and
    * bit-identical across engines and partitionings (the DuckDB oracle
    * replays it exactly; a float cosine would hash-drift). Pairs sharing
    * no retained term never materialize (their cosine contrast is
    * stop-term-only by construction). Top-k is the standard two-phase
    * rank. The corpus size is the one driver scalar (same contract as
    * BM25's N/avgdl). */
  def sparseTopkCosine(docs: DataFrame, k: Int = 50, dfCapPpm: Long = 100000L,
                       textCol: String = "text"): DataFrame = {
    require(k >= 1 && dfCapPpm >= 1 && dfCapPpm <= 1000000L,
      s"sparseTopkCosine(k=$k, dfCapPpm=$dfCapPpm)")
    val post = postings(docs, textCol)
    val nDocs: Long = docs.count()
    val keep = post.groupBy("term").agg(count(lit(1)).as("__df"))
      .where(col("__df") * 1000000L <= lit(dfCapPpm * nDocs))
      .select("term")
    val p = post.join(keep, Seq("term"))
    val norms = p.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("__n2"))
    val dots = p.select(col("term"), col("doc_id").as("doc_a"), col("tf").as("__ta"))
      .join(p.select(col("term"), col("doc_id").as("doc_b"), col("tf").as("__tb")),
        Seq("term"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("__ta") * col("__tb")).as("dot"))
    val sim = dots
      .join(norms.select(col("doc_id").as("doc_a"), col("__n2").as("__na")), Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("__n2").as("__nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("dot"),
        expr("CAST(dot AS DECIMAL(19,0)) * CAST(dot AS DECIMAL(19,0)) * " +
          "CAST(1000000 AS DECIMAL(7,0)) DIV " +
          "(CAST(__na AS DECIMAL(19,0)) * CAST(__nb AS DECIMAL(19,0)))")
          .as("cos2_ppm"))
    val local = Window.partitionBy(col("__p"))
      .orderBy(col("cos2_ppm").desc, col("doc_a"), col("doc_b"))
    val global = Window.partitionBy(lit(0))
      .orderBy(col("cos2_ppm").desc, col("doc_a"), col("doc_b"))
    sim.withColumn("__p", spark_partition_id())
      .withColumn("__r", row_number().over(local)).where(col("__r") <= k)
      .withColumn("rank", row_number().over(global)).where(col("rank") <= k)
      .select(col("rank"), col("doc_a"), col("doc_b"), col("dot"), col("cos2_ppm"))
  }

  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text"): DataFrame = {
    val post = postings(docs, textCol)
    // corpus scalars N/avgdl keep their all-docs semantics (empty docs
    // count toward both), so they read the docs table once; the SCORING
    // side's per-doc length is just sum(tf) over the memoized postings —
    // identical for every doc that can match a term, and no second
    // corpus tokenize
    val st = docs.select(size(TextFunctions.tokens(col(textCol))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), avg("dl").as("avgdl")).first()
    val (n, avgdl) =
      if (st.isNullAt(1)) (0L, 1.0) else (st.getLong(0), st.getDouble(1))
    val dl = post.groupBy("doc_id").agg(sum("tf").as("dl"))
    bm25Score(post, dl, n, avgdl, terms, k, k1, b)
  }

  /** BM25 over a POSTING RELATION — the search path a freshness-
    * maintained index actually serves: compose with [[applyDocDelta]]
    * for ranked search over base ∪ batch without rebuilding the index
    * or re-reading the corpus. Corpus stats derive from the postings
    * themselves (N = docs with ≥ 1 posting, dl = Σtf): token-free docs
    * are invisible to an index, which IS the semantics of serving from
    * one — [[bm25TopK]] keeps the all-docs stats for corpus-analytics
    * parity. Same determinism contract (6dp-rounded idf and per-term
    * scores, DECIMAL(18,6) order-independent per-doc sum, doc_id tie
    * order). */
  def bm25TopKPost(post: DataFrame, terms: Seq[String], k: Int = 20,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dl = post.groupBy("doc_id").agg(sum("tf").as("dl"))
    val st = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl")).first()
    val (n, avgdl) =
      if (st.isNullAt(1)) (0L, 1.0) else (st.getLong(0), st.getDouble(1))
    bm25Score(post, dl, n, avgdl, terms, k, k1, b)
  }

  private def bm25Score(post: DataFrame, dl: DataFrame, n: Long,
                        avgdl: Double, terms: Seq[String], k: Int,
                        k1: Double, b: Double): DataFrame = {
    val dfx = post.where(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf = dfx.select(col("term"),
      graft.functions.DetRound.round6(log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)).as("idf"))
    val scored = post.where(col("term").isin(terms: _*))
      .join(idf, Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("doc_id"),
        graft.functions.DetRound.round6(
          (col("idf") * (col("tf") * lit(k1 + 1.0))) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / lit(avgdl))))
          .as("s1"))
    val per = scored.groupBy("doc_id")
      .agg(sum(col("s1").cast("decimal(18,6)")).as("__s"))
      .select(col("doc_id"), col("__s").cast("double").as("score"))
    val local = Window.partitionBy(col("__p")).orderBy(col("score").desc, col("doc_id"))
    // constant partition key (same idiom as Curation.twoPhaseTopK):
    // DECLARES that the final rank's one task is intentional — its input
    // is pre-filtered to ≤ k·partitions survivor rows. Spark 4's
    // EliminateWindowPartitions folds the constant away again, which is
    // desirable: the empty spec plus the rank<=k filter rewrites to
    // TakeOrderedAndProject (tree-aggregated global top-k, no full
    // exchange). The residual "No Partition Defined for Window" WARN is
    // spurious here and suppressed in the drive mains; real fat
    // single-task windows are caught by SkewSpec/SoakSpec listeners.
    val global = Window.partitionBy(lit(0)).orderBy(col("score").desc, col("doc_id"))
    per.withColumn("__p", spark_partition_id())
      .withColumn("__r", row_number().over(local)).where(col("__r") <= k)
      .withColumn("rank", row_number().over(global)).where(col("rank") <= k)
      .select(col("doc_id"), col("score"), col("rank"))
  }

  /** Integer reciprocal scale for [[rrfFusion]]: lcm(1..20) = 232792560,
    * so every reciprocal 1/rank with rank ≤ [[RrfMaxRank]] is an EXACT
    * integer after scaling — the fused score is a Long sum, replayable
    * bit-for-bit by the oracle with no float summation order anywhere in
    * the ranking (the x_knn_mrr arithmetic, lifted from lcm(1..10)). */
  val RrfScale: Long = 232792560L
  /** Max per-source rank the integer scale covers. */
  val RrfMaxRank = 20

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09 — the
    * standard hybrid-retrieval combiner): fuse two or more per-query
    * rankings `(query_id, doc_id, rank)` into one, scoring each doc by
    * Σ_sources 1/rank (0 where a source didn't return it) and re-ranking
    * per query. RRF is rank-only — BM25 scores and cosine similarities
    * never share a unit, so fusing their RANKS is what makes
    * lexical ⊕ vector composition principled rather than a scale fudge.
    *
    * Arithmetic is integer end-to-end: reciprocals scale by [[RrfScale]]
    * (exact for ranks ≤ [[RrfMaxRank]], enforced by an in-row valve), the
    * fused score is their Long sum, and the final order is total
    * (rrf_scaled DESC, doc_id) so the LIMIT is deterministic and the
    * DuckDB oracle replays the fusion exactly.
    *
    * Plan shape: one full-outer equi-join per extra source on the
    * (query, doc) key — candidate volume is Σ per-source list lengths
    * per query (bounded by queries · maxRank · sources), so the re-rank
    * window runs over a BOUNDED-by-construction relation, never the
    * corpus. Output: `query_id, doc_id, <name>_rank per source
    * (0 = absent), rrf_scaled, rank`. */
  def rrfFusion(rankings: Seq[(String, DataFrame)], topK: Int): DataFrame = {
    require(rankings.size >= 2, "fusion needs at least two rankings")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val sides = rankings.map { case (nm, df) =>
      df.select(col("query_id"), col("doc_id"),
        when(col("rank") < 1 || col("rank") > RrfMaxRank, raise_error(concat(
          lit("rrfFusion: rank "), col("rank").cast("string"),
          lit(s" outside [1, $RrfMaxRank] — the integer reciprocal scale " +
            "only covers that range (raise RrfScale's lcm consciously)"))))
          .otherwise(col("rank")).cast("long").as(s"${nm}_rank"))
    }
    val joined = sides.reduce((a, b) => a.join(b, Seq("query_id", "doc_id"), "full"))
    val rankCols = rankings.map { case (nm, _) => s"${nm}_rank" }
    val filled = joined.select(col("query_id") +: col("doc_id") +:
      rankCols.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
    val rrf = rankCols
      .map(c => expr(s"CASE WHEN $c > 0 THEN $RrfScale DIV $c " +
        "ELSE CAST(0 AS BIGINT) END"))
      .reduce(_ + _)
    // per-query window over the bounded fused candidate set (≤ sources ·
    // maxRank rows per query) — never corpus-sized, so no two-phase top-k
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_scaled").desc, col("doc_id"))
    filled.withColumn("rrf_scaled", rrf.cast("long"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
  }
}
