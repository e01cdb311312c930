package graft

import graft.ext.{Curation, Dedup, Multimodal, Similarity, TextAnalysis, Windows}
import graft.functions.TextFunctions
import graft.operators._
import graft.sources.{StarDocs, Tables}
import graft.streaming.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second query batch: mutation algebra (M1/M4–M7), the LLM-pipeline
  * extension operators, and the batch-checkable streaming kernel.
  * Merged into [[SparkEntry.queries]]; same oracle conventions. */
object SparkEntryExt {

  private val mmSeeds = 16
  private val mmBands = 4

  /** Stored prior cluster assignment for the x_cc_delta refresh (see the
    * query's comment) — disk-backed like every other derived artifact. */
  private val ccPriorMemo = new graft.PlanMemo

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p2_match_all" -> { (s, dir) =>
      Search.matchAll(Tables.region(s, dir))
    },

    "m1_merge_patch" -> { (s, dir) =>
      // document-level RFC-7386 merge: orders ending in 00 get a patch that
      // replaces child li*_1 wholesale (qty→999), appends li*_new, and
      // changes the priority scalar; everything else passes through
      val docs = StarDocs.docs(s, dir)
      val liType = docs.schema("lineitems").dataType
      val patches = Tables.orders(s, dir).where(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey").cast("string").as("objectId"),
          lit("order").as("objectType"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(null).cast("double").as("o_totalprice"),
          lit(null).cast("timestamp").as("o_orderdate"),
          lit("0-PATCHED").as("o_orderpriority"),
          from_json(concat(
            lit("""[{"objectId":"li"""), col("o_orderkey"), lit("""_1","objectType":"lineitem","l_quantity":999.0},"""),
            lit("""{"objectId":"li"""), col("o_orderkey"), lit("""_new","objectType":"lineitem","l_quantity":111.0}]""")),
            liType).as("lineitems"))
      MergePatch(docs, patches)
        .select(col("objectId").as("order_id"), col("o_orderpriority"),
          explode(col("lineitems")).as("li"))
        .select(col("order_id"), col("o_orderpriority"),
          col("li.objectId").as("li_id"), col("li.l_quantity").as("qty"),
          col("li.part.p_brand").as("brand"))
    },

    "m1_null_clear" -> { (s, dir) =>
      // M1 at the JSON level: explicit-null fidelity (modifyObject.ts:55-60
      // assigns the null; absent keys keep the stored value). Every 10th
      // order's patch nulls o_orderpriority and appends a new member; the
      // merged JSON string is compared byte-for-byte, which pins member
      // order, the null overwrite, and untouched-row passthrough at once.
      val docs = Tables.orders(s, dir).select(
        col("o_orderkey").cast("string").as("key"),
        to_json(struct(
          col("o_orderkey").cast("string").as("objectId"),
          lit("order").as("objectType"),
          col("o_orderstatus"), col("o_orderpriority"))).as("doc"))
      val patches = Tables.orders(s, dir).where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").cast("string").as("key"),
          lit("""{"objectId":"IGNORED","o_orderpriority":null,"note":"patched"}""").as("patch"))
      MergePatch.json(docs, patches)
    },

    "m4_if_match" -> { (s, dir) =>
      // conditional-write gate: %3==0 sends the current tag (→200), others
      // a stale tag (→412); five unknown keys → 404
      import s.implicits._
      val o = Tables.orders(s, dir)
      val tag = md5(concat_ws("|", col("o_orderkey").cast("string"), col("o_orderstatus")))
      val tagged = o.select(col("o_orderkey").cast("string").as("__key"), tag.as("__etag"))
      val reqs = o.select(col("o_orderkey").cast("string").as("key"),
          when(col("o_orderkey") % 3 === 0, tag).otherwise(lit("stale")).as("ifMatch"))
        .unionByName((1 to 5).map(i => s"Z$i").toDF("key").withColumn("ifMatch", lit("x")))
      Etag.conditionalWrite(tagged, reqs).select("key", "status")
    },

    "m5_validate_json" -> { (s, dir) =>
      // runtime-schema validation over the events.props JSON column; every
      // 5th row is replaced by a doc violating required+additionalProperties
      val schemaJson =
        """{"type":"object","additionalProperties":false,
           "required":["k"],"properties":{"k":{"type":"integer"}}}""".stripMargin
      val ev = Tables.events(s, dir)
        .withColumn("props2",
          when(col("event_id") % 5 === 0, lit("""{"x": 1}""")).otherwise(col("props")))
      ev.withColumn("__errors",
          Validate.errors(col("props2"), graft.functions.JsonSchema.parse(schemaJson)))
        .select(col("event_id"),
          when(size(col("__errors")) === 0,
            get_json_object(col("props2"), "$.k").cast("long")).as("k_val"),
          size(col("__errors")).cast("int").as("n_errors"))
    },

    "m6_dates" -> { (s, dir) =>
      // DD-MM-YYYY semantic validation; every 3rd row gets the wrong format
      val o = Tables.orders(s, dir)
      o.select(col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
            .otherwise(date_format(col("o_orderdate"), "dd-MM-yyyy")).as("d"))
        .withColumn("valid", Validate.validDate(col("d")))
    },

    "m7_key_gate" -> { (s, dir) =>
      // key/shape precheck: URL key must equal objectType_objectId; every
      // 13th row is addressed under a mismatched key
      val rows = Tables.orders(s, dir).select(
        concat(lit("order_"), col("o_orderkey")).as("key"),
        lit("order").as("objectType"),
        when(col("o_orderkey") % 13 === 0, col("o_orderkey") + 1)
          .otherwise(col("o_orderkey")).cast("string").as("objectId"))
      rows.withColumn("valid",
        col("objectId").isNotNull &&
          concat_ws("_", col("objectType"), col("objectId")) === col("key"))
    },

    "st2_changelog_apply" -> { (s, dir) =>
      // ST2/ST3/ST5: changelog derived from events applied TWICE through
      // the batch kernel — output equals a single application (idempotence
      // under at-least-once replay), checked against the one-pass oracle.
      // The changelog construction is SparkEntryIdx.changelogOf, shared
      // with the snapshot/CDC queries
      val log = SparkEntryIdx.changelogOf(s, dir)
      val empty = log.select("key", "doc").limit(0)
      Ingest.applyBatch(Ingest.applyBatch(empty, log), log)
    },

    "st1_smoke" -> { (s, _) =>
      // ST1 driver-visible: run the real readStream → foreachBatch → LSM
      // smoke (restart mid-feed; streamed state == batch fold — see
      // Ingest.st1Smoke) and surface the pass bit as a 1-row relation the
      // constant oracle can hash. A failed stream yields ok=0 → driver-red.
      val ok = Ingest.st1Smoke(s)
      s.sql(s"SELECT 'stream_restart_equals_batch_fold' AS check_name, " +
        s"CAST(${if (ok) 1 else 0} AS BIGINT) AS ok")
    },

    "st4_barrier_visibility" -> { (s, dir) =>
      // ST4 — read-your-writes across the batch barrier, batch-checkable
      // form (the streaming form is StreamingSpec's Ingest.run round
      // trips; this is the same versioned kernel those batches execute).
      // The changelog splits on a NON-seq-aligned boundary (seq parity),
      // so batch 2 carries events BOTH newer and older than batch 1's per
      // key: applying it over batch 1's committed state exercises exactly
      // what the barrier guarantees — batch 2 reads batch 1's writes (its
      // stale events must lose to the seq fence) and extends them. The
      // final visible state must equal the one-pass fold of the whole
      // log, which is the oracle.
      val log = SparkEntryIdx.changelogOf(s, dir)
      val emptyVersioned = log
        .select(col("key"), col("doc"), col("seq"), lit(false).as("deleted"))
        .limit(0)
      val afterB1 = Ingest.applyBatchVersioned(emptyVersioned, log.where(col("seq") % 2 === 0))
      val afterB2 = Ingest.applyBatchVersioned(afterB1, log.where(col("seq") % 2 =!= 0))
      afterB2.where(!col("deleted"))
        .select(col("key"), col("doc"), col("seq").as("last_seq"))
    },

    "st5_dlq_split" -> { (s, dir) =>
      // ST5 — DLQ, batch-checkable form (the streaming form is
      // StreamingSpec's foreachBatch side-table): a changelog where every
      // 11th event carries an unknown op and every 13th a NULL op splits
      // by the SAME validity predicate the apply kernel uses. The output
      // is the full batch with its side assignment — the oracle proves
      // applied + dlq PARTITIONS the batch (nothing lost, nothing
      // double-counted), including the NULL-predicate rows a naive
      // `where(!valid)` would drop from both sides.
      val log = SparkEntryIdx.changelogOf(s, dir)
        .withColumn("op",
          when(col("seq") % 13 === 0, lit(null).cast("string"))
            .when(col("seq") % 11 === 0, lit("zap"))
            .otherwise(col("op")))
      val (ok, dlq) = Ingest.withDlq(log, col("op").isin("insert", "update", "delete"))
      ok.withColumn("side", lit("applied"))
        .unionByName(dlq.withColumn("side", lit("dlq")))
        .groupBy("side")
        .agg(count(lit(1)).as("n_rows"),
          count(col("op")).as("n_with_op"),
          countDistinct(col("key")).as("n_keys"))
    },

    "st6_scd2_history" -> { (s, dir) =>
      // ST6 — SCD2 history: the changelog as validity intervals, the
      // point-in-time-join form of the same log st2/st3/snapshot read.
      // One key-keyed window, no join; oracle is the lead() unroll.
      // Memoized: the history is a stored artifact shared with x_pit_join.
      SparkEntryIdx.scd2HistoryOf(s, dir)
    },

    "x_pit_join" -> { (s, dir) =>
      // point-in-time feature join over the SCD2 intervals: each key
      // probed at its own deterministic cut (per-key, not one global
      // snapshot) — the leakage-free as-of lookup; probes before the
      // key's first event or after its delete drop out
      val hist = SparkEntryIdx.scd2HistoryOf(s, dir)
      val probes = Tables.events(s, dir)
        .select(
          concat(lit("u"), col("user_id"), lit("_"), col("event_id") % 50).as("key"),
          ((col("user_id") * 997 + (col("event_id") % 50) * 131) % 10000).as("as_of_seq"))
        .distinct()
      Ingest.pointInTime(hist, probes)
    },

    "s7_index_delete" -> { (s, dir) =>
      // index-doc batch delete by key set (anti-join form of S5/S7)
      val kv = Tables.orders(s, dir)
        .withColumn("key", col("o_orderkey").cast("string"))
      val doomed = kv.where(col("o_orderpriority") === "1-URGENT").select("key")
      Kv.deleteAll(kv, doomed).drop("key")
    },

    "s8_delete_by_query" -> { (s, dir) =>
      // delete-by-query: predicate rewrite, then a residual aggregate that
      // shows the deletion (the filter's negation pushes to the scan)
      Kv.deleteWhere(Tables.lineitem(s, dir),
          col("l_shipdate") < to_timestamp(lit("1996-01-01")))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    },

    "s10_cache_aside" -> { (s, dir) =>
      // Redis-first / ES-fallback read (cache-aside): the authoritative
      // cache holds fresher values for a subset; coalesce over a left join
      val index = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
        col("o_totalprice").as("idx_price"))
      val cache = Tables.orders(s, dir).where(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey").as("k"), (col("o_totalprice") * 2).as("c_price"))
      index.join(cache, Seq("k"), "left")
        .select(col("k").as("o_orderkey"),
          coalesce(col("c_price"), col("idx_price")).as("price"),
          when(col("c_price").isNotNull, "cache").otherwise("index").as("source"))
    },

    "p9_projection" -> { (s, dir) =>
      // _source projection over the shredded child nodes (typed table path).
      // Uses the default materialized shred: the node tables are the shared
      // stored artifact every read-path query scans (NodeStore model), so
      // the projection reuses the same cache as j2/p10 instead of paying a
      // second full document assembly.
      val typed = Shred.shredTyped(StarDocs.docs(s, dir))
      Search.projectSource(typed("lineitems"),
        Seq("__key", "l_quantity", "l_returnflag"))
        .withColumnRenamed("__key", "key")
    },

    "p10_search_renest" -> { (s, dir) =>
      // the reference's full read path: has_child search, then re-nest ONLY
      // the hits (apiLogicForSearch.ts:280-285 fetches and reconstructs hit
      // by hit — it never assembles the rest of the corpus). The semi-join
      // runs against the root NODE table before any document assembly, and
      // every node table is rootKey-filtered before the renest
      // joins/collect_lists, so with a selective predicate the assembly
      // cost is O(hits), not O(corpus) — the shape that survives 100×.
      val docs = StarDocs.docs(s, dir)
      val typed = Shred.shredTyped(docs)
      val hitRoots = Search.hasChild(typed(""),
          typed("lineitems").where(col("l_quantity") > 49),
          "__key", "__parentKey")
        .select(col("__rootKey"))
      val filtered = typed.map { case (path, nodes) =>
        path -> nodes.alias("__n").join(hitRoots.alias("__h"),
          col("__n.__rootKey") === col("__h.__rootKey"), "left_semi")
      }
      Renest(filtered, docs.schema)
        .select(col("objectId").as("order_id"), col("o_orderstatus"),
          size(col("lineitems")).as("n_items"))
    },

    // ----- text analysis -----
    "x_text_quality" -> { (s, dir) =>
      TextAnalysis.withQuality(Tables.documents(s, dir))
        .select("doc_id", "n_tokens", "mean_tok_len", "stop_ratio", "alnum_ratio")
    },
    "x_text_langid" -> { (s, dir) =>
      TextAnalysis.withLangId(Tables.documents(s, dir)).select("doc_id", "pred_lang")
    },
    "x_quality_gopher" -> { (s, dir) =>
      // the Gopher quality rules (Rae et al.'21 §A1.1) — the published
      // pretraining document filter — in EXACT integer form: every ratio
      // threshold is cross-multiplied (mean word length ∈ [3,10] ⇔
      // 3n ≤ Σlen ≤ 10n; ≥80% alphabetic words ⇔ 5·n_alpha ≥ 4n; ≤10%
      // symbol words ⇔ 10·n_sym ≤ n), so no division or float exists on
      // either engine; the stop-word rule requires ≥2 DISTINCT hits from
      // the paper's 8-word set. All sufficient statistics come off the
      // shared memoized term-count relation — zero new corpus scans.
      val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      val st = TextAnalysis.termCounts(Tables.documents(s, dir), "text")
        .groupBy("doc_id").agg(
          sum("c").as("n_words"),
          sum(length(col("term")).cast("long") * col("c")).as("sum_len"),
          sum(when(col("term").rlike("[a-z]"), col("c")).otherwise(0L))
            .as("n_alpha"),
          sum(when(col("term").contains("#") || col("term").contains("..."),
            col("c")).otherwise(0L)).as("n_symbol"),
          count_distinct(when(col("term").isin(stops: _*), col("term")))
            .as("stop_hits"))
      st.select(col("doc_id"), col("n_words"), col("sum_len"), col("n_alpha"),
          col("n_symbol"), col("stop_hits"),
          (col("n_words") >= 50L && col("n_words") <= 100000L)
            .as("f_word_count"),
          (lit(3L) * col("n_words") <= col("sum_len") &&
            col("sum_len") <= lit(10L) * col("n_words")).as("f_mean_len"),
          (lit(5L) * col("n_alpha") >= lit(4L) * col("n_words"))
            .as("f_alpha_words"),
          (lit(10L) * col("n_symbol") <= col("n_words")).as("f_symbol"),
          (col("stop_hits") >= 2L).as("f_stopwords"))
        .withColumn("pass",
          col("f_word_count") && col("f_mean_len") && col("f_alpha_words") &&
            col("f_symbol") && col("f_stopwords"))
    },
    "x_quality_gopher_full" -> { (s, dir) =>
      // the COMPLETE Gopher filter as one relation (r15 verdict item 8):
      // the five word-statistics rules of x_quality_gopher plus the
      // line rules (duplicate-line fraction <= 30%, ellipsis-terminated
      // lines <= 30%, bullet-initial lines <= 10%) — all exact
      // cross-multiplied integers, folded off the SHARED memoized
      // term-count and exploded-line relations (zero new corpus scans
      // in a pipeline already computing TF/LM/line-dedup features)
      TextAnalysis.gopherRules(Tables.documents(s, dir))
    },
    "x_text_fingerprint" -> { (s, dir) =>
      TextAnalysis.withFingerprint(Tables.documents(s, dir)).select("doc_id", "fingerprint")
    },
    "x_text_tf_df" -> { (s, dir) =>
      // term statistics (the TF-IDF building block): per-doc term
      // frequency joined with corpus document frequency, BOTH folded off
      // the shared memoized (doc_id, term, c) relation — tf IS c, and df
      // is a plain row count per term because the relation holds exactly
      // one row per (doc, term), so countDistinct never needs its
      // two-phase dedup agg. Before r16 this query built its own exploded
      // token stream with two consumers, and Catalyst re-inlined the
      // tokenize+explode into each branch: the plan carried TWO corpus
      // scans + TWO Generates where the whole pipeline needs one. The
      // vocabulary side is NOT broadcast: distinct-term counts grow with
      // the corpus (heavy-tailed, unbounded), so a forced broadcast is a
      // driver OOM at 100 TB; AQE still converts to broadcast at runtime
      // when the vocabulary genuinely fits.
      val tc = graft.ext.TextAnalysis.termCounts(Tables.documents(s, dir), "text")
      val tf = tc.select(col("doc_id"), col("term"), col("c").as("tf"))
      val dfx = tc.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(dfx, Seq("term")).select("doc_id", "term", "tf", "df")
    },
    "x_token_bpeish" -> { (s, dir) =>
      TextAnalysis.withTokenCounts(Tables.documents(s, dir))
        .select("doc_id", "n_tokens", "n_subtokens")
    },
    "x_bpe_merges" -> { (s, dir) =>
      // REAL BPE merge training (Sennrich et al.): one corpus scan to
      // word frequencies, then vocab-relation rounds of weighted
      // pair-count + argmax. The oracle re-derives every round's argmax
      // in DuckDB (pinned previous merges carry the state).
      val merges = TextAnalysis.bpeTrainMerges(
        Tables.documents(s, dir), nMerges = 8, stash = true)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((l, r, c), i) => ((i + 1).toLong, l, r, c) }
        .toDF("merge_rank", "lhs", "rhs", "pair_count")
    },
    "x_bpe_segment" -> { (s, dir) =>
      // the trained tokenizer applied: per-doc subword counts; merges
      // apply once per DISTINCT word, occurrences re-join vocab-side
      val docs = Tables.documents(s, dir)
      val merges = TextAnalysis.bpeTrainMerges(docs, nMerges = 8, stash = true)
      TextAnalysis.bpeTokenCounts(docs, merges)
    },
    "x_tokenizer_fertility" -> { (s, dir) =>
      // tokenizer fertility report — the standard multilingual tokenizer
      // quality gauge (Ács/Rust et al.: subwords per word, chars per
      // subword, per language — high fertility means the vocab serves
      // that language poorly): the trained BPE artifact applied through
      // the shared vocab-side fold (merges run once per DISTINCT word),
      // then ONE per-language agg in exact integers (ppm floor division,
      // non-negative operands only). The corpus pays nothing beyond the
      // memoized segment relation the x_bpe_* queries already share.
      val docs = Tables.documents(s, dir)
      val merges = TextAnalysis.bpeTrainMerges(docs, nMerges = 8, stash = true)
      TextAnalysis.bpeTokenCounts(docs, merges)
        .join(docs.select("doc_id", "lang", "n_chars"), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
          sum("n_bpe_tokens").as("n_bpe_tokens"),
          sum("n_chars").as("n_chars"))
        .withColumn("fertility_ppm",
          expr("n_bpe_tokens * 1000000 DIV n_words"))
        .withColumn("chars_per_token_ppm",
          expr("n_chars * 1000000 DIV n_bpe_tokens"))
    },
    "x_pipeline_clean" -> { (s, dir) =>
      // the canonical corpus-cleaning flow, composed from the pieces:
      // quality gate → language filter → exact dedup. Everything up to the
      // dedup is a single-pass projection (no shuffle at any scale); the
      // dedup is the one 16-byte-key hash aggregation — so the whole
      // pipeline costs one corpus scan plus one map-side-combinable
      // shuffle, which is the 100 TB shape for this job.
      val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(Tables.documents(s, dir)))
      scored
        .where(col("pred_lang") === "en" &&
          col("n_tokens").between(20, 5000) && col("alnum_ratio") >= 0.8)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("n_tokens")).as("n_tokens"),
          count(lit(1)).as("n_dupes"))
        .select("doc_id", "n_tokens", "n_dupes")
    },

    "x_pipeline_export" -> { (s, dir) =>
      // the full training-export flow, composed: quality gate (projection)
      // -> exact dedup (1 shuffle on the 16-byte digest) -> per-language
      // mixture (map-side filter) -> shard + token-budget bins (1 shuffle
      // on shard). Two shuffles for the whole corpus-to-shards pipeline.
      val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(Tables.documents(s, dir)))
      val clean = scored.where(col("n_tokens").between(20, 5000) && col("alnum_ratio") >= 0.8)
      val deduped = clean.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("n_tokens")).as("n_tokens"),
          min(col("pred_lang")).as("pred_lang"))
        .drop("h")
      val mixed = Curation.mixSample(deduped, groupCol = "pred_lang")
      Curation.packByTokens(mixed.select("doc_id", "pred_lang", "n_tokens"))
        .select("doc_id", "pred_lang", "n_tokens", "shard", "bin")
    },

    // ----- dedup family -----
    "x_dedup_minhash" -> { (s, dir) =>
      Dedup.minhashSignatures(Tables.documents(s, dir), k = mmSeeds)
        .select(col("doc_id"), concat_ws(",", col("sig")).as("sig_str"))
    },
    "x_dedup_lsh_pairs" -> { (s, dir) =>
      Dedup.lshCandidates(Tables.documents(s, dir), k = mmSeeds, bands = mmBands, minEst = 0.5)
    },
    "x_dedup_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), minJaccard = 0.8,
        k = mmSeeds, bands = mmBands)
    },
    "x_dedup_clusters" -> { (s, dir) =>
      // pairs -> connected components: the keep/drop closure per dup class
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.lshCandidates(docs, k = mmSeeds, bands = mmBands, minEst = 0.5)
        .select("id_a", "id_b")
      Dedup.clusters(pairs, docs.select("doc_id"))
    },
    "x_dedup_keep_best" -> { (s, dir) =>
      // representative selection: per duplicate class keep the BEST doc
      // (most tokens, ties to lowest id — a total order), not the
      // arbitrary min-id — the curation step that decides which copy of
      // a near-dup class actually trains. One quality join over the same
      // closure x_dedup_clusters derives + a per-class top-1 window
      // (partition-bounded: a class's rows = its membership, which the
      // LSH band cap already bounds) + the class-size rollup sharing the
      // cluster key.
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.lshCandidates(docs, k = mmSeeds, bands = mmBands, minEst = 0.5)
        .select("id_a", "id_b")
      Dedup.keepBest(Dedup.clusters(pairs, docs.select("doc_id")),
        TextAnalysis.withQuality(docs).select(col("doc_id"), col("n_tokens")),
        scoreCol = "n_tokens")
    },
    "x_dedup_clusters_chain" -> { (s, dir) =>
      // adversarial closure shape: consecutive doc_ids inside a 128-wide
      // block form a pure path (diameter up to 127 — far past any
      // per-round label-propagation budget; the regime that refuses
      // diameter-bounded CC). The alternating large-star/small-star
      // closure must label every block by its head in O(log n) rounds.
      val docs = Tables.documents(s, dir).select("doc_id")
      val pairs = docs.as("a").join(docs.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1 &&
            expr("a.doc_id div 128") === expr("b.doc_id div 128"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      Dedup.clusters(pairs, docs)
    },
    "x_cc_delta" -> { (s, dir) =>
      // incremental closure maintenance: the chain fixture's links that
      // land on a multiple of 16 arrive LATE. The stored assignment
      // clusters the base (chains broken into 16-segments); the refresh
      // absorbs the late links via quotient-graph CC (Dedup.clustersDelta
      // — star loop on delta-sized input, one prior-assignment pass, a
      // broadcast relabel) and must equal the full rebuild, which is
      // exactly what the recursive-CTE oracle recomputes.
      val docs = Tables.documents(s, dir).select("doc_id")
      val all = docs.as("a").join(docs.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1 &&
            expr("a.doc_id div 128") === expr("b.doc_id div 128"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val base = all.where(col("id_b") % 16 =!= 0)
      val late = all.where(col("id_b") % 16 === 0)
      // the prior assignment is STORED (it was the last full clustering
      // run's output) — memoizing it through the artifact store makes
      // the query pay what a deployment pays: the delta-sized quotient
      // CC plus one broadcast-relabel pass, not the base star loop
      val prior = ccPriorMemo(base, "ccChainBase16")(Dedup.clusters(base, docs))
      Dedup.clustersDelta(prior, late, docs)
    },
    "x_dedup_substring_spans" -> { (s, dir) =>
      // maximal cross-doc duplicated token spans at 8-gram granularity
      // (Lee et al.'s suffix-array dedup, relational form)
      Dedup.exactSubstringSpans(Tables.documents(s, dir), k = 8)
    },
    "x_cdc_chunks" -> { (s, dir) =>
      // content-defined chunking over the same positional-gram artifact
      // as x_dedup_substring_spans: boundaries from local content, chunk
      // signatures xor-folded, corpus-wide recurrence flagged — the
      // storage-dedup chunker's analytics
      Dedup.cdcChunks(Tables.documents(s, dir))
    },
    "x_decontaminate_spans" -> { (s, dir) =>
      // substring-level eval-leakage localization: exact verbatim spans
      // (8-gram granularity) shared with the every-10th-doc benchmark —
      // same bench split as x_decontaminate, same gram artifact as
      // x_dedup_substring_spans
      Dedup.decontaminateSpans(Tables.documents(s, dir),
        col("doc_id") % 10 === 0, k = 8)
    },
    "x_span_excise" -> { (s, dir) =>
      // the remediation the span report enables: contaminated docs
      // rebuilt without their leaked passages (clean docs don't report)
      Dedup.exciseSpans(Tables.documents(s, dir),
        col("doc_id") % 10 === 0, k = 8)
    },
    "x_dedup_incremental" -> { (s, dir) =>
      // ingest-time dedup: odd docs arrive as the batch, even docs are the
      // stored corpus — match against its indexes only
      val docs = Tables.documents(s, dir)
      Dedup.dedupeAgainstStored(
        docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1),
        k = mmSeeds, bands = mmBands)
    },
    "x_dedup_simhash" -> { (s, dir) =>
      Dedup.simhashes(Tables.documents(s, dir))
    },
    "x_dedup_embed" -> { (s, dir) =>
      Dedup.embeddingNearDups(Tables.embeddings(s, dir), minCos = 0.45, exactPairs = true)
    },
    "x_dedup_embed_lsh" -> { (s, dir) =>
      // the SCALE path of embedding near-dup (bucketed, no broadcast, no
      // all-pairs) — deterministic like x_knn_lsh (md5 planes), so the
      // bucket join + in-bucket cosine replays as pure SQL
      Dedup.embeddingNearDups(Tables.embeddings(s, dir), minCos = 0.45, exactPairs = false)
    },

    // ----- similarity search -----
    "x_knn_cosine" -> { (s, dir) =>
      val embs = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(embs, embs.where(col("vec_id") < 10), k = 10)
    },
    "x_knn_filtered" -> { (s, dir) =>
      // hybrid filtered vector search (the vector-DB "metadata filter"):
      // top-k cosine among the label-1 slice only. The predicate lands
      // on the CORPUS side before any scoring — pre-filtering, not
      // post-filtering, so a selective filter can never starve the
      // top-k below k while matches exist; on the IVF path the same
      // predicate composes before cell probing.
      val embs = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(embs.where(col("label") === 1),
        embs.where(col("vec_id") < 10), k = 10)
    },
    "x_hard_negatives" -> { (s, dir) =>
      // contrastive hard-negative mining: per query vector, the exact
      // top-k nearest neighbors whose LABEL DIFFERS from the query's —
      // the nearest-but-wrong vectors a contrastive trainer wants as
      // negatives. The label-inequality predicate is pre-filtering
      // (in the join condition, before scoring), so the top-k can
      // never starve while other-label vectors exist.
      val embs = Tables.embeddings(s, dir)
      Similarity.hardNegatives(embs, embs.where(col("vec_id") < 10), k = 10)
    },
    "x_hard_negatives_ann" -> { (s, dir) =>
      // the miner's SCALE path: the same label-disjoint top-k over the
      // IVF index — probe the query's nprobe nearest learned cells, the
      // label inequality filters inside them, nothing broadcasts the
      // corpus. Centroids stash for the oracle's literal replay
      // (the x_knn_ivf contract).
      val embs = Tables.embeddings(s, dir)
      Similarity.hardNegativesAnn(embs, embs.where(col("vec_id") < 10),
        k = 10, kCells = 8, iters = 2, nprobe = 2)
    },
    "x_knn_ivf" -> { (s, dir) =>
      // IVF path with LEARNED cells (deterministic seeded Lloyd's k-means,
      // no fixture column). Approximate RECALL, deterministic COMPUTATION:
      // the run stashes its learned centroids (Similarity.lastLearned) and
      // the oracle replays assignment + probe + top-k over them as literal
      // SQL. ExtSpec additionally asserts recall vs brute force.
      val embs = Tables.embeddings(s, dir)
      Similarity.ivfTopKLearned(embs, embs.where(col("vec_id") < 10), k = 10,
        kCells = 8, iters = 2, nprobe = 2)
    },
    "x_knn_lsh" -> { (s, dir) =>
      // ANN path — approximate recall but fully deterministic by
      // construction (md5-derived hyperplanes), so the oracle reproduces
      // bucket assignment + multi-probe + top-k in pure SQL; the spec also
      // asserts ≥0.5 recall@10 against bruteForceTopK (unclustered data)
      val embs = Tables.embeddings(s, dir)
      Similarity.lshTopK(embs, embs.where(col("vec_id") < 10), k = 10)
    },
    "x_knn_ivf_delta" -> { (s, dir) =>
      // incremental index maintenance: centroids train on the BASE corpus
      // only (every 5th vector arrives later as the delta batch); the
      // frozen model assigns the delta map-only and search covers
      // base ∪ delta. Oracle: the same replay machinery as x_knn_ivf with
      // the base-trained centroids as literals — one shared assignment
      // formula covers both sides precisely because the model is frozen.
      val embs = Tables.embeddings(s, dir)
      Similarity.ivfDeltaTopK(
        embs.where(col("vec_id") % 5 =!= 4),
        embs.where(col("vec_id") % 5 === 4),
        embs.where(col("vec_id") < 10), k = 10, kCells = 8, iters = 2, nprobe = 2)
    },
    "x_knn_ivf_delete" -> { (s, dir) =>
      // the DELETE direction of index maintenance: every 7th vector is
      // dropped from the corpus (a post-dedup document drop) as a
      // TOMBSTONE — the frozen model and stored assignment are untouched,
      // search anti-joins the probed candidates against the tombstone
      // set (candidate-bounded, zero index I/O). Tombstoned ids still
      // appear among the query vectors (vec_id 0 and 7), so the oracle
      // hash proves deleted rows vanish as NEIGHBORS while remaining
      // valid probes. Oracle: x_knn_ivf's replay with the tombstone
      // predicate filtering the assigned CTE.
      val embs = Tables.embeddings(s, dir)
      Similarity.ivfTombstoneTopK(
        embs.where(col("vec_id") % 5 =!= 4),
        embs.where(col("vec_id") % 5 === 4),
        embs.where(col("vec_id") % 7 === 0),
        embs.where(col("vec_id") < 10), k = 10, kCells = 8, iters = 2, nprobe = 2)
    },

    // ----- multimodal plumbing -----
    "x_multimodal_meta" -> { (s, dir) =>
      // synthetic-but-VALID container payloads: each doc becomes a PNG or
      // JPEG (by doc parity) whose header encodes doc-derived dims, with
      // the doc text as trailing bytes. The decode side runs the REAL
      // magic-byte parser (Multimodal.parseHeader) — the oracle replays
      // the construction formulas, so the hash-match proves the parser
      // inverts real PNG IHDR / JPEG SOF layouts byte-for-byte. asset_id
      // is the doc id (DuckDB's md5 can't digest BLOBs, so the md5
      // envelope identity is covered by MultimodalSpec instead).
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      val b = length(encode(col("text"), "UTF-8"))
      val w = (b % 1024 + lit(1)).cast("int")
      val h = (col("doc_id") % 512 + lit(1)).cast("int")
      val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("080600000000000000"))
      val jpegHex = concat(lit("FFD8FFC0001108"),
        lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"), lit("03011100021101031101FFD9"))
      val src = docs.select(col("doc_id").cast("string").as("asset_id"),
        concat(unhex(when(col("doc_id") % 2 === 0, pngHex).otherwise(jpegHex)),
          encode(col("text"), "UTF-8")).as("payload"))
      Multimodal.decode(src).toDF()
        .select("asset_id", "n_bytes", "format", "width", "height")
    },
    "x_multimodal_phash" -> { (s, dir) =>
      // REAL pixel path end-to-end: each doc becomes an 8×8 grayscale PNG
      // (pixel g(x,y) = (doc_id·31 + 7x + 13y) mod 251, scanline filters
      // cycling None/Sub/Up), zlib-deflated by the fixture encoder;
      // decode() runs the real Inflater + unfilter + average-hash over
      // the DECODED pixels. The oracle recomputes the hash from the pixel
      // FORMULA alone — an encoder/decoder bug cannot hash-match. On an
      // 8×8 raster aHash cells are single pixels, which is what makes the
      // closed form SQL-expressible.
      import s.implicits._
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
        .select("doc_id").as[Long]
      val src = docs.map { id =>
        val gray = Array.tabulate(64)(i =>
          (((id * 31 + (i % 8) * 7 + (i / 8) * 13) % 251).toInt))
        (id.toString, Multimodal.encodeGrayPng(8, 8, gray))
      }.toDF("asset_id", "payload")
      Multimodal.decode(src).toDF()
        .select("asset_id", "format", "width", "height", "phash")
    },
    "x_dedup_image_phash" -> { (s, dir) =>
      // pixel-level image dedup end-to-end: docs in the same group
      // (doc_id % 41) share base pixels; odd docs perturb ONE pixel
      // (+120 on (0,0)) — a near-dup, not a copy; and every doc encodes
      // with a doc-dependent filter phase, so identical pixels still ship
      // as DIFFERENT PNG byte streams. Byte-level (md5) dedup finds
      // nothing; the decode → averageHash → banded-pair path must find
      // the groups. The oracle recomputes every hash from the pixel
      // formula and replays band join + Hamming in SQL.
      import s.implicits._
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
        .select("doc_id").as[Long]
      val src = docs.map { id =>
        val g = id % 41
        val gray = Array.tabulate(64) { i =>
          val base = ((g * 31 + (i % 8) * 7 + (i / 8) * 13) % 251).toInt
          if (id % 2 == 1 && i == 0) (base + 120) % 251 else base
        }
        (id.toString, Multimodal.encodeGrayPng(8, 8, gray, phase = (id % 3).toInt))
      }.toDF("asset_id", "payload")
      Multimodal.phashNearDupPairs(Multimodal.decode(src).toDF(), maxHamming = 8)
    },
    "x_multimodal_audio" -> { (s, dir) =>
      // REAL PCM path end-to-end: each doc becomes a 64-sample mono
      // 16-bit WAV (s(i) = (doc_id·7919 + i·104729) mod 65536 − 32768,
      // a JUNK chunk ahead of fmt); decodeAudio runs the real RIFF walk
      // + sample decode and derives RMS / zero-crossings / peak from the
      // DECODED samples. The oracle recomputes every statistic from the
      // sample FORMULA alone — a byte-layout or decode bug cannot match.
      // RMS stays cross-engine exact: integer square sums, /64 (a power
      // of two), one correctly-rounded sqrt.
      import s.implicits._
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
        .select("doc_id").as[Long]
      val src = docs.map { id =>
        val pcm = Array.tabulate(64)(i =>
          (((id * 7919 + i * 104729L) % 65536) - 32768).toInt)
        (id.toString, Multimodal.encodeWavPcm(44100, 1, pcm))
      }.toDF("asset_id", "payload")
      Multimodal.decodeAudio(src).toDF()
        .select("asset_id", "sample_rate", "n_samples", "duration_ms",
          "rms", "zero_crossings", "peak")
    },
    "x_multimodal_envelope" -> { (s, dir) =>
      // the content-hash envelope identity (asset_id = md5(payload),
      // phash prefix) over text payloads — UTF-8 bytes, so DuckDB's
      // VARCHAR md5 digests the identical byte stream
      val assets = Multimodal.toAssets(Tables.documents(s, dir), "text", "text")
      Multimodal.decode(assets).toDF().select("asset_id", "n_bytes", "phash")
    },
    "x_multimodal_frames" -> { (s, dir) =>
      Multimodal.frameSample(
        Multimodal.toAssets(Tables.documents(s, dir), "text", "text"))
    },
    "x_multimodal_gif_frames" -> { (s, dir) =>
      // REAL frame sampling end-to-end: each doc becomes an ANIMATED GIF
      // with 2 + doc_id%3 frames of formulaic 8x8 pixels
      // (g = (doc·31 + frame·17 + x·7 + y·13) mod 251), LZW-encoded by
      // the fixture encoder; the engine must walk the container, LZW-
      // decode each sampled frame through the palette, and average-hash
      // real pixels. The oracle recomputes every hash from the pixel
      // FORMULA (never the bytes) for the sampled frames {0, F-1}.
      import s.implicits._
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
        .select("doc_id").as[Long]
      val src = docs.map { id =>
        val nf = 2 + (id % 3).toInt
        val frames = (0 until nf).map { f =>
          Array.tabulate(64) { i =>
            ((id * 31 + f * 17 + (i % 8) * 7 + (i / 8) * 13) % 251).toInt
          }
        }
        (id.toString, Multimodal.encodeGif(8, 8, frames))
      }.toDF("asset_id", "payload")
      Multimodal.decodeFrames(src, n = 2).toDF()
    },
    "x_multimodal_video_frames" -> { (s, dir) =>
      // REAL video end-to-end: each doc becomes an MJPEG-in-AVI clip with
      // 2 + doc_id%3 frames of 64x64 block-constant pixels
      // (g = (doc·31 + frame·17 + bx·7 + by·13) mod 251) at a per-doc
      // frame rate; the engine must walk the RIFF container (avih for
      // fps, movi for the actual frame chunks), sample frames {0, F-1},
      // and baseline-JPEG-decode each sample through Huffman + dequant +
      // IDCT before hashing real pixels. The oracle recomputes every hash
      // from the block FORMULA (never the bytes) — the FlatQuant8
      // losslessness argument of x_multimodal_jpeg_phash, per frame.
      import s.implicits._
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
        .select("doc_id").as[Long]
      val src = docs.map { id =>
        val nf = 2 + (id % 3).toInt
        val frames = (0 until nf).map { f =>
          Array.tabulate(64 * 64) { i =>
            val bx = (i % 64) / 8; val by = (i / 64) / 8
            ((id * 31 + f * 17 + bx * 7 + by * 13) % 251).toInt
          }
        }
        (id.toString, Multimodal.encodeAviMjpeg(64, 64,
          40000 + (id % 5).toInt * 1000, frames))
      }.toDF("asset_id", "payload")
      Multimodal.decodeVideoFrames(src, n = 2).toDF()
    },
    "x_multimodal_jpeg_phash" -> { (s, dir) =>
      // REAL baseline-JPEG decode end-to-end: each doc becomes a 64x64
      // JPEG of 8x8 block-constant pixels (g = (doc·31 + bx·7 + by·13)
      // mod 251) with FlatQuant8 and restart markers; the engine must
      // walk the markers, Huffman-decode (DC diffs across 64 blocks,
      // RSTn predictor resets), dequant, IDCT and average-hash real
      // pixels. The oracle recomputes every hash from the block FORMULA
      // (never the bytes) — valid because this encode is exactly
      // lossless (see FlatQuant8's doc).
      import s.implicits._
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
        .select("doc_id").as[Long]
      val assets = docs.map { id =>
        val px = Array.tabulate(64 * 64) { i =>
          val bx = (i % 64) / 8; val by = (i / 64) / 8
          ((id * 31 + bx * 7 + by * 13) % 251).toInt
        }
        (id.toString, Multimodal.encodeGrayJpeg(64, 64, px, restartInterval = 3))
      }.toDF("asset_id", "payload")
      Multimodal.decode(assets).toDF()
        .select("asset_id", "format", "width", "height", "phash")
    },
    "x_multimodal_progressive" -> { (s, dir) =>
      // the decode seam's honesty contract: a progressive-DCT (SOF2)
      // payload parses to real header metadata (format/dims) but sits
      // OUTSIDE the baseline decode envelope, so the stage must flag it
      // `decoded = false` rather than passing stand-in features off as
      // pixels. Fixture: minimal SOF2 stream (SOI + SOF2 with per-doc
      // dims + SOS + EOI) built inline, like x_multimodal_meta's headers.
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      val w = (col("doc_id") % 16 + 8).cast("int")
      val h = (col("doc_id") % 7 + 8).cast("int")
      val sof2Hex = concat(lit("FFD8FFC2000B08"),
        lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
        lit("01011100FFDA0008010100003F00FFD9"))
      val src = docs.select(col("doc_id").cast("string").as("asset_id"),
        unhex(sof2Hex).as("payload"))
      Multimodal.decode(src).toDF()
        .select("asset_id", "format", "width", "height", "decoded")
    },
    "x_multimodal_progressive_real" -> { (s, dir) =>
      // REAL progressive decode end-to-end: the same 64x64 block-constant
      // LUMA image as x_multimodal_jpeg_phash, but encoded as SOF2
      // spectral-selection scans. Even docs are GRAYSCALE progressive
      // (DC scan + two AC band scans); odd docs are COLOR 4:2:0
      // progressive (INTERLEAVED 3-component DC scan + per-component AC
      // band scans, chroma planes doc-derived) — the engine must walk
      // every scan, track per-component coefficient grids through the
      // interleaved MCU order, keep the entropy stream in sync through
      // the chroma scans, and IDCT luma at EOI, landing on the identical
      // pixel-formula hash the baseline query proves (same FlatQuant8
      // losslessness argument; only the scan organization differs), with
      // decoded=true. The oracle is one formula for BOTH parities: a
      // color path that desyncs or falls to the stand-in hash-mismatches.
      import s.implicits._
      val docs = Tables.documents(s, dir).where(col("text").isNotNull)
        .select("doc_id").as[Long]
      val assets = docs.map { id =>
        val px = Array.tabulate(64 * 64) { i =>
          val bx = (i % 64) / 8; val by = (i / 64) / 8
          ((id * 31 + bx * 7 + by * 13) % 251).toInt
        }
        val payload =
          if (id % 2 == 0) Multimodal.encodeGrayProgressiveJpeg(64, 64, px)
          else {
            // 4:2:0 chroma at 32x32, block-constant so FlatQuant8 keeps
            // the ENTROPY STREAM exact (content never reaches the luma
            // output — it exists to force real multi-component decode)
            def chroma(seed: Long) = Array.tabulate(32 * 32) { i =>
              val bx = (i % 32) / 8; val by = (i / 32) / 8
              ((id * seed + bx * 11 + by * 3) % 251).toInt
            }
            Multimodal.encodeProgressiveJpeg(64, 64, Seq(
              Multimodal.JpegComp(2, 2, px, 64, 64),
              Multimodal.JpegComp(1, 1, chroma(17), 32, 32),
              Multimodal.JpegComp(1, 1, chroma(23), 32, 32)))
          }
        (id.toString, payload)
      }.toDF("asset_id", "payload")
      Multimodal.decode(assets).toDF()
        .select("asset_id", "format", "width", "height", "decoded", "phash")
    },

    // ----- windows -----
    "x_window_sliding" -> { (s, dir) =>
      Windows.sliding(Tables.events(s, dir), "ts", "1 hour", "30 minutes",
          Seq("event_type"), Seq(count(lit(1)).as("n")))
        .select("window_start", "event_type", "n")
    },
    "x_sessions" -> { (s, dir) =>
      Windows.sessions(Tables.events(s, dir), "ts", "user_id", gapSeconds = 1800)
    },
    "x_resample_ffill" -> { (s, dir) =>
      // irregular events regularized onto an hourly grid with forward
      // fill — the feature-engineering resampler; keyed by
      // (user, bucket), ~720 calendar buckets per user at any corpus size
      Windows.resampleFfill(Tables.events(s, dir))
    },

    // ----- corpus curation -----
    "x_mix_sample" -> { (s, dir) =>
      Curation.mixSample(Tables.documents(s, dir)).select("doc_id", "lang", "source")
    },
    "x_decontaminate" -> { (s, dir) =>
      // eval-leakage check: every 10th doc plays the held-out benchmark
      Curation.decontaminate(Tables.documents(s, dir), col("doc_id") % 10 === 0)
    },
    "x_quality_repetition" -> { (s, dir) =>
      Curation.repetitionMetrics(Tables.documents(s, dir))
    },
    "x_shard_stats" -> { (s, dir) =>
      Curation.shardStats(Tables.documents(s, dir))
    },
    "x_corpus_shuffle" -> { (s, dir) =>
      // deterministic epoch-0 training order: dense per-shard positions
      // via the distributed two-pass rank (range-bucketed hash + bounded
      // offset metadata) — the oracle's single window proves it equal
      Curation.corpusShuffle(Tables.documents(s, dir))
    },
    "x_token_budget_sample" -> { (s, dir) =>
      // greedy per-language token-budget fill in content-hash order —
      // the two-pass prefix sum; the oracle's one-window cumsum proves it
      Curation.tokenBudgetSample(Tables.documents(s, dir))
    },
    "x_stratified_sample" -> { (s, dir) =>
      Curation.stratifiedSample(Tables.documents(s, dir))
        .select("doc_id", "lang", "rk")
    },
    "x_weighted_sample" -> { (s, dir) =>
      // quality-weighted selection: high-resource languages draw more
      // priorities (min-of-w trick — integer A-ES), so P(selected) is
      // exactly proportional to weight with zero float anywhere
      val w = when(col("lang") === "en", 4)
        .when(col("lang").isin("de", "fr"), 2).otherwise(1)
      Curation.weightedSample(Tables.documents(s, dir), w)
        .select("doc_id", "lang", "w", "priority", "rk")
    },
    "x_pack_sequences" -> { (s, dir) =>
      Curation.packSequences(Tables.documents(s, dir))
    },
    "x_dsir_select" -> { (s, dir) =>
      // DSIR data selection (Xie et al. NeurIPS'23): rank every raw
      // (non-English) doc by its hashed-n-gram importance weight against
      // the English target slice and keep the top k — the published
      // target-domain data selector, in its deterministic bit-replayable
      // form (6dp log-probs, decimal sums, integer micro-bits)
      Curation.dsirScores(Tables.documents(s, dir), col("lang") === "en")
    },
    "x_universe_sample" -> { (s, dir) =>
      // universe (key-consistent) sampling (BlinkDB/Quickr): BOTH join
      // sides filter independently by the SAME deterministic hash
      // predicate on the join key, so the ~5% sample of orders arrives
      // with exactly its lineitems — no coordination, no broadcast of
      // sampled keys, each side prunes at its own scan. A row-level
      // sample of each side would keep only ~0.25% of matching pairs
      // and bias every join aggregate; the universe sample keeps the
      // join distribution exact on the sampled key universe.
      def in(k: String) = expr(
        s"cast(conv(substring(md5(concat('u|', cast($k as string))), 1, 15), " +
          s"16, 10) as bigint) % 100 < 5")
      val o = Tables.orders(s, dir).where(in("o_orderkey"))
      val l = Tables.lineitem(s, dir).where(in("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(SparkEntry.dec(col("l_extendedprice")) *
            (lit(java.math.BigDecimal.ONE) - SparkEntry.dec(col("l_discount"))))
            .cast("double").as("revenue"))
    },

    "x_top_terms" -> { (s, dir) =>
      TextAnalysis.topTerms(Tables.documents(s, dir))
        .select("lang", "term", "cnt", "rk")
    },
    "x_quality_unigram_lm" -> { (s, dir) =>
      TextAnalysis.unigramSurprisal(Tables.documents(s, dir))
    },
    "x_quantiles" -> { (s, dir) =>
      // EXACT per-group percentiles (oracle-checkable). Exact percentile
      // buffers each group's values — fine for bounded group counts; the
      // 100 TB default is approx_percentile (quantile sketch, fixed memory),
      // which trades oracle-exactness for a mergeable sketch.
      Tables.events(s, dir).groupBy("event_type")
        .agg(percentile(col("value"), array(lit(0.5), lit(0.9), lit(0.99))).as("qs"))
        .select(col("event_type"), col("qs")(0).as("p50"),
          col("qs")(1).as("p90"), col("qs")(2).as("p99"))
    },

    // ----- point-in-time joins -----
    "x_asof_join" -> { (s, dir) =>
      // attribution: each purchase gets the user's most recent view
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      TemporalJoins.asofLastBefore(purchases, views, Seq("user_id"), "ts", "view_ts", "view_id")
    },
    "x_asof_forward" -> { (s, dir) =>
      // conversion: each view gets the user's next purchase at-or-after it
      val ev = Tables.events(s, dir)
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      TemporalJoins.asofFirstAfter(views, purchases, Seq("user_id"),
        "ts", "purchase_ts", "purchase_id")
    },
    "x_range_join" -> { (s, dir) =>
      // each purchase's click count in the preceding hour, same user
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      TemporalJoins.rangeCount(purchases, clicks, Seq("user_id"), "ts", "ts",
        lowerSec = -3600, upperSec = 0,
        leftIdCols = Seq("event_id", "user_id", "ts"), outCol = "n_clicks")
    }
  )

  // ---------- oracle SQL ----------

  // mirrors TextFunctions.tokens incl. the empty-token strip (split of
  // empty text yields [''] in BOTH engines)
  private[graft] val toksSql =
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')"
  private[graft] def shinglesSql(t: String = toksSql) =
    s"list_distinct(list_transform(range(1, len($t) - 1), i -> array_to_string(($t)[i:i+2], ' ')))"
  private[graft] def seedHashSql(seed: String, v: String) =
    s"(('0x' || substr(md5(CAST($seed AS VARCHAR) || '|' || $v), 1, 15)))::BIGINT"

  /** CTE chain from documents to the benchmark-leakage span table `spx`
    * (8-gram granularity; bench = every 10th doc), shared by
    * x_decontaminate_spans and x_span_excise so the two can never apply
    * different span rules. Also exposes `t (doc_id, tk)`. */
  private val decontSpansCtes: String =
    s"t AS (SELECT doc_id, $toksSql AS tk FROM documents WHERE text IS NOT NULL), " +
      "g AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 6), " +
      "i -> {'pos': i, 'gram': array_to_string(tk[i:i+7], ' ')})) AS u FROM t), " +
      "p AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g), " +
      "bg AS (SELECT DISTINCT gram FROM p WHERE doc_id % 10 = 0), " +
      "cov AS (SELECT doc_id, pos FROM p JOIN bg USING (gram) WHERE doc_id % 10 <> 0), " +
      "isl AS (SELECT doc_id, pos, CASE WHEN pos > coalesce(max(pos + 7) OVER " +
      "(PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1 " +
      "THEN 1 ELSE 0 END AS brk FROM cov), " +
      "lab AS (SELECT doc_id, pos, sum(brk) OVER " +
      "(PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM isl), " +
      "spx AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start, " +
      "CAST(max(pos) + 7 AS BIGINT) AS span_end, " +
      "CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS span_tokens " +
      "FROM lab GROUP BY doc_id, island)"
  // base hash once per shingle, then k affine permutations mod P — mirrors
  // TextFunctions.baseShingleHash / minhashFromHashes exactly
  private val mmP = graft.functions.TextFunctions.MinhashP
  private val baseHashSql =
    s"(('0x' || substr(md5(s), 1, 15)))::BIGINT % $mmP"
  private val baseHashSql2 =
    s"(('0x' || substr(md5(t), 1, 15)))::BIGINT % $mmP"
  private val sigSql = {
    val mins = (0 until mmSeeds).map { i =>
      val (a, b) = graft.functions.TextFunctions.minhashConsts(i)
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $mmP))"
    }
    s"[${mins.mkString(", ")}]"
  }
  private def hashedSql(shSql: String) =
    s"list_sort(list_distinct(list_transform($shSql, s -> $baseHashSql)))"
  private val simhashSql = (0 until 32).map { i =>
    val (a, b) = graft.functions.TextFunctions.minhashConsts(
      graft.functions.TextFunctions.SimhashSeedBase + i)
    s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h * $a + $b) % $mmP % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << i} ELSE 0 END)"
  }.mkString(" + ")
  private val bandShareSql = (0 until mmBands).map { b =>
    val lo = b * (mmSeeds / mmBands) + 1; val hi = lo + (mmSeeds / mmBands) - 1
    s"a.sig[$lo:$hi] = b.sig[$lo:$hi]"
  }.mkString(" OR ")
  private val estSql =
    s"CAST(len(list_filter(list_zip(a.sig, b.sig), p -> p[1] = p[2])) AS DOUBLE) / $mmSeeds"
  private val langs = Seq("en", "de", "fr", "es", "zh")
  private def langScoreSql(l: String) = {
    val sw = TextFunctions.stopwords(l).map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksSql, t -> t IN ($sw)))"
  }
  // shared by x_text_langid and x_pipeline_clean so the tie-break CASE
  // cannot silently desynchronize between the two oracles
  private val langScoresSql = langs.map(l => s"${langScoreSql(l)} AS s_$l").mkString(", ")
  // the quality-scored + language-tagged corpus CTE prefix, shared by
  // x_pipeline_clean and x_pipeline_export so the gate cannot drift
  private lazy val scoredTaggedSql =
    s"scored AS (SELECT doc_id, text, CAST(len($toksSql) AS BIGINT) AS n_tokens, " +
      "CASE WHEN length(text) = 0 THEN NULL ELSE " +
      "floor(CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) " +
      s"/ length(text) * 1000000.0 + 0.5) / 1000000.0 END AS alnum_ratio, $langScoresSql FROM documents), " +
      s"tagged AS (SELECT *, $langIdCaseSql AS pred_lang FROM scored)"
  private val langIdCaseSql = {
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val cases = langs.map(l => s"WHEN s_$l = $best AND s_$l > 0 THEN '$l'").mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }

  // ----- ANN oracles -----
  // x_knn_lsh is deterministic end-to-end: plane weights are md5-derived
  // (VectorFunctions.planeWeights — hex-parse and /2^59 mapping reproduce
  // bit-identically in DuckDB, and list_cosine_similarity matches the
  // cosine kernel's left-fold exactly, both already oracle-proven), so the
  // whole bucket → multi-probe → top-k pipeline replays as pure SQL.
  private val knnPlanes = 4 // Similarity.lshTopK default
  private def lshSignSql(p: Int): String =
    s"(CASE WHEN list_sum(list_transform(range(dim), i -> v[i+1] * " +
      s"((('0x' || substr(md5('plane|$p|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT " +
      "/ 576460752303423488.0) - 1.0))) > 0 THEN '1' ELSE '0' END)"
  private def knnTopKSql(scoredCte: String): String =
    s"ranked AS (SELECT query_id, vec_id, cos, row_number() OVER " +
      s"(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM $scoredCte " +
      "WHERE cos IS NOT NULL) " +
      "SELECT query_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, " +
      "floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim FROM ranked WHERE rank <= 10"
  private[graft] def lshOracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "d AS (SELECT len(v) AS dim FROM e WHERE len(v) > 0 LIMIT 1), " +
      // rows whose vector is off-dim or carries NULL elements get a short
      // bucket in Spark (NULL sign) and are excluded there; same filter here
      s"bk AS (SELECT vec_id, v, ${(0 until knnPlanes).map(lshSignSql).mkString(" || ")} AS b " +
      "FROM e, d WHERE len(v) = dim AND len(list_filter(v, x -> x IS NULL)) = 0), " +
      "q0 AS (SELECT vec_id AS query_id, v AS qv, b AS qb FROM bk WHERE vec_id < 10), " +
      // multi-probe: the query's own bucket plus every Hamming-1 flip
      "probes AS (SELECT query_id, qv, CASE WHEN j = 0 THEN qb ELSE " +
      "substr(qb, 1, j - 1) || CAST(1 - CAST(substr(qb, j, 1) AS INT) AS VARCHAR) || " +
      s"substr(qb, j + 1, $knnPlanes - j) END AS pb FROM q0, range(0, ${knnPlanes + 1}) tj(j)), " +
      "scored AS (SELECT p.query_id, c.vec_id, list_cosine_similarity(p.qv, c.v) AS cos " +
      "FROM probes p JOIN bk c ON c.b = p.pb WHERE c.vec_id <> p.query_id), " +
      "dd AS (SELECT query_id, vec_id, max(cos) AS cos FROM scored GROUP BY 1, 2), " +
      knnTopKSql("dd")
  // x_knn_ivf: the Lloyd's learning pass runs in Spark (its per-cell FP
  // merge order is not reproducible in another engine), but the centroids
  // it lands on ARE the model — embedding them as literals makes the
  // remaining assignment + probe + top-k deterministic SQL. Verify runs
  // queries before dumping oracle SQL, so the stash is always populated;
  // if not (defensive), the entry is omitted and the driver records the
  // old rows-only check.
  private def ivfOracleSql(cents: Seq[(Long, Array[Float])],
                           extraNeighborPred: String = ""): String = {
    val rows = cents.map { case (c, v) =>
      s"($c, [${v.map(_.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(", ")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"cents(cell, cv) AS (VALUES $rows), " +
      // nearest-centroid assignment of EVERY corpus vector: NULL cosine
      // (NULL/degenerate vector) falls to the lowest cell via the -2
      // sentinel, ties break to the lowest cell — assignCells' arg-max
      "assigned AS (SELECT vec_id, v, cell FROM (SELECT e.vec_id, e.v, c.cell, " +
      "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
      "coalesce(list_cosine_similarity(e.v, c.cv), -2.0) DESC, c.cell) AS rn " +
      "FROM e CROSS JOIN cents c) WHERE rn = 1), " +
      "qprobe AS (SELECT query_id, qv, cell FROM (SELECT e.vec_id AS query_id, e.v AS qv, c.cell, " +
      "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
      "list_cosine_similarity(e.v, c.cv) DESC, c.cell) AS rn " +
      "FROM e CROSS JOIN cents c WHERE e.vec_id < 10) WHERE rn <= 2), " +
      "scored AS (SELECT p.query_id, a.vec_id, list_cosine_similarity(p.qv, a.v) AS cos " +
      "FROM qprobe p JOIN assigned a USING (cell) " +
      s"WHERE a.vec_id <> p.query_id$extraNeighborPred), " +
      knnTopKSql("scored")
  }
  // x_dedup_embed's LSH path: same deterministic bucket machinery as the
  // kNN oracle, plus the zero-norm opt-out, then the in-bucket cosine pair
  // join above the threshold
  private def embedLshOracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "d AS (SELECT len(v) AS dim FROM e WHERE len(v) > 0 LIMIT 1), " +
      s"bk AS (SELECT vec_id, v, ${(0 until knnPlanes).map(lshSignSql).mkString(" || ")} AS b " +
      "FROM e, d WHERE len(v) = dim AND len(list_filter(v, x -> x IS NULL)) = 0 " +
      "AND list_sum(list_transform(v, x -> x * x)) > 0) " +
      "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
      "floor(list_cosine_similarity(a.v, b.v) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim " +
      "FROM bk a JOIN bk b ON a.b = b.b AND a.vec_id < b.vec_id " +
      "WHERE list_cosine_similarity(a.v, b.v) > 0.45"

  // ---- BPE oracles: learned merges pinned as literals (the ANN-oracle
  // contract), but every ROUND's argmax is re-derived independently —
  // the pins only carry the vocab state between rounds, so the whole
  // training chain is externally verified, not just replayed. The merge
  // application is the same greedy fold as TextAnalysis.mergeFold,
  // expressed as a DuckDB list_reduce (elements wrapped in singleton
  // lists so the accumulator can be a list).
  private def bpeEsc(s: String): String = s.replace("'", "''")
  private def bpeAppSql(merges: Seq[(String, String, Long)]): String =
    merges.zipWithIndex.foldLeft("(string_split(w, '') || ['</w>'])") {
      case (inner, ((l, r, _), i)) =>
        val k = i + 1
        s"list_reduce(list_transform($inner, gx$k -> [gx$k]), " +
          s"(acc$k, x$k) -> CASE WHEN len(acc$k) >= 1 AND acc$k[-1] = '${bpeEsc(l)}' " +
          s"AND x$k[1] = '${bpeEsc(r)}' " +
          s"THEN acc$k[:-2] || ['${bpeEsc(l + r)}'] ELSE acc$k || x$k END)"
    }
  private val bpeVocabSql =
    s"toks AS (SELECT $toksSql AS t FROM documents WHERE text IS NOT NULL), " +
      "words AS (SELECT unnest(t) AS w FROM toks), " +
      "vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM words GROUP BY 1)"
  private def bpeMergesOracleSql(merges: Seq[(String, String, Long)]): String = {
    val rounds = merges.indices.map { i =>
      s"(SELECT CAST(${i + 1} AS BIGINT) AS merge_rank, p['l'] AS lhs, p['r'] AS rhs, " +
        "CAST(sum(f) AS BIGINT) AS pair_count FROM (" +
        "SELECT f, unnest(list_transform(range(1, len(s)), j -> {'l': s[j], 'r': s[j+1]})) AS p " +
        s"FROM (SELECT f, ${bpeAppSql(merges.take(i))} AS s FROM vocab)) " +
        "GROUP BY 1, 2, 3 ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
    }
    s"WITH $bpeVocabSql SELECT * FROM (${rounds.mkString(" UNION ALL ")})"
  }
  private def bpeSegmentOracleSql(merges: Seq[(String, String, Long)]): String =
    s"WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents WHERE text IS NOT NULL), " +
      "dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS n FROM " +
      "(SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY 1, 2), " +
      s"wl AS (SELECT w, CAST(len(${bpeAppSql(merges)}) AS BIGINT) AS n_sym " +
      "FROM (SELECT DISTINCT w FROM dw)) " +
      "SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words, " +
      "CAST(sum(n * n_sym) AS BIGINT) AS n_bpe_tokens FROM dw JOIN wl USING (w) GROUP BY 1"
  /** Per-language fertility off the same replayed tokenizer: the
    * x_bpe_segment per-doc relation joined back to `documents` for
    * (lang, n_chars), then integer ppm ratios — floor division over
    * non-negative sums on both engines. */
  private def tokenizerFertilityOracleSql(merges: Seq[(String, String, Long)]): String =
    s"WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents WHERE text IS NOT NULL), " +
      "dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS n FROM " +
      "(SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY 1, 2), " +
      s"wl AS (SELECT w, CAST(len(${bpeAppSql(merges)}) AS BIGINT) AS n_sym " +
      "FROM (SELECT DISTINCT w FROM dw)), " +
      "per AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words, " +
      "CAST(sum(n * n_sym) AS BIGINT) AS n_bpe_tokens FROM dw JOIN wl USING (w) GROUP BY 1) " +
      "SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs, " +
      "CAST(sum(p.n_words) AS BIGINT) AS n_words, " +
      "CAST(sum(p.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens, " +
      "CAST(sum(d.n_chars) AS BIGINT) AS n_chars, " +
      "CAST(sum(p.n_bpe_tokens) * 1000000 // sum(p.n_words) AS BIGINT) AS fertility_ppm, " +
      "CAST(sum(d.n_chars) * 1000000 // sum(p.n_bpe_tokens) AS BIGINT) AS chars_per_token_ppm " +
      "FROM per p JOIN documents d USING (doc_id) GROUP BY 1"

  private def bpeOracles: Map[String, String] =
    TextAnalysis.lastBpeMerges match {
      case m if m.nonEmpty =>
        Map("x_bpe_merges" -> bpeMergesOracleSql(m),
          "x_bpe_segment" -> bpeSegmentOracleSql(m),
          "x_tokenizer_fertility" -> tokenizerFertilityOracleSql(m))
      case _ => Map.empty[String, String]
    }

  /** Exact brute-force top-k — the ground truth x_knn_recall measures
    * every approximate method against (shared so they cannot drift). */
  private[graft] val knnCosineOracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
      "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10), " +
      "scored AS (SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qv, e.v) AS cos " +
      "FROM q JOIN e ON e.vec_id <> q.query_id), " +
      "ranked AS (SELECT query_id, vec_id, cos, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored) " +
      "SELECT query_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, " +
      "floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim FROM ranked WHERE rank <= 10"

  /** Same exact-scan shape with the label-inequality predicate in the
    * join — the hard-negative miner's ground truth (and its oracle:
    * brute force IS the spec here). */
  private[graft] val hardNegativesOracleSql: String =
    "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
      "q AS (SELECT vec_id AS query_id, label AS ql, v AS qv FROM e WHERE vec_id < 10), " +
      "scored AS (SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qv, e.v) AS cos " +
      "FROM q JOIN e ON e.vec_id <> q.query_id AND e.label <> q.ql), " +
      "ranked AS (SELECT query_id, vec_id, cos, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored) " +
      "SELECT query_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, " +
      "floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim FROM ranked WHERE rank <= 10"

  /** The x_knn_ivf replay SQL when the run's centroids are stashed —
    * shared with x_knn_recall's oracle (SparkEntryIdx) so the two can
    * never disagree about the replayed model. */
  private[graft] def ivfOracleSqlOpt: Option[String] =
    Similarity.lastLearned match {
      case cents if cents.nonEmpty => Some(ivfOracleSql(cents))
      case _                       => None
    }

  /** The x_hard_negatives_ann replay: [[ivfOracleSql]]'s assignment +
    * probe chain with the label riding both sides and the inequality
    * applied inside the probed cells — the engine's pre-filter exactly. */
  private def ivfHardNegOracleSql(cents: Seq[(Long, Array[Float])]): String = {
    val rows = cents.map { case (c, v) =>
      s"($c, [${v.map(_.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(", ")
    "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"cents(cell, cv) AS (VALUES $rows), " +
      "assigned AS (SELECT vec_id, label, v, cell FROM (SELECT e.vec_id, e.label, e.v, c.cell, " +
      "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
      "coalesce(list_cosine_similarity(e.v, c.cv), -2.0) DESC, c.cell) AS rn " +
      "FROM e CROSS JOIN cents c) WHERE rn = 1), " +
      "qprobe AS (SELECT query_id, ql, qv, cell FROM (SELECT e.vec_id AS query_id, " +
      "e.label AS ql, e.v AS qv, c.cell, " +
      "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
      "list_cosine_similarity(e.v, c.cv) DESC, c.cell) AS rn " +
      "FROM e CROSS JOIN cents c WHERE e.vec_id < 10) WHERE rn <= 2), " +
      "scored AS (SELECT p.query_id, a.vec_id, list_cosine_similarity(p.qv, a.v) AS cos " +
      "FROM qprobe p JOIN assigned a USING (cell) " +
      "WHERE a.vec_id <> p.query_id AND a.label <> p.ql), " +
      knnTopKSql("scored")
  }

  private def annOracles: Map[String, String] =
    Map("x_knn_lsh" -> lshOracleSql,
      "x_dedup_embed_lsh" -> embedLshOracleSql) ++
      ivfOracleSqlOpt.map("x_knn_ivf" -> _).toMap ++
      (Similarity.lastLearnedHardNeg match {
        case cents if cents.nonEmpty =>
          Map("x_hard_negatives_ann" -> ivfHardNegOracleSql(cents))
        case _ => Map.empty[String, String]
      }) ++
      // same replay machinery, base-trained model: the frozen-centroid law
      // means one assignment CTE over ALL vectors equals the engine's
      // base-assign ∪ delta-assign exactly
      (Similarity.lastLearnedDelta match {
        case cents if cents.nonEmpty => Map("x_knn_ivf_delta" -> ivfOracleSql(cents))
        case _                       => Map.empty[String, String]
      }) ++
      // the delete replay: identical chain, with the tombstone predicate
      // (vec_id % 7 = 0) excluding NEIGHBOR rows only — query vectors are
      // deliberately untouched, so a tombstoned id probing the index is
      // covered by the same hash
      (Similarity.lastLearnedTomb match {
        case cents if cents.nonEmpty =>
          Map("x_knn_ivf_delete" -> ivfOracleSql(cents,
            extraNeighborPred = " AND a.vec_id % 7 <> 0"))
        case _ => Map.empty[String, String]
      })

  // closed-form average-hash assembly over an 8x8-per-doc pixel formula —
  // shared by x_multimodal_phash and x_dedup_image_phash so the nibble
  // packing and threshold semantics cannot drift between the two oracles.
  // avg(g) and the engine's mean are both exact doubles (integer sums,
  // /64), so the strict > threshold cannot diverge cross-engine.
  private def phashCtesSql(pixelExpr: String): String =
    s"px AS (SELECT doc_id, x.range AS x, y.range AS y, $pixelExpr AS g " +
      "FROM documents, range(8) x, range(8) y WHERE text IS NOT NULL), " +
      "m AS (SELECT doc_id, avg(g) AS mn FROM px GROUP BY 1), " +
      "nib AS (SELECT p.doc_id, p.y * 2 + p.x // 4 AS k, " +
      "sum(CASE WHEN p.g > m.mn THEN (CASE p.x % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 " +
      "WHEN 2 THEN 2 ELSE 1 END) ELSE 0 END) AS v " +
      "FROM px p JOIN m USING (doc_id) GROUP BY 1, 2), " +
      "hashes AS (SELECT doc_id, " +
      "string_agg(printf('%x', CAST(v AS INT)), '' ORDER BY k) AS phash " +
      "FROM nib GROUP BY doc_id)"

  def oracleSql: Map[String, String] = annOracles ++ bpeOracles ++ Map(
    "p2_match_all" -> "SELECT * FROM region",

    "m1_merge_patch" ->
      ("""WITH li AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY
         l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_discount,
         l_tax, l_returnflag, l_linestatus, l_shipdate) AS seq FROM lineitem),
       base AS (
         SELECT CAST(o.o_orderkey AS VARCHAR) AS order_id,
           CASE WHEN o.o_orderkey % 100 = 0 THEN '0-PATCHED' ELSE o.o_orderpriority END AS o_orderpriority,
           'li' || CAST(l.l_orderkey AS VARCHAR) || '_' || CAST(l.seq AS VARCHAR) AS li_id,
           CASE WHEN o.o_orderkey % 100 = 0 AND l.seq = 1 THEN 999.0 ELSE l.l_quantity END AS qty,
           CASE WHEN o.o_orderkey % 100 = 0 AND l.seq = 1 THEN NULL ELSE p.p_brand END AS brand
         FROM orders o JOIN li l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey),
       appended AS (
         SELECT CAST(o_orderkey AS VARCHAR) AS order_id, '0-PATCHED' AS o_orderpriority,
           'li' || CAST(o_orderkey AS VARCHAR) || '_new' AS li_id, 111.0 AS qty,
           CAST(NULL AS VARCHAR) AS brand
         FROM orders WHERE o_orderkey % 100 = 0
         UNION ALL
         SELECT CAST(o_orderkey AS VARCHAR), '0-PATCHED',
           'li' || CAST(o_orderkey AS VARCHAR) || '_1', 999.0, CAST(NULL AS VARCHAR)
         FROM orders WHERE o_orderkey % 100 = 0
           AND NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o_orderkey))
       SELECT * FROM base UNION ALL SELECT * FROM appended""").replaceAll("\n\\s*", " "),

    "m1_null_clear" ->
      ("SELECT CAST(o_orderkey AS VARCHAR) AS key, " +
        "CASE WHEN o_orderkey % 10 = 0 THEN " +
        "'{\"objectId\":\"' || CAST(o_orderkey AS VARCHAR) || '\",\"objectType\":\"order\"," +
        "\"o_orderstatus\":\"' || o_orderstatus || '\",\"o_orderpriority\":null," +
        "\"note\":\"patched\"}' ELSE " +
        "'{\"objectId\":\"' || CAST(o_orderkey AS VARCHAR) || '\",\"objectType\":\"order\"," +
        "\"o_orderstatus\":\"' || o_orderstatus || '\",\"o_orderpriority\":\"' || " +
        "o_orderpriority || '\"}' END AS doc FROM orders"),

    "m4_if_match" ->
      ("SELECT CAST(o_orderkey AS VARCHAR) AS key, " +
        "CAST(CASE WHEN o_orderkey % 3 = 0 THEN 200 ELSE 412 END AS INT) AS status FROM orders " +
        "UNION ALL SELECT 'Z' || CAST(r AS VARCHAR), CAST(404 AS INT) FROM range(1, 6) t(r)"),

    "m5_validate_json" ->
      ("SELECT event_id, " +
        "CASE WHEN event_id % 5 = 0 THEN NULL ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k_val, " +
        "CAST(CASE WHEN event_id % 5 = 0 THEN 2 ELSE 0 END AS INT) AS n_errors FROM events"),

    "m6_dates" ->
      ("SELECT o_orderkey, CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d') " +
        "ELSE strftime(o_orderdate, '%d-%m-%Y') END AS d, " +
        "(o_orderkey % 3 <> 0) AS valid FROM orders"),

    "m7_key_gate" ->
      ("SELECT 'order_' || CAST(o_orderkey AS VARCHAR) AS key, 'order' AS objectType, " +
        "CAST(CASE WHEN o_orderkey % 13 = 0 THEN o_orderkey + 1 ELSE o_orderkey END AS VARCHAR) AS objectId, " +
        "(o_orderkey % 13 <> 0) AS valid FROM orders"),

    "st2_changelog_apply" ->
      ("SELECT key, doc FROM (SELECT concat('u', CAST(user_id AS VARCHAR), '_', " +
        "CAST(event_id % 50 AS VARCHAR)) AS key, props AS doc, " +
        "CASE WHEN event_id % 7 = 0 THEN 'delete' ELSE 'update' END AS op, " +
        "row_number() OVER (PARTITION BY concat('u', CAST(user_id AS VARCHAR), '_', " +
        "CAST(event_id % 50 AS VARCHAR)) ORDER BY event_id DESC) AS rn FROM events) " +
        "WHERE rn = 1 AND op <> 'delete'"),

    "st1_smoke" ->
      "SELECT 'stream_restart_equals_batch_fold' AS check_name, CAST(1 AS BIGINT) AS ok",

    "st4_barrier_visibility" ->
      ("SELECT key, doc, seq AS last_seq FROM (SELECT *, row_number() OVER (" +
        "PARTITION BY key ORDER BY seq DESC) AS rn FROM (" +
        "SELECT event_id AS seq, CASE WHEN event_id % 7 = 0 THEN 'delete' ELSE 'update' END AS op, " +
        "concat('u', CAST(user_id AS VARCHAR), '_', CAST(event_id % 50 AS VARCHAR)) AS key, " +
        "props AS doc FROM events)) WHERE rn = 1 AND op <> 'delete'"),

    "st5_dlq_split" ->
      ("WITH log AS (SELECT event_id AS seq, " +
        "CASE WHEN event_id % 13 = 0 THEN NULL " +
        "WHEN event_id % 11 = 0 THEN 'zap' " +
        "WHEN event_id % 7 = 0 THEN 'delete' ELSE 'update' END AS op, " +
        "concat('u', CAST(user_id AS VARCHAR), '_', CAST(event_id % 50 AS VARCHAR)) AS key " +
        "FROM events), " +
        "sides AS (SELECT *, CASE WHEN op IN ('insert', 'update', 'delete') " +
        "THEN 'applied' ELSE 'dlq' END AS side FROM log) " +
        "SELECT side, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(op) AS BIGINT) AS n_with_op, " +
        "CAST(count(DISTINCT key) AS BIGINT) AS n_keys FROM sides GROUP BY side"),

    "st6_scd2_history" ->
      ("WITH log AS (SELECT event_id AS seq, " +
        "CASE WHEN event_id % 7 = 0 THEN 'delete' ELSE 'update' END AS op, " +
        "concat('u', CAST(user_id AS VARCHAR), '_', CAST(event_id % 50 AS VARCHAR)) AS key, " +
        "props AS doc FROM events), " +
        // lead() over the same (seq, delete-last, doc) order as
        // Ingest.scd2History so equal-seq chains agree across engines
        "v AS (SELECT *, lead(seq) OVER (PARTITION BY key " +
        "ORDER BY seq, (op = 'delete'), doc) AS valid_to_seq FROM log " +
        "WHERE op IN ('insert', 'update', 'delete')) " +
        "SELECT key, doc, seq AS valid_from_seq, valid_to_seq, " +
        "(valid_to_seq IS NULL) AS is_current FROM v WHERE op <> 'delete'"),

    "x_pit_join" ->
      ("WITH log AS (SELECT event_id AS seq, " +
        "CASE WHEN event_id % 7 = 0 THEN 'delete' ELSE 'update' END AS op, " +
        "concat('u', CAST(user_id AS VARCHAR), '_', CAST(event_id % 50 AS VARCHAR)) AS key, " +
        "props AS doc FROM events), " +
        "v AS (SELECT *, lead(seq) OVER (PARTITION BY key " +
        "ORDER BY seq, (op = 'delete'), doc) AS valid_to_seq FROM log " +
        "WHERE op IN ('insert', 'update', 'delete')), " +
        "hist AS (SELECT key, doc, seq AS valid_from_seq, valid_to_seq " +
        "FROM v WHERE op <> 'delete'), " +
        "probes AS (SELECT DISTINCT concat('u', CAST(user_id AS VARCHAR), '_', " +
        "CAST(event_id % 50 AS VARCHAR)) AS key, " +
        "(user_id * 997 + (event_id % 50) * 131) % 10000 AS as_of_seq FROM events) " +
        "SELECT p.key, p.as_of_seq, h.doc FROM probes p JOIN hist h ON p.key = h.key " +
        "AND h.valid_from_seq <= p.as_of_seq " +
        "AND (h.valid_to_seq IS NULL OR p.as_of_seq < h.valid_to_seq)"),

    "s7_index_delete" ->
      "SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT'",

    "s8_delete_by_query" ->
      ("SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n FROM lineitem " +
        "WHERE NOT (l_shipdate < TIMESTAMP '1996-01-01') GROUP BY 1"),

    "s10_cache_aside" ->
      ("SELECT o_orderkey, CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 " +
        "ELSE o_totalprice END AS price, " +
        "CASE WHEN o_orderkey % 5 = 0 THEN 'cache' ELSE 'index' END AS source FROM orders"),

    "p9_projection" ->
      ("WITH li AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY " +
        "l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_discount, " +
        "l_tax, l_returnflag, l_linestatus, l_shipdate) AS seq FROM lineitem) " +
        "SELECT 'lineitem_li' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(seq AS VARCHAR) AS key, " +
        "l_quantity, l_returnflag FROM li"),

    "p10_search_renest" ->
      ("SELECT CAST(o.o_orderkey AS VARCHAR) AS order_id, o.o_orderstatus, " +
        "CAST((SELECT count(*) FROM lineitem l2 WHERE l2.l_orderkey = o.o_orderkey) AS INT) AS n_items " +
        "FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l " +
        "WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)"),

    "x_text_quality" ->
      (s"SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens, " +
        s"CASE WHEN len($toksSql) = 0 THEN NULL ELSE " +
        s"floor(CAST(length(trim(text)) AS DOUBLE) / len($toksSql) * 1000000.0 + 0.5) / 1000000.0 END AS mean_tok_len, " +
        s"CASE WHEN len($toksSql) = 0 THEN NULL ELSE " +
        s"floor(CAST(${langScoreSql("en")} AS DOUBLE) / len($toksSql) * 1000000.0 + 0.5) / 1000000.0 END AS stop_ratio, " +
        "CASE WHEN length(text) = 0 THEN NULL ELSE " +
        "floor(CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) " +
        "/ length(text) * 1000000.0 + 0.5) / 1000000.0 END AS alnum_ratio FROM documents"),

    "x_text_langid" ->
      (s"SELECT doc_id, $langIdCaseSql AS pred_lang FROM " +
        s"(SELECT doc_id, $langScoresSql FROM documents)"),

    "x_text_fingerprint" ->
      (s"SELECT doc_id, md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) " +
        "AS fingerprint FROM documents"),

    "x_pipeline_clean" ->
      (s"WITH $scoredTaggedSql " +
        "SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens, " +
        "CAST(count(*) AS BIGINT) AS n_dupes FROM tagged " +
        "WHERE pred_lang = 'en' AND n_tokens BETWEEN 20 AND 5000 AND alnum_ratio >= 0.8 " +
        "GROUP BY md5(text)"),

    // the full export flow: quality gate -> exact dedup -> per-language
    // mixture -> shard + token-budget bins; the one query that exercises
    // every curation stage back-to-back
    "x_pipeline_export" -> {
      val cases = graft.ext.Curation.DefaultMixRates
        .map { case (g, r) => s"WHEN '$g' THEN ${graft.ext.Curation.threshold(r)}" }
        .mkString(" ")
      val mixThr = s"CASE pred_lang $cases ELSE ${graft.ext.Curation.threshold(graft.ext.Curation.DefaultMixRate)} END"
      s"WITH $scoredTaggedSql, " +
        "clean AS (SELECT * FROM tagged WHERE n_tokens BETWEEN 20 AND 5000 AND alnum_ratio >= 0.8), " +
        "dedup AS (SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens, " +
        "min(pred_lang) AS pred_lang FROM clean GROUP BY md5(text)), " +
        s"mixed AS (SELECT * FROM dedup WHERE ${seedHashSql(graft.ext.Curation.MixSeed.toString, "CAST(doc_id AS VARCHAR)")} < $mixThr), " +
        s"t AS (SELECT doc_id, pred_lang, n_tokens, " +
        s"${seedHashSql(graft.ext.Curation.ShardSeed.toString, "CAST(doc_id AS VARCHAR)")} % 16 AS shard, " +
        s"${seedHashSql(graft.ext.Curation.PackOrderSeed.toString, "CAST(doc_id AS VARCHAR)")} AS h FROM mixed), " +
        "p AS (SELECT doc_id, pred_lang, n_tokens, shard, sum(n_tokens) OVER " +
        "(PARTITION BY shard ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS pre FROM t) " +
        "SELECT doc_id, pred_lang, n_tokens, shard, " +
        "CAST(floor((pre - n_tokens) / 512) AS BIGINT) AS bin FROM p"
    },

    "x_text_tf_df" ->
      (s"WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2), " +
        "dfx AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1) " +
        "SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS tf, CAST(d.df AS BIGINT) AS df " +
        "FROM tf t JOIN dfx d USING (term)"),

    "x_token_bpeish" ->
      (s"SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens, " +
        "CAST(len(regexp_extract_all(lower(text), '[a-z]{1,8}|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) " +
        "AS n_subtokens FROM documents"),

    "x_dedup_minhash" ->
      (s"SELECT doc_id, array_to_string($sigSql, ',') AS sig_str FROM " +
        s"(SELECT doc_id, ${hashedSql(shinglesSql())} AS hs FROM documents)"),

    // positional 8-grams duplicated across >= 2 distinct docs mark their
    // positions covered; gaps-and-islands merges coverage into maximal
    // spans — same tokenization, same 1-based inclusive span bounds
    // mirrors Dedup.cdcChunks over the same positional 8-gram pipeline
    "x_cdc_chunks" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents WHERE text IS NOT NULL), " +
        "g AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 6), " +
        "i -> {'pos': i, 'gram': array_to_string(tk[i:i+7], ' ')})) AS u FROM t), " +
        s"p AS (SELECT doc_id, u.pos AS pos, (('0x' || substr(md5(u.gram), 1, 15)))::BIGINT % $mmP AS gh FROM g), " +
        "c AS (SELECT doc_id, pos, gh, sum(CASE WHEN gh % 16 = 0 THEN 1 ELSE 0 END) OVER " +
        "(PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk FROM p), " +
        "ch AS (SELECT doc_id, chunk, CAST(count(*) AS BIGINT) AS n_grams, bit_xor(gh) AS sig FROM c GROUP BY 1, 2), " +
        "f AS (SELECT sig, n_grams, CAST(count(*) AS BIGINT) AS cnt FROM ch GROUP BY 1, 2) " +
        "SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks, " +
        "CAST(sum(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks " +
        "FROM ch JOIN f USING (sig, n_grams) GROUP BY 1"),

    "x_dedup_substring_spans" ->
      (s"WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents WHERE text IS NOT NULL), " +
        "g AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 6), " +
        "i -> {'pos': i, 'gram': array_to_string(tk[i:i+7], ' ')})) AS u FROM t), " +
        "p AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g), " +
        "dup AS (SELECT gram FROM p GROUP BY 1 HAVING min(doc_id) <> max(doc_id)), " +
        "cov AS (SELECT doc_id, pos FROM p JOIN dup USING (gram)), " +
        "isl AS (SELECT doc_id, pos, CASE WHEN pos > coalesce(max(pos + 7) OVER " +
        "(PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1 " +
        "THEN 1 ELSE 0 END AS brk FROM cov), " +
        "lab AS (SELECT doc_id, pos, sum(brk) OVER " +
        "(PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM isl) " +
        "SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start, " +
        "CAST(max(pos) + 7 AS BIGINT) AS span_end, " +
        "CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS span_tokens " +
        "FROM lab GROUP BY doc_id, island"),

    // same gram/island machinery as x_dedup_substring_spans, with "dup in
    // some other doc" replaced by "present in some benchmark doc"
    "x_decontaminate_spans" ->
      s"WITH $decontSpansCtes SELECT doc_id, span_start, span_end, span_tokens FROM spx",

    // the excision over those spans: tokens at covered 1-based positions
    // drop, the rest rejoin in order; span-list order is irrelevant (the
    // membership test is order-independent on both engines)
    "x_span_excise" ->
      (s"WITH $decontSpansCtes, " +
        "sp AS (SELECT doc_id, list([span_start, span_end]) AS sps, " +
        "CAST(sum(span_tokens) AS BIGINT) AS n_removed FROM spx GROUP BY 1) " +
        "SELECT t.doc_id, sp.n_removed, " +
        // coalesce: DuckDB's array_to_string of an empty list is NULL,
        // Spark's concat_ws is '' — a fully excised doc must agree
        "coalesce(array_to_string(list_filter(list_transform(range(1, len(t.tk) + 1), " +
        "i -> CASE WHEN len(list_filter(sp.sps, s -> i >= s[1] AND i <= s[2])) > 0 " +
        "THEN NULL ELSE t.tk[i] END), x -> x IS NOT NULL), ' '), '') AS text_clean " +
        "FROM t JOIN sp USING (doc_id)"),

    // a = the incoming (odd) side, b = the stored (even) side; same band
    // share, estimate gate, and exact-Jaccard verify as the self-join path
    "x_dedup_incremental" ->
      (s"WITH base AS (SELECT doc_id, ${shinglesSql()} AS sh FROM documents), " +
        s"sigs AS (SELECT doc_id, hs, $sigSql AS sig FROM " +
        "(SELECT doc_id, " + hashedSql("sh") + " AS hs FROM base)), " +
        "ex AS (SELECT i.doc_id, s.match_id, 'exact' AS kind, CAST(1.0 AS DOUBLE) AS jaccard " +
        "FROM (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1) i " +
        "JOIN (SELECT md5(text) AS h, min(doc_id) AS match_id FROM documents " +
        "WHERE doc_id % 2 = 0 GROUP BY 1) s USING (h)), " +
        "cand AS (SELECT a.doc_id AS doc_id, b.doc_id AS st_id, " +
        "floor((CASE WHEN len(a.hs) = 0 AND len(b.hs) = 0 THEN 1.0 " +
        "ELSE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) / " +
        "(len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) END) * 1000000.0 + 0.5) / 1000000.0 AS jaccard " +
        "FROM sigs a JOIN sigs b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0 " +
        s"AND (($bandShareSql) AND $estSql >= 0.3)), " +
        "nr AS (SELECT doc_id, st_id AS match_id, 'near' AS kind, jaccard " +
        "FROM cand WHERE jaccard >= 0.8 " +
        "QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY jaccard DESC, st_id) = 1) " +
        "SELECT * FROM ex UNION ALL " +
        "SELECT * FROM nr WHERE doc_id NOT IN (SELECT doc_id FROM ex)"),

    // recursive CTE = the independent closure check for the engine's
    // min-label propagation (same candidate pairs as x_dedup_lsh_pairs)
    "x_dedup_clusters" ->
      (s"WITH RECURSIVE sigs AS (SELECT doc_id, $sigSql AS sig FROM " +
        s"(SELECT doc_id, ${hashedSql(shinglesSql())} AS hs FROM documents)), " +
        s"cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        s"FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id " +
        s"WHERE ($bandShareSql) AND $estSql >= 0.5), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM cand " +
        "UNION SELECT id_b, id_a FROM cand), " +
        "walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id) " +
        "SELECT id AS doc_id, min(lbl) AS cluster FROM walk GROUP BY 1"),

    // the same recursive closure + the shared tokenizer's n_tokens; the
    // (n_tokens DESC, doc_id) top-1 mirrors the engine's total order
    "x_dedup_keep_best" ->
      (s"WITH RECURSIVE sigs AS (SELECT doc_id, $sigSql AS sig FROM " +
        s"(SELECT doc_id, ${hashedSql(shinglesSql())} AS hs FROM documents)), " +
        s"cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        s"FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id " +
        s"WHERE ($bandShareSql) AND $estSql >= 0.5), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM cand " +
        "UNION SELECT id_b, id_a FROM cand), " +
        "walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id), " +
        "cl AS (SELECT id AS doc_id, min(lbl) AS cluster FROM walk GROUP BY 1), " +
        s"q AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents), " +
        "j AS (SELECT cl.cluster, cl.doc_id, q.n_tokens FROM cl JOIN q USING (doc_id)), " +
        "sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members FROM j GROUP BY 1) " +
        "SELECT j.cluster, j.doc_id AS kept_doc, j.n_tokens, sz.n_members " +
        "FROM j JOIN sz USING (cluster) " +
        "QUALIFY row_number() OVER (PARTITION BY j.cluster " +
        "ORDER BY j.n_tokens DESC, j.doc_id) = 1"),

    // same recursive-CTE closure check, over a deterministic chain graph
    // (consecutive ids per 128-block) whose diameter defeats any
    // rounds-=-diameter algorithm — the engine side must close it
    // logarithmically
    "x_dedup_clusters_chain" ->
      ("WITH RECURSIVE e0 AS (SELECT a.doc_id AS src, b.doc_id AS dst " +
        "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 " +
        "AND a.doc_id // 128 = b.doc_id // 128), " +
        "edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
        "walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id) " +
        "SELECT id AS doc_id, min(lbl) AS cluster FROM walk GROUP BY 1"),

    // the incremental refresh must equal the full closure over
    // base ∪ late edges — the oracle recomputes that full closure (the
    // base/delta split is invisible to it, which is the point)
    "x_cc_delta" ->
      ("WITH RECURSIVE e0 AS (SELECT a.doc_id AS src, b.doc_id AS dst " +
        "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 " +
        "AND a.doc_id // 128 = b.doc_id // 128), " +
        "edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
        "walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id) " +
        "SELECT id AS doc_id, min(lbl) AS cluster FROM walk GROUP BY 1"),

    "x_dedup_lsh_pairs" ->
      (s"WITH sigs AS (SELECT doc_id, $sigSql AS sig FROM " +
        s"(SELECT doc_id, ${hashedSql(shinglesSql())} AS hs FROM documents)) " +
        s"SELECT a.doc_id AS id_a, b.doc_id AS id_b, $estSql AS est_jaccard " +
        s"FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id " +
        s"WHERE ($bandShareSql) AND $estSql >= 0.5"),

    "x_dedup_ngram_jaccard" ->
      (s"WITH base AS (SELECT doc_id, ${shinglesSql()} AS sh FROM documents), " +
        s"sigs AS (SELECT doc_id, hs, $sigSql AS sig FROM " +
        "(SELECT doc_id, " + hashedSql("sh") + " AS hs FROM base)) " +
        "SELECT * FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "floor((CASE WHEN len(a.hs) = 0 AND len(b.hs) = 0 THEN 1.0 " +
        "ELSE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) / " +
        "(len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) END) * 1000000.0 + 0.5) / 1000000.0 AS jaccard " +
        s"FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id " +
        s"WHERE ($bandShareSql) AND $estSql >= 0.3) WHERE jaccard >= 0.8"),

    "x_dedup_simhash" ->
      (s"SELECT doc_id, CAST($simhashSql AS BIGINT) AS simhash FROM " +
        s"(SELECT doc_id, list_transform($toksSql, t -> $baseHashSql2) AS hs FROM documents)"),

    "x_dedup_embed" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) " +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "floor(list_cosine_similarity(a.v, b.v) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(a.v, b.v) > 0.45"),

    "x_knn_cosine" -> knnCosineOracleSql,
    "x_hard_negatives" -> hardNegativesOracleSql,

    // the exact baseline's SQL with the metadata predicate on the corpus
    // CTE — query vectors stay unfiltered, like the engine side
    "x_knn_filtered" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v " +
        "FROM embeddings WHERE label = 1), " +
        "q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) qv " +
        "FROM embeddings WHERE vec_id < 10), " +
        "scored AS (SELECT q.query_id, e.vec_id, " +
        "list_cosine_similarity(q.qv, e.v) AS cos " +
        "FROM q JOIN e ON e.vec_id <> q.query_id), " +
        "ranked AS (SELECT query_id, vec_id, cos, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored) " +
        "SELECT query_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, " +
        "floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim " +
        "FROM ranked WHERE rank <= 10"),

    // replays the payload CONSTRUCTION (header size + encoded dims); the
    // Spark side re-derives every value by PARSING the bytes it built —
    // a hash match means the magic-byte parser inverts the real layouts
    "x_multimodal_meta" ->
      ("SELECT CAST(doc_id AS VARCHAR) AS asset_id, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 23 END " +
        "+ octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format, " +
        "CAST(octet_length(encode(text)) % 1024 + 1 AS INT) AS width, " +
        "CAST(doc_id % 512 + 1 AS INT) AS height " +
        "FROM documents WHERE text IS NOT NULL"),

    // independent recomputation of the average-hash from the pixel
    // FORMULA (never the bytes): the engine must encode->deflate->
    // inflate->unfilter->hash through real PNG machinery to land on the
    // same 64 bits.
    "x_multimodal_phash" ->
      ("WITH " + phashCtesSql("(doc_id * 31 + x.range * 7 + y.range * 13) % 251") +
        " SELECT CAST(doc_id AS VARCHAR) AS asset_id, 'png' AS format, " +
        "8 AS width, 8 AS height, phash FROM hashes"),

    // replay of the banded perceptual-pair contract: recompute each hash
    // from the pixel formula, collapse identical hashes, then pair via
    // shared-band OR + Hamming <= 8 — the exact LSH-recall semantic the
    // engine's band join computes (never all-pairs there; plain join here
    // is fine at oracle scale).
    "x_dedup_image_phash" ->
      ("WITH " + phashCtesSql(
        "CASE WHEN doc_id % 2 = 1 AND x.range = 0 AND y.range = 0 " +
          "THEN ((doc_id % 41) * 31 + 120) % 251 " +
          "ELSE ((doc_id % 41) * 31 + x.range * 7 + y.range * 13) % 251 END") +
        ", nodes AS (SELECT phash, min(CAST(doc_id AS VARCHAR)) AS rep, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "('0x' || substr(phash, 1, 8))::BIGINT AS h1, " +
        "('0x' || substr(phash, 9, 8))::BIGINT AS h2 FROM hashes GROUP BY phash) " +
        "SELECT a.rep AS rep_a, b.rep AS rep_b, a.phash AS phash_a, " +
        "b.phash AS phash_b, " +
        "CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) AS INT) AS hamming, " +
        "a.n AS n_a, b.n AS n_b FROM nodes a JOIN nodes b ON a.phash < b.phash " +
        "AND (substr(a.phash, 1, 4) = substr(b.phash, 1, 4) " +
        "OR substr(a.phash, 5, 4) = substr(b.phash, 5, 4) " +
        "OR substr(a.phash, 9, 4) = substr(b.phash, 9, 4) " +
        "OR substr(a.phash, 13, 4) = substr(b.phash, 13, 4)) " +
        "WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= 8"),

    // independent recomputation of the audio statistics from the sample
    // FORMULA (never the bytes): the engine must encode->RIFF-walk->
    // PCM-decode through real WAV machinery to land on the same values.
    "x_multimodal_audio" ->
      ("WITH s AS (SELECT doc_id, i.range AS i, " +
        "CAST((doc_id * 7919 + i.range * 104729) % 65536 - 32768 AS BIGINT) AS v " +
        "FROM documents, range(64) i WHERE text IS NOT NULL), " +
        "l AS (SELECT doc_id, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s) " +
        "SELECT CAST(doc_id AS VARCHAR) AS asset_id, 44100 AS sample_rate, " +
        "CAST(64 AS BIGINT) AS n_samples, CAST(64 * 1000 // 44100 AS BIGINT) AS duration_ms, " +
        "sqrt(CAST(sum(v * v) AS DOUBLE) / 64.0) AS rms, " +
        "CAST(sum(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS zero_crossings, CAST(max(abs(v)) AS INT) AS peak " +
        "FROM l GROUP BY doc_id"),

    "x_multimodal_envelope" ->
      ("SELECT md5(text) AS asset_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "substr(md5(text), 1, 16) AS phash FROM documents"),

    "x_multimodal_frames" ->
      ("SELECT md5(text) AS asset_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "f.frame_idx, CAST(floor(f.frame_idx * octet_length(encode(text)) / 4) AS BIGINT) AS byte_offset " +
        "FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3])::BIGINT AS frame_idx) f " +
        "WHERE octet_length(encode(text)) > 0"),

    // per-(doc, frame) replay of the average-hash from the pixel formula
    // for the sampled frames {0, F-1} — the engine must land on the same
    // 64 bits through encode -> container walk -> LZW -> palette -> hash
    "x_multimodal_gif_frames" ->
      ("WITH f AS (SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents " +
        "WHERE text IS NOT NULL), " +
        "fr AS (SELECT doc_id, nf, unnest([0, nf - 1]) AS fi FROM f), " +
        "px AS (SELECT doc_id, nf, fi, x.range AS x, y.range AS y, " +
        "(doc_id * 31 + fi * 17 + x.range * 7 + y.range * 13) % 251 AS g " +
        "FROM fr, range(8) x, range(8) y), " +
        "m AS (SELECT doc_id, fi, avg(g) AS mn FROM px GROUP BY 1, 2), " +
        "nib AS (SELECT p.doc_id, p.nf, p.fi, p.y * 2 + p.x // 4 AS k, " +
        "sum(CASE WHEN p.g > m.mn THEN (CASE p.x % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 " +
        "WHEN 2 THEN 2 ELSE 1 END) ELSE 0 END) AS v " +
        "FROM px p JOIN m ON p.doc_id = m.doc_id AND p.fi = m.fi GROUP BY 1, 2, 3, 4) " +
        "SELECT CAST(doc_id AS VARCHAR) AS asset_id, CAST(nf AS INT) AS n_frames, " +
        "CAST(fi AS INT) AS frame_idx, 8 AS width, 8 AS height, " +
        "string_agg(printf('%x', CAST(v AS INT)), '' ORDER BY k) AS phash " +
        "FROM nib GROUP BY doc_id, nf, fi"),

    // per-frame replay of the average-hash from the block formula for the
    // sampled frames {0, F-1}: the engine must land on the same bits
    // through the AVI walk -> per-frame JPEG decode -> hash, and report
    // the movi-walk frame count plus the avih frame rate
    "x_multimodal_video_frames" ->
      ("WITH f AS (SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents " +
        "WHERE text IS NOT NULL), " +
        "fr AS (SELECT doc_id, nf, unnest([0, nf - 1]) AS fi FROM f), " +
        "px AS (SELECT doc_id, nf, fi, x.range AS bx, y.range AS by, " +
        "(doc_id * 31 + fi * 17 + bx * 7 + by * 13) % 251 AS g " +
        "FROM fr, range(8) x, range(8) y), " +
        "m AS (SELECT doc_id, fi, avg(g) AS mn FROM px GROUP BY 1, 2), " +
        "nib AS (SELECT p.doc_id, p.nf, p.fi, p.by * 2 + p.bx // 4 AS k, " +
        "sum(CASE WHEN p.g > m.mn THEN (CASE p.bx % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 " +
        "WHEN 2 THEN 2 ELSE 1 END) ELSE 0 END) AS v " +
        "FROM px p JOIN m ON p.doc_id = m.doc_id AND p.fi = m.fi GROUP BY 1, 2, 3, 4) " +
        "SELECT CAST(doc_id AS VARCHAR) AS asset_id, CAST(nf AS INT) AS n_frames, " +
        "CAST(40000 + doc_id % 5 * 1000 AS INT) AS us_per_frame, " +
        "CAST(fi AS INT) AS frame_idx, 64 AS width, 64 AS height, " +
        "string_agg(printf('%x', CAST(v AS INT)), '' ORDER BY k) AS phash " +
        "FROM nib GROUP BY doc_id, nf, fi"),

    // per-doc replay of the average-hash from the block formula: the
    // engine must land on the same 64 bits through JPEG encode -> marker
    // walk -> Huffman -> dequant -> IDCT -> hash (lossless by FlatQuant8
    // construction, so the pixel formula IS the decoded image)
    "x_multimodal_jpeg_phash" ->
      ("WITH px AS (SELECT doc_id, x.range AS bx, y.range AS by, " +
        "(doc_id * 31 + bx * 7 + by * 13) % 251 AS g " +
        "FROM documents, range(8) x, range(8) y WHERE text IS NOT NULL), " +
        "m AS (SELECT doc_id, avg(g) AS mn FROM px GROUP BY 1), " +
        "nib AS (SELECT p.doc_id, p.by * 2 + p.bx // 4 AS k, " +
        "sum(CASE WHEN p.g > m.mn THEN (CASE p.bx % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 " +
        "WHEN 2 THEN 2 ELSE 1 END) ELSE 0 END) AS v " +
        "FROM px p JOIN m ON p.doc_id = m.doc_id GROUP BY 1, 2) " +
        "SELECT CAST(doc_id AS VARCHAR) AS asset_id, 'jpeg' AS format, " +
        "64 AS width, 64 AS height, " +
        "string_agg(printf('%x', CAST(v AS INT)), '' ORDER BY k) AS phash " +
        "FROM nib GROUP BY doc_id"),

    // header metadata is real (SOF2 frame dims), decoded must be FALSE:
    // the fixture's combined DC+AC scan is illegal under SOF2, so the
    // stand-in path is taken and FLAGGED
    "x_multimodal_progressive" ->
      ("SELECT CAST(doc_id AS VARCHAR) AS asset_id, 'jpeg-progressive' AS format, " +
        "CAST(doc_id % 16 + 8 AS INT) AS width, CAST(doc_id % 7 + 8 AS INT) AS height, " +
        "FALSE AS decoded FROM documents WHERE text IS NOT NULL"),

    // the jpeg_phash pixel-formula replay, for the SOF2 spectral-selection
    // encode: real multi-scan decode ⇒ decoded TRUE and the identical hash
    "x_multimodal_progressive_real" ->
      ("WITH px AS (SELECT doc_id, x.range AS bx, y.range AS by, " +
        "(doc_id * 31 + bx * 7 + by * 13) % 251 AS g " +
        "FROM documents, range(8) x, range(8) y WHERE text IS NOT NULL), " +
        "m AS (SELECT doc_id, avg(g) AS mn FROM px GROUP BY 1), " +
        "nib AS (SELECT p.doc_id, p.by * 2 + p.bx // 4 AS k, " +
        "sum(CASE WHEN p.g > m.mn THEN (CASE p.bx % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 " +
        "WHEN 2 THEN 2 ELSE 1 END) ELSE 0 END) AS v " +
        "FROM px p JOIN m ON p.doc_id = m.doc_id GROUP BY 1, 2) " +
        "SELECT CAST(doc_id AS VARCHAR) AS asset_id, 'jpeg-progressive' AS format, " +
        "64 AS width, 64 AS height, TRUE AS decoded, " +
        "string_agg(printf('%x', CAST(v AS INT)), '' ORDER BY k) AS phash " +
        "FROM nib GROUP BY doc_id"),

    "x_window_sliding" ->
      ("SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) " +
        "- k * (INTERVAL '30 minutes') AS window_start, event_type, " +
        "CAST(count(*) AS BIGINT) AS n FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) " +
        "GROUP BY 1, 2"),

    // mirrors Windows.resampleFfill: last-obs-per-bucket via named-struct
    // max (deterministic under equal timestamps — no fixture-uniqueness
    // reliance), per-key calendar grid, ignore-nulls carry-forward
    "x_resample_ffill" ->
      ("WITH agg AS (SELECT user_id AS key, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, " +
        "CAST(count(*) AS BIGINT) AS n_obs, " +
        "(max({'t': CAST(ts AS TIMESTAMP), 'i': event_id, 'v': value})).v AS obs " +
        "FROM events GROUP BY 1, 2), " +
        "g AS (SELECT key, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket " +
        "FROM (SELECT key, min(bucket) AS mn, max(bucket) AS mx FROM agg GROUP BY key)), " +
        "j AS (SELECT g.key, g.bucket, coalesce(a.n_obs, 0) AS n_obs, a.obs " +
        "FROM g LEFT JOIN agg a USING (key, bucket)) " +
        "SELECT key, bucket, n_obs, last_value(obs IGNORE NULLS) OVER " +
        "(PARTITION BY key ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS value_ffill FROM j"),

    "x_sessions" ->
      ("WITH flagged AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL THEN 0 " +
        "WHEN epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) " +
        "> 1800000000 THEN 1 ELSE 0 END AS nw FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "sessions AS (SELECT user_id, ts, CAST(sum(nw) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq " +
        "FROM flagged) " +
        "SELECT user_id, session_seq, CAST(min(ts) AS TIMESTAMP) AS session_start, " +
        "CAST(max(ts) AS TIMESTAMP) AS session_end, CAST(count(*) AS BIGINT) AS n_events " +
        "FROM sessions GROUP BY 1, 2"),

    "x_mix_sample" -> {
      // integer-threshold membership: rate·2^60 computed ONCE in Scala
      // (Curation.threshold) and embedded in both plans, so no FP boundary
      // can disagree between engines
      val cases = graft.ext.Curation.DefaultMixRates
        .map { case (g, r) => s"WHEN '$g' THEN ${graft.ext.Curation.threshold(r)}" }
        .mkString(" ")
      s"SELECT doc_id, lang, source FROM documents " +
        s"WHERE ${seedHashSql(graft.ext.Curation.MixSeed.toString, "CAST(doc_id AS VARCHAR)")} " +
        s"< CASE lang $cases ELSE ${graft.ext.Curation.threshold(graft.ext.Curation.DefaultMixRate)} END"
    },

    // same hashed-shingle pipeline as the dedup family (md5 mod P per
    // distinct trigram), so the engine side can reuse that shared artifact
    "x_decontaminate" ->
      (s"WITH sh AS (SELECT doc_id, ${hashedSql(shinglesSql())} AS hs FROM documents), " +
        "grams AS (SELECT doc_id, unnest(hs) AS gh FROM sh), " +
        "bench AS (SELECT DISTINCT gh FROM grams WHERE doc_id % 10 = 0) " +
        "SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits " +
        "FROM grams g JOIN bench b USING (gh) WHERE g.doc_id % 10 <> 0 GROUP BY 1"),

    "x_quality_repetition" ->
      (s"WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents), " +
        "words AS (SELECT doc_id, unnest(t) AS g FROM toks), " +
        "bigs AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), " +
        "i -> array_to_string(t[i:i+1], ' '))) AS g FROM toks), " +
        "wc AS (SELECT doc_id, g, count(*) AS c FROM words GROUP BY 1, 2), " +
        "bc AS (SELECT doc_id, g, count(*) AS c FROM bigs GROUP BY 1, 2), " +
        "wa AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct, " +
        "max(c) AS top_w FROM wc GROUP BY 1), " +
        "ba AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_b FROM bc GROUP BY 1) " +
        "SELECT wa.doc_id, CAST(n_words AS BIGINT) AS n_words, " +
        "CAST(n_distinct AS BIGINT) AS n_distinct, " +
        "floor((1.0 - CAST(n_distinct AS DOUBLE) / n_words) * 1000000.0 + 0.5) / 1000000.0 AS dup_word_frac, " +
        "floor(CAST(top_w AS DOUBLE) / n_words * 1000000.0 + 0.5) / 1000000.0 AS top_word_frac, " +
        "floor(CAST(top_b AS DOUBLE) / n_bigrams * 1000000.0 + 0.5) / 1000000.0 AS top_bigram_frac " +
        "FROM wa LEFT JOIN ba USING (doc_id)"),

    // one global window per shard re-derives the two-pass rank exactly
    "x_corpus_shuffle" -> {
      val h = seedHashSql(graft.ext.Curation.ShuffleOrderSeed.toString,
        "'0|' || CAST(doc_id AS VARCHAR)")
      s"WITH h AS (SELECT doc_id, $h AS hh FROM documents WHERE doc_id IS NOT NULL) " +
        "SELECT doc_id, CAST(hh % 16 AS INT) AS shard, " +
        "CAST(row_number() OVER (PARTITION BY hh % 16 ORDER BY hh, doc_id) AS BIGINT) AS pos " +
        "FROM h"
    },

    // one running-sum window per group re-derives the two-pass prefix
    "x_token_budget_sample" -> {
      val h = seedHashSql(graft.ext.Curation.BudgetSeed.toString, "CAST(doc_id AS VARCHAR)")
      s"WITH t AS (SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_tokens, $h AS hh " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL), " +
        "c AS (SELECT doc_id, lang, n_tokens, sum(n_tokens) OVER " +
        "(PARTITION BY lang ORDER BY hh, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "- n_tokens AS p FROM t) " +
        "SELECT doc_id, lang, n_tokens FROM c WHERE p < 3000"
    },

    "x_shard_stats" ->
      (s"SELECT ${seedHashSql(graft.ext.Curation.ShardSeed.toString, "CAST(doc_id AS VARCHAR)")} % 64 AS shard, " +
        "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc FROM documents GROUP BY 1"),

    // mirrors Curation.weightedSample: per-j draw = md5 hash of
    // "seed|doc_id|j", masked to MaxValue when j > w, least-folded
    "x_weighted_sample" -> {
      val maxLong = Long.MaxValue
      val drawsSql = (1 to 8).map { j =>
        s"CASE WHEN $j <= w THEN ${seedHashSql(graft.ext.Curation.WeightSeed.toString, s"CAST(doc_id AS VARCHAR) || '|$j'")} ELSE $maxLong END"
      }.mkString("least(", ", ", ")")
      "WITH t AS (SELECT doc_id, lang, CASE WHEN lang = 'en' THEN 4 " +
        "WHEN lang IN ('de', 'fr') THEN 2 ELSE 1 END AS w FROM documents), " +
        // mirrors the operator's domain gate (NULL id / sub-1 weight
        // excluded) — vacuous on this fixture, load-bearing on a dirty one
        s"p AS (SELECT doc_id, lang, CAST(w AS BIGINT) AS w, $drawsSql AS priority FROM t WHERE doc_id IS NOT NULL AND w >= 1) " +
        "SELECT doc_id, lang, w, priority, " +
        "CAST(row_number() OVER (ORDER BY priority, doc_id) AS BIGINT) AS rk " +
        "FROM p QUALIFY rk <= 50"
    },

    // universe sampling: ONE key predicate serves both join sides (equal
    // keys ⇒ equal hash), so the oracle states it once on the joined rows
    "x_universe_sample" ->
      ("SELECT o_orderkey, o_orderpriority, CAST(count(*) AS BIGINT) AS n_items, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE (('0x' || substr(md5('u|' || CAST(o_orderkey AS VARCHAR)), 1, 15)))::BIGINT % 100 < 5 " +
        "GROUP BY 1, 2"),

    "x_stratified_sample" ->
      (s"SELECT doc_id, lang, row_number() OVER (PARTITION BY lang " +
        s"ORDER BY ${seedHashSql(graft.ext.Curation.StratSeed.toString, "CAST(doc_id AS VARCHAR)")}, doc_id) AS rk " +
        "FROM documents QUALIFY rk <= 20"),

    "x_pack_sequences" -> {
      val shardSql =
        s"${seedHashSql(graft.ext.Curation.ShardSeed.toString, "CAST(doc_id AS VARCHAR)")} % 16"
      val orderSql =
        seedHashSql(graft.ext.Curation.PackOrderSeed.toString, "CAST(doc_id AS VARCHAR)")
      s"WITH t AS (SELECT doc_id, $shardSql AS shard, $orderSql AS h, " +
        s"CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents), " +
        "p AS (SELECT doc_id, shard, n_tokens, sum(n_tokens) OVER " +
        "(PARTITION BY shard ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS pre FROM t) " +
        "SELECT doc_id, shard, n_tokens, " +
        "CAST(floor((pre - n_tokens) / 512) AS BIGINT) AS bin FROM p"
    },

    // Gopher rules refolded: same per-occurrence sufficient statistics,
    // same cross-multiplied integer thresholds — booleans on both sides
    "x_quality_gopher" ->
      (s"WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents WHERE text IS NOT NULL), " +
        "st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, " +
        "CAST(sum(len(term)) AS BIGINT) AS sum_len, " +
        "CAST(sum(CASE WHEN regexp_matches(term, '[a-z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha, " +
        "CAST(sum(CASE WHEN contains(term, '#') OR contains(term, '...') THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol, " +
        "CAST(count(DISTINCT CASE WHEN term IN ('the','be','to','of','and','that','have','with') " +
        "THEN term END) AS BIGINT) AS stop_hits FROM toks GROUP BY 1) " +
        "SELECT doc_id, n_words, sum_len, n_alpha, n_symbol, stop_hits, " +
        "n_words >= 50 AND n_words <= 100000 AS f_word_count, " +
        "3 * n_words <= sum_len AND sum_len <= 10 * n_words AS f_mean_len, " +
        "5 * n_alpha >= 4 * n_words AS f_alpha_words, " +
        "10 * n_symbol <= n_words AS f_symbol, " +
        "stop_hits >= 2 AS f_stopwords, " +
        "(n_words >= 50 AND n_words <= 100000) AND " +
        "(3 * n_words <= sum_len AND sum_len <= 10 * n_words) AND " +
        "(5 * n_alpha >= 4 * n_words) AND (10 * n_symbol <= n_words) AND " +
        "stop_hits >= 2 AS pass FROM st"),

    // the full composite re-derived rule by rule: word stats off the
    // token relation, line stats off a per-(doc, line) count (the engine's
    // map-side-combinable shape), every threshold the same cross-multiplied
    // integer comparison
    "x_quality_gopher_full" ->
      (s"WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents WHERE text IS NOT NULL), " +
        "st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, " +
        "CAST(sum(len(term)) AS BIGINT) AS sum_len, " +
        "CAST(sum(CASE WHEN regexp_matches(term, '[a-z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha, " +
        "CAST(sum(CASE WHEN contains(term, '#') OR contains(term, '...') THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol, " +
        "CAST(count(DISTINCT CASE WHEN term IN ('the','be','to','of','and','that','have','with') " +
        "THEN term END) AS BIGINT) AS stop_hits FROM toks GROUP BY 1), " +
        "pl AS (SELECT doc_id, line, count(*) AS c FROM (SELECT doc_id, " +
        "unnest(string_split(text, chr(10))) AS line FROM documents WHERE text IS NOT NULL) GROUP BY 1, 2), " +
        "ls AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines, " +
        "CAST(count(*) AS BIGINT) AS n_unique, " +
        "CAST(sum(CASE WHEN regexp_matches(line, '\\.\\.\\.$') THEN c ELSE 0 END) AS BIGINT) AS n_ellipsis, " +
        "CAST(sum(CASE WHEN regexp_matches(line, '^[-*•]') THEN c ELSE 0 END) AS BIGINT) AS n_bullet " +
        "FROM pl GROUP BY 1) " +
        "SELECT doc_id, n_words, sum_len, n_alpha, n_symbol, stop_hits, " +
        "n_lines, n_unique, n_ellipsis, n_bullet, " +
        "n_words >= 50 AND n_words <= 100000 AS f_word_count, " +
        "3 * n_words <= sum_len AND sum_len <= 10 * n_words AS f_mean_len, " +
        "5 * n_alpha >= 4 * n_words AS f_alpha_words, " +
        "10 * n_symbol <= n_words AS f_symbol, " +
        "stop_hits >= 2 AS f_stopwords, " +
        "10 * (n_lines - n_unique) <= 3 * n_lines AS f_dup_lines, " +
        "10 * n_ellipsis <= 3 * n_lines AS f_ellipsis_lines, " +
        "10 * n_bullet <= n_lines AS f_bullet_lines, " +
        "(n_words >= 50 AND n_words <= 100000) AND " +
        "(3 * n_words <= sum_len AND sum_len <= 10 * n_words) AND " +
        "(5 * n_alpha >= 4 * n_words) AND (10 * n_symbol <= n_words) AND " +
        "stop_hits >= 2 AND " +
        "(10 * (n_lines - n_unique) <= 3 * n_lines) AND " +
        "(10 * n_ellipsis <= 3 * n_lines) AND (10 * n_bullet <= n_lines) " +
        "AS pass FROM st JOIN ls USING (doc_id)"),

    // DSIR replayed end-to-end: same hashed uni+bigram buckets (md5 seed
    // hash mod 4096), same add-1-smoothed 6dp log2 models on the en /
    // non-en split, same decimal per-doc sums and integer micro-bits
    "x_dsir_select" -> {
      val b = ext.Curation.DsirBuckets
      val h = s"(${seedHashSql(ext.Curation.DsirSeed.toString, "g")} % $b)"
      s"WITH t AS (SELECT doc_id, lang, $toksSql AS tk FROM documents WHERE text IS NOT NULL), " +
        "ag AS (SELECT doc_id, lang, unnest(tk) AS g FROM t " +
        "UNION ALL SELECT doc_id, lang, unnest(list_transform(range(1, len(tk)), " +
        "i -> tk[i] || ' ' || tk[i+1])) AS g FROM t), " +
        s"feats AS (SELECT doc_id, lang, $h AS b, CAST(count(*) AS BIGINT) AS c " +
        "FROM ag GROUP BY 1, 2, 3), " +
        "tm AS (SELECT b, sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS tc, " +
        "sum(CASE WHEN lang <> 'en' THEN c ELSE 0 END) AS rc FROM feats GROUP BY 1), " +
        "tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM tm), " +
        "model AS (SELECT b, " +
        s"CAST(floor(log2((tc + 1.0) / ((SELECT tt FROM tot) + $b.0)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) - " +
        s"CAST(floor(log2((rc + 1.0) / ((SELECT rt FROM tot) + $b.0)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS lpd " +
        "FROM tm), " +
        "sc AS (SELECT f.doc_id, CAST(sum(f.c) AS BIGINT) AS n_feats, " +
        "sum(CAST(f.c AS DECIMAL(12,0)) * m.lpd) AS s " +
        "FROM feats f JOIN model m ON f.b = m.b WHERE f.lang <> 'en' GROUP BY 1) " +
        "SELECT doc_id, n_feats, CAST(s * 1000000 AS BIGINT) AS logratio_micro " +
        s"FROM sc ORDER BY logratio_micro DESC, doc_id LIMIT ${ext.Curation.DsirTopK}"
    },

    // per-term logprob rounded to 6 decimals BEFORE the per-doc sum, and
    // the sum in DECIMAL(18,6): exact and order-independent on both sides
    "x_quality_unigram_lm" ->
      (s"WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents), " +
        "freq AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1), " +
        "tot AS (SELECT sum(cnt) AS n FROM freq), " +
        "lp AS (SELECT term, floor(log2(CAST(cnt AS DOUBLE) / n) * 1000000.0 + 0.5) / 1000000.0 AS lp FROM freq, tot), " +
        "per AS (SELECT t.doc_id, count(*) AS n_tokens, " +
        "sum(CAST(lp AS DECIMAL(18,6))) AS s FROM toks t JOIN lp USING (term) GROUP BY 1) " +
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "floor((-CAST(s AS DOUBLE) / n_tokens) * 1000000.0 + 0.5) / 1000000.0 AS bits_per_token FROM per"),

    "x_top_terms" ->
      (s"WITH toks AS (SELECT lang, unnest($toksSql) AS term FROM documents), " +
        "counts AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1, 2) " +
        "SELECT lang, term, cnt, row_number() OVER " +
        "(PARTITION BY lang ORDER BY cnt DESC, term) AS rk FROM counts " +
        "QUALIFY rk <= 10"),

    // linear interpolation on the sorted set: both engines compute
    // lo + (hi - lo) * frac at rank p * (n - 1)
    "x_quantiles" ->
      ("SELECT event_type, quantile_cont(value, 0.5) AS p50, " +
        "quantile_cont(value, 0.9) AS p90, quantile_cont(value, 0.99) AS p99 " +
        "FROM events GROUP BY 1"),

    // DuckDB's native ASOF JOIN is the independent semantics check for the
    // engine's union+window implementation (same per-(user,ts) event_id
    // dedup on both sides so ties resolve identically)
    "x_asof_join" ->
      ("WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value " +
        "FROM events WHERE event_type = 'purchase'), " +
        "v AS (SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts " +
        "FROM events WHERE event_type = 'view' " +
        "QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP) " +
        "ORDER BY event_id DESC) = 1) " +
        "SELECT p.event_id, p.user_id, p.ts, p.value, v.view_id, v.view_ts " +
        "FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.view_ts <= p.ts"),

    "x_asof_forward" ->
      ("WITH v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts " +
        "FROM events WHERE event_type = 'view'), " +
        "p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS purchase_ts " +
        "FROM events WHERE event_type = 'purchase' " +
        "QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP) " +
        "ORDER BY event_id DESC) = 1) " +
        "SELECT v.event_id, v.user_id, v.ts, p.purchase_id, p.purchase_ts " +
        "FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND p.purchase_ts >= v.ts"),

    // integer-microsecond window bounds on both sides (memory rule:
    // fractional-second timestamp arithmetic diverges between engines)
    "x_range_join" ->
      ("WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts " +
        "FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts " +
        "FROM events WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, p.ts, CAST(count(c.cts) AS BIGINT) AS n_clicks " +
        "FROM p LEFT JOIN c ON p.user_id = c.user_id " +
        "AND epoch_us(c.cts) >= epoch_us(p.ts) - 3600000000 " +
        "AND epoch_us(c.cts) < epoch_us(p.ts) " +
        "GROUP BY 1, 2, 3")
  )
}
