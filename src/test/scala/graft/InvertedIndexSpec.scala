package graft

import graft.ext.InvertedIndex
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

  /** Every physical node, descending through AQE wrappers (which are
    * leaves to TreeNode traversal) but NOT into InMemoryTableScan's
    * cached relation (its derivation ran once at cache fill — it is not
    * part of this query's execution). Class-based so assertions survive
    * node-name/plan-format changes across Spark versions. */
  private def planNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: planNodes(a.executedPlan)
      case n => Seq(n)
    }

  private def corpus = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "beta gamma delta"),
    (3L, "alpha delta delta epsilon"),
    (4L, "beta beta beta"),
    (5L, ""),
  ).toDF("doc_id", "text")

  test("postings: one row per (term, doc) with the exact tf; empty text contributes nothing") {
    val p = InvertedIndex.postings(corpus).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(p(("alpha", 1L)) == 2L && p(("beta", 4L)) == 3L && p(("delta", 3L)) == 2L)
    assert(!p.keys.exists(_._2 == 5L))
    // relation is keyed: no duplicate (term, doc) rows
    assert(p.size == InvertedIndex.postings(corpus).count())
  }

  test("directory: df/tf_total/range stats and a sorted bounded posting head") {
    val d = InvertedIndex.directory(InvertedIndex.postings(corpus), headCap = 2)
      .collect().map(r => (r.getString(0), r)).toMap
    val beta = d("beta")
    assert(beta.getAs[Long]("df") == 3L && beta.getAs[Long]("tf_total") == 5L)
    assert(beta.getAs[Long]("min_doc") == 1L && beta.getAs[Long]("max_doc") == 4L)
    // head keeps the headCap SMALLEST doc ids, sorted — not an arbitrary sample
    assert(beta.getAs[String]("posting_head") == "1,2")
    assert(d("epsilon").getAs[String]("posting_head") == "3")
  }

  test("directory head is invariant to physical partitioning (two-phase correctness)") {
    val post = InvertedIndex.postings(corpus)
    val a = InvertedIndex.directory(post, headCap = 2)
      .orderBy("term").collect().toSeq
    val b = InvertedIndex.directory(post.repartition(7), headCap = 2)
      .orderBy("term").collect().toSeq
    assert(a == b)
  }

  test("lookupAll: conjunctive intersection matches a brute-force contains-all filter") {
    val terms = Seq("alpha", "delta")
    val got = InvertedIndex.lookupAll(InvertedIndex.postings(corpus), terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(3L -> 3L)) // doc 3: alpha(1) + delta(2)
    // single term degenerates to the posting list itself
    val one = InvertedIndex.lookupAll(InvertedIndex.postings(corpus), Seq("beta"))
      .collect().map(_.getLong(0)).toSet
    assert(one == Set(1L, 2L, 4L))
  }

  test("bm25: rare term outranks dense term; tf saturates; scores deterministic") {
    val docs = Seq(
      (1L, "common common common common rare"),
      (2L, "common common common common common"),
      (3L, "common rare rare"),
      (4L, "common other words here"),
    ).toDF("doc_id", "text")
    val top = InvertedIndex.bm25TopK(docs, Seq("rare"), k = 4).collect()
    // only docs containing the term score; higher tf & shorter doc first
    assert(top.map(_.getLong(0)).toSeq == Seq(3L, 1L))
    assert(top.head.getAs[Int]("rank") == 1)
    // rerun is bit-identical (rounded-decimal sums, total rank order)
    val again = InvertedIndex.bm25TopK(docs, Seq("rare"), k = 4).collect()
    assert(top.map(_.getDouble(1)).toSeq == again.map(_.getDouble(1)).toSeq)
  }

  test("bm25 on an empty corpus returns no rows (no divide-by-zero on avgdl)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(InvertedIndex.bm25TopK(empty, Seq("x")).count() == 0L)
  }

  test("directory's stats and head branches both read the MEMOIZED posting relation") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val docs = graft.sources.Tables.documents(spark, sf)
    val nodes = planNodes(InvertedIndex.directory(InvertedIndex.postings(docs))
      .queryExecution.executedPlan)
    // without the memo boundary Catalyst re-inlines tokenize+aggregate
    // into each branch (two Generates executing); with it, both branches
    // are InMemoryTableScans of one cached relation and no tokenize runs
    assert(nodes.count(_.isInstanceOf[InMemoryTableScanExec]) == 2,
      nodes.map(_.getClass.getSimpleName))
    assert(!nodes.exists(_.isInstanceOf[GenerateExec]),
      nodes.map(_.getClass.getSimpleName))
  }

  private def phraseCorpus = Seq(
    (1L, "a b c a b"),
    (2L, "a a a"),
    (3L, "b a"),
    (4L, "x a b c y"),
  ).toDF("doc_id", "text")

  test("phraseSearch: counts occurrences, overlapping and multi-term chains included") {
    val post = InvertedIndex.positionalPostings(phraseCorpus)
    def run(p: Seq[String]) = InvertedIndex.phraseSearch(post, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(run(Seq("a", "b")) == Map(1L -> 2L, 4L -> 1L))
    // overlapping occurrences both count ("a a a" has two "a a" starts)
    assert(run(Seq("a", "a")) == Map(2L -> 2L))
    // 3-term chain spans two adjacency joins
    assert(run(Seq("a", "b", "c")) == Map(1L -> 1L, 4L -> 1L))
    // single term degenerates to per-doc tf
    assert(run(Seq("b")) == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
    // phrase absent everywhere -> empty, not error
    assert(run(Seq("c", "a", "x")).isEmpty)
  }

  test("phraseSearch is invariant to posting-relation partitioning") {
    val post = InvertedIndex.positionalPostings(phraseCorpus)
    val a = InvertedIndex.phraseSearch(post, Seq("a", "b")).orderBy("doc_id").collect().toSeq
    val b = InvertedIndex.phraseSearch(post.repartition(7), Seq("a", "b"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("applyDocDelta: merged index equals a full rebuild over the final doc set") {
    val base = Seq((0L, "old stale words"), (2L, "keep these words"),
      (4L, "rewrite me now")).toDF("doc_id", "text")
    val upserts = Seq((4L, "fresh new words"), (5L, "brand new doc")).toDF("doc_id", "text")
    val deleted = Seq(0L).toDF("doc_id")
    val merged = InvertedIndex.applyDocDelta(InvertedIndex.postings(base), upserts, deleted)
      .orderBy("term", "doc_id").collect().toSeq
    val rebuilt = InvertedIndex.postings(Seq((2L, "keep these words"),
        (4L, "fresh new words"), (5L, "brand new doc")).toDF("doc_id", "text"))
      .orderBy("term", "doc_id").collect().toSeq
    assert(merged == rebuilt && merged.nonEmpty)
  }

  test("bm25TopKPost over a delta-merged index equals a rebuild; batch rewrites are searchable") {
    val base = Seq((0L, "old stale words"), (2L, "keep spark words"),
      (4L, "spark query body")).toDF("doc_id", "text")
    val upserts = Seq((4L, "spark query body updated entry"),
      (5L, "fresh spark doc")).toDF("doc_id", "text")
    val deleted = Seq(0L).toDF("doc_id")
    val merged = InvertedIndex.applyDocDelta(
      InvertedIndex.postings(base), upserts, deleted)
    val rebuilt = InvertedIndex.postings(Seq((2L, "keep spark words"),
      (4L, "spark query body updated entry"), (5L, "fresh spark doc"))
      .toDF("doc_id", "text"))
    val terms = Seq("spark", "updated")
    def rows(post: org.apache.spark.sql.DataFrame) =
      InvertedIndex.bm25TopKPost(post, terms).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val m = rows(merged)
    assert(m == rows(rebuilt), "serving from the merged index must equal a rebuild")
    // the rewrite's injected term ranks its doc first (idf('updated') is
    // the rarest), and the deleted doc never surfaces
    assert(m.head._1 == 4L)
    assert(!m.exists(_._1 == 0L))
  }

  test("sparseTopkCosine: identical docs score 10^6 ppm; disjoint docs never pair") {
    // doc 0 and 1 are identical; doc 2 shares nothing with them
    val docs = Seq((0L, "alpha beta beta"), (1L, "alpha beta beta"),
      (2L, "gamma delta")).toDF("doc_id", "text")
    val got = InvertedIndex.sparseTopkCosine(docs, k = 10, dfCapPpm = 1000000L)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(4)).toMap
    assert(got == Map((0L, 1L) -> 1000000L),
      "only the identical pair materializes, at exactly cos2 = 1e6 ppm")
  }

  test("sparseTopkCosine: the df cut removes stop-terms from both dot and norms") {
    // 'the' appears in all 4 docs (df=4); with a 50% cap it is pruned,
    // so docs sharing ONLY 'the' never pair, and the (0,1) cosine is
    // computed over {alpha, beta} alone: dot=2, norms 2·2 → 1e6 ppm
    val docs = Seq((0L, "the alpha beta"), (1L, "the alpha beta"),
      (2L, "the gamma"), (3L, "the delta")).toDF("doc_id", "text")
    val got = InvertedIndex.sparseTopkCosine(docs, k = 10, dfCapPpm = 500000L)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(4)).toMap
    assert(got == Map((0L, 1L) -> 1000000L))
    // with no cut (100%), every doc pairs via 'the'
    val all = InvertedIndex.sparseTopkCosine(docs, k = 10, dfCapPpm = 1000000L)
      .collect()
    assert(all.length == 6, "4 docs sharing a term -> all 6 pairs")
    // top pair is still the identical one, ranked 1 deterministically
    val top = all.find(_.getInt(0) == 1).get
    assert((top.getLong(1), top.getLong(2)) == ((0L, 1L)))
  }

  test("sparseTopkCosine: ppm scoring orders partial overlaps correctly") {
    // (0,1) share 2 of 3 terms; (0,2) share 1 of 3 — cosine must rank
    // (0,1) first; hand values: dot=2, norms 3,3 -> floor(4e6/9)=444444
    val docs = Seq((0L, "a b c"), (1L, "a b d"), (2L, "a e f"))
      .toDF("doc_id", "text")
    val rows = InvertedIndex.sparseTopkCosine(docs, k = 10, dfCapPpm = 1000000L)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getInt(0), r.getLong(4)))
    val m = rows.map(t => t._1 -> t._3).toMap
    assert(m((0L, 1L)) == 444444L && m((0L, 2L)) == 111111L)
    assert(rows.find(_._1 == ((0L, 1L))).get._2 == 1)
  }

  test("rrfFusion equals a driver-side reference fold; absent docs score one leg only") {
    // two rankings over one query: doc 1 leads leg A and trails leg B,
    // doc 2 the reverse, docs 3/4 are single-leg — the reference fold is
    // exact integer arithmetic over lcm-scaled reciprocals
    val a = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 2L, 1), (0L, 1L, 2), (0L, 4L, 3))
      .toDF("query_id", "doc_id", "rank")
    val got = InvertedIndex.rrfFusion(Seq("a" -> a, "b" -> b), topK = 10)
      .orderBy("rank")
      .select("doc_id", "a_rank", "b_rank", "rrf_scaled", "rank")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    val L = InvertedIndex.RrfScale
    def ref(ra: Long, rb: Long) =
      (if (ra > 0) L / ra else 0L) + (if (rb > 0) L / rb else 0L)
    // docs 1 and 2 tie at L + L/2; the (rrf DESC, doc_id) total order
    // puts 1 first; single-leg docs 3/4 score L/3 each, 3 before 4
    assert(got == Seq(
      (1L, 1L, 2L, ref(1, 2), 1), (2L, 2L, 1L, ref(2, 1), 2),
      (3L, 3L, 0L, ref(3, 0), 3), (4L, 0L, 3L, ref(0, 3), 4)), got.toString)
    // exactness of the scale: every reciprocal is integral
    assert((1 to InvertedIndex.RrfMaxRank).forall(r => L % r == 0))
  }

  test("rrfFusion: a rank outside the integer scale's range fails loudly") {
    val a = Seq((0L, 1L, 1)).toDF("query_id", "doc_id", "rank")
    val bad = Seq((0L, 1L, InvertedIndex.RrfMaxRank + 1))
      .toDF("query_id", "doc_id", "rank")
    val ex = intercept[Exception] {
      InvertedIndex.rrfFusion(Seq("a" -> a, "b" -> bad), topK = 5).collect()
    }
    assert(ex.getMessage != null)
  }

  test("x_hybrid_search: fused lists are full, deterministic, and genuinely hybrid") {
    val rows = SparkEntry.queries("x_hybrid_search")(spark, sf).collect()
    // 10 queries x top-10 (both legs are at least 10 deep at every sf)
    assert(rows.length == 100, s"${rows.length}")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach { qr =>
      val sorted = qr.sortBy(_.getInt(5))
      // rrf non-increasing down the fused list, ranks 1..10
      val scores = sorted.map(_.getLong(4))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
      assert(sorted.map(_.getInt(5)).toSeq == (1 to 10))
      // hybrid: at least one fused hit per query carries BOTH leg ranks
      // (vec_id 0..9 always retrieves itself... is excluded; but the
      // corpus is small enough that lexical and vector tops overlap)
      assert(sorted.forall(r => r.getLong(2) > 0 || r.getLong(3) > 0))
    }
    // both legs contribute somewhere in the fused output
    assert(rows.exists(_.getLong(2) > 0), "no lexical contribution")
    assert(rows.exists(_.getLong(3) > 0), "no vector contribution")
  }

  test("x_hybrid_search_ann: same lexical leg as the exact hybrid, full deterministic lists") {
    val ann = SparkEntry.queries("x_hybrid_search_ann")(spark, sf).collect()
    val exact = SparkEntry.queries("x_hybrid_search")(spark, sf).collect()
    // 10 queries x top-10, ranks 1..10 per query, rrf non-increasing
    assert(ann.length == 100, s"${ann.length}")
    ann.groupBy(_.getLong(0)).values.foreach { qr =>
      val sorted = qr.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to 10))
      val scores = sorted.map(_.getLong(4))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
    // the LEXICAL leg is shared verbatim: the set of (doc, bm25_rank)
    // contributions visible in the fused lists must agree wherever a doc
    // carries a bm25 rank in both outputs
    def bmRanks(rows: Array[org.apache.spark.sql.Row]) =
      rows.filter(_.getLong(2) > 0).map(r => r.getLong(1) -> r.getLong(2)).toMap
    val (ba, be) = (bmRanks(ann), bmRanks(exact))
    val shared = ba.keySet intersect be.keySet
    assert(shared.nonEmpty, "the shared lexical leg must surface in both")
    assert(shared.forall(d => ba(d) == be(d)),
      "bm25 ranks must be identical across the two hybrid entries")
  }

  test("applyDocDelta plan tokenizes ONLY the batch: one Generate, stored postings scanned as-is") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val base = Seq((0L, "old stale words"), (2L, "keep these words")).toDF("doc_id", "text")
    InvertedIndex.postings(base).write.parquet(s"$dir/post")
    val stored = spark.read.parquet(s"$dir/post")
    val upserts = Seq((5L, "brand new doc")).toDF("doc_id", "text")
    val merged = InvertedIndex.applyDocDelta(stored, upserts, Seq(0L).toDF("doc_id"))
    val nodes = planNodes(merged.queryExecution.executedPlan)
    // exactly one explode — the batch's own tokenize (deliberately NOT
    // memo-cached: a long stream would leak one persisted relation per
    // micro-batch); the stored index is scanned as-is, never re-derived
    import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec}
    assert(nodes.count(_.isInstanceOf[GenerateExec]) == 1,
      nodes.map(_.getClass.getSimpleName))
    assert(nodes.count(_.isInstanceOf[FileSourceScanExec]) == 1,
      nodes.map(_.getClass.getSimpleName))
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("keep", 2L), ("these", 2L), ("words", 2L), ("brand", 5L), ("new", 5L), ("doc", 5L)))
  }
}
