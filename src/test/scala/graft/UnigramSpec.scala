package graft

import graft.ext.UnigramLm
import graft.plans.{ViterbiExpression, ViterbiKernel}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class UnigramSpec extends SparkSpec {

  private def jmap(vocab: Map[String, Long]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  private def seg(w: String, vocab: Map[String, Long], L: Int): Option[Seq[String]] =
    Option(ViterbiKernel.segment(UTF8String.fromString(w), jmap(vocab), L))
      .map(_.toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq)

  /** every segmentation of `w` into vocab pieces of length ≤ L */
  private def allSegs(w: String, vocab: Map[String, Long], L: Int): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(L, w.length)).flatMap { l =>
      val p = w.substring(0, l)
      if (vocab.contains(p)) allSegs(w.substring(l), vocab, L).map(p :: _) else Nil
    }

  test("Viterbi kernel finds a min-cost segmentation (fuzz vs exhaustive enumeration)") {
    val rnd = new scala.util.Random(42)
    var checked = 0
    for (_ <- 1 to 300) {
      val w = Seq.fill(1 + rnd.nextInt(8))("ab" (rnd.nextInt(2))).mkString
      // random piece subset over w's substrings, random integer costs;
      // singles included half the time so no-path cases get exercised
      val subs = (for (i <- 0 until w.length; l <- 1 to math.min(3, w.length - i))
        yield w.substring(i, i + l)).distinct
      val vocab = subs.filter(_ => rnd.nextBoolean())
        .map(p => p -> (1L + rnd.nextInt(1000))).toMap
      val got = seg(w, vocab, 3)
      val all = allSegs(w, vocab, 3)
      if (all.isEmpty) assert(got.isEmpty, s"$w under $vocab: expected no path, got $got")
      else {
        val bestCost = all.map(_.map(vocab).sum).min
        assert(got.isDefined, s"$w under $vocab: path exists but kernel returned null")
        val ps = got.get
        assert(ps.mkString == w, s"pieces must concat to the word: $ps")
        assert(ps.forall(vocab.contains), s"unknown piece in $ps")
        assert(ps.map(vocab).sum == bestCost,
          s"$w: kernel cost ${ps.map(vocab).sum} != min $bestCost")
        checked += 1
      }
    }
    assert(checked > 100, s"fuzz too weak: only $checked positive cases")
  }

  test("Viterbi tie-break: equal-cost splits resolve to the longest final piece") {
    // "abab": {ab=10, a=5, b=5} makes [ab,ab], [a,b,ab], [ab,a,b], [a,b,a,b]
    // all cost 20; smallest-j backtrace picks [ab, ab]
    val v = Map("ab" -> 10L, "a" -> 5L, "b" -> 5L)
    assert(seg("abab", v, 4).get == Seq("ab", "ab"))
    // and the codegen'd expression path agrees with the kernel
    import spark.implicits._
    val out = Seq("abab", "ba").toDF("w")
      .select(ViterbiExpression.unigramSegment(col("w"), v.toSeq.sorted, 4).as("ps"))
      .collect().map(r => r.getSeq[String](0).toList).toList
    assert(out == List(List("ab", "ab"), List("b", "a")))
  }

  test("Viterbi segments by code point, not UTF-16 unit") {
    // U+1D11E (musical clef) is a surrogate pair in UTF-16; DuckDB substr
    // counts code points, so the kernel must too
    val clef = new String(Character.toChars(0x1D11E))
    val v = Map(clef -> 1L, "a" -> 1L, (clef + "a") -> 1L)
    assert(seg(clef + "a" + clef, v, 2).get == Seq(clef + "a", clef))
  }

  test("training: M-step arithmetic, vocab shrinkage, and full segmentability") {
    val docs = Tables.documents(spark, sf)
    val t = UnigramLm.train(docs, rounds = 2, maxPieceLen = 4, maxVocab = 64)
    assert(t.roundCounts.size == 2 && t.roundCosts.size == 2)
    // M-step invariant: stored costs ARE recost(stored counts)
    (0 until 2).foreach { r =>
      assert(t.roundCosts(r) == UnigramLm.recost(t.roundCounts(r)),
        s"round ${r + 1} costs diverge from recost(counts)")
    }
    // hard-EM can only shrink the vocabulary (used pieces survive)
    val v1 = t.roundCounts(0).map(_._1).toSet
    val v2 = t.roundCounts(1).map(_._1).toSet
    assert(v2.subsetOf(v1), s"round-2 vocab must be ⊆ round-1: ${v2 -- v1}")
    // every corpus word segments under the FINAL model (no silent drops)
    val words = docs.where(col("text").isNotNull)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .distinct()
    val nulls = words.where(ViterbiExpression.unigramSegment(
      col("w"), t.finalCosts, t.maxPieceLen).isNull).count()
    assert(nulls == 0L, s"$nulls corpus words unsegmentable under the final model")
    // deterministic: retraining from the same corpus reproduces the trace
    Caches.invalidate(spark)
    val t2 = UnigramLm.train(docs, rounds = 2, maxPieceLen = 4, maxVocab = 64)
    assert(t2 == t, "unigram training must be deterministic")
  }

  test("training on an empty / all-NULL corpus yields the empty model, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val t = UnigramLm.train(empty, rounds = 2, maxPieceLen = 4, maxVocab = 64)
    assert(t.finalCosts.isEmpty && t.seedCosts.isEmpty && t.maxWordLen == 0)
    val allNull = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val t2 = UnigramLm.train(allNull, rounds = 2, maxPieceLen = 4, maxVocab = 64)
    assert(t2.finalCosts.isEmpty)
  }

  test("segment counts: words never outnumber pieces and totals line up") {
    val docs = Tables.documents(spark, sf)
    val t = UnigramLm.train(docs, rounds = 2, maxPieceLen = 4, maxVocab = 64)
    val out = UnigramLm.segmentCounts(docs, t).persist()
    try {
      assert(out.where(col("n_pieces") < col("n_words")).isEmpty,
        "a word segments into >= 1 piece")
      // total word count must equal the corpus token count
      val totWords = out.agg(sum("n_words")).head.getLong(0)
      val totToks = docs.where(col("text").isNotNull)
        .select(size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
        .agg(sum("n")).head.getLong(0)
      assert(totWords == totToks, s"$totWords words vs $totToks corpus tokens")
    } finally out.unpersist()
  }

  test("docLmCost: per-doc cost is the exact sum of its words' Viterbi costs") {
    val docs = Tables.documents(spark, sf)
    val t = UnigramLm.train(docs, rounds = 2, maxPieceLen = 4, maxVocab = 64)
    val out = UnigramLm.docLmCost(docs, t).persist()
    try {
      // structural laws: every piece costs > 0 (−ln p of p < 1), so
      // lm_cost bounds n_pieces · min cost; floor mean stays within the
      // model's cost range
      val minC = t.finalCosts.map(_._2).min
      val maxC = t.finalCosts.map(_._2).max
      assert(out.where(col("lm_cost") < col("n_pieces") * minC).isEmpty)
      assert(out.where(col("ppl_micronats") < minC ||
        col("ppl_micronats") > maxC).isEmpty,
        "mean piece cost must sit inside [min piece cost, max piece cost]")
      // exactness on one doc: replay the cost by hand from the word
      // relation and the driver model (a Viterbi replica already fuzzed
      // against exhaustive enumeration above)
      val one = docs.where(col("doc_id") === 0L && col("text").isNotNull)
      if (!one.isEmpty) {
        val words = one.select(explode(
          graft.functions.TextFunctions.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n")).collect()
        val costOf = t.finalCosts.toMap
        val expect = words.map { r =>
          val pieces = seg(r.getString(0), costOf, t.maxPieceLen).get
          r.getLong(1) * pieces.map(costOf).sum
        }.sum
        val got = out.where(col("doc_id") === 0L).head.getLong(2)
        assert(got == expect, s"doc 0 lm_cost $got vs replayed $expect")
      }
    } finally out.unpersist()
  }
}
