package graft

import graft.ext.InvertedIndex
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

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
}
