package graft

import graft.ext.Similarity
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  /** exact squared-L2 top-k — the metric PQ approximates (cosine brute
    * force would conflate quantization error with metric mismatch) */
  private def exactL2TopK(k: Int): Set[(Long, Long)] = {
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = broadcast(embs.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv")))
    val d2 = aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("vec_id"))
    embs.join(q, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), d2.as("d2"))
      .withColumn("r", row_number().over(w)).where(col("r") <= k)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("pqTopK: ADC recall@10 vs exact L2 on the fixture corpus") {
    // near-uniform fixture vectors are PQ's WORST case (no structure to
    // quantize; measured sweep: m=4→0.23, m=8→0.32, m=16/4it→0.49) — the
    // entry's m=16/iters=4 config must clear 0.4 here; clustered corpora
    // (the real shape) do far better, pinned below
    val embs = Tables.embeddings(spark, sf)
    val exact = exactL2TopK(10)
    val pq = Similarity.pqTopK(embs, embs.where(col("vec_id") < 10), k = 10,
        m = 16, iters = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"PQ recall@10 = $recall")
    assert(recall >= 0.4, s"recall $recall")
  }

  test("x_knn_recall reports every approximate method's recall@10 above its floor") {
    // the driver entry measures recall vs the exact cosine top-10 in ONE
    // query; floors sit under the measured fixture values (ivf 0.83,
    // lsh 0.50, pq 0.49, ivfpq 0.45 at sf0.001) with regen headroom —
    // near-uniform fixture vectors are the quantizers' worst case
    val floors = Map("ivf" -> 0.7, "lsh" -> 0.45, "pq" -> 0.35, "ivfpq" -> 0.3)
    val rows = SparkEntry.queries("x_knn_recall")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows.keySet == floors.keySet, s"methods: ${rows.keySet}")
    floors.foreach { case (m, f) =>
      assert(rows(m) >= f, s"$m recall@10 = ${rows(m)} below floor $f")
    }
  }

  test("pqTopK on clustered data recovers cluster membership (>=0.9 recall@10)") {
    import spark.implicits._
    // 8 well-separated centers, 11 members each under small deterministic
    // noise: each query's true top-10 IS its cluster. Within-cluster
    // ordering is noise PQ rightly quantizes away; ACROSS clusters the
    // codewords must keep every cluster-mate ahead of every outsider —
    // that is the property a real embedding corpus needs from PQ.
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 11) yield {
      val base = Array.tabulate(dim)(d => if (d % 8 == c % 8) 10.0 else 0.0)
      val noisy = base.zipWithIndex.map { case (x, d) =>
        x + 0.1 * (((c * 31 + i * 7 + d * 13) % 11) - 5)
      }
      ((c * 11 + i).toLong, noisy)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.where(col("vec_id") % 11 === 0)
    val exact = {
      val embs = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = broadcast(embs.where(col("vec_id") % 11 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv")))
      val d2 = aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      val w = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("vec_id"))
      embs.join(q, col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"), d2.as("d2"))
        .withColumn("r", row_number().over(w)).where(col("r") <= 10)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val pq = Similarity.pqTopK(corpus, qs, k = 10, m = 4, kCodes = 16, iters = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"clustered PQ recall@10 = $recall")
    assert(recall >= 0.9, s"clustered recall $recall")
  }

  test("ivfPqTopK on clustered data: cells prune to the right cluster, codes rank it (>=0.9 recall@10)") {
    import spark.implicits._
    // same clustered construction as the PQ test: with 8 learned cells over
    // 8 true clusters, a query's nprobe=2 candidate set should contain its
    // cluster, and the ADC ranking should keep cluster-mates on top
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 11) yield {
      val base = Array.tabulate(dim)(d => if (d % 8 == c % 8) 10.0 else 0.0)
      val noisy = base.zipWithIndex.map { case (x, d) =>
        x + 0.1 * (((c * 31 + i * 7 + d * 13) % 11) - 5)
      }
      ((c * 11 + i).toLong, noisy)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.where(col("vec_id") % 11 === 0)
    val exact = {
      val embs = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = broadcast(embs.where(col("vec_id") % 11 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv")))
      val d2 = aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      val w = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("vec_id"))
      embs.join(q, col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"), d2.as("d2"))
        .withColumn("r", row_number().over(w)).where(col("r") <= 10)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val got = Similarity.ivfPqTopK(corpus, qs, k = 10,
        kCells = 8, ivfIters = 2, nprobe = 2, m = 4, kCodes = 16, pqIters = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(s"clustered IVF-PQ recall@10 = $recall")
    assert(recall >= 0.9, s"clustered recall $recall")
  }

  test("residual codes beat raw-vector codes at the same budget (intra-cluster ranking)") {
    import spark.implicits._
    // the regime residual quantization exists for: with kCodes sized to
    // the CLUSTER count, raw-vector Lloyd's spends every codeword on the
    // (dominant) center structure, so all 22 members of a cluster encode
    // identically — ADC cannot rank WITHIN a cluster and top-10 degrades
    // to lowest-id ties. After centroid subtraction the codewords spend
    // on the intra-cluster offset patterns instead, which is exactly what
    // ranking the query's own cluster-mates needs.
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 22) yield {
      // centers ≥20 apart per dim (13 prime, 7 invertible: c≠c' differ in
      // EVERY dim) dominate the ±3 offsets, so exact top-10 stays
      // in-cluster. Ids interleave clusters (id = i·8+c) so the k lowest-id
      // Lloyd seeds span all 8 clusters — this test isolates QUANTIZATION
      // quality, not seeding robustness (which learnedCentroids' bounded
      // deterministic seeding genuinely doesn't have on adversarial orders)
      val v = Array.tabulate(dim)(d =>
        ((c * 7 + d * 3) % 13).toDouble * 20.0 + (((i * 5 + d) % 7) - 3).toDouble)
      ((i * 8 + c).toLong, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.where(col("vec_id") < 8)
    val exact = {
      val embs = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = broadcast(embs.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("v").as("qv")))
      val d2 = aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      val w = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("vec_id"))
      embs.join(q, col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"), d2.as("d2"))
        .withColumn("r", row_number().over(w)).where(col("r") <= 10)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def recallOf(got: Set[(Long, Long)]) = (exact & got).size.toDouble / exact.size
    val residual = recallOf(Similarity.ivfPqTopK(corpus, qs, k = 10,
        kCells = 8, ivfIters = 2, nprobe = 2, m = 4, kCodes = 8, pqIters = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val raw = recallOf(Similarity.pqTopK(corpus, qs, k = 10,
        m = 4, kCodes = 8, iters = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    info(s"residual IVF-PQ recall@10 = $residual vs raw PQ = $raw at kCodes=8")
    assert(residual >= 0.8, s"residual recall $residual")
    assert(residual > raw + 0.1,
      s"residual ($residual) should clearly beat raw codes ($raw)")
  }

  test("ivfPqTopK under nprobe=1 (worst-case pruning) still recovers the query's own cluster") {
    import spark.implicits._
    // nprobe=1 is maximal pruning: a query scores ONLY its single nearest
    // cell. On well-separated clusters the query's nearest centroid IS
    // its cluster, so recall should stay high — this pins that the probe
    // selection ranks centroids correctly (a ranking bug hides at
    // nprobe>=2, where the second probe papers over a wrong first pick)
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 11) yield {
      val base = Array.tabulate(dim)(d => if (d % 8 == c % 8) 10.0 else 0.0)
      val noisy = base.zipWithIndex.map { case (x, d) =>
        x + 0.1 * (((c * 31 + i * 7 + d * 13) % 11) - 5)
      }
      ((c * 11 + i).toLong, noisy)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.where(col("vec_id") % 11 === 0)
    val exact = {
      val embs = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = broadcast(embs.where(col("vec_id") % 11 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv")))
      val d2 = aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      val w = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("vec_id"))
      embs.join(q, col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"), d2.as("d2"))
        .withColumn("r", row_number().over(w)).where(col("r") <= 10)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val got = Similarity.ivfPqTopK(corpus, qs, k = 10,
        kCells = 8, ivfIters = 2, nprobe = 1, m = 4, kCodes = 16, pqIters = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(s"clustered IVF-PQ nprobe=1 recall@10 = $recall")
    assert(recall >= 0.85, s"nprobe=1 clustered recall $recall")
  }

  test("ivfPqTopK is deterministic and keeps all three model stashes separate") {
    val embs = Tables.embeddings(spark, sf)
    val ivfBefore = Similarity.lastLearned
    val pqBefore = Similarity.lastLearnedPq
    def run() = Similarity.ivfPqTopK(embs, embs.where(col("vec_id") < 10), k = 10,
        kCells = 8, ivfIters = 2, nprobe = 2, m = 16, kCodes = 16, pqIters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val a = run()
    assert(a.nonEmpty && a == run())
    // composing must clobber NEITHER single-model oracle stash
    assert(Similarity.lastLearned eq ivfBefore)
    assert(Similarity.lastLearnedPq eq pqBefore)
    assert(Similarity.lastLearnedIvfPq._1.nonEmpty && Similarity.lastLearnedIvfPq._2.nonEmpty)
  }

  test("pqTopK is deterministic across reruns (codes, ranks, distances)") {
    val embs = Tables.embeddings(spark, sf)
    def run() = Similarity.pqTopK(embs, embs.where(col("vec_id") < 10), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(run() == run())
  }

  test("pqCodebooks: m subspaces of dim/m, codes dense from 0, separate stash from IVF") {
    val embs = Tables.embeddings(spark, sf)
    val ivfBefore = Similarity.lastLearned
    val books = Similarity.pqCodebooks(embs, m = 4, kCodes = 16, iters = 1, dim = 64)
    assert(books.map(_._1).distinct.sorted == Seq(0, 1, 2, 3))
    assert(books.forall(_._3.length == 16))
    books.groupBy(_._1).foreach { case (_, cws) =>
      assert(cws.map(_._2).sorted == cws.indices.toSeq)
    }
    // learning PQ must not clobber the IVF oracle's centroid stash
    assert(Similarity.lastLearned eq ivfBefore)
    assert(Similarity.lastLearnedPq == books)
  }

  test("training sample is the WHOLE corpus when the corpus fits the bound") {
    // the sample-bounded training contract: fixtures (≤ 100k rows) train
    // on every valid row, so sample-bounding changes nothing at test SF —
    // and the selection is deterministic (seed-fixed xxhash64, no RNG)
    val embs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val all = embs.collect().map(_.getLong(0)).toSet
    val sampled = Similarity.trainSample(embs, "vec_id", 100000)
      .collect().map(_.getLong(0)).toSet
    assert(sampled == all)
    // and when the bound binds, it picks exactly n deterministic rows
    val bounded = Similarity.trainSample(embs, "vec_id", 7)
      .collect().map(_.getLong(0)).toSet
    assert(bounded.size == 7 && bounded.subsetOf(all))
    assert(bounded == Similarity.trainSample(embs, "vec_id", 7)
      .collect().map(_.getLong(0)).toSet)
  }

  test("degenerate vectors (wrong dim / NULL elements) opt out of encoding and search") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(0.0, 0.0, 1.0, 1.0)), (1L, Array(0.1, 0.0, 1.0, 1.0)),
      (2L, Array(5.0, 5.0, -1.0, 0.0)), (3L, Array(0.0, 0.1, 1.1, 1.0)),
      (4L, Array(5.1, 5.0, -1.0, 0.1)),
    ).toDF("vec_id", "embedding")
      .unionByName(Seq((9L, Array(1.0, 2.0))).toDF("vec_id", "embedding")) // off-dim
    val out = Similarity.pqTopK(corpus, corpus.where(col("vec_id") === 0L),
      k = 3, m = 2, kCodes = 2, iters = 2)
    val ids = out.collect().map(_.getLong(2)).toSet
    assert(!ids.contains(9L))
    // nearest by construction: 1 and 3 share vec 0's half-space codes
    assert(out.collect().filter(_.getInt(1) <= 2).map(_.getLong(2)).toSet == Set(1L, 3L))
  }

  test("x_cluster_profile: cells partition the corpus; purity holds its pigeonhole floor") {
    // NOTE the fixture's labels are deliberately near-orthogonal noise in
    // embedding space (within-label avg cosine ≈ across-label), so HIGH
    // purity would be a bug, not a target — the laws here are structural:
    // the cells exactly partition the valid vectors, every majority count
    // is consistent, and purity can never undercut the 1/k pigeonhole
    val q = SparkEntry.queries("x_cluster_profile")(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(q.map(_.getLong(1)).sum == total, "cells must partition all vectors")
    assert(q.forall(r => r.getLong(3) <= r.getLong(1)), "majority ≤ cell size")
    assert(q.forall(r => r.getLong(4) >= 1000000L / 10), // k = 10 labels
      s"purity under the pigeonhole floor: ${q.mkString(";")}")
    assert(q.forall(r => r.getLong(4) == 1000000L * r.getLong(3) / r.getLong(1)))
  }
}
