package graft

import graft.ext.Sketches
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def terms = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"),
      (col("doc_id") % 4).as("shard"))

  test("per-shard HLL sketches union to a near-exact corpus distinct count") {
    val sketches = Sketches.hllByGroup(terms, col("term"), "shard")
    assert(sketches.count() == 4)
    val est = Sketches.unionEstimate(sketches).collect().head.getLong(0)
    val exact = terms.select("term").distinct().count()
    val err = math.abs(est.toDouble - exact) / exact
    assert(err < 0.05, s"estimate $est vs exact $exact (err $err)")
  }

  test("incremental maintenance: a new shard's sketch unions in without rescanning old shards") {
    val old = Sketches.hllByGroup(terms.where(col("shard") < 3), col("term"), "shard")
      .persist() // stands in for the stored sketch table
    old.count()
    val incr = Sketches.hllByGroup(terms.where(col("shard") === 3), col("term"), "shard")
    val est = Sketches.unionEstimate(old.unionByName(incr)).collect().head.getLong(0)
    val full = Sketches.unionEstimate(Sketches.hllByGroup(terms, col("term"), "shard"))
      .collect().head.getLong(0)
    // sketch union is exact over sketches: incrementally-built == rebuilt
    assert(est == full, s"incremental $est != full rebuild $full")
    old.unpersist()
  }

  test("count-min: merge law, one-sided bound, exactness at wide width") {
    import spark.implicits._
    val a = Seq("x", "x", "y", "z", "x", "y").toDF("term")
    val b = Seq("y", "w", "w").toDF("term")
    val all = a.unionByName(b)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // sketch of the union == bucket-wise sum of the shards' sketches
    // (width rides along in the group key, so a mis-merged pair of
    // different-width sketches surfaces as distinct rows, not silence)
    val whole = Sketches.cmsTable(all, col("term"), depth = 3, width = 8)
    val merged = Sketches.cmsTable(a, col("term"), 3, 8)
      .unionByName(Sketches.cmsTable(b, col("term"), 3, 8))
      .groupBy("d", "bucket", "width").agg(sum("counter").as("counter"))
      .select("d", "bucket", "counter", "width")
    assert(rows(whole) == rows(merged))
    val probes = Seq("x", "y", "z", "w", "absent").toDF("term")
    val exact = Map("x" -> 3L, "y" -> 3L, "z" -> 1L, "w" -> 2L, "absent" -> 0L)
    // narrow sketch: estimates may collide upward but never undercount;
    // (depth, width) derive from the table — no repeated build params
    val est8 = Sketches.cmsEstimate(whole, probes, col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) => assert(est8(t) >= n, s"$t: ${est8(t)} < $n") }
    // the merged table estimates identically to the whole-build one
    val estM = Sketches.cmsEstimate(merged, probes, col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estM == est8)
    // wide sketch: no collisions at this cardinality -> exact counts
    val wide = Sketches.cmsTable(all, col("term"), 3, 4096)
    val estW = Sketches.cmsEstimate(wide, probes, col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estW == exact)
    // a table mixing widths (bad merge) fails loudly instead of undercounting
    val bad = whole.unionByName(wide)
    val err = intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(bad, probes, col("term"))
    }
    assert(err.getMessage.contains("mixes widths"))
  }

  test("kmv: merge law, exactness below k, estimate tracks exact distinct") {
    // hashed-shingle stream grouped into 4 shards — the x_sketch_kmv shape
    val items = graft.ext.Dedup.hashedShingleTable(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .select((col("doc_id") % 4).as("shard"), explode(col("hs")).as("h"))
      .persist()
    try {
      val k = 64
      // merge law: bottom-k of per-half bottom-ks == bottom-k of the union
      val whole = Sketches.kmvTable(
        items.select(lit(0L).as("shard"), col("h")), col("h"), "shard", k)
      val halves = Seq(col("shard") < 2, col("shard") >= 2).map { p =>
        Sketches.kmvTable(items.where(p)
          .select(lit(0L).as("shard"), col("h")), col("h"), "shard", k)
      }
      val merged = Sketches.kmvMerge(halves, 0L, "shard", k)
      def hs(df: org.apache.spark.sql.DataFrame) =
        df.select("h").collect().map(_.getLong(0)).toSet
      assert(hs(whole) == hs(merged), "kmv merge law broke")
      // a group under k distinct values estimates EXACTLY (it is the set)
      val tiny = items.limit(40).select(lit(9L).as("shard"), col("h"))
      val tinyKmv = Sketches.kmvTable(tiny, col("h"), "shard", 128)
      val tinyEst = Sketches.kmvEstimate(tinyKmv, "shard", 128)
        .collect().head.getAs[Long]("est_distinct")
      assert(tinyEst == tiny.distinct().count(), "sub-k group must be exact")
      // estimate error within the bottom-k estimator's expected band
      val kmv = Sketches.kmvTable(items, col("h"), "shard", k)
      val est = Sketches.kmvEstimate(kmv, "shard", k)
        .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("est_distinct")).toMap
      val exact = items.distinct().groupBy("shard").count()
        .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("count")).toMap
      exact.foreach { case (s, n) =>
        val e = est(s)
        if (n <= k) assert(e == n, s"shard $s: sub-k estimate $e != $n")
        else assert(math.abs(e.toDouble - n) / n < 0.5,
          s"shard $s: estimate $e vs exact $n out of band")
      }
    } finally items.unpersist()
  }

  test("kmv pair Jaccard from sketches alone tracks the exact overlap") {
    val items = graft.ext.Dedup.hashedShingleTable(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .select((col("doc_id") % 4).as("shard"), explode(col("hs")).as("h"))
      .persist()
    try {
      val k = 64
      val kmv = Sketches.kmvTable(items, col("h"), "shard", k)
      val est = Sketches.kmvPairJaccard(kmv, "shard", k)
        .collect().map(r => (r.getAs[Long]("g_a"), r.getAs[Long]("g_b")) ->
          r.getAs[Long]("est_jaccard_ppm")).toMap
      val exact = Sketches.pairJaccardExact(items, "shard")
        .collect().map(r => (r.getAs[Long]("g_a"), r.getAs[Long]("g_b")) ->
          r.getAs[Long]("exact_jaccard_ppm")).toMap
      assert(est.keySet == exact.keySet && est.size == 6)
      // k=64 → σ ≈ sqrt(J(1−J)/k) ≈ 6 points; allow a generous fixed band
      exact.foreach { case (pair, x) =>
        assert(math.abs(est(pair) - x) < 250000L,
          s"pair $pair: est ${est(pair)} vs exact $x ppm")
      }
      // the union sample partitions: every top-k member is in exactly one
      // of {both, only-A, only-B}
      Sketches.kmvPairJaccard(kmv, "shard", k).collect().foreach { r =>
        assert(r.getAs[Long]("est_common") + r.getAs[Long]("est_only_a") +
          r.getAs[Long]("est_only_b") == r.getAs[Long]("n_topk"), r.toString)
      }
    } finally items.unpersist()
  }

  test("pairJaccardExact fails loudly past its group-cardinality contract") {
    // the exact side is O(groups² per hash) by construction — a caller
    // pointing it at a corpus-scale group column must get a NAMED job
    // failure, not a silent quadratic plan (resampleFfill's span-clamp
    // idiom, here on group count)
    val dist = spark.range(40)
      .select((col("id") % 4).as("g"), (col("id") % 7).as("h"))
    val e = intercept[Exception] {
      Sketches.pairJaccardExact(dist, "g", maxGroups = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exceed the exact-side bound")),
      s"guard must name the contract, got: ${msgs(e)}")
    // within the bound the guard is invisible: same 4 groups, bound 4
    val ok = Sketches.pairJaccardExact(dist, "g", maxGroups = 4).collect()
    assert(ok.length == 6, s"4 groups -> 6 pairs, got ${ok.length}")
  }

  test("kmv difference estimates: sub-k groups are exact and sides are not swapped") {
    import spark.implicits._
    // A = {1..40}, B = {1..10}: A∖B = 30, B∖A = 0 — both groups under k,
    // so the union sample IS the union and the estimates are EXACT; a
    // swapped est_only_a/est_only_b (mirrored identically in the oracle)
    // would fail here against ground truth
    val items = ((1L to 40L).map(h => (0L, h)) ++ (1L to 10L).map(h => (1L, h)))
      .toDF("g", "h")
    val kmv = Sketches.kmvTable(items, col("h"), "g", 64)
    val r = Sketches.kmvPairJaccard(kmv, "g", 64).collect().head
    assert((r.getAs[Long]("g_a"), r.getAs[Long]("g_b")) == ((0L, 1L)))
    assert(r.getAs[Long]("n_topk") == 40L)
    assert(r.getAs[Long]("est_common") == 10L)
    assert(r.getAs[Long]("est_only_a") == 30L, "A-side difference wrong or swapped")
    assert(r.getAs[Long]("est_only_b") == 0L, "B-side difference wrong or swapped")
    assert(r.getAs[Long]("est_jaccard_ppm") == 1000000L * 10 / 40)
  }

  test("histogram sketch: bin-sum merge law; quantile estimates within one bin of exact") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001").persist()
    try {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val whole = Sketches.histogramTable(ev, col("value"), 0.0, 600.0, 6)
      val merged = Seq(col("event_id") % 2 === 0, col("event_id") % 2 === 1)
        .map(p => Sketches.histogramTable(ev.where(p), col("value"), 0.0, 600.0, 6))
        .reduce(_.unionByName(_))
        .groupBy("bin").agg(sum("cnt").as("cnt"))
      assert(rows(whole) == rows(merged), "histogram merge law broke")
      val est = Sketches.histogramQuantiles(whole, Seq((1, 2), (99, 100)))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val binW = 600.0 / 64
      val Seq(e50, e99) = ev
        .agg(percentile(col("value"), array(lit(0.5), lit(0.99))))
        .collect().head.getSeq[Double](0).toSeq
      // the exact quantile must fall inside (or within one bin of) the
      // estimated bin — bin resolution is the histogram's declared trade
      assert(math.abs((est(500) + 0.5) * binW - e50) <= binW * 1.5,
        s"p50 bin ${est(500)} vs exact $e50")
      assert(math.abs((est(990) + 0.5) * binW - e99) <= binW * 1.5,
        s"p99 bin ${est(990)} vs exact $e99")
    } finally ev.unpersist()
  }

  test("cmsJoinSize: one-sided bound, exact at wide width, width-mismatch fails") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(400)(rnd.nextInt(30).toLong).toDF("k")
    val b = Seq.fill(300)(rnd.nextInt(40).toLong).toDF("k")
    val exact = a.groupBy("k").count().withColumnRenamed("count", "ca")
      .join(b.groupBy("k").count().withColumnRenamed("count", "cb"), "k")
      .agg(sum(col("ca") * col("cb"))).collect().head.getLong(0)
    val est = Sketches.cmsJoinSize(
      Sketches.cmsTable(a, col("k")), Sketches.cmsTable(b, col("k")))
      .collect().head.getLong(0)
    assert(est >= exact, s"inner-product bound violated: $est < $exact")
    // a width far above the key cardinality leaves no colliding cross
    // terms with overwhelming probability over 30+40 keys → estimate
    // collapses to the exact join size
    val wide = Sketches.cmsJoinSize(
      Sketches.cmsTable(a, col("k"), width = 65536),
      Sketches.cmsTable(b, col("k"), width = 65536))
      .collect().head.getLong(0)
    assert(wide == exact, s"collision-free width should be exact: $wide != $exact")
    intercept[IllegalArgumentException] {
      Sketches.cmsJoinSize(Sketches.cmsTable(a, col("k"), width = 128),
        Sketches.cmsTable(b, col("k"), width = 256)).collect()
    }
  }

  test("misra-gries: bound law over every term, compression bites, partition-invariant, per-shard k cap") {
    val cnt = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val shard = TextFunctions.seededHash(col("doc_id").cast("string"), Sketches.MgSeed)
    val (k, nShards) = (4, 4)
    val (summary, ds) = Sketches.mgSummary(cnt, col("term"), col("c"), shard, k, nShards)
    val sums = summary.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // ≤ k counters per shard, all positive
    sums.groupBy(_._1).foreach { case (sh, rows) =>
      assert(rows.length <= k, s"shard $sh holds ${rows.length} > $k counters") }
    assert(sums.forall(_._3 > 0))
    val err = ds.collect().map(_.getLong(1)).sum
    // the 31-term fixture vocabulary >> k: the rank cut must actually fire
    assert(ds.collect().forall(_.getLong(1) > 0), "compression should bite in every shard")
    // bound law for EVERY term (absent-from-summary terms have est 0):
    // est <= exact <= est + Σd_s
    val est = sums.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val exact = cnt.groupBy("term").agg(sum("c").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, ex) =>
      val e = est.getOrElse(t, 0L)
      assert(e <= ex && ex <= e + err, s"$t: est $e, exact $ex, err $err")
    }
    assert(est.keySet.subsetOf(exact.keySet))
    // two-phase prune == one global rank: invariant under repartitioning
    val (rep, ds2) = Sketches.mgSummary(cnt.repartition(13), col("term"), col("c"),
      shard, k, nShards)
    assert(rep.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq == sums.sortBy(x => (x._1, x._2)).toSeq)
    assert(ds2.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      ds.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // mergeable: shards are independent — a summary built from ONE
    // shard's slice of the input reproduces exactly that shard's rows
    val sh0 = cnt.where(shard % nShards === 0)
    val (only0, _) = Sketches.mgSummary(sh0, col("term"), col("c"), shard, k, nShards)
    assert(only0.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._2).toSeq == sums.filter(_._1 == 0L).sortBy(_._2).toSeq)
  }

  test("misra-gries merge: compressed-to-k union keeps the additive error bound") {
    val cnt = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val shard = TextFunctions.seededHash(col("doc_id").cast("string"), Sketches.MgSeed)
    val (k, nShards) = (4, 4)
    val (summary, ds) = Sketches.mgSummary(cnt, col("term"), col("c"), shard, k, nShards)
    val shardErr = ds.collect().map(_.getLong(1)).sum
    val (merged, dMerge) = Sketches.mgMerge(summary, k)
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.size <= k, s"merged summary must hold <= $k counters, got ${m.size}")
    assert(m.values.forall(_ > 0))
    val exact = cnt.groupBy("term").agg(sum("c").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the PODS'12 additive law: est <= exact <= est + (sum of shard d's
    // + the merge's own cut) for EVERY term
    val bound = shardErr + dMerge
    exact.foreach { case (t, ex) =>
      val e = m.getOrElse(t, 0L)
      assert(e <= ex && ex <= e + bound, s"$t: est $e exact $ex bound $bound")
    }
    // compression must have actually cut something (31-term vocab >> k)
    assert(dMerge > 0)
  }

  test("quantile sketch (approx_percentile) tracks exact percentiles") {
    val vals = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("value"))
    val Seq(a50, a99) = vals
      .agg(approx_percentile(col("value"), array(lit(0.5), lit(0.99)), lit(1000)))
      .collect().head.getSeq[Double](0).toSeq
    val Seq(e50, e99) = vals
      .agg(percentile(col("value"), array(lit(0.5), lit(0.99))))
      .collect().head.getSeq[Double](0).toSeq
    assert(math.abs(a50 - e50) <= math.abs(e50) * 0.05 + 1e-9)
    assert(math.abs(a99 - e99) <= math.abs(e99) * 0.05 + 1e-9)
  }
}
