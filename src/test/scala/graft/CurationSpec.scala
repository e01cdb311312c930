package graft

import graft.ext.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
    (1L, "a a a b", "en", "s1", 7L),
    (2L, "uno dos tres cuatro cinco seis", "es", "s0", 30L),
    (3L, "the quick brown fox sat still", "en", "s1", 29L),
    (4L, "völlig andere wörter hier drüben stehen", "de", "s2", 39L),
    (5L, "solo", "zh", "s2", 4L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mixSample: deterministic, content-keyed, stable under repartitioning") {
    val big = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("w"), col("id")).as("text"),
      when(col("id") % 3 === 0, "en").otherwise("zh").as("lang"),
      lit("s").as("source"), lit(5L).as("n_chars"))
    val a = Curation.mixSample(big).select("doc_id").as[Long].collect().sorted
    val b = Curation.mixSample(big.repartition(7)).select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b), "selection must not depend on physical partitioning")
    // rates land near the configured thresholds (0.9 en / 0.3 default zh)
    val en = big.where(col("lang") === "en").count().toDouble
    val zh = big.where(col("lang") === "zh").count().toDouble
    val sel = Curation.mixSample(big).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(sel("en") / en - 0.9) < 0.05, s"en rate ${sel("en") / en}")
    assert(math.abs(sel("zh") / zh - 0.3) < 0.05, s"zh rate ${sel("zh") / zh}")
    // removing other rows never flips a kept row (content-keyed Bernoulli)
    val keptIds = Curation.mixSample(big.where(col("doc_id") < 500))
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == a.filter(_ < 500).toSet)
  }

  test("decontaminate: counts shared distinct n-grams, ignores disjoint docs") {
    val corpus = docs.where(col("doc_id").isin(0L, 2L, 3L))
      .union(Seq((9L, "quick brown fox news", "en", "s9", 20L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val hits = Curation.decontaminate(corpus, col("doc_id") === 9L)
      .as[(Long, Long)].collect().toMap
    // doc 0 and doc 3 share the trigram "quick brown fox" with bench doc 9;
    // doc 2 (disjoint vocabulary) must not appear at all
    assert(hits == Map(0L -> 1L, 3L -> 1L))
  }

  test("repetitionMetrics: hand-checked fractions") {
    val m = Curation.repetitionMetrics(docs.where(col("doc_id") === 1L))
      .collect().head
    // "a a a b": 4 words, 2 distinct, top word a=3; bigrams [a a, a a, a b]
    assert(m.getAs[Long]("n_words") == 4L)
    assert(m.getAs[Long]("n_distinct") == 2L)
    assert(m.getAs[Double]("dup_word_frac") == 0.5)
    assert(m.getAs[Double]("top_word_frac") == 0.75)
    assert(m.getAs[Double]("top_bigram_frac") == 0.666667)
    // a single-token doc has no bigrams: NULL bigram share, not a crash
    val solo = Curation.repetitionMetrics(docs.where(col("doc_id") === 5L)).collect().head
    assert(solo.getAs[Long]("n_words") == 1L && solo.isNullAt(solo.fieldIndex("top_bigram_frac")))
  }

  test("stratifiedSample: exact per-group counts, partitioning-independent") {
    val big = spark.range(1000).select(col("id").as("doc_id"),
      when(col("id") % 4 === 0, "en").otherwise("zh").as("lang"))
    val a = Curation.stratifiedSample(big, k = 20).select("doc_id").as[Long].collect().sorted
    val b = Curation.stratifiedSample(big.repartition(13), k = 20)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b), "sample must not depend on physical partitioning")
    val perGroup = Curation.stratifiedSample(big, k = 20)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perGroup == Map("en" -> 20L, "zh" -> 20L))
    // a group smaller than k yields the whole group
    val tiny = Curation.stratifiedSample(big.where(col("doc_id") < 8), k = 20)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(tiny == Map("en" -> 2L, "zh" -> 6L))
  }

  test("packSequences: bins cut at the token budget, prefix order deterministic") {
    val out = Curation.packSequences(docs, budgetTokens = 10, nShards = 2)
      .as[(Long, Long, Long, Long)].collect()
    // per shard: bins are contiguous from 0 and each doc's bin is its
    // start-offset div budget under the hash order
    out.groupBy(_._2).foreach { case (_, rows) =>
      val bins = rows.map(_._4)
      assert(bins.min == 0L)
      val total = rows.map(_._3).sum
      assert(bins.max <= total / 10, s"bin ids exceed token mass: $rows")
    }
    // deterministic under repartition
    val again = Curation.packSequences(docs.repartition(5), budgetTokens = 10, nShards = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("plan shapes: mixSample is map-only, packSequences pays one exchange") {
    // the OPERATORS must add no shuffle of their own; the deliberate r16
    // doc-scan fan-out (Tables.documents, REPARTITION_BY_NUM — a no-op
    // on a many-split table at scale) is the input's, not theirs, so the
    // assertions count computational (ENSURE_REQUIREMENTS) exchanges
    def required(plan: String): Int =
      plan.linesIterator.count(l => l.contains("Exchange hashpartitioning")
        && l.contains("ENSURE_REQUIREMENTS"))
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val mixPlan = Curation.mixSample(real).select("doc_id", "lang", "source")
      .queryExecution.executedPlan.toString
    assert(required(mixPlan) == 0, s"mixSample must not shuffle:\n$mixPlan")
    val packPlan = Curation.packSequences(real).queryExecution.executedPlan.toString
    assert(required(packPlan) == 1,
      s"packSequences should pay exactly 1 computational shuffle:\n$packPlan")
  }

  test("chunkDocuments: overlap windows, short tail, empty docs vanish, map-only determinism") {
    val d = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 toks
      (2L, "a b"),                           // one short chunk
      (3L, "")                               // no chunks
    ).toDF("doc_id", "text")
    // chunk=4, overlap=2 → step=2 → doc1: ceil((10-2)/2)=4 chunks — the
    // last one reaches the final token; a 5th would add zero new tokens
    val got = Curation.chunkDocuments(d, chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3)))).toMap
    assert(got((1L, 0)) == (("t0 t1 t2 t3", 4)))
    assert(got((1L, 1)) == (("t2 t3 t4 t5", 4)))
    assert(got((1L, 3)) == (("t6 t7 t8 t9", 4)))
    // no redundant tail chunk: every token is already covered by chunk 3
    assert(!got.contains((1L, 4)))
    assert(got((2L, 0)) == (("a b", 2)))
    assert(!got.keys.exists(_._1 == 3L))
    val again = Curation.chunkDocuments(d.repartition(5), chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3)))).toMap
    assert(got == again)
  }

  test("bloomPrunedSemiJoin is EXACT even with a tiny, collision-heavy bitmap") {
    val big = (0L until 500L).map(i => (i, s"k$i")).toDF("id", "k")
    val keys = Seq("k3", "k77", "k401", "k499", "absent").toDF("k")
    // 64 bits for 5 keys × 3 hashes → false positives guaranteed; the
    // verification semi-join must wash every one of them out
    val got = Curation.bloomPrunedSemiJoin(big, keys, "k", mBits = 64, nHashes = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 77L, 401L, 499L))
  }

  test("bloomPrunedSemiJoin: empty/NULL key sets prune everything; probe is map-side") {
    val big = (0L until 50L).map(i => (i, s"k$i")).toDF("id", "k")
    val none = Seq.empty[String].toDF("k")
    assert(Curation.bloomPrunedSemiJoin(big, none, "k", mBits = 64).count() == 0L)
    val nulls = Seq[Option[String]](None, Some("k7")).toDF("k")
    assert(Curation.bloomPrunedSemiJoin(big, nulls, "k", mBits = 1 << 10)
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    // the bloom probe is a plain Filter over the big side (the optimizer
    // folds it into the LocalTableScan here; on a file source it pipelines
    // into the scan stage) — assert pre-fold where it is visible
    val plan = Curation.bloomPrunedSemiJoin(big, nulls, "k", mBits = 1 << 10)
      .queryExecution.analyzed.toString
    assert(plan.contains("xxhash64"), plan)
  }

  test("shardStats: total preserved, shards in range, assignment is stable") {
    val stats = Curation.shardStats(docs, nShards = 8).collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum == 6L)
    assert(stats.forall { r => val s = r.getAs[Long]("shard"); s >= 0 && s < 8 })
    // same doc_id -> same shard regardless of the rest of the corpus: a
    // subset's per-shard doc counts never exceed the full corpus's
    val subset = Curation.shardStats(docs.where(col("doc_id") <= 2L), nShards = 8)
      .select(col("shard"), col("n_docs").as("sub_n"))
    val full = Curation.shardStats(docs, nShards = 8).select("shard", "n_docs")
    val joined = subset.join(full, Seq("shard"), "left")
      .where(col("sub_n") > coalesce(col("n_docs"), lit(0L)))
    assert(joined.isEmpty, "subset shard counts exceeded full-corpus counts")
  }

  test("weightedSample: partition-invariant, priority = min of the row's w draws, w=1 degenerates") {
    import graft.functions.TextFunctions
    val rows = (1L to 200L).map(i => (i, if (i % 3 == 0) 4 else 1)).toDF("doc_id", "w")
    def sel(df: org.apache.spark.sql.DataFrame) =
      Curation.weightedSample(df, col("w"), k = 20, idCol = "doc_id")
        .select("doc_id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deterministic under any physical partitioning
    assert(sel(rows) == sel(rows.repartition(7)), "selection depends on partitioning")
    // mechanics: a row's priority IS the min of its w content-hash draws
    // (re-derived in ONE job over the exploded (doc_id, j) pairs — not a
    // per-row driver loop of Spark actions)
    val got = Curation.weightedSample(rows, col("w"), k = 200, idCol = "doc_id")
      .select("doc_id", "priority").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val manual = rows
      .select(col("doc_id"), explode(sequence(lit(1), col("w"))).as("j"))
      .select(col("doc_id"), TextFunctions.seededHash(
        concat_ws("|", col("doc_id").cast("string"), col("j").cast("string")),
        Curation.WeightSeed).as("h"))
      .groupBy("doc_id").agg(min("h").as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == manual, "priority != min of the row's w draws")
    // domain gate: probability-0 rows (w < 1) are excluded, and a weight
    // past maxW raises instead of silently truncating its draws
    val withZero = ((1L to 5L).map(i => (i, 1)) :+ ((99L, 0))).toDF("doc_id", "w")
    val zeroSel = Curation.weightedSample(withZero, col("w"), k = 10, idCol = "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!zeroSel.contains(99L) && zeroSel == (1L to 5L).toSet)
    val over = Seq((1L, 9)).toDF("doc_id", "w")
    intercept[Exception] {
      Curation.weightedSample(over, col("w"), k = 1, idCol = "doc_id").collect()
    }
    // all-w=1 reduces to plain min-hash order (one draw per row)
    val flat = (1L to 50L).map(i => (i, 1)).toDF("doc_id", "w")
    val viaWeighted = Curation.weightedSample(flat, col("w"), k = 10, idCol = "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaSingleDraw = flat.select(col("doc_id"),
      TextFunctions.seededHash(concat_ws("|", col("doc_id").cast("string"), lit(1)),
        Curation.WeightSeed).as("h"))
      .orderBy("h", "doc_id").limit(10).collect().map(_.getLong(0)).toSet
    assert(viaWeighted == viaSingleDraw, "w=1 must equal unweighted min-hash selection")
  }

  test("corpusShuffle: dense per-shard permutation, two-pass == one-window, " +
       "partition-independent, epoch re-permutes") {
    val ids = (1L to 500L).toDF("doc_id")
    val out = Curation.corpusShuffle(ids, nShards = 4, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 500)
    // pos is a dense 1..n permutation within every shard
    out.groupBy(_._2).foreach { case (s, rows) =>
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps == (1L to rows.length).toSeq, s"shard $s positions not dense: ${ps.take(5)}")
    }
    // the distributed two-pass rank equals the naive one-window form
    val h = graft.functions.TextFunctions.seededHash(
      concat_ws("|", lit(0), col("doc_id").cast("string")), Curation.ShuffleOrderSeed)
    val naive = ids.select(col("doc_id"), (h % 4).cast("int").as("shard"), h.as("__h"))
      .withColumn("pos", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy(col("__h"), col("doc_id"))).cast("long"))
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet == naive.toSet, "two-pass rank must equal the single-window rank")
    // physical partitioning cannot change the order
    val repart = Curation.corpusShuffle(ids.repartition(7), nShards = 4, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(repart.toSet == out.toSet, "shuffle order must not depend on partitioning")
    // a new epoch is a different permutation of the same rows
    val e1 = Curation.corpusShuffle(ids, nShards = 4, nBuckets = 8, epoch = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(e1.map(_._1).toSet == out.map(_._1).toSet)
    assert(e1.toSet != out.toSet, "epoch 1 must re-permute")
  }

  test("tokenBudgetSample: greedy hash-order fill per group, two-pass == naive, " +
       "partition-independent") {
    // 40 docs across 2 langs, token counts 1..8 words
    val rows = (1L to 40L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      val text = Seq.fill((i % 8 + 1).toInt)("w").mkString(" ")
      (i, lang, text)
    }
    val d = rows.toDF("doc_id", "lang", "text")
    val budget = 30L
    val got = Curation.tokenBudgetSample(d, budgetTokens = budget, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // naive greedy reference: sort each group by (hash, id), keep while
    // the exclusive prefix stays under budget
    def hash(i: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${Curation.BudgetSeed}|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = rows.map { case (i, lang, text) =>
      (i, lang, text.split("\\s+").length.toLong, hash(i))
    }.groupBy(_._2).flatMap { case (_, g) =>
      val sorted = g.sortBy(r => (r._4, r._1))
      val prefixes = sorted.scanLeft(0L)(_ + _._3)
      sorted.zip(prefixes).collect { case ((i, l, n, _), p) if p < budget => (i, l, n) }
    }.toSet
    assert(got.toSet == expect, s"greedy fill mismatch: got ${got.toSet.size}, want ${expect.size}")
    // budget law: the last kept doc's exclusive prefix is under budget,
    // so a group's total overshoots by less than one doc
    got.groupBy(_._2).foreach { case (lang, kept) =>
      val total = kept.map(_._3).sum
      assert(total < budget + kept.map(_._3).max, s"$lang over-filled: $total")
    }
    // partitioning cannot change the selection
    val repart = Curation.tokenBudgetSample(d.repartition(7), budgetTokens = budget, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(repart.toSet == got.toSet)
    // NULL lang / NULL text rows are excluded, not crashed on
    val withNulls = d.unionByName(Seq((100L, null, "x x"), (101L, "en", null))
      .toDF("doc_id", "lang", "text"))
    val nn = Curation.tokenBudgetSample(withNulls, budgetTokens = budget, nBuckets = 8)
      .collect().map(_.getLong(0)).toSet
    assert(!nn.contains(100L) && !nn.contains(101L))
  }

  test("universe sample: join-consistent (equals the full join restricted to sampled keys) and filters land pre-join") {
    import org.apache.spark.sql.functions._
    val q = SparkEntry.queries("x_universe_sample")(spark, sf)
    // the law: sampling BOTH sides by the key predicate loses no pair —
    // output == the UNsampled join restricted to sampled order keys
    val o = graft.sources.Tables.orders(spark, sf)
    val l = graft.sources.Tables.lineitem(spark, sf)
    val full = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(java.math.BigDecimal.ONE) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .where(expr("cast(conv(substring(md5(concat('u|', cast(o_orderkey as string))), " +
        "1, 15), 16, 10) as bigint) % 100 < 5"))
    assert(q.exceptAll(full).isEmpty && full.exceptAll(q).isEmpty)
    assert(q.count() > 0, "the 5% universe must be non-empty")
    // and the predicate sits on BOTH scan sides, pre-join (each side
    // prunes independently — the whole point of universe sampling)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("md5".r.findAllIn(plan).size >= 2,
      s"expected the key-hash filter on both join inputs:\n${plan.take(1500)}")
  }

  /** The DSIR chain refolded in plain Scala (independent of every Spark
    * expression): md5 seed-hash buckets, add-1-smoothed 6dp log2 models,
    * BigDecimal sums, integer micro-bits. */
  private def dsirReference(rows: Seq[(Long, String, String)],
                            target: String => Boolean): Seq[(Long, Long, Long)] = {
    val b = Curation.DsirBuckets
    def toks(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def bucket(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Curation.DsirSeed}|$g".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % b
    }
    def feats(t: String): Map[Long, Long] = {
      val ts = toks(t)
      val grams = ts ++ ts.zip(ts.drop(1)).map { case (x, y) => s"$x $y" }
      grams.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    }
    val fs = rows.map { case (id, t, l) => (id, feats(t), target(l)) }
    val tc = new scala.collection.mutable.HashMap[Long, Long]()
    val rc = new scala.collection.mutable.HashMap[Long, Long]()
    fs.foreach { case (_, f, isT) =>
      f.foreach { case (k, c) =>
        val m = if (isT) tc else rc; m(k) = m.getOrElse(k, 0L) + c } }
    val (tt, rt) = (tc.values.sum, rc.values.sum)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def lp(c: Long, tot: Long) = r6(math.log((c + 1.0) / (tot + b).toDouble) / math.log(2.0))
    fs.filter(!_._3).map { case (id, f, _) =>
      val s = f.toSeq.map { case (k, c) =>
        // mirrors the engines' double→DECIMAL(18,6) cast (HALF_UP on the
        // decimal text form — the 6dp r6 output is already 6dp text)
        val hu = BigDecimal.RoundingMode.HALF_UP
        val lpd = BigDecimal(lp(tc.getOrElse(k, 0L), tt)).setScale(6, hu) -
          BigDecimal(lp(rc.getOrElse(k, 0L), rt)).setScale(6, hu)
        BigDecimal(c) * lpd
      }.sum
      (id, f.values.sum, (s * 1000000).toLongExact)
    }.sortBy { case (id, _, micro) => (-micro, id) }.take(Curation.DsirTopK)
  }

  test("dsirScores: equals the independent Scala refold; target-like docs outrank; partition-invariant") {
    val rows = Seq(
      (0L, "alpha alpha beta alpha", "t"),
      (1L, "alpha beta alpha beta alpha", "t"),
      (2L, "alpha alpha beta beta", "r"),
      (3L, "gamma delta gamma delta epsilon", "r"),
      (4L, "alpha gamma beta", "r"),
      (5L, "zeta eta theta", "r"))
    val df = rows.toDF("doc_id", "text", "lang")
    val got = Curation.dsirScores(df, col("lang") === "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = dsirReference(rows, _ == "t")
    assert(got == want, s"engine $got != reference $want")
    // semantics: the raw doc made of target vocabulary outranks the
    // disjoint-vocabulary one
    val rank = got.map(_._1).zipWithIndex.toMap
    assert(rank(2L) < rank(3L) && rank(4L) < rank(3L),
      s"target-like docs must outrank off-target: $got")
    // partition invariance (content-derived everything, decimal sums)
    val rep = Curation.dsirScores(df.repartition(7), col("lang") === "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rep == want)
  }

  test("dsirScores: empty target slice still scores (smoothing carries) and scoring skips target docs") {
    val df = Seq((1L, "alpha beta", "r"), (2L, "gamma gamma", "r"))
      .toDF("doc_id", "text", "lang")
    val got = Curation.dsirScores(df, col("lang") === "t").collect()
    assert(got.length == 2, "raw docs must all score under an empty target")
    val onlyTarget = Seq((1L, "alpha beta", "t")).toDF("doc_id", "text", "lang")
    assert(Curation.dsirScores(onlyTarget, col("lang") === "t").isEmpty,
      "target docs are never selection candidates")
  }
}
