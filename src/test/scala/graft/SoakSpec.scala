package graft

import graft.ext.{Curation, Dedup, Recommend, TextAnalysis}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.Tag

/** Opt-in 10× scale soak (excluded from the default `sbt test` run via
  * the `graft.Soak` tag — run with
  * `sbt "testOnly graft.SoakSpec -- -n graft.Soak"`): the largest corpus
  * a fixture provides is sf0.1, so scale claims otherwise rest on plan
  * assertions alone. This suite self-unions the sf0.01 fixtures to ~10×
  * (≈ sf0.1 volume on the 4-core test session) with salted ids and
  * drives the hot skew-sensitive operators end-to-end, asserting the
  * properties that distinguish linear from quadratic behavior: CC
  * closure round counts stay logarithmic, LSH mega-buckets degrade to
  * star pairs instead of all-pairs, samplers return exact counts
  * independent of partitioning, no large stage collapses to a single
  * task, AQE's skew-join split actually activates on a hot key, and
  * wall time scales ~linearly 1×→10×. Measured numbers are recorded in
  * SCALE.md ("10× soak"). */
object Soak extends Tag("graft.Soak")

class SoakSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.01"

  /** 10× self-union with salted ids: copy i shifts doc_id by i·10⁹. */
  private def docs10x(): DataFrame = {
    val d = graft.sources.Tables.documents(spark, base).select("doc_id", "text")
    (0 until 10).map(i => d.select(
      (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
      col("text"))).reduce(_ unionByName _)
      .repartition(16)
  }

  /** every stage that read >`recCap` records must have run >1 task
    * (bounded finals — two-phase top-k, driver-metadata aggs — read less
    * by construction, so they stay exempt) */
  private def assertNoBigSingleTaskStage[T](recCap: Long)(body: => T): T = {
    val offenders = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        val recs = m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
        if (sc.stageInfo.numTasks == 1 && recs > recCap)
          offenders.add(s"stage ${sc.stageInfo.stageId} (${sc.stageInfo.name}): " +
            s"$recs records on 1 task")
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      Thread.sleep(500) // listener bus drains asynchronously
      assert(offenders.isEmpty, s"single-task stages over $recCap records:\n" +
        String.join("\n", offenders))
      r
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("global line dedup scales ~linearly 1×→10× with no fat single-task stage", Soak) {
    def banner(d: DataFrame) = d.where(col("text").isNotNull).select(col("doc_id"),
      when(col("doc_id") % 2 === 0,
        concat(lit("SOAK COOKIE BANNER\n"), col("text"))).otherwise(col("text")).as("text"))
    def run(d: DataFrame): (Long, Double) = {
      Caches.invalidate(spark) // cold each measurement: memo reuse would fake linearity
      val t0 = System.nanoTime()
      val keptBanners = TextAnalysis.dedupeLinesGlobal(banner(d))
        .where(col("cleaned").contains("SOAK COOKIE BANNER")).count()
      (keptBanners, (System.nanoTime() - t0) / 1e9)
    }
    val one = graft.sources.Tables.documents(spark, base).select("doc_id", "text")
    run(one) // warmup: JIT + codegen compile, so the 1× time is steady-state
    val (kept1, t1) = run(one)
    val (kept10, t10) = assertNoBigSingleTaskStage(500000L) { run(docs10x()) }
    // C4 semantics: the corpus-wide boilerplate line survives exactly once
    assert(kept1 == 1L && kept10 == 1L, s"banner survivors: 1x=$kept1 10x=$kept10")
    info(f"dedupeLinesGlobal wall: 1x=$t1%.2fs 10x=$t10%.2fs ratio=${t10 / t1}%.1f")
    assert(t10 <= 30 * t1 + 5.0, // generous local-noise margin; quadratic would be ~100×
      f"10x took ${t10 / t1}%.1f× the 1x time — not ~linear")
    Caches.invalidate(spark)
  }

  test("CC closure on a 10×-deeper chain stays logarithmic in rounds", Soak) {
    import spark.implicits._
    val n = 10240 // 10× SkewSpec's diameter-1023 chain
    val chain = (0L until (n - 1)).map(i => (i, i + 1)).toDF("id_a", "id_b").repartition(16)
    val nodes = (0L until n).toDF("doc_id")
    val (out, rounds) = Dedup.clustersWithRounds(chain, nodes)
    info(s"10x chain rounds: $rounds")
    // heights halve per round: 10× the diameter adds ~log2(10) ≈ 3.3 rounds
    assert(rounds <= 18, s"diameter-${n - 1} chain took $rounds rounds — not O(log n)")
    val clusters = out.select("cluster").distinct().count()
    assert(clusters == 1L, s"one chain must close to one cluster, got $clusters")
  }

  test("LSH mega-bucket (10× over the cap) emits star pairs, not all-pairs", Soak) {
    import spark.implicits._
    // one duplicate class far over DefaultMaxBucket (4096): all-pairs is
    // ~179M candidate rows; the star degrade emits O(n)
    val n = 6000
    val mega = (0L until n).map(i => (i, "identical mega duplicate text block " +
      "repeated across every ingest shard of the corpus tonight"))
    val normal = (10000L until 10200L).map(i => (i, s"unique-document-$i with its own words $i"))
    val d = (mega ++ normal).toDF("doc_id", "text").repartition(16)
    val t0 = System.nanoTime()
    val cands = Dedup.lshCandidates(d).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"mega-bucket candidates: $cands in $secs%.2fs")
    assert(cands <= 4L * n, s"$cands candidate pairs — the cap did not defuse all-pairs")
    assert(cands >= n - 1L, "star pairs must still connect the whole class")
    Caches.invalidate(spark)
  }

  test("samplers at 10×: exact counts, output independent of partitioning", Soak) {
    val d = docs10x().where(col("text").isNotNull)
      .withColumn("lang", (col("doc_id") % 5).cast("string"))
    def strat(parts: Int) = Curation.stratifiedSample(d.repartition(parts), "lang", k = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = strat(16); val b = strat(7)
    assert(a == b, "stratified sample must not depend on physical partitioning")
    assert(a.size == 5 * 20)
    def weighted(parts: Int) = Curation.weightedSample(
      d.repartition(parts), (col("doc_id") % 8 + 1).cast("int"), k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wa = weighted(16); val wb = weighted(5)
    assert(wa == wb, "weighted sample must not depend on physical partitioning")
    assert(wa.size == 50)
    Caches.invalidate(spark)
  }

  test("bucketed prefix at 10×: dense shuffle ranks with no fat single-task stage", Soak) {
    // the hazard the two-pass form exists to avoid: a per-shard rank
    // window serializes corpus/nShards rows through one task — at 10×
    // with 4 shards that's ~5800 rows/task here and corpus/4 at 100 TB.
    // The bucketed form must keep every big stage multi-task AND still
    // produce dense per-shard permutations.
    val d = docs10x().where(col("text").isNotNull)
    val out = assertNoBigSingleTaskStage(10000L) {
      graft.ext.Curation.corpusShuffle(d.select("doc_id"), nShards = 4, nBuckets = 64)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    }
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $s not dense at 10x")
    }
    Caches.invalidate(spark)
  }

  test("funnel DP at 10×: ~linear wall, reach invariant, no fat single-task stage", Soak) {
    import graft.ext.EventAnalytics
    val steps = Seq("signup", "click", "purchase")
    val W = 86400000000L
    def events1x() = graft.sources.Tables.events(spark, base)
      .select("user_id", "ts", "event_id", "event_type")
    // 10× self-union with salted USERS: copy i shifts user_id, so the
    // reach distribution replicates exactly 10× (each copy is an
    // independent user population with identical event streams)
    def events10x() = (0 until 10).map(i => events1x().select(
      (col("user_id") + lit(i.toLong * 1000000000L)).as("user_id"),
      col("ts"), (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
      col("event_type"))).reduce(_ unionByName _).repartition(16)
    def run(d: DataFrame): (Map[Long, Long], Double) = {
      Caches.invalidate(spark)
      val t0 = System.nanoTime()
      val reach = EventAnalytics.funnelWindowed(d, steps, W)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      (reach, (System.nanoTime() - t0) / 1e9)
    }
    run(events1x()) // warmup
    val (r1, t1) = run(events1x())
    val (r10, t10) = assertNoBigSingleTaskStage(500000L) { run(events10x()) }
    // salted replication ⇒ every level's completion count scales ×10
    assert(r10 == r1.map { case (k, v) => k -> v * 10 },
      s"10× reach must be exactly 10× the 1× reach: $r1 vs $r10")
    info(f"funnelWindowed wall: 1x=$t1%.2fs 10x=$t10%.2fs ratio=${t10 / t1}%.1f")
    assert(t10 <= 30 * t1 + 5.0,
      f"10x took ${t10 / t1}%.1f× the 1x time — not ~linear")
    Caches.invalidate(spark)
  }

  test("AQE skew-join split activates on a hot key under cluster-scale thresholds", Soak) {
    // the corpus-wide-boilerplate join shape: one key carries 500k rows.
    // Thresholds are scaled to the local fixture the way a cluster's
    // defaults (256 MB) relate to its partitions; the assertion is that
    // the engine's plans LET AQE split (no semi-join/probe shape that
    // OptimizeSkewedJoin excludes) — the optimizer marks the join skew=true.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val hot = spark.range(500000).select(lit("the hot boilerplate line").as("line"),
        col("id").as("doc_id"))
      val tail = spark.range(20000).select(concat(lit("line-"), col("id")).as("line"),
        (col("id") + 1000000L).as("doc_id"))
      val lines = hot.unionByName(tail).repartition(16)
      // materialized (localCheckpoint): OptimizeSkewedJoin only matches
      // SMJ(Sort(shuffle), Sort(shuffle)) — an aggregate between the
      // shuffle and the sort on either side excludes the join, so the
      // keeper relation must arrive as a plain scan, the way a stored
      // keeper table would at scale
      val keepers = lines.groupBy("line").agg(min("doc_id").as("keeper"))
        .localCheckpoint(true)
      // `<=` (not `===`): keeper is the per-line MIN doc_id so the two are
      // equivalent, but an equality would be extracted into the equi-join
      // keys, joining on (line, doc_id) — uniform, nothing for the skew
      // rule to split. The inequality stays a post-join filter and the
      // join keys on `line` alone, keeping the hot key hot.
      val joined = lines.join(keepers, Seq("line"))
        .where(col("doc_id") <= col("keeper"))
      // collect() (not count()) so the ASSERTED QueryExecution is the one
      // that ran — count() builds its own plan and would leave this one
      // with isFinalPlan=false
      assert(joined.collect().length == 20001)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not activate; final plan:\n${plan.take(2000)}")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ER delete-1 blocking scales ~linearly 1×→10× with exactly 10× the pairs", Soak) {
    // copies carry a per-copy name prefix: UNsalted text would make every
    // copy an exact duplicate of its 9 siblings, and exact-dup pairs are
    // genuinely quadratic in copy count (C(10,2) per name — the cap
    // valve's case, not the scaling case under test here)
    def recs(copies: Int): DataFrame = {
      val d = graft.sources.Tables.documents(spark, base)
        .where(col("text").isNotNull)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("name0"),
          length(col("text")).as("__len"))
      (0 until copies).map { i =>
        // typo selection/position key on the ORIGINAL doc_id: the copy
        // shift is not a multiple of 7·20, so keying on rec_id would
        // dirty a different subset per copy and break the exact-10× law
        val c = d.select(col("doc_id"),
          (col("doc_id") + lit(i.toLong * 1000000000L)).as("rec_id"),
          // doubled digit: single-digit prefixes would sit at edit
          // distance 1 ACROSS copies (one substitution), cross-linking
          // every salted sibling; doubling makes the copy distance 2
          concat(lit(s"x$i$i "), col("name0")).as("name"), col("__len"))
        val clean = c.select("rec_id", "name")
        val dirty = c.where(col("__len") >= 30 && col("doc_id") % 7 === 0)
          .select((col("rec_id") + lit(100000000L)).as("rec_id"),
            expr("concat(substring(name, 1, CAST(doc_id % 20 AS INT) + 4), " +
              "substring(name, CAST(doc_id % 20 AS INT) + 6))").as("name"))
        clean.unionByName(dirty)
      }.reduce(_ unionByName _).repartition(16)
    }
    def run(copies: Int): (Long, Double) = {
      Caches.invalidate(spark)
      val t0 = System.nanoTime()
      val n = graft.ext.EntityResolution.fuzzyPairs(recs(copies)).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    run(1) // warmup (JIT + codegen)
    val (p1, t1) = run(1)
    val (p10, t10) = assertNoBigSingleTaskStage(500000L) { run(10) }
    info(f"ER pairs: 1x=$p1 in $t1%.2fs, 10x=$p10 in $t10%.2fs ratio=${t10 / t1}%.1f")
    // per-copy prefixes isolate copies, so the pair set replicates exactly
    assert(p10 == 10 * p1, s"pairs must scale exactly 10x: $p1 -> $p10")
    assert(t10 <= 30 * t1 + 5.0,
      f"10x took ${t10 / t1}%.1f× the 1x time — not ~linear")
    Caches.invalidate(spark)
  }

  test("basket rules at 10× baskets: scores replicate exactly, pair volume ~linear", Soak) {
    // salted basket ids, UNCHANGED items: n_baskets, every item marginal
    // and every pair count scale by exactly 10, so support/confidence
    // cancel and lift's 10·10/(10·10) cancels — the rule SET and every
    // ppm score must replicate bit-exactly (with the support floor scaled
    // to keep the frequent set identical), while the per-basket self-join
    // processes 10× the candidate pairs
    def baskets(copies: Int): DataFrame = {
      val b = graft.sources.Tables.lineitem(spark, base)
        .select(col("l_orderkey"), col("l_partkey"))
      (0 until copies).map(i => b.select(
          (col("l_orderkey") + lit(i.toLong * 1000000000L)).as("bk"),
          col("l_partkey").as("it")))
        .reduce(_ unionByName _).repartition(16)
    }
    def run(copies: Int): (Map[(Long, Long), (Long, Long, Long, Long)], Double) = {
      Caches.invalidate(spark)
      val t0 = System.nanoTime()
      val rows = Recommend.basketRules(baskets(copies), "bk", "it",
          minPairSupport = 2L * copies)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(1) // warmup (JIT + codegen)
    val (r1, t1) = run(1)
    val (r10, t10) = assertNoBigSingleTaskStage(500000L) { run(10) }
    info(f"rules: 1x=${r1.size} in $t1%.2fs, 10x=${r10.size} in $t10%.2fs " +
      f"ratio=${t10 / t1}%.1f")
    assert(r10.keySet == r1.keySet, "the frequent rule set must replicate")
    assert(r1.nonEmpty && r1.forall { case (k, (n, s, c, l)) =>
      r10(k) == ((10 * n, s, c, l))
    }, "pair counts scale exactly 10x; every ppm score is bit-identical")
    assert(t10 <= 30 * t1 + 5.0,
      f"10x took ${t10 / t1}%.1f× the 1x time — not ~linear")
    Caches.invalidate(spark)
  }

  test("BFS at 10× edges: rounds pinned to eccentricity, wall ~linear in edge volume", Soak) {
    // salted copies are DISJOINT components: source 0 reaches exactly
    // copy 0, so the reached set and every level replicate the 1× run
    // while each round's frontier⋈edges join scans 10× the edges — the
    // claim under test is that BFS cost is (rounds = eccentricity) ×
    // (per-round join ~ |E|), i.e. wall grows with edge volume, never
    // with rounds × |V| or worse.
    def salt(e: DataFrame): DataFrame = (0 until 10).map(i => e.select(
      (col("src") + lit(i.toLong * 4000000000L)).as("src"),
      (col("dst") + lit(i.toLong * 4000000000L)).as("dst")))
      .reduce(_ unionByName _).repartition(32)
    val e1 = SparkEntryEvt.coPurchaseEdges(spark, base)
    val e10 = salt(e1).persist()
    info(s"10x edges: ${e10.count()}")
    def run(e: DataFrame): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val row = graft.ext.Graph.bfsLevels(e, "src", "dst", source = 0L)
        .agg(count(lit(1)), max("level")).head
      (row.getLong(0), row.getLong(1), (System.nanoTime() - t0) / 1e9)
    }
    run(e1) // warmup (JIT + codegen)
    val (n1, ecc1, t1) = run(e1)
    val (n10, ecc10, t10) = assertNoBigSingleTaskStage(500000L) { run(e10) }
    info(f"bfs wall: 1x=$t1%.2fs 10x=$t10%.2fs ratio=${t10 / t1}%.1f " +
      s"(reached $n1/$n10, ecc $ecc1/$ecc10)")
    assert(n10 == n1, "disjoint salted copies: the reached set must not grow")
    assert(ecc10 == ecc1, s"round count must stay = eccentricity: $ecc1 -> $ecc10")
    assert(t10 <= 30 * t1 + 5.0,
      f"10x took ${t10 / t1}%.1f× the 1x time — not ~linear in edge volume")
    e10.unpersist(); Caches.invalidate(spark)
  }

  test("SSSP at 10× edges: distances replicate, wall ~linear in edge volume", Soak) {
    // the weighted companion of the BFS soak (r14 item 3 — the board's
    // most expensive timed query finally gets its scale row): salted
    // copies are DISJOINT weighted components, so source 0's distance
    // map must REPLICATE the 1× run exactly (same reached set, same
    // distances — hence the same weighted hop diameter driving the same
    // round count) while every relaxation round's frontier⋈edges join
    // scans 10× the edges. The claim under test is the r15 incremental-
    // best loop: per-round cost O(|best| + |frontier| + |E_scanned|),
    // wall growing with edge volume — never rounds × Σprior-leaves.
    def salt(e: DataFrame): DataFrame = (0 until 10).map(i => e.select(
      (col("src") + lit(i.toLong * 4000000000L)).as("src"),
      (col("dst") + lit(i.toLong * 4000000000L)).as("dst"), col("wt")))
      .reduce(_ unionByName _).repartition(32)
    val e1 = SparkEntryEvt.weightedEdges(spark, base)
    val e10 = salt(e1).persist()
    info(s"10x weighted edges: ${e10.count()}")
    def run(e: DataFrame): (Map[Long, Long], Double) = {
      val t0 = System.nanoTime()
      val dists = graft.ext.Graph.sssp(e, "src", "dst", "wt", source = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (dists, (System.nanoTime() - t0) / 1e9)
    }
    run(e1) // warmup (JIT + codegen)
    val (d1, t1) = run(e1)
    val (d10, t10) = assertNoBigSingleTaskStage(500000L) { run(e10) }
    info(f"sssp wall: 1x=$t1%.2fs 10x=$t10%.2fs ratio=${t10 / t1}%.1f " +
      s"(reached ${d1.size}/${d10.size}, max dist ${d1.values.max}/${d10.values.max})")
    assert(d10 == d1, "disjoint salted copies: the distance map must replicate exactly")
    assert(t10 <= 30 * t1 + 5.0,
      f"10x took ${t10 / t1}%.1f× the 1x time — not ~linear in edge volume")
    e10.unpersist(); Caches.invalidate(spark)
  }

  test("link prediction at 10× edges: predictions replicate per copy, wall ~linear in wedge volume", Soak) {
    // salted copies of the PROJECTED graph are disjoint components: every
    // copy's neighborhoods (hence degrees, shared-neighbor sets, and the
    // exact ppm scores) replicate the 1× graph's, so the 10× output must
    // be exactly 10 shifted replicas — while the center-keyed wedge join
    // (the operator's dominant cost, Σ d(d−1) candidates) processes 10×
    // the volume. The claim under test: link-prediction cost grows with
    // wedge volume, never quadratically in the union's vertex count.
    val pe1 = SparkEntryEvt.projectedCustomerEdges(spark, base)
    def salt(e: DataFrame): DataFrame = (0 until 10).map(i => e.select(
      (col("ua") + lit(i.toLong * 4000000000L)).as("ua"),
      (col("ub") + lit(i.toLong * 4000000000L)).as("ub")))
      .reduce(_ unionByName _).repartition(32)
    val pe10 = salt(pe1).persist()
    info(s"10x projected edges: ${pe10.count()}")
    def run(e: DataFrame): (Set[(Long, Long, Long, Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val rows = Recommend.resourceAllocationRecs(e, "ua", "ub", 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toSet
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(pe1) // warmup (JIT + codegen)
    val (r1, t1) = run(pe1)
    val (r10, t10) = assertNoBigSingleTaskStage(500000L) { run(pe10) }
    info(f"link prediction: 1x=${r1.size} rows in $t1%.2fs, " +
      f"10x=${r10.size} in $t10%.2fs ratio=${t10 / t1}%.1f")
    assert(r10.size == 10 * r1.size, "10 disjoint copies must emit 10× the rows")
    assert(r10.filter(_._1 < 4000000000L) == r1,
      "copy 0's predictions must replicate the 1× run bit-exactly")
    assert(t10 <= 30 * t1 + 5.0,
      f"10x took ${t10 / t1}%.1f× the 1x time — not ~linear in wedge volume")
    pe10.unpersist(); Caches.invalidate(spark)
  }

  test("pagerank delta refresh beats the full rebuild at 10× edges", Soak) {
    // The delta's contract (Graph.pageRankFrom): ONE warm-start iteration
    // costs ~iters⁻¹ of the rebuild's edge shuffles plus a fixed O(V)
    // seed/renormalize overhead. At sf0.1 the fixed overhead ≈ two
    // iterations, so the bench shows the delta SLOWER than the rebuild —
    // this case measures both at 10× edges, where the per-iteration edge
    // join dominates, to pin the crossover the claim rests on.
    def salt(e: DataFrame): DataFrame = (0 until 10).map(i => e.select(
      // even shift: keeps customer/part id parity intact per copy
      (col("src") + lit(i.toLong * 4000000000L)).as("src"),
      (col("dst") + lit(i.toLong * 4000000000L)).as("dst")))
      .reduce(_ unionByName _).repartition(32)
    val full10 = salt(SparkEntryEvt.coPurchaseEdges(spark, base)).persist()
    val base10 = salt(SparkEntryEvt.baseEdges(spark, base)).persist()
    info(s"10x edges: full=${full10.count()} base=${base10.count()}")
    // the stored prior — the operational premise of a delta refresh
    val prior = graft.ext.Graph.pageRank(base10, "src", "dst", 3).persist()
    prior.count()
    def time(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = body
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // one untimed pass each (JIT/codegen), then min of two timed passes
    graft.ext.Graph.pageRank(full10, "src", "dst", 3).count()
    graft.ext.Graph.pageRankFrom(prior, full10, "src", "dst", 1).count()
    val rebuild = (1 to 2).map(_ =>
      time(graft.ext.Graph.pageRank(full10, "src", "dst", 3).count())).minBy(_._2)
    val delta = (1 to 2).map(_ =>
      time(graft.ext.Graph.pageRankFrom(prior, full10, "src", "dst", 1).count())).minBy(_._2)
    info(f"10x pagerank wall: rebuild(3 iters)=${rebuild._2}%.2fs " +
      f"delta(1 iter, warm)=${delta._2}%.2fs ratio=${delta._2 / rebuild._2}%.2f")
    assert(rebuild._1 == delta._1, "both must rank the same vertex set")
    assert(delta._2 < rebuild._2,
      f"delta refresh (${delta._2}%.2fs) must beat the full rebuild " +
        f"(${rebuild._2}%.2fs) once edge volume dominates the fixed overhead")
    full10.unpersist(); base10.unpersist(); prior.unpersist()
  }

  test("time-gap episodes at 10× events: counts replicate ×10, banded buckets stay bounded", Soak) {
    // the banded time-bucket equi-join (x_seq_episodes_time) is the one
    // join shape without a measured skew story (r15 verdict item 7):
    // candidate volume is bounded by per-(user, gap-bucket) occupancy,
    // so this case reports the occupancy distribution at 10× and pins
    // the exactness law — salted user copies are disjoint populations
    // with identical streams, so every episode's count scales ×10 and
    // the deterministic top-20 is unchanged.
    val gap = SparkEntryEr.EpisodeTimeGapMicros
    def events1x() = graft.sources.Tables.events(spark, base)
      .select("user_id", "ts", "event_id", "event_type")
    def events10x() = (0 until 10).map(i => events1x().select(
      (col("user_id") + lit(i.toLong * 1000000000L)).as("user_id"),
      col("ts"), (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
      col("event_type"))).reduce(_ unionByName _).repartition(16)
    def run(d: DataFrame): (Map[(String, String, String), Long], Double) = {
      Caches.invalidate(spark)
      val t0 = System.nanoTime()
      val rows = graft.ext.EventAnalytics.episodesTimeTopK(d, gap,
          length = 3, topK = 20).collect()
        .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
          r.getLong(3))).toMap
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(events1x()) // warmup
    val (r1, t1) = run(events1x())
    val (r10, t10) = assertNoBigSingleTaskStage(500000L) { run(events10x()) }
    assert(r10 == r1.map { case (k, v) => k -> v * 10 },
      "10× episode counts must be exactly 10× the 1× counts, same top-20")
    // the boundedness claim, measured: per-(user, bucket) occupancy is
    // what caps each probe's candidate fan-out
    val occ = events10x()
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $gap").as("b"))
      .groupBy("user_id", "b").count()
      .agg(max("count").as("mx"), avg("count").as("av")).head
    info(f"banded-bucket occupancy at 10x: max=${occ.getLong(0)} " +
      f"avg=${occ.getDouble(1)}%.2f")
    info(f"episodesTimeTopK wall: 1x=$t1%.2fs 10x=$t10%.2fs ratio=${t10 / t1}%.1f")
    assert(t10 <= 30 * t1 + 5.0,
      f"10x took ${t10 / t1}%.1f× the 1x time — not ~linear")
    Caches.invalidate(spark)
  }

  test("walk-corpus delta refresh beats the full rebuild at 10× edges", Soak) {
    // The refresh's contract (Graph.walksFrom): with the ranked-adjacency
    // artifact stored (built once per corpus version — the PlanMemo/
    // ArtifactStore contract, primed here exactly like the bench's
    // artifact pass), a delta refresh pays the invalidation joins plus a
    // walk loop over the AFFECTED starts only, while the rebuild walks
    // EVERY start. This case pins the crossover at 10× edges: same
    // corpus-version adjacency on both sides, wall compared directly,
    // and refresh == rebuild checked by row count + order-free checksum
    // (the exactness law GraphSpec property-tests at 1×).
    //
    // The delta must be INVALIDATION-bounded, which on this graph means
    // vertex-bounded, not edge-sampled: the projection averages degree
    // ~76, so even a 1% random edge sample flags ~3/4 of all vertices
    // (every endpoint of every changed edge) and a walk visiting any
    // flagged vertex is redone — refresh degenerates to rebuild cost BY
    // DESIGN (work ∝ invalidation impact; measured ratios 1.05 and 1.57
    // for the two edge-sampled shapes this case replaced). The
    // operational nightly delta — a few new vertices attaching at known
    // points — flags 3 vertices per copy, and THAT is the regime whose
    // crossover this row pins.
    def salt(e: DataFrame): DataFrame = (0 until 10).map(i => e.select(
      (col("ua") + lit(i.toLong * 4000000000L)).as("ua"),
      (col("ub") + lit(i.toLong * 4000000000L)).as("ub")))
      .reduce(_ unionByName _).repartition(32)
    import spark.implicits._
    val pe1 = SparkEntryEvt.projectedCustomerEdges(spark, base)
    val attach = pe1.agg(min("ua")).head.getLong(0)
    val base10 = salt(pe1).persist()
    // per copy: two brand-new vertices, attached to one existing vertex
    // and to each other — additions only, exercising both redo paths
    // (affected existing starts AND new-to-the-graph starts)
    val newEdges = (0 until 10).flatMap { i =>
      val off = i.toLong * 4000000000L
      Seq((3900000000L + off, attach + off), (3900000001L + off, attach + off),
        (3900000000L + off, 3900000001L + off))
    }.toDF("ua", "ub")
    val full10 = base10.unionByName(newEdges).persist()
    info(s"10x edges: full=${full10.count()} base=${base10.count()}")
    // the stored corpus — the operational premise of a delta refresh
    val stored = graft.ext.Graph.randomWalks(base10, "ua", "ub", 2, 4).persist()
    stored.count()
    def sig(df: DataFrame): (Long, String) = {
      // DECIMAL(38,0) sum: full-range xxhash64 values would overflow an
      // ANSI LongType sum at this row count
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("start"), col("walk_id"), col("step"), col("node"))
          .cast("decimal(38,0)"))).head
      (r.getLong(0), r.getDecimal(1).toPlainString)
    }
    def time(body: => (Long, String)): ((Long, String), Double) = {
      val t0 = System.nanoTime()
      val s = body
      (s, (System.nanoTime() - t0) / 1e9)
    }
    def refresh(): DataFrame = {
      val changed = graft.ext.Graph.walkInvalidations(base10, full10, "ua", "ub")
      graft.ext.Graph.walksFrom(stored, full10, "ua", "ub", changed, 2, 4)
    }
    // one untimed pass each (JIT/codegen + the once-per-corpus-version
    // adjacency artifact both sides share), then min of two timed passes
    graft.ext.Graph.randomWalks(full10, "ua", "ub", 2, 4).count()
    refresh().count()
    val rebuild = (1 to 2).map(_ =>
      time(sig(graft.ext.Graph.randomWalks(full10, "ua", "ub", 2, 4)))).minBy(_._2)
    val delta = (1 to 2).map(_ => time(sig(refresh()))).minBy(_._2)
    info(f"10x walks wall: rebuild=${rebuild._2}%.2fs " +
      f"refresh(invalidate+redo)=${delta._2}%.2fs ratio=${delta._2 / rebuild._2}%.2f")
    assert(rebuild._1 == delta._1,
      "refresh must equal the rebuild bit-for-bit (count + checksum)")
    assert(delta._2 < rebuild._2,
      f"delta refresh (${delta._2}%.2fs) must beat the full rebuild " +
        f"(${rebuild._2}%.2fs) once the walk loop dominates the fixed costs")
    // downstream pin (r15 verdict item 6): the PPMI top-50 — the SGNS
    // relation x_walk_ppmi consumes — derived from the REFRESHED corpus
    // is identical to the rebuild's, so a delta refresh is transparent
    // to the embedding pipeline downstream of the walk artifact
    def ppmiTop(corpus: DataFrame): Seq[(Long, Long, Long)] = {
      val pairs = graft.ext.Graph.walkPairs(corpus, window = 2)
      val t = pairs.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
      val cm = pairs.groupBy("center").agg(sum("cnt").as("c_cnt"))
      val xm = pairs.groupBy("context").agg(sum("cnt").as("x_cnt"))
      pairs.join(cm, Seq("center")).join(xm, Seq("context"))
        .where(col("cnt") >= 2)
        .select(col("center"), col("context"),
          expr(s"CAST(CAST(cnt AS DECIMAL(38,0)) * $t * 1000000 " +
            "DIV (CAST(c_cnt AS DECIMAL(38,0)) * x_cnt) AS BIGINT)").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("center"), col("context"))
        .limit(50).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    val ppmiRefreshed = ppmiTop(refresh())
    val ppmiRebuilt = ppmiTop(graft.ext.Graph.randomWalks(full10, "ua", "ub", 2, 4))
    assert(ppmiRefreshed.nonEmpty && ppmiRefreshed == ppmiRebuilt,
      "PPMI top-k must be stable under the delta refresh")
    full10.unpersist(); base10.unpersist(); stored.unpersist()
  }

  test("DSIR at 10× docs: copy-identical scores, ~linear wall, no fat single-task stage", Soak) {
    // lang rides along so the target predicate is the real one
    val one = graft.sources.Tables.documents(spark, base)
      .select("doc_id", "text", "lang")
    val ten = (0 until 10).map(i => one.select(
      (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
      col("text"), col("lang"))).reduce(_ unionByName _).repartition(16)
    def run(d: org.apache.spark.sql.DataFrame): (Array[(Long, Long)], Double) = {
      Caches.invalidate(spark) // cold each pass: memo reuse would fake linearity
      val t0 = System.nanoTime()
      val rows = Curation.dsirScoresAll(d, col("lang") === "en")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(one) // JIT/codegen warmup
    val (_, t1) = run(one)
    val (rows10, t10) = assertNoBigSingleTaskStage(500000L) { run(ten) }
    // the 10 salted copies of a doc share features AND models — their
    // scores must be bit-identical (the hash feature map is content-only)
    val byBase = rows10.groupBy(_._1 % 1000000000L)
    byBase.foreach { case (b, rs) =>
      assert(rs.length == 10 && rs.map(_._2).distinct.length == 1,
        s"base doc $b: copies scored differently: ${rs.mkString(",")}")
    }
    info(f"dsir wall: 1x=$t1%.2fs 10x=$t10%.2fs ratio=${t10 / t1}%.1f")
    assert(t10 <= 30 * t1 + 5.0,
      f"10x took ${t10 / t1}%.1f× the 1x time — not ~linear")
    Caches.invalidate(spark)
  }
}
