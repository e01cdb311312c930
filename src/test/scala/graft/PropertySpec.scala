package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

/** Property tests over randomly generated plan documents (SURVEY.md §5:
  * shred∘renest = id, merge-patch absorption, ETag stability). Generators
  * build JSON strings in the canonical plan shape (FIXTURES.md §A.1) with
  * random field presence, child counts and values. */
class PropertySpec extends SparkSpec {

  /** Deterministic sampling: scalatestplus isn't on the offline classpath,
    * so generators are driven directly under fixed seeds. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  import PlanFixture.{docs, sparkSchema}

  private val word = Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty)
  private val money = Gen.choose(0, 99999).map(_ / 100.0)

  private def svcGen(tag: String): Gen[String] = for {
    name <- word; copay <- money; ded <- money
    hasService <- Arbitrary.arbBool.arbitrary
  } yield {
    val svc = if (hasService)
      s""""linkedService":{"_org":"e.com","objectId":"sv$tag","objectType":"service","name":"$name"},"""
    else ""
    s"""{$svc"planserviceCostShares":{"deductible":$ded,"copay":$copay,
        "_org":"e.com","objectId":"cs$tag","objectType":"membercostshare"},
        "_org":"e.com","objectId":"ps$tag","objectType":"planservice"}"""
      .replaceAll("\n\\s*", "")
  }

  private[graft] def planGenPublic: Gen[String] = planGen

  private val planGen: Gen[String] = for {
    id <- Gen.uuid.map(_.toString.take(8))
    nSvc <- Gen.choose(1, 4)
    svcs <- Gen.sequence[Seq[String], String]((1 to nSvc).map(i => svcGen(s"${id}_$i")))
    ptype <- Gen.oneOf("inNetwork", "outNetwork")
    hasCost <- Arbitrary.arbBool.arbitrary
  } yield {
    val cost = if (hasCost)
      s""""planCostShares":{"deductible":10.0,"copay":5.0,"_org":"e.com",
          "objectId":"pcs$id","objectType":"membercostshare"},"""
        .replaceAll("\n\\s*", "")
    else ""
    s"""{"objectId":"$id","objectType":"plan","planType":"$ptype","_org":"e.com",
        "creationDate":"12-12-2017",$cost"linkedPlanServices":[${svcs.mkString(",")}]}"""
      .replaceAll("\n\\s*", "")
  }

  private def canonicalJson(df: DataFrame): Set[String] =
    df.select(to_json(Etag.canonicalize(
        struct(df.columns.map(col): _*), df.schema.asInstanceOf[org.apache.spark.sql.types.StructType]
      ).cast(Etag.nullableCopy(df.schema))).as("j"))
      .collect().map(_.getString(0)).toSet

  test("property: renest ∘ shred = identity on random documents") {
    samples(Gen.listOfN(3, planGen), 8).foreach { jsons =>
      val d = docs(spark, jsons)
      val back = Renest(Shred.shredTyped(d), d.schema)
      assert(canonicalJson(back) == canonicalJson(d))
    }
  }

  test("property: merge-patch is absorbing (applying the same patch twice = once)") {
    samples(Gen.zip(planGen, planGen), 8).foreach { case (a, p0) =>
      // patch shares a's objectId so it applies to it
      val aId = a.split("\"objectId\":\"")(1).split("\"")(0)
      val p = p0.replaceFirst("\"objectId\":\"[^\"]+\"", s""""objectId":"$aId"""")
      val cur = docs(spark, Seq(a))
      val patch = docs(spark, Seq(p))
      val once = MergePatch(cur, patch)
      val twice = MergePatch(once, patch)
      assert(canonicalJson(once) == canonicalJson(twice))
    }
  }

  test("property: etag invariant under child-array permutation, sensitive to content") {
    samples(planGen, 8).foreach { j =>
      val d1 = docs(spark, Seq(j))
      // reverse the linkedPlanServices array by re-building the doc with
      // reversed array column — canonical etag must not change
      val d2 = d1.withColumn("linkedPlanServices", reverse(col("linkedPlanServices")))
      val e1 = Etag.withEtag(d1).select("__etag").head().getString(0)
      val e2 = Etag.withEtag(d2).select("__etag").head().getString(0)
      assert(e1 == e2)
      // changing a scalar changes the tag
      val d3 = d1.withColumn("planType", lit("CHANGED"))
      val e3 = Etag.withEtag(d3).select("__etag").head().getString(0)
      assert(e1 != e3)
    }
  }

  test("property: progressive and baseline JPEG decode to identical pixels") {
    import graft.ext.Multimodal
    // random dims (incl. non-multiples of 8) and random pixels: the two
    // encoders share FDCT/quantize and the decoders share IDCT, so the
    // decoded rasters must be IDENTICAL even where quantization is lossy —
    // the scan organization is the only difference
    val imgGen = for {
      w <- Gen.choose(1, 40); h <- Gen.choose(1, 40)
      px <- Gen.listOfN(w * h, Gen.choose(0, 255))
      split <- Gen.choose(1, 62)
    } yield (w, h, px.toArray, split)
    samples(imgGen, 12).foreach { case (w, h, px, split) =>
      val prog = Multimodal.decodeRaster(Multimodal.encodeGrayProgressiveJpeg(
        w, h, px, bands = Seq((1, split), (split + 1, 63)).filter(b => b._1 <= b._2)))
      val base = Multimodal.decodeRaster(Multimodal.encodeGrayJpeg(w, h, px))
      assert(prog.isDefined && base.isDefined, s"decode failed at ${w}x$h split=$split")
      assert(prog.get.gray.sameElements(base.get.gray),
        s"progressive != baseline pixels at ${w}x$h split=$split")
    }
  }

  test("property: corpus fingerprint is partition-invariant, tamper-sensitive, injective on delimiters") {
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.choose(5, 40)
      vals <- Gen.listOfN(n, Gen.oneOf(word, Gen.const("a|b"), Gen.const("")))
    } yield vals.zipWithIndex.map { case (v, i) => (0L, i.toLong, v) }
    def sig(rows: Seq[(Long, Long, String)], parts: Int): (Long, Long) =
      graft.ext.Audit.fingerprintBy(
        rows.toDF("grp", "id", "payload").repartition(parts),
        "grp", Seq("id", "payload"), seed = 7)
        .collect().head match { case r => (r.getLong(1), r.getLong(2)) }
    samples(rowsGen, 8).foreach { rows =>
      // any partitioning/order → identical digest
      assert(sig(rows, 1) == sig(scala.util.Random.shuffle(rows), 5))
      // flipping one payload character flips the digest
      val tampered = rows.updated(0, rows.head.copy(_3 = rows.head._3 + "x"))
      assert(sig(rows, 2)._2 != sig(tampered, 2)._2, s"tamper unseen on $rows")
    }
    // delimiter aliasing and NULL-vs-'' — the length-prefixed encoding's
    // whole point: content moved across a field boundary, and a '' → NULL
    // rewrite, must each flip the digest
    def one(s1: String, s2: String): Long =
      graft.ext.Audit.fingerprintBy(
        Seq((0L, s1, s2)).toDF("grp", "s1", "s2"), "grp", Seq("s1", "s2"), 7)
        .collect().head.getLong(2)
    assert(one("a|b", "c") != one("a", "b|c"), "field-boundary alias")
    assert(one(null, "c") != one("", "c"), "NULL aliases ''")
  }

  test("property: kmv merge law holds under random 3-way splits") {
    import spark.implicits._
    val itemsGen = for {
      n <- Gen.choose(30, 120)
      hs <- Gen.listOfN(n, Gen.choose(1L, 1000000L))
    } yield hs
    samples(itemsGen, 6).foreach { hs =>
      val df = hs.map(h => (0L, h)).toDF("g", "h")
      val whole = graft.ext.Sketches.kmvTable(df, col("h"), "g", 16)
        .select("h").collect().map(_.getLong(0)).toSet
      val parts = Seq(hs.indices.filter(_ % 3 == 0), hs.indices.filter(_ % 3 == 1),
        hs.indices.filter(_ % 3 == 2))
        .map(ix => graft.ext.Sketches.kmvTable(
          ix.map(i => (0L, hs(i))).toDF("g", "h"), col("h"), "g", 16))
      val merged = graft.ext.Sketches.kmvMerge(parts, 0L, "g", 16)
        .select("h").collect().map(_.getLong(0)).toSet
      assert(whole == merged, s"kmv merge law broke on ${hs.take(5)}...")
    }
  }

  test("two-pass bucketed prefix == naive greedy under random corpora and bucket counts") {
    import spark.implicits._
    import graft.ext.Curation
    def refHash(seed: Int, v: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed|$v".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val cfg = for {
      n <- Gen.choose(30, 120)
      budget <- Gen.choose(10L, 200L)
      nBuckets <- Gen.oneOf(1, 2, 4, 16, 64) // incl. the 1-bucket degenerate
      nShards <- Gen.choose(1, 6)
    } yield (n, budget, nBuckets, nShards)
    samples(cfg, 5).foreach { case (n, budget, nBuckets, nShards) =>
      val rows = (1L to n).map { i =>
        (i, s"g${i % 3}", Seq.fill((i % 7 + 1).toInt)("w").mkString(" "))
      }
      val d = rows.toDF("doc_id", "lang", "text")
      val got = Curation.tokenBudgetSample(d, budget, nBuckets = nBuckets)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val expect = rows.map { case (i, g, t) =>
        (i, g, t.split(" ").length.toLong, refHash(Curation.BudgetSeed, i.toString))
      }.groupBy(_._2).flatMap { case (_, grp) =>
        val sorted = grp.sortBy(r => (r._4, r._1))
        sorted.zip(sorted.scanLeft(0L)(_ + _._3))
          .collect { case ((i, g, tk, _), p) if p < budget => (i, g, tk) }
      }.toSet
      assert(got == expect,
        s"budget fill mismatch at n=$n budget=$budget buckets=$nBuckets")
      // the shuffle over the same helper: dense 1..m positions per shard
      // at every bucket count, including one bucket
      val sh = Curation.corpusShuffle(d.select("doc_id"), nShards, nBuckets)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(sh.length == n)
      sh.groupBy(_._2).foreach { case (shard, rs) =>
        assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
          s"shard $shard not dense at buckets=$nBuckets shards=$nShards")
      }
    }
  }

  test("property: sssp delta refresh == Dijkstra rebuild over random graphs and monotone deltas") {
    import spark.implicits._
    // the law under trial: for ANY base graph, ANY mix of edge additions
    // and weight decreases, relaxing the stored base distances through
    // the changed edges converges to exactly the full rebuild's fixed
    // point (min-plus monotonicity). Randomized trials complement the
    // fixed-seed GraphSpec case — the failure modes here are structural
    // (a missed frontier seed, a retained stale distance), which random
    // deltas with new/isolated/cheapened edges probe far better than one
    // hand fixture.
    def dijkstra(edges: Seq[(Long, Long, Long)], source: Long): Map[Long, Long] = {
      val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(e => (e._2, e._3)) }
      val dist = scala.collection.mutable.Map(source -> 0L)
      val pq = scala.collection.mutable.PriorityQueue((0L, source))(
        Ordering.by[(Long, Long), Long](-_._1))
      while (pq.nonEmpty) {
        val (dd, u) = pq.dequeue()
        if (dd == dist(u))
          adj.getOrElse(u, Nil).foreach { case (v, w) =>
            if (dist.get(v).forall(_ > dd + w)) { dist(v) = dd + w; pq.enqueue((dd + w, v)) }
          }
      }
      dist.toMap
    }
    val arcGen = for {
      a <- Gen.choose(0L, 24L); b <- Gen.choose(0L, 24L).suchThat(_ != a)
      w <- Gen.choose(2L, 6L)
    } yield (a, b, w)
    val caseGen = for {
      nBase <- Gen.choose(20, 120)
      base0 <- Gen.listOfN(nBase, arcGen)
      nAdd <- Gen.choose(1, 12)
      adds0 <- Gen.listOfN(nAdd, for {
        a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L).suchThat(_ != a)
        w <- Gen.choose(1L, 4L)
      } yield (a, b, w))
      nCheap <- Gen.choose(0, 5)
    } yield {
      val base = base0.groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      // weight drops on existing arcs + brand-new arcs (some to nodes
      // 25..30, unreachable in base)
      val cheap = base.take(nCheap).map { case (a, b, w) => (a, b, math.max(1L, w - 1)) }
      (base, (adds0 ++ cheap).groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq)
    }
    samples(caseGen, 12).zipWithIndex.foreach { case ((base, delta), i) =>
      val full = (base ++ delta).groupBy(e => (e._1, e._2))
        .map { case (_, es) => es.minBy(_._3) }.toSeq
      val basePaths = dijkstra(base, 0L)
      if (basePaths.nonEmpty) {
        val prior = basePaths.toSeq.toDF("node", "dist")
        val got = graft.ext.Graph.ssspFrom(prior,
            full.toDF("src", "dst", "wt"), delta.toDF("src", "dst", "wt"),
            "src", "dst", "wt")
          .as[(Long, Long)].collect().toMap
        assert(got == dijkstra(full, 0L), s"trial $i: refresh != rebuild")
      }
    }
  }

  test("S11: mapping introspection exposes the runtime schema") {
    val d = docs(spark, Seq(PlanFixture.planJson("A", Seq(("1", "x", 1.0)))))
    val nodes = Shred.nodes(d)
    // the engine analogue of GET /getMapping (elasticSearch.ts:301-310)
    val json = nodes.schema.json
    assert(json.contains("\"relName\"") && json.contains("\"rootKey\""))
    assert(nodes.schema.treeString.contains("payload"))
    assert(graft.functions.JsonSchema.sparkType(
      graft.functions.JsonSchema.parse(PlanFixture.schemaJson)) == sparkSchema)
  }
}
