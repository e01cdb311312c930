package graft

import graft.streaming.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ST1–ST5 end-to-end: a JSON-file changelog driven through the real
  * Structured Streaming pipeline with `Trigger.AvailableNow` as the
  * read-your-writes barrier (FIXTURES.md §A.4 replay fixture). */
class StreamingSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_stream").toString

  test("changelog stream applies with last-writer-wins and delete") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"plan_A","doc":"{\"v\":1}"}
        |{"seq":2,"op":"update","key":"plan_A","doc":"{\"v\":2}"}
        |{"seq":3,"op":"insert","key":"plan_B","doc":"{\"v\":9}"}
        |{"seq":4,"op":"delete","key":"plan_B","doc":null}
        |{"seq":5,"op":"insert","key":"plan_C","doc":"{\"v\":7}"}
        |""".stripMargin)
    Ingest.run(spark, log, state, ckpt)
    val got = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("plan_A" -> """{"v":2}""", "plan_C" -> """{"v":7}"""))
  }

  test("ST4 barrier: a second batch arriving later is applied on next run; replay is idempotent") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"k1","doc":"a"}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    assert(Ingest.readState(spark, state).count() == 1)
    // late-arriving batch
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":2,"op":"update","key":"k1","doc":"b"}
        |{"seq":3,"op":"insert","key":"k2","doc":"c"}
        |""".stripMargin)
    Ingest.run(spark, log, state, ckpt)
    val got = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("k1" -> "b", "k2" -> "c"))
    // replay the WHOLE log from scratch on a fresh checkpoint: same state
    // (at-least-once convergence, FIXTURES.md A.4)
    val state2 = s"$dir/state2"
    Ingest.run(spark, log, state2, s"$dir/ckpt2")
    val got2 = Ingest.readState(spark, state2).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got2 == got)
  }

  test("crash injection: torn staging dir + stray bucket version stay invisible; next commit heals") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"k1","doc":"a"}
        |{"seq":2,"op":"insert","key":"k2","doc":"b"}
        |""".stripMargin)
    Ingest.run(spark, log, state, ckpt)
    val committed = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(committed == Map("k1" -> "a", "k2" -> "b"))
    // simulate a crash MID-swapBuckets at the next id (1): a torn staging
    // dir with garbage, plus bucket versions that renamed into place but
    // whose manifest never committed — garbage bytes, not even parquet
    def junk(path: String): Unit = {
      new java.io.File(path).getParentFile.mkdirs()
      Files.write(java.nio.file.Paths.get(path), Array.fill[Byte](64)(0x5a))
    }
    junk(s"$state/_staging_v1/bucket=0/part-torn.parquet")
    junk(s"$state/b0/v1/part-torn.parquet")
    junk(s"$state/b3/v1/part-torn.parquet")
    // readers follow the manifest only: the strays are invisible, the
    // store keeps serving the last committed version
    val served = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(served == committed, "torn artifacts must not change what readers see")
    // the next batch commits id 1 over the strays (exists→delete→rename)
    // and pruneTo sweeps whatever it didn't overwrite
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":3,"op":"insert","key":"k3","doc":"c"}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    val healed = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(healed == Map("k1" -> "a", "k2" -> "b", "k3" -> "c"))
    assert(!new java.io.File(s"$state/_staging_v1").exists(),
      "staging leftovers must be gone after the healing commit")
    // every bucket version on disk is referenced by the latest manifest
    val mf = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(s"$state/manifest/m1.json"))
    val referenced = {
      val b = scala.collection.mutable.Set[String]()
      val it = mf.get("buckets").fields()
      while (it.hasNext) {
        val e = it.next()
        val vit = e.getValue.elements()
        while (vit.hasNext) b += s"b${e.getKey}/v${vit.next().asLong()}"
      }
      b.toSet
    }
    val onDisk = new java.io.File(state).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("b\\d+"))
      .flatMap(b => b.listFiles().filter(_.getName.matches("v\\d+"))
        .map(v => s"${b.getName}/${v.getName}")).toSet
    assert(onDisk == referenced,
      s"unreferenced bucket versions survive: ${onDisk -- referenced}")
  }

  test("crash injection: a torn manifest tmp never serves and is swept by the next commit") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"k1","doc":"a"}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    // crash between fs.create(tmp) and the rename: a half-written tmp —
    // the rename is the commit point, so this must never be read
    Files.writeString(java.nio.file.Paths.get(s"$state/manifest/_m1.json.tmp"),
      """{"n":8,"lastBatch":9,"buck""") // torn mid-json
    val served = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(served == Map("k1" -> "a"), "a torn manifest tmp must not serve")
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":2,"op":"update","key":"k1","doc":"b"}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    val healed = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(healed == Map("k1" -> "b"))
    val leftovers = new java.io.File(s"$state/manifest").listFiles()
      .map(_.getName).filter(_.endsWith(".tmp")).toSeq
    assert(leftovers.isEmpty, s"torn tmp must be swept by the next commit: $leftovers")
  }

  test("versioned state: stale cross-batch events cannot regress or resurrect") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    def runBatch(name: String, lines: String): Unit = {
      Files.writeString(java.nio.file.Paths.get(s"$log/$name"), lines)
      Ingest.run(spark, log, state, ckpt)
    }
    runBatch("b1.json", """{"seq":10,"op":"update","key":"k","doc":"new"}""" + "\n")
    // a stale event surfacing in a LATER batch (late file / out-of-order
    // partition) must lose to the seq-10 write already in state
    runBatch("b2.json", """{"seq":5,"op":"update","key":"k","doc":"old"}""" + "\n")
    val afterStale = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(afterStale == Map("k" -> "new"), afterStale.toString)
    // ... and a stale pre-delete update must not resurrect a deleted key
    runBatch("b3.json", """{"seq":20,"op":"delete","key":"k","doc":null}""" + "\n")
    runBatch("b4.json", """{"seq":15,"op":"update","key":"k","doc":"zombie"}""" + "\n")
    assert(Ingest.readState(spark, state).where(col("key") === "k").isEmpty)
    // a malformed row (op missing) must be ignored, not act as a delete
    runBatch("b5.json",
      """{"seq":30,"op":"insert","key":"m","doc":"ok"}
        |{"seq":31,"key":"m","doc":"no-op-field"}
        |""".stripMargin)
    val end = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(end == Map("m" -> "ok"), end.toString)
  }

  private def stateTree(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[(String, Long)] =
      if (f.isFile) Seq(f.getPath -> f.lastModified())
      else Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Nil)
    walk(new java.io.File(root)).toMap
  }

  test("checkpoint-replay with a committed manifest skips the batch (files untouched)") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"a","doc":"1"}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":2,"op":"insert","key":"b","doc":"2"}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    // crash between the manifest commit and the checkpoint commit: drop the
    // last commit marker, so restart replays batch 1 — whose manifest is
    // already committed. The replay must SKIP the batch outright: no
    // recompute, no delete/rename of anything a reader could be using.
    val commitDir = new java.io.File(s"$ckpt/commits")
    val lastCommit = commitDir.listFiles()
      .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong).getName
    // remove the marker AND its checksum sibling — a stale .crc makes the
    // checksum checkpoint manager flag the log as concurrently owned
    commitDir.listFiles().filter(_.getName.stripPrefix(".").stripSuffix(".crc")
      .stripSuffix(".checksum") == lastCommit).foreach(f => assert(f.delete()))
    val before = stateTree(state)
    Ingest.run(spark, log, state, ckpt)
    assert(stateTree(state) == before, "state files changed on committed-batch replay")
    val got = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "1", "b" -> "2"))
  }

  test("a batch appends one delta to touched chains and modifies no existing file") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      (0 until 40).map(i => s"""{"seq":$i,"op":"insert","key":"k$i","doc":"d$i"}""")
        .mkString("", "\n", "\n"))
    Ingest.run(spark, log, state, ckpt)
    def manifest(id: Long): Map[Int, Seq[Long]] = {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(s"$state/manifest/m$id.json"))
      val it = node.get("buckets").fields()
      val out = scala.collection.mutable.Map[Int, Seq[Long]]()
      while (it.hasNext) {
        val e = it.next()
        val vs = scala.collection.mutable.ArrayBuffer[Long]()
        val vit = e.getValue.elements()
        while (vit.hasNext) vs += vit.next().asLong()
        out(e.getKey.toInt) = vs.toSeq
      }
      out.toMap
    }
    val m0 = manifest(0)
    assert(m0.size > 1, s"expected the 40 keys to spread over buckets, got $m0")
    val before = stateTree(state)
    // batch 1 touches a single key → one delta on a single bucket's chain
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":100,"op":"update","key":"k7","doc":"dd"}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    val m1 = manifest(1)
    val moved = m1.filter(_._2.contains(1L)).keySet
    assert(moved.size == 1, s"one bucket should gain the v1 delta, manifest: $m1")
    assert(m1(moved.head) == Seq(0L, 1L), s"expected a base+delta chain: $m1")
    // every untouched bucket keeps its single-version chain...
    (m1 -- moved).foreach { case (b, vs) => assert(vs == Seq(0L), s"bucket $b moved: $m1") }
    // ...and EVERY pre-existing file is byte-identical — the delta write
    // touches nothing, not even the updated bucket's base
    val after = stateTree(state)
    before.filter { case (p, _) =>
      !p.contains(s"${java.io.File.separator}manifest${java.io.File.separator}") }
      .foreach { case (p, t) =>
        assert(after.get(p).contains(t), s"pre-existing file changed: $p") }
    // and the state itself is correct
    val got = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == (0 until 40).map(i => s"k$i" -> s"d$i").toMap.updated("k7", "dd"))
    // point read resolves through the manifest to a single bucket and
    // agrees with the full read for hits, misses, and deleted keys
    val hit = Ingest.readStateKey(spark, state, "k7").collect()
    assert(hit.length == 1 && hit.head.getString(1) == "dd", hit.mkString)
    assert(Ingest.readStateKey(spark, state, "nope").isEmpty)
    Files.writeString(java.nio.file.Paths.get(s"$log/b3.json"),
      """{"seq":200,"op":"delete","key":"k7","doc":null}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    assert(Ingest.readStateKey(spark, state, "k7").isEmpty,
      "tombstoned key leaked through the point read")
  }

  test("delta chains fold back to one base once they exceed maxDeltas") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    // 7 batches, all hitting the same key: one bucket's chain keeps
    // growing and must fold whenever it passes maxDeltas = 2
    for (i <- 1 to 7) {
      Files.writeString(java.nio.file.Paths.get(s"$log/b$i.json"),
        s"""{"seq":$i,"op":"update","key":"k","doc":"d$i"}""" + "\n")
      Ingest.run(spark, log, state, ckpt, nBuckets = 16, maxDeltas = 2)
    }
    val latest = new java.io.File(s"$state/manifest").listFiles()
      .filter(f => f.getName.startsWith("m") && f.getName.endsWith(".json"))
      .maxBy(_.getName.stripPrefix("m").stripSuffix(".json").toLong)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(latest)
    val it = node.get("buckets").fields()
    while (it.hasNext) {
      val e = it.next()
      assert(e.getValue.size() <= 2,
        s"chain ${e.getKey} grew past maxDeltas without folding: $node")
    }
    // and on-disk versions match the manifest exactly (pruned after folds)
    assert(Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap == Map("k" -> "d7"))
  }

  test("compaction ages out tombstones, keeps live rows, and the stream continues") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"a","doc":"1"}
        |{"seq":2,"op":"insert","key":"b","doc":"2"}
        |""".stripMargin)
    Ingest.run(spark, log, state, ckpt)
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":3,"op":"delete","key":"a","doc":null}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    def rawRows() = spark.read
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("doc", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("deleted", org.apache.spark.sql.types.BooleanType))))
      .parquet(s"$state/b*/v*").collect()
    assert(rawRows().exists(_.getAs[Boolean]("deleted")), "expected a tombstone pre-compaction")
    Ingest.compact(spark, state, dropTombstonesUpTo = 3)
    assert(!rawRows().exists(_.getAs[Boolean]("deleted")), "tombstone survived compaction")
    assert(Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap == Map("b" -> "2"))
    // the stream picks up after compaction: new batch applies normally
    Files.writeString(java.nio.file.Paths.get(s"$log/b3.json"),
      """{"seq":4,"op":"insert","key":"c","doc":"3"}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    val end = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(end == Map("b" -> "2", "c" -> "3"), end.toString)
    assert(Ingest.readStateKey(spark, state, "a").isEmpty)
  }

  test("equal-seq collisions resolve deterministically: deletes win ties") {
    import spark.implicits._
    // state row and batch tombstone carry the SAME seq: the delete must win
    // (deterministic verdict), not the shuffle arrival order
    val state = Seq(("k", "old", 5L, false)).toDF("key", "doc", "seq", "deleted")
    val batch = Seq((5L, "delete", "k", null: String)).toDF("seq", "op", "key", "doc")
    val merged = Ingest.applyBatchVersioned(state, batch).collect()
    assert(merged.length == 1 && merged.head.getAs[Boolean]("deleted"), merged.mkString)
    // within one batch, update and delete at the same seq → delete wins
    val batch2 = Seq((7L, "update", "x", "v"), (7L, "delete", "x", null: String))
      .toDF("seq", "op", "key", "doc")
    val out2 = Ingest.applyBatchVersioned(state.limit(0), batch2).collect()
    assert(out2.length == 1 && out2.head.getAs[Boolean]("deleted"), out2.mkString)
  }

  test("legacy (key,doc)-schema state versions read as live rows") {
    import spark.implicits._
    val dir = tmp(); val state = s"$dir/state"
    // a version written by the pre-versioned format: seq/deleted read as
    // NULL under the current schema; missing tombstone flag = live
    Seq(("a", "1"), ("b", "2")).toDF("key", "doc").write.parquet(s"$state/v0")
    val got = Ingest.readState(spark, state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "1", "b" -> "2"))
  }

  test("applyBatch is idempotent (batch applied twice == once)") {
    import spark.implicits._
    val batch = Seq((1L, "insert", "a", "1"), (2L, "update", "a", "2"),
      (3L, "insert", "b", "3"), (4L, "delete", "c", null))
      .toDF("seq", "op", "key", "doc")
    val empty = batch.select("key", "doc").limit(0)
    val once = Ingest.applyBatch(empty, batch)
    val twice = Ingest.applyBatch(once, batch)
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("snapshotAt: each cut sees exactly the log prefix; full cut == full replay") {
    import spark.implicits._
    val log = Seq(
      (1L, "insert", "a", "a1"), (2L, "insert", "b", "b1"),
      (3L, "update", "a", "a2"), (4L, "delete", "b", null),
      (5L, "insert", "c", "c1"), (6L, "delete", "a", null))
      .toDF("seq", "op", "key", "doc")
    def snap(cut: Long) = Ingest.snapshotAt(log, cut).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snap(2L) == Map("a" -> "a1", "b" -> "b1"))
    assert(snap(4L) == Map("a" -> "a2"))             // b deleted
    assert(snap(6L) == Map("c" -> "c1"))             // a deleted late
    // as-of the max seq ≡ replaying everything through applyBatch
    val replay = Ingest.applyBatch(log.select("key", "doc").limit(0), log)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snap(Long.MaxValue) == replay)
  }

  test("scd2History: intervals tile each key's timeline and agree with snapshotAt at every cut") {
    import spark.implicits._
    val log = Seq(
      (1L, "insert", "a", "a1"), (2L, "insert", "b", "b1"),
      (3L, "update", "a", "a2"), (4L, "delete", "b", null),
      (5L, "insert", "c", "c1"), (6L, "delete", "a", null),
      (7L, "insert", "b", "b2"))
      .toDF("seq", "op", "key", "doc")
    val hist = Ingest.scd2History(log).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    // one version row per non-delete event, closed by the NEXT event on the key
    assert(hist.toSet == Set(
      ("a", "a1", 1L, Some(3L), false), ("a", "a2", 3L, Some(6L), false),
      ("b", "b1", 2L, Some(4L), false), ("b", "b2", 7L, None, true),
      ("c", "c1", 5L, None, true)))
    // the interval view reconstructs snapshotAt at EVERY cut point
    for (cut <- 1L to 7L) {
      val viaIntervals = hist.collect {
        case (k, d, from, to, _) if from <= cut && to.forall(cut < _) => k -> d
      }.toMap
      val viaSnapshot = Ingest.snapshotAt(log, cut).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(viaIntervals == viaSnapshot, s"cut=$cut")
    }
  }

  test("incremental MV maintenance at any cut sequence equals a rebuild; deletes retract") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val keys = Vector("a", "b", "c", "d", "e")
    val log = (1L to 60L).map { seq =>
      val op = if (rnd.nextInt(4) == 0) "delete" else "update"
      (seq, op, keys(rnd.nextInt(keys.size)),
        if (op == "delete") null else s"""{"k": ${rnd.nextInt(100)}}""")
    }.toDF("seq", "op", "key", "doc")
    val kv = get_json_object(col("doc"), "$.k").cast("long")
    val grp = (kv % 3).as("grp")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def rebuildAt(cut: Long) =
      Ingest.mvBuild(Ingest.snapshotAt(log, cut), grp, kv)
    // fold through ANY ascending cut sequence == direct rebuild at the end
    for (cuts <- Seq(Seq(60L), Seq(20L, 40L, 60L), Seq(1L, 2L, 59L, 60L),
      Seq(13L, 31L, 44L, 52L, 60L))) {
      val folded = cuts.zip(0L +: cuts.init).foldLeft(rebuildAt(0L)) {
        case (mv, (to, from)) => Ingest.mvMaintain(mv, log, from, to, grp, kv)
      }
      assert(rows(folded) == rows(rebuildAt(60L)), s"cuts=$cuts")
    }
    // delete retraction: wipe every key in a last chunk -> the view empties
    val wipe = keys.zipWithIndex.map { case (k, i) =>
      (100L + i, "delete", k, null: String) }.toDF("seq", "op", "key", "doc")
    val all = log.unionByName(wipe)
    val gone = Ingest.mvMaintain(rebuildAt(60L), all, 60L, 200L, grp, kv)
    assert(gone.count() == 0, "deletes must retract their group contributions")
  }

  test("scd2Merge at every split equals the full rebuild; pointInTime agrees with snapshotAt") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val keys = Vector("a", "b", "c", "d")
    val log = (1L to 40L).map { seq =>
      val op = if (rnd.nextInt(5) == 0) "delete" else "update"
      (seq, op, keys(rnd.nextInt(keys.size)), if (op == "delete") null else s"v$seq")
    }.toDF("seq", "op", "key", "doc")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    val full = rows(Ingest.scd2History(log))
    // incremental fold from ANY split point (incl. empty prefix) == rebuild
    for (cut <- Seq(0L, 1L, 7L, 20L, 33L, 39L)) {
      val merged = Ingest.scd2Merge(
        Ingest.scd2History(log.where(col("seq") <= cut)),
        log.where(col("seq") > cut))
      assert(rows(merged) == full, s"split=$cut")
      // at-least-once redelivery of the SAME chunk is a no-op (the
      // per-key fence drops already-folded events before the rebuild)
      assert(rows(Ingest.scd2Merge(merged, log.where(col("seq") > cut))) == full,
        s"replay at split=$cut")
    }
    val hist = Ingest.scd2History(log)
    for (cut <- Seq(5L, 17L, 40L)) {
      val probes = keys.map(k => (k, cut)).toDF("key", "as_of_seq")
      val got = Ingest.pointInTime(hist, probes).collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
      val want = Ingest.snapshotAt(log, cut).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == want, s"cut=$cut")
    }
  }

  test("streamed SCD2: closed intervals across batches equal the batch rebuild's; replay is a no-op") {
    import graft.streaming.Scd2Stream
    import spark.implicits._
    val dir = tmp(); val out = s"$dir/closed"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"a","doc":"a1"}
        |{"seq":2,"op":"insert","key":"b","doc":"b1"}
        |{"seq":3,"op":"update","key":"a","doc":"a2"}
        |""".stripMargin)
    Scd2Stream.run(spark, log, out, ckpt)
    // batch 2 closes across the batch boundary (a2 opened in batch 1)
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":4,"op":"delete","key":"b","doc":null}
        |{"seq":5,"op":"insert","key":"c","doc":"c1"}
        |{"seq":6,"op":"delete","key":"a","doc":null}
        |{"seq":3,"op":"update","key":"a","doc":"STALE-REPLAY"}
        |""".stripMargin)
    Scd2Stream.run(spark, log, out, ckpt)
    def closedSet() = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val fullLog = Seq(
      (1L, "insert", "a", "a1"), (2L, "insert", "b", "b1"),
      (3L, "update", "a", "a2"), (4L, "delete", "b", null),
      (5L, "insert", "c", "c1"), (6L, "delete", "a", null))
      .toDF("seq", "op", "key", "doc")
    val batchClosed = Ingest.scd2History(fullLog).where(!col("is_current"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(closedSet() == batchClosed)
    assert(closedSet() == Set(("a", "a1", 1L, 3L), ("a", "a2", 3L, 6L), ("b", "b1", 2L, 4L)))
    // a third run with nothing new appends nothing (replay fence + checkpoint)
    Scd2Stream.run(spark, log, out, ckpt)
    assert(closedSet() == batchClosed)
  }

  test("streamed SCD2 resolves an equal-seq collision within a batch like the batch rebuild") {
    import graft.streaming.Scd2Stream
    import spark.implicits._
    val dir = tmp(); val out = s"$dir/closed"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"k","doc":"v1"}
        |{"seq":5,"op":"update","key":"k","doc":"v5"}
        |{"seq":5,"op":"delete","key":"k","doc":null}
        |""".stripMargin)
    Scd2Stream.run(spark, log, out, ckpt)
    def closedSet() = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batchClosed = Ingest.scd2History(Seq(
      (1L, "insert", "k", "v1"), (5L, "update", "k", "v5"), (5L, "delete", "k", null))
      .toDF("seq", "op", "key", "doc"))
      .where(!col("is_current"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // the delete applies at equal seq because the update ahead of it in
    // tiebreak order applied in the same invocation — including the
    // degenerate [5,5) interval the batch form also emits
    assert(closedSet() == batchClosed)
    assert(closedSet() == Set(("k", "v1", 1L, 5L), ("k", "v5", 5L, 5L)))
    Scd2Stream.run(spark, log, out, ckpt) // redelivery: no new rows
    assert(closedSet() == batchClosed)
  }

  test("snapshotDiff classifies added/updated/deleted and drops unchanged keys") {
    import spark.implicits._
    val log = Seq(
      (1L, "insert", "stay", "s1"), (2L, "insert", "upd", "u1"),
      (3L, "insert", "gone", "g1"),
      // between cut A=3 and cut B=6:
      (4L, "update", "upd", "u2"), (5L, "delete", "gone", null),
      (6L, "insert", "new", "n1"))
      .toDF("seq", "op", "key", "doc")
    val got = Ingest.snapshotDiff(log, 3L, 6L).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("upd", "updated"), ("gone", "deleted"), ("new", "added")))
  }

  test("event-time tumbling window with watermark drops late data (extension)") {
    import org.apache.spark.sql.types._
    val dir = tmp(); val log = s"$dir/ev"; new java.io.File(log).mkdirs()
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    // batch 1: events up to 10:30 → watermark advances to 10:20
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"ts":"2024-01-01T10:01:00.000Z","event_type":"click","value":1.0}
        |{"ts":"2024-01-01T10:05:00.000Z","event_type":"click","value":2.0}
        |{"ts":"2024-01-01T10:30:00.000Z","event_type":"view","value":3.0}
        |""".stripMargin)
    val emitted = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String, Long, Double)]())
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(log)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select(col("window.start").cast("string"), col("event_type"), col("n"), col("v"))
            .collect().foreach(r => emitted.add(
              (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // batch 2: one on-time event + one late event (09:50 < watermark 10:20)
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"ts":"2024-01-01T10:59:00.000Z","event_type":"click","value":9.0}
        |{"ts":"2024-01-01T09:50:00.000Z","event_type":"click","value":100.0}
        |""".stripMargin)
    runOnce()
    val rows = {
      import scala.jdk.CollectionConverters._
      emitted.asScala.toSet
    }
    // the 10:00 click window (2 events) was emitted once its window closed
    // past the watermark; the late 09:50 click was DROPPED (no 09:45
    // window, no mutation of the emitted one)
    assert(rows.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)), rows.toString)
    assert(!rows.exists(_._4 == 100.0), s"late event leaked: $rows")
  }

  test("streaming curation pipeline: gate -> langid -> mixture -> dedup on a stream (extension)") {
    import org.apache.spark.sql.types._
    val dir = tmp(); val log = s"$dir/docs"; new java.io.File(log).mkdirs()
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    // 40 docs; every 4th is a duplicate body, a couple fail the length gate
    val rows = (0 until 40).map { i =>
      val text =
        if (i % 7 == 0) "tiny"
        else if (i % 4 == 0) "the shared duplicate body of the stream with the usual words"
        else s"the document number $i of the stream with the usual words and the rest"
      s"""{"ts":"2024-01-01T10:00:${"%02d".format(i)}.000Z","doc_id":$i,"text":"$text","lang":"en"}"""
    }
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"), rows.mkString("\n") + "\n")

    def curate(df: org.apache.spark.sql.DataFrame) = {
      // the BATCH operators applied verbatim: pure projections and the
      // content-keyed mixture filter are stream-safe by construction
      val scored = graft.ext.TextAnalysis.withLangId(
        graft.ext.TextAnalysis.withQuality(df))
      graft.ext.Curation.mixSample(
        scored.where(col("pred_lang") === "en" && col("n_tokens") >= 5),
        groupCol = "pred_lang")
    }
    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    val q = graft.streaming.StreamDedup.exactWithinWatermark(
        curate(spark.readStream.schema(schema).json(log)), "ts")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id").collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = { import scala.jdk.CollectionConverters._; got.asScala.toSet }
    // batch reference on the same file: same gate + mixture, then exact
    // dedup keeps one doc per distinct body (streaming kept the first to
    // ARRIVE; batch keeps min id — same doc here since arrival order = id)
    val batch = curate(spark.read.schema(schema).json(log))
    val expected = graft.ext.Dedup.exact(batch.select("doc_id", "text"))
      .select("keep_id").collect().map(_.getLong(0)).toSet
    assert(streamed == expected,
      s"stream/batch divergence: stream-only ${streamed -- expected}, batch-only ${expected -- streamed}")
    assert(streamed.nonEmpty && streamed.size < 40)
  }

  test("streaming exact dedup: in-horizon duplicates suppressed, state expires (extension)") {
    import org.apache.spark.sql.types._
    val dir = tmp(); val log = s"$dir/docs"; new java.io.File(log).mkdirs()
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("doc_id", LongType), StructField("text", StringType)))
    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    def runOnce(): Unit = {
      val q = graft.streaming.StreamDedup
        .exactWithinWatermark(spark.readStream.schema(schema).json(log), "ts")
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("doc_id").collect().foreach(r => got.add(r.getLong(0))); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 1: the same text delivered twice (replay) + one distinct doc
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"ts":"2024-01-01T10:00:00.000Z","doc_id":1,"text":"same body"}
        |{"ts":"2024-01-01T10:00:01.000Z","doc_id":2,"text":"same body"}
        |{"ts":"2024-01-01T10:00:02.000Z","doc_id":3,"text":"other body"}
        |""".stripMargin)
    runOnce()
    assert(got.size == 2, s"in-horizon duplicate not suppressed: $got")
    // batch 2 advances the watermark far past the horizon; batch 3's
    // duplicate of "same body" is then re-admitted (state EXPIRED — the
    // bounded-state contract, not a forever-dedup)
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"ts":"2024-01-01T12:00:00.000Z","doc_id":4,"text":"noon body"}""" + "\n")
    runOnce()
    Files.writeString(java.nio.file.Paths.get(s"$log/b3.json"),
      """{"ts":"2024-01-01T12:00:05.000Z","doc_id":5,"text":"same body"}""" + "\n")
    runOnce()
    val ids = { import scala.jdk.CollectionConverters._; got.asScala.toSet }
    assert(ids.contains(5L), s"expired-state duplicate should re-emit: $ids")
    assert(got.size == 4, s"expected 4 emissions total: $got")
  }

  test("stream-stream interval join: watermarked attribution window (extension)") {
    import org.apache.spark.sql.types._
    val dir = tmp()
    val pDir = s"$dir/p"; val cDir = s"$dir/c"
    new java.io.File(pDir).mkdirs(); new java.io.File(cDir).mkdirs()
    val pSchema = StructType(Seq(StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("pid", StringType)))
    val cSchema = StructType(Seq(StructField("cts", TimestampType),
      StructField("user_id", LongType), StructField("cid", StringType)))
    Files.writeString(java.nio.file.Paths.get(s"$pDir/b1.json"),
      """{"ts":"2024-01-01T10:00:00.000Z","user_id":1,"pid":"p1"}""" + "\n")
    Files.writeString(java.nio.file.Paths.get(s"$cDir/b1.json"),
      """{"cts":"2024-01-01T09:30:00.000Z","user_id":1,"cid":"in_0930"}
        |{"cts":"2024-01-01T09:59:00.000Z","user_id":1,"cid":"in_0959"}
        |{"cts":"2024-01-01T10:00:00.000Z","user_id":1,"cid":"out_at_bound"}
        |{"cts":"2024-01-01T08:30:00.000Z","user_id":1,"cid":"out_too_old"}
        |{"cts":"2024-01-01T09:30:00.000Z","user_id":2,"cid":"out_other_user"}
        |""".stripMargin)
    val purchases = spark.readStream.schema(pSchema).json(pDir)
    val clicks = spark.readStream.schema(cSchema).json(cDir)
    val joined = graft.streaming.StreamJoins.intervalJoin(
      purchases, clicks, "user_id", "ts", "cts", lowerSec = -3600, upperSec = 0)
    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[(String, String)]())
    val q = joined.select(col("pid"), col("cid"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add((r.getString(0), r.getString(1)))); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val pairs = { import scala.jdk.CollectionConverters._; got.asScala.toSet }
    // [t-1h, t): 09:30 and 09:59 match; the exact-bound 10:00 click, the
    // too-old 08:30 click, and the other user's click do not
    assert(pairs == Set(("p1", "in_0930"), ("p1", "in_0959")), pairs.toString)
  }

  test("stateful mapGroupsWithState kv: latest wins, stale seq ignored, state survives batches") {
    import graft.streaming.StatefulKv
    val dir = tmp(); val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":2,"op":"insert","key":"a","doc":"v2"}
        |{"seq":1,"op":"update","key":"a","doc":"v1-stale"}
        |{"seq":3,"op":"insert","key":"b","doc":"w"}
        |""".stripMargin)
    StatefulKv.run(spark, log, out, ckpt)
    // second batch: update a (newer), delete b, replay an old a event
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":5,"op":"update","key":"a","doc":"v5"}
        |{"seq":4,"op":"delete","key":"b","doc":null}
        |{"seq":2,"op":"insert","key":"a","doc":"v2"}
        |""".stripMargin)
    StatefulKv.run(spark, log, out, ckpt)
    val updates = spark.read.parquet(out)
    // latest row per key across the emitted update stream
    import org.apache.spark.sql.expressions.Window
    val latest = updates.withColumn("rn",
        row_number().over(Window.partitionBy(col("key")).orderBy(col("seq").desc)))
      .where(col("rn") === 1).drop("rn")
      .collect().map(r => (r.getAs[String]("key"),
        (r.getAs[Long]("seq"), r.getAs[String]("doc"), r.getAs[Boolean]("deleted")))).toMap
    assert(latest("a") == ((5L, "v5", false)))
    assert(latest("b") == ((4L, null, true)))
    // the stale seq=1 / replayed seq=2 events never surfaced as updates
    assert(!updates.where(col("doc") === "v1-stale").collect().nonEmpty)
  }

  test("streaming session_window: sessions close at the watermark, open ones held back (extension)") {
    import org.apache.spark.sql.types._
    val dir = tmp(); val log = s"$dir/ev"; new java.io.File(log).mkdirs()
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("user", StringType)))
    // user a: two events 1 min apart (one session, 5 min gap), then a third
    // 20 min later (a second session)
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"ts":"2024-01-01T10:00:00.000Z","user":"a"}
        |{"ts":"2024-01-01T10:01:00.000Z","user":"a"}
        |{"ts":"2024-01-01T10:20:00.000Z","user":"a"}
        |""".stripMargin)
    val emitted = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String, String, Long)]())
    def runOnce(): Unit = {
      val q = graft.ext.Windows.streamingSessions(
          spark.readStream.schema(schema).json(log), "ts", "user",
          gap = "5 minutes", watermark = "10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select(col("user"), col("session_start").cast("string"),
              col("session_end").cast("string"), col("n_events"))
            .collect().foreach(r => emitted.add(
              (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // batch 2 advances the watermark past both sessions' close; its own
    // 11:00 session stays open (not emitted)
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"ts":"2024-01-01T11:00:00.000Z","user":"a"}""" + "\n")
    runOnce()
    val rows = {
      import scala.jdk.CollectionConverters._
      emitted.asScala.toSet
    }
    // session 1: 10:00–10:01+gap → [10:00, 10:06), 2 events; session 2: one
    // event at 10:20 → [10:20, 10:25), 1 event
    assert(rows.contains(("a", "2024-01-01 10:00:00", "2024-01-01 10:06:00", 2L)), rows.toString)
    assert(rows.contains(("a", "2024-01-01 10:20:00", "2024-01-01 10:25:00", 1L)), rows.toString)
    assert(!rows.exists(_._2 == "2024-01-01 11:00:00"), s"open session leaked: $rows")
  }

  test("streaming index maintenance: per-batch delta folds equal a full rebuild (extension)") {
    import org.apache.spark.sql.types._
    import graft.ext.InvertedIndex
    val dir = tmp(); val log = s"$dir/updates"; new java.io.File(log).mkdirs()
    val schema = StructType(Seq(StructField("seq", LongType),
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("op", StringType)))
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"doc_id":1,"text":"alpha beta","op":"upsert"}
        |{"seq":2,"doc_id":2,"text":"old words here","op":"upsert"}
        |{"seq":3,"doc_id":3,"text":"doomed doc","op":"upsert"}
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":4,"doc_id":2,"text":"fresh words now","op":"upsert"}
        |{"seq":5,"doc_id":3,"text":"","op":"delete"}
        |{"seq":6,"doc_id":4,"text":"gamma delta","op":"upsert"}
        |""".stripMargin)
    // stored index starts empty; each micro-batch folds in as a DELTA —
    // latest-wins within the batch (the ST3 contract), then
    // applyDocDelta's anti-join + batch-only tokenize
    val vdir = s"$dir/post"
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("term", StringType),
          StructField("doc_id", LongType), StructField("tf", LongType))))
      .write.parquet(s"$vdir/v0")
    val version = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(log)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("seq").desc)
        val latest = b.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        val v = version.get()
        val merged = InvertedIndex.applyDocDelta(
          spark.read.parquet(s"$vdir/v$v"),
          latest.where(col("op") =!= "delete").select("doc_id", "text"),
          latest.where(col("op") === "delete").select("doc_id"))
        merged.write.parquet(s"$vdir/v${v + 1}")
        version.incrementAndGet(); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(version.get() >= 2, s"expected >=2 micro-batches, got ${version.get()}")
    val got = spark.read.parquet(s"$vdir/v${version.get()}")
      .orderBy("term", "doc_id").collect().toSeq
    val rebuilt = InvertedIndex.postings(
      { import spark.implicits._
        Seq((1L, "alpha beta"), (2L, "fresh words now"), (4L, "gamma delta"))
          .toDF("doc_id", "text") })
      .orderBy("term", "doc_id").collect().toSeq
    assert(got == rebuilt, s"stream-folded index != rebuild:\n$got\n$rebuilt")
  }

  test("streaming MV maintenance: per-batch retract+add deltas equal a rebuild (extension)") {
    import org.apache.spark.sql.types._
    val dir = tmp(); val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"a","doc":"{\"k\": 10}"}
        |{"seq":2,"op":"insert","key":"b","doc":"{\"k\": 11}"}
        |{"seq":3,"op":"insert","key":"c","doc":"{\"k\": 25}"}
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":4,"op":"update","key":"a","doc":"{\"k\": 13}"}
        |{"seq":5,"op":"delete","key":"b","doc":null}
        |{"seq":6,"op":"insert","key":"d","doc":"{\"k\": 31}"}
        |""".stripMargin)
    val kv = get_json_object(col("doc"), "$.k").cast("long")
    val grp = (kv % 3).as("grp")
    // versioned (state, mv) pair maintained per micro-batch: the MV fold
    // runs in the SAME foreachBatch as the state upsert it shadows
    val vdir = s"$dir/v"
    def empty(schema: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    empty(StructType(Seq(StructField("key", StringType), StructField("doc", StringType))))
      .write.parquet(s"$vdir/state0")
    empty(StructType(Seq(StructField("grp", LongType),
      StructField("n_keys", LongType), StructField("sum_v", LongType))))
      .write.parquet(s"$vdir/mv0")
    val version = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.schema(Ingest.changelogSchema)
      .option("maxFilesPerTrigger", 1).json(log)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val v = version.get()
        val state = spark.read.parquet(s"$vdir/state$v")
        val mv = spark.read.parquet(s"$vdir/mv$v")
        val batch = b.persist()
        Ingest.mvApplyBatch(mv, state, batch, grp, kv)
          .write.parquet(s"$vdir/mv${v + 1}")
        Ingest.applyBatch(state, batch).write.parquet(s"$vdir/state${v + 1}")
        batch.unpersist()
        version.incrementAndGet(); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(version.get() >= 2, s"expected >=2 micro-batches, got ${version.get()}")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = rows(spark.read.parquet(s"$vdir/mv${version.get()}"))
    val rebuilt = rows(Ingest.mvBuild(
      spark.read.parquet(s"$vdir/state${version.get()}"), grp, kv))
    assert(streamed == rebuilt, s"stream-folded MV != rebuild:\n$streamed\n$rebuilt")
    // hand-checked: final state a=13, c=25, d=31 (b deleted) — all k%3==1
    assert(streamed == Set((1L, 3L, 69L)), s"unexpected final MV: $streamed")
  }

  test("streaming resample: closed buckets across batches equal the batch rebuild minus open tails (extension)") {
    import graft.streaming.StreamResample
    val hour = 3600L * 1000000L
    val dir = tmp(); val obs = s"$dir/obs"; new java.io.File(obs).mkdirs()
    // batch 1: key 1 — an equal-ts pair in hour 0 (id tiebreak) then an
    // hour-2 event that closes hour 0 and the hour-1 gap
    Files.writeString(java.nio.file.Paths.get(s"$obs/b1.json"),
      s"""{"key":1,"ts_micros":${0 * hour + 600}, "event_id":1,"value":1.0}
         |{"key":1,"ts_micros":${0 * hour + 600}, "event_id":2,"value":2.0}
         |{"key":1,"ts_micros":${2 * hour + 60}, "event_id":3,"value":3.0}
         |""".stripMargin)
    // batch 2: key 1 jumps to hour 5 (closes 2, gaps 3-4 carry 3.0 across
    // the BATCH BOUNDARY from managed state); key 2 starts fresh
    Files.writeString(java.nio.file.Paths.get(s"$obs/b2.json"),
      s"""{"key":1,"ts_micros":${5 * hour + 60}, "event_id":4,"value":4.0}
         |{"key":2,"ts_micros":${1 * hour + 60}, "event_id":10,"value":9.0}
         |{"key":2,"ts_micros":${2 * hour + 60}, "event_id":11,"value":8.0}
         |""".stripMargin)
    // maxFilesPerTrigger=1 forces b1/b2 into SEPARATE micro-batches: the
    // hour-3/4 gap fill and the carry of 3.0 genuinely cross a batch
    // boundary through managed state
    StreamResample.run(spark, obs, s"$dir/out", s"$dir/ckpt", hour,
      maxFilesPerTrigger = Some(1))
    val nBatches = new java.io.File(s"$dir/ckpt/offsets").list()
      .count(!_.startsWith("."))
    assert(nBatches >= 2, s"expected >=2 micro-batches, got $nBatches")
    val streamed = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == Set(
      (1L, 0L, 2L, 2.0), (1L, 1L, 0L, 2.0), (1L, 2L, 1L, 3.0),
      (1L, 3L, 0L, 3.0), (1L, 4L, 0L, 3.0),
      (2L, 1L, 1L, 9.0)), s"streamed: $streamed")
    // and that set IS the batch rebuild minus each key's open (final) bucket
    import spark.implicits._
    val all = Seq(
      (1L, 0L * hour + 600, 1L, 1.0), (1L, 0L * hour + 600, 2L, 2.0),
      (1L, 2L * hour + 60, 3L, 3.0), (1L, 5L * hour + 60, 4L, 4.0),
      (2L, 1L * hour + 60, 10L, 9.0), (2L, 2L * hour + 60, 11L, 8.0))
      .toDF("user_id", "tsm", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("tsm")))
    val batch = graft.ext.Windows.resampleFfill(all)
      .select(col("key"), (unix_micros(col("bucket")) / hour).cast("long").as("b"),
        col("n_obs"), col("value_ffill"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val open = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batchClosed = batch.filterNot(r => open(r._1) == r._2).toSet
    assert(streamed == batchClosed, s"stream != batch-minus-open:\n$streamed\n$batchClosed")
  }

  test("streaming funnel: completion log across batches equals the batch DP (extension)") {
    import graft.streaming.StreamFunnel
    val H = 3600L * 1000000L
    val dir = tmp(); val evd = s"$dir/ev"; new java.io.File(evd).mkdirs()
    def row(u: Long, h: Double, id: Long, ty: String) =
      s"""{"user_id":$u,"ts_micros":${(h * H).toLong},"event_id":$id,"event_type":"$ty"}"""
    // batch 1: u1 signs up + clicks; u2's chain will EXPIRE (2h window);
    // u3 noise only
    Files.writeString(java.nio.file.Paths.get(s"$evd/b1.json"), Seq(
      row(1, 0.0, 1, "signup"), row(1, 0.5, 2, "click"),
      row(2, 0.0, 3, "signup"), row(2, 0.5, 4, "click"),
      row(3, 0.0, 5, "view")).mkString("", "\n", "\n"))
    // batch 2: u1 purchases inside the window — the chain CROSSES the
    // batch boundary through state; u2 purchases too late; u2 then
    // re-anchors (fresh signup+click) and converts — the late-anchor
    // rescue, also cross-batch
    Files.writeString(java.nio.file.Paths.get(s"$evd/b2.json"), Seq(
      row(1, 1.5, 6, "purchase"),
      row(2, 5.0, 7, "purchase"),
      row(2, 6.0, 8, "signup"), row(2, 6.5, 9, "click"),
      row(2, 7.0, 10, "purchase")).mkString("", "\n", "\n"))
    val now = System.currentTimeMillis()
    Seq("b1.json" -> 2, "b2.json" -> 1).foreach { case (f, back) =>
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(s"$evd/$f"),
        java.nio.file.attribute.FileTime.fromMillis(now - back * 60000L))
    }
    val steps = Seq("signup", "click", "purchase")
    StreamFunnel.run(spark, evd, s"$dir/out", s"$dir/ckpt", steps,
      windowMicros = 2 * H, maxFilesPerTrigger = Some(1))
    val nBatches = new java.io.File(s"$dir/ckpt/offsets").list()
      .count(!_.startsWith("."))
    assert(nBatches >= 2, s"expected >=2 micro-batches, got $nBatches")
    val log = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // each level emits exactly once per user, at its first certification
    assert(log.groupBy(l => (l._1, l._2)).forall(_._2.length == 1),
      s"duplicate level emissions: ${log.toSeq}")
    assert(log.toSet == Set(
      (1L, 1L, "signup", 0L), (1L, 2L, "click", (0.5 * H).toLong),
      (1L, 3L, "purchase", (1.5 * H).toLong),
      (2L, 1L, "signup", 0L), (2L, 2L, "click", (0.5 * H).toLong),
      (2L, 3L, "purchase", (7.0 * H).toLong)), s"log: ${log.toSeq}")
    // and the log's max level per user equals the batch DP on the union
    import spark.implicits._
    val all = spark.read.json(s"$evd/*.json")
      .select(col("user_id"), timestamp_micros(col("ts_micros")).as("ts"),
        col("event_id"), col("event_type"))
    val batch = graft.ext.EventAnalytics.funnelWindowed(all, steps, 2 * H)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val streamedCounts = (1 to steps.size).map(i =>
      i.toLong -> log.map(_._1).distinct.count(u =>
        log.exists(l => l._1 == u && l._2 >= i)).toLong).toMap
    assert(streamedCounts == batch,
      s"streamed reach $streamedCounts != batch DP $batch")
    // restart mid-feed: a NEW query on the same checkpoint + state must
    // resume (u4 converts entirely in the new feed; u1/u2 re-emit
    // NOTHING — their levels were already certified)
    Files.writeString(java.nio.file.Paths.get(s"$evd/b3.json"), Seq(
      row(1, 8.0, 11, "purchase"),
      row(4, 9.0, 12, "signup"), row(4, 9.5, 13, "click"),
      row(4, 9.9, 14, "purchase")).mkString("", "\n", "\n"))
    StreamFunnel.run(spark, evd, s"$dir/out", s"$dir/ckpt", steps,
      windowMicros = 2 * H, maxFilesPerTrigger = Some(1))
    val log2 = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(log2.length == log.length + 3 &&
      log2.groupBy(l => (l._1, l._2)).forall(_._2.length == 1),
      s"restart must append exactly u4's three levels, no re-emits: ${log2.toSeq}")
    assert(log2.toSet -- log.toSet == Set(
      (4L, 1L, "signup", (9.0 * H).toLong), (4L, 2L, "click", (9.5 * H).toLong),
      (4L, 3L, "purchase", (9.9 * H).toLong)), s"log2: ${log2.toSeq}")
    // kernel guard: a batch of only non-step events must not ALLOCATE
    // state for the key (catalog-wide streams are mostly noise relative
    // to any one funnel — per-user state must track funnel entrants only)
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val s0 = TestGroupState.create[StreamFunnel.FunnelState](
      Optional.empty[StreamFunnel.FunnelState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, Optional.empty[Long](), false)
    val none = StreamFunnel.update(steps, 2 * H)(9L,
      Iterator(StreamFunnel.Ev(9L, 100L, 1L, "view")), s0).toSeq
    assert(none.isEmpty && !s0.exists && !s0.isUpdated,
      "noise-only batch must neither emit nor allocate state")
  }

  test("StreamResample end-to-end: validity range + watermark keep a corrupt feed serving") {
    import graft.streaming.StreamResample
    val hour = 3600L * 1000000L
    val dir = tmp(); val obs = s"$dir/obs"; new java.io.File(obs).mkdirs()
    def h(n: Long) = n * hour + 60L
    // batch 1: key 1 establishes hours 0-2 (watermark after this batch =
    // 2h - 1h = 1h > 0, arming the anchor for later batches)
    Files.writeString(java.nio.file.Paths.get(s"$obs/b1.json"),
      s"""{"key":1,"ts_micros":${h(0)},"event_id":1,"value":1.0}
         |{"key":1,"ts_micros":${h(1)},"event_id":2,"value":2.0}
         |{"key":1,"ts_micros":${h(2)},"event_id":3,"value":3.0}
         |""".stripMargin)
    // batch 2: key 1 advances; key 2 arrives ONLY as corrupt garbage — a
    // far-future timestamp that, unfiltered, would drag the watermark to
    // ~hour 5e6 and make Spark expire every later legitimate event
    // (state heals can't fix an upstream watermark), plus a pre-epoch
    // one. Both sit outside the declared valid range -> dropped at the
    // source, before withWatermark ever sees them.
    Files.writeString(java.nio.file.Paths.get(s"$obs/b2.json"),
      s"""{"key":1,"ts_micros":${h(3)},"event_id":4,"value":4.0}
         |{"key":2,"ts_micros":${5000000L * hour},"event_id":90,"value":9.9}
         |{"key":2,"ts_micros":${-5000L * hour},"event_id":91,"value":9.9}
         |""".stripMargin)
    // batch 3: the stream must still be serving — key 1 closes hour 3,
    // key 2 starts fresh at a plausible hour
    Files.writeString(java.nio.file.Paths.get(s"$obs/b3.json"),
      s"""{"key":1,"ts_micros":${h(4)},"event_id":5,"value":5.0}
         |{"key":2,"ts_micros":${h(3)},"event_id":92,"value":7.0}
         |""".stripMargin)
    // pin distinct mtimes: the file source orders batches by timestamp,
    // and three quick writes can land in one clock tick — batch ORDER is
    // the point of this test (b1's rows must precede b2's watermark)
    val now = System.currentTimeMillis()
    Seq("b1.json" -> 3, "b2.json" -> 2, "b3.json" -> 1).foreach { case (f, back) =>
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(s"$obs/$f"),
        java.nio.file.attribute.FileTime.fromMillis(now - back * 60000L))
    }
    StreamResample.run(spark, obs, s"$dir/out", s"$dir/ckpt", hour,
      maxFilesPerTrigger = Some(1), watermarkDelay = Some("1 hour"),
      validRangeMicros = Some((0L, 100L * hour)))
    val nBatches = new java.io.File(s"$dir/ckpt/offsets").list()
      .count(!_.startsWith("."))
    assert(nBatches >= 3, s"expected >=3 micro-batches, got $nBatches")
    val streamed = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // every legitimate closed bucket survives the corrupt feed; the
    // garbage contributes NOTHING (no rows, no dropped-live-event holes)
    assert(streamed == Set(
      (1L, 0L, 1L, 1.0), (1L, 1L, 1L, 2.0), (1L, 2L, 1L, 3.0),
      (1L, 3L, 1L, 4.0)), s"streamed: $streamed")
  }

  test("StreamResample drops a corrupt far-future event instead of flooding gap rows") {
    import graft.streaming.StreamResample
    import graft.streaming.StreamResample.{Obs, OpenBucket}
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    def state(b: Long) = TestGroupState.create[OpenBucket](
      Optional.of(OpenBucket(b, b * 100L, 1L, 1.0, 1L)),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, Optional.empty[Long](), false)
    // jump beyond the cap: dropped — no output, open bucket unchanged
    val s1 = state(5L)
    val out1 = StreamResample.update(1L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, 5000L, 9L, 2.0)), s1).toSeq
    assert(out1.isEmpty, s"far-future event must emit nothing, got $out1")
    assert(s1.get.bucket == 5L, "open bucket must survive the drop")
    // jump inside the cap: normal close + bounded gap fill
    val s2 = state(5L)
    val out2 = StreamResample.update(1L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, 8L, 9L, 2.0)), s2).toSeq
    assert(out2.map(o => (o.bucket, o.n_obs)) == Seq((5L, 1L), (6L, 0L), (7L, 0L)))
    assert(s2.get.bucket == 8L)
    // corrupt FIRST event for a key: the init path can't gauge it (no
    // prior state), so the open bucket itself is poisoned far-future.
    // Without a watermark anchor, HealConsensus (3) mutually-consistent
    // live events out-vote it: the poisoned bucket is discarded
    // UNEMITTED, state re-opens at the quorum event, and from there the
    // key streams normally (event 10 closes bucket 9 the ordinary way).
    val s3 = state(5000000L)
    val out3 = StreamResample.update(1L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, 7L, 9L, 2.0), Obs(1L, 8L, 10L, 3.0),
        Obs(1L, 9L, 11L, 4.0), Obs(1L, 10L, 12L, 5.0)), s3).toSeq
    assert(out3.map(o => (o.bucket, o.n_obs)) == Seq((9L, 1L)),
      s"consensus heal must re-open at the quorum event and emit " +
        s"nothing corrupt, got $out3")
    assert(s3.get.bucket == 10L, "post-heal state must track the live events")
    // ONE corrupt far-PAST event against a HEALTHY key must NOT trigger
    // the backward heal (that would poison the state and strand every
    // later live event behind the forward guard): it is dropped, opens a
    // candidacy, and the next plausible near event cancels the candidacy
    val s3b = state(5L)
    val out3b = StreamResample.update(1L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, -5000000L, 13L, 9.9), Obs(1L, 6L, 14L, 2.0)),
      s3b).toSeq
    assert(out3b.map(o => (o.bucket, o.n_obs)) == Seq((5L, 1L)),
      s"healthy key must survive one corrupt far-past event, got $out3b")
    assert(s3b.get.bucket == 6L && s3b.get.candCount == 0,
      s"candidacy must be cancelled by the plausible event: ${s3b.get}")
    // and a lone corrupt event (no follow-up) leaves the open bucket
    // untouched with only a pending candidacy persisted
    val s3c = state(5L)
    val out3c = StreamResample.update(1L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, -5000000L, 15L, 9.9)), s3c).toSeq
    assert(out3c.isEmpty && s3c.get.bucket == 5L && s3c.get.candCount == 1,
      s"lone far-past event: drop + candidacy only, got $out3c / ${s3c.get}")
    // overflow pair: pre-epoch open bucket + far-future event — the
    // distance overflows Long; a sign-flip past the guard would re-open
    // the unbounded gap loop the cap exists to stop
    val s4 = state(Long.MinValue / 2)
    val out4 = StreamResample.update(1L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, Long.MaxValue / 2, 9L, 2.0)), s4).toSeq
    assert(out4.isEmpty, "overflowing forward jump must still be dropped")
    assert(s4.get.bucket == Long.MinValue / 2)
  }

  test("StreamResample watermark anchor arbitrates far jumps in one event") {
    import graft.streaming.StreamResample
    import graft.streaming.StreamResample.{Obs, OpenBucket}
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    // bucketMicros=1000 so watermarkMs=5 → watermark bucket 5; keep all
    // live traffic within maxGapBuckets=10 of that anchor
    def state(b: Long, wmMs: Long) = TestGroupState.create[OpenBucket](
      Optional.of(OpenBucket(b, b * 1000L, 1L, 1.0, 1L)),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, Optional.of(wmMs), false)
    // 1) corrupt far-future STATE + plausible event: backward heal on
    //    the FIRST event (no consensus wait) — poisoned bucket discarded
    //    unemitted, state re-opens at the event
    val s1 = state(5000000L, wmMs = 5L)
    val out1 = StreamResample.update(1000L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, 6000L, 2L, 2.0)), s1).toSeq
    assert(out1.isEmpty && s1.get.bucket == 6L,
      s"anchor backward heal must be immediate: $out1 / ${s1.get}")
    // 2) healthy state + corrupt far-past EVENT: dropped, state intact —
    //    the anchor proves the event is the corrupt side
    val s2 = state(5L, wmMs = 5L)
    val out2 = StreamResample.update(1000L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, -9000000L, 3L, 9.9), Obs(1L, 7000L, 4L, 2.0)),
      s2).toSeq
    assert(out2.map(o => (o.bucket, o.n_obs)) == Seq((5L, 1L), (6L, 0L)),
      s"anchor must protect a healthy key from a corrupt event: $out2")
    assert(s2.get.bucket == 7L)
    // 3) stale far-PAST state (corrupt first event installed it before a
    //    watermark existed) + plausible event: forward heal EMITS the
    //    stale bucket (it lies in the key's past — may be legit pre-idle
    //    data) with no gap fill, then re-opens at the live event
    val s3 = state(-8000000L, wmMs = 5L)
    val out3 = StreamResample.update(1000L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, 6000L, 5L, 2.0)), s3).toSeq
    assert(out3.map(o => (o.bucket, o.n_obs)) == Seq((-8000000L, 1L)),
      s"forward heal must close the stale bucket, no gap fill: $out3")
    assert(s3.get.bucket == 6L)
    // 4) BOTH sides implausible vs the anchor: drop the event AND clear
    //    the state — nothing trustworthy remains for the key
    val s4 = state(5000000L, wmMs = 5L)
    val out4 = StreamResample.update(1000L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, -9000000L, 6L, 9.9)), s4).toSeq
    assert(out4.isEmpty && !s4.exists,
      s"both-corrupt must clear state and emit nothing: $out4")
    // 5) init path: a corrupt FIRST event can't even install state when
    //    an anchor exists
    val s5 = TestGroupState.create[OpenBucket](Optional.empty[OpenBucket](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, Optional.of(5L), false)
    val out5 = StreamResample.update(1000L, maxGapBuckets = 10L)(
      1L, Iterator(Obs(1L, 5000000000L, 7L, 9.9), Obs(1L, 6000L, 8L, 2.0)),
      s5).toSeq
    assert(out5.isEmpty && s5.get.bucket == 6L,
      s"anchored init must reject the corrupt event, open at the live " +
        s"one: $out5 / ${s5.get}")
  }

  test("streaming near-dup ingest: each micro-batch dedupes against the stored corpus (extension)") {
    import org.apache.spark.sql.types._
    val dir = tmp(); val log = s"$dir/docs"; new java.io.File(log).mkdirs()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // the stored corpus: two documents with distinctive shingle sets
    val stored = { import spark.implicits._
      Seq((1L, "the quick brown fox jumps over the lazy sleeping dog tonight"),
        (2L, "completely different content about the distributed query engines that power modern analytics"))
        .toDF("doc_id", "text") }
    // stream: an exact copy of doc 1, a near-copy of doc 2 (final word
    // changed — high enough Jaccard for the banded LSH), and a fresh doc
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"doc_id":100,"text":"the quick brown fox jumps over the lazy sleeping dog tonight"}
        |{"doc_id":101,"text":"completely different content about the distributed query engines that power modern pipelines"}
        |{"doc_id":102,"text":"nothing like either stored document in any way at all"}
        |""".stripMargin)
    val hits = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long, String)]())
    val q = spark.readStream.schema(schema).json(log)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // the BATCH operator applied verbatim per micro-batch — matches
        // arrive keyed to the stored corpus's ids
        graft.ext.Dedup.dedupeAgainstStored(stored, b, minJaccard = 0.5)
          .collect().foreach(r =>
            hits.add((r.getLong(0), r.getLong(1), r.getString(2)))); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = { import scala.jdk.CollectionConverters._; hits.asScala.toSet }
    assert(got.exists(h => h._1 == 100L && h._2 == 1L && h._3 == "exact"), got.toString)
    assert(got.exists(h => h._1 == 101L && h._2 == 2L && h._3 == "near"), got.toString)
    assert(!got.exists(_._1 == 102L), got.toString)
  }

  test("ST5: DLQ splits invalid rows without losing them") {
    import spark.implicits._
    val batch = Seq((1L, "insert", "a", """{"k":1}"""), (2L, "insert", "b", "not json"))
      .toDF("seq", "op", "key", "doc")
    val (ok, dlq) = Ingest.withDlq(batch, get_json_object(col("doc"), "$.k").isNotNull)
    assert(ok.count() == 1 && dlq.count() == 1)
    assert(dlq.select("key").head().getString(0) == "b")
    // NULL-predicate rows (e.g. a missing op) must land in the DLQ, not
    // vanish from both sides: applied + dlq PARTITIONS the batch
    val nulls = Seq((1L, "insert", "a", "x"), (2L, null, "b", "y"), (3L, "zap", "c", "z"))
      .toDF("seq", "op", "key", "doc")
    val (ok2, dlq2) = Ingest.withDlq(nulls, col("op").isin("insert", "update", "delete"))
    assert(ok2.count() == 1 && dlq2.count() == 2, "no row may be lost on a NULL predicate")
    assert(dlq2.select("key").collect().map(_.getString(0)).toSet == Set("b", "c"))
  }
}
