package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Disk layer under the shared-artifact memos: derived relations
  * (shingle/signature/gram tables, postings, shredded node tables,
  * assembled documents) and learned models (IVF centroids, PQ codebooks,
  * BPE merges, unigram vocabularies) persist as parquet / serialized
  * blobs under a CORPUS-VERSION KEY, so a fresh JVM faults them in from
  * storage instead of re-deriving them from the corpus. This is the
  * local stand-in for the stored-index contract SCALE.md claims: at
  * 100 TB these are tables beside the corpus, written once per corpus
  * version and read by every workload; locally they live under a temp
  * root and cut the cold-start cost of every query that shares an
  * artifact.
  *
  * Keying — what makes a stale read impossible:
  *  - the memo TAG (operator + parameters, length-prefixed collision-proof
  *    via [[PlanMemo.tag]]);
  *  - the CANONICALIZED logical plan string + semantic hash of every
  *    input relation (captures schema, expressions, literals, paths);
  *  - a FINGERPRINT of every underlying file: path, length, modification
  *    time — a regenerated fixture at the same path changes the key.
  *    CAVEAT: mtime resolution is filesystem-dependent (1 s on ext3/
  *    HFS+, 100 ns on ext4/XFS/APFS); a fixture regenerated to the SAME
  *    byte length within the same mtime tick would keep its key. That
  *    window is practically unreachable for parquet regens (row-group
  *    ordering, compression and encoder state make same-length output
  *    vanishingly rare, and this engine's fixtures regen between JVMs,
  *    not within a tick) — a deployment on a coarse-mtime filesystem
  *    that rewrites fixtures in place should add a content etag to the
  *    fingerprint instead;
  *  - a code-version salt, bumped when a memoized builder's semantics
  *    change in a way the output plan key cannot see.
  *
  * Writes are atomic (write to a tmp dir/file, rename into place); a
  * concurrent identical writer loses the rename and adopts the winner's
  * artifact — safe because keys are content-derived and builders are
  * deterministic. Failures (unserializable model, unwritable dir) degrade
  * to memory-only memoization, never to an error.
  *
  * Disabled under `-Dgraft.disk.memo=0` (or env `GRAFT_DISK_MEMO=0`);
  * the test suite pins it OFF globally so plan-shape assertions stay
  * deterministic, and ArtifactStoreSpec re-enables it locally. */
object ArtifactStore {

  /** Bump when a memoized builder changes semantics invisibly to the key. */
  private val CodeSalt = "graft-artifacts-v1"

  def enabled: Boolean =
    System.getProperty("graft.disk.memo",
      sys.env.getOrElse("GRAFT_DISK_MEMO", "1")) != "0"

  /** Store failures that silently degraded to memory-only memoization
    * (unwritable dir, torn commit, unreadable artifact, unserializable
    * model). Degrading is the right production behavior — the build is
    * always correct — but a degraded BENCH run re-pays derivations the
    * record claims are stored, so Bench stamps this next to
    * `evicted_blocks` (the [[graft.sources.Lake.degradeEvents]]
    * contract: degrade loudly, machine-checkably). */
  val degradeEvents = new java.util.concurrent.atomic.AtomicLong

  private def root: java.nio.file.Path =
    java.nio.file.Paths.get(System.getProperty("graft.artifacts.dir",
      sys.env.getOrElse("GRAFT_ARTIFACT_DIR",
        s"${System.getProperty("java.io.tmpdir")}/graft_artifacts")))

  // ---- retention ------------------------------------------------------
  // Content keys mean a corpus-version bump ORPHANS every old artifact
  // (nothing ever asks for the old key again); without retention the
  // store grows monotonically across fixture regens / code-salt bumps.
  // Policy: reads touch their entry's mtime (LRU clock), and a sweep —
  // run once per JVM before the first store access — deletes (1) torn
  // `_tmp_*` leftovers from crashed writers older than one hour, (2)
  // committed entries older than the TTL, then (3) oldest entries first
  // until the store fits the size cap. Eviction is only ever a cache
  // miss: the next request rebuilds and recommits. Deleting an entry a
  // concurrent reader has open is a non-issue for this engine's
  // sequential drivers; a shared cluster store would gate the sweep on
  // a coordinator lease instead.

  private def propMillis(prop: String, defaultMillis: Long): Long =
    try System.getProperty(prop, defaultMillis.toString).toLong
    catch { case _: NumberFormatException => defaultMillis }

  private[graft] def ttlMillis: Long =
    propMillis("graft.artifacts.ttl.ms", 7L * 24 * 3600 * 1000)
  private[graft] def maxBytes: Long =
    propMillis("graft.artifacts.max.bytes", 8L * 1024 * 1024 * 1024)

  private val sweptOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def entrySize(p: java.nio.file.Path): Long = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => try java.nio.file.Files.size(f) catch { case _: Exception => 0L })
        .sum
    else try java.nio.file.Files.size(p) catch { case _: Exception => 0L }
  }

  private def deleteEntry(p: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.isDirectory(p))
        org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
      else java.nio.file.Files.deleteIfExists(p)
    } catch { case _: Exception => () }

  /** LRU touch: a served artifact is recent, whatever its commit time. */
  private def touch(p: java.nio.file.Path): Unit =
    try java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Exception => () }

  /** Apply the retention policy now (also called lazily, once per JVM).
    * Safe on a missing/empty root; every IO failure degrades to keeping
    * the entry. */
  def sweep(ttlMs: Long = ttlMillis, capBytes: Long = maxBytes): Unit = {
    import scala.jdk.CollectionConverters._
    val r = root
    if (!java.nio.file.Files.isDirectory(r)) return
    val now = System.currentTimeMillis()
    val entries = java.nio.file.Files.list(r).iterator().asScala.toList
    def mtime(p: java.nio.file.Path): Long =
      try java.nio.file.Files.getLastModifiedTime(p).toMillis
      catch { case _: Exception => 0L }
    val (tmps, committed) = entries.partition(_.getFileName.toString.startsWith("_tmp_"))
    tmps.filter(now - mtime(_) > 3600 * 1000L).foreach(deleteEntry)
    val (expired, live) = committed.partition(now - mtime(_) > ttlMs)
    expired.foreach(deleteEntry)
    val sized = live.map(p => (p, entrySize(p), mtime(p))).sortBy(_._3) // oldest first
    var excess = sized.map(_._2).sum - capBytes
    sized.iterator.takeWhile(_ => excess > 0).foreach { case (p, sz, _) =>
      deleteEntry(p); excess -= sz
    }
  }

  private def sweepIfFirst(): Unit =
    if (sweptOnce.compareAndSet(false, true))
      try sweep() catch { case _: Exception => () }

  // ---- chain-stable keying --------------------------------------------
  // A derived artifact's input is often ITSELF an artifact. Hashing the
  // input's CURRENT plan makes the downstream key session-dependent: the
  // building JVM sees the computed plan, a fresh JVM sees the
  // parquet-read-of-artifact plan, so chained artifacts (kmvItems over
  // the shingle table, signature tables over shingles) could never
  // disk-hit across the build/fault boundary — each fresh JVM re-paid
  // one derivation per chain link. The registry below maps a served or
  // just-built artifact's canonical plan to its CONTENT KEY; dfKey
  // substitutes `artifact:<key>` for any registered input, making the
  // downstream key identical in both JVMs. Entries are validated against
  // the input's current leaf-file stats before use, so an in-place
  // fixture regen within one JVM cannot serve a stale chain key.
  private val artifactKeys = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    (String, String)]() // canonical plan -> (content key, leaf fingerprint)

  // ---- same-JVM key stability -----------------------------------------
  // A SELF-memoized artifact (memo input == build output — the co-purchase
  // edge table, the assembled-docs pattern) resolves its FIRST key from
  // plan+stats, and then its own build registers the frame in
  // artifactKeys. Every later resolution in the same JVM would take the
  // `artifact:<key>` substitution instead and land on a DIFFERENT key —
  // so a cache sweep between the build and the next request (exactly
  // Bench's artifact-pass → timed-phase boundary) re-derived the artifact
  // and, worse, every artifact chained on it (round 13: x_pagerank_delta's
  // 21 s "cold rep" was the base-rank chain rebuilding under a drifted
  // key, not the refresh under test). The pin below maps the RAW digest
  // (tag + canonical plans + leaf stats, no substitution — deterministic
  // for a reconstructed plan) to the first resolved final key, so a JVM
  // always re-resolves the same key. Staleness is impossible: the raw
  // digest includes every leaf file's length+mtime, so a fixture regen
  // changes the raw digest and the pin simply never matches again. A
  // fresh JVM either reconstructs the same computed plan (same raw digest
  // → same first-resolution key) or holds the parquet-read form of the
  // artifact (registered at read → substitution path) — both land on the
  // committed key, so cross-JVM behavior is unchanged.
  private val resolvedKeys =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Sorted `path|len|mtime` stats of every file under the plan's leaf
    * relations — the freshness component of every content key. Throws on
    * a stat failure (callers catch and decline to key). */
  private def leafStats(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val files = plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten.sorted
    files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f|${st.getLen}|${st.getModificationTime}"
    }
  }

  private def fingerprint(stats: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    stats.foreach(s => { md.update(s.getBytes("UTF-8")); md.update(0.toByte) })
    md.digest().map("%02x".format(_)).mkString
  }

  /** Record that `df` IS the artifact committed/served under `key`, so
    * downstream dfKey calls can key on the artifact's identity instead
    * of whichever plan form this session happens to hold. Failures (a
    * vanished file mid-stat) simply skip registration — downstream keys
    * then fall back to plan hashing, which is correct, just not
    * chain-stable. */
  private def register(df: DataFrame, key: String): Unit =
    try artifactKeys.put(df.queryExecution.analyzed.canonicalized,
      (key, fingerprint(leafStats(df))))
    catch { case _: Exception => () }

  /** Content key for a derived relation: tag + per input either the
    * input's own ARTIFACT key (chain-stable, see [[artifactKeys]]) or
    * its canonical plan + underlying-file stats. Returns None when any
    * input's files cannot be statted (a vanished scratch dir) — no disk
    * entry then. */
  def dfKey(tag: String, inputs: Seq[DataFrame]): Option[String] = {
    // disabled store: skip the whole canonicalize+stat+MD5 pass — every
    // memo miss in the (store-off) test suite would otherwise pay it
    // just for getOrBuildDf/getOrTrain to discard the key
    if (!enabled) return None
    val rawMd = java.security.MessageDigest.getInstance("MD5")
    val subMd = java.security.MessageDigest.getInstance("MD5")
    def upd(m: java.security.MessageDigest, s: String): Unit = {
      m.update(s.getBytes("UTF-8")); m.update(0.toByte)
    }
    Seq(rawMd, subMd).foreach { m => upd(m, CodeSalt); upd(m, tag) }
    try {
      inputs.foreach { df =>
        val stats = leafStats(df)
        val plan = df.queryExecution.analyzed
        // raw digest: always plan+stats — the substitution-free identity
        // of this request, stable across re-resolutions within a JVM
        upd(rawMd, plan.canonicalized.toString)
        upd(rawMd, plan.semanticHash().toString)
        stats.foreach(upd(rawMd, _))
        artifactKeys.get(plan.canonicalized) match {
          case (k, fp) if fp == fingerprint(stats) => upd(subMd, s"artifact:$k")
          case _ =>
            upd(subMd, plan.canonicalized.toString)
            upd(subMd, plan.semanticHash().toString)
            stats.foreach(upd(subMd, _))
        }
      }
      val raw = rawMd.digest().map("%02x".format(_)).mkString
      val sub = subMd.digest().map("%02x".format(_)).mkString
      // first resolution for this raw identity wins and is pinned — see
      // the resolvedKeys note above
      resolvedKeys.putIfAbsent(raw, sub)
      Some(resolvedKeys.get(raw))
    } catch { case _: Exception => None }
  }

  /** Load the relation for `key` if a committed artifact exists, else
    * build it and commit it. The BUILD path returns the builder's own
    * frame (plan shapes within the building session are unchanged); only
    * a later session reads the parquet-backed form — which is exactly
    * the stored-table behavior at scale. */
  def getOrBuildDf(spark: SparkSession, key: Option[String])
                  (build: => DataFrame): DataFrame =
    key.filter(_ => enabled) match {
      case None => build
      case Some(k) =>
        sweepIfFirst()
        val dir = root.resolve(s"df_$k")
        if (java.nio.file.Files.exists(dir.resolve("_SUCCESS")))
          // touch only AFTER the read validates (the schema/footer pass
          // runs eagerly here): touching first would TTL-refresh a
          // corrupt entry on every attempt, making it immortal
          try { val df = spark.read.parquet(dir.toString); touch(dir)
                register(df, k); return df }
          catch { case _: Exception =>
            // unreadable artifact: remove it so the rebuild's atomic
            // rename can land — leaving it would fail every future
            // commit (target exists) and re-pay the build per JVM forever
            degradeEvents.incrementAndGet()
            deleteEntry(dir)
          }
        val built = build
        try {
          val tmp = root.resolve(s"_tmp_df_${k}_${java.util.UUID.randomUUID()}")
          java.nio.file.Files.createDirectories(root)
          built.write.mode("overwrite").parquet(tmp.toString)
          try java.nio.file.Files.move(tmp, dir,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: Exception => // lost the race or target exists: adopt
            org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile); ()
          }
        } catch { case _: Exception => degradeEvents.incrementAndGet() }
        // register the BUILT form too: the building session hands this
        // computed frame to downstream memos, whose keys must agree with
        // the parquet-read form a fresh JVM will hand them
        register(built, k)
        built
    }

  /** Model (driver-metadata) variant: java-serialized blob per key. */
  def getOrTrain[T <: AnyRef](key: Option[String])(train: => T): T =
    key.filter(_ => enabled) match {
      case None => train
      case Some(k) =>
        sweepIfFirst()
        val f = root.resolve(s"model_$k.bin")
        if (java.nio.file.Files.exists(f)) {
          try {
            val in = new java.io.ObjectInputStream(
              java.nio.file.Files.newInputStream(f))
            try { val m = in.readObject().asInstanceOf[T]; touch(f); return m }
            finally in.close()
          } catch { case _: Exception => () } // unreadable/stale class: retrain
        }
        val trained = train
        try {
          java.nio.file.Files.createDirectories(root)
          val tmp = root.resolve(s"_tmp_model_${k}_${java.util.UUID.randomUUID()}.bin")
          val out = new java.io.ObjectOutputStream(
            java.nio.file.Files.newOutputStream(tmp))
          try out.writeObject(trained) finally out.close()
          try java.nio.file.Files.move(tmp, f,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: Exception =>
            java.nio.file.Files.deleteIfExists(tmp); ()
          }
        } catch { case _: Exception => degradeEvents.incrementAndGet() }
        trained
    }
}
