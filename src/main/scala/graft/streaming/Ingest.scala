package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** ST1–ST5 — the async indexing pipeline as Structured Streaming.
  *
  * The reference publishes `{doc, type: insert|update}` messages to
  * RabbitMQ (`/root/reference/src/utils/rabbitMq.ts:5-17,34-42`), consumes
  * them with manual ack (`:92-115`, at-least-once), applies each by
  * re-shredding into ES (`:50-91`), and makes writes read-your-writes by
  * polling every 200 ms until the doc is visible
  * (`apiLogicForCRUD.ts:17-58`). Structured Streaming gives each piece a
  * principled replacement:
  *
  *  - changelog rows `(seq, op, key, doc)` in a streaming source (files
  *    locally; Kafka in production) — ST1;
  *  - `foreachBatch` + checkpointing ≡ consume + manual ack: a batch is
  *    reprocessed on failure, never lost — at-least-once — ST2;
  *  - the batch apply is an idempotent last-writer-wins upsert keyed by
  *    `key` ordered by `seq`, so at-least-once replay converges — exactly
  *    why the reference's silent-retry design is sound (README v2
  *    updates) — ST3/ST5;
  *  - `Trigger.AvailableNow` / `processAllAvailable()` is a real barrier
  *    replacing the 200 ms poll loop — ST4.
  */
object Ingest {

  val changelogSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("op", StringType, nullable = false), // insert | update | delete
    StructField("key", StringType, nullable = false),
    StructField("doc", StringType)))

  /** ST3 kernel — apply a (micro-)batch of changelog rows to the current
    * state: last event per key wins (by `seq`), deletes drop the key.
    * Pure function of (state, batch) → state; idempotent under replay of
    * any suffix of the log, which is what makes at-least-once delivery
    * converge. Rows whose `op` is not one of insert/update/delete
    * (including NULL — PERMISSIVE JSON reads don't enforce the schema's
    * nullability) are ignored entirely; without the filter such a row's
    * key would be anti-joined out of state but re-added by neither branch:
    * a silent delete. PRECONDITION: per-key seq order must hold across
    * batches (true for a replayed file log and for Kafka with key-hash
    * partitioning); the state carries no seq, so a stale event surfacing
    * in a LATER batch would win — [[applyBatchVersioned]] (used by
    * [[run]]) and [[StatefulKv]] carry the seq and tolerate cross-batch
    * disorder. */
  def applyBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    // seq desc picks the latest; the trailing terms make a genuine equal-seq
    // collision deterministic (deletes beat updates, then doc order) instead
    // of leaving the winner to shuffle arrival order
    val w = Window.partitionBy(col("key"))
      .orderBy(col("seq").desc, (col("op") === "delete").desc, col("doc").desc_nulls_last)
    val latest = batch.where(col("op").isin("insert", "update", "delete"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val upserts = latest.where(col("op") =!= "delete").select("key", "doc")
    val deletes = latest.where(col("op") === "delete").select("key")
    state.join(latest.select("key"), Seq("key"), "left_anti") // untouched keys
      .unionByName(upserts)
      .join(deletes, Seq("key"), "left_anti")
  }

  /** ST3 kernel, versioned form: state rows carry `(key, doc, seq,
    * deleted)` and the higher seq wins between state and batch, so a stale
    * event arriving in a LATER micro-batch (late file, out-of-order Kafka
    * partition) cannot regress a newer write. Deletes persist as
    * tombstones — the seq fence against a stale pre-delete update
    * resurrecting the key; [[compact]] ages them out once the source's
    * reordering horizon has passed their seq. */
  def applyBatchVersioned(state: DataFrame, batch: DataFrame): DataFrame =
    latestPerKey(state.unionByName(batchLatest(batch)))

  /** Time-travel read: the store's visible state AS OF `asOfSeq` — the
    * MVCC view the versioned changelog (and the LSM store's seq+tombstone
    * rows) supports for free. One seq-range filter (pushes to the scan;
    * prunes whole files when the log is written in seq-ordered chunks,
    * which [[run]]'s append sink produces) plus the one key-keyed window
    * shuffle. Equal-seq collisions resolve exactly as [[applyBatch]]
    * does, so `snapshotAt(log, max(seq))` ≡ replaying the whole log. */
  def snapshotAt(changelog: DataFrame, asOfSeq: Long): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("seq").desc, (col("op") === "delete").desc, col("doc").desc_nulls_last)
    changelog
      .where(col("seq") <= asOfSeq && col("op").isin("insert", "update", "delete"))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .where(col("op") =!= "delete")
      .select("key", "doc")
  }

  /** CDC between two snapshot points: every key whose visible value
    * differs between `seqA` and `seqB` (> seqA), classified
    * added/updated/deleted. Composed from two [[snapshotAt]] views over
    * the same key-partitioned window — Catalyst reuses the exchange — and
    * a full outer join; unchanged keys (the overwhelming majority between
    * nearby snapshots) drop out before anything downstream. */
  def snapshotDiff(changelog: DataFrame, seqA: Long, seqB: Long): DataFrame = {
    val a = snapshotAt(changelog, seqA).withColumnRenamed("doc", "doc_before")
    val b = snapshotAt(changelog, seqB).withColumnRenamed("doc", "doc_after")
    a.join(b, Seq("key"), "full_outer")
      .where(!(col("doc_before") <=> col("doc_after")))
      .select(col("key"),
        when(col("doc_before").isNull, "added")
          .when(col("doc_after").isNull, "deleted")
          .otherwise("updated").as("change"),
        col("doc_before"), col("doc_after"))
  }

  /** SCD2 history view: every non-delete changelog event becomes a
    * VERSION row `(key, doc, valid_from_seq, valid_to_seq, is_current)`
    * whose validity interval runs from its own seq to the next event on
    * that key (any op — an update supersedes, a delete terminates), open
    * (`NULL`, `is_current`) when nothing followed. This is the
    * slowly-changing-dimension type-2 form of the same log
    * [[snapshotAt]] reads: `snapshotAt(log, s)` ≡ the rows here with
    * `valid_from_seq <= s < coalesce(valid_to_seq, ∞)`, so a
    * point-in-time join against the store is a single range predicate on
    * this relation instead of a per-probe log replay — the shape a
    * training-data pipeline needs to join features "as of" each example's
    * snapshot without leakage.
    *
    * One shuffle (the key-keyed window), no join; at 100 TB the relation
    * is incrementally maintainable — a new chunk only rewrites the
    * still-open rows of keys it touches. Equal-seq collisions order by
    * the same (delete-first, doc) tiebreak as [[applyBatch]], so the
    * surviving interval chain matches what replay would make visible. */
  def scd2History(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("seq"), (col("op") === "delete"), col("doc").asc_nulls_first)
    changelog.where(col("op").isin("insert", "update", "delete"))
      .withColumn("valid_to_seq", lead(col("seq"), 1).over(w))
      .where(col("op") =!= "delete")
      .select(col("key"), col("doc"), col("seq").as("valid_from_seq"),
        col("valid_to_seq"), col("valid_to_seq").isNull.as("is_current"))
  }

  /** Incremental maintenance of the [[scd2History]] relation: fold a new
    * log `chunk` into a stored interval table, rewriting ONLY the touched
    * keys' rows. Closed intervals are immutable by construction (their
    * `valid_to_seq` was fixed by an event that already happened), so the
    * merge is: pass untouched keys through; keep touched keys' closed
    * rows; re-enter each touched key's OPEN row into the fold as a
    * pseudo-event at its own `valid_from_seq` alongside the chunk's
    * events; rebuild just that sliver with [[scd2History]].
    *
    * PRECONDITION (log-append order): a genuinely NEW chunk's seqs
    * exceed every seq already folded into `history` (the same per-key
    * monotonicity [[applyBatch]] requires) — but an at-least-once
    * REDELIVERY of an already-folded chunk is tolerated: each key's
    * already-applied fence (the max event seq its interval rows record —
    * a closed row's `valid_to_seq` IS the closing event's seq, an open
    * row's `valid_from_seq` its opening one) drops replayed events
    * before the rebuild, so merge is idempotent like the kernels it sits
    * beside. The touched-key set is batch-sized, so the pruning joins
    * broadcast and the stored base relation never shuffles; the rebuild
    * input is O(batch + touched open rows). StreamingSpec proves
    * merge(history(prefix), suffix) == history(all) at every split point
    * and that re-merging a chunk is a no-op. */
  def scd2Merge(history: DataFrame, chunk: DataFrame): DataFrame = {
    val raw = chunk.where(col("op").isin("insert", "update", "delete"))
      .select("seq", "op", "key", "doc")
    // fence only the CHUNK's keys: the broadcast semi-join prunes the
    // base relation before any aggregation, so the groupBy shuffles
    // O(touched) rows, never the stored history
    val fence = history.join(raw.select("key").distinct(), Seq("key"), "left_semi")
      .groupBy("key")
      .agg(max(coalesce(col("valid_to_seq"), col("valid_from_seq"))).as("__fence"))
    val events = raw.join(fence, Seq("key"), "left")
      .where(col("__fence").isNull || col("seq") > col("__fence"))
      .drop("__fence")
    val touched = events.select("key").distinct()
    val untouched = history.join(touched, Seq("key"), "left_anti")
    val closedKept = history.join(touched, Seq("key"), "left_semi")
      .where(!col("is_current"))
    val reopened = history.join(touched, Seq("key"), "left_semi")
      .where(col("is_current"))
      .select(col("valid_from_seq").as("seq"), lit("update").as("op"),
        col("key"), col("doc"))
    untouched.unionByName(closedKept)
      .unionByName(scd2History(reopened.unionByName(events)))
  }

  /** Point-in-time join: for each probe `(key, as_of_seq, …)`, the doc
    * visible at that seq — the leakage-free feature-join a training
    * pipeline runs against the store. One equality join on `key` (hash
    * join; broadcast when probes are batch-sized) with the interval
    * bounds as a join filter; per key the intervals are disjoint, so at
    * most one row matches and no post-join dedup is needed. Probes
    * falling where nothing is visible (before the first event, after a
    * delete) drop out — inner semantics, like a missed lookup. */
  def pointInTime(history: DataFrame, probes: DataFrame): DataFrame =
    probes.join(history,
      probes("key") === history("key") &&
        history("valid_from_seq") <= probes("as_of_seq") &&
        (history("valid_to_seq").isNull ||
          probes("as_of_seq") < history("valid_to_seq")))
      .select(probes("key"), probes("as_of_seq"), history("doc"))

  /** Materialized-view build: the grouped aggregate `(grp, n_keys,
    * sum_v)` over a store snapshot `(key, doc)` — the view
    * [[mvMaintain]] keeps fresh incrementally. `groupExpr`/`valueExpr`
    * are column expressions over the snapshot row (typically parsed out
    * of `doc`). One map-side-combinable aggregation. */
  def mvBuild(snapshot: DataFrame, groupExpr: Column, valueExpr: Column): DataFrame =
    snapshot.select(groupExpr.as("grp"), valueExpr.as("__v"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_keys"), sum(col("__v")).as("sum_v"))

  /** Incremental materialized-view maintenance: fold the changelog slice
    * `(fromSeq, toSeq]` into a stored aggregate WITHOUT rescanning the
    * store — the standard retract-then-add delta form of incremental
    * view maintenance (count/sum are self-maintainable aggregates:
    * Gupta & Mumick's IVM taxonomy). Each touched key contributes its
    * old visible row negatively and its new visible row positively;
    * untouched groups' rows pass through untouched, and a group whose
    * key count reaches zero leaves the view.
    *
    * Scale shape: `touched` is batch-sized (broadcasts), and the
    * before/after images come from the log RESTRICTED to touched keys
    * before any window runs — O(touched history), never a store scan; on
    * a stored LSM base ([[run]]'s state) the same images are per-key
    * point lookups, the incremental-dedup contract. The view itself is
    * group-cardinality-sized (bounded metadata for categorical groups);
    * the merge is one map-side-combinable aggregation over
    * view ∪ deltas. StreamingSpec proves fold-at-any-cuts == rebuild
    * and that deletes retract; the x_mv_incremental oracle replays the
    * three-cut fold against a direct aggregate over the final snapshot. */
  def mvMaintain(mv: DataFrame, changelog: DataFrame, fromSeq: Long, toSeq: Long,
                 groupExpr: Column, valueExpr: Column): DataFrame = {
    val touched = changelog
      .where(col("seq") > fromSeq && col("seq") <= toSeq)
      .where(col("op").isin("insert", "update", "delete"))
      .select("key").distinct()
    // per-key history slice first (broadcast semi-join), THEN the
    // latest-wins window: the window input is O(touched keys' history)
    val slice = changelog.join(broadcast(touched), Seq("key"), "left_semi")
    def image(cut: Long) = mvBuild(snapshotAt(slice, cut), groupExpr, valueExpr)
    val retract = image(fromSeq)
      .select(col("grp"), (-col("n_keys")).as("n_keys"), (-col("sum_v")).as("sum_v"))
    mv.unionByName(retract).unionByName(image(toSeq))
      .groupBy("grp")
      .agg(sum(col("n_keys")).as("n_keys"), sum(col("sum_v")).as("sum_v"))
      .where(col("n_keys") > 0)
  }

  /** Micro-batch form of [[mvMaintain]] for the streaming pipeline: the
    * before-images come from the STORED state `(key, doc)` — a per-key
    * probe of the batch-sized touched set, never a log replay — and the
    * after-images from the ST3 kernel applied to that slice. Runs inside
    * `foreachBatch` next to the state upsert itself (StreamingSpec
    * drives it through a real file-stream + checkpoint); same
    * retract+add delta algebra as the batch form, so the two agree on
    * any split of the same log. */
  def mvApplyBatch(mv: DataFrame, state: DataFrame, batch: DataFrame,
                   groupExpr: Column, valueExpr: Column): DataFrame = {
    val touched = batch.where(col("op").isin("insert", "update", "delete"))
      .select("key").distinct()
    val before = state.join(broadcast(touched), Seq("key"), "left_semi")
      .select("key", "doc")
    val after = applyBatch(before, batch)
    val retract = mvBuild(before, groupExpr, valueExpr)
      .select(col("grp"), (-col("n_keys")).as("n_keys"), (-col("sum_v")).as("sum_v"))
    mv.unionByName(retract).unionByName(mvBuild(after, groupExpr, valueExpr))
      .groupBy("grp")
      .agg(sum(col("n_keys")).as("n_keys"), sum(col("sum_v")).as("sum_v"))
      .where(col("n_keys") > 0)
  }

  /** Per-key winners of ONE batch, in versioned `(key, doc, seq, deleted)`
    * tombstone form. Equal-seq collisions resolve deterministically:
    * deletes win ties (then doc order), never shuffle arrival order. */
  private def batchLatest(batch: DataFrame): DataFrame = {
    val wBatch = Window.partitionBy(col("key"))
      .orderBy(col("seq").desc, (col("op") === "delete").desc, col("doc").desc_nulls_last)
    batch.where(col("op").isin("insert", "update", "delete"))
      .withColumn("__rn", row_number().over(wBatch))
      .where(col("__rn") === 1)
      .select(col("key"),
        when(col("op") === "delete", lit(null)).otherwise(col("doc")).as("doc"),
        col("seq"), (col("op") === "delete").as("deleted"))
  }

  /** Latest-wins merge of versioned rows: one winner per key by (seq desc,
    * deleted desc, doc). ASSOCIATIVE and COMMUTATIVE under the
    * deterministic tiebreak — which is what lets the store keep per-bucket
    * DELTA chains and merge them at read time in any order. */
  private def latestPerKey(versioned: DataFrame): DataFrame = {
    val wMerge = Window.partitionBy(col("key"))
      .orderBy(col("seq").desc, col("deleted").desc, col("doc").desc_nulls_last)
    versioned.withColumn("__rn", row_number().over(wMerge))
      .where(col("__rn") === 1).drop("__rn")
  }

  private val stateSchema = StructType(Seq(
    StructField("key", StringType), StructField("doc", StringType),
    StructField("seq", LongType), StructField("deleted", BooleanType)))

  /** FileSystem for `dir` resolved through the session's Hadoop conf — the
    * same abstraction Spark's own sinks use, so the versioned-state
    * protocol works unchanged on local FS, HDFS, or an object store with a
    * Hadoop connector (s3a/gs/abfs). */
  private def fsFor(spark: SparkSession, dir: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  /** Latest COMPLETE whole-state version under `stateDir` — the LEGACY
    * (pre-bucketed) layout, still read as a fallback and migrated into
    * buckets by the first bucketed batch (parquet's _SUCCESS marker is the
    * completeness witness). */
  private def latestVersion(spark: SparkSession, stateDir: String): Option[org.apache.hadoop.fs.Path] = {
    val (fs, root) = fsFor(spark, stateDir)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v") &&
        st.getPath.getName.stripPrefix("v").forall(_.isDigit) &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .sortBy(_.getPath.getName.stripPrefix("v").toLong)
      .lastOption.map(_.getPath)
  }

  // ---- bucketed state layout ----
  //
  // stateDir/
  //   b<bucket>/v<id>/    one chain link (base or delta) of bucket's rows
  //   manifest/m<id>.json {"n":…,"lastBatch":…,"buckets":{"<b>":[v,…]}}
  //
  // LSM shape: a bucket's current state is a CHAIN of versions — a base
  // plus the delta each later batch appended — merged at read time by
  // [[latestPerKey]] (order-independent under the deterministic seq
  // tiebreak). A batch therefore writes ONLY its own per-key winners,
  // partitioned by bucket: per-batch I/O is O(batch), full stop — no
  // bucket is read or rewritten on the write path. Chains longer than
  // `maxDeltas` fold back to a single base ([[foldLongChains]]), bounding
  // read amplification; [[compact]] is the full fold that also ages
  // tombstones. The cross-bucket view commits with ONE atomic manifest
  // rename; version dirs are never current until a manifest references
  // them, so rewriting an incomplete leftover is safe. Manifests carry
  // their own id sequence plus a `lastBatch` watermark: a replayed batch
  // with batchId <= lastBatch is already fully applied and skips
  // outright (idempotence), while non-batch writers (folds, compaction)
  // advance the id WITHOUT moving the watermark, so they can never be
  // mistaken for an applied batch. Bucket count and the key hash
  // (Murmur3, fixed seed) are pinned for the store's lifetime via the
  // manifest's `n`.

  private case class Manifest(id: Long, n: Int, lastBatch: Long, refs: Map[Int, Seq[Long]])

  private def manifestDir(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "manifest")

  private def parseManifest(fs: org.apache.hadoop.fs.FileSystem,
                            p: org.apache.hadoop.fs.Path, id: Long): Manifest = {
    val in = fs.open(p)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    val refs = scala.collection.mutable.Map[Int, Seq[Long]]()
    val it = node.get("buckets").fields()
    while (it.hasNext) {
      val e = it.next()
      // list = a base+delta chain; a bare number is the pre-chain format
      // (single version per bucket) read as a one-element chain
      refs(e.getKey.toInt) =
        if (e.getValue.isArray) {
          val vs = scala.collection.mutable.ArrayBuffer[Long]()
          val vit = e.getValue.elements()
          while (vit.hasNext) vs += vit.next().asLong()
          vs.toSeq
        } else Seq(e.getValue.asLong())
    }
    // manifests written before the lastBatch field used the batchId as
    // their id — reading id as the watermark is exactly right for them
    val lastBatch = Option(node.get("lastBatch")).map(_.asLong()).getOrElse(id)
    Manifest(id, node.get("n").asInt(), lastBatch, refs.toMap)
  }

  private def latestManifest(fs: org.apache.hadoop.fs.FileSystem,
                             root: org.apache.hadoop.fs.Path): Option[Manifest] = {
    val dir = manifestDir(root)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("m") && n.endsWith(".json") &&
          n.stripPrefix("m").stripSuffix(".json").forall(_.isDigit)
      }
      .map(st => (st.getPath.getName.stripPrefix("m").stripSuffix(".json").toLong, st.getPath))
      .sortBy(_._1).lastOption
      .map { case (id, p) => parseManifest(fs, p, id) }
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            root: org.apache.hadoop.fs.Path, m: Manifest): Unit = {
    val dir = manifestDir(root)
    fs.mkdirs(dir)
    val body = m.refs.toSeq.sortBy(_._1)
      .map { case (b, vs) => s""""$b":${vs.mkString("[", ",", "]")}""" }
      .mkString("{", ",", "}")
    val json = s"""{"n":${m.n},"lastBatch":${m.lastBatch},"buckets":$body}"""
    val tmp = new org.apache.hadoop.fs.Path(dir, s"_m${m.id}.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val target = new org.apache.hadoop.fs.Path(dir, s"m${m.id}.json")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"manifest commit failed: $tmp -> $target")
  }

  private def bucketPath(root: org.apache.hadoop.fs.Path, b: Int, v: Long) =
    new org.apache.hadoop.fs.Path(root, s"b$b/v$v")

  /** Read the current state table as live `(key, doc)` rows — tombstones
    * are an implementation detail of the versioned store and filtered out
    * (empty before the first batch). A version written by the pre-versioned
    * `(key, doc)` format reads `deleted` as NULL under [[stateSchema]];
    * such rows are LIVE (missing tombstone flag = not deleted) — a bare
    * `!deleted` would silently drop every legacy row. */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    readVersionedState(spark, stateDir)
      .where(coalesce(col("deleted"), lit(false)) === false).select("key", "doc")

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)

  /** Point read on the bucketed state: resolves the key's bucket from the
    * manifest (the same Murmur3 expression as the write side, folded
    * driver-side — no job) and scans ONLY that bucket's chain —
    * O(state/nBuckets) I/O instead of a full-state scan, the read-side
    * payoff of the bucketing. Falls back to a filtered [[readState]] on a
    * legacy (pre-bucketed) store. */
  def readStateKey(spark: SparkSession, stateDir: String, key: String): DataFrame = {
    val (fs, root) = fsFor(spark, stateDir)
    latestManifest(fs, root) match {
      case Some(m) =>
        // Murmur3Hash with the functions.hash default seed (42) over the
        // literal key — identical to the write side's bucket expression
        val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
            Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
              key, org.apache.spark.sql.types.StringType)))
          .eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Int]
        val b = ((h % m.n) + m.n) % m.n // pmod
        m.refs.get(b) match {
          case Some(chain) =>
            // key filter BEFORE the chain merge: the window runs over this
            // key's handful of versions, not the whole bucket
            latestPerKey(
              spark.read.schema(stateSchema)
                .parquet(chain.map(v => bucketPath(root, b, v).toString): _*)
                .where(col("key") === lit(key)))
              .where(coalesce(col("deleted"), lit(false)) === false)
              .select("key", "doc")
          case None => emptyState(spark).select("key", "doc")
        }
      case None => readState(spark, stateDir).where(col("key") === lit(key))
    }
  }

  private def readVersionedState(spark: SparkSession, stateDir: String): DataFrame = {
    val (fs, root) = fsFor(spark, stateDir)
    latestManifest(fs, root) match {
      case Some(m) if m.refs.nonEmpty =>
        // union every bucket's base+delta chain, one latest-wins merge
        latestPerKey(spark.read.schema(stateSchema).parquet(
          m.refs.toSeq.sortBy(_._1)
            .flatMap { case (b, vs) => vs.map(v => bucketPath(root, b, v).toString) }: _*))
      case Some(_) => emptyState(spark)
      case None => latestVersion(spark, stateDir) match { // legacy whole-state layout
        case Some(dir) => spark.read.schema(stateSchema).parquet(dir.toString)
        case None => emptyState(spark)
      }
    }
  }

  /** ST2+ST4 — run the changelog through a streaming query into a
    * BUCKETED versioned parquet state table, with `Trigger.AvailableNow`
    * as the read-your-writes barrier.
    *
    * Incrementality (LSM shape): keys hash into `nBuckets` buckets and a
    * batch writes ONLY its own per-key winners as a DELTA on each touched
    * bucket's chain, committing the view with one atomic manifest rename —
    * per-batch write I/O is O(batch), and no existing file is opened or
    * moved (StreamingSpec pins untouched files byte-identical across a
    * batch). Readers merge each chain latest-wins; chains longer than
    * `maxDeltas` fold back to one base after the batch commits, bounding
    * read amplification.
    *
    * Crash-safety: a bucket version dir is never CURRENT until a manifest
    * references it, so rewriting an incomplete leftover is always safe,
    * and the previous manifest keeps serving readers until the new one
    * renames into place. A manifest whose `lastBatch` watermark has
    * reached this batchId means the batch already fully applied — the
    * replay skips it outright (the versioned apply is idempotent, so
    * that state is exactly what the replay would recompute). Superseded
    * bucket versions and manifests are pruned only after the new
    * manifest is committed. A legacy whole-state `v<N>` layout is
    * migrated into buckets by the first batch (the one O(state) pass,
    * documented here); [[compact]] ages tombstones out of the same
    * layout. At 100 TB the same `foreachBatch` body targets a
    * MERGE-capable table format — this function is the seam; bucket
    * count and the Murmur3 key hash are pinned for the store's lifetime
    * via the manifest's `n`.
    */
  def run(spark: SparkSession, changelogDir: String, stateDir: String,
          checkpointDir: String, nBuckets: Int = 16, maxDeltas: Int = 8): StreamingQuery = {
    val stream = spark.readStream.schema(changelogSchema).json(changelogDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val (fs, root) = fsFor(s, stateDir)
        val prev = latestManifest(fs, root)
        if (!prev.exists(_.lastBatch >= batchId)) {
          val legacy = if (prev.isEmpty) latestVersion(s, stateDir) else None
          val n = prev.map(_.n).getOrElse(nBuckets)
          val newId = prev.map(_.id + 1).getOrElse(0L)
          val bucketExpr = pmod(hash(col("key")), lit(n)).cast("int")
          val delta: DataFrame = legacy match {
            // one-time migration of a legacy whole-state layout: fold the
            // old state with the batch and write it as each bucket's base
            case Some(dir) => applyBatchVersioned(
              s.read.schema(stateSchema).parquet(dir.toString), batch)
            // steady state: the batch's own per-key winners ONLY — no
            // bucket is read or rewritten here; the chain merges at read
            case None => batchLatest(batch)
          }
          val written = swapBuckets(fs, root, newId, delta.withColumn("bucket", bucketExpr))
          val prevRefs: Map[Int, Seq[Long]] =
            if (legacy.isDefined) Map.empty else prev.map(_.refs).getOrElse(Map.empty)
          val newRefs = prevRefs ++ written.map(b =>
            b -> (if (legacy.isDefined) Seq(newId)
                  else prevRefs.getOrElse(b, Seq.empty) :+ newId))
          val m = Manifest(newId, n, batchId, newRefs)
          writeManifest(fs, root, m)
          pruneTo(fs, root, newRefs, newId)
          foldLongChains(s, fs, root, m, maxDeltas)
        }
        ()
      }
      .start()
    q.awaitTermination()
    q
  }

  /** Fold every bucket whose base+delta chain exceeds `maxDeltas` back to
    * a single base version — bounding read amplification while keeping
    * the write path pure-delta. Commits like a batch (new manifest id,
    * watermark unchanged). Crash-safe by the usual argument: until the
    * new manifest renames in, nothing references the folded dirs; if the
    * fold never commits, the next batch simply retriggers it. */
  private def foldLongChains(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                             root: org.apache.hadoop.fs.Path, m: Manifest,
                             maxDeltas: Int): Unit = {
    val long = m.refs.filter(_._2.size > maxDeltas)
    if (long.isEmpty) return
    val newId = m.id + 1
    val folded = latestPerKey(spark.read.schema(stateSchema).parquet(
        long.flatMap { case (b, vs) => vs.map(v => bucketPath(root, b, v).toString) }.toSeq: _*))
      .withColumn("bucket", pmod(hash(col("key")), lit(m.n)).cast("int"))
    val written = swapBuckets(fs, root, newId, folded)
    val newRefs = (m.refs -- long.keys) ++ written.map(b => b -> Seq(newId))
    writeManifest(fs, root, Manifest(newId, m.n, m.lastBatch, newRefs))
    pruneTo(fs, root, newRefs, newId)
  }

  /** Write `withBucketCol` (state rows + `bucket` partition column) to a
    * staging dir and rename each bucket partition into place as
    * `b<bucket>/v<id>`; returns the bucket ids actually written. None of
    * the target dirs is referenced by any manifest yet, so leftovers from
    * a crashed attempt are always rewritable. */
  private def swapBuckets(fs: org.apache.hadoop.fs.FileSystem,
                          root: org.apache.hadoop.fs.Path, id: Long,
                          withBucketCol: DataFrame): Seq[Int] = {
    val staging = new org.apache.hadoop.fs.Path(root, s"_staging_v$id")
    if (fs.exists(staging)) fs.delete(staging, true)
    withBucketCol.write.partitionBy("bucket").mode("overwrite").parquet(staging.toString)
    val written = fs.listStatus(staging)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
      .map(st => (st.getPath.getName.stripPrefix("bucket=").toInt, st.getPath)).toSeq
    written.foreach { case (b, src) =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(root, s"b$b"))
      val tgt = bucketPath(root, b, id)
      if (fs.exists(tgt)) fs.delete(tgt, true) // unreferenced leftover
      if (!fs.rename(src, tgt))
        throw new java.io.IOException(s"bucket swap failed: $src -> $tgt")
    }
    fs.delete(staging, true)
    written.map(_._1)
  }

  /** Prune everything the just-committed manifest `id`/`refs` no longer
    * references: superseded bucket versions, older manifests, and
    * (post-migration) legacy whole-state v-dirs at the root. */
  private def pruneTo(fs: org.apache.hadoop.fs.FileSystem,
                      root: org.apache.hadoop.fs.Path,
                      refs: Map[Int, Seq[Long]], id: Long): Unit = {
    fs.listStatus(root).filter { st =>
      val nm = st.getPath.getName
      st.isDirectory && nm.startsWith("b") && nm.stripPrefix("b").forall(_.isDigit)
    }.foreach { bSt =>
      val b = bSt.getPath.getName.stripPrefix("b").toInt
      fs.listStatus(bSt.getPath).filter { vSt =>
        val nm = vSt.getPath.getName
        nm.startsWith("v") && nm.stripPrefix("v").forall(_.isDigit) &&
          !refs.getOrElse(b, Seq.empty).contains(nm.stripPrefix("v").toLong)
      }.foreach(vSt => fs.delete(vSt.getPath, true))
    }
    fs.listStatus(manifestDir(root)).filter { st =>
      val nm = st.getPath.getName
      (nm.startsWith("m") && nm.endsWith(".json") &&
        nm.stripPrefix("m").stripSuffix(".json").forall(_.isDigit) &&
        nm.stripPrefix("m").stripSuffix(".json").toLong < id) ||
        // torn-write leftovers: a crash between fs.create(tmp) and the
        // rename strands a _m*.json.tmp; it can never be read (the
        // manifest scan filters on the m-prefix) but would otherwise
        // linger forever. pruneTo runs only AFTER this commit's own tmp
        // renamed in, so any tmp seen here is dead.
        nm.endsWith(".json.tmp")
    }.foreach(st => fs.delete(st.getPath, true))
    fs.listStatus(root).filter { st =>
      val nm = st.getPath.getName
      st.isDirectory && nm.startsWith("v") && nm.stripPrefix("v").forall(_.isDigit)
    }.foreach(st => fs.delete(st.getPath, true))
  }

  /** Compaction — age tombstones out of the bucketed state. A tombstone
    * only exists to fence stale pre-delete events (see
    * [[applyBatchVersioned]]); once the source's reordering horizon has
    * passed its seq, it is dead weight every later batch re-reads and
    * rewrites. This rewrites EVERY bucket (the one deliberate O(state)
    * pass) dropping tombstones with `seq <= dropTombstonesUpTo`, and
    * commits like a batch: new bucket versions, one atomic manifest
    * rename. The manifest id advances but the `lastBatch` watermark does
    * NOT, so an in-flight checkpoint replay racing the compaction still
    * sees its own batches as applied. Choose the threshold conservatively
    * (e.g. the source's max seq minus its reordering horizon); a stale
    * pre-delete event older than the horizon arriving AFTER compaction
    * would resurrect its key — that is the horizon contract, not a bug. */
  def compact(spark: SparkSession, stateDir: String, dropTombstonesUpTo: Long): Unit = {
    val (fs, root) = fsFor(spark, stateDir)
    latestManifest(fs, root).foreach { m =>
      val newId = m.id + 1
      val survivors = readVersionedState(spark, stateDir) // chain-merged
        // keep live rows, legacy NULL-deleted rows, null-seq tombstones
        // (conservative: no seq means no proof the horizon passed)
        .where(!(coalesce(col("deleted"), lit(false)) === true &&
          coalesce(col("seq"), lit(Long.MaxValue)) <= dropTombstonesUpTo))
        .withColumn("bucket", pmod(hash(col("key")), lit(m.n)).cast("int"))
      val written = swapBuckets(fs, root, newId, survivors)
      // a full rewrite: the new manifest references ONLY what it wrote —
      // every chain collapses to one base, and buckets whose rows all
      // compacted away drop out entirely
      val newRefs: Map[Int, Seq[Long]] = written.map(b => b -> Seq(newId)).toMap
      writeManifest(fs, root, Manifest(newId, m.n, m.lastBatch, newRefs))
      pruneTo(fs, root, newRefs, newId)
    }
  }

  /** ST5 — dead-letter split: rows that fail validation go to a side table
    * instead of poisoning the stream (the reference retries invisibly;
    * here the DLQ is explicit and queryable). NULL-safe: a row where the
    * predicate evaluates to NULL (e.g. a missing `op` field) has NOT
    * validated, so it belongs in the DLQ — a bare `where(!isValid)` would
    * silently drop it from BOTH sides, losing the row the DLQ exists to
    * keep (the [[graft.operators.Kv.deleteWhere]] contract). */
  def withDlq(batch: DataFrame, isValid: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
    val ok = coalesce(isValid, lit(false))
    (batch.where(ok), batch.where(!ok))
  }

  /** ST1 smoke as a callable check (SURVEY §2 ST1 is otherwise the one
    * spec-only row — a live change producer is batch-inexpressible, so no
    * DuckDB oracle can watch the stream itself; what CAN be oracled is the
    * INVARIANT): drive the real readStream → foreachBatch → LSM-state
    * path over a 6-event changelog with a restart mid-feed (two
    * AvailableNow runs off one checkpoint), then return whether the served
    * state equals both the batch fold of the same changelog and the
    * expected literal. Exposed through SparkEntry.queries as `st1_smoke`
    * (a 1-row relation vs a constant oracle), so the driver's correctness
    * record carries the streaming row instead of a stdout-only line.
    *
    * Memoized per session: the invariant cannot change within a JVM, and
    * plan-audit sweeps build every query's frame repeatedly — each build
    * must not re-drive two streaming runs. */
  private val smokeMemo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  def st1Smoke(spark: SparkSession): Boolean = {
    val cached = smokeMemo.get(spark)
    if (cached != null) return cached.booleanValue()
    val ok = st1SmokeUncached(spark)
    smokeMemo.put(spark, java.lang.Boolean.valueOf(ok))
    ok
  }

  private def st1SmokeUncached(spark: SparkSession): Boolean =
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_st1_smoke").toString
      val log = s"$root/log"; new java.io.File(log).mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
        """{"seq":1,"op":"insert","key":"k1","doc":"a"}
          |{"seq":2,"op":"insert","key":"k2","doc":"b"}
          |{"seq":3,"op":"insert","key":"k3","doc":"c"}
          |""".stripMargin)
      run(spark, log, s"$root/state", s"$root/ckpt")
      // restart: feed more of the changelog through a NEW query on the
      // SAME checkpoint + state — managed offsets + the LSM manifest
      // must carry the stream across the boundary
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
        """{"seq":4,"op":"update","key":"k1","doc":"x"}
          |{"seq":5,"op":"delete","key":"k2","doc":null}
          |{"seq":6,"op":"insert","key":"k4","doc":"d"}
          |""".stripMargin)
      run(spark, log, s"$root/state", s"$root/ckpt")
      val served = readState(spark, s"$root/state")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val folded = applyBatch(
        readState(spark, s"$root/state_empty"), spark.read.json(log))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      served == folded && served == Map("k1" -> "x", "k3" -> "c", "k4" -> "d")
    } catch { case e: Throwable =>
      System.err.println(s"st1_smoke: FAILED — ${e.getMessage}"); false
    }
}
