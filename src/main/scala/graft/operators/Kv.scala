package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S1–S8 + M7/M8 — the authoritative key/value surface.
  *
  * The reference's Redis store holds `(key = objectType_objectId,
  * value = JSON string)` (`/root/reference/src/utils/elasticSearch.ts:3-11`;
  * schema record at `apiLogicForCRUD.ts:417-425`). Here the store is a
  * keyed DataFrame/Parquet table `(key, payload, …)` — at 100 TB written
  * bucketed by `key` (point reads become partition/bucket-pruned scans, and
  * all of the merge joins below are co-partitioned). All mutating "ops" are
  * pure `DataFrame => DataFrame` functions producing the next version of
  * the table — the batch analogue of the reference's per-request writes;
  * the streaming path ([[graft.streaming.Ingest]]) applies them per
  * micro-batch.
  */
object Kv {

  /** S1 — point get (`apiLogicForCRUD.ts:360-363`). Equality filter on the
    * key: Catalyst pushes it to the scan (bucket pruning on the 100 TB
    * layout); miss ⇒ empty result, the caller's 404
    * (`apiLogicForCRUD.ts:66-68`). */
  def get(kv: DataFrame, key: String): DataFrame =
    kv.where(col("key") === lit(key))

  /** S2 — existence probe (`apiLogicForCRUD.ts:356-359`), drives 409/404
    * gates (M8). */
  def exists(kv: DataFrame, key: String): Boolean =
    !get(kv, key).isEmpty

  /** S2, batch form — existence verdict for a whole probe set in one
    * distributed pass: left join of the (deduped) probe keys against the
    * store's key column. One shuffle on `key`; none at all when the store
    * is bucketed by `key` and the probe side is small enough for AQE to
    * broadcast. The store side is NOT deduplicated: keys are unique by KV
    * invariant (every mutation in this object preserves it), so a distinct
    * there would be a full aggregation over the entire store just to answer
    * a probe — pure waste at 100 TB. */
  def existsAll(kv: DataFrame, probes: DataFrame): DataFrame =
    probes.select("key").distinct()
      .join(kv.select(col("key")).withColumn("__hit", lit(true)),
        Seq("key"), "left")
      .select(col("key"), coalesce(col("__hit"), lit(false)).as("present"))

  /** S3 — create-only batch set (`apiLogicForCRUD.ts:390-416`: 409 when the
    * key exists). Only one row per key may win — including within the
    * incoming batch itself (the reference processes requests serially, so
    * a second create of the same key 409s). Winner among in-batch
    * duplicates is deterministic (min by the remaining columns). Returns
    * (next table, rejected rows — both already-present keys and in-batch
    * surplus duplicates). */
  def setIfAbsent(kv: DataFrame, rows: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val others = rows.columns.filterNot(_ == "key").map(col).toSeq
    // key-only batches have no payload columns to order by; all in-batch
    // duplicates are then identical rows, so ordering by the key itself is
    // both legal (row_number demands a non-empty order) and deterministic
    val ordCols = if (others.nonEmpty) others else Seq(col("key"))
    val w = Window.partitionBy(col("key")).orderBy(ordCols: _*)
    val deduped = rows.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val fresh = deduped.join(kv.select("key"), Seq("key"), "left_anti")
    val rejected = rows.exceptAll(fresh)
    (kv.unionByName(fresh, allowMissingColumns = true), rejected)
  }

  /** S4 — unconditional upsert (`elasticSearch.ts:3-11`): updates win per
    * key, WHOLESALE — an update row replaces the stored row entirely, NULL
    * columns included (Redis SET semantics; per-column coalesce would make
    * clearing a field impossible). Full-outer merge, one shuffle on `key`
    * (none at all when both sides are bucketed by `key`).
    *
    * The reference applies SETs serially, so a batch carrying several
    * writes to one key must collapse to a single winner BEFORE the merge —
    * otherwise the full-outer join fans out and the next table holds
    * duplicate key rows, breaking the KV uniqueness invariant. Winner
    * selection mirrors [[graft.streaming.Ingest.applyBatch]]: latest by
    * `seq` when the batch carries one (the changelog convention), else
    * deterministic max over the payload columns (any total order works —
    * it only has to be the SAME one on every replay). */
  def upsert(kv: DataFrame, updates: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = kv.columns.filterNot(_ == "key")
    val ord: Seq[Column] =
      if (updates.columns.contains("seq")) Seq(col("seq").desc)
      else if (cols.nonEmpty) cols.toSeq.map(c => col(c).desc_nulls_last)
      else Seq(col("key"))
    val w = Window.partitionBy(col("key")).orderBy(ord: _*)
    val u = updates.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select("key", cols: _*).withColumn("__isUpd", lit(true))
    kv.alias("__o").join(u.alias("__n"), Seq("key"), "full_outer")
      .select(col("key") +: cols.toSeq.map(c =>
        when(col("__isUpd").isNotNull, col(s"__n.$c"))
          .otherwise(col(s"__o.$c")).as(c)): _*)
  }

  /** S5 — delete one key (`apiLogicForCRUD.ts:364-389`); batch form is the
    * anti-join below. */
  def delete(kv: DataFrame, key: String): DataFrame =
    kv.where(col("key") =!= lit(key))

  /** S5/S7 — batch delete by key set (anti-join; the index-side doc delete
    * `elasticSearch.ts:347-350` is the same operation on the nodes table). */
  def deleteAll(kv: DataFrame, keys: DataFrame): DataFrame =
    kv.join(keys.select("key"), Seq("key"), "left_anti")

  /** S8 — delete-by-query (`elasticSearch.ts:186-200`, match_all variant
    * wipes the table). NULL-safe: a row where the predicate evaluates to
    * NULL does not match the delete query, so it must be KEPT — a bare
    * `where(!pred)` would silently drop it. */
  def deleteWhere(kv: DataFrame, pred: Column): DataFrame =
    kv.where(!coalesce(pred, lit(false)))

  /** S9 — capped full scan (`elasticSearch.ts:201-215`, `size: 1000`).
    * Global limit ⇒ `CollectLimitExec`; we order first so the cap is
    * deterministic (the reference returns ES doc order, which is not). */
  def cappedScan(kv: DataFrame, n: Int = 1000, orderCol: String = "key"): DataFrame =
    kv.orderBy(col(orderCol)).limit(n)

  /** M7 — key/shape precheck (`apiLogicForCRUD.ts:93-102`): objectId
    * present and the addressed key equals `objectType_objectId`. */
  def keyMatches(urlKey: String): Column =
    col("objectId").isNotNull &&
      concat_ws("_", col("objectType").cast("string"), col("objectId").cast("string")) === lit(urlKey)

  /** J4 — cascading delete (`elasticSearch.ts:311-357`): the reference
    * recursively DFS-deletes every descendant with per-object round trips.
    * Because [[Shred]] stamps every node with its `rootKey`, the entire
    * descendant closure of a root is one predicate — a single anti-join
    * rewrite, no recursion at runtime. For non-root subtrees, the closure
    * is an iterative join on `parentKey` (depth ≤ schema depth, known at
    * plan time). */
  def cascadeDeleteRoot(nodes: DataFrame, rootKey: String): DataFrame =
    nodes.where(col("rootKey") =!= lit(rootKey))

  /** Descendant closure of an arbitrary node (for subtree deletes),
    * key-addressed: the result is the distinct KEY set, and deleting it
    * removes every occurrence of those keys (the store holds one object per
    * key — same key ⇒ same object ⇒ same children — so closure-via-any-
    * occurrence and closure-by-parentKey agree; DocOpsSpec asserts the
    * equivalence).
    *
    * Fast path: when the nodes table carries the [[Shred]]-materialized
    * `keyPath` ancestry column, descendant-or-self of K is the single
    * predicate `keyPath CONTAINS "/esc(K)/"` — one filter + distinct, no
    * iteration, no per-level Spark jobs, and the filter pushes down to the
    * scan on a stored layout. Segments are percent-escaped at shred time
    * ([[Shred.escapeSegment]]), so a stored key containing '/' cannot
    * alias a segment boundary and the match is exact for ANY key.
    *
    * Fallback (pathless node stores): iterative parentKey joins down the
    * (schema-bounded) depth. The walk touches only `(key, parentKey)` —
    * that narrow edge projection is persisted once up front so each level
    * (an action, because of its emptiness check) scans two slim columns
    * instead of re-deriving the full nodes union (payload/etag included)
    * every time. */
  def subtreeKeys(nodes: DataFrame, key: String, maxDepth: Int = 64): DataFrame = {
    if (nodes.columns.contains("keyPath"))
      return nodes.where(col("keyPath").contains(s"/${Shred.escapeSegment(key)}/"))
        .select(col("key")).distinct()
    subtreeKeysBfs(nodes, key, maxDepth)
  }

  /** BFS closure over parentKey edges — the pathless-store fallback. */
  private[graft] def subtreeKeysBfs(nodes: DataFrame, key: String, maxDepth: Int = 64): DataFrame = {
    val edges = nodes.select(col("key"), col("parentKey")).persist()
    var frontier = edges.select(col("key")).where(col("key") === lit(key))
    var acc = frontier
    var i = 0
    var done = false
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame]()
    while (i < maxDepth && !done) {
      val next = edges.alias("n")
        .join(frontier.alias("f"), col("n.parentKey") === col("f.key"), "left_semi")
        .select(col("key"))
        // each level's isEmpty is an action: without a persist the k-th
        // level re-executes the whole k-deep join lineage (O(depth²) jobs,
        // and once more in the caller's delete) — cache the frontier so
        // every level is computed exactly once
        .persist()
      persisted += next
      // schema depth bounds this loop; stop early on an empty level.
      if (next.isEmpty) done = true
      else { acc = acc.unionByName(next); frontier = next }
      i += 1
    }
    // a silent cap would orphan deeper descendants — refuse instead (only
    // reachable with a cyclic/corrupt parentKey graph or absurd nesting)
    if (!done && !frontier.isEmpty) {
      edges.unpersist()
      persisted.foreach(_.unpersist())
      throw new IllegalStateException(
        s"subtree of $key exceeds depth $maxDepth (cyclic parentKey data?)")
    }
    // materialize the closure through the cached frontiers, then release
    // them — the caller gets a small self-contained key set
    val out = acc.distinct().localCheckpoint(true)
    edges.unpersist()
    persisted.foreach(_.unpersist())
    out
  }

  def cascadeDelete(nodes: DataFrame, key: String): DataFrame =
    deleteAll(nodes, subtreeKeys(nodes, key))
}
