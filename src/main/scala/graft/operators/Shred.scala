package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** J1 — generic document shredder.
  *
  * The reference (`/root/reference/src/utils/elasticSearch.ts:12-49`,
  * `saveObjectRecursive`) walks a nested JSON *value* at runtime and writes
  * every `objectId`-bearing sub-object as an independent KV record keyed
  * `objectType_objectId`. Spark lets us do strictly better: we recurse over
  * the DataFrame *schema* once at plan-build time and emit a chain of
  * `select`/`posexplode` operators — no UDFs, fully codegen'd, and one
  * distributed job regardless of document count.
  *
  * A field is a "node" iff its struct carries both `objectId` and
  * `objectType` (the reference's contract: README "Version 2 Requirements"
  * item 4). Non-node structs stay inline in their parent's payload, exactly
  * like the reference, which only persists objectId-bearing objects.
  *
  * Emitted metadata mirrors the reference's ES parent/child `join` mapping
  * (`elasticSearch.ts:50-151`):
  *  - `relName` = `parentType_childType` (root = its own objectType);
  *  - `rootKey` = the root document's key — the analogue of ES shard
  *    *routing* (`elasticSearch.ts:139-141`). At 100 TB the nodes table is
  *    written bucketed/partitioned by `rootKey`, so every parent-child join
  *    in [[Renest]] and [[graft.operators.Search]] is co-partitioned and
  *    shuffle-free;
  *  - `field`/`ord` = the parent field name and array position — what the
  *    reference keeps implicitly by storing children inline; we keep them
  *    as columns so re-nesting is lossless.
  */
object Shred {

  /** Metadata columns carried through the recursion. Prefixed to avoid
    * collisions with user payload fields.
    *
    * `__keyPath` is the materialized ancestry chain — `/rootKey/…/key/`,
    * '/'-delimited — so "descendant-or-self of key K" is the single
    * predicate `keyPath CONTAINS "/K/"`: no recursion, no joins, and at
    * 100 TB a plain pushed-down string filter instead of a depth-many
    * iterative job chain (see [[Kv.subtreeKeys]]). The database
    * materialized-path pattern, applied at shred time where the ancestry
    * is free. Keys come from USER payload data and may contain '/', so
    * each segment is percent-escaped ([[escapeSegment]]: '%'→'%25',
    * '/'→'%2F') — the delimiter provably never occurs inside a segment
    * and the contains-match cannot cross segment boundaries (DocOpsSpec
    * pins a slash-bearing objectId against the BFS closure). */
  val MetaCols: Seq[String] = Seq(
    "__key", "__objectType", "__objectId", "__parentKey", "__parentType",
    "__rootKey", "__field", "__ord", "__keyPath")

  /** Percent-escape a key for use as a keyPath segment: '%' first (so
    * escaping is injective), then the '/' delimiter. Literal
    * `StringReplace`, not `regexp_replace` — this stamp runs per emitted
    * node on the shred hot path, and regex machinery per row is pure
    * overhead for fixed single-char search strings. Mirrored by the
    * literal-side escape in [[Kv.subtreeKeys]]. */
  def escapeSegment(c: Column): Column =
    replace(replace(c, lit("%"), lit("%25")), lit("/"), lit("%2F"))

  /** The same escape for a driver-side literal key. */
  def escapeSegment(key: String): String =
    key.replace("%", "%25").replace("/", "%2F")

  def isNodeStruct(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fieldNames.contains("objectId") && s.fieldNames.contains("objectType")
    case _ => false
  }

  def isNodeArray(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => isNodeStruct(e)
    case _ => false
  }

  /** Scalar-or-inline fields of a node: everything that is not itself a
    * child node (those become their own records). */
  def inlineFields(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filterNot(f => isNodeStruct(f.dataType) || isNodeArray(f.dataType))

  /** Shred into one typed DataFrame per node *path* (field-name path from
    * the root; "" = root). Paths are unique even when the same objectType
    * appears at several places in the tree (e.g. the reference's
    * `membercostshare` under both `planCostShares` and
    * `planserviceCostShares`).
    *
    * Each table has [[MetaCols]] plus the node's inline fields, typed.
    */
  // Memoized materialized shreds, keyed by input DataFrame IDENTITY (the
  // shared documents table is itself memoized in StarDocs, so the hot path
  // hits). One persist per distinct input instead of one per call — the
  // round-2 per-call persists stacked duplicate cache entries.
  private val materialized =
    new java.util.concurrent.ConcurrentHashMap[DataFrame, (DataFrame, Map[String, DataFrame])]()

  /** `materialize = true` (default) repartitions by root key and persists
    * the annotated input — right when several node paths / renest joins
    * will consume the result. Pass `false` for single-path projections
    * (e.g. explode one child table once), where the exchange+cache would
    * cost more than it saves. */
  def shredTyped(docs: DataFrame, materialize: Boolean = true): Map[String, DataFrame] = {
    if (!materialize) walk(annotatedRoot(docs), docs.schema, "")
    else synchronized {
      val (prepared, result) = materialized.computeIfAbsent(docs, shredTypedPrepared(_))
      // rebuilt transparently if something (e.g. clearCache) dropped it
      if (prepared.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        prepared.persist()
      result
    }
  }

  /** Release this session's memoized shreds (cache entries included) —
    * the eviction valve for long-lived sessions, mirroring
    * [[graft.sources.StarDocs.invalidate]]. */
  def invalidate(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    val it = materialized.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.sparkSession eq spark) { e.getValue._1.unpersist(); it.remove() }
    }
  }

  private def annotatedRoot(docs: DataFrame): DataFrame = {
    val rootKey = concat_ws("_", col("objectType").cast("string"), col("objectId").cast("string"))
    docs.select(
      Seq(
        rootKey.as("__key"),
        col("objectType").cast("string").as("__objectType"),
        col("objectId").cast("string").as("__objectId"),
        lit(null).cast("string").as("__parentKey"),
        lit(null).cast("string").as("__parentType"),
        rootKey.as("__rootKey"),
        lit(null).cast("string").as("__field"),
        lit(null).cast("int").as("__ord"),
        concat(lit("/"), escapeSegment(rootKey), lit("/")).as("__keyPath")
      ) ++ docs.schema.fieldNames.map(col): _*)
  }

  private def shredTypedPrepared(docs: DataFrame): (DataFrame, Map[String, DataFrame]) = {
    val prepared = annotatedRoot(docs)
      // Two physical choices:
      //  - persist: without a materialization boundary each node path (and
      //    every renest join over them) re-executes the full upstream
      //    document assembly — this is the load-bearing one.
      //  - repartition by __rootKey: document trees arrive co-located, so
      //    the downstream renest exchanges move far less data (same-key
      //    rows are already together). Measured (r10, sf0.1): dropping
      //    this exchange saves ~1 s of build but costs p10's steady-state
      //    renest 1.1 s → 8.4 s — the rootKey partitioning is what the
      //    hit-filtered renest joins reuse. The bucketed NodeStore layout
      //    is the fully exchange-free path (NodeStoreSpec); at 100 TB that
      //    stored layout is the one to use.
      .repartition(col("__rootKey"))
      .persist()
    (prepared, walk(prepared, docs.schema, ""))
  }

  private def joinPath(path: String, field: String): String =
    if (path.isEmpty) field else s"$path.$field"

  private def walk(df: DataFrame, schema: StructType, path: String): Map[String, DataFrame] = {
    val self = df.select(MetaCols.map(col) ++ inlineFields(schema).map(f => col(f.name)): _*)
    val childMaps = schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType if isNodeStruct(s) =>
          val child = childDf(df, col(f.name), lit(null).cast("int"), f.name, s)
          walk(child, s, joinPath(path, f.name)).toSeq
        case ArrayType(s: StructType, _) if isNodeStruct(s) =>
          val exploded = df.select(
            col("__key").as("__pk"), col("__objectType").as("__pt"),
            col("__rootKey").as("__rk"), col("__keyPath").as("__kp"),
            posexplode(col(f.name)).as(Seq("__pos", "__node")))
          val child = childDf2(exploded, f.name, s)
          walk(child, s, joinPath(path, f.name)).toSeq
        case _ => Nil
      }
    }
    (Map(path -> self) ++ childMaps.toMap)
  }

  /** Meta + flattened fields for a single-struct child column. */
  private def childDf(parent: DataFrame, node: Column, ord: Column,
                      fieldName: String, s: StructType): DataFrame =
    parent
      .select(
        col("__key").as("__pk"), col("__objectType").as("__pt"),
        col("__rootKey").as("__rk"), col("__keyPath").as("__kp"),
        node.as("__node"), ord.as("__pos"))
      .where(col("__node").isNotNull)
      .select(childProjection(fieldName, s): _*)

  private def childDf2(exploded: DataFrame, fieldName: String, s: StructType): DataFrame =
    exploded.where(col("__node").isNotNull).select(childProjection(fieldName, s): _*)

  private def childProjection(fieldName: String, s: StructType): Seq[Column] =
    Seq(
      concat_ws("_", col("__node.objectType").cast("string"), col("__node.objectId").cast("string")).as("__key"),
      col("__node.objectType").cast("string").as("__objectType"),
      col("__node.objectId").cast("string").as("__objectId"),
      col("__pk").as("__parentKey"),
      col("__pt").as("__parentType"),
      col("__rk").as("__rootKey"),
      lit(fieldName).as("__field"),
      col("__pos").cast("int").as("__ord"),
      concat(col("__kp"),
        escapeSegment(concat_ws("_", col("__node.objectType").cast("string"),
          col("__node.objectId").cast("string"))), lit("/")).as("__keyPath")
    ) ++ s.fieldNames.map(n => col(s"__node.$n").as(n))

  /** J1 output in its generic single-table form: the `nodes` table
    * (`SURVEY.md` §7.1 layer 1 / FIXTURES.md A.3), payload as JSON.
    * `relName` reproduces the reference's join-tree names
    * (`elasticSearch.ts:152-171`), `etag` is the node-local content hash
    * (`jwtAuth.ts:71-73` analogue; canonical-form, see [[Etag]]).
    */
  def nodes(docs: DataFrame): DataFrame = {
    val typed = shredTyped(docs)
    val parts = typed.toSeq.sortBy(_._1).map { case (path, df) =>
      val payloadFields = df.columns.filterNot(MetaCols.contains)
      val payload = to_json(struct(payloadFields.map(col): _*))
      df.select(
        col("__key").as("key"),
        col("__objectType").as("objectType"),
        col("__objectId").as("objectId"),
        col("__parentKey").as("parentKey"),
        col("__parentType").as("parentType"),
        col("__rootKey").as("rootKey"),
        when(col("__parentType").isNull, col("__objectType"))
          .otherwise(concat_ws("_", col("__parentType"), col("__objectType"))).as("relName"),
        col("__field").as("field"),
        col("__ord").as("ord"),
        lit(path).as("path"),
        col("__keyPath").as("keyPath"),
        payload.as("payload"),
        md5(payload).as("etag"))
    }
    parts.reduce(_ unionByName _)
  }
}
