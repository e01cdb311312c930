package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M1 — merge-patch with keyed-array upsert (the reference's PATCH).
  *
  * Reference: `/root/reference/src/utils/modifyObject.ts:32-87`. Semantics
  * preserved:
  *  - top-level / nested scalars: patch value wins when present
  *    (`modifyObject.ts:55-60`; a JS `undefined` — here SQL NULL — leaves
  *    the old value);
  *
  * Typed-column limitation: after `from_json` into a typed struct, an
  * absent member and an explicit `null` member both surface as SQL NULL,
  * so THIS form treats both as "keep the old value". The reference's
  * explicit-null overwrite (`modifyObject.ts:55-60` assigns the null)
  * lives in [[json]] — the JSON-string-level merge expression
  * ([[graft.plans.JsonMergePatch]]), where the distinction survives the
  * parse. Use [[json]] when patches may carry explicit nulls; use this
  * typed form when documents are already shredded/typed columns.
  *  - `objectId` is immutable (`modifyObject.ts:55-56`): the merge is keyed
  *    on it, so it can never change;
  *  - nested structs are deep-merged field-by-field
  *    (`modifyObject.ts:62-68`);
  *  - arrays of `objectId`-bearing structs are **keyed upserts**
  *    (`modifyObject.ts:70-84`): existing elements keep their order and are
  *    replaced wholesale when the patch carries the same `objectId`; new
  *    elements append at the end — the reference's `Map` insert order.
  *    Elements with a NULL `objectId` diverge deliberately: the
  *    reference's Map collapses them all under its single `undefined` key
  *    (last wins); here each unkeyed element is preserved/appended;
  *  - arrays of plain values are replaced wholesale (RFC 7386).
  *
  * Everything is expressed with higher-order array functions
  * (`transform` / `filter` / `exists`), so the merge of a whole batch of
  * patches is a single codegen'd projection after one equi-join on the
  * document key — no explode/regroup shuffle, no UDFs. Per-row cost is
  * O(|old|·|new|) on the keyed arrays, which is the right trade at scale:
  * document arrays are small while document *counts* are huge.
  */
object MergePatch {

  /** Apply `patches` to `current` (both document DataFrames of the same
    * schema). Rows of `current` with no patch pass through unchanged;
    * patches whose key does not exist are dropped (the PUT/PATCH 409
    * existence gate — `apiLogicForCRUD.ts:168-178` — is [[Kv.exists]],
    * applied by the caller). */
  def apply(current: DataFrame, patches: DataFrame): DataFrame = {
    val schema = current.schema
    val o = current.alias("__o")
    // one patch per document key — duplicates would fan the left join out
    // into duplicate output rows, breaking the KV uniqueness invariant
    // (the reference serializes requests, so "which duplicate wins" has no
    // batch meaning; the winner here is deterministic-but-arbitrary: the
    // json-lexicographically first). Kv.setIfAbsent/upsert dedupe the same
    // way for the same reason.
    val keyW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("objectType").cast("string"), col("objectId").cast("string"))
      .orderBy(to_json(struct(patches.columns.map(col).toSeq: _*)))
    val n = patches
      .withColumn("__pn", row_number().over(keyW)).where(col("__pn") === 1).drop("__pn")
      .alias("__n")
    val joined = o.join(n,
      col("__o.objectType").cast("string") === col("__n.objectType").cast("string") &&
        col("__o.objectId").cast("string") === col("__n.objectId").cast("string"),
      "left")
    val merged = schema.fields.toSeq.map { f =>
      mergeField(col(s"__o.${f.name}"), col(s"__n.${f.name}"), f.dataType).as(f.name)
    }
    joined.select(merged: _*)
  }

  /** M1 over JSON-string documents `(key, doc)` patched by `(key, patch)`:
    * the reference's merge with full explicit-null fidelity (absent keeps,
    * null overwrites — see [[graft.plans.JsonMergePatch]]). One left join
    * on the key plus one codegen-adjacent projection; rows without a patch
    * pass through byte-identical. */
  def json(current: DataFrame, patches: DataFrame,
           keyCol: String = "key", docCol: String = "doc",
           patchCol: String = "patch"): DataFrame = {
    // one patch per key (same fan-out hazard and deterministic-winner rule
    // as the typed form: json-lexicographically first)
    val keyW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pk")).orderBy(col("__patch"))
    val p = patches.select(col(keyCol).as("__pk"), col(patchCol).as("__patch"))
      .withColumn("__pn", row_number().over(keyW)).where(col("__pn") === 1).drop("__pn")
    current.join(p, col(keyCol) === col("__pk"), "left")
      .withColumn(docCol,
        graft.plans.JsonExpressions.jsonMergePatch(col(docCol), col("__patch")))
      .drop("__pk", "__patch")
  }

  /** The merge of one field, recursive over the type. */
  def mergeField(o: Column, nw: Column, dt: DataType): Column = dt match {
    case s: StructType =>
      when(nw.isNull, o).otherwise(when(o.isNull, nw).otherwise(
        struct(s.fields.toSeq.map(f =>
          mergeField(o.getField(f.name), nw.getField(f.name), f.dataType).as(f.name)): _*)))
    case ArrayType(e: StructType, _) if Shred.isNodeStruct(e) =>
      val oid = (x: Column) => x.getField("objectId")
      when(nw.isNull, o).otherwise(when(o.isNull, nw).otherwise(
        concat(
          // keep existing order; replace matched elements with the patch's
          transform(o, x =>
            coalesce(try_element_at(filter(nw, y => oid(y) === oid(x)), lit(1)), x)),
          // append patch elements whose objectId is new. Elements WITHOUT
          // an objectId each append — a DOCUMENTED divergence from the
          // reference, whose Map keys every undefined-id element under the
          // single `undefined` key (modifyObject.ts:74-83), collapsing
          // them to one survivor; preserving each unkeyed element loses no
          // data. The coalesce guards the x side of the exists: one
          // null-id EXISTING element would turn the predicate NULL and
          // silently drop every genuinely-new patch element.
          filter(nw, y => oid(y).isNull ||
            !coalesce(exists(o, x => oid(x) === oid(y)), lit(false))))))
    case _ =>
      coalesce(nw, o)
  }
}
