package graft.operators

import graft.functions.{JsonSchema, SchemaNode}
import graft.plans.JsonExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M5/M6 — runtime schema validation as a single fused Catalyst expression.
  *
  * The reference validates every write against the runtime-registered JSON
  * Schema (`/root/reference/src/utils/apiLogicForCRUD.ts:112-120`, 400 on
  * failure) and separately enforces that `creationDate` is a *real*
  * `DD-MM-YYYY` calendar date (`dateValidator.ts:1-14` — the regex alone
  * admits 31-02-2020). Here a [[SchemaNode]] compiles once into
  * [[graft.plans.JsonSchemaErrors]] — ONE Jackson parse per row running
  * every draft-04 check in a single tree walk; a batch of documents is
  * validated in one projection, and the 400 path is a
  * `where(size(errors) > 0)` rejects split.
  *
  * (Earlier rounds composed ~N `element_at` references over a shared
  * [[graft.plans.JsonPathTypes]] tags column; Catalyst project collapsing
  * re-inlined the parse into every reference, so the physical plan carried
  * ~9 copies per row on the m5 schema. The fused expression is immune to
  * plan rewrites by construction.) Checks, unchanged:
  *  - well-formed JSON and object-ness of the root;
  *  - `required` properties present at every nesting level (draft-04:
  *    an explicit `null` satisfies `required` but fails its type check);
  *  - `additionalProperties: false` — no keys outside `properties`;
  *  - full type conformance per path (string/number/integer/boolean/
  *    object/array) — distinguishing `"12"` (a string, which the
  *    reference's validator rejects for `type: number`) from `12`;
  *  - string `pattern` (Java-regex `find()`, the `rlike` contract);
  *  - element-wise required checks across WHOLE arrays;
  *  - [[validDate]] — semantic calendar check (M6).
  */
object Validate {

  /** Error expressions for a JSON-string column against `schema`. */
  def errors(jsonCol: Column, schema: SchemaNode): Column =
    JsonExpressions.jsonSchemaErrors(jsonCol, schema)

  /** M6 — `DD-MM-YYYY` semantic date validation
    * (`dateValidator.ts:1-14`): zero-padded regex + real-calendar
    * round-trip. `try_to_date` (ANSI-safe) already rejects 31-02. */
  def validDate(c: Column): Column =
    // year [12]\d{3} matches the reference regex (dateValidator.ts:2):
    // years 1000-2999 only — 0500 or 3020 are rejected there too
    c.rlike("^(0[1-9]|[12][0-9]|3[01])-(0[1-9]|1[012])-([12][0-9]{3})$") &&
      try_to_date(c, "dd-MM-yyyy").isNotNull

  /** Split a batch of JSON documents into (valid, rejects-with-errors) —
    * the distributed form of the reference's per-request 400. */
  def partition(docs: DataFrame, jsonCol: String, schemaJson: String): (DataFrame, DataFrame) = {
    val schema = JsonSchema.parse(schemaJson)
    val checked = docs.withColumn("__errors", errors(col(jsonCol), schema))
    (checked.where(size(col("__errors")) === 0).drop("__errors"),
      checked.where(size(col("__errors")) > 0))
  }
}
