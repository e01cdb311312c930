package graft.operators

import graft.functions.{JsonSchema, SchemaNode}
import graft.functions.SchemaNode._
import graft.plans.JsonExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M5/M6 — runtime schema validation compiled to Catalyst predicates.
  *
  * The reference validates every write against the runtime-registered JSON
  * Schema (`/root/reference/src/utils/apiLogicForCRUD.ts:112-120`, 400 on
  * failure) and separately enforces that `creationDate` is a *real*
  * `DD-MM-YYYY` calendar date (`dateValidator.ts:1-14` — the regex alone
  * admits 31-02-2020). Here a [[SchemaNode]] compiles once into an array of
  * error expressions over a JSON-string column; a batch of documents is
  * validated in a single projection, and the 400 path is a
  * `where(size(errors) > 0)` rejects split.
  *
  * Type conformance uses [[graft.plans.JsonPathTypes]] — ONE Jackson parse
  * per row yielding the JSON type tag at every schema path — because
  * `get_json_object` strips quotes and cannot distinguish `"12"` (a
  * string, which the reference's validator rejects for `type: number`)
  * from `12`. Checks:
  *  - well-formed JSON and object-ness of the root;
  *  - `required` properties present at every nesting level (draft-04:
  *    an explicit `null` satisfies `required` but fails its type check);
  *  - `additionalProperties: false` — no keys outside `properties`;
  *  - full type conformance per path (string/number/integer/boolean/
  *    object/array);
  *  - string `pattern` via `rlike`;
  *  - element-wise required checks across WHOLE arrays (typed parse);
  *  - [[validDate]] — semantic calendar check (M6).
  */
object Validate {

  private final case class Ctx(tagOf: String => Column, json: Column)

  /** Error expressions for a JSON-string column against `schema`. */
  def errors(jsonCol: Column, schema: SchemaNode): Column = {
    val paths = collectPaths(schema, "$").distinct
    val all = "$" +: paths
    val tags = JsonExpressions.jsonPathTypes(jsonCol, all)
    val idx = all.zipWithIndex.toMap
    val ctx = Ctx(p => element_at(tags, idx(p) + 1), jsonCol)
    val malformed = when(ctx.tagOf("$") === "malformed", lit("malformed json"))
    val structural = collectErrors(ctx, schema, "$")
    val typed = from_json(jsonCol, JsonSchema.sparkType(schema))
    val deepErrs = elementErrors(typed, schema, "$")
    array_compact(array(malformed +: (structural ++ deepErrs): _*))
  }

  /** All schema paths needing a type tag. */
  private def collectPaths(node: SchemaNode, path: String): Seq[String] = node match {
    case SObject(props, _, _) =>
      path +: props.flatMap { case (n, t) => collectPaths(t, s"$path.$n") }
    case SArray(item) => path +: collectPaths(item, s"$path[0]")
    case _ => Seq(path)
  }

  private def present(tag: Column): Column =
    tag =!= "missing" && tag =!= "malformed"

  private def collectErrors(ctx: Ctx, node: SchemaNode, path: String): Seq[Column] = {
    val tag = ctx.tagOf(path)
    node match {
      case SObject(props, required, additional) =>
        val shapeErr = Seq(when(present(tag) && tag =!= "object",
          lit(s"not an object at $path")))
        val reqErrs = required.map { r =>
          when(tag === "object" && ctx.tagOf(s"$path.$r") === "missing",
            lit(s"missing required $path.$r"))
        }
        val addlErrs = if (additional) Nil else Seq {
          val allowed = props.map(_._1)
          val keys = json_object_keys(get_json_object(ctx.json, path))
          when(tag === "object" &&
            exists(keys, k => !k.isin(allowed.map(x => x: Any): _*)),
            lit(s"additional properties at $path"))
        }
        val childErrs = props.flatMap { case (name, t) =>
          collectErrors(ctx, t, s"$path.$name")
        }
        shapeErr ++ reqErrs ++ addlErrs ++ childErrs
      case SArray(item) =>
        Seq(when(present(tag) && tag =!= "array", lit(s"not an array at $path"))) ++
          collectErrors(ctx, item, s"$path[0]")
      case SString(pattern) =>
        Seq(when(present(tag) && tag =!= "string", lit(s"not a string at $path"))) ++
          pattern.toSeq.map { p =>
            when(tag === "string" && !get_json_object(ctx.json, path).rlike(p),
              lit(s"pattern mismatch at $path"))
          }
      case SNumber =>
        Seq(when(present(tag) && tag =!= "number", lit(s"not a number at $path")))
      case SInteger =>
        Seq(
          when(present(tag) && tag =!= "number", lit(s"not an integer at $path")),
          when(tag === "number" &&
            !get_json_object(ctx.json, path).rlike("^-?[0-9]+$"),
            lit(s"not an integer at $path")))
      case SBoolean =>
        Seq(when(present(tag) && tag =!= "boolean", lit(s"not a boolean at $path")))
      case SAny => Nil
    }
  }

  /** Element-wise required checks over the typed parse (`from_json` yields
    * null for missing fields — and for type-mismatched ones, which are
    * equally invalid under the reference's schema, so the valid/invalid
    * verdict is preserved). */
  private def elementErrors(c: Column, node: SchemaNode, path: String): Seq[Column] =
    node match {
      case SObject(props, _, _) =>
        props.flatMap { case (name, t) =>
          elementErrors(c.getField(name), t, s"$path.$name")
        }
      case SArray(SObject(props, required, _)) =>
        required.map { r =>
          when(c.isNotNull &&
            exists(c, e => e.getField(r).isNull),
            lit(s"missing required $r in an element of $path"))
        }
      case _ => Nil
    }

  /** M6 — `DD-MM-YYYY` semantic date validation
    * (`dateValidator.ts:1-14`): zero-padded regex + real-calendar
    * round-trip. `try_to_date` (ANSI-safe) already rejects 31-02. */
  def validDate(c: Column): Column =
    c.rlike("^(0[1-9]|[12][0-9]|3[01])-(0[1-9]|1[012])-([0-9]{4})$") &&
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
