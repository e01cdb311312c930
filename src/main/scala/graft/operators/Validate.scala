package graft.operators

import graft.functions.{JsonSchema, SchemaNode}
import graft.functions.SchemaNode._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** M5/M6 — runtime schema validation compiled to Catalyst predicates.
  *
  * The reference validates every write against the runtime-registered JSON
  * Schema (`/root/reference/src/utils/apiLogicForCRUD.ts:112-120`, 400 on
  * failure) and separately enforces that `creationDate` is a *real*
  * `DD-MM-YYYY` calendar date (`dateValidator.ts:1-14` — the regex alone
  * admits 31-02-2020). Here a [[SchemaNode]] compiles once into an array of
  * error expressions over a JSON-string column; a batch of documents is
  * validated in a single codegen'd projection, and the 400 path is a
  * `where(size(errors) > 0)` rejects split.
  *
  * Checks implemented (the subset `schema.txt` exercises):
  *  - well-formed JSON;
  *  - `required` properties present at every nesting level;
  *  - `additionalProperties: false` — no keys outside `properties`;
  *  - numeric/boolean/array type conformance (lexical check on the raw
  *    JSON value);
  *  - string `pattern` via `rlike`;
  *  - [[validDate]] — semantic calendar check (M6).
  */
object Validate {

  /** Error expressions for a JSON-string column against `schema`.
    *
    * Two layers of checks:
    *  - lexical (get_json_object over the raw string): required /
    *    additionalProperties / type / pattern at every non-array path,
    *    plus the FIRST array element (dotted-path indexing cannot iterate
    *    unknown-length arrays);
    *  - structural (one `from_json` typed parse): required fields checked
    *    across ALL array elements with `exists` — so a bad 7th child is
    *    caught, not just a bad first one.
    */
  def errors(jsonCol: Column, schema: SchemaNode): Column = {
    val errs = collectErrors(jsonCol, schema, "$")
    val typed = from_json(jsonCol, JsonSchema.sparkType(schema))
    val deepErrs = elementErrors(typed, schema, "$")
    val malformed = when(
      from_json(jsonCol, StructType(Nil).add("__corrupt", "string"),
        Map("columnNameOfCorruptRecord" -> "__corrupt")).getField("__corrupt").isNotNull,
      lit("malformed json"))
    array_compact(array(malformed +: (errs ++ deepErrs): _*))
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
        val perElem = required.map { r =>
          when(c.isNotNull &&
            exists(c, e => e.getField(r).isNull),
            lit(s"missing required $r in an element of $path"))
        }
        // recurse into nested objects of elements is covered lexically for
        // [0]; element-wise nesting would repeat this pattern with flatten
        perElem
      case _ => Nil
    }

  private def collectErrors(c: Column, node: SchemaNode, path: String): Seq[Column] =
    node match {
      case SObject(props, required, additional) =>
        val here = get_json_object(c, path)
        val keys = json_object_keys(here)
        val reqErrs = required.map { r =>
          when(here.isNotNull && get_json_object(c, s"$path.$r").isNull,
            lit(s"missing required $path.$r"))
        }
        val addlErrs = if (additional) Nil else Seq {
          val allowed = props.map(_._1)
          when(here.isNotNull &&
            exists(keys, k => !k.isin(allowed.map(x => x: Any): _*)),
            lit(s"additional properties at $path"))
        }
        val childErrs = props.flatMap { case (name, t) =>
          collectErrors(c, t, s"$path.$name")
        }
        reqErrs ++ addlErrs ++ childErrs
      case SArray(item) =>
        // lexical array check + first-element structural check
        Seq(when(get_json_object(c, path).isNotNull &&
          !get_json_object(c, path).startsWith("["),
          lit(s"not an array at $path"))) ++
          collectErrors(c, item, s"$path[0]")
      case SString(pattern) =>
        pattern.toSeq.map { p =>
          when(get_json_object(c, path).isNotNull &&
            !get_json_object(c, path).rlike(p), lit(s"pattern mismatch at $path"))
        }
      case SNumber =>
        Seq(when(get_json_object(c, path).isNotNull &&
          !get_json_object(c, path).rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"),
          lit(s"not a number at $path")))
      case SInteger =>
        Seq(when(get_json_object(c, path).isNotNull &&
          !get_json_object(c, path).rlike("^-?[0-9]+$"),
          lit(s"not an integer at $path")))
      case SBoolean =>
        Seq(when(get_json_object(c, path).isNotNull &&
          !get_json_object(c, path).isin("true", "false"),
          lit(s"not a boolean at $path")))
      case SAny => Nil
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
