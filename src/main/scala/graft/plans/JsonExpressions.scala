package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JSON type inspection for precise draft-04 validation.
  *
  * `get_json_object` strips quotes from scalar strings, so a lexical check
  * cannot distinguish `"copay": "12"` (a string — the reference's
  * validator 400s it against `"type": "number"`) from `"copay": 12`. This
  * expression parses the document ONCE per row (Jackson, thread-local
  * mapper) and returns the JSON type tag at each requested dotted path:
  * `object | array | string | number | boolean | null | missing |
  * malformed`.
  *
  * CodegenFallback: validation is an ingest-gate projection, not an
  * analytical hot path; one interpreted call per row that replaces
  * N `get_json_object` parses is a net win anyway.
  */
case class JsonPathTypes(child: Expression, paths: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"json_path_types expects a string column, got $t")
    }

  @transient private lazy val mapper = new ObjectMapper()
  // pre-split dotted paths ("$.a.b[0].c" → a, b, [0], c)
  @transient private lazy val steps: Seq[Array[String]] =
    paths.map(_.stripPrefix("$").split("[.\\[]").filter(_.nonEmpty)
      .map(_.stripSuffix("]")))

  private def typeTag(n: JsonNode): String =
    if (n == null) "missing"
    else if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "string"
    else if (n.isNumber) "number"
    else if (n.isBoolean) "boolean"
    else "null"

  override def nullSafeEval(input: Any): Any = {
    val root: JsonNode =
      try mapper.readTree(input.toString)
      catch { case _: Exception => null }
    val tags = steps.map { path =>
      if (root == null) "malformed"
      else {
        var cur: JsonNode = root
        path.foreach { step =>
          if (cur != null) {
            cur =
              if (step.forall(_.isDigit) && cur.isArray) cur.get(step.toInt)
              else cur.get(step)
          }
        }
        typeTag(cur)
      }
    }
    new GenericArrayData(tags.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonExpressions {
  def jsonPathTypes(json: Column, paths: Seq[String]): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(JsonPathTypes(bridge.expression(json), paths))
  }
}
