package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Runtime JSON Schema (draft-04 subset) — the reference's schema system.
  *
  * The reference stores a client-POSTed JSON Schema and validates every
  * write against it with the `jsonschema` npm package
  * (`/root/reference/src/utils/apiLogicForCRUD.ts:112-120,417-425`;
  * operative schema `/root/reference/schema.txt:1-57`). We parse the same
  * subset that schema exercises — `type`, `properties`, `items`,
  * `required`, `additionalProperties`, `pattern`, `$ref`/`definitions` —
  * into an ADT that (a) compiles to a Spark `StructType` for `from_json`
  * ingestion and (b) compiles to validation predicate columns
  * ([[Validate]]).
  *
  * Jackson is used for the one-time parse of the schema *document* (it
  * ships with Spark); per-row validation is pure Catalyst expressions.
  */
sealed trait SchemaNode
object SchemaNode {
  final case class SObject(props: Seq[(String, SchemaNode)], required: Seq[String],
                           additionalProps: Boolean) extends SchemaNode
  final case class SArray(item: SchemaNode) extends SchemaNode
  final case class SString(pattern: Option[String]) extends SchemaNode
  final case object SNumber extends SchemaNode
  final case object SInteger extends SchemaNode
  final case object SBoolean extends SchemaNode
  /** Unconstrained value (e.g. an array schema with no `items`). */
  final case object SAny extends SchemaNode
}

object JsonSchema {
  import SchemaNode._

  def parse(schemaJson: String): SchemaNode = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(schemaJson)
    val defs = Option(root.get("definitions"))
    parseNode(root, root, defs, 0)
  }

  /** Schemas are client-POSTed, so a recursive `$ref` (legal draft-04,
    * accepted by the reference's `jsonschema` package) must not drive this
    * eager expansion into a StackOverflowError — refuse past a depth no
    * real document schema reaches. */
  private val MaxDepth = 64

  private def parseNode(n: JsonNode, root: JsonNode, defs: Option[JsonNode],
                        depth: Int): SchemaNode = {
    if (depth > MaxDepth)
      throw new IllegalArgumentException(
        s"schema nesting exceeds depth $MaxDepth (recursive $$ref?)")
    val resolved = Option(n.get("$ref")) match {
      case Some(ref) =>
        // draft-04 local refs only: "#/definitions/name"
        val name = ref.asText().stripPrefix("#/definitions/")
        defs.flatMap(d => Option(d.get(name)))
          .getOrElse(throw new IllegalArgumentException(s"unresolvable $$ref: ${ref.asText()}"))
      case None => n
    }
    Option(resolved.get("type")).map(_.asText()).getOrElse("object") match {
      case "object" =>
        val props = Option(resolved.get("properties")).map { p =>
          p.properties().asScala.toSeq.map(e => e.getKey -> parseNode(e.getValue, root, defs, depth + 1))
        }.getOrElse(Nil)
        val required = Option(resolved.get("required"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
        val addl = Option(resolved.get("additionalProperties")).forall(_.asBoolean(true))
        SObject(props, required, addl)
      case "array" =>
        // draft-04 allows omitting `items` (unconstrained elements)
        SArray(Option(resolved.get("items"))
          .map(parseNode(_, root, defs, depth + 1)).getOrElse(SAny))
      case "string" =>
        SString(Option(resolved.get("pattern")).map(_.asText()))
      case "number"  => SNumber
      case "integer" => SInteger
      case "boolean" => SBoolean
      case other => throw new IllegalArgumentException(s"unsupported schema type: $other")
    }
  }

  /** The Spark schema this JSON Schema describes — used with `from_json`
    * to ingest documents (`SURVEY.md` §1.4: runtime JSON Schema →
    * runtime-built `StructType`). */
  def sparkType(node: SchemaNode): DataType = node match {
    case SObject(props, _, _) =>
      StructType(props.map { case (name, t) => StructField(name, sparkType(t)) })
    case SArray(item)   => ArrayType(sparkType(item))
    case SString(_)     => StringType
    case SNumber        => DoubleType
    case SInteger       => LongType
    case SBoolean       => BooleanType
    case SAny           => StringType // raw JSON text of the value
  }
}
