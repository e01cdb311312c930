package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.functions.SchemaNode
import graft.functions.SchemaNode._
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
    val root: JsonNode = {
      val parsed =
        try mapper.readTree(input.toString)
        catch { case _: Exception => null }
      // Jackson ≥2.10 parses ""/whitespace to MissingNode instead of
      // throwing — that's an unparseable document, not a JSON null
      if (parsed != null && parsed.isMissingNode) null else parsed
    }
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

/** Whole-schema validation in ONE Jackson parse per row.
  *
  * [[graft.operators.Validate]] used to compose ~N `element_at` references
  * over a single [[JsonPathTypes]] column — but Catalyst project collapsing
  * re-inlines the CodegenFallback subtree into every reference, so the
  * physical plan carried N copies of the parse (measured ~9× on the m5
  * schema). This expression fuses the whole draft-04 check — required /
  * additionalProperties / per-path type conformance / `pattern` /
  * element-wise array required — into one tree walk, so the parse count is
  * 1/row no matter how the plan is rewritten. The checker closures are
  * compiled once per expression instance (schema recursion, regex compile,
  * message `UTF8String`s) — per-row work is the parse plus cheap tag tests.
  *
  * Semantics match the previous expression composition, with one
  * deliberate tightening: an array containing a JSON-null or non-object
  * element now always flags the element-wise `required` check, whereas
  * the old `from_json` path's verdict in that corner depended on
  * PERMISSIVE partial-result behavior (a bad element could null the whole
  * array and yield NO error). The stricter verdict is the one the
  * reference's validator gives (invalid element → 400), and ValidateSpec
  * pins it. The rest:
  *  - the malformed case yields the single error `malformed json`;
  *  - an explicit JSON `null` satisfies `required` but fails its type check
  *    (draft-04);
  *  - structural type checks under an array recurse into element 0 (the
  *    lexical `$path[0]` convention), while `required`-ness of array
  *    *elements* is checked across the whole array with `from_json`'s
  *    field-level semantics: a required field counts as missing when
  *    absent, JSON-null, or inconvertible to the schema's Spark type
  *    (partial-result nulling), and a non-object element is entirely null;
  *  - `pattern` matches with Java regex `find()` (the `rlike` contract).
  */
case class JsonSchemaErrors(child: Expression, schema: SchemaNode)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"json_schema_errors expects a string column, got $t")
    }

  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val malformedMsg = UTF8String.fromString("malformed json")
  @transient private lazy val structural = compileStructural(schema, "$")
  @transient private lazy val deep = compileDeep(schema, "$")

  private type Buf = scala.collection.mutable.ArrayBuffer[Any]
  private type Chk = (JsonNode, Buf) => Unit
  private val noop: Chk = (_, _) => ()

  private def msg(s: String): UTF8String = UTF8String.fromString(s)

  private def all(checks: Seq[Chk]): Chk =
    checks.filterNot(_ eq noop) match {
      case Seq() => noop
      case Seq(one) => one
      case many => val arr = many.toArray; (n, b) => { var i = 0; while (i < arr.length) { arr(i)(n, b); i += 1 } }
    }

  /** `n` is the node at `path`, or Java null when missing — the analogue of
    * the old per-path type tags (`NullNode` = present, tag "null"). */
  private def compileStructural(node: SchemaNode, path: String): Chk = node match {
    case SObject(props, required, additional) =>
      val notObj = msg(s"not an object at $path")
      val reqs = required.map { r => (r, msg(s"missing required $path.$r")) }.toArray
      val addl =
        if (additional) noop
        else {
          val allowed = props.map(_._1).toSet
          val m = msg(s"additional properties at $path")
          (n: JsonNode, b: Buf) =>
            if (n != null && n.isObject) {
              val it = n.fieldNames()
              var bad = false
              while (!bad && it.hasNext) bad = !allowed.contains(it.next())
              if (bad) { b += m; () }
            }
        }
      val children = props.map { case (name, t) =>
        val chk = compileStructural(t, s"$path.$name")
        if (chk eq noop) noop
        else (n: JsonNode, b: Buf) =>
          chk(if (n != null && n.isObject) n.get(name) else null, b)
      }
      all(Seq[Chk](
        (n, b) => if (n != null && !n.isObject) { b += notObj; () },
        (n, b) => if (n != null && n.isObject) {
          var i = 0
          while (i < reqs.length) { if (n.get(reqs(i)._1) == null) b += reqs(i)._2; i += 1 }
        },
        addl) ++ children)
    case SArray(item) =>
      val notArr = msg(s"not an array at $path")
      val elem0 = compileStructural(item, s"$path[0]")
      all(Seq[Chk](
        (n, b) => if (n != null && !n.isArray) { b += notArr; () },
        if (elem0 eq noop) noop
        else (n, b) => elem0(
          if (n == null) null
          else if (n.isArray) n.get(0)
          else n.get("0"), b)))
    case SString(pattern) =>
      val notStr = msg(s"not a string at $path")
      val pat = pattern.map { p =>
        (java.util.regex.Pattern.compile(p), msg(s"pattern mismatch at $path"))
      }
      all(Seq[Chk](
        (n, b) => if (n != null && !n.isTextual) { b += notStr; () }) ++
        pat.toSeq.map[Chk] { case (re, m) =>
          (n, b) => if (n != null && n.isTextual && !re.matcher(n.textValue()).find()) { b += m; () }
        })
    case SNumber =>
      val m = msg(s"not a number at $path")
      (n, b) => if (n != null && !n.isNumber) { b += m; () }
    case SInteger =>
      // mirrors the old pair of checks: wrong JSON type, then a lexical
      // integer test on the number's text (12.0 and 1e3 both fail it)
      val m = msg(s"not an integer at $path")
      (n, b) => if (n != null) {
        if (!n.isNumber) { b += m; () }
        else if (!n.isIntegralNumber) { b += m; () }
      }
    case SBoolean =>
      val m = msg(s"not a boolean at $path")
      (n, b) => if (n != null && !n.isBoolean) { b += m; () }
    case SAny => noop
  }

  /** Can `v` convert to the `from_json` Spark type of `t` without nulling
    * (partial-result semantics)? Strings take any token (the parser writes
    * the raw JSON of non-string values). */
  private def convertible(v: JsonNode, t: SchemaNode): Boolean = t match {
    case SString(_) | SAny => true
    case SNumber => v.isNumber
    case SInteger => v.isIntegralNumber && v.canConvertToLong
    case SBoolean => v.isBoolean
    case _: SObject => v.isObject
    case _: SArray => v.isArray
  }

  /** The old `elementErrors` over `from_json`: required-ness across WHOLE
    * arrays of objects, one level deep, field-null under partial-result
    * conversion. */
  private def compileDeep(node: SchemaNode, path: String): Chk = node match {
    case SObject(props, _, _) =>
      all(props.map { case (name, t) =>
        val chk = compileDeep(t, s"$path.$name")
        if (chk eq noop) noop
        else (n: JsonNode, b: Buf) =>
          chk(if (n != null && n.isObject) n.get(name) else null, b)
      })
    case SArray(SObject(props, required, _)) =>
      val reqs = required.map { r =>
        (r, props.collectFirst { case (`r`, t) => t }.getOrElse(SAny),
          msg(s"missing required $r in an element of $path"))
      }.toArray
      if (reqs.isEmpty) noop
      else (n, b) => if (n != null && n.isArray) {
        var i = 0
        while (i < reqs.length) {
          val (r, t, m) = reqs(i)
          val it = n.elements()
          var bad = false
          while (!bad && it.hasNext) {
            val e = it.next()
            bad = e.isNull || !e.isObject || {
              val v = e.get(r)
              v == null || v.isNull || !convertible(v, t)
            }
          }
          if (bad) b += m
          i += 1
        }
      }
    case _ => noop
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    // a NULL document is an absent body: it must FAIL validation (the
    // reference 400s it), not sail through with zero errors
    if (v == null) return new GenericArrayData(Array[Any](malformedMsg))
    val root: JsonNode =
      try mapper.readTree(v.toString)
      catch { case _: Exception => null }
    // null = parse error; MissingNode = Jackson ≥2.10's verdict on
    // ""/whitespace-only input — both are unparseable documents
    if (root == null || root.isMissingNode)
      return new GenericArrayData(Array[Any](malformedMsg))
    val buf = new scala.collection.mutable.ArrayBuffer[Any](4)
    structural(root, buf)
    // from_json unwraps a JSON array root into its first object row (empty
    // or non-object-headed arrays parse to null)
    val typedRoot =
      if (root.isArray) { val h = root.get(0); if (h != null && h.isObject) h else null }
      else root
    deep(typedRoot, buf)
    new GenericArrayData(buf.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    throw new IllegalStateException("eval is overridden")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** M1 at the JSON-string level — the reference's merge applied where an
  * ABSENT patch member and an explicit JSON `null` are still different
  * things (`/root/reference/src/utils/modifyObject.ts:52-60` assigns
  * `newObject[key]` wholesale for every PRESENT key — so explicit null
  * OVERWRITES the stored value with null, while an absent key keeps it;
  * note this is assignment, not RFC 7386's member delete). The typed
  * [[graft.operators.MergePatch]] cannot express the distinction — after
  * `from_json` both surface as SQL NULL — so this expression parses both
  * strings once (Jackson, same CodegenFallback pattern as
  * [[JsonSchemaErrors]]) and merges the trees directly.
  *
  * Semantics, aligned with the typed operator wherever both are defined:
  *  - root `objectId` is immutable (skipped — `modifyObject.ts:54-56`);
  *  - object ∧ object → recursive merge; any other PRESENT patch member
  *    overwrites wholesale, explicit null included;
  *  - an array pair where every element on both sides is an object and at
  *    least one carries an `objectId` → keyed upsert: stored order kept, a
  *    stored element is replaced wholesale by the FIRST patch element with
  *    the same objectId, patch elements with a new or missing objectId
  *    append in patch order (the typed operator's documented divergence
  *    from the reference's undefined-key Map collapse);
  *  - any other array → wholesale replace (RFC 7386, and the reference's
  *    behavior for non-keyed arrays);
  *  - SQL-NULL patch (no patch row) → target unchanged; NULL or
  *    unparseable or non-object target/patch → NULL (poison — the
  *    caller's 400 gate).
  *
  * Output member order is the JS-object order the reference produces:
  * stored members first (original order, updated in place), genuinely new
  * members appended in patch order. Jackson's ObjectNode preserves
  * insertion order, so serialization is deterministic and the result is
  * oracle-reproducible byte-for-byte.
  */
case class JsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"json_merge_patch expects two string columns, got ($l, $r)")
    }

  @transient private lazy val mapper = new ObjectMapper()

  private def parse(s: String): JsonNode = {
    val n = try mapper.readTree(s) catch { case _: Exception => null }
    if (n != null && n.isMissingNode) null else n
  }

  private def idOf(e: JsonNode): JsonNode = {
    val id = e.get("objectId")
    if (id == null || id.isNull) null else id
  }

  /** Keyed iff every element of BOTH arrays is an object and at least one
    * carries an objectId (the JSON-level analogue of Shred.isNodeArray's
    * schema test). */
  private def isKeyedArray(o: ArrayNode, n: ArrayNode): Boolean = {
    var sawId = false
    var it = o.elements()
    while (it.hasNext) {
      val e = it.next()
      if (!e.isObject) return false
      if (idOf(e) != null) sawId = true
    }
    it = n.elements()
    while (it.hasNext) {
      val e = it.next()
      if (!e.isObject) return false
      if (idOf(e) != null) sawId = true
    }
    sawId
  }

  private def mergeKeyed(o: ArrayNode, n: ArrayNode): ArrayNode = {
    val out = mapper.createArrayNode()
    var it = o.elements()
    while (it.hasNext) {
      val x = it.next()
      val id = idOf(x)
      var repl: JsonNode = null
      if (id != null) {
        val nt = n.elements()
        while (repl == null && nt.hasNext) {
          val y = nt.next()
          val yid = idOf(y)
          if (yid != null && yid == id) repl = y
        }
      }
      out.add((if (repl != null) repl else x).deepCopy[JsonNode]())
    }
    it = n.elements()
    while (it.hasNext) {
      val y = it.next()
      val yid = idOf(y)
      val isNew = yid == null || {
        var seen = false
        val ot = o.elements()
        while (!seen && ot.hasNext) {
          val oid = idOf(ot.next())
          seen = oid != null && oid == yid
        }
        !seen
      }
      if (isNew) out.add(y.deepCopy[JsonNode]())
    }
    out
  }

  private def mergeObj(o: ObjectNode, n: ObjectNode, root: Boolean): ObjectNode = {
    val out = o.deepCopy()
    val fields = n.fields()
    while (fields.hasNext) {
      val e = fields.next()
      val name = e.getKey
      val v = e.getValue
      if (!(root && name == "objectId")) {
        val old = out.get(name)
        if (v.isObject && old != null && old.isObject)
          out.set[ObjectNode](name,
            mergeObj(old.asInstanceOf[ObjectNode], v.asInstanceOf[ObjectNode], root = false))
        else if (v.isArray && old != null && old.isArray &&
            isKeyedArray(old.asInstanceOf[ArrayNode], v.asInstanceOf[ArrayNode]))
          out.set[ObjectNode](name,
            mergeKeyed(old.asInstanceOf[ArrayNode], v.asInstanceOf[ArrayNode]))
        else out.set[ObjectNode](name, v.deepCopy[JsonNode]())
      }
    }
    out
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return null
    val p = right.eval(input)
    if (p == null) return t // no patch: the stored document passes through
    val tn = parse(t.toString)
    val pn = parse(p.toString)
    if (tn == null || !tn.isObject || pn == null || !pn.isObject) return null
    UTF8String.fromString(mapper.writeValueAsString(
      mergeObj(tn.asInstanceOf[ObjectNode], pn.asInstanceOf[ObjectNode], root = true)))
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    throw new IllegalStateException("eval is overridden")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JsonExpressions {
  import org.apache.spark.sql.graft.bridge
  def jsonPathTypes(json: Column, paths: Seq[String]): Column =
    bridge.column(JsonPathTypes(bridge.expression(json), paths))
  def jsonSchemaErrors(json: Column, schema: SchemaNode): Column =
    bridge.column(JsonSchemaErrors(bridge.expression(json), schema))
  def jsonMergePatch(target: Column, patch: Column): Column =
    bridge.column(JsonMergePatch(bridge.expression(target), bridge.expression(patch)))
}
