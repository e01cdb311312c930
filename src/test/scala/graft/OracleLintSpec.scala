package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lexical type-lint over every `oracleSql` entry, guarding the one bug
  * class the value-level gates cannot see: DuckDB's `sum(BIGINT)` returns
  * HUGEINT, and if that 128-bit type reaches an OUTPUT column uncast, the
  * driver's type-sensitive hash goes red even when every value matches
  * Spark's BIGINT exactly (round 12 shipped three such oracles —
  * x_pagerank, x_pagerank_delta, x_mix_temperature — all value-identical,
  * all driver-red).
  *
  * The check is a small taint propagation, not a grep: an alias is
  * HUGEINT-tainted if its column expression contains an integer `sum(`
  * outside any `CAST(...)` scope, or references a tainted alias outside
  * one; taint is laundered by a whole-expression CAST, by decimal-typed
  * sum arguments (both engines widen decimals the same way the driver
  * accepts), or by float arithmetic (true division / float literals turn
  * the result DOUBLE in both engines). The suite fails iff taint reaches
  * a final-SELECT output column — intermediate CTE sums that are cast or
  * float-laundered downstream are legitimate and common (41 of them exist
  * today).
  *
  * Companion guard: tools/diffcheck.py compares the DuckDB logical types
  * of the oracle result against the Spark parquet — exact but only at
  * verify time; this spec is the in-JVM gate that runs with `sbt test`.
  * Deliberately removing the CAST from any of the three round-12 oracles
  * turns this suite red (pinned below). */
class OracleLintSpec extends AnyFunSuite {

  import OracleLint._

  test("no oracle lets an uncast integer sum (DuckDB HUGEINT) reach output") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val bad = lint(sql)
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString("; ")}") else None
    }
    assert(offenders.isEmpty,
      s"\nHUGEINT-tainted output columns (wrap in CAST(... AS BIGINT)):\n  " +
        offenders.mkString("\n  "))
  }

  test("the lint goes red when the round-12 casts are deliberately removed") {
    val pr = SparkEntry.oracleSql("x_pagerank")
    val prUncast = pr.replace(
      "CAST((SELECT (1000000000000 * 15) // (100 * n) FROM n) + (85 * sum(r.r // d.deg)) // 100 AS BIGINT)",
      "(SELECT (1000000000000 * 15) // (100 * n) FROM n) + (85 * sum(r.r // d.deg)) // 100")
    assert(prUncast != pr, "un-cast rewrite failed to apply — oracle text changed?")
    assert(lint(prUncast).nonEmpty, "lint must flag the uncast pagerank rank expr")

    val mt = SparkEntry.oracleSql("x_mix_temperature")
    val mtUncast = mt.replace(
      "CAST(s * 1000000 // (SELECT sum(s) FROM l) AS BIGINT)",
      "s * 1000000 // (SELECT sum(s) FROM l)")
    assert(mtUncast != mt, "un-cast rewrite failed to apply — oracle text changed?")
    assert(lint(mtUncast).nonEmpty, "lint must flag the uncast weight_ppm expr")
  }
}

/** The taint analysis itself — pure string work, no Spark session. */
object OracleLint {

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*"

  /** (start, endExclusive, innerText) of each balanced-paren scope opened
    * by `pat` (whose match must end at the open paren). */
  private def scanScopes(s: String, pat: String): Seq[(Int, Int, String)] = {
    val re = pat.r
    re.findAllMatchIn(s).map { m =>
      var d = 1; var j = m.end
      while (j < s.length && d > 0) {
        if (s(j) == '(') d += 1 else if (s(j) == ')') d -= 1
        j += 1
      }
      (m.start, j, s.substring(m.end, math.max(m.end, j - 1)))
    }.toSeq
  }

  private def splitDepth0(s: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var d = 0; var start = 0
    var j = 0
    while (j < s.length) {
      s(j) match {
        case '(' => d += 1
        case ')' => d -= 1
        case ',' if d == 0 => parts += s.substring(start, j); start = j + 1
        case _ =>
      }
      j += 1
    }
    parts += s.substring(start)
    parts.result()
  }

  /** Column-list text of each `SELECT ... FROM` at depth 0 of `s`
    * (UNION ALL branches each contribute one). */
  private def selectBlocks(s: String): Seq[String] = {
    val blocks = Seq.newBuilder[String]
    var d = 0; var i = 0; var cur = -1
    def wordAt(i: Int, w: String): Boolean =
      s.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !(s(i - 1).isLetterOrDigit || s(i - 1) == '_')) &&
        (i + w.length >= s.length || !(s(i + w.length).isLetterOrDigit || s(i + w.length) == '_'))
    while (i < s.length) {
      s(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      if (d == 0) {
        if (wordAt(i, "SELECT")) cur = i + 6
        else if (wordAt(i, "FROM") && cur >= 0) { blocks += s.substring(cur, i); cur = -1 }
      }
      i += 1
    }
    if (cur >= 0) blocks += s.substring(cur)
    blocks.result()
  }

  private def stripAlias(expr: String): String =
    expr.trim.replaceAll(s"(?is)\\bAS\\s+$Ident\\s*$$", "").trim

  private def colAlias(expr: String): Option[String] = {
    val t = expr.trim
    s"(?is).*\\bAS\\s+($Ident)\\s*$$".r.findFirstMatchIn(t).map(_.group(1))
      .orElse(if (t.matches(Ident)) Some(t) else None)
      .orElse(s"^$Ident\\.($Ident)$$".r.findFirstMatchIn(t).map(_.group(1)))
  }

  /** Split `WITH a AS (...), b AS (...) SELECT ...` into the CTE bodies
    * (in definition order) and the final query text. */
  private def analyze(sql: String): (Seq[String], String) = {
    val s = sql.trim
    val w = "(?is)^\\s*WITH\\s+".r.findFirstMatchIn(s)
    if (w.isEmpty) return (Nil, s)
    val ctes = Seq.newBuilder[String]
    var i = w.get.end
    var done = false
    while (!done) {
      s"(?is)^\\s*($Ident)\\s+AS\\s*\\(".r.findFirstMatchIn(s.substring(i)) match {
        case Some(mm) =>
          var j = i + mm.end; var d = 1
          while (j < s.length && d > 0) {
            if (s(j) == '(') d += 1 else if (s(j) == ')') d -= 1
            j += 1
          }
          ctes += s.substring(i + mm.end, j - 1)
          i = j
          "^\\s*,".r.findFirstMatchIn(s.substring(i)) match {
            case Some(c) => i += c.end
            case None => done = true
          }
        case None => done = true
      }
    }
    (ctes.result(), s.substring(i))
  }

  /** If the whole expression is one `CAST(... AS T)`, return T. */
  private def wholeCastType(body: String): Option[String] = {
    val m = "(?is)^\\s*CAST\\s*\\(".r.findFirstMatchIn(body).getOrElse(return None)
    var j = m.end; var d = 1
    while (j < body.length && d > 0) {
      if (body(j) == '(') d += 1 else if (body(j) == ')') d -= 1
      j += 1
    }
    if (body.substring(j).trim.nonEmpty) return None
    val inner = body.substring(m.end, j - 1)
    var last: Option[String] = None
    "(?i)\\bAS\\s+([A-Za-z]+)".r.findAllMatchIn(inner).foreach { mm =>
      val pre = inner.substring(0, mm.start)
      if (pre.count(_ == '(') == pre.count(_ == ')')) last = Some(mm.group(1).toUpperCase)
    }
    last
  }

  /** (tainted, floatLaundered) for one column expression given the alias
    * taint state accumulated from earlier CTEs. */
  private def exprTaint(expr: String, tainted: Set[String],
                        decimalish: Set[String]): (Boolean, Boolean) = {
    val body = stripAlias(expr)
    wholeCastType(body) match {
      case Some(t) =>
        return (false, t.startsWith("DECIMAL") || t == "DOUBLE" || t == "FLOAT" || t == "REAL")
      case None =>
    }
    val castScopes = scanScopes(body, "(?i)\\bCAST\\s*\\(")
    def covered(p: Int) = castScopes.exists { case (a, b, _) => a <= p && p < b }
    var t = false
    scanScopes(body, "(?i)\\bsum\\s*\\(").foreach { case (a, _, inner) =>
      if (!covered(a)) {
        val arg = inner.trim
        val decArg = "(?i)AS\\s+DECIMAL".r.findFirstIn(arg).isDefined ||
          (arg.matches(s"$Ident(\\.$Ident)?") && decimalish(arg.split('.').last))
        if (!decArg) t = true
      }
    }
    s"\\b($Ident)\\b".r.findAllMatchIn(body).foreach { m =>
      if (tainted(m.group(1)) && !covered(m.start)) t = true
    }
    var dec = false
    "(?<!/)/(?!/)|[0-9]\\.[0-9]".r.findAllMatchIn(body).foreach { m =>
      if (!covered(m.start)) dec = true
    }
    (t, dec)
  }

  /** Output-column expressions of `sql` that a DuckDB HUGEINT can reach
    * uncast — empty for a type-safe oracle. */
  def lint(sql: String): Seq[String] = {
    val (ctes, finalQ) = analyze(sql)
    var tainted = Set.empty[String]
    var decimalish = Set.empty[String]
    ctes.foreach { body =>
      selectBlocks(body).foreach { blk =>
        splitDepth0(blk).foreach { ce =>
          colAlias(ce).foreach { al =>
            val (tt, dd) = exprTaint(ce, tainted, decimalish)
            if (tt) tainted += al
            if (dd) decimalish += al
          }
        }
      }
    }
    selectBlocks(finalQ).flatMap(splitDepth0).flatMap { ce =>
      val (tt, dd) = exprTaint(ce, tainted, decimalish)
      if (tt && !dd) Some(ce.trim.take(70)) else None
    }
  }
}
