package graft.plans

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels callable from generated code. */
object Kernels {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5(s) as a long, mod p — exactly
    * `conv(substring(md5(s), 1, 15), 16, 10) % p` (the first 7.5 digest
    * bytes big-endian, shifted down a nibble). */
  def md5Mod(s: UTF8String, p: Long): Long = {
    val d = mdLocal.get(); d.reset()
    val b = d.digest(s.getBytes)
    val hi =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) | ((b(2) & 0xffL) << 40) |
        ((b(3) & 0xffL) << 32) | ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
        ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    (hi >>> 4) % p
  }

  private val SPACE = UTF8String.fromString(" ")

  /** SimHash over a token array: ONE md5 per token, then `bits` affine
    * parities (Carter-Wegman, same family as MinHash) vote ±1 per bit.
    * Replaces the compositional form's bits×tokens md5 calls. */
  def simhash(tokens: ArrayData, bits: Int, p: Long,
              as: Array[Long], bs: Array[Long]): Long = {
    val votes = new Array[Int](bits)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t) // null slot = no token, no vote
      if (tok != null) {
        val h = md5Mod(tok, p)
        var i = 0
        while (i < bits) {
          if (((h * as(i) + bs(i)) % p & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < bits) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def stopwordScores(tokens: ArrayData, sets: Array[java.util.HashSet[String]]): Array[Int] = {
    val out = new Array[Int](sets.length)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val u = tokens.getUTF8String(t) // null slot = no token, no hit
      if (u != null) {
        val tok = u.toString
        var i = 0
        while (i < sets.length) { if (sets(i).contains(tok)) out(i) += 1; i += 1 }
      }
      t += 1
    }
    out
  }

  def stopwordScoresBoxed(tokens: ArrayData, sets: Array[java.util.HashSet[String]]): Array[AnyRef] =
    stopwordScores(tokens, sets).map(Integer.valueOf).toArray[AnyRef]

  /** Hashed n-word shingles of a token array: md5-mod of each n-gram,
    * sorted ascending, duplicates removed. One pass, one output
    * allocation. */
  def hashedShingles(tokens: ArrayData, n: Int, p: Long): ArrayData = {
    val cnt = tokens.numElements() - (n - 1)
    if (cnt <= 0) return new GenericArrayData(Array.emptyLongArray)
    val buf = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        // a null slot counts as an empty token, keeping the gram width
        // stable (concatWs would silently DROP it, hashing an (n-1)-gram)
        parts(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      buf(i) = md5Mod(UTF8String.concatWs(SPACE, parts: _*), p)
      i += 1
    }
    java.util.Arrays.sort(buf)
    var m = 0
    i = 0
    while (i < cnt) {
      if (i == 0 || buf(i) != buf(i - 1)) { buf(m) = buf(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(buf, 0, m))
  }
}

/** Fused shingle+hash kernel: replaces the interpreted
  * `array_sort(array_distinct(transform(shingles(text), md5…)))` pipeline
  * (HOFs evaluate outside whole-stage codegen, allocating a string per
  * shingle per lambda) with one call into [[Kernels.hashedShingles]].
  * Identical output values — the oracle's
  * `list_sort(list_distinct(list_transform(...)))` matches because
  * hash-of-duplicate-strings dedupes to the same set either side of the
  * distinct. */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _ if n <= 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_shingles needs n > 0, got $n")
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hashed_shingles expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    Kernels.hashedShingles(input.asInstanceOf[ArrayData], n, TextFunctions.MinhashP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Kernels.hashedShingles($a, $n, ${TextFunctions.MinhashP}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused per-language stopword scoring: one pass over the token array
  * counting hits against each language's stopword set (the compositional
  * form re-evaluates the tokenize+filter pipeline once per language per
  * argmax reference — ~15 interpreted passes per row). Output aligns with
  * the constructor's language order. */
case class StopwordScores(child: Expression, stopwordSets: Seq[Seq[String]])
    extends UnaryExpression {

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    stopwordSets.map { ws =>
      val s = new java.util.HashSet[String](); ws.foreach(s.add); s
    }.toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"stopword_scores expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Kernels.stopwordScoresBoxed(
      input.asInstanceOf[ArrayData], sets).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("swSets", sets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.Kernels.stopwordScoresBoxed($a, $setsRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused SimHash kernel over a token array (see [[Kernels.simhash]]).
  * Seed constants come from `TextFunctions.minhashConsts(simhashSeedBase + i)`
  * so the DuckDB oracle can reproduce the exact value. */
case class SimHashTokens(child: Expression, bits: Int) extends UnaryExpression {

  import graft.functions.TextFunctions

  private val as = (0 until bits).map(i => TextFunctions.minhashConsts(TextFunctions.SimhashSeedBase + i)._1).toArray
  private val bs = (0 until bits).map(i => TextFunctions.minhashConsts(TextFunctions.SimhashSeedBase + i)._2).toArray

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _ if bits <= 0 || bits > 64 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash needs 1..64 bits, got $bits") // `1L << i` wraps mod 64,
          // silently folding high-bit votes onto low bits
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    Kernels.simhash(input.asInstanceOf[ArrayData], bits, TextFunctions.MinhashP, as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("simhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("simhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Kernels.simhash($a, $bits, ${TextFunctions.MinhashP}L, $asRef, $bsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpression {
  def hashedShingles(tokens: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(HashedShingles(bridge.expression(tokens), n))
  }
  def simhashTokens(tokens: Column, bits: Int = 32): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(SimHashTokens(bridge.expression(tokens), bits))
  }
  def stopwordScores(tokens: Column, sets: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(StopwordScores(bridge.expression(tokens), sets))
  }
}
