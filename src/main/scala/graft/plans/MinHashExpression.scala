package graft.plans

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass MinHash signature kernel.
  *
  * The compositional form (`k × array_min(transform(hs, affine_i))`) makes
  * k interpreted passes over the hash array — ~32M lambda evaluations at
  * sf0.1. This expression computes all k minima in ONE unrolled codegen'd
  * pass (k·n multiply-add-mod, no allocation until the final signature
  * array). Constants and modulus match
  * [[graft.functions.TextFunctions.minhashConsts]] exactly, so results are
  * bit-identical to the compositional form and to the DuckDB oracle.
  * Empty input ⇒ null signature.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  private val P = TextFunctions.MinhashP
  private val consts: Array[(Long, Long)] =
    (0 until k).map(TextFunctions.minhashConsts).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _ if k <= 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs k > 0, got $k") // negative k would also make
          // eval (empty array) and codegen (new long[k] throws) disagree
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<bigint>, got $t")
    }

  // Inputs are contractually already reduced mod P (hashedShingles), but
  // the SQL surface can't enforce that; reducing again is a no-op for
  // contract-honoring values and keeps h*a inside 62 bits for the rest —
  // without it an unreduced 60-bit hash wraps negative and the signature
  // silently diverges from the (overflow-erroring) DuckDB oracle.
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = ((arr.getLong(i) % P) + P) % P
      var s = 0
      while (s < k) {
        val v = (h * consts(s)._1 + consts(s)._2) % P
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val mins = ctx.freshName("mins")
      val v = ctx.freshName("v")
      val perSeed = consts.zipWithIndex.map { case ((ca, cb), s) =>
        s"""$v = ($h * ${ca}L + ${cb}L) % ${P}L;
           |if ($v < $mins[$s]) $mins[$s] = $v;""".stripMargin
      }.mkString("\n")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = (($a.getLong($i) % ${P}L) + ${P}L) % ${P}L;
         |    long $v;
         |    $perSeed
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpression {
  def minhashSig(hashes: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(MinHashSignature(bridge.expression(hashes), k))
  }
}
