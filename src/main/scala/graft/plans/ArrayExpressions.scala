package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity of two SORTED long arrays (set semantics), as a
  * fused merge-scan: |A∩B| / |A∪B| in one O(n+m) pass, no intermediate
  * array allocation. The higher-order `array_intersect`/`array_union`
  * formulation builds two hash sets and two arrays per row outside
  * whole-stage codegen — this kernel replaces it on the dedup-verify hot
  * path (exact n-gram Jaccard over hashed shingles).
  *
  * Inputs MUST be sorted ascending and duplicate-free (the persisted
  * shingle table stores them that way); both engines then agree exactly.
  */
case class SortedArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard expects array<bigint>, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    if (n == 0 && m == 0) return 1.0
    var i = 0; var j = 0; var inter = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |if ($n == 0 && $m == 0) { ${ev.value} = 1.0; } else {
         |  int $i = 0; int $j = 0; long $inter = 0L;
         |  while ($i < $n && $j < $m) {
         |    long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |    if ($xv == $yv) { $inter++; $i++; $j++; }
         |    else if ($xv < $yv) { $i++; } else { $j++; }
         |  }
         |  ${ev.value} = ((double) $inter) / ($n + $m - $inter);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayExpressions {
  def sortedJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(SortedArrayJaccard(bridge.expression(a), bridge.expression(b)))
  }
}
