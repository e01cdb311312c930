package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Fused PQ encode kernel: all `m` nearest-code assignments in one pass.
  *
  * The compositional form (per subspace: `array_min(transform(cwLit,
  * struct(round(l2sq(slice(v), cw), 6), code)))`) plans m·kCodes
  * interpreted higher-order l2sq chains per row — 256 lambda-driven
  * vector folds at m=16/kCodes=16, dominating both planning and eval
  * time of the encode projection. This expression computes every
  * subspace's argmin in ONE codegen'd triple loop with zero intermediate
  * allocation.
  *
  * Bit-compat contract with the compositional form (and therefore with
  * the DuckDB LUT-join oracle replay):
  *  - squared-L2 is the same left fold in element order
  *    (`acc + (x-cw)²`, doubles);
  *  - each distance is rounded with the cross-engine-deterministic
  *    floor form `floor(d·1e6 + 0.5)/1e6` ([[graft.functions.DetRound]]):
  *    pure IEEE double ops, so the DuckDB replay's identical expression
  *    lands on identical doubles, representation ties included
  *    (NaN/Infinity propagate through the arithmetic unchanged);
  *  - argmin ties break to the LOWEST code, and NaN ranks greatest
  *    (code 0 first, then strict `Double.compare(d, best) < 0`) —
  *    matching `array_min` struct ordering over (d, code).
  *
  * Codebooks are bounded driver-side metadata (m·kCodes·ds doubles)
  * carried as value-equal Seqs so plan canonicalization/CSE still work;
  * a vector whose length ≠ m·ds yields null (callers pre-filter with
  * validVec, this is the compositional slice's behavior for the rest).
  */
case class PqEncodeCodes(child: Expression, books: Seq[Seq[Seq[Double]]], ds: Int)
    extends UnaryExpression {

  private def m: Int = books.length
  @transient private lazy val flat: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _ if m <= 0 || ds <= 0 || books.exists(_.isEmpty) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs non-empty codebooks and ds > 0 (m=$m, ds=$ds)")
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"pq_encode expects array<double>, got $t")
    }

  private def round6(d: Double): Double =
    Math.floor(d * 1000000.0 + 0.5) / 1000000.0

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != m * ds) return null
    val v = arr.toDoubleArray()
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cws = flat(j)
      var bc = 0
      var best = 0.0
      var c = 0
      while (c < cws.length) {
        val cw = cws(c)
        var acc = 0.0
        var t = 0
        while (t < ds) {
          val diff = v(j * ds + t) - cw(t)
          acc = acc + diff * diff
          t += 1
        }
        val d = round6(acc)
        if (c == 0 || java.lang.Double.compare(d, best) < 0) { bc = c; best = d }
        c += 1
      }
      codes(j) = bc
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.addReferenceObj("pqBooks", flat, "double[][][]")
      val v = ctx.freshName("v"); val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val t = ctx.freshName("t")
      val cws = ctx.freshName("cws"); val cw = ctx.freshName("cw")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val bc = ctx.freshName("bc"); val best = ctx.freshName("best")
      val diff = ctx.freshName("diff")
      s"""
         |if ($a.numElements() != ${m * ds}) { ${ev.isNull} = true; } else {
         |  double[] $v = $a.toDoubleArray();
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double[][] $cws = $b[$j];
         |    int $bc = 0;
         |    double $best = 0.0;
         |    for (int $c = 0; $c < $cws.length; $c++) {
         |      double[] $cw = $cws[$c];
         |      double $acc = 0.0;
         |      for (int $t = 0; $t < $ds; $t++) {
         |        double $diff = $v[$j * $ds + $t] - $cw[$t];
         |        $acc = $acc + $diff * $diff;
         |      }
         |      double $d = Math.floor($acc * 1000000.0 + 0.5) / 1000000.0;
         |      if ($c == 0 || Double.compare($d, $best) < 0) { $bc = $c; $best = $d; }
         |    }
         |    $codes[$j] = $bc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpression {
  /** `m` nearest-code column (array<int>) for a `array<double>` vector
    * against per-subspace codebooks of `(sub, code, codeword)` floats
    * (the [[graft.ext.Similarity.pqCodebooks]] output shape). Codewords
    * convert float→double exactly as the compositional `typedlit` did. */
  def pqEncode(vec: Column, books: Seq[(Int, Int, Array[Float])], m: Int, ds: Int): Column = {
    val bySub = books.groupBy(_._1).map { case (j, cws) =>
      j -> cws.sortBy(_._2).map(_._3.toSeq.map(_.toDouble))
    }
    pqEncodeDoubles(vec, (0 until m).map(j => bySub(j)), ds)
  }

  /** Same kernel over already-double codebooks indexed [sub][code] — the
    * training-loop form (assignment against the in-progress books). */
  def pqEncodeDoubles(vec: Column, books: Seq[Seq[Seq[Double]]], ds: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(PqEncodeCodes(bridge.expression(vec), books, ds))
  }
}
