package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Viterbi kernel callable from generated code. */
object ViterbiKernel {

  /** Min-cost segmentation of a word under an integer piece-cost table
    * (the unigram-LM tokenizer's decode step, Kudo 2018). Integer costs
    * make the DP exact and engine-independent — the DuckDB oracle runs
    * the same recurrence as unrolled SQL and must land on the same path.
    *
    * Recurrence: `best(i) = min over j in [i-maxPieceLen, i) of
    * best(j) + cost(w[j..i))`, ties broken to the SMALLEST j (the longest
    * final piece) by iterating j ascending with a strict `<` — mirrored
    * in SQL by `ORDER BY cost, j` rank 1. Positions are Unicode CODE
    * POINTS, matching `substr`/`len` semantics in both engines (Java
    * String.substring counts UTF-16 units, which diverges on non-BMP
    * input). Returns null when no piece path covers the word (a vocab
    * missing one of the word's characters) — callers decide whether
    * that's a drop or an error. */
  def segment(w: UTF8String, vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int): ArrayData = {
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val INF = Long.MaxValue
    val best = Array.fill(n + 1)(INF)
    best(0) = 0L
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != INF) {
          val c = vocab.get(new String(cps, j, i - j))
          // strict < with ascending j: the smallest j wins cost ties
          if (c != null && best(j) + c < best(i)) {
            best(i) = best(j) + c
            back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == INF) return null
    var k = n
    var out = List.empty[UTF8String] // backtrace walks right-to-left; prepend restores order
    while (k > 0) {
      val j = back(k)
      out = UTF8String.fromString(new String(cps, j, k - j)) :: out
      k = j
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** Unigram-LM Viterbi segmentation as a codegen'd expression: one DP per
  * word against a driver-side integer cost table (bounded model metadata,
  * embedded as a reference object — the compositional alternative would
  * be an O(len²) HOF chain re-evaluated interpretively per row). Applied
  * to the DISTINCT-word relation during training/scoring, so the kernel
  * cost is O(|vocab words| · len · maxPieceLen), never per-occurrence. */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
                          maxPieceLen: Int) extends UnaryExpression {

  @transient private lazy val map: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true // null input OR no covering path

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _ if maxPieceLen <= 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_segment needs maxPieceLen > 0, got $maxPieceLen")
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram_segment expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    ViterbiKernel.segment(input.asInstanceOf[UTF8String], map, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniVocab", map, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.plans.ViterbiKernel.segment($a, $ref, $maxPieceLen);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ViterbiExpression {
  def unigramSegment(word: Column, vocab: Seq[(String, Long)],
                     maxPieceLen: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(UnigramSegment(bridge.expression(word), vocab, maxPieceLen))
  }
}
