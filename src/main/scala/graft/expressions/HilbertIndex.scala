package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 2-D Hilbert curve index (xy2d) —
  * the second codegen expression after [[CosineSimilarity]], and the
  * locality key q160's layout query sorts on (SURVEY.md §4.2#2).
  *
  * Why an expression and not SQL: the standard xy2d iteration REWRITES
  * (x, y) each round (quadrant reflection + swap) — per-round mutable
  * state that SQL can only express as `bits` chained CTE stages (exactly
  * what the ORACLE does, so the two derivations stay independent). Here it
  * is one tight branch-free-ish loop inside whole-stage codegen.
  *
  * Algorithm: the classic bit-interleaved quadrant walk — per level `s`
  * (from 2^(bits-1) down to 1) take quadrant bits (rx, ry), add
  * `s²·((3·rx) XOR ry)` cells, and rotate/reflect the frame into the
  * sub-quadrant (on ry = 0: reflect both coordinates when rx = 1, then
  * swap x↔y). Inputs are masked to `bits` bits, so out-of-grid ids wrap
  * rather than corrupt the walk. Output fits in a long for bits ≤ 31
  * (d < 4^bits).
  *
  * Versus z-order (q74): both interleave bits so range-partitioned files
  * get tight (x, y) envelopes; Hilbert additionally guarantees consecutive
  * index values are GRID NEIGHBORS (no z-shape jumps), which tightens the
  * per-file envelopes further — the property HilbertIndexSpec proves
  * exhaustively on the 16×16 grid.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"hilbert_index requires 1 <= bits <= 31, got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val n = 1L << bits
    var x = a.asInstanceOf[Long] & (n - 1)
    var y = b.asInstanceOf[Long] & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $n = 1L << $bits;
         |long $x = $a & ($n - 1);
         |long $y = $b & ($n - 1);
         |long $d = 0L;
         |for (long $s = $n >> 1; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $n - 1 - $x; $y = $n - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertFunctions {
  /** Hilbert curve index of two bigint columns on the 2^bits grid
    * (codegen'd). */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    column(HilbertIndex(expression(x), expression(y), bits))
}
