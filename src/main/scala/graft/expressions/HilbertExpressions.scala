package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Hilbert curve index for 2-D layout clustering (Hilbert 1891; the
  * xy2d walk is the standard iterative rotate-and-accumulate form,
  * e.g. Wikipedia "Hilbert curve — Applications and mapping
  * algorithms"). Against Morton/Z-order (ZOrder.mortonCode), Hilbert
  * has no diagonal seams: every unit step of the index moves to a
  * grid NEIGHBOR, so equal index ranges tile into tighter bounding
  * boxes — better min/max skipping for the same file count.
  *
  * Codegen calls the static walk directly (one tight loop per row,
  * no boxing); interpreted eval shares the same method, so both
  * paths are bit-identical.
  */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_2d expects (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex2D.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.expressions.HilbertIndex2D.xy2d($bits, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2D =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2D {
  /** Iterative xy2d: fold each bit plane from the top, rotating the
    * quadrant frame as the curve recurses. Inputs must lie in
    * [0, 2^bits); the caller clamps (pmod) upstream.
    */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

object HilbertFunctions {
  /** hilbert_2d(x, y): the Hilbert index as a codegen'd Column. */
  def hilbert2d(x: Column, y: Column, bits: Int): Column =
    Bridge.column(HilbertIndex2D(Bridge.expression(x), Bridge.expression(y), bits))
}
