package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-derived integer hashing of a whole string array in one
  * evaluation: value-identical to
  * transform(arr, x -> conv(substr(md5(x), 1, 8|15), 16, 10)) but
  * ~an order of magnitude cheaper — higher-order lambdas are
  * interpreted per element (no codegen), re-evaluating the
  * md5/substr/conv chain through the expression interpreter, while
  * this loop digests bytes directly. (CodegenFallback: the heavy
  * work is the MD5 itself, done natively.)
  *
  * bits = 32: first 8 hex chars of md5 (first 4 digest bytes).
  * bits = 60: first 15 hex chars (first 8 bytes >>> 4).
  */
case class Md5IntArray(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits == 32 || bits == 60, s"unsupported bits: $bits")

  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_int_array expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        out(i) = null // matches transform(arr, md5...): null in, null out
        i += 1
      } else {
      val s = arr.getUTF8String(i)
      md.reset()
      val d = md.digest(s.getBytes)
      out(i) =
        if (bits == 32)
          ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        else {
          // first 15 hex chars = big-endian first 8 bytes >>> 4
          var v = 0L
          var j = 0
          while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
          v >>> 4
        }
      i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5IntArray =
    copy(child = newChild)
}

object HashFunctions {
  /** transform(arr, md5Int32) as one native evaluation. */
  def md5_int_array32(arr: Column): Column =
    Bridge.column(Md5IntArray(Bridge.expression(arr), 32))

  /** transform(arr, md5Int60) as one native evaluation. */
  def md5_int_array60(arr: Column): Column =
    Bridge.column(Md5IntArray(Bridge.expression(arr), 60))
}
