package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a native
  * codegen'd predicate: the filter object rides the plan as a codegen
  * reference (the same mechanism Spark's own runtime row-level
  * filtering uses), so the probe is one virtual call per row inside
  * WholeStageCodegen — no UDF, no serialization per batch.
  *
  * May return true for absent keys (the Bloom false-positive rate);
  * never false for present ones. Callers MUST re-verify positives
  * with an exact join — see RuntimeFilter.bloomPrunedEquiJoin, which
  * makes the final result exact regardless of fpp.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_long expects bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomFunctions {
  /** bloom.mightContainLong(key) as a codegen'd Column predicate. */
  def mightContainLong(key: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(key), bloom))
}
