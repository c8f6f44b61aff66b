package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a native codegen'd
  * expression — the first step of any text-curation pipeline that
  * joins or dedups on string equality: the same visible text arrives
  * from the web in both precomposed (U+00E9) and decomposed
  * (e + U+0301) forms, and every downstream fingerprint/groupBy key
  * silently splits unless the corpus is normalized first.
  *
  * The JDK's java.text.Normalizer implements the Unicode standard
  * (UAX #15) canonical composition, so results are engine-portable:
  * DuckDB's nfc_normalize (utf8proc) produces byte-identical output,
  * which is what the driver oracle verifies. Codegen calls the static
  * helper directly; interpreted eval shares the same method.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize; the common already-normalized case is detected by
    * Normalizer.isNormalized without allocating the output string.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object UnicodeFunctions {
  /** nfc_normalize(s) as a codegen'd Column. */
  def nfcNormalize(s: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(s)))
}
