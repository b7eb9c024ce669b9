package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for multilingual corpora — the step a
  * crawl pipeline runs before tokenizing or fingerprinting, because the
  * same visible text arrives in mixed forms (composed é vs e+combining
  * accent; the dedup stack would treat them as different documents).
  *
  * Two scan-local, codegen'd expressions:
  *   - `nfc_norm(s)`    — canonical composition (NFC): combining
  *                        sequences collapse to their precomposed
  *                        code points; visually-identical strings become
  *                        byte-identical. DuckDB's `nfc_normalize` is the
  *                        oracle twin.
  *   - `strip_accents(s)` — NFD decomposition, then remove combining
  *                        marks (Mn), then NFC re-compose: é→e, ü→u,
  *                        ñ→n. DuckDB's `strip_accents` agrees on Latin
  *                        accent sequences (the gate's fixture domain).
  *
  * Normalizing 100 TB is one pass, no shuffle — both expressions inline
  * into whole-stage codegen like the other graft text expressions.
  */
object UnicodeNormUtil {

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  private val combining = "\\p{Mn}+".r

  def stripAccents(s: UTF8String): UTF8String = {
    val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val stripped = combining.replaceAllIn(decomposed, "")
    UTF8String.fromString(
      Normalizer.normalize(stripped, Normalizer.Form.NFC))
  }
}

/** `nfc_norm(string) -> string` — canonical composition. */
case class NfcNorm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_norm requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_norm"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeNormUtil.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNorm =
    copy(child = newChild)
}

/** `strip_accents(string) -> string` — NFD, drop Mn marks, NFC. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_accents requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.UnicodeNormUtil.stripAccents($c)")
  override protected def withNewChildInternal(
      newChild: Expression): StripAccents =
    copy(child = newChild)
}

object UnicodeNorm {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_norm"),
      new ExpressionInfo(classOf[NfcNorm].getName, "nfc_norm"),
      (children: Seq[Expression]) => NfcNorm(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => StripAccents(children.head))
  }
}
