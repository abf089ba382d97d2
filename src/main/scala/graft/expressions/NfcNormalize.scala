package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonical-composition pass a multilingual corpus needs before ANY
  * hash-keyed operator (dedup digests, shingle md5s, vocab counts):
  * "café" spelled e+◌́ and é are byte-different, hash-different
  * documents until NFC makes them one. Spark ships no normalization
  * function, and a Scala UDF would pay dispatch + conversion per row
  * on the hottest path there is (every document, every byte), so this
  * is the Expression rung of the ladder: `doGenCode` inlines a call
  * into whole-stage codegen with UTF8String in/out.
  *
  * Already-NFC strings (the overwhelming majority in practice) take
  * a fast path: `Normalizer.isNormalized` over the decoded string,
  * returning the INPUT UTF8String untouched — no re-encode.
  *
  * Cross-engine contract: Unicode canonical composition is fully
  * specified by UAX #15, so the JDK and DuckDB's `nfc_normalize`
  * agree bitwise on every input (the q140 oracle rides on it).
  *
  * SQL name: `graft_nfc(s)` via [[GraftFunctions.registerAll]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects a string argument, got ${other.catalogString}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NfcNormalize {
  /** UTF8String-in/out kernel shared by eval and codegen. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
