package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Unicode NFC normalization: `nfc_normalize(text)`
  * returns the canonical-composition form of the input — "é" typed as
  * one codepoint (U+00E9) and as "e" + combining acute (U+0065 U+0301)
  * become the SAME string.
  *
  * Why it exists: the dedup identity (d01 and everything sharing its
  * norm) must not treat canonically-equivalent texts as distinct —
  * copy-paste provenance decides composed vs decomposed (macOS file
  * APIs emit NFD, most web content NFC), which is exactly the kind of
  * invisible difference that splits a duplicate family in two. Spark
  * has no normalization builtin, and a Scala UDF would break the
  * whole-stage-codegen span the norm expression sits in; this
  * expression stays codegen'd (one static call, like [[TokenNgrams]]).
  * DuckDB mirror: `nfc_normalize(text)` — both sides implement Unicode
  * canonical composition, so the oracle hash match covers the
  * normalization itself.
  *
  * Fast path: `Normalizer.isNormalized` first — real corpora are
  * overwhelmingly already-NFC ASCII, for which the check is a linear
  * scan with no allocation (ASCII is normalization-invariant), so the
  * common row costs one pass and zero copies; only rows that actually
  * need composing pay the String round-trip. Null in → null out
  * (UnaryExpression's default null-intolerant contract). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = NfcNormalize.Name

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val Name = "nfc_normalize"

  /** Called from generated code — keep the signature stable. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, null, Name,
    "_FUNC_(text) - Unicode canonical composition (NFC) of text",
    "", "", "", "string_funcs", "4.0.0", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(c) => NfcNormalize(c)
    case exprs => throw new IllegalArgumentException(
      s"$Name takes exactly one argument, got ${exprs.size}")
  }
}
