package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen word-n-gram extraction: `token_ngrams(text, n)` returns
  * the ARRAY<STRING> of space-joined windows of `n` consecutive
  * space-delimited tokens, in order, one entry per window position —
  * exactly `split(text, ' ')` → sliding windows → `concat_ws(' ', ...)`,
  * as one per-row expression.
  *
  * Why it exists (the engine's gram/shingle primitive, reference
  * phoenixLab/cpp/include/mapreduce_spec.h:1 scope = word-gram queries):
  * the compositional formulations all pay something structural —
  *   - posexplode + `lead` windows (rounds 1–6): SHUFFLES the entire
  *     token-occurrence stream by doc_id before the window — a
  *     corpus-sized exchange per gram consumer, the single biggest
  *     fixed cost of the near-dup family at 100 TB;
  *   - `transform(sequence(...), i -> concat_ws(' ', slice(...)))`:
  *     shuffle-free but the lambda runs INTERPRETED per element
  *     (measured 2.2× slower than even the shuffle plan on the sf0.1
  *     shingle build).
  * This expression is shuffle-free AND codegen'd. Because the token
  * separator and the gram joiner are both a single space, every n-gram
  * is a CONTIGUOUS BYTE SLICE of the input — one boundary scan per
  * document, one `UTF8String.fromBytes` slice per gram, no token
  * objects, no string concatenation (0x20 never occurs inside a UTF-8
  * multi-byte sequence, so the byte scan is charset-safe).
  *
  * Semantics pinned to Spark's `split(text, ' ', -1)` (empty tokens kept,
  * including trailing): a doc with t tokens yields max(t−n+1, 0) grams;
  * null text → null. LlmOpsSpec proves equivalence to the window
  * formulation on adversarial inputs (empty/trailing/multi-space).
  */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = TokenNgrams.Name

  override def nullSafeEval(input: Any): Any =
    TokenNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call into the scan kernel — stays inside the
    // whole-stage-codegen span (no virtual eval dispatch per row)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenNgrams$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

object TokenNgrams {
  val Name = "token_ngrams"

  /** The scan kernel: token boundaries in one byte pass, then one slice
    * per gram. Called from generated code — keep the signature stable. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val len = b.length
    var spaces = 0
    var i = 0
    while (i < len) { if (b(i) == ' ') spaces += 1; i += 1 }
    val tokens = spaces + 1
    val grams = tokens - n + 1
    if (grams <= 0) return new GenericArrayData(Array.empty[Any])
    // starts(k) = byte offset of token k; ends(k) = offset one past it
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    var tok = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (b(i) == ' ') { ends(tok) = i; tok += 1; starts(tok) = i + 1 }
      i += 1
    }
    ends(tok) = len
    val out = new Array[Any](grams)
    var g = 0
    while (g < grams) {
      out(g) = UTF8String.fromBytes(b, starts(g), ends(g + n - 1) - starts(g))
      g += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TokenNgrams].getName, null, Name,
    "_FUNC_(text, n) - array of space-joined n-grams of space-delimited tokens",
    "", "", "", "string_funcs", "4.0.0", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(c, Literal(i: Int, _)) => TokenNgrams(c, i)
    case exprs => throw new IllegalArgumentException(
      s"$Name takes (column, int literal), got ${exprs.size} arguments")
  }
}
