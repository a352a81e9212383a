package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product of two ARRAY<DOUBLE> columns (in-order
  * accumulation; see [[CosineSimilarity]] for the rationale — same
  * interpreted-HOF hot-path argument, used by the LSH ANN bucketing). */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  /** NULL-element semantics match [[CosineSimilarity]]: a null element in
    * the common prefix nulls the result (the `aggregate(zip_with(...))`
    * propagation); checks are emitted only for nullable element types. */
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  // see CosineSimilarity: null elements null the result even when the
  // arrays themselves are non-nullable.
  override def nullable: Boolean = super.nullable || elementsNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = elementsNullable
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  val Name = "array_dot"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDotProduct].getName, null, Name,
    "_FUNC_(a, b) - dot product of two double arrays", "", "", "",
    "math_funcs", "4.0.0", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => ArrayDotProduct(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$Name takes exactly 2 arguments, got ${exprs.size}")
  }
}
