package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two numeric arrays.
  *
  * The ANN/near-dup hot path (SURVEY §7.1(7), brief "similarity search")
  * computes dot products per candidate pair. The built-in composition
  * `aggregate(zip_with(...))` is correct but runs on the interpreted
  * higher-order-function path — one closure dispatch per element. This
  * expression stays inside whole-stage codegen: the generated Java is a
  * tight primitive loop over the two `ArrayData`, no allocation, no
  * virtual calls (the brief's preference order: built-ins → custom
  * `Expression` with doGenCode → UDF last).
  *
  * Element nulls are not expected (embedding vectors); mismatched lengths
  * raise (matching DuckDB `list_dot_product`, which the oracle relies on) —
  * silently dotting a common prefix would turn a dimension bug into quietly
  * wrong similarity scores. Returns DOUBLE.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot expects two array<float|double>, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) {
      throw new IllegalArgumentException(
        s"vec_dot: array length mismatch (${x.numElements()} vs " +
          s"${y.numElements()})")
    }
    val n = x.numElements()
    val (lt, rt) = (elemType(left), elemType(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: array length mismatch (" + $a.numElements() +
         |    " vs " + $b.numElements() + ")");
         |}
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object DotProduct {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotProduct].getName, "vec_dot")
}
