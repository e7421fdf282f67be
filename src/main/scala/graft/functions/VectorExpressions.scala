package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two numeric arrays with full
  * whole-stage-codegen support — the hot inner loop of every
  * embedding operator (cosine dedup, ANN search, norm stats).
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions are
  * interpreted (CodegenFallback) and allocate an intermediate array
  * per row; this expression is a fused primitive loop inside the
  * generated code. Accumulation is double and element-order is
  * left-to-right, bit-identical to the DuckDB oracle's
  * `list_inner_product(a::DOUBLE[], b::DOUBLE[])` (float→double
  * widening is exact).
  */
@ExpressionDescription(
  usage = "vec_dot(a, b) - dot product of two float/double arrays.")
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer twin of [[DotProduct]]: dot product of two BIGINT arrays
  * with whole-stage codegen — the hot inner loop of the
  * quantized-integer cosine verdicts (`dd_semantic`), where the
  * contract is integer end-to-end so the double-accumulating
  * [[DotProduct]] cannot serve. `aggregate(zip_with(...))` (the first
  * cut) is interpreted and allocates a zipped array per PAIR — at
  * sf10's ~10⁸ candidate pairs that was the difference between a
  * 40-minute run and seconds of fused loop. Accumulation wraps like
  * any Java long; callers bound their operands (the SemGuardNq
  * fail-fast) so ANSI and default modes agree.
  */
@ExpressionDescription(
  usage = "vec_dot_long(a, b) - integer dot product of two bigint arrays.")
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot_long expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  /** Either input array type admits NULL elements. When false the
    * generated loop carries no per-element null branch; when true a
    * NULL element makes the whole dot product NULL — the SQL
    * semantics `aggregate(zip_with(...))` would give (ADVICE r14:
    * the first cut read null slots as 0, silently diverging).
    */
  private lazy val elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  override def nullable: Boolean = super.nullable || elemNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (elemNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getLong(i) * y.getLong(i); i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck = if (elemNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[LongDotProduct]]. */
  def vec_dot_long(a: Column, b: Column): Column =
    ColumnShim.column(LongDotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  def vec_norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vec_dot(a, a))
  }

  def vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))
  }
}
