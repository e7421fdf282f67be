package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

object PqEncode {
  /** Round(d·10⁶) with Spark's / DuckDB's decimal semantics: shortest
    * decimal representation, HALF_UP (away from zero) — NOT
    * Math.round (which rounds -2.5 to -2) and NOT the exact-binary
    * BigDecimal constructor.
    */
  def roundKey(d: Double): Long =
    java.math.BigDecimal.valueOf(d * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
}

/** Nearest-codebook-entry id for one product-quantization subspace —
  * a single fused codegen loop over the codebook reference object.
  *
  * The composed form (array_min over 16 inlined struct candidates,
  * each repeating two vec_dot loops) exceeds janino's method budget
  * once 8 such columns collapse into one projection, so the whole
  * stage silently fell back to interpreted execution — the exact
  * failure mode SURVEY §3's "everything codegen" rule exists to catch.
  * This expression generates ~20 lines per column instead.
  *
  * Semantics (bit-compatible with the DuckDB oracle replay):
  * d²(x_m, c) = xx − 2·xs + ss accumulated left-to-right in doubles,
  * key = round(d²·10⁶) as long (decimal HALF_UP), argmin by
  * (key, c) — ascending scan keeping strict improvements ties to the
  * smallest c.
  */
@ExpressionDescription(
  usage = "pq_encode(v) - nearest codebook entry for one PQ subspace.")
case class PqEncode(child: Expression, seeds: Array[Array[Double]],
    m: Int, sub: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float>, got $t")
    }

  private lazy val ss: Array[Double] = seeds.map { s =>
    var acc = 0.0; var j = 0
    while (j < s.length) { acc += s(j) * s(j); j += 1 }
    acc
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val off = m * sub
    var xx = 0.0
    var j = 0
    while (j < sub) {
      val x = v.getFloat(off + j).toDouble; xx += x * x; j += 1
    }
    var best = Long.MaxValue
    var bestC = -1
    var c = 0
    while (c < seeds.length) {
      val s = seeds(c)
      var xs = 0.0
      j = 0
      while (j < sub) { xs += v.getFloat(off + j).toDouble * s(j); j += 1 }
      val key = PqEncode.roundKey(xx - 2.0 * xs + ss(c))
      if (key < best) { best = key; bestC = c }
      c += 1
    }
    Integer.valueOf(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("pqSeeds", seeds, "double[][]")
    val ssRef = ctx.addReferenceObj("pqSs", ss, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val xx = ctx.freshName("xx")
      val xs = ctx.freshName("xs")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val key = ctx.freshName("key")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val x = ctx.freshName("x")
      s"""
         |double $xx = 0.0;
         |for (int $j = 0; $j < $sub; $j++) {
         |  double $x = (double) $v.getFloat(${m * sub} + $j);
         |  $xx += $x * $x;
         |}
         |long $best = Long.MAX_VALUE;
         |int $bestC = -1;
         |for (int $c = 0; $c < ${seeds.length}; $c++) {
         |  double $xs = 0.0;
         |  for (int $j = 0; $j < $sub; $j++) {
         |    $xs += ((double) $v.getFloat(${m * sub} + $j)) * $seedsRef[$c][$j];
         |  }
         |  long $key = graft.functions.PqEncode$$.MODULE$$.roundKey($xx - 2.0 * $xs + $ssRef[$c]);
         |  if ($key < $best) { $best = $key; $bestC = $c; }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqFunctions {
  def pq_encode(v: Column, seeds: Array[Array[Double]], m: Int, sub: Int): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(v), seeds, m, sub))
}
