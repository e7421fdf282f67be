package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** SQL-surface registration for graft's native expressions, both
  * builder-time (`.withExtensions(new GraftExtensions)`) and on an
  * already-built session (`GraftFunctions.register(spark)`), so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works like a built-in.
  */
object GraftFunctions {
  val vecDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProduct(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"vec_dot expects 2 arguments, got ${other.length}")
  }

  /** Idempotent per session: re-registering an already-present
    * function makes Spark log a `replaced a previously registered
    * function` WARN on every call site (VERDICT r9 #9), so skip the
    * create when the name is already bound.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("vec_dot")))
      reg.createOrReplaceTempFunction("vec_dot", vecDotBuilder, "built-in")
  }
}

/** Session-extensions entry point: inject graft functions at
  * SparkSession build time (`spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      GraftFunctions.vecDotBuilder))
    // whole-operator extension: plans AsOfJoinPlan as AsOfJoinExec
    e.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftshim.AsOfJoinStrategy)
  }
}
