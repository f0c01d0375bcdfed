package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.expressions.{FloatDot, FloatDotFixed, SimHashAgg, SrpBands}

/** SparkSessionExtensions entry point: registers this engine's custom
  * Catalyst expressions as SQL functions, so the SQL surface has the
  * same vector primitives as the DataFrame surface.
  *
  * Mount at session build time:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or retrofit onto a live session (the harness driver builds the
  * session itself) with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(FunctionRegistryHelper.floatDotDescriptor)
    ext.injectFunction(FunctionRegistryHelper.floatDotFixedDescriptor)
    ext.injectFunction(FunctionRegistryHelper.simhashAggDescriptor)
    ext.injectFunction(FunctionRegistryHelper.srpBandsDescriptor)
  }
}

private[graft] object FunctionRegistryHelper {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  type Desc = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val floatDotDescriptor: Desc = (
    FunctionIdentifier("float_dot"),
    new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
    (exprs: Seq[Expression]) => FloatDot(exprs(0), exprs(1)))

  val floatDotFixedDescriptor: Desc = (
    FunctionIdentifier("float_dot_fixed"),
    new ExpressionInfo(classOf[FloatDotFixed].getName, "float_dot_fixed"),
    (exprs: Seq[Expression]) => FloatDotFixed(exprs(0), exprs(1)))

  val simhashAggDescriptor: Desc = (
    FunctionIdentifier("simhash_agg"),
    new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
    (exprs: Seq[Expression]) => SimHashAgg(exprs(0), exprs(1)).toAggregateExpression())

  val srpBandsDescriptor: Desc = (
    FunctionIdentifier("srp_bands"),
    new ExpressionInfo(classOf[SrpBands].getName, "srp_bands"),
    (exprs: Seq[Expression]) => SrpBands(exprs(0)))
}

object GraftExtensions {
  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => FloatDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot_fixed", exprs => FloatDotFixed(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_agg", exprs => SimHashAgg(exprs(0), exprs(1)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "srp_bands", exprs => SrpBands(exprs(0)), "built-in")
  }
}
