package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.{BloomBitTestExpr, LongDotExpr, Md5Head32Expr, Md5Head60Expr}

/** SQL registration of graft's native expressions, so `spark.sql(...)`
  * text and the DataFrame API see the same functions:
  *
  *   - `long_dot(array<long>, array<long>) -> long` ([[LongDot]])
  *   - `md5_head32(string) -> long` ([[Md5Head32]])
  *
  * OVERFLOW NOTE: `long_dot` multiplies/accumulates with raw 64-bit
  * arithmetic and silently WRAPS on overflow, even under ANSI mode — unlike
  * the `aggregate(zip_with(...))` form it replaces, which ANSI mode would
  * fail. Its internal callers (quantized embedding dot products, values
  * bounded well inside 2^31) cannot overflow; arbitrary SQL inputs near
  * Long range get two's-complement wrap, not an error.
  *
  * Two entry points, both idiomatic:
  *   - `GraftExtensions` for session construction
  *     (`SparkSession.builder.withExtensions(new GraftExtensions)` or
  *     `--conf spark.sql.extensions=graft.functions.GraftExtensions`) —
  *     the deployment path for a cluster;
  *   - `GraftFunctions.register(spark)` to add them to a live session's
  *     registry (tests, notebooks).
  */
object GraftFunctions {
  private val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDotExpr].getName, "long_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "long_dot expects exactly 2 arguments")
        LongDotExpr(children(0), children(1))
      }),
    (FunctionIdentifier("md5_head32"),
      new ExpressionInfo(classOf[Md5Head32Expr].getName, "md5_head32"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "md5_head32 expects exactly 1 argument")
        Md5Head32Expr(children.head)
      }),
    (FunctionIdentifier("md5_head60"),
      new ExpressionInfo(classOf[Md5Head60Expr].getName, "md5_head60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "md5_head60 expects exactly 1 argument")
        Md5Head60Expr(children.head)
      }),
    (FunctionIdentifier("bloom_bit_test"),
      new ExpressionInfo(classOf[BloomBitTestExpr].getName, "bloom_bit_test"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "bloom_bit_test expects exactly 2 arguments")
        BloomBitTestExpr(children(0), children(1))
      })
  )

  /** Install into a live session's function registry. */
  def register(spark: SparkSession): Unit = fns.foreach { case (id, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  private[functions] def inject(e: SparkSessionExtensions): Unit =
    fns.foreach(e.injectFunction)
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
