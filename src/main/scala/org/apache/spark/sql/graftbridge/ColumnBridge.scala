package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bridge to the `private[sql]` Column <-> Expression converters and type
  * classes, so graft's native Catalyst expressions can be exposed as plain
  * `Column`s. This package lives under `org.apache.spark.sql` purely for
  * access (the standard pattern for out-of-tree Spark extensions); no
  * Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Catalyst node for [[graft.functions.LongDot]] — see the facade's
  * Scaladoc for semantics and motivation. Defined here because
  * `ExpectsInputTypes`/`AbstractDataType` are `private[sql]`. */
case class LongDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Static hash helper referenced from generated code (janino resolves the
  * plain static method without Scala module indirection). */
object GraftHash {
  /** First 4 md5 bytes of the UTF-8 input as an unsigned big-endian long —
    * bit-identical to `conv(substring(md5(s), 1, 8), 16, 10)::long` /
    * DuckDB `('0x' || substr(md5(s), 1, 8))::BIGINT`, without the 32-char
    * hex string, substring, and string base conversion per call. */
  def md5Head32(bytes: Array[Byte]): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** Catalyst node for [[graft.functions.Md5Head32]]: the leading 32 bits of
  * the md5 of a string, as a long. See [[GraftHash.md5Head32]] for the
  * exact equivalence contract with the SQL form it replaces. */
case class Md5Head32Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_head32"

  override protected def nullSafeEval(s: Any): Any =
    GraftHash.md5Head32(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.GraftHash.md5Head32($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Head32Expr =
    copy(child = newChild)
}
