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
  // one MessageDigest per task thread: MessageDigest.getInstance("MD5")
  // does a provider lookup and allocates per call, and these helpers run
  // once per array ELEMENT in the shingle/gram/bloom hot paths (millions
  // of calls per stage); digest(bytes) leaves the instance reset for the
  // next call
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of the UTF-8 input as an unsigned big-endian long —
    * bit-identical to `conv(substring(md5(s), 1, 8), 16, 10)::long` /
    * DuckDB `('0x' || substr(md5(s), 1, 8))::BIGINT`, without the 32-char
    * hex string, substring, and string base conversion per call. */
  def md5Head32(bytes: Array[Byte]): Long = {
    val d = localMd5.get().digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 60 md5 bits (15 hex chars) of the UTF-8 input as a non-negative
    * long — bit-identical to DuckDB `('0x' || substr(md5(s), 1, 15))::BIGINT`.
    * 60 bits (not 64) keeps the value inside BIGINT on both engines with no
    * sign games; used where a 32-bit space is too small for the modulus
    * (the scalable-Bloom slices size m geometrically past 2^31). The 15th
    * hex char is the HIGH nibble of digest byte 7. */
  def md5Head60(bytes: Array[Byte]): Long = {
    val d = localMd5.get().digest(bytes)
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) | ((d(2) & 0xffL) << 36) |
      ((d(3) & 0xffL) << 28) | ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >> 4)
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

/** Catalyst node for [[graft.functions.Md5Head60]]: the leading 60 bits of
  * the md5 of a string, as a long. See [[GraftHash.md5Head60]] for the
  * exact equivalence contract with the DuckDB oracle form. */
case class Md5Head60Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_head60"

  override protected def nullSafeEval(s: Any): Any =
    GraftHash.md5Head60(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.GraftHash.md5Head60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Head60Expr =
    copy(child = newChild)
}

/** Catalyst node for [[graft.functions.BloomBitTest]]: bit `p` of a packed
  * little-endian-word bitmap (`array<long>`, word w = bits p*64..p*64+63,
  * bit b of word w = position w*64+b) — `(bits[p >>> 6] & (1L << (p & 63)))
  * != 0`, with out-of-range positions reading as unset. Exists because the
  * DataFrame lambda API has no variable-distance shift (`shiftleft(c, n)`
  * takes a literal), and the scalable-Bloom stream probe tests k per-slice
  * positions inside a higher-order `forall`. */
case class BloomBitTestExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_bit_test"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val bits = a.asInstanceOf[ArrayData]
    val p = b.asInstanceOf[Long]
    val w = (p >>> 6).toInt
    p >= 0 && w < bits.numElements() && !bits.isNullAt(w) &&
      (bits.getLong(w) & (1L << (p & 63L).toInt)) != 0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, p) => {
      val w = ctx.freshName("w")
      s"""
         |final int $w = (int) ($p >>> 6);
         |${ev.value} = $p >= 0L && $w < $a.numElements() && !$a.isNullAt($w)
         |  && ($a.getLong($w) & (1L << (int) ($p & 63L))) != 0L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomBitTestExpr =
    copy(left = newLeft, right = newRight)
}
