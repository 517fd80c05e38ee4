package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{BloomBitTestExpr, ColumnBridge, Md5Head32Expr, Md5Head60Expr}

/** Leading 32 bits of md5(input) as a long — a native codegen'd expression,
  * bit-identical to `conv(substring(md5(s), 1, 8), 16, 10).cast("long")`
  * (and to DuckDB's `('0x' || substr(md5(s), 1, 8))::BIGINT`, the oracle
  * form used across the dedup/winnowing/LSH queries).
  *
  * The composed-SQL form allocates a 32-char hex string, a substring, and a
  * base-16 string conversion per hash; the minhash path computes
  * bands×rows hashes per shingle, so those allocations dominated
  * `j2_neardup_pairs` (~70 CPU-seconds over 5000 docs at sf0.1). This
  * expression digests the UTF-8 bytes and reads the first 4 bytes directly.
  */
object Md5Head32 {
  def apply(c: Column): Column = ColumnBridge.column(Md5Head32Expr(ColumnBridge.expression(c)))
}

/** Leading 60 bits of md5(input) as a non-negative long — bit-identical to
  * DuckDB's `('0x' || substr(md5(s), 1, 15))::BIGINT`, the oracle form for
  * hash spaces that must exceed 2^31 (the scalable-Bloom slices grow their
  * per-slice modulus geometrically, past what a 32-bit head can address
  * uniformly). Same native-digest motivation as [[Md5Head32]]. */
object Md5Head60 {
  def apply(c: Column): Column = ColumnBridge.column(Md5Head60Expr(ColumnBridge.expression(c)))
}

/** Bit `p` of a packed `array<long>` bitmap (word = p >>> 6, bit = p & 63;
  * out-of-range reads as unset) — the variable-distance bit probe the
  * DataFrame lambda API lacks (`shiftleft` takes a literal distance). Used
  * by the scalable-Bloom stream probe's row-local membership fold over
  * broadcast slice bitmaps. */
object BloomBitTest {
  def apply(bits: Column, p: Column): Column =
    ColumnBridge.column(BloomBitTestExpr(ColumnBridge.expression(bits), ColumnBridge.expression(p)))
}
