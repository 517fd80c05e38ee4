package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, Md5Head32Expr}

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
