package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers for oracle parity.
  *
  * The driver hash-compares query results against a DuckDB oracle, so every
  * double-valued aggregate must be bit-identical regardless of Spark's
  * partition/combine order. Strategy: aggregate in DECIMAL (exact, associative,
  * order-independent), then round + cast to double at the very end. The
  * matching DuckDB SQL applies the same casts.
  *
  * All money-ish source columns in the harness tables carry two decimals
  * (l_extendedprice, l_discount, o_totalprice, value), so DECIMAL(18,2)
  * represents them exactly.
  */
object Det {
  val Money: DecimalType = DecimalType(18, 2)

  /** Exact decimal view of a 2-decimal double column. */
  def dec(c: Column): Column = c.cast(Money)

  /** Order-independent SUM of a 2-decimal double, emitted as double.
    * DuckDB: CAST(round(sum(CAST(x AS DECIMAL(18,2))), 2) AS DOUBLE) */
  def dsum(c: Column): Column = round(sum(dec(c)), 2).cast(DoubleType)

  /** Order-independent SUM of a product of two 2-decimal doubles.
    * DuckDB: CAST(round(sum(CAST(a AS DECIMAL(18,2)) * CAST(b AS DECIMAL(18,2))), 2) AS DOUBLE) */
  def dsumProd(a: Column, b: Column): Column =
    round(sum(dec(a) * dec(b)), 2).cast(DoubleType)

  /** Deterministic AVG: exact decimal sum -> double, divided by exact count,
    * rounded to 6 decimals.
    * DuckDB: round(CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(x), 6) */
  def davg(c: Column): Column =
    round(sum(dec(c)).cast(DoubleType) / count(c), 6)

  /** Deterministic ratio of two exact decimal sums, 0-guarded, 6 decimals. */
  def dratio(num: Column, den: Column): Column = {
    val n = sum(dec(num)).cast(DoubleType)
    val d = sum(dec(den)).cast(DoubleType)
    when(d === 0d, 0d).otherwise(round(n / d, 6))
  }

  /** Epoch microseconds of a timestamp column (all engine time arithmetic is
    * done in long micros — exact, and identical in DuckDB via epoch_us()).
    * Accepts TIMESTAMP and TIMESTAMP_NTZ (NTZ wall time read as UTC — the
    * session timezone — matching DuckDB's naive-as-UTC convention). */
  def us(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Epoch micros -> naive (NTZ) timestamp, wall time in UTC. All engine
    * timestamp OUTPUTS are NTZ so parquet matches DuckDB's naive type. */
  def tsNtz(usCol: Column): Column =
    timestamp_micros(usCol).cast(TimestampNTZType)

  /** Deterministic pseudo-random key from a long id (Knuth multiplicative
    * hash mod a prime) — replaces unseeded sampling so results oracle-match.
    * The id is reduced mod the prime BEFORE multiplying: the product then
    * stays under 2^62 for ANY 64-bit id, where the naive id*2654435761
    * silently wraps in Spark but raises BIGINT-out-of-range in DuckDB.
    * DuckDB: ((id % 1000000007) * 2654435761) % 1000000007 */
  def pseudoRand(id: Column): Column =
    pmod(pmod(id, lit(1000000007L)) * lit(2654435761L), lit(1000000007L))
}
