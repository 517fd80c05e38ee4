package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, LongDotExpr}

/** Integer dot product of two `array<long>` columns — a native Catalyst
  * expression with whole-stage codegen ([[org.apache.spark.sql.graftbridge.LongDotExpr]]).
  *
  * Replaces the `aggregate(zip_with(a, b, (x, y) => coalesce(x * y, 0L)),
  * 0L, _ + _)` higher-order form on the similarity hot path: HOFs evaluate
  * interpreted (a boxed closure invocation per element, outside codegen),
  * which dominated the near-dup/ANN queries — the exact-cosine re-rank of
  * `j2_embed_neardup` spent ~24 CPU-seconds on 2000×64-dim vectors at
  * sf0.1; this expression runs the same reduction as a primitive loop
  * inside the generated code.
  *
  * Semantics (identical to the HOF form it replaces):
  *   - sums over the OVERLAP of the two arrays (min length) — a plane
  *     weight vector longer/shorter than the embedding contributes only
  *     overlapping dims (the zip_with null-padding trap, round-3 ADVICE);
  *   - null ELEMENTS contribute 0 (the coalesce);
  *   - a null ARRAY on either side yields null;
  *   - products/sums are raw 64-bit arithmetic: quantized inputs are
  *     bounded by |q| <= 1e6 (see [[graft.ext.Similarity]] qvec) and dims
  *     by ~1e4, so |sum| <= 1e16 < 2^63 by construction — ANSI overflow
  *     cannot trigger on any input the callers produce.
  */
object LongDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
