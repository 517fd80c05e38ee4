package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection (SURVEY J8): the two-sample
  * Kolmogorov–Smirnov statistic between two event populations' value
  * distributions, computed over a BINNED grain in exact integer
  * arithmetic — the monitoring check a training pipeline runs between
  * data snapshots ("did this week's distribution move?").
  *
  * Semantics: D = max_b |F_A(b) − F_B(b)| over whole-unit value bins
  * (the KS of the binned distributions — exact for the binned view, a
  * lower bound of the unbinned statistic; binning is what makes the op
  * scale-free). Everything stays integral: the max is taken over
  * |cumA·nB − cumB·nA| and only the final ratio divides (floor e6), so
  * the oracle matches bit-for-bit.
  *
  * 100 TB posture: one shuffle to the bin grain (bounded: value range /
  * bin width, independent of row count), then [[graft.Dist]]'s two-phase
  * distributed prefix sum over the bins — no single-task window, no
  * sort of the event grain. The two populations are counted in ONE pass
  * (conditional sums), not two scans. */
object Drift {
  /** libm-`ln()` INVENTORY — the single anchor for every floating-point
    * logarithm in the engine (keep this list current; a new `log()` call
    * site must repeat the containment analysis or route here):
    *
    *   1. [[psiDrift]] (`Drift.scala`, PSI term),
    *   2. [[psiSeries]] (`Drift.scala`, per-period PSI term),
    *   3. [[graft.streaming.StreamOps.windowedPsi]] (per-window PSI term).
    *
    * All three compute the same expression — `(p−q) * ln(p/q)` per bin —
    * and contain the cross-engine risk identically: the term is ROUNDED
    * to 6 decimals and cast to DECIMAL(18,6) BEFORE the exact decimal
    * sum, so engines must agree only on the rounded per-bin value. A
    * disagreement requires java.lang.StrictMath-vs-libm `ln` to differ by
    * enough to flip a half-even rounding at the 6th decimal — a ≤1-ulp
    * event observed never across all SFs/seeds; accepted, and the
    * blast radius is one bin's 1e-6 contribution, not the sum order. */

  /** The graded comparison: click vs purchase value distributions. */
  val GroupA = "click"
  val GroupB = "purchase"

  def ksDrift(events: DataFrame, groupA: String = GroupA,
              groupB: String = GroupB): DataFrame = {
    import events.sparkSession.implicits._
    val binned = events.filter($"event_type".isin(groupA, groupB))
      .groupBy(floor($"value").cast("long").as("bucket"))
      .agg(
        sum(when($"event_type" === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when($"event_type" === groupB, 1L).otherwise(0L)).as("cb"))
    val cum = graft.Dist.withGlobalCumSums(binned, Seq("ca", "cb"), Seq($"bucket"))
    val totals = binned.agg(sum($"ca").as("na"), sum($"cb").as("nb"))
    cum.crossJoin(broadcast(totals))
      .select($"bucket", $"na", $"nb",
        abs($"cum_ca" * $"nb" - $"cum_cb" * $"na").as("diff"))
      .agg(
        first($"na").as("n_a"), first($"nb").as("n_b"),
        max($"diff").as("ks_num"),
        // argmax bin, ties to the smallest bucket
        (-max(struct($"diff", (-$"bucket").as("nb0"))).getField("nb0")).as("at_bucket"))
      .select($"n_a", $"n_b",
        expr("(ks_num * 1000000) div (n_a * n_b)").as("ks_d_e6"),
        $"at_bucket")
  }

  /** Population Stability Index between the same two binned populations:
    * PSI = Σ_b (p_A(b) − p_B(b))·ln(p_A(b)/p_B(b)) — the industry-standard
    * drift score (PSI < 0.1 stable, > 0.25 shifted) complementing the KS
    * max-deviation view with a mass-weighted total. Empty-bin proportions
    * are Laplace-smoothed ((c+1)/(n+B), B = bin count) so ln never sees a
    * zero — deterministic and mirrored in the oracle, no epsilon knob.
    *
    * Engine-exactness: each bin's term is one fixed-shape IEEE double
    * expression rounded to DECIMAL(18,6), then summed exactly (the
    * idf/lmBits discipline — no float accumulation order to diverge; the
    * only cross-engine risk is a 1-ulp libm ln() difference at an exact
    * .5e-7 rounding boundary, the same accepted risk as j4_tfidf's idf).
    * Same scale posture as [[ksDrift]]: one pass to the bounded bin grain;
    * the per-bin math is a broadcast-join projection. */
  def psiDrift(events: DataFrame, groupA: String = GroupA,
               groupB: String = GroupB): DataFrame = {
    import events.sparkSession.implicits._
    val binned = events.filter($"event_type".isin(groupA, groupB))
      .groupBy(floor($"value").cast("long").as("bucket"))
      .agg(
        sum(when($"event_type" === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when($"event_type" === groupB, 1L).otherwise(0L)).as("cb"))
    val totals = binned.agg(sum($"ca").as("na"), sum($"cb").as("nb"),
      count(lit(1)).as("n_bins"))
    val pa = ($"ca" + 1L).cast("double") / ($"na" + $"n_bins").cast("double")
    val pb = ($"cb" + 1L).cast("double") / ($"nb" + $"n_bins").cast("double")
    binned.crossJoin(broadcast(totals))
      .select($"na", $"nb", $"n_bins",
        round((pa - pb) * log(pa / pb), 6).cast("decimal(18,6)").as("term6"))
      .groupBy($"na".as("n_a"), $"nb".as("n_b"), $"n_bins")
      .agg(sum($"term6").cast("double").as("psi"))
  }

  /** Drift TIME SERIES: per-day PSI of one event type's value distribution
    * against the whole-corpus reference distribution of the same type —
    * the drift-dashboard query ("which ingest days deviate?"). Every day
    * value is by construction inside the corpus, so the reference's bucket
    * set IS the bin universe; the (day x bucket) grid (bounded:
    * time-range x value-range, independent of row count) is generated
    * explicitly so days missing a reference bucket still contribute that
    * bucket's term. Same smoothing + decimal-exact sum as [[psiDrift]].
    * Scale: one pass to the (day, bucket) grain, a broadcastable
    * reference, and a bounded grid join. */
  def psiSeries(events: DataFrame, group: String = GroupA): DataFrame = {
    import events.sparkSession.implicits._
    val e = events.filter($"event_type" === group)
      .select(graft.Det.dayI($"ts").as("day_i"),
        floor($"value").cast("long").as("bucket"))
    val ref = e.groupBy($"bucket").agg(count(lit(1)).as("cr"))
    val refTot = ref.agg(sum($"cr").as("nr"), count(lit(1)).as("n_bins"))
    val day = e.groupBy($"day_i", $"bucket").agg(count(lit(1)).as("cd"))
    val dayTot = day.groupBy($"day_i").agg(sum($"cd").as("nd"))
    val grid = dayTot.crossJoin(broadcast(ref))
      .join(day, Seq("day_i", "bucket"), "left")
      .na.fill(0L, Seq("cd"))
      .crossJoin(broadcast(refTot))
    val pd = ($"cd" + 1L).cast("double") / ($"nd" + $"n_bins").cast("double")
    val pr = ($"cr" + 1L).cast("double") / ($"nr" + $"n_bins").cast("double")
    grid
      .select($"day_i", $"nd",
        round((pd - pr) * log(pd / pr), 6).cast("decimal(18,6)").as("term6"))
      .groupBy($"day_i".as("day_i"), $"nd".as("n_day"))
      .agg(sum($"term6").cast("double").as("psi"))
  }

  /** J8 — EMBEDDING-space drift register: per-dimension mean shift
    * between two vector populations (here the even/odd label classes as
    * the deterministic snapshot proxy; production compares reference vs
    * candidate index snapshots) — the vector-pipeline health check that
    * catches an encoder change, a normalization bug, or genuine
    * distribution movement before retrieval quality degrades. EXACT
    * integer arithmetic end-to-end: embeddings are already e6-quantized
    * ([[Similarity.quantized]]), per-dimension sums are exact 64-bit
    * (|q| <= ~2e6 · rows), and the mean is floor-divided — no libm, no
    * summation-order sensitivity, so no new entry in the `ln()`
    * inventory. Scale: one shuffle to the DIMENSION grain (bounded by
    * the embedding width, independent of corpus size), map-side
    * combinable conditional sums — the same register-file shape as the
    * binned KS. Output ranked by |shift| (largest-moving dimension
    * first; deterministic ties to the dimension index). */
  def embDrift(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val q = Similarity.quantized(emb)
      .join(emb.select($"vec_id", pmod($"label", lit(2)).as("grp")), Seq("vec_id"))
    val stats = q.groupBy($"i")
      .agg(
        sum(when($"grp" === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"grp" === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when($"grp" === 0, $"q").otherwise(0L)).as("sa"),
        sum(when($"grp" === 1, $"q").otherwise(0L)).as("sb"))
      .filter($"n_a" > 0 && $"n_b" > 0)
      // signed-division parity: the sums are signed (embedding components
      // are ±) and BOTH engines truncate integer division toward zero
      // (Spark `div`, DuckDB `//`: -7/2 -> -3 on each — verified), so the
      // means agree bit-for-bit on negative dimensions too.
      .select($"i", $"n_a", $"n_b",
        expr("sa div n_a").as("mean_a_e6"),
        expr("sb div n_b").as("mean_b_e6"),
        abs(expr("sa div n_a") - expr("sb div n_b")).as("shift_e6"))
    // ranking via the distributed-rank kernel (the dimension grain is
    // bounded, but the surface-wide no-global-window lock applies to
    // every plan — and Dist costs one bounded offsets table)
    graft.Dist.withGlobalRank(stats, "rnk", Seq($"shift_e6".desc, $"i"))
      .select($"i", $"n_a", $"n_b", $"mean_a_e6", $"mean_b_e6",
        $"shift_e6", $"rnk")
  }
}
