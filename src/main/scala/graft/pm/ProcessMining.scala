package graft.pm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** An activity instance in the canonical event log (times in epoch micros). */
case class Ev(event_id: Long, case_id: Long, activity: String, resource: String,
              start_us: Long, end_us: Long)

/** [[Ev]] plus its derived enabled time. */
case class EvEn(event_id: Long, case_id: Long, activity: String, resource: String,
                start_us: Long, end_us: Long, enabled_us: Long)

/** Batch-case grain row used by the wrong-enabled split (SURVEY W4). */
case class BatchCase(resource: String, activity: String, seg_no: Long, case_id: Long,
                     case_start: Long, case_enabled: Long, case_end: Long)

/** Canonical event-log derivation from the harness `events` table.
  *
  * Mapping (documented, deterministic, SQL-expressible so the DuckDB oracle
  * can reproduce it): case = user_id, activity = event_type, start = ts,
  * end = ts + value minutes, resource = "r" + (user_id % 4). All times are
  * epoch micros longs (SURVEY §1.4 duration-as-micros convention).
  */
object EventLogOps {
  def fromEvents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d).select(
      $"event_id",
      $"user_id".as("case_id"),
      $"event_type".as("activity"),
      concat(lit("r"), pmod($"user_id", lit(4))).as("resource"),
      graft.Det.us($"ts").as("start_us"),
      (graft.Det.us($"ts") + round($"value" * 60000000d).cast("long")).as("end_us"))
  }
}

/** K2 — enabled-time estimation (concurrency-oracle style).
  *
  * Semantics (reconstruction of the Heuristics concurrency oracle used by
  * the reference at analysis.py:28-43; deterministic, fully specified here):
  *  - directly-follows df(a,b): count of adjacent pairs in each case ordered
  *    by (start_us, end_us, event_id);
  *  - a ∥ b  iff  a ≠ b and df(a,b) > 0 and df(b,a) > 0;
  *  - enabled(e) = max{ end(p) : p in same case, end(p) <= start(e),
  *    activity(p) not ∥ activity(e) }, falling back to the case's min start
  *    (cf. batch_injection.py:186-191).
  *
  * Scale posture: phase 1 is a pair aggregation (tiny result, collected &
  * closure-broadcast); phase 2 shuffles once on case_id and runs an
  * O(n·|activities|) sweep per case — bounded by trace length, no
  * cross-case state, spill-safe at 100 TB.
  */
object EnabledTime {
  /** Heuristics-miner dependency threshold (the reference's oracle is the
    * external `estimate_start_times` HeuristicsConcurrencyOracle,
    * analysis.py:28-39, whose frequency gate is the Heuristics Miner
    * dependency measure). a∥b requires BOTH directly-follows directions
    * observed AND |df(a,b)-df(b,a)| / (df(a,b)+df(b,a)+1) below this
    * threshold — a strongly one-directional pair is sequential dependence,
    * not concurrency. 1.0 disables the gate (round-1 behavior: any
    * bidirectional pair is concurrent). */
  val DependencyThreshold = 0.9

  def dfPairs(log: DataFrame): DataFrame = {
    import log.sparkSession.implicits._
    val w = Window.partitionBy("case_id").orderBy("start_us", "end_us", "event_id")
    log.withColumn("prev_act", lag($"activity", 1).over(w))
      .filter($"prev_act".isNotNull)
      .groupBy($"prev_act".as("a"), $"activity".as("b"))
      .agg(count(lit(1)).as("n"))
  }

  def concurrencyPairs(log: DataFrame,
                       depThreshold: Double = DependencyThreshold): DataFrame = {
    import log.sparkSession.implicits._
    val d1 = dfPairs(log)
    val d2 = d1.select($"a".as("a2"), $"b".as("b2"), $"n".as("n2"))
    d1.join(d2, $"a" === $"b2" && $"b" === $"a2")
      .filter($"a" =!= $"b")
      .filter(abs($"n" - $"n2") / ($"n" + $"n2" + lit(1d)) < depThreshold)
      .select($"a", $"b")
  }

  /** Adds `enabled_us`. One shuffle on case_id; per-case time-ordered sweep
    * keeps a last-completed-end per activity (O(n·A) per case). */
  def withEnabled(log: DataFrame,
                  depThreshold: Double = DependencyThreshold): DataFrame = {
    val spark = log.sparkSession
    import spark.implicits._
    val conc: Set[(String, String)] =
      concurrencyPairs(log, depThreshold).as[(String, String)].collect().toSet
    log.select($"event_id", $"case_id", $"activity", $"resource", $"start_us", $"end_us")
      .as[Ev]
      .groupByKey(_.case_id)
      .flatMapGroups { (_, it) =>
        val evs = it.toArray.sortBy(e => (e.start_us, e.end_us, e.event_id))
        val caseStart = evs.head.start_us
        val byEnd = evs.sortBy(e => (e.end_us, e.event_id))
        val lastEnd = scala.collection.mutable.HashMap.empty[String, Long]
        var j = 0
        val out = new Array[EvEn](evs.length)
        var i = 0
        while (i < evs.length) {
          val e = evs(i)
          while (j < byEnd.length && byEnd(j).end_us <= e.start_us) {
            val p = byEnd(j)
            if (lastEnd.getOrElse(p.activity, Long.MinValue) < p.end_us)
              lastEnd(p.activity) = p.end_us
            j += 1
          }
          var best = Long.MinValue
          lastEnd.foreach { case (a, en) =>
            if (en > best && !conc.contains((a, e.activity))) best = en
          }
          val enb = if (best == Long.MinValue) caseStart else best
          out(i) = EvEn(e.event_id, e.case_id, e.activity, e.resource, e.start_us, e.end_us, enb)
          i += 1
        }
        out.iterator
      }
      .toDF()
  }
}

/** K1 — BAMA-equivalent batch discovery as window sessionization, plus the
  * reference's cleanup passes (SURVEY W3–W8; semantics reconstructed from
  * batch_detection.R:54-77 and discovery.py:12-209).
  *
  * Segmentation: within (resource, activity), ordered by (start_us, end_us,
  * case_id, event_id), a new batch starts when start exceeds the running max
  * end of the group so far (gap tolerance 0 — discovery.py:239).
  * Classification (per pre-split segment, as BAMA does):
  * Parallel = all starts and ends equal; Sequential task-based = every
  * non-first row starts exactly at the running max end (back-to-back);
  * Concurrent task-based = otherwise (overlap).
  */
object BatchDiscovery {
  /** Adds run_max_end / new_flag / seg_no / seq_row within (resource, activity). */
  def segment(en: DataFrame): DataFrame = {
    import en.sparkSession.implicits._
    val w = Window.partitionBy("resource", "activity")
      .orderBy("start_us", "end_us", "case_id", "event_id")
    en.withColumn("run_max_end",
        max($"end_us").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_flag",
        when($"run_max_end".isNull || $"start_us" > $"run_max_end", 1).otherwise(0))
      .withColumn("seg_no",
        sum($"new_flag").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("seq_row",
        when($"run_max_end".isNull || $"start_us" >= $"run_max_end", 1).otherwise(0))
  }

  /** Per-segment batch type (computed before splits, as in the reference). */
  def classify(seg: DataFrame): DataFrame = {
    import seg.sparkSession.implicits._
    seg.groupBy("resource", "activity", "seg_no")
      .agg(
        countDistinct($"start_us").as("ds"),
        countDistinct($"end_us").as("de"),
        min($"seq_row").as("all_seq"))
      .withColumn("batch_type",
        when($"ds" === 1 && $"de" === 1, "Parallel")
          .when($"all_seq" === 1, "Sequential task-based")
          .otherwise("Concurrent task-based"))
      .select($"resource", $"activity", $"seg_no", $"batch_type")
  }

  /** Batch-case grain: case_start, case_enabled (C2 struct-min: enabled of
    * the lexicographically minimal (start, enabled) row — utils.py:93-106),
    * case_end. */
  def batchCases(seg: DataFrame): DataFrame = {
    import seg.sparkSession.implicits._
    seg.groupBy("resource", "activity", "seg_no", "case_id")
      .agg(
        min(struct($"start_us".as("s"), $"enabled_us".as("e"))).as("m"),
        max($"end_us").as("case_end"))
      .select($"resource", $"activity", $"seg_no", $"case_id",
        $"m.s".as("case_start"), $"m.e".as("case_enabled"), $"case_end")
  }

  /** W4 — wrong-enabled split, exact reference fixed point (discovery.py:12-81):
    * cases whose enabled exceeds the group's min start are split off together
    * and re-analyzed. Runs per batch segment (small groups) as a typed kernel;
    * emits a `sub` generation index per case. */
  def split(bc: DataFrame): DataFrame = {
    val spark = bc.sparkSession
    import spark.implicits._
    bc.as[BatchCase]
      .groupByKey(r => (r.resource, r.activity, r.seg_no))
      .flatMapGroups { (_, it) =>
        var rest = it.toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long, Long, Long, Long, Int)]
        var sub = 0
        while (rest.nonEmpty) {
          var s = Long.MaxValue
          rest.foreach(c => if (c.case_start < s) s = c.case_start)
          val (stay, late) = rest.partition(_.case_enabled <= s)
          stay.foreach(c => out +=
            ((c.resource, c.activity, c.seg_no, c.case_id, c.case_start, c.case_enabled, c.case_end, sub)))
          sub += 1
          rest = late
        }
        out.iterator
      }
      .toDF("resource", "activity", "seg_no", "case_id", "case_start", "case_enabled", "case_end", "sub")
  }

  /** Full pipeline: segment → classify → W4 split → W7 min-size → W8 dense
    * renumbering → event-grain left-join write-back. Returns the event grain
    * with nullable batch_id / batch_type.
    *
    * The renumbering window is intentionally single-partition: it runs on the
    * distinct-batch grain only (tiny — bounded by #batches, not #events).
    */
  def discover(en: DataFrame, minSize: Int = 2): DataFrame = {
    import en.sparkSession.implicits._
    // seg feeds three consumers (classify, batchCases->split, the final
    // join-back): persist it so the enabled-time kernel + segmentation
    // windows run once, not three times (visible as repeated case_id /
    // (resource, activity) exchanges in the un-cached plan)
    val seg = segment(en).persist()
    val types = classify(seg)
    val withSub = split(batchCases(seg))
    val bkeys = withSub
      .groupBy("resource", "activity", "seg_no", "sub")
      .agg(min($"case_start").as("b_start"), count(lit(1)).as("n_cases"))
      .filter($"n_cases" >= minSize)
    val bid = bkeys.withColumn("batch_id",
      dense_rank().over(Window.orderBy("b_start", "resource", "activity", "seg_no", "sub")).cast("long"))
    seg
      .join(withSub.select($"resource", $"activity", $"seg_no", $"case_id", $"sub"),
        Seq("resource", "activity", "seg_no", "case_id"), "left")
      .join(broadcast(bid.select($"resource", $"activity", $"seg_no", $"sub", $"batch_id")),
        Seq("resource", "activity", "seg_no", "sub"), "left")
      .join(broadcast(types), Seq("resource", "activity", "seg_no"), "left")
      .withColumn("batch_type", when($"batch_id".isNull, lit(null: String)).otherwise($"batch_type"))
  }
}

/** Waiting-time decomposition (analysis.py:51-105) and the K3 sweep-line
  * PT/WT (utils.py:127-176), both at batch-case grain, in micros. */
object WaitingTimes {
  /** Six-way decomposition per (batch_id, case_id). Deterministic variant of
    * the reference: the batch-case enabled time is the C2 struct-min (the
    * reference's iloc[0] row-order tie-break is replaced by the documented
    * (start, enabled) lexicographic minimum).
    * Invariant: total = creation + ready + other. */
  def batchCaseWT(discovered: DataFrame): DataFrame = {
    import discovered.sparkSession.implicits._
    val bc = discovered.filter($"batch_id".isNotNull)
      .groupBy("batch_id", "batch_type", "case_id")
      .agg(
        min(struct($"start_us".as("s"), $"enabled_us".as("e"))).as("m"),
        max($"end_us").as("case_end"))
      .select($"batch_id", $"batch_type", $"case_id",
        $"m.s".as("case_start"), $"m.e".as("case_enabled"), $"case_end")
    val w = Window.partitionBy("batch_id")
    bc.withColumn("inst_enabled", max($"case_enabled").over(w))
      .withColumn("inst_start", min($"case_start").over(w))
      .select(
        $"batch_id", $"batch_type", $"case_id",
        ($"case_start" - $"case_enabled").as("total_wt_us"),
        ($"inst_enabled" - $"case_enabled").as("creation_wt_us"),
        ($"inst_start" - $"inst_enabled").as("ready_wt_us"),
        ($"case_start" - $"inst_start").as("other_wt_us"),
        ($"case_end" - $"case_start").as("pt_us"),
        ($"case_start" - $"case_enabled").as("wt_us"),
        $"inst_enabled".as("instance_enabled_us"),
        $"inst_start".as("instance_start_us"))
  }

  /** K3 — sweep-line PT/WT per batch case: melt (enabled,start,end) into a
    * lifecycle stream, running counters over a (time, lifecycle)-ordered
    * window, accumulate interval lengths by state. PT = time with >=1
    * activity processing; WT = time with >=1 enabled but none processing. */
  def sweepLine(discovered: DataFrame): DataFrame = {
    import discovered.sparkSession.implicits._
    val melted = discovered.filter($"batch_id".isNotNull)
      .select($"batch_id", $"case_id", explode(array(
        struct($"enabled_us".as("t"), lit(1).as("lc")),
        struct($"start_us".as("t"), lit(2).as("lc")),
        struct($"end_us".as("t"), lit(3).as("lc")))).as("m"))
      .select($"batch_id", $"case_id", $"m.t".as("t"), $"m.lc".as("lc"))
    val w = Window.partitionBy("batch_id", "case_id").orderBy("t", "lc")
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    melted
      .withColumn("enabled_c",
        sum(when($"lc" === 1, 1).when($"lc" === 2, -1).otherwise(0)).over(run))
      .withColumn("proc_c",
        sum(when($"lc" === 2, 1).when($"lc" === 3, -1).otherwise(0)).over(run))
      .withColumn("nxt", lead($"t", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy("batch_id", "case_id")
      .agg(
        sum(when($"proc_c" > 0, $"nxt" - $"t").otherwise(0L)).as("pt_us"),
        sum(when($"proc_c" === 0 && $"enabled_c" > 0, $"nxt" - $"t").otherwise(0L)).as("wt_us"))
  }
}
