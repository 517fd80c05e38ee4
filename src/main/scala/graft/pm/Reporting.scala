package graft.pm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EP2 — the human-readable batch waiting-time report
  * (reporting.py:11-206). The report data is provably tiny (one row per
  * batch instance / batch case), so aggregation happens in Spark down to
  * the batch / batch-case grain and the final stats + text render run on
  * the driver, exactly like the reference's print path.
  */
object Reporting {
  case class BatchRow(activities: String, batchType: String, batchId: Long, size: Long,
                      resource: String, bStart: Long)
  case class CaseRow(activities: String, batchType: String, batchId: Long,
                     ptUs: Long, wtUs: Long, totalUs: Long, creationUs: Long,
                     readyUs: Long, otherUs: Long)

  /** Render the full report for a discovered log. */
  def render(disc: DataFrame): String = {
    import disc.sparkSession.implicits._
    val bev = disc.filter($"batch_id".isNotNull)

    val acts = bev.groupBy($"batch_id")
      .agg(concat_ws(",", sort_array(collect_set($"activity"))).as("activities"))
    // The reference iterates batch instances by its unified ids, which
    // follow BAMA's per-(resource, activity) detection: within a group,
    // (resource asc, instance start asc). Our W8 ids are global-b_start
    // ordered, so re-derive the reference order here — it decides both the
    // representative instance for occurrence counts and Counter tie order.
    val batches = bev.groupBy($"batch_id", $"batch_type")
      .agg(countDistinct($"case_id").as("size"),
        min($"resource").as("resource"), min($"start_us").as("b_start"))
      .join(acts, Seq("batch_id"))
      .select($"activities", $"batch_type", $"batch_id", $"size".cast("long"),
        $"resource", $"b_start")
      .as[(String, String, Long, Long, String, Long)].collect()
      .map(t => BatchRow(t._1, t._2, t._3, t._4, t._5, t._6))
      .sortBy(b => (b.resource, b.bStart, b.batchId))

    val cases = WaitingTimes.batchCaseWT(disc)
      .join(acts, Seq("batch_id"))
      .select($"activities", $"batch_type", $"batch_id",
        $"pt_us", $"wt_us", $"total_wt_us", $"creation_wt_us", $"ready_wt_us", $"other_wt_us")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => CaseRow(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9))

    // occurrence counts per activities key (utils.py:199-229): the group's
    // REPRESENTATIVE activity sequence is the first batch instance's
    // (ascending batch_id, mirroring the reference's groupby iteration)
    // first case's (first LOG-ORDER row, .iloc[0]) ordered activities
    // WITHIN the batch. A length-1 sequence counts plain activity events;
    // length-n counts rolling-window matches over every case's full trace
    // (W2 general-n) — a batch case that executed the activity twice makes
    // even a single-activity group a sequence count (golden Lapping: 112
    // 'Lapping','Lapping' windows, not 370 events).
    val singleCounts = disc.groupBy($"activity").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val bk = bev.join(acts.withColumnRenamed("activities", "akey"), Seq("batch_id"))
    // first instance per group = reference numbering order (resource asc,
    // instance start asc — see `batches` above); representative case = the
    // case of that instance's EARLIEST event — validated 12/12 groups
    // against the golden Production report's Num-occurrences values
    val minB = bk.groupBy($"akey", $"batch_id")
      .agg(min($"resource").as("r"), min($"start_us").as("bs"))
      .groupBy($"akey")
      .agg(min(struct($"r", $"bs", $"batch_id")).getField("batch_id").as("batch_id"))
    val minE = bk.join(minB, Seq("akey", "batch_id"))
      .groupBy($"akey", $"batch_id")
      .agg(min(struct($"start_us", $"end_us", $"event_id", $"case_id"))
        .getField("case_id").as("case_id"))
    val repSeq = bk.join(minE, Seq("akey", "batch_id", "case_id"))
      .groupBy($"akey")
      .agg(transform(
        sort_array(collect_list(struct($"start_us", $"end_us", $"event_id", $"activity"))),
        x => x.getField("activity")).as("seq"))
      .as[(String, Seq[String])].collect().toMap
    val occCounts: Map[String, Long] = repSeq.map {
      case (key, sq) if sq.length <= 1 =>
        key -> singleCounts.getOrElse(sq.headOption.getOrElse(key), 0L)
      case (key, sq) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("case_id").orderBy("start_us", "end_us", "event_id")
          .rowsBetween(0, sq.length - 1)
        key -> disc.withColumn("win", collect_list($"activity").over(w))
          .filter($"win" === array(sq.map(lit): _*)).count()
    }

    val typeOrder = Seq("Parallel", "Sequential task-based", "Concurrent task-based",
      "Sequential case-based", "Concurrent case-based")
    val sb = new StringBuilder
    batches.map(_.activities).distinct.sorted.foreach { key =>
      val kb = batches.filter(_.activities == key)
      val kc = cases.filter(_.activities == key)
      val totalOcc = occCounts.getOrElse(key, 0L)
      val batchedOcc = kc.length.toLong
      // python-tuple rendering (reporting.py prints the tuple key):
      // singleton keys carry the trailing comma — ('X',)
      val parts = key.split(",")
      val tuple = if (parts.length == 1) s"('${parts.head}',)"
                  else parts.map(a => s"'$a'").mkString("(", ", ", ")")
      sb ++= s"\n\nBatch formed by activities: $tuple\n"
      sb ++= s"\tNum occurrences: $totalOcc\n"
      sb ++= s"\tNum occurrences in batch: $batchedOcc\n"
      sb ++= f"\tFrequency occurrences in batch: ${if (totalOcc == 0) 0d else batchedOcc * 100.0 / totalOcc}%.2f%%\n"
      sb ++= s"\tBatch size distribution: ${counter(kb.map(_.size))}\n"
      sb ++= statBlock("\t", kc)
      typeOrder.foreach { bt =>
        val tb = kb.filter(_.batchType == bt)
        val tc = kc.filter(_.batchType == bt)
        if (tb.nonEmpty) {
          sb ++= s"\t- Batch type: $bt\n"
          sb ++= s"\t\tNum batch instances: ${tb.length}\n"
          sb ++= s"\t\tBatch size distribution: ${counter(tb.map(_.size))}\n"
          sb ++= s"\t\tNum batch cases: ${tc.length}\n"
          sb ++= f"\t\tFrequency: ${if (totalOcc == 0) 0d else tc.length * 100.0 / totalOcc}%.2f%%\n"
          sb ++= statBlock("\t\t", tc)
        }
      }
    }
    sb.result()
  }

  private def statBlock(indent: String, cs: Array[CaseRow]): String = {
    val sb = new StringBuilder
    sb ++= s"${indent}Average overall processing time: ${fmtAvg(cs.map(_.ptUs))} sec\n"
    sb ++= s"${indent}Average overall waiting time: ${fmtAvg(cs.map(_.wtUs))} sec\n"
    val sumPt = cs.map(_.ptUs).sum.toDouble
    val sumWt = cs.map(_.wtUs).sum.toDouble
    val cte = if (sumPt > 0) sumPt / (sumPt + sumWt) else 0d
    sb ++= f"${indent}CTE: $cte%.2f\n"
    sb ++= s"${indent}Average total wt: ${fmtAvg(cs.map(_.totalUs))} sec\n"
    sb ++= s"${indent}Average creation wt: ${fmtAvg(cs.map(_.creationUs))} sec\n"
    sb ++= s"${indent}Average ready wt: ${fmtAvg(cs.map(_.readyUs))} sec\n"
    sb ++= s"${indent}Average other wt: ${fmtAvg(cs.map(_.otherUs))} sec\n"
    sb.result()
  }

  /** Counter({2: 77, 3: 10}) — count desc; TIES keep first-appearance
    * order like Python's Counter.most_common (stable sort over insertion
    * order), so callers must pass sizes in the reference's iteration order
    * (ascending batch id). */
  private def counter(xs: Array[Long]): String = {
    val cnt = xs.groupBy(identity).view.mapValues(_.length).toMap
    val items = xs.distinct.sortBy(k => -cnt(k)).map(k => s"$k: ${cnt(k)}")
    s"Counter({${items.mkString(", ")}})"
  }

  /** Mean duration rendered pandas-Timedelta-style: `D days HH:MM:SS`
    * + `.ffffff` (micros) when the sub-second part is micro-aligned, else
    * 9 digits. The mean goes through FLOAT64 like the reference
    * (numpy mean of Timedeltas: exact ns sum, float division, round to
    * nearest ns) — an exact-integer mean is off by ±1 ns on ~half the
    * golden lines because the double quantizes sums above 2^53 ns. */
  private def fmtAvg(xs: Array[Long]): String = {
    if (xs.isEmpty) return "0 days 00:00:00"
    // exact integer floor of the ns mean. The reference goes through
    // numpy/pandas float64, whose last-digit direction is an artifact of
    // summation order — floor reproduces all but 2 golden Production lines
    // (those land 1 ns higher); an exact rule beats chasing double noise.
    val ns = (xs.map(BigInt(_)).sum * 1000) / xs.length
    val totalSec = (ns / 1000000000L).toLong
    val frac = (ns % 1000000000L).toLong
    val days = totalSec / 86400
    val h = totalSec % 86400 / 3600
    val m = totalSec % 3600 / 60
    val s = totalSec % 60
    val base = f"$days days $h%02d:$m%02d:$s%02d"
    if (frac == 0) base
    else if (frac % 1000 == 0) base + f".${frac / 1000}%06d"
    else base + f".$frac%09d"
  }
}
