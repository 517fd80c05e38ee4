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
  case class BatchRow(activities: String, batchType: String, batchId: Long, size: Long)
  case class CaseRow(activities: String, batchType: String, batchId: Long,
                     ptUs: Long, wtUs: Long, totalUs: Long, creationUs: Long,
                     readyUs: Long, otherUs: Long)

  /** Render the full report for a discovered log. */
  def render(disc: DataFrame): String = {
    import disc.sparkSession.implicits._
    val bev = disc.filter($"batch_id".isNotNull)

    val acts = bev.groupBy($"batch_id")
      .agg(concat_ws(",", sort_array(collect_set($"activity"))).as("activities"))
    val batches = bev.groupBy($"batch_id", $"batch_type")
      .agg(countDistinct($"case_id").as("size"))
      .join(acts, Seq("batch_id"))
      .select($"activities", $"batch_type", $"batch_id", $"size".cast("long"))
      .as[(String, String, Long, Long)].collect()
      .map(t => BatchRow(t._1, t._2, t._3, t._4))

    val cases = WaitingTimes.batchCaseWT(disc)
      .join(acts, Seq("batch_id"))
      .select($"activities", $"batch_type", $"batch_id",
        $"pt_us", $"wt_us", $"total_wt_us", $"creation_wt_us", $"ready_wt_us", $"other_wt_us")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => CaseRow(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9))

    // occurrence counts per activities key: single-activity keys are a
    // plain count; multi-activity keys (subprocess batches) count ordered
    // occurrences of the group's representative activity SEQUENCE per case
    // (W2 general-n, utils.py:199-229: the sequence is the first batch's
    // first case's ordered activities; rolling windows matched exactly)
    val singleCounts = disc.groupBy($"activity").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val multiKeys = batches.map(_.activities).distinct.filter(_.contains(",")).toSeq
    val multiCounts: Map[String, Long] =
      if (multiKeys.isEmpty) Map.empty
      else {
        val bk = bev.join(acts.withColumnRenamed("activities", "akey"), Seq("batch_id"))
          .filter($"akey".isin(multiKeys: _*))
        // representative = min batch_id of the group, its min case
        val minB = bk.groupBy($"akey").agg(min($"batch_id").as("batch_id"))
        val minC = bk.join(minB, Seq("akey", "batch_id"))
          .groupBy($"akey", $"batch_id").agg(min($"case_id").as("case_id"))
        val repSeq = bk.join(minC, Seq("akey", "batch_id", "case_id"))
          .groupBy($"akey")
          .agg(transform(
            sort_array(collect_list(struct($"start_us", $"end_us", $"event_id", $"activity"))),
            x => x.getField("activity")).as("seq"))
          .as[(String, Seq[String])].collect().toMap
        repSeq.map { case (key, sq) =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("case_id").orderBy("start_us", "end_us", "event_id")
            .rowsBetween(0, sq.length - 1)
          key -> disc.withColumn("win", collect_list($"activity").over(w))
            .filter($"win" === array(sq.map(lit): _*)).count()
        }
      }

    val typeOrder = Seq("Parallel", "Sequential task-based", "Concurrent task-based",
      "Sequential case-based", "Concurrent case-based")
    val sb = new StringBuilder
    batches.map(_.activities).distinct.sorted.foreach { key =>
      val kb = batches.filter(_.activities == key)
      val kc = cases.filter(_.activities == key)
      val totalOcc =
        if (key.contains(",")) multiCounts.getOrElse(key, 0L)
        else singleCounts.getOrElse(key, 0L)
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

  /** Counter({2: 77, 3: 10}) — count desc, then key asc, like the golden
    * files' repr. */
  private def counter(xs: Array[Long]): String = {
    val items = xs.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (k, n) => (-n, k) }
      .map { case (k, n) => s"$k: $n" }
    s"Counter({${items.mkString(", ")}})"
  }

  /** Mean duration rendered pandas-Timedelta-style: `D days HH:MM:SS[.f9]`. */
  private def fmtAvg(xs: Array[Long]): String = {
    if (xs.isEmpty) return "0 days 00:00:00"
    val ns = (xs.map(BigInt(_)).sum * 1000) / xs.length // floor nanos
    val totalSec = (ns / 1000000000L).toLong
    val frac = (ns % 1000000000L).toLong
    val days = totalSec / 86400
    val h = totalSec % 86400 / 3600
    val m = totalSec % 3600 / 60
    val s = totalSec % 60
    val base = f"$days days $h%02d:$m%02d:$s%02d"
    if (frac == 0) base else base + f".$frac%09d"
  }
}
