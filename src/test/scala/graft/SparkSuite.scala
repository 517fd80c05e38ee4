package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // bound per-action plan-description cost: discoverFull's final frame
      // references its persisted intermediates many times, and the
      // DAG-to-tree expansion of the UNCAPPED explain string (built for
      // every SQLExecutionStart event) grows super-linearly — an uncapped
      // suite run spent 27+ CPU-minutes inside generateTreeString
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
