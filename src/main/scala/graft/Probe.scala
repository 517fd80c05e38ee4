package graft
import org.apache.spark.sql.SparkSession

/** Per-query wall-time probe: times selected SparkEntry queries (all, if
  * none named) in a fresh session. Usage:
  *   tools/run.sh graft.Probe [sfDir] [q1 q2 ...]
  * Complements Bench (which times the whole suite in one long session) when
  * isolating a single query's cost from session cache state. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"== $n: ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$c")
        Pinned.release(spark)
      }
    }
    spark.stop()
  }
}
