package graft
import org.apache.spark.sql.SparkSession
object ArProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def mkSession(): SparkSession = {
      val s = Harness.tmpfsLocalDir(SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")).getOrCreate()
      s.sparkContext.setLogLevel("ERROR"); s
    }
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    for (pass <- 1 to 3) {
      println(s"-- pass $pass (fresh session)")
      val spark = mkSession()
      val log = pm.EventLogOps.fromEvents(spark, sfDir)
      time("read")(log.count())
      val en = time("K2 enabled+stage")(Pinned.stage(pm.EnabledTime.withEnabled(log)))
      val disc = time("discover+stage")(Pinned.stage(pm.BatchDiscovery.discover(en)))
      time("features")(rules.Features.featuresTable(disc).count())
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
