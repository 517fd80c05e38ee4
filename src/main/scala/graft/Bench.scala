package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * emits ONE bare JSON line on stdout. Hardened after round 1, where the
  * line was swallowed by sbt's log prefix and a thrown query benched as a
  * fast success:
  *   - the JSON is ALSO written to a file (SPARK_GRAFT_BENCH_FILE, default
  *     ./graft_bench.json) so artifact capture never depends on stdout;
  *   - failed queries are listed under "failed" instead of silently timing
  *     the exception path.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the session (JIT, parquet footers) so the first timed query
    // doesn't absorb one-time startup cost
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val ok = results.filterNot { case (k, _) => failed.contains(k) }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "graft_bench.json")
    try Files.writeString(Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    // flush logs first so the JSON line is the last thing on stdout
    System.out.flush(); System.err.flush()
    println(json)
    spark.stop()
    if (failed.nonEmpty) System.err.println(s"[bench] ${failed.size} queries failed")
  }
}
