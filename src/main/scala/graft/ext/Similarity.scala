package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY J3/J5).
  *
  * Determinism: floats are quantized to integer millionths, so dot products
  * and norms are EXACT integer sums (order-independent, identical in the
  * DuckDB oracle); cosine is computed from those exact integers in double.
  * Brute-force top-k is the baseline; the quantized (vec, pos, q) layout is
  * the 100 TB path — shard queries, broadcast them, partial-aggregate dots.
  */
object Similarity {
  /** (vec_id, i, q) with q = round(x * 1e6) — exact integer embedding view. */
  def quantized(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb.select($"vec_id", posexplode($"embedding").as(Seq("i0", "x")))
      .select($"vec_id", ($"i0" + 1).as("i"), round($"x" * 1000000d).cast("long").as("q"))
  }

  /** Brute-force cosine top-k of every vec_id < nQueries against the corpus. */
  def knnCosine(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import emb.sparkSession.implicits._
    val qe = quantized(emb).cache()
    val norms = qe.groupBy($"vec_id").agg(sum($"q" * $"q").as("nq"))
    val queries = qe.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"i", $"q".as("qq"))
    val dots = queries
      .join(qe.select($"vec_id".as("vid"), $"i", $"q"), Seq("i"))
      .filter($"qid" =!= $"vid")
      .groupBy($"qid", $"vid")
      .agg(sum($"qq" * $"q").as("dot"))
    // cos similarity in integer millionths: round(x*1e6) operates on the
    // same IEEE double in Spark and DuckDB (round(x, 6) does not — DuckDB
    // rounds x*1e6 post hoc, Spark rounds the exact decimal expansion).
    val sims = dots
      .join(broadcast(norms.select($"vec_id".as("qid"), $"nq".as("na"))), Seq("qid"))
      .join(broadcast(norms.select($"vec_id".as("vid"), $"nq".as("nb"))), Seq("vid"))
      .select($"qid", $"vid",
        round($"dot".cast("double") / sqrt($"na".cast("double") * $"nb".cast("double")) * 1000000d)
          .cast("long").as("cos_sim_e6"))
    sims
      .withColumn("rank",
        row_number().over(Window.partitionBy("qid").orderBy($"cos_sim_e6".desc, $"vid")).cast("long"))
      .filter($"rank" <= k)
      .select($"qid", $"vid", $"cos_sim_e6", $"rank")
  }
}
