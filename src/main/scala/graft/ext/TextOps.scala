package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY J4): token/quality
  * stats, marker-token language ID. Pure expression plans (whole-stage
  * codegen, no UDFs). */
object TextOps {
  val stopwords: Seq[String] = Seq("the", "a", "or", "and", "of", "to", "in", "is")

  private def inList(xs: Seq[String]): String = xs.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Per-doc token counts, stopword ratio, punctuation count. */
  def qualityStats(docs: DataFrame): DataFrame =
    docs.selectExpr(
      "doc_id",
      "lang",
      "cast(size(split(text, ' ')) as bigint) as n_tokens",
      "cast(length(text) as bigint) as n_chars_measured",
      s"cast(size(filter(split(text, ' '), x -> x IN ${inList(stopwords)})) as bigint) as n_stop",
      "cast(length(text) - length(regexp_replace(text, '[.,;:!?]', '')) as bigint) as n_punct")
      .selectExpr("doc_id", "lang", "n_tokens", "n_chars_measured", "n_stop", "n_punct",
        "round(cast(n_stop as double) / n_tokens, 6) as stop_ratio")

  /** Marker-token language heuristic (deterministic tie order en > de > es). */
  def langId(docs: DataFrame): DataFrame =
    docs.selectExpr(
      "doc_id",
      "lang",
      "cast(size(filter(split(text, ' '), x -> x IN ('the', 'a', 'of'))) as bigint) as n_en",
      "cast(size(filter(split(text, ' '), x -> x IN ('der', 'die', 'und'))) as bigint) as n_de",
      "cast(size(filter(split(text, ' '), x -> x IN ('el', 'la', 'y'))) as bigint) as n_es")
      .selectExpr("doc_id", "lang", "n_en", "n_de", "n_es",
        """case when n_en >= n_de and n_en >= n_es then 'en'
          |     when n_de >= n_es then 'de' else 'es' end as predicted""".stripMargin)
      .selectExpr("doc_id", "lang", "n_en", "n_de", "n_es", "predicted",
        "(predicted = lang) as agree")

  /** Corpus-wide token frequency, deterministic top-k. */
  def topTokens(docs: DataFrame, k: Int = 20): DataFrame = {
    import docs.sparkSession.implicits._
    Dedup.tokens(docs)
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok")
      .limit(k)
  }
}
