package graft.llm

import graft.core.Barrier.BarrierOps
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composite training-data curation pipeline — the end-to-end flow
  * every piece of graft.llm exists for, as ONE declarative plan:
  *
  *   1. canonical dedup (keep the lowest doc_id per sorted-token-set
  *      hash — co-partitioned semi join of survivors; no broadcast
  *      hint, the survivor set is ~corpus-sized at web scale);
  *   2. quality gate (token count, alpha ratio, stopword ratio);
  *   3. annotate: predicted language + order-sensitive fingerprint.
  *
  * Because the whole pipeline is one Catalyst plan, every per-doc
  * metric computes in the same codegen stage — at 100 TB the pipeline
  * is one pass over the corpus plus the key-hashed shuffles of the
  * dedup (survivor aggregation + semi join on doc_id).
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
    // no broadcast hint: the exact-dedup survivor set is ~corpus-sized
    // at web scale (almost every doc is unique) — the co-partitioned
    // semi join is the shape that survives 100 TB, as curateFull below
    // documents; at small SF AQE may still choose to broadcast it
    val kept = withKey
      .join(survivors, Seq("doc_id"), "left_semi")
    val toks = TextOps.wsTokens(col("text"))
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    kept
      .withColumn("n_tokens", size(toks).cast("bigint"))
      // NULL (empty text) makes the >= 7000 gate drop the row in both
      // engines; see alphaX10000OfText for the ANSI NULLIF rationale
      .withColumn("alpha_x10000", TextOps.alphaX10000OfText)
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
       |      list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'), t -> t <> ''))),
       |      ' ')) AS canon,
       |    list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'), t -> t <> '')
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

  /** The FULL curation pipeline v2, composing the session's deeper
    * operators end-to-end (one plan per stage, split at the
    * materialized dedup boundary below):
    *
    *   1. exact-dedup survivors (min doc_id per content hash, semi
    *      join — co-partitioned, no broadcast: at web scale the
    *      survivor set IS most of the corpus);
    *   2. duplicated-span removal ([[Dedup.duplicateSpanRemove]]) —
    *      per-doc kept-token counts after cutting corpus-repeated
    *      passages;
    *   3. quality gates: hashing-trick classifier 'keep' AND char
    *      entropy >= 2.7 AND >= 10 surviving tokens;
    *   4. shard assignment + per-shard rollup (docs, kept tokens) —
    *      the numbers a shard writer needs.
    *
    * Every stage keys on doc_id or a content derivative, so the
    * composed plan is co-partitioned joins over per-doc metrics; the
    * only non-doc-keyed shuffles are the ones the component operators
    * already account for (window-hash count, char histogram).
    */
  def curateFull(d: DataFrame): DataFrame = {
    val survivors = d
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    // materialize the deduped corpus ONCE: four metric branches
    // consume sd, and each would otherwise re-run the scan + survivor
    // aggregation + semi join — the intermediate write every real
    // multi-stage pipeline does between dedup and scoring.
    // spread by doc_id first (r18): the semi join preserves the SCAN's
    // width, so the barrier pinned every downstream kernel branch
    // (span dedup, classifier, entropy) to the single scan task; the
    // spread also pre-partitions sd on the key all three metric joins
    // use, so they run exchange-free over the checkpointed layout
    val sd = graft.core.Layout.spread(
      d.join(survivors, Seq("doc_id"), "left_semi"), "doc_id").barrier()
    // the report form suffices: the pipeline only needs the kept-token
    // COUNT, which is n_tokens - dup_tokens (LlmSpec proves the apply
    // form agrees) — skipping the O(tokens x spans) reconstruction
    val cleaned = Dedup.duplicateSpans(sd)
      .select(col("doc_id"),
        (col("n_tokens") - col("dup_tokens")).as("n_kept"))
    val cls = TextOps.classifierScore(sd)
      .select(col("doc_id"), col("label"))
    val ent = TextOps.charEntropy(sd)
      .select(col("doc_id"), col("entropy"))
    val shards = sd.select(col("doc_id"),
      graft.core.Layout.contentShard(col("text"),
        graft.core.Layout.DefaultShards)
        .cast("bigint").as("shard"))
    cleaned.join(cls, "doc_id").join(ent, "doc_id").join(shards, "doc_id")
      .filter(col("label") === "keep" && col("entropy") >= 2.7 &&
        col("n_kept") >= 10)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_kept").cast("bigint").as("kept_tokens"))
  }

  val curateFullSql: String =
    """WITH surv AS (
      |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      |sd AS (SELECT d.doc_id, d.text FROM documents d JOIN surv USING (doc_id)),
      |base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '') AS toks
      |  FROM sd),
      |wins AS (
      |  SELECT doc_id,
      |    unnest([{'pos': i, 'g': md5(array_to_string(toks[i:i+14], ' '))}
      |            FOR i IN range(1, greatest(len(toks) - 13, 1))]) AS w
      |  FROM base),
      |wp AS (SELECT doc_id, w.pos AS pos, w.g AS g FROM wins),
      |dup AS (SELECT g FROM wp GROUP BY g HAVING count(*) >= 2),
      |m AS (SELECT doc_id, pos FROM wp JOIN dup USING (g)),
      |fl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(
      |        lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 15, -1)
      |      THEN 1 ELSE 0 END AS flag
      |  FROM m),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM fl),
      |sp AS (
      |  SELECT doc_id, island, min(pos) AS s, max(pos) + 14 AS e
      |  FROM isl GROUP BY 1, 2),
      |spl AS (SELECT doc_id, list({'s': s, 'e': e}) AS sp FROM sp GROUP BY 1),
      |cleaned AS (
      |  SELECT b.doc_id,
      |    len([b.toks[i] FOR i IN range(1, len(b.toks) + 1)
      |         IF len(list_filter(coalesce(l.sp, []),
      |               x -> i >= x.s AND i <= x.e)) = 0]) AS n_kept
      |  FROM base b LEFT JOIN spl l USING (doc_id)),
      |cls AS (
      |  SELECT doc_id,
      |    coalesce(list_sum(list_transform(
      |      list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |        t -> t <> ''),
      |      t -> ((ascii(substr(md5(t), 1, 1)) * 131 +
      |             ascii(substr(md5(t), 2, 1))) % 64 * 2654435761) % 1001
      |           - 500)), 0) AS raw
      |  FROM sd),
      |chars AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(text, ''),
      |      c -> c <> '')) AS ch
      |  FROM sd),
      |ccnt AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
      |ent AS (
      |  SELECT doc_id,
      |    round(CASE WHEN sum(c) = 0 THEN 0
      |      ELSE ln(sum(c)::DOUBLE) - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c)
      |      END, 4) AS entropy
      |  FROM ccnt GROUP BY 1),
      |shards AS (
      |  SELECT doc_id,
      |    CAST(__SHARD__ AS BIGINT) AS shard
      |  FROM sd)
      |SELECT s.shard, count(*) AS n_docs,
      |  CAST(sum(c.n_kept) AS BIGINT) AS kept_tokens
      |FROM cleaned c
      |JOIN cls USING (doc_id)
      |JOIN ent USING (doc_id)
      |JOIN shards s USING (doc_id)
      |WHERE cls.raw > 0 AND ent.entropy >= 2.7 AND c.n_kept >= 10
      |GROUP BY s.shard""".stripMargin
      .replace("__SHARD__", graft.core.Layout.contentShardSql("text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_curate" -> ((s, d) =>
      curate(Tables.load(s, d, "documents"))),
    "q_pipeline_full" -> ((s, d) =>
      curateFull(Tables.load(s, d, "documents"))))

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_curate" -> curateSql,
    "q_pipeline_full" -> curateFullSql)
}
