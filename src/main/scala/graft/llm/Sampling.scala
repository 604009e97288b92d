package graft.llm

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Both operators key on a content hash (md5) instead of `rand()`:
  * the assignment is a pure function of the row, so it is reproducible
  * across runs, partitionings, and engines (no seed bookkeeping, no
  * partition-order dependence — the property `df.sample`/`rand(seed)`
  * do NOT have), and a re-ingested duplicate lands in the same split.
  *
  * Scale: the per-group sample is one window top-k (WindowGroupLimit
  * partial before the shuffle); the split assign is a stateless map.
  */
object Sampling {

  /** k docs per group, chosen by smallest content hash — a
    * deterministic uniform-ish reservoir (equivalent to A-Res weighted
    * sampling with uniform weights and hash-derived keys).
    */
  def samplePerGroup(
      d: DataFrame, groupCol: String, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col("text").cast("binary")), col("doc_id"))
    d.withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
      .select(col(groupCol), col("doc_id"), col("rn"))
  }

  val samplePerGroupSql: String =
    """SELECT lang, doc_id, rn FROM (
      |  SELECT lang, doc_id,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(text), doc_id) AS BIGINT) AS rn
      |  FROM documents)
      |WHERE rn <= 5""".stripMargin

  /** Deterministic train/val/test assignment from the content hash:
    * bucket = first hash byte mod 10 -> 0-7 train, 8 val, 9 test.
    */
  def trainTestSplit(d: DataFrame): DataFrame = {
    val bucket = pmod(ascii(substring(md5(col("text").cast("binary")), 1, 1)) +
      ascii(substring(md5(col("text").cast("binary")), 2, 1)), lit(10))
    d.select(col("doc_id"),
      when(bucket <= 7, "train").when(bucket === 8, "val")
        .otherwise("test").as("split"))
  }

  val trainTestSplitSql: String =
    """SELECT doc_id,
      |  CASE
      |    WHEN (ascii(substr(md5(text), 1, 1)) + ascii(substr(md5(text), 2, 1)))
      |      % 10 <= 7 THEN 'train'
      |    WHEN (ascii(substr(md5(text), 1, 1)) + ascii(substr(md5(text), 2, 1)))
      |      % 10 = 8 THEN 'val'
      |    ELSE 'test'
      |  END AS split
      |FROM documents""".stripMargin

  /** Deterministic WEIGHTED (importance) sampling: keep probability
    * proportional to a per-doc weight (here token count, capped), with
    * the Bernoulli draw replaced by an integer hash of the content —
    * longer/higher-quality docs are kept more often, assignment stays a
    * pure row function (integer-exact across engines, reproducible,
    * duplicate-stable). The standard up-weighting step of training-data
    * mixes, minus the seed bookkeeping.
    */
  def weightedSample(d: DataFrame): DataFrame = {
    val h = md5(col("text").cast("binary"))
    // portable uniform-ish integer in [0, 10000) from hex chars
    val u = pmod(
      (ascii(substring(h, 1, 1)) * 131 + ascii(substring(h, 2, 1))) * 131 +
        ascii(substring(h, 3, 1)), lit(10000))
    val ntok = size(TextOps.wsTokens(col("text")))
    val keepBelow = least(ntok, lit(200)) * 50 // weight cap -> p <= 1
    d.select(col("doc_id"),
      ntok.cast("bigint").as("n_tokens"),
      u.cast("bigint").as("u"),
      keepBelow.cast("bigint").as("keep_below"))
      .filter(col("u") < col("keep_below"))
  }

  val weightedSampleSql: String =
    """SELECT doc_id, n_tokens, u, keep_below FROM (
      |  SELECT doc_id,
      |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
      |      t -> t <> '')) AS BIGINT) AS n_tokens,
      |    CAST(((ascii(substr(md5(text), 1, 1)) * 131 +
      |           ascii(substr(md5(text), 2, 1))) * 131 +
      |          ascii(substr(md5(text), 3, 1))) % 10000 AS BIGINT) AS u,
      |    CAST(least(len(list_filter(regexp_split_to_array(text, '\s+'),
      |      t -> t <> '')), 200) * 50 AS BIGINT) AS keep_below
      |  FROM documents)
      |WHERE u < keep_below""".stripMargin

  /** Deterministic GLOBAL SHUFFLE + shard assignment — the "shuffle
    * the corpus and write N training shards" step, as a pure row
    * function: shard = hash-derived bucket, position = rank of the
    * content hash WITHIN the shard. Reading shards in (shard, pos)
    * order yields a reproducible, source/time-decorrelated epoch order
    * (hash order is independent of ingest order), and a re-ingested
    * duplicate lands at the same place.
    *
    * Scale: the tempting alternative — round-robin over one global
    * row_number — is the single-reducer window anti-pattern. Hash-mod
    * sharding needs no coordination (shards balance to O(sqrt(n/k))
    * jitter, the same guarantee hash partitioning itself gives), and
    * the position window is PARTITIONED by shard, so ordering work
    * distributes one shard per reducer — exactly the layout the shard
    * writer wants (one sorted file per shard, cf. sortWithinPartitions).
    */
  def shardShuffle(d: DataFrame, nShards: Int = 8): DataFrame = {
    val h = md5(col("text").cast("binary"))
    val shard = graft.core.Layout.contentShard(col("text"), nShards)
    val w = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
    d.select(col("doc_id"), h.as("h"), shard.cast("bigint").as("shard"))
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  val shardShuffleSql: String =
    """SELECT doc_id, shard,
      |  CAST(row_number() OVER (PARTITION BY shard
      |    ORDER BY h, doc_id) AS BIGINT) AS pos
      |FROM (
      |  SELECT doc_id, md5(text) AS h,
      |    CAST((ascii(substr(md5(text), 1, 1)) * 131 +
      |          ascii(substr(md5(text), 2, 1))) % 8 AS BIGINT) AS shard
      |  FROM documents)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_per_group" -> ((s, d) =>
      samplePerGroup(Tables.load(s, d, "documents"), "lang")),
    "q_train_test_split" -> ((s, d) =>
      trainTestSplit(Tables.load(s, d, "documents"))),
    "q_sample_weighted" -> ((s, d) =>
      weightedSample(Tables.load(s, d, "documents"))),
    "q_shard_shuffle" -> ((s, d) =>
      shardShuffle(Tables.load(s, d, "documents"))))

  val oracleSql: Map[String, String] = Map(
    "q_sample_per_group" -> samplePerGroupSql,
    "q_train_test_split" -> trainTestSplitSql,
    "q_sample_weighted" -> weightedSampleSql,
    "q_shard_shuffle" -> shardShuffleSql)
}
