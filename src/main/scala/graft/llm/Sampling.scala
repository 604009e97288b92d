package graft.llm

import graft.core.Barrier.BarrierOps
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
    * bucket = (ascii of hex char 1) * 1 + (ascii of hex char 2), mod
    * 10 -> 0-7 train, 8 val, 9 test. NOTE the bucket function is the
    * SUM OF THE ASCII CODES of the first two hex characters, not a
    * hash byte — any external reimplementation must copy this exact
    * rule (that reproducibility is the operator's whole point). The
    * ascii-sum distribution over uniform hex is slightly uneven:
    * measured shares are ~78.5 / 10.6 / 10.9 rather than a crisp
    * 80/10/10 — acceptable for split assignment, documented so nobody
    * reads the 0-7/8/9 bucketing as exact decile shares.
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
      |    CAST(len(list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |      t -> t <> '')) AS BIGINT) AS n_tokens,
      |    CAST(((ascii(substr(md5(text), 1, 1)) * 131 +
      |           ascii(substr(md5(text), 2, 1))) * 131 +
      |          ascii(substr(md5(text), 3, 1))) % 10000 AS BIGINT) AS u,
      |    CAST(least(len(list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
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
  def shardShuffle(
      d: DataFrame,
      nShards: Int = graft.core.Layout.DefaultShards): DataFrame = {
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
      |    CAST(__SHARD__ AS BIGINT) AS shard
      |  FROM documents)""".stripMargin
      .replace("__SHARD__", graft.core.Layout.contentShardSql("text"))

  /** Quality-ranked selection under a per-domain TOKEN BUDGET — "take
    * the best docs of each language until its budget is spent", the
    * step that turns quality scores into an actual training mix.
    * Docs are ordered (quality desc, doc_id) per lang; a doc is kept
    * iff the running token total through it is within the budget.
    * Quality is the integer alpha-ratio permille-x10 (alpha chars *
    * 10000 DIV chars), so ordering is integer-exact across engines.
    *
    * Scale: the textbook form — one cumulative-sum window PARTITIONED
    * BY lang over the doc table — puts an entire domain through one
    * reducer (a web corpus is 40% English: that is a 40 TB single
    * task). This implementation decomposes it exactly:
    *   1. aggregate per (lang, quality) class — ≤ 10002 rows per lang,
    *      whatever the corpus size;
    *   2. cumulative-sum over CLASSES (a window over the tiny
    *      aggregate) to find each lang's budget boundary;
    *   3. classes fully inside the budget keep all their docs via a
    *      broadcast-sized semi join — no doc-level window at all;
    *   4. only the ONE boundary class per lang runs a doc-level
    *      ordered prefix, partitioned by (lang, quality) — the skew
    *      bound is the largest single quality class, not the largest
    *      domain (degenerate only if one class IS the domain).
    * Output is row-identical to the naive single-window form (the
    * oracle below and PropertySpec's equivalence fuzz both assert it);
    * `cum_tokens` is intentionally not a output column — emitting it
    * would force the per-doc prefix back in for every kept row.
    */
  def tokenBudget(d: DataFrame, budget: Long = 3000L): DataFrame = {
    val q = coalesce(TextOps.alphaX10000OfText, lit(-1L))
    // materialize the compact doc-level base ONCE: three consumers
    // (class histogram, full-class join, boundary join) would otherwise
    // each re-scan the corpus WITH the text column — the one heavy
    // column, dropped here after scoring. The checkpoint holds four
    // narrow columns per doc (the curateFull pattern, Pipeline.scala)
    val base = d.select(col("lang"), col("doc_id"), q.as("q_x10000"),
      size(TextOps.wsTokens(col("text"))).cast("bigint").as("n_tokens"))
      .barrier()
    val classes = base.groupBy("lang", "q_x10000")
      .agg(sum("n_tokens").as("class_tokens"))
    // tokens in all strictly-better quality classes of the same lang
    val wPrev = Window.partitionBy("lang").orderBy(col("q_x10000").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val annotated = classes.withColumn("cum_before",
      coalesce(sum("class_tokens").over(wPrev), lit(0L)))
    val full = annotated
      .filter(col("cum_before") + col("class_tokens") <= budget)
    // cum_before <= budget (not <): a zero-token doc sitting exactly
    // at the boundary is kept by the naive form and must be here too
    val boundary = annotated.filter(col("cum_before") <= budget &&
      col("cum_before") + col("class_tokens") > budget)
    val keptFull = base
      .join(full.select("lang", "q_x10000"), Seq("lang", "q_x10000"), "left_semi")
    val wDoc = Window.partitionBy("lang", "q_x10000").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBoundary = base
      .join(boundary.select("lang", "q_x10000", "cum_before"),
        Seq("lang", "q_x10000"))
      .withColumn("cum", col("cum_before") + sum("n_tokens").over(wDoc))
      .filter(col("cum") <= budget)
      .select(base.columns.map(col): _*)
    keptFull.unionByName(keptBoundary)
      .select(col("lang"), col("doc_id"), col("q_x10000"), col("n_tokens"))
  }

  val tokenBudgetSql: String =
    """SELECT lang, doc_id, q_x10000, n_tokens FROM (
      |  SELECT lang, doc_id, q_x10000, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY q_x10000 DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM (
      |    SELECT lang, doc_id,
      |      coalesce(CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g'))
      |          AS BIGINT) * 10000 // nullif(length(text), 0), -1)
      |        AS q_x10000,
      |      CAST(len(list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |        t -> t <> '')) AS BIGINT) AS n_tokens
      |    FROM documents))
      |WHERE cum <= 3000""".stripMargin

  /** Deterministic EPOCH UPSAMPLING — materializes the domain-mixing
    * plan ([[CorpusOps.mixDomains]] computes the weights; this
    * operator realizes them): every doc of a targeted language is
    * emitted floor(w) or ceil(w) times, the fractional choice decided
    * by a content-hash draw, so the output corpus hits the target mix
    * in expectation with zero seed bookkeeping (pure row function:
    * reproducible, partition-independent, duplicate-stable — the same
    * contract as every operator in this file). Weights are integer
    * permille ((target ‰ × total tokens) DIV domain tokens, capped at
    * 4000 ‰ = 4 epochs) so both engines agree bit-exactly; the cap
    * bounds output amplification, the standard guard against a tiny
    * domain exploding the corpus.
    *
    * Scale: one domains-sized aggregation (tiny, broadcast back), then
    * a map-side hash draw + explode — no shuffle touches the corpus.
    */
  /** THE target language mix, integer permille — the ONE source for
    * [[epochUpsample]]'s weights, [[CorpusOps.mixDomains]]'s shares
    * (permille / 1000.0), both operators' oracle VALUES lists, and
    * PropertySpec's independent replay. Edit here; everything else is
    * derived.
    */
  val TargetMixPermille: Seq[(String, Long)] = Seq(
    "en" -> 300L, "zh" -> 250L, "es" -> 200L, "de" -> 150L, "fr" -> 100L)

  def epochUpsample(d: DataFrame): DataFrame = {
    val tgt = typedLit(TargetMixPermille.toMap)
    val perLang = d.groupBy("lang")
      .agg(sum(size(TextOps.wsTokens(col("text")))).cast("bigint")
        .as("n_tokens"))
    val total = perLang.agg(sum("n_tokens").cast("bigint").as("tot_tokens"))
    val weights = perLang.crossJoin(broadcast(total))
      .withColumn("permille", element_at(tgt, col("lang")))
      // inner-join semantics vs the target map (mixDomains' contract);
      // nullif guards the ANSI DIV against an all-empty-text domain
      .filter(col("permille").isNotNull)
      .withColumn("w_x1000",
        expr("least(4000L, (permille * tot_tokens)" +
          " DIV nullif(n_tokens, 0))"))
      .filter(col("w_x1000").isNotNull)
      .select("lang", "w_x1000")
    val h = md5(col("text").cast("binary"))
    val u = pmod(
      (ascii(substring(h, 1, 1)) * 131 + ascii(substring(h, 2, 1))) * 131 +
        ascii(substring(h, 3, 1)), lit(1000)).cast("bigint")
    d.join(broadcast(weights), "lang")
      .withColumn("n_copies",
        expr("w_x1000 DIV 1000") +
          when(u < col("w_x1000") % 1000, 1L).otherwise(0L))
      // sequence(1, 0) in Spark steps BACKWARD ([1, 0]) — guard the
      // zero-copy case with an empty array (explode then drops the row)
      .withColumn("copy", explode(
        when(col("n_copies") >= 1, sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<bigint>"))))
      .select(col("doc_id"), col("lang"), col("copy"),
        col("n_copies").cast("bigint").as("n_copies"))
  }

  val epochUpsampleSql: String =
    """WITH pl AS (
      |  SELECT lang,
      |    CAST(sum(len(list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |      t -> t <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM pl),
      |tgt(lang, permille) AS (VALUES __TGT_VALUES__),
      |w AS (
      |  SELECT pl.lang,
      |    least(4000, (tgt.permille * tot.tot_tokens)
      |      // nullif(pl.n_tokens, 0)) AS w_x1000
      |  FROM pl JOIN tgt ON pl.lang = tgt.lang CROSS JOIN tot
      |  WHERE (tgt.permille * tot.tot_tokens)
      |    // nullif(pl.n_tokens, 0) IS NOT NULL),
      |counted AS (
      |  SELECT d.doc_id, d.lang,
      |    w.w_x1000 // 1000 + CASE WHEN
      |      ((ascii(substr(md5(d.text), 1, 1)) * 131 +
      |        ascii(substr(md5(d.text), 2, 1))) * 131 +
      |       ascii(substr(md5(d.text), 3, 1))) % 1000 < w.w_x1000 % 1000
      |      THEN 1 ELSE 0 END AS n_copies
      |  FROM documents d JOIN w ON d.lang = w.lang)
      |SELECT doc_id, lang,
      |  CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy,
      |  CAST(n_copies AS BIGINT) AS n_copies
      |FROM counted
      |WHERE n_copies >= 1""".stripMargin
      .replace("__TGT_VALUES__", TargetMixPermille
        .map { case (l, p) => s"('$l', $p)" }.mkString(", "))

  /** Curriculum schedule: assign every doc a training PHASE by quality
    * band (integer alpha-ratio, the shared curation score — band
    * boundaries are integer compares, bit-identical across engines)
    * and a deterministic position within (shard, phase) by content
    * hash. The curriculum order a trainer consumes is
    * (phase, pos, shard): all phase-1 docs first, round-robin across
    * shards, shuffled-within-shard by hash — quality-first scheduling
    * with zero seed bookkeeping, reproducible across reruns and
    * repartitions.
    *
    * Scale: the only shuffle is the (shard, phase)-partitioned
    * position window — nShards x 3 phases (default
    * Layout.DefaultShards = 8) of bounded size; there is
    * deliberately NO global ordinal (a global row_number would
    * single-reduce 100 TB; the (phase, pos, shard) sort key gives the
    * same total order for free at read time).
    */
  def curriculumSchedule(
      d: DataFrame,
      nShards: Int = graft.core.Layout.DefaultShards): DataFrame = {
    val q = coalesce(TextOps.alphaX10000OfText, lit(-1L))
    val h = md5(col("text").cast("binary"))
    val shard = graft.core.Layout.contentShard(col("text"), nShards)
    val w = Window.partitionBy("shard", "phase").orderBy(col("h"), col("doc_id"))
    d.select(col("doc_id"), q.as("q_x10000"), h.as("h"),
        shard.cast("bigint").as("shard"))
      .withColumn("phase",
        when(col("q_x10000") >= 8000, lit(1L))
          .when(col("q_x10000") >= 6000, lit(2L))
          .otherwise(lit(3L)))
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .select(col("doc_id"), col("q_x10000"), col("phase"), col("shard"),
        col("pos"))
  }

  val curriculumScheduleSql: String =
    """SELECT doc_id, q_x10000, phase, shard,
      |  CAST(row_number() OVER (PARTITION BY shard, phase
      |    ORDER BY h, doc_id) AS BIGINT) AS pos
      |FROM (
      |  SELECT doc_id, q_x10000,
      |    CAST(CASE WHEN q_x10000 >= 8000 THEN 1
      |         WHEN q_x10000 >= 6000 THEN 2
      |         ELSE 3 END AS BIGINT) AS phase,
      |    h, shard
      |  FROM (
      |    SELECT doc_id,
      |      coalesce(CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g'))
      |          AS BIGINT) * 10000 // nullif(length(text), 0), -1)
      |        AS q_x10000,
      |      md5(text) AS h,
      |      CAST(__SHARD__ AS BIGINT) AS shard
      |    FROM documents))""".stripMargin
      .replace("__SHARD__", graft.core.Layout.contentShardSql("text"))

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every source document by how target-like
    * its hashed-bigram distribution is. Features are bigrams hashed to
    * `nBuckets` (the paper's hashed n-gram trick — the vocabulary
    * never materializes, the stats table is bucket-sized); bucket
    * probabilities are add-one smoothed over the 1-in-97 target slice
    * (the decontam convention) vs the remaining source corpus; a doc's
    * importance weight is the mean log probability ratio of its bigram
    * buckets (round(.,4), identically parenthesized in the oracle —
    * positive = target-like, the resampling key).
    *
    * Scale: doc bigrams map-side hash to buckets; the bucket stats
    * table (nBuckets rows) and the two totals broadcast; per-doc
    * scoring is one co-partitioned aggregate. The target slice is
    * eval-sized — the same asymmetry contract as decontamination.
    */
  def dsirWeights(d: DataFrame, nBuckets: Int = 4096): DataFrame = {
    val toks = TextOps.wsTokens(col("text"))
    val bigrams = d.select(
      col("doc_id"),
      explode(
        when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => concat(element_at(toks, i), lit(" "),
              element_at(toks, i + 1))))
          .otherwise(array().cast("array<string>"))).as("bg"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("bg").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(nBuckets.toLong)).as("bucket"))
    val isTarget = col("doc_id") % 97 === 0
    val tgt = bigrams.filter(isTarget)
    val src = bigrams.filter(!isTarget)
    val tCnt = tgt.groupBy("bucket").agg(count(lit(1)).as("t_cnt"))
    val sCnt = src.groupBy("bucket").agg(count(lit(1)).as("s_cnt"))
    val totals = tgt.agg(count(lit(1)).as("tt"))
      .crossJoin(broadcast(src.agg(count(lit(1)).as("ss"))))
    val stats = tCnt.join(sCnt, Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("t_cnt"), lit(0L)).as("t_cnt"),
        coalesce(col("s_cnt"), lit(0L)).as("s_cnt"))
    val scored = src.join(broadcast(stats), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (log((coalesce(col("t_cnt"), lit(0L)).cast("double") + lit(1.0)) /
          (col("tt").cast("double") + nBuckets)) -
          log((coalesce(col("s_cnt"), lit(0L)).cast("double") + lit(1.0)) /
            (col("ss").cast("double") + nBuckets))).as("lr"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lr")), 4).as("dsir_weight"))
    d.filter(!isTarget).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("dsir_weight"), lit(0.0)).as("dsir_weight"))
  }

  def dsirWeightsSql(nBuckets: Int = 4096): String =
    s"""WITH bg AS (
       |  SELECT doc_id,
       |    list_reduce(list_transform(range(8), i ->
       |      CAST(strpos('0123456789abcdef', substr(md5(g), i + 1, 1)) - 1
       |        AS BIGINT)), (a, b) -> a * 16 + b) % $nBuckets AS bucket
       |  FROM (
       |    SELECT doc_id, unnest([toks[i] || ' ' || toks[i + 1]
       |                           FOR i IN range(1, len(toks))]) AS g
       |    FROM (SELECT doc_id,
       |            list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'),
       |              t -> t <> '') AS toks
       |          FROM documents))),
       |tgt AS (SELECT * FROM bg WHERE doc_id % 97 = 0),
       |src AS (SELECT * FROM bg WHERE doc_id % 97 <> 0),
       |tc AS (SELECT bucket, count(*) AS t_cnt FROM tgt GROUP BY 1),
       |sc AS (SELECT bucket, count(*) AS s_cnt FROM src GROUP BY 1),
       |tot AS (SELECT (SELECT count(*) FROM tgt) AS tt,
       |               (SELECT count(*) FROM src) AS ss),
       |scored AS (
       |  SELECT src.doc_id, count(*) AS n_bigrams,
       |    round(avg(
       |      ln((coalesce(tc.t_cnt, 0)::DOUBLE + 1.0)
       |         / (tot.tt::DOUBLE + $nBuckets))
       |      - ln((coalesce(sc.s_cnt, 0)::DOUBLE + 1.0)
       |           / (tot.ss::DOUBLE + $nBuckets))), 4) AS dsir_weight
       |  FROM src
       |  LEFT JOIN tc ON src.bucket = tc.bucket
       |  LEFT JOIN sc ON src.bucket = sc.bucket
       |  CROSS JOIN tot
       |  GROUP BY src.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  coalesce(s.dsir_weight, 0.0) AS dsir_weight
       |FROM documents d LEFT JOIN scored s USING (doc_id)
       |WHERE d.doc_id % 97 <> 0""".stripMargin

  /** Split-leakage panel: for each duplicate-identity level, how many
    * duplicate classes span more than one train/val/test split — the
    * hygiene check run AFTER splitting and BEFORE training, because a
    * near-duplicate of a test document inside the training set silently
    * inflates every eval number.
    *
    * Two identity levels in one pass:
    *  - `exact` (md5 of the raw text). [[trainTestSplit]] assigns the
    *    split from a hash OF THE TEXT, so identical texts land in the
    *    same split by construction and this row proves it (0 cross-split
    *    classes) — the reason content-hash splits beat doc-id splits.
    *  - `canonical` (sorted distinct token set, the
    *    [[Dedup]] canonical identity): token reorderings hash to
    *    different raw texts, land in independent splits, and DO leak —
    *    this row counts the classes and docs at risk.
    *
    * Scale: one corpus scan exploded to 2 (level, hash) rows per doc,
    * one hash-partitioned aggregate (the exact-dedup shuffle shape),
    * then a 2-row rollup. Nothing vocabulary- or pair-sized.
    */
  def splitLeakage(d: DataFrame): DataFrame = {
    val h = md5(col("text").cast("binary"))
    val split = when(
      pmod(ascii(substring(h, 1, 1)) + ascii(substring(h, 2, 1)), lit(10)) <= 7,
      "train")
      .when(pmod(ascii(substring(h, 1, 1)) + ascii(substring(h, 2, 1)),
        lit(10)) === 8, "val")
      .otherwise("test")
    val canon = md5(array_join(
      sort_array(array_distinct(TextOps.wsTokens(col("text")))), " ")
      .cast("binary"))
    val lv = array(
      struct(lit("exact").as("level"), h.as("h")),
      struct(lit("canonical").as("level"), canon.as("h")))
    val classes = d.select(split.as("split"), explode(lv).as("x"))
      .groupBy(col("x.level").as("level"), col("x.h").as("h"))
      .agg(count(lit(1)).as("n_docs"), countDistinct("split").as("n_splits"))
    classes.groupBy("level").agg(
      sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_classes"),
      sum(when(col("n_splits") >= 2, 1L).otherwise(0L))
        .as("n_cross_split_classes"),
      sum(when(col("n_splits") >= 2, col("n_docs")).otherwise(0L))
        .as("n_docs_at_risk"))
  }

  val splitLeakageSql: String =
    """WITH base AS (
      |  SELECT
      |    CASE
      |      WHEN (ascii(substr(md5(text), 1, 1)) +
      |            ascii(substr(md5(text), 2, 1))) % 10 <= 7 THEN 'train'
      |      WHEN (ascii(substr(md5(text), 1, 1)) +
      |            ascii(substr(md5(text), 2, 1))) % 10 = 8 THEN 'val'
      |      ELSE 'test'
      |    END AS split,
      |    md5(text) AS h_exact,
      |    md5(coalesce(array_to_string(list_sort(list_distinct(
      |      list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |        t -> t <> ''))), ' '), '')) AS h_canon
      |  FROM documents),
      |lv AS (
      |  SELECT split, 'exact' AS level, h_exact AS h FROM base
      |  UNION ALL
      |  SELECT split, 'canonical' AS level, h_canon AS h FROM base),
      |classes AS (
      |  SELECT level, h, count(*) AS n_docs,
      |    count(DISTINCT split) AS n_splits
      |  FROM lv GROUP BY 1, 2)
      |SELECT level,
      |  CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_classes,
      |  CAST(sum(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_cross_split_classes,
      |  CAST(sum(CASE WHEN n_splits >= 2 THEN n_docs ELSE 0 END) AS BIGINT)
      |    AS n_docs_at_risk
      |FROM classes GROUP BY 1""".stripMargin

  /** Leakage-SAFE split generator — the FIX for what [[splitLeakage]]
    * audits: instead of hashing each doc independently (which strands
    * the members of a near-dup cluster on both sides of the
    * train/test wall), hash the doc's [[Dedup.dupClusters]] CLUSTER
    * id, so every near-dup class lands wholly in one split and
    * cross-split near-dup leakage is structurally impossible at the
    * clustering's threshold. 80/10/10 by h60(cluster) mod 10 —
    * singleton docs are their own cluster (cluster_id = doc_id), so
    * the split stays ~uniform.
    *
    * Scale: rides the dup-clustering (banded candidates + min-label
    * propagation, the documented trio convention); the split
    * assignment itself is map-only over (doc, cluster).
    */
  def clusterSplit(d: DataFrame): DataFrame = {
    val m = pmod(graft.ops.Hll.h60(
      concat(lit("split:"), col("cluster_id").cast("string"))), lit(10))
    Dedup.dupClusters(d)
      .select(col("doc_id"), col("cluster_id"),
        when(m <= 7, lit("train")).when(m === 8, lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  val clusterSplitSql: String = {
    val h = graft.ops.Hll.h60Sql("'split:' || CAST(cluster_id AS VARCHAR)")
    s"""WITH assigned AS (${Dedup.dupClustersSql})
       |SELECT doc_id, cluster_id,
       |  CASE WHEN ($h) % 10 <= 7 THEN 'train'
       |       WHEN ($h) % 10 = 8 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM assigned""".stripMargin
  }

  /** Temperature-scaled language resampling (the XLM-R / mT5 mixture
    * reshape at alpha = 0.5): each language's token budget is
    * proportional to sqrt(its token count) — rare languages are
    * upsampled RELATIVE to head languages, the standard fix for a
    * corpus one language dominates — and the engine keeps, per
    * language, the hash-ordered doc prefix that fills the budget
    * (total budget = half the corpus). Integer-exact: isqrt via
    * floor(sqrt(double)) is identical in both engines (IEEE sqrt is
    * correctly rounded, the operand is far below 2^52), and the
    * budget split is integer division. Unlike [[CorpusOps.mixDomains]]
    * (reweights toward an EXTERNAL target mix), the target here is
    * derived from the data itself — no configuration to drift.
    *
    * Scale: the selection is the [[tokenBudget]] two-pass — the
    * selection hash's top 8 bits quantize each language into 256
    * buckets, bucket-level token sums take the per-lang cumulative
    * window (lang x 256 rows, nothing doc-sized in one task), full
    * buckets are kept by semi-join, and only the ONE boundary bucket
    * per language pays a doc-level window. The naive per-lang doc
    * window — whose peak task the ScaleProbe budget probe measured
    * blowing up 5.8x at 4x data — is exactly what the oracle spells,
    * so the correctness gate IS the two-pass == naive equivalence.
    * Products stay under 2^63 for corpora below ~10^12 tokens per
    * sum_w unit; beyond that, scale the weights down first.
    */
  def temperatureSample(d: DataFrame): DataFrame = {
    val base = d.select(col("lang"), col("doc_id"),
        size(TextOps.wsTokens(col("text"))).cast("bigint").as("n_toks"))
      .withColumn("hsel", graft.ops.Hll.h60(
        concat(lit("ts:"), col("doc_id").cast("string"))))
      .withColumn("bkt", shiftright(col("hsel"), 52))
      .barrier()
    val perLang = base.groupBy("lang").agg(sum("n_toks").as("lang_tokens"))
      .withColumn("w",
        floor(sqrt(col("lang_tokens").cast("double"))).cast("bigint"))
    val tot = perLang.agg(sum("lang_tokens").as("total_tokens"),
      sum("w").as("sum_w"))
    val tgt = perLang.crossJoin(broadcast(tot))
      .select(col("lang"),
        expr("(total_tokens DIV 2) * w DIV sum_w").as("target_tokens"))
      .barrier()
    val bclass = base.groupBy("lang", "bkt").agg(sum("n_toks").as("b_tokens"))
    val wPrev = Window.partitionBy("lang").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ann = bclass.join(tgt, "lang")
      .withColumn("cum_before", coalesce(sum("b_tokens").over(wPrev), lit(0L)))
    val full = ann.filter(
      col("cum_before") + col("b_tokens") <= col("target_tokens"))
    val boundary = ann.filter(col("cum_before") <= col("target_tokens") &&
      col("cum_before") + col("b_tokens") > col("target_tokens"))
    val keptFull = base
      .join(full.select("lang", "bkt"), Seq("lang", "bkt"), "left_semi")
    val wDoc = Window.partitionBy("lang", "bkt").orderBy("hsel", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBoundary = base
      .join(boundary.select("lang", "bkt", "cum_before", "target_tokens"),
        Seq("lang", "bkt"))
      .withColumn("cum", col("cum_before") + sum("n_toks").over(wDoc))
      .filter(col("cum") <= col("target_tokens"))
      .select(base.columns.map(col): _*)
    keptFull.unionByName(keptBoundary)
      .join(tgt, "lang")
      .select(col("lang"), col("doc_id"), col("n_toks"), col("target_tokens"))
  }

  val temperatureSampleSql: String = {
    val h = graft.ops.Hll.h60Sql("'ts:' || CAST(doc_id AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT lang, doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'),
       |      t -> t <> '')) AS BIGINT) AS n_toks,
       |    $h AS hsel
       |  FROM documents),
       |pl AS (SELECT lang, sum(n_toks) AS lang_tokens FROM base GROUP BY 1),
       |plw AS (
       |  SELECT lang, lang_tokens,
       |    CAST(floor(sqrt(CAST(lang_tokens AS DOUBLE))) AS BIGINT) AS w
       |  FROM pl),
       |tot AS (SELECT sum(lang_tokens) AS total_tokens, sum(w) AS sum_w
       |  FROM plw),
       |tgt AS (
       |  SELECT lang,
       |    CAST((total_tokens // 2) * w // sum_w AS BIGINT) AS target_tokens
       |  FROM plw CROSS JOIN tot),
       |sel AS (
       |  SELECT b.lang, b.doc_id, b.n_toks, t.target_tokens,
       |    sum(b.n_toks) OVER (PARTITION BY b.lang
       |      ORDER BY b.hsel, b.doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM base b JOIN tgt t USING (lang))
       |SELECT lang, doc_id, n_toks, target_tokens
       |FROM sel WHERE cum <= target_tokens""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_temperature" -> ((s, d) =>
      temperatureSample(Tables.load(s, d, "documents"))),
    "q_split_leakage" -> ((s, d) =>
      splitLeakage(Tables.load(s, d, "documents"))),
    "q_sample_cluster_split" -> ((s, d) =>
      clusterSplit(Tables.load(s, d, "documents"))),
    "q_sample_dsir" -> ((s, d) =>
      dsirWeights(Tables.load(s, d, "documents"))),
    "q_sample_curriculum" -> ((s, d) =>
      curriculumSchedule(Tables.load(s, d, "documents"))),
    "q_sample_per_group" -> ((s, d) =>
      samplePerGroup(Tables.load(s, d, "documents"), "lang")),
    "q_train_test_split" -> ((s, d) =>
      trainTestSplit(Tables.load(s, d, "documents"))),
    "q_sample_weighted" -> ((s, d) =>
      weightedSample(Tables.load(s, d, "documents"))),
    "q_shard_shuffle" -> ((s, d) =>
      shardShuffle(Tables.load(s, d, "documents"))),
    "q_sample_token_budget" -> ((s, d) =>
      tokenBudget(Tables.load(s, d, "documents"))),
    "q_sample_epochs" -> ((s, d) =>
      epochUpsample(Tables.load(s, d, "documents"))))

  val oracleSql: Map[String, String] = Map(
    "q_sample_temperature" -> temperatureSampleSql,
    "q_sample_cluster_split" -> clusterSplitSql,
    "q_split_leakage" -> splitLeakageSql,
    "q_sample_dsir" -> dsirWeightsSql(),
    "q_sample_curriculum" -> curriculumScheduleSql,
    "q_sample_per_group" -> samplePerGroupSql,
    "q_train_test_split" -> trainTestSplitSql,
    "q_sample_weighted" -> weightedSampleSql,
    "q_shard_shuffle" -> shardShuffleSql,
    "q_sample_token_budget" -> tokenBudgetSql,
    "q_sample_epochs" -> epochUpsampleSql)
}
