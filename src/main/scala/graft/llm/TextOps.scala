package graft.llm

import graft.core.Barrier.BarrierOps
import graft.core.Tables
import graft.mr.GoTokens
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: tokenization,
  * word count / inverted index (the reference apps re-hosted on a
  * columnar table), quality scoring, token counting, language ID
  * heuristic, and a rolling-hash document fingerprint.
  *
  * Everything here is built from codegen'd `functions._` (split /
  * filter / transform / aggregate higher-order functions) — no UDFs in
  * the hot path, so whole-stage codegen spans the full pipeline.
  *
  * Scale: all queries are embarrassingly parallel per document plus one
  * hash-partitioned aggregation; nothing materializes per-group state
  * beyond algebraic buffers except the inverted index (bounded by
  * vocabulary x doc count, the same bound the reference's indexer had).
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Letter-run tokens (reference splitter semantics, `mrapps/wc.go`). */
  def letterTokens(text: Column): Column =
    filter(split(text, GoTokens.sepRegex), t => length(t) > 0)

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Integer alpha-quality score of the `text` column: letter chars *
    * 10000 DIV total chars, NULL for empty text (the NULLIF keeps ANSI
    * mode from throwing on the division). Integer-exact across engines
    * — the property float ratios don't have. ONE definition shared by
    * the curation quality gate ([[Pipeline.curate]]) and the
    * token-budget sampler ([[Sampling.tokenBudget]]) so the gate and
    * the sampler's quality classes can never drift. (expr string
    * because DIV has no Column operator; it reads the column named
    * `text`, which both call sites guarantee.)
    */
  val alphaX10000OfText: Column =
    expr("CAST(CAST(length(regexp_replace(text, '[^\\\\p{L}]', '')) AS BIGINT)" +
      " * 10000 DIV nullif(length(text), 0) AS BIGINT)")

  /** Word count over documents — the wc app on a columnar source. */
  def wordCount(d: DataFrame): DataFrame =
    graft.core.Layout.spread(d, "doc_id")
      .select(explode(letterTokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  val wordCountSql: String =
    """SELECT word, count(*) AS cnt FROM (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |    t -> t <> '')) AS word
      |  FROM documents) GROUP BY word""".stripMargin

  /** Inverted index over documents — the indexer app re-hosted:
    * word -> (n_docs, sorted csv of doc ids).
    */
  def invertedIndex(d: DataFrame): DataFrame =
    graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"), explode(letterTokens(col("text"))).as("word"))
      // no distinct: collect_set dedups (map-side partials dedup
      // locally pre-shuffle), and a distinct here would add a second
      // full corpus-token exchange for byte-identical output
      .groupBy("word")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .select(
        col("word"),
        size(col("ids")).cast("bigint").as("n_docs"),
        array_join(transform(col("ids"), _.cast("string")), ",").as("doc_ids"))

  val invertedIndexSql: String =
    """SELECT word, CAST(len(ids) AS BIGINT) AS n_docs,
      |  array_to_string(ids, ',') AS doc_ids
      |FROM (
      |  SELECT word, list_sort(list(DISTINCT doc_id)) AS ids FROM (
      |    SELECT doc_id,
      |      unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |        t -> t <> '')) AS word
      |    FROM documents) GROUP BY word)""".stripMargin

  /** Ordered string-agg (the crash-payload reduce, A9): per language,
    * the sorted distinct sources joined with spaces.
    */
  def sortedJoin(d: DataFrame): DataFrame =
    d.groupBy("lang")
      .agg(array_join(sort_array(collect_set(col("source"))), " ")
        .as("sources"))

  val sortedJoinSql: String =
    """SELECT lang,
      |  array_to_string(list_sort(list(DISTINCT source)), ' ') AS sources
      |FROM documents GROUP BY lang""".stripMargin

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Per-document quality metrics: length, token count, average token
    * length, stopword ratio, letter ratio, punctuation count.
    */
  def quality(d: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    // zero guards: under ANSI mode (the Spark 4 default) an unguarded
    // division by a zero token/char count THROWS and kills the job on
    // the first empty document; NULL ratios are the clean contract,
    // mirrored in the oracle
    def safeRatio(num: Column, den: Column): Column =
      when(den === 0, lit(null).cast("double"))
        .otherwise(round(num.cast("double") / den, 4))
    d.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars_calc"),
      size(toks).cast("bigint").as("n_tokens"),
      safeRatio(length(regexp_replace(col("text"), "\\s", "")), size(toks))
        .as("avg_token_len"),
      safeRatio(size(filter(toks, t => t.isin(stopwords: _*))), size(toks))
        .as("stopword_ratio"),
      safeRatio(length(regexp_replace(col("text"), "[^\\p{L}]", "")),
        length(col("text"))).as("alpha_ratio"),
      length(regexp_replace(col("text"), "[^.!?,;]", "")).cast("bigint")
        .as("punct_count"))
  }

  val qualitySql: String = {
    val stops = stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars_calc,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CASE WHEN len(toks) = 0 THEN NULL ELSE
       |    round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |      / len(toks), 4) END AS avg_token_len,
       |  CASE WHEN len(toks) = 0 THEN NULL ELSE
       |    round(CAST(len(list_filter(toks, t -> t IN ($stops))) AS DOUBLE)
       |      / len(toks), 4) END AS stopword_ratio,
       |  CASE WHEN length(text) = 0 THEN NULL ELSE
       |    round(CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g'))
       |      AS DOUBLE) / length(text), 4) END AS alpha_ratio,
       |  CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS BIGINT)
       |    AS punct_count
       |FROM (SELECT doc_id, text,
       |  list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'), t -> t <> '')
       |    AS toks
       |FROM documents)""".stripMargin
  }

  /** Token counting two ways: whitespace and a BPE-ish regex
    * (letter runs | digit runs | single punctuation).
    */
  def tokenCount(d: DataFrame): DataFrame =
    d.select(
      col("doc_id"),
      size(wsTokens(col("text"))).cast("bigint").as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("bigint").as("bpe_tokens"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |    t -> t <> '')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text,
      |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
      |FROM documents""".stripMargin

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "en" -> Seq("the", "and", "of", "to", "is", "it"),
    "es" -> Seq("el", "los", "que", "es", "y", "una"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "zai"))

  /** Language-ID heuristic: distinct-token overlap with per-language
    * marker sets, argmax with alphabetical tie-break. (On the synthetic
    * corpus the shared vocabulary makes this mostly predict 'en' — the
    * operator contract, scoring + deterministic argmax, is what is
    * exercised; a real deployment swaps in real marker lists or n-gram
    * profiles.)
    */
  def langId(d: DataFrame): DataFrame = {
    val toks = array_distinct(wsTokens(lower(col("text"))))
    val scored = d.select(
      (Seq(col("doc_id"), col("lang")) ++ langMarkers.map { case (l, ws) =>
        size(filter(toks, t => t.isin(ws: _*))).cast("bigint").as(s"score_$l")
      }): _*)
    val m = greatest(langMarkers.map(lm => col(s"score_${lm._1}")): _*)
    val pred = langMarkers.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"score_$l") === m && m > 0, lit(l)).otherwise(acc)
    }
    // foldRight keeps alphabetical priority: de > en > es > fr > zh
    scored.withColumn("pred_lang", pred)
  }

  val langIdSql: String = {
    def marker(l: String): String =
      langMarkers.toMap.apply(l).map(w => s"'$w'").mkString(", ")
    val scores = langMarkers.map { case (l, _) =>
      s"CAST(len(list_filter(toks, t -> t IN (${marker(l)}))) AS BIGINT) AS score_$l"
    }.mkString(",\n  ")
    val m = "greatest(score_de, score_en, score_es, score_fr, score_zh)"
    s"""SELECT doc_id, lang, score_de, score_en, score_es, score_fr, score_zh,
       |  CASE
       |    WHEN $m = 0 THEN 'und'
       |    WHEN score_de = $m THEN 'de'
       |    WHEN score_en = $m THEN 'en'
       |    WHEN score_es = $m THEN 'es'
       |    WHEN score_fr = $m THEN 'fr'
       |    WHEN score_zh = $m THEN 'zh'
       |  END AS pred_lang
       |FROM (
       |  SELECT doc_id, lang,
       |    list_distinct(list_filter(
       |      regexp_split_to_array(lower(text), '[ \\t-\\r]+'), t -> t <> '')) AS toks,
       |  $scores
       |  FROM documents)""".stripMargin
  }

  /** Phrase search over positional postings — the inverted-index query
    * shape ([[invertedIndex]] stores doc sets; phrase queries need
    * POSITIONS): the probe phrase is the first 3 tokens of the lowest
    * doc_id document (data-derived, 1-row broadcast — no literal), and
    * matches are found by intersecting the three terms' posting lists
    * with the +1/+2 position-adjacency condition — never by re-scanning
    * text. Emits (doc_id, n_occurrences) for docs containing the
    * phrase at least once.
    *
    * Scale: this is the sub-scan ad-hoc-query story — each term's
    * postings are fetched by the (word-partitioned) posting join, so
    * query cost is posting-list-sized, not corpus-sized; the adjacency
    * joins are co-partitioned on (doc, pos). The oracle recounts
    * adjacent triples per document directly, so agreement proves the
    * postings path finds exactly the scan-truth occurrences.
    */
  def phraseSearch(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val probe = toks.orderBy("doc_id").limit(1)
      .select(element_at(col("toks"), 1).as("p1"),
        element_at(col("toks"), 2).as("p2"),
        element_at(col("toks"), 3).as("p3"))
    val post = toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "w")))
    val withProbe = post.crossJoin(broadcast(probe))
    val m1 = withProbe.filter(col("w") === col("p1"))
      .select(col("doc_id"), col("pos"), col("p2"), col("p3"))
    val m2 = post.select(col("doc_id"), (col("pos") - 1).as("pos"),
      col("w").as("w2"))
    val m3 = post.select(col("doc_id"), (col("pos") - 2).as("pos"),
      col("w").as("w3"))
    m1.join(m2, Seq("doc_id", "pos"))
      .filter(col("w2") === col("p2"))
      .join(m3, Seq("doc_id", "pos"))
      .filter(col("w3") === col("p3"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
  }

  val phraseSearchSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), x -> x <> '')
      |      AS toks
      |  FROM documents),
      |probe AS (
      |  SELECT toks[1] AS p1, toks[2] AS p2, toks[3] AS p3
      |  FROM t ORDER BY doc_id LIMIT 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
      |FROM (
      |  SELECT t.doc_id
      |  FROM t CROSS JOIN probe,
      |    LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) g
      |  WHERE toks[g.i] = p1 AND toks[g.i + 1] = p2 AND toks[g.i + 2] = p3)
      |GROUP BY doc_id""".stripMargin

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs (length 1..maxLen), each
    * word scored by degree/frequency over the candidate set
    * (`1000·deg DIV freq`, integer permille — deg sums the lengths of
    * phrases containing the word, rewarding words that live in long
    * collocations), and each distinct phrase scored as the sum of its
    * member word scores; top-k under (score desc, phrase). The
    * unsupervised keyword panel next to [[tfidf]]'s per-doc terms and
    * [[graft.llm.CorpusOps.pmiCollocations]]'s bigram lifts — RAKE is
    * the one that yields multi-word phrases of arbitrary length
    * without n-gram enumeration.
    *
    * Scale: phrase building is two doc-partitioned windows (stopword
    * cumsum + ordered collect) on ONE partitioning; word stats and
    * phrase scores are vocabulary-/phrase-keyed co-partitioned
    * aggregates; the top-k is TakeOrdered. No step is corpus-global.
    */
  def rakeKeyphrases(
      d: DataFrame, maxLen: Int = 4, k: Int = 30): DataFrame = {
    val toks = d.select(col("doc_id"),
      posexplode(wsTokens(lower(col("text")))).as(Seq("pos", "w")))
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val marked = toks
      .withColumn("is_stop", col("w").isin(stopwords: _*))
      .withColumn("grp",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(wDoc))
      .filter(!col("is_stop"))
    val phrases = marked.groupBy("doc_id", "grp")
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("ps"))
      .select(transform(col("ps"), p => p("w")).as("ws"))
      .filter(size(col("ws")) <= maxLen)
      .select(array_join(col("ws"), " ").as("phrase"),
        size(col("ws")).cast("bigint").as("plen"))
    val wordStats = phrases
      .select(col("plen"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy("w")
      .agg(sum("plen").as("deg"), count(lit(1)).as("freq"))
      .select(col("w"), expr("1000 * deg DIV freq").as("wscore_e3"))
    phrases.groupBy("phrase").agg(count(lit(1)).as("n_occurrences"))
      .select(col("phrase"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wordStats, "w")
      .groupBy("phrase", "n_occurrences")
      .agg(sum("wscore_e3").as("score_e3"))
      .orderBy(col("score_e3").desc, col("phrase"))
      .limit(k)
  }

  val rakeKeyphrasesSql: String = {
    val stops = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, u.i - 1 AS pos, t[u.i] AS w
       |  FROM (
       |    SELECT doc_id,
       |      list_filter(regexp_split_to_array(lower(text), '[ \\t-\\r]+'),
       |        x -> x <> '') AS t
       |    FROM documents),
       |  LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) u),
       |marked AS (
       |  SELECT doc_id, pos, w, w IN ($stops) AS is_stop,
       |    sum(CASE WHEN w IN ($stops) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |  FROM toks),
       |phrases AS (
       |  SELECT array_to_string(list(w ORDER BY pos), ' ') AS phrase,
       |    CAST(count(*) AS BIGINT) AS plen
       |  FROM marked WHERE NOT is_stop
       |  GROUP BY doc_id, grp
       |  HAVING count(*) <= 4),
       |wordstats AS (
       |  SELECT w, CAST(1000 * sum(plen) // count(*) AS BIGINT)
       |      AS wscore_e3
       |  FROM (
       |    SELECT p.plen, u.w
       |    FROM phrases p,
       |      LATERAL (SELECT unnest(string_split(p.phrase, ' ')) AS w) u)
       |  GROUP BY 1),
       |dp AS (
       |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
       |  FROM phrases GROUP BY 1)
       |SELECT dp.phrase, dp.n_occurrences,
       |  CAST(sum(ws.wscore_e3) AS BIGINT) AS score_e3
       |FROM dp,
       |  LATERAL (SELECT unnest(string_split(dp.phrase, ' ')) AS w) u
       |JOIN wordstats ws ON u.w = ws.w
       |GROUP BY dp.phrase, dp.n_occurrences
       |ORDER BY score_e3 DESC, dp.phrase
       |LIMIT 30""".stripMargin
  }

  /** Language confusion matrix — declared label vs [[langId]]'s
    * prediction, with a row-normalized permille share: the panel that
    * tells a multilingual-curation pass whether the corpus's language
    * column can be trusted (and, in a real deployment with real
    * profiles, where the classifier bleeds). Composes the langId
    * kernel (map-only) into one answer-sized (≤|langs|²) aggregate;
    * the permille rides a window over those few rows, never over docs.
    */
  def langConfusion(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langId(d).groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_total",
        sum("n_docs").over(Window.partitionBy("lang")))
      .select(col("lang"), col("pred_lang"), col("n_docs"),
        expr("1000 * n_docs DIV row_total").as("row_permille"))
  }

  val langConfusionSql: String =
    s"""WITH li AS ($langIdSql)
       |SELECT lang, pred_lang, count(*) AS n_docs,
       |  CAST(1000 * count(*) // sum(count(*)) OVER (PARTITION BY lang)
       |    AS BIGINT) AS row_permille
       |FROM li GROUP BY lang, pred_lang""".stripMargin

  /** Cohen's kappa between the heuristic language-ID labeler and the
    * gold `lang` column — chance-corrected inter-labeler AGREEMENT,
    * the label-QC number raw accuracy overstates (a labeler that
    * always answers the majority class gets high accuracy and kappa
    * EXACTLY 0; the spec pins both that and the perfect-agreement
    * kappa = 1000 as closed forms). Exact integers end to end via the
    * permille identity kappa = 1000*(N*D - S) DIV (N^2 - S) with
    * D = sum of the confusion diagonal and S = sum over labels of
    * rowTotal*colTotal; N^2 and S run in DECIMAL(38,0) (HUGEINT
    * oracle-side) — int64 wraps at N ~ 3e9 docs, the documented
    * class. Per-gold-label rows carry class recall/precision permille
    * beside the corpus-level kappa/agreement columns (the panel-stat
    * convention).
    *
    * Scale: one labels^2-sized confusion aggregation over the map-only
    * language scorer; everything after is label-count-sized; the only
    * broadcast is the 1-row kappa stats.
    */
  def labelKappa(d: DataFrame): DataFrame = {
    val conf = langId(d).groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("c"))
      .barrier() // labels^2 rows; feeds margins + diag + stats
    val gold = conf.groupBy("lang").agg(sum("c").as("n_gold"))
    val pred = conf.groupBy("pred_lang").agg(sum("c").as("n_pred"))
    val margins = gold
      .join(pred, gold("lang") === pred("pred_lang"), "full_outer")
      .select(coalesce(col("lang"), col("pred_lang")).as("label"),
        coalesce(col("n_gold"), lit(0L)).as("n_gold"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
    val diag = conf.filter(col("lang") === col("pred_lang"))
      .select(col("lang").as("label"), col("c").as("n_correct"))
    val stats = margins
      .agg(sum("n_gold").as("n"),
        expr("sum(CAST(n_gold AS DECIMAL(38,0)) * n_pred)").as("s"))
      .crossJoin(broadcast(
        diag.agg(coalesce(sum("n_correct"), lit(0L)).as("d"))))
      .select(col("n"),
        expr("1000 * d DIV n").as("agree_permille"),
        expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * n - s = 0 THEN " +
          "CAST(0 AS BIGINT) ELSE CAST((1000 * " +
          "(CAST(n AS DECIMAL(38,0)) * d - s)) DIV " +
          "(CAST(n AS DECIMAL(38,0)) * n - s) AS BIGINT) END")
          .as("kappa_permille"))
    margins.join(diag, Seq("label"), "left")
      .withColumn("n_correct", coalesce(col("n_correct"), lit(0L)))
      .crossJoin(broadcast(stats)) // 1-row panel stats — audited idiom
      .select(col("label"), col("n_gold"), col("n_pred"), col("n_correct"),
        expr("CASE WHEN n_gold = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE 1000 * n_correct DIV n_gold END").as("recall_permille"),
        expr("CASE WHEN n_pred = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE 1000 * n_correct DIV n_pred END").as("precision_permille"),
        col("agree_permille"), col("kappa_permille"))
  }

  val labelKappaSql: String =
    s"""WITH li AS ($langIdSql),
       |conf AS MATERIALIZED (
       |  SELECT lang, pred_lang, count(*) AS c FROM li GROUP BY 1, 2),
       |gold AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_gold FROM conf
       |  GROUP BY 1),
       |pred AS (SELECT pred_lang, CAST(sum(c) AS BIGINT) AS n_pred
       |  FROM conf GROUP BY 1),
       |margins AS MATERIALIZED (
       |  SELECT coalesce(g.lang, p.pred_lang) AS label,
       |    coalesce(g.n_gold, 0) AS n_gold, coalesce(p.n_pred, 0) AS n_pred
       |  FROM gold g FULL OUTER JOIN pred p ON g.lang = p.pred_lang),
       |diag AS (
       |  SELECT lang AS label, CAST(c AS BIGINT) AS n_correct FROM conf
       |  WHERE lang = pred_lang),
       |stats AS (
       |  SELECT m.n, m.s, dd.d,
       |    CAST(1000 * dd.d // m.n AS BIGINT) AS agree_permille,
       |    CASE WHEN CAST(m.n AS HUGEINT) * m.n - m.s = 0
       |      THEN CAST(0 AS BIGINT)
       |      ELSE CAST((1000 * (CAST(m.n AS HUGEINT) * dd.d - m.s))
       |        // (CAST(m.n AS HUGEINT) * m.n - m.s) AS BIGINT)
       |    END AS kappa_permille
       |  FROM (SELECT CAST(sum(n_gold) AS BIGINT) AS n,
       |          CAST(sum(CAST(n_gold AS HUGEINT) * n_pred) AS HUGEINT)
       |            AS s
       |        FROM margins) m,
       |       (SELECT CAST(coalesce(sum(n_correct), 0) AS BIGINT) AS d
       |        FROM diag) dd)
       |SELECT m.label, m.n_gold, m.n_pred,
       |  coalesce(d.n_correct, 0) AS n_correct,
       |  CASE WHEN m.n_gold = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST(1000 * coalesce(d.n_correct, 0) // m.n_gold AS BIGINT)
       |  END AS recall_permille,
       |  CASE WHEN m.n_pred = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST(1000 * coalesce(d.n_correct, 0) // m.n_pred AS BIGINT)
       |  END AS precision_permille,
       |  s.agree_permille, s.kappa_permille
       |FROM margins m
       |LEFT JOIN diag d ON d.label = m.label
       |CROSS JOIN stats s""".stripMargin

  /** Rolling polynomial hash fingerprint over the token stream
    * (order-sensitive, Rabin–Karp style):
    * h = fold(tokens, 0, (h, t) -> (h*31 + v(t)) mod 1e9+7) with
    * v(t) = len(t)*131 + ord(first char) + ord(last char).
    * Computed with the `aggregate` higher-order function — fully
    * codegen'd, no UDF.
    */
  def fingerprint(d: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val p = lit(1000000007L)
    val fp = aggregate(
      toks,
      lit(0L),
      (h, t) => (h * lit(31L) +
        (length(t).cast("long") * lit(131L) + ascii(t) +
          ascii(substring(t, -1, 1)))) % p)
    d.select(col("doc_id"), fp.as("fingerprint"),
      size(toks).cast("bigint").as("n_tokens"))
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(toks, t ->
      |        CAST(length(t) AS BIGINT) * 131 + ascii(t)
      |          + ascii(substring(t, length(t), 1)))),
      |    (h, v) -> (h * 31 + v) % 1000000007) AS fingerprint,
      |  CAST(len(toks) AS BIGINT) AS n_tokens
      |FROM (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')
      |      AS toks
      |  FROM documents)""".stripMargin

  /** Corpus-level character 3-gram profile (the feature basis of
    * real n-gram language ID): top 20 trigrams with counts,
    * deterministic tie-break.
    *
    * The CharNgrams kernel slices all n-grams in one byte scan, so the
    * Generate emits 3-byte strings; the previous
    * explode-an-index-sequence shape carried the full document text
    * into every generated row — O(len^2) bytes through the explode.
    */
  def charNgrams(d: DataFrame, n: Int = 3, topK: Int = 20): DataFrame =
    graft.core.Layout.spread(d, "doc_id")
      .select(explode(graft.functions.text.char_ngrams(col("text"), n))
        .as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(topK)

  val charNgramsSql: String =
    """SELECT ngram, count(*) AS cnt FROM (
      |  SELECT substr(text, CAST(i AS INTEGER), 3) AS ngram
      |  FROM documents,
      |    LATERAL unnest(generate_series(1, length(text) - 2)) t(i)
      |  WHERE length(text) >= 3)
      |GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin

  /** TF-IDF top terms per document: tf = in-doc count, idf scaled to an
    * exact integer (`1e6 * N DIV df` — deliberately no log/float so the
    * score is bit-stable across engines; the ranking semantics are
    * unchanged), top-3 terms per doc by (score desc, word).
    *
    * Shape: one tokenize pass, one (doc, word) count, one broadcast of
    * the df table (vocabulary-sized), one WindowGroupLimit top-k — at
    * corpus scale the df table is the only global state and it is
    * O(vocabulary).
    */
  def tfidf(d: DataFrame, k: Int = 3): DataFrame = {
    // TF is MAP-ONLY: the TokenCounts kernel counts terms per document
    // in one pass, so exploding it emits (doc, distinct-word, tf)
    // directly — the (doc, token)-granularity shuffle + groupBy the
    // explode-then-count formulation needed disappears, and DF is a
    // plain count (rows are already distinct per doc).
    val tf = graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"),
        explode(graft.functions.text.token_counts(col("text")))
          .as(Seq("word", "tf")))
    val df_ = tf.groupBy("word")
      .agg(count(lit(1)).as("df"))
    // corpus size rides the plan as a 1-row broadcast (the oracle's
    // 'n' CTE) — an eager d.count() here would fire a full corpus
    // scan at PLAN CONSTRUCTION time, before any action
    val nDf = d.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("word"))
    tf.join(broadcast(df_), "word")
      .crossJoin(broadcast(nDf))
      .select(col("doc_id"), col("word"),
        (col("tf") * expr("CAST(1000000 * n DIV df AS BIGINT)"))
          .as("score"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("doc_id", "word", "score", "rank")
  }

  val tfidfSql: String =
    """WITH tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM (
      |    SELECT doc_id,
      |      unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |        t -> t <> '')) AS word
      |    FROM documents) GROUP BY 1, 2),
      |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.word,
      |    tf.tf * CAST(1000000 * n.n // df.df AS BIGINT) AS score
      |  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n)
      |SELECT doc_id, word, score, rank FROM (
      |  SELECT doc_id, word, score,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, word) AS BIGINT) AS rank
      |  FROM scored)
      |WHERE rank <= 3""".stripMargin

  /** Array-function surface over the token arrays: size / contains /
    * position / element_at (try_ variant — ANSI mode throws on
    * out-of-bounds) / slice / reverse / distinct / min / max, each
    * mirrored by a DuckDB list function.
    */
  def arrayOps(d: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    d.select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("bigint").as("n_toks"),
        when(array_contains(col("toks"), "the"), 1L).otherwise(0L)
          .as("has_the"),
        array_position(col("toks"), "table").cast("bigint").as("pos_table"),
        try_element_at(col("toks"), lit(1)).as("first_tok"),
        try_element_at(col("toks"), lit(-1)).as("last_tok"),
        array_join(slice(col("toks"), 1, 3), "-").as("first3"),
        array_join(reverse(slice(col("toks"), 1, 3)), "-").as("first3_rev"),
        size(array_distinct(col("toks"))).cast("bigint").as("n_distinct"),
        array_min(col("toks")).as("tok_min"),
        array_max(col("toks")).as("tok_max"))
  }

  val arrayOpsSql: String =
    """SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_toks,
      |  CAST(CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
      |    AS BIGINT) AS has_the,
      |  CAST(coalesce(list_position(toks, 'table'), 0) AS BIGINT)
      |    AS pos_table,
      |  toks[1] AS first_tok,
      |  toks[-1] AS last_tok,
      |  array_to_string(toks[1:3], '-') AS first3,
      |  array_to_string(list_reverse(toks[1:3]), '-') AS first3_rev,
      |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
      |  list_min(toks) AS tok_min,
      |  list_max(toks) AS tok_max
      |FROM (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')
      |      AS toks
      |  FROM documents)""".stripMargin

  /** Higher-order-function surface: transform / filter / aggregate
    * (fold) / exists over the token arrays, mirrored by DuckDB's
    * list_transform / list_filter / list_reduce. HOF lambdas are
    * interpreted (not codegen'd) — fine for this per-doc arity; the
    * hot-path kernels in graft.functions exist precisely for the cases
    * where that interpretation cost compounds (per-token hashing).
    */
  def hofOps(d: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    d.select(
      col("doc_id"),
      size(filter(toks, t => length(t) > 4)).cast("bigint")
        .as("n_long_tokens"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .as("sum_tok_chars"),
      array_join(transform(slice(toks, 1, 5), t => upper(t)), ",")
        .as("first5_upper"),
      when(exists(toks, t => t === "the"), 1L).otherwise(0L).as("has_the"))
  }

  val hofOpsSql: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT)
      |    AS n_long_tokens,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(toks, t -> CAST(length(t) AS BIGINT))),
      |    (a, b) -> a + b) AS sum_tok_chars,
      |  array_to_string(list_transform(toks[1:5], t -> upper(t)), ',')
      |    AS first5_upper,
      |  CAST(CASE WHEN len(list_filter(toks, t -> t = 'the')) > 0
      |    THEN 1 ELSE 0 END AS BIGINT) AS has_the
      |FROM (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')
      |      AS toks
      |  FROM documents)""".stripMargin

  /** Map-function surface over the per-document term-frequency map
    * (the TokenCounts kernel): size / element_at (try_ variant — ANSI
    * throws on missing keys) / map_values + array_max / fold /
    * map_filter. The DuckDB oracle recomputes every scalar from first
    * principles over the token list (DuckDB's map type has no stable
    * cross-engine literal form).
    */
  def mapOps(d: DataFrame): DataFrame =
    graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"),
        graft.functions.text.token_counts(col("text")).as("m"))
      .select(
        col("doc_id"),
        size(col("m")).cast("bigint").as("n_distinct_words"),
        coalesce(try_element_at(col("m"), lit("the")), lit(0L)).as("cnt_the"),
        coalesce(array_max(map_values(col("m"))), lit(0L)).as("top_cnt"),
        aggregate(map_values(col("m")), lit(0L), (a, v) => a + v)
          .as("n_letter_tokens"),
        size(map_filter(col("m"), (_, v) => v >= 3)).cast("bigint")
          .as("n_frequent"))

  val mapOpsSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '')) AS w
      |  FROM documents),
      |cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
      |agg AS (SELECT doc_id,
      |    count(*) AS n_distinct_words,
      |    CAST(sum(CASE WHEN w = 'the' THEN c ELSE 0 END) AS BIGINT)
      |      AS cnt_the,
      |    CAST(max(c) AS BIGINT) AS top_cnt,
      |    CAST(sum(c) AS BIGINT) AS n_letter_tokens,
      |    CAST(sum(CASE WHEN c >= 3 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_frequent
      |  FROM cnt GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(a.n_distinct_words, 0) AS BIGINT) AS n_distinct_words,
      |  coalesce(a.cnt_the, 0) AS cnt_the,
      |  coalesce(a.top_cnt, 0) AS top_cnt,
      |  coalesce(a.n_letter_tokens, 0) AS n_letter_tokens,
      |  coalesce(a.n_frequent, 0) AS n_frequent
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin

  /** Hashing-trick LINEAR quality classifier (the fastText shape —
    * Joulin et al. 2016, arXiv:1607.01759 — with a fixed weight
    * vector): every token hashes into one of 64 buckets, each bucket
    * carries a deterministic weight in [-500, 500], and a document's
    * score is the mean bucket weight of its tokens; positive mean =>
    * 'keep'. The weights here are a Knuth-multiplicative mix of the
    * bucket id — a stand-in for trained coefficients that keeps the
    * whole operator integer-exact and therefore bit-identical across
    * engines (a real deployment swaps in a learned `Map[Int, Int]`;
    * the plan shape is unchanged).
    *
    * Scale: the model application is a pure HOF over the token array —
    * transform + integer fold inside the scan stage, ZERO exchanges
    * (the same map-only class as q_embed_project). No explode, no
    * per-token rows, no shuffle: this is the plan a classifier sweep
    * over 100 TB wants — embarrassingly parallel, bounded memory.
    */
  def classifierScore(d: DataFrame): DataFrame = {
    val toks = letterTokens(lower(col("text")))
    def weight(t: Column): Column = {
      val h = md5(t.cast("binary"))
      val b = pmod(
        ascii(substring(h, 1, 1)) * 131 + ascii(substring(h, 2, 1)),
        lit(64)).cast("bigint")
      pmod(b * 2654435761L, lit(1001L)) - 500L
    }
    val raw = aggregate(transform(toks, weight _), lit(0L), (a, x) => a + x)
    d.select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      raw.as("raw"))
      .select(
        col("doc_id"), col("n_tokens"), col("raw"),
        // UNROUNDED quotient on purpose: both engines compute the same
        // IEEE division of the same integers, so the doubles are
        // bit-identical — a round(, 4) here hit a .xxxx5 boundary at
        // sf0.1 (5690/40000) where Spark and DuckDB round opposite
        // ways. No rounding = nothing to disagree about.
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("raw").cast("double") / (col("n_tokens") * 500))
          .as("score"),
        when(col("raw") > 0, "keep").otherwise("drop").as("label"))
  }

  val classifierScoreSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, len(toks) AS n_tokens,
      |    coalesce(list_sum(list_transform(toks, t ->
      |      ((ascii(substr(md5(t), 1, 1)) * 131 +
      |        ascii(substr(md5(t), 2, 1))) % 64 * 2654435761) % 1001
      |        - 500)), 0) AS raw
      |  FROM base)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(raw AS BIGINT) AS raw,
      |  CASE WHEN n_tokens = 0 THEN 0
      |    ELSE raw::DOUBLE / (n_tokens * 500) END AS score,
      |  CASE WHEN raw > 0 THEN 'keep' ELSE 'drop' END AS label
      |FROM scored""".stripMargin

  /** Per-document CHARACTER entropy — the Shannon entropy of the char
    * distribution, the classic gibberish/binary-junk signal (natural
    * text sits in a narrow band; base64 blobs and keyboard mash fall
    * outside it). Computed with the algebraic identity
    * H = ln n - (sum c*ln c)/n, so the whole operator is one two-level
    * aggregation keyed (doc_id, ch) then doc_id — partial-agg
    * friendly, no window, no join other than the keep-all-docs left
    * join. The (doc, char) key space is bounded by alphabet size per
    * doc, so the first shuffle is at most |alphabet| x docs rows.
    */
  def charEntropy(d: DataFrame): DataFrame = {
    val chars = d.select(col("doc_id"),
      explode(filter(split(col("text"), ""), c => c =!= lit("")))
        .as("ch"))
    val perDoc = chars
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").cast("bigint").as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("clnc"))
    d.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_distinct_chars"), lit(0L)).as("n_distinct_chars"),
        round(
          when(coalesce(col("n_chars"), lit(0L)) === 0, lit(0.0))
            .otherwise(log(col("n_chars").cast("double")) -
              col("clnc") / col("n_chars")),
          4).as("entropy"))
  }

  val charEntropySql: String =
    """WITH chars AS (
      |  -- list_filter: DuckDB splits '' into [''] where Spark's side
      |  -- filters the empty element — an empty doc must yield 0 chars
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(text, ''),
      |      c -> c <> '')) AS ch
      |  FROM documents),
      |cnt AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
      |    count(*) AS n_distinct_chars,
      |    sum(c::DOUBLE * ln(c::DOUBLE)) AS clnc
      |  FROM cnt GROUP BY 1)
      |SELECT d.doc_id,
      |  coalesce(a.n_chars, 0) AS n_chars,
      |  CAST(coalesce(a.n_distinct_chars, 0) AS BIGINT) AS n_distinct_chars,
      |  round(CASE WHEN coalesce(a.n_chars, 0) = 0 THEN 0
      |    ELSE ln(a.n_chars::DOUBLE) - a.clnc / a.n_chars END, 4)
      |    AS entropy
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS
    * algorithm): hash every k-token gram, slide a w-window over the
    * hash sequence, keep the minimum per window — the selected set is
    * guaranteed to share members between any two docs with a common
    * run of >= w+k-1 tokens, which is what makes it the
    * PARTIAL-overlap fingerprint ([[fingerprint]]'s whole-doc rolling
    * hash only catches identical docs). Selecting the min VALUE per
    * window (not position) keeps the set deterministic under ties.
    * Emitted as per-doc set size + an md5 digest of the sorted set so
    * the result row is scalar; docs shorter than k tokens fingerprint
    * their whole text.
    *
    * Scale: one fused digest per gram (map-side), one doc_id-
    * partitioned shuffle for the window-min frame and the selected-set
    * aggregation — the same single-exchange shape as the other
    * per-doc signature ops. Pair detection composes downstream
    * exactly like the other signature families ([[winnowPairs]]).
    */
  /** The (n_grams, selected-set) columns behind [[winnow]] — exposed
    * for the guarantee spec (docs sharing a >= w+k-1 token run must
    * share a selected hash).
    *
    * Implementation note: the window mins are NOT a nested
    * `transform(..., j => array_min(slice(grams, j, w)))` over a grams
    * expression — Catalyst performs no common-subexpression hoisting
    * into lambda bodies, so that spelling re-evaluates the ENTIRE
    * per-gram md5 transform once per window element: O(n^2) hash work
    * per doc (measured 21 s for 500 docs; count() pruned the column,
    * which is why it profiled as fast). Instead grams are exploded
    * ONCE (Generate evaluates its generator a single time per row)
    * and the per-window min is a frame over pos — one doc_id shuffle,
    * linear work.
    */
  /** Column-expression spelling of [[winnowSets]]'s selected set —
    * identical output (LlmSpec asserts bit-equality), but a pure
    * per-row HOF over the gram array instead of a window + aggregate,
    * so it costs NO shuffle and can ride a multi-detector shared scan
    * ([[graft.llm.Dedup.detectorVenn]]) alongside the token and
    * shingle kernels. O(w·n_grams) per doc vs the window's O(n_grams);
    * at w = 5 the arithmetic is noise next to the md5 kernel.
    */
  private[graft] def winnowSelected(
      text: Column, k: Int = 4, w: Int = 5): Column = {
    val grams = graft.functions.text.winnow_grams_md5(text, k)
    val n = size(grams)
    sort_array(array_distinct(filter(
      transform(sequence(lit(0), n - 1),
        p => when(p <= n - w || p === 0,
          array_min(slice(grams, p + 1, lit(w))))),
      x => x.isNotNull)))
  }

  private[graft] def winnowSets(d: DataFrame, k: Int, w: Int): DataFrame = {
    // one digest per gram, no gram strings/hex (winnow_grams_md5 —
    // bit-equal to the composed md5/conv spelling, FunctionsSpec)
    val grams = graft.functions.text.winnow_grams_md5(col("text"), k)
    val g = d.select(col("doc_id"), posexplode(grams).as(Seq("pos", "h")))
    val byDoc = Window.partitionBy("doc_id")
    // min over the w-gram frame starting here; a frame reaching past
    // the array end is only VALID at pos 0 (the whole-array window of
    // a doc shorter than w grams)
    val wmin = min(col("h")).over(
      byDoc.orderBy("pos").rowsBetween(Window.currentRow, w - 1))
    g.withColumn("n_grams", count(lit(1)).over(byDoc))
      .withColumn("wmin", wmin)
      .withColumn("valid",
        col("pos") <= col("n_grams") - w || col("pos") === 0)
      .groupBy("doc_id")
      .agg(max("n_grams").cast("bigint").as("n_grams"),
        sort_array(collect_set(when(col("valid"), col("wmin"))))
          .as("selected"))
  }

  def winnow(d: DataFrame, k: Int = 4, w: Int = 5): DataFrame =
    winnowSets(d, k, w).select(col("doc_id"), col("n_grams"),
      size(col("selected")).cast("bigint").as("n_selected"),
      md5(array_join(transform(col("selected"), _.cast("string")), ",")
        .cast("binary")).as("fp_digest"))

  val winnowSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), x -> x <> '')
      |      AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 4 THEN
      |      list_transform(generate_series(1, len(toks) - 3), i ->
      |        list_reduce(list_transform(range(15), j ->
      |          CAST(strpos('0123456789abcdef',
      |            substr(md5(array_to_string(toks[i:i + 3], ' ')), j + 1, 1))
      |            - 1 AS BIGINT)), (a, b) -> a * 16 + b))
      |    ELSE [list_reduce(list_transform(range(15), j ->
      |      CAST(strpos('0123456789abcdef',
      |        substr(md5(coalesce(array_to_string(toks, ' '), '')),
      |          j + 1, 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b)]
      |    END AS grams
      |  FROM t),
      |wnd AS (
      |  SELECT doc_id, grams,
      |    CASE WHEN len(grams) >= 5 THEN
      |      list_transform(generate_series(1, len(grams) - 4), j ->
      |        list_min(grams[j:j + 4]))
      |    ELSE [list_min(grams)] END AS wins
      |  FROM g)
      |SELECT doc_id,
      |  CAST(len(grams) AS BIGINT) AS n_grams,
      |  CAST(len(list_distinct(wins)) AS BIGINT) AS n_selected,
      |  md5(array_to_string(list_sort(list_distinct(wins)), ',')) AS fp_digest
      |FROM wnd""".stripMargin

  /** Winnow-overlap pairs (the MOSS detector): corpus-wide doc pairs
    * whose SELECTED fingerprint sets overlap — catches partial overlap
    * (a copied section inside otherwise-different docs) that token-set
    * Jaccard dilutes away and exact-substring needs long runs for.
    * Same join discipline as the jaccard family: explode the selected
    * sets, join per shared hash, emit each pair ONCE at its smallest
    * common hash (the `sorted_first_common` kernel — selected sets are
    * sorted arrays, exactly its input shape), score with
    * `sorted_jaccard` inside the join condition so the O(n+m) merge
    * runs once per pair.
    *
    * Scale: sub-quadratic via hash buckets; a hash selected by many
    * docs is genuinely-duplicated content and concentrates pairs in
    * its bucket — a genuinely-shared SECTION is exactly this
    * operator's target, so the hot-bucket case is the expected case,
    * not a corner. Adaptive hot-hash salting (the prefix-rank join's
    * discipline, `Dedup.prefixRankJoin`) is therefore WIRED, not just
    * asserted: hashes selected by more than `saltTarget` docs are
    * split deterministically — probe side by pmod(xxhash64(doc_id)),
    * build side replicated across the sub-buckets — so every pair
    * still meets exactly once while the per-task pair count drops from
    * n^2 to ~n*saltTarget. Probe (`ScaleProbe winnow`, round 11,
    * planted shared-section corpus, 1-in-50 docs share one 60-token
    * section): identical pair sets salted/unsalted at every scale;
    * the shared section's ~15 selected hashes give the unsalted join
    * ~15-way natural parallelism, so the hot task only dominates two
    * octaves up — 16x (480k docs, 9600 sharing): unsalted 30.6 s wall
    * with a 25.0 s peak task (the peak IS the job) vs salt1024
    * 12.6 s / 7.1 s peak. At 4x salting already halves the peak at
    * flat wall. Cold hashes pay nothing (nsalt = 1); `saltTarget < 0`
    * disables.
    * Selected sets are ~|doc|/w hashes, so the exploded side is a
    * fraction of the token table.
    */
  def winnowPairs(
      d: DataFrame, threshold: Double = 0.2, k: Int = 4,
      w: Int = 5, saltTarget: Int = 1024): DataFrame =
    // winnowSets ends in an aggregation, so the selected arrays reach
    // the join MATERIALIZED (never inlined into the join condition);
    // the checkpoint just keeps the two join sides from re-running the
    // fingerprint aggregation twice. Answer-sized: one row of ~|doc|/w
    // longs per doc.
    winnowPairsFromSets(
      winnowSets(d, k, w).select(col("doc_id"), col("selected"))
        .barrier(),
      threshold, saltTarget)

  /** The join half of [[winnowPairs]] over PRECOMPUTED (doc_id,
    * selected) fingerprint sets — the entry point for callers that
    * already materialized the sets (the venn shared scan computes them
    * alongside the token/shingle kernels in one corpus pass). `sets`
    * must be materialized (checkpoint or aggregation output); selected
    * must be sorted distinct arrays — [[winnowSets]]'s /
    * [[winnowSelected]]'s shape.
    */
  private[graft] def winnowPairsFromSets(
      sets: DataFrame, threshold: Double = 0.2,
      saltTarget: Int = 1024): DataFrame = {
    require(saltTarget != 0, s"saltTarget must be nonzero (negative disables)")
    import graft.functions.vector.{sorted_first_common, sorted_jaccard}
    val ex = sets.select(col("doc_id"), col("selected"),
      explode(col("selected")).as("h"))
    val (probeSide, buildSide) =
      if (saltTarget < 0) {
        val p = ex.withColumn("salt", lit(0))
        (p, p)
      } else {
        // the hot set is a reduction (hashes above threshold) —
        // broadcast-safe by construction; cap as in prefixRankJoin
        val hot = ex.groupBy("h")
          .agg(count(lit(1)).as("hn"))
          .filter(col("hn") > saltTarget)
          .select(col("h"),
            least(ceil(col("hn").cast("double") / saltTarget), lit(65536))
              .cast("int").as("nsalt"))
        val salted = ex.join(broadcast(hot), Seq("h"), "left")
          .withColumn("nsalt", coalesce(col("nsalt"), lit(1)))
        (salted.withColumn("salt",
          pmod(xxhash64(col("doc_id")), col("nsalt")).cast("int")),
          salted.withColumn("salt",
            explode(sequence(lit(0), col("nsalt") - 1))))
      }
    // hint("merge"): same rationale as the prefix-rank join — the
    // exploded inputs look broadcast-small while the true cost is the
    // key-equal multiset; pin sort-merge so hot hashes don't walk
    // broadcast hash chains. Condition order as in prefixRankJoin:
    // cheap id prune, then the emit-once merge, the O(n+m) score LAST.
    probeSide.as("a").join(buildSide.as("b").hint("merge"),
        col("a.h") === col("b.h") &&
          col("a.salt") === col("b.salt") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.h") === sorted_first_common(
            col("a.selected"), col("b.selected")) &&
          sorted_jaccard(col("a.selected"), col("b.selected")) >=
            lit(threshold))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(sorted_jaccard(col("a.selected"), col("b.selected")), 6)
          .as("w_jaccard"))
  }

  val winnowPairsSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), x -> x <> '')
      |      AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 4 THEN
      |      list_transform(generate_series(1, len(toks) - 3), i ->
      |        list_reduce(list_transform(range(15), j ->
      |          CAST(strpos('0123456789abcdef',
      |            substr(md5(array_to_string(toks[i:i + 3], ' ')), j + 1, 1))
      |            - 1 AS BIGINT)), (a, b) -> a * 16 + b))
      |    ELSE [list_reduce(list_transform(range(15), j ->
      |      CAST(strpos('0123456789abcdef',
      |        substr(md5(coalesce(array_to_string(toks, ' '), '')),
      |          j + 1, 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b)]
      |    END AS grams
      |  FROM t),
      |sel AS (
      |  SELECT doc_id,
      |    list_sort(list_distinct(
      |      CASE WHEN len(grams) >= 5 THEN
      |        list_transform(generate_series(1, len(grams) - 4), j ->
      |          list_min(grams[j:j + 4]))
      |      ELSE [list_min(grams)] END)) AS sel
      |  FROM g)
      |SELECT doc_a, doc_b, round(raw, 6) AS w_jaccard FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(len(list_intersect(a.sel, b.sel)) AS DOUBLE) /
      |      (len(a.sel) + len(b.sel) - len(list_intersect(a.sel, b.sel)))
      |      AS raw
      |  FROM sel a JOIN sel b
      |    ON a.doc_id < b.doc_id
      |    AND len(list_intersect(a.sel, b.sel)) > 0)
      |WHERE raw >= 0.2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_winnow" -> ((s, d) => winnowPairs(docs(s, d))),
    "q_text_winnow" -> ((s, d) => winnow(docs(s, d))),
    "q_text_entropy" -> ((s, d) => charEntropy(docs(s, d))),
    "q_text_classifier" -> ((s, d) => classifierScore(docs(s, d))),
    "q_scalar_map" -> ((s, d) => mapOps(docs(s, d))),
    "q_scalar_hof" -> ((s, d) => hofOps(docs(s, d))),
    "q_scalar_array" -> ((s, d) => arrayOps(docs(s, d))),
    "q_text_ngrams" -> ((s, d) => charNgrams(docs(s, d))),
    "q_text_tfidf" -> ((s, d) => tfidf(docs(s, d))),
    "q_text_wordcount" -> ((s, d) => wordCount(docs(s, d))),
    "q_text_inverted_index" -> ((s, d) => invertedIndex(docs(s, d))),
    "q_text_sorted_join" -> ((s, d) => sortedJoin(docs(s, d))),
    "q_text_quality" -> ((s, d) => quality(docs(s, d))),
    "q_text_token_count" -> ((s, d) => tokenCount(docs(s, d))),
    "q_text_lang_id" -> ((s, d) => langId(docs(s, d))),
    "q_text_lang_confusion" -> ((s, d) => langConfusion(docs(s, d))),
    "q_label_kappa" -> ((s, d) => labelKappa(docs(s, d))),
    "q_text_rake" -> ((s, d) => rakeKeyphrases(docs(s, d))),
    "q_text_phrase_search" -> ((s, d) => phraseSearch(docs(s, d))),
    "q_text_fingerprint" -> ((s, d) => fingerprint(docs(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_dedup_winnow" -> winnowPairsSql,
    "q_text_winnow" -> winnowSql,
    "q_text_entropy" -> charEntropySql,
    "q_text_classifier" -> classifierScoreSql,
    "q_scalar_map" -> mapOpsSql,
    "q_scalar_hof" -> hofOpsSql,
    "q_scalar_array" -> arrayOpsSql,
    "q_text_ngrams" -> charNgramsSql,
    "q_text_tfidf" -> tfidfSql,
    "q_text_wordcount" -> wordCountSql,
    "q_text_inverted_index" -> invertedIndexSql,
    "q_text_sorted_join" -> sortedJoinSql,
    "q_text_quality" -> qualitySql,
    "q_text_token_count" -> tokenCountSql,
    "q_text_lang_id" -> langIdSql,
    "q_text_lang_confusion" -> langConfusionSql,
    "q_label_kappa" -> labelKappaSql,
    "q_text_rake" -> rakeKeyphrasesSql,
    "q_text_phrase_search" -> phraseSearchSql,
    "q_text_fingerprint" -> fingerprintSql)
}
