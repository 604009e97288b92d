package graft.llm

import graft.core.Barrier.BarrierOps
import graft.core.{Layout, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of training-data curation operators: context-window
  * chunking, sequence packing, PII redaction, URL-canonicalization
  * dedup, and repetition/boilerplate detection.
  *
  * All five are pure DataFrame plans with exact DuckDB oracles
  * (integer-scaled ratios, no float aggregation). The synthetic corpus
  * carries no real URLs/PII, so the PII and URL operators derive a
  * deterministic column from (doc_id, source, lang) first — the
  * operator contract (regex extraction, canonicalization, dedup
  * grouping) is what is exercised, exactly as TextOps.langId does for
  * language markers.
  *
  * Scale notes:
  *   - chunking/packing/PII/repetition are map-only or one-shuffle
  *     shapes: per-doc work + (for packing) a per-lang window and (for
  *     repetition) a (doc, token) partial-agg shuffle;
  *   - URL dedup is the exact-dedup shape on the canonical key: one
  *     hash-partitioned groupBy, O(1) state per group;
  *   - sequence packing uses a cumulative-sum window per language —
  *     at 100 TB the partition key would be (lang, shard) to bound
  *     window state; the contiguous-fill discipline is unchanged.
  */
/** Greedy left-to-right rewrite of every (l, r) adjacency into the
  * merged symbol — THE single definition of the BPE merge semantics,
  * shared by training ([[Curation.bpeTrain]]) and encoding
  * ([[Curation.bpeEncode]]): encode correctness depends on reproducing
  * exactly the rewrite the trainer applied, so two copies could
  * silently diverge. Lives OUTSIDE the Curation object so executor
  * closures reach it as a static module call instead of capturing
  * Curation (whose SessionCache is deliberately not serializable).
  */
private[llm] object BpeMerge {
  /** Seed symbols = Unicode CODE POINTS as strings, not UTF-16 code
    * units: `w.map(_.toString)` would split a non-BMP letter (Gothic,
    * CJK extensions — many pass \p{L}) into two unpaired-surrogate
    * "symbols", putting invalid strings in the learned merge table.
    * Train and encode both seed through here so the convention cannot
    * fork.
    */
  def seedSymbols(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  def applyMerge(
      syms: IndexedSeq[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }
}

object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val ChunkSize = 50
  private val ChunkStride = 40

  /** Chunk each document into fixed token windows (size 50, stride 40,
    * so 10 tokens of overlap between consecutive chunks) — the standard
    * pre-tokenization step for bounded-context training examples.
    * Empty documents yield one empty chunk (stable row count).
    */
  def chunk(d: DataFrame): DataFrame = {
    val toks = TextOps.wsTokens(col("text"))
    Layout.spread(d, "doc_id")
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), greatest(size(col("toks")), lit(1)),
          lit(ChunkStride))).as("start"))
      .select(
        col("doc_id"),
        (((col("start") - 1) / ChunkStride)).cast("bigint").as("chunk_id"),
        array_join(slice(col("toks"), col("start"), lit(ChunkSize)), " ")
          .as("chunk_text"),
        least(size(col("toks")) - col("start") + 1, lit(ChunkSize))
          .cast("bigint").as("n_chunk_tokens"))
  }

  val chunkSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'), x -> x <> '')
       |      AS toks
       |  FROM documents)
       |SELECT doc_id,
       |  CAST((start - 1) // $ChunkStride AS BIGINT) AS chunk_id,
       |  array_to_string(toks[start:start + ${ChunkSize - 1}], ' ')
       |    AS chunk_text,
       |  CAST(least(len(toks) - start + 1, $ChunkSize) AS BIGINT)
       |    AS n_chunk_tokens
       |FROM t, LATERAL unnest(
       |  generate_series(1, greatest(len(toks), 1), $ChunkStride)) s(start)""".stripMargin

  private val PackBudget = 256L

  /** Sequence packing: assign documents (in doc_id order, per language)
    * to contiguous token-budget bins — the deterministic contiguous-fill
    * packing used to batch variable-length documents into fixed-size
    * training sequences. A doc's bin is its starting cumulative token
    * offset DIV budget.
    */
  def packSequences(d: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.select(col("doc_id"), col("lang"),
      size(TextOps.wsTokens(col("text"))).cast("bigint").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"CAST(cum_before DIV $PackBudget AS BIGINT)").as("bin"))
  }

  val packSequencesSql: String =
    s"""SELECT doc_id, lang, n_tokens,
       |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    // $PackBudget AS BIGINT) AS bin
       |FROM (
       |  SELECT doc_id, lang,
       |    CAST(len(list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'),
       |      x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents)""".stripMargin

  private val EmailRe = "[a-z0-9]+@[a-z0-9.]+\\.com"
  private val PhoneRe = "555-[0-9]{4}"

  /** PII detection + redaction: count and mask email/phone matches.
    * Contact strings are derived deterministically (only some docs get
    * each kind), so counts vary and the redacted output is
    * hash-checkable.
    */
  def piiRedact(d: DataFrame): DataFrame = {
    val contact = concat(
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" reach user"), col("doc_id"), lit("@"),
          col("source"), lit(".com"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit(" tel 555-"),
          lpad(pmod(col("doc_id") * 7919, lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")))
    Layout.spread(d, "doc_id")
      .select(col("doc_id"), concat(col("text"), contact).as("full"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("full"), lit(EmailRe), lit(0)))
          .cast("bigint").as("n_emails"),
        size(regexp_extract_all(col("full"), lit(PhoneRe), lit(0)))
          .cast("bigint").as("n_phones"),
        md5(regexp_replace(
          regexp_replace(col("full"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").cast("binary")).as("redacted_md5"))
  }

  val piiRedactSql: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    text ||
       |    CASE WHEN doc_id % 3 = 0
       |      THEN ' reach user' || doc_id || '@' || source || '.com'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 2 = 0
       |      THEN ' tel 555-' || lpad(CAST(doc_id * 7919 % 10000 AS VARCHAR),
       |        4, '0')
       |      ELSE '' END AS fullt
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(fullt, '$EmailRe')) AS BIGINT)
       |    AS n_emails,
       |  CAST(len(regexp_extract_all(fullt, '$PhoneRe')) AS BIGINT)
       |    AS n_phones,
       |  md5(regexp_replace(regexp_replace(fullt, '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
       |FROM f""".stripMargin

  /** URL-canonicalization dedup: normalize scheme/host case, strip
    * `www.`, query string, fragment, and trailing slash; group by the
    * canonical URL (the exact-dedup shape — one hash-partitioned
    * groupBy). URLs are derived deterministically from
    * (source, lang, doc_id % 50), so many docs collapse per page.
    */
  def urlDedup(d: DataFrame): DataFrame = {
    val url = concat(
      lit("HTTPS://WWW."), upper(col("source")), lit(".Example.COM/"),
      col("lang"), lit("/page"), pmod(col("doc_id"), lit(50)).cast("string"),
      lit("/?utm_source=feed&id="), col("doc_id"), lit("#frag"))
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)), "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/$", "")
    d.select(col("doc_id"),
      concat(scheme, lit("://"), host, path).as("canon_url"))
      .groupBy("canon_url")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dupes"))
  }

  val urlDedupSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    'HTTPS://WWW.' || upper(source) || '.Example.COM/' || lang ||
      |    '/page' || CAST(doc_id % 50 AS VARCHAR) ||
      |    '/?utm_source=feed&id=' || doc_id || '#frag' AS url
      |  FROM documents)
      |SELECT
      |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' ||
      |  regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
      |    '^www\.', '') ||
      |  regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
      |    '/$', '') AS canon_url,
      |  min(doc_id) AS keep_id, count(*) AS n_dupes
      |FROM u GROUP BY 1""".stripMargin

  /** The Gopher document-quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A) as an integer-exact
    * per-document panel: word count in [50, 100k], mean word length in
    * [3, 10] chars, symbol-to-word ratio (# and ...) < 0.1, >= 80% of
    * words containing a letter, and >= 2 distinct hits on the 8-word
    * Gopher stop list — plus the per-rule pass flags and the composite
    * keep decision. Ratios are scaled-integer DIVs (x100 / x10000), so
    * both engines compare exact longs; an empty document yields NULL
    * ratios and keep_doc = 0, the same empty-text contract as
    * [[TextOps.quality]]. The published line-level rules (bullet
    * starts, ellipsis ends) are omitted: the corpus has no newlines,
    * so they would be constant columns with no oracle discrimination.
    *
    * Scale: map-only — one projection per document, no explode, no
    * shuffle; whole-stage codegen spans the panel.
    */
  /** Flesch reading-ease / Flesch-Kincaid grade panel, integer-scaled
    * (×1000) with the standard vowel-group syllable proxy (maximal
    * `[aeiouy]+` runs per lowercased word, min 1) and `[.!?]+` runs as
    * sentence breaks (min 1) — the classic readability pair a curation
    * pipeline buckets training text by (too-hard and too-trivial tails
    * both hurt):
    *   flesch_e3 = 206835 − 1015·wps_e3 DIV 1000 − 84600·spw_e3 DIV 1000,
    *   fk_grade_e3 = 390·wps_e3 DIV 1000 + 11800·spw_e3 DIV 1000 − 15590,
    * with wps_e3 / spw_e3 the permille words-per-sentence and
    * syllables-per-word. Empty docs surface NULL scores (nullif
    * guards), identically in both engines.
    *
    * Scale: map-only — one regex pass for sentences, one HOF pass over
    * the token array for syllables; no shuffle at any corpus size.
    */
  def readabilityPanel(d: DataFrame): DataFrame = {
    val toks = TextOps.wsTokens(col("text"))
    d.select(col("doc_id"),
      greatest(lit(1L),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
          .cast("bigint")).as("n_sentences"),
      size(toks).cast("bigint").as("n_words"),
      aggregate(
        transform(toks, t => greatest(lit(1L),
          size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
            .cast("bigint"))),
        lit(0L), (a, x) => a + x).as("n_syllables"))
      .select(col("doc_id"), col("n_sentences"), col("n_words"),
        col("n_syllables"),
        expr("1000 * n_words DIV n_sentences").as("wps_e3"),
        expr("1000 * n_syllables DIV nullif(n_words, 0)").as("spw_e3"))
      .select(col("doc_id"), col("n_sentences"), col("n_words"),
        col("n_syllables"), col("wps_e3"), col("spw_e3"),
        expr("206835 - 1015 * wps_e3 DIV 1000 - 84600 * spw_e3 DIV 1000")
          .as("flesch_e3"),
        expr("390 * wps_e3 DIV 1000 + 11800 * spw_e3 DIV 1000 - 15590")
          .as("fk_grade_e3"))
  }

  val readabilityPanelSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))
      |      AS n_sentences,
      |    len(list_filter(regexp_split_to_array(text, '\s+'),
      |      t -> t <> '')) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(
      |      list_filter(regexp_split_to_array(text, '\s+'), t -> t <> ''),
      |      t -> greatest(1, len(regexp_extract_all(lower(t),
      |        '[aeiouy]+'))))), 0) AS BIGINT) AS n_syllables
      |  FROM documents),
      |scaled AS (
      |  SELECT doc_id, n_sentences, n_words, n_syllables,
      |    1000 * n_words // n_sentences AS wps_e3,
      |    1000 * n_syllables // nullif(n_words, 0) AS spw_e3
      |  FROM base)
      |SELECT doc_id,
      |  CAST(n_sentences AS BIGINT) AS n_sentences,
      |  CAST(n_words AS BIGINT) AS n_words,
      |  n_syllables,
      |  CAST(wps_e3 AS BIGINT) AS wps_e3,
      |  CAST(spw_e3 AS BIGINT) AS spw_e3,
      |  CAST(206835 - 1015 * wps_e3 // 1000 - 84600 * spw_e3 // 1000
      |    AS BIGINT) AS flesch_e3,
      |  CAST(390 * wps_e3 // 1000 + 11800 * spw_e3 // 1000 - 15590
      |    AS BIGINT) AS fk_grade_e3
      |FROM scaled""".stripMargin

  def gopherRules(d: DataFrame): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = TextOps.wsTokens(col("text"))
    val base = d.select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_words"),
      aggregate(transform(toks, t => length(t).cast("bigint")),
        lit(0L), (acc, x) => acc + x).as("word_chars"),
      size(regexp_extract_all(col("text"), lit("#|\\.\\.\\."), lit(0)))
        .cast("bigint").as("n_symbols"),
      size(filter(toks, t => t.rlike("\\p{L}"))).cast("bigint")
        .as("alpha_words"),
      size(filter(
        lit(stops.toArray),
        s => array_contains(transform(toks, lower _), s)))
        .cast("bigint").as("stop_hits"))
    base.select(
      col("doc_id"), col("n_words"),
      expr("word_chars * 100 DIV nullif(n_words, 0)").as("mwl_x100"),
      expr("n_symbols * 10000 DIV nullif(n_words, 0)").as("symbol_x10000"),
      expr("alpha_words * 10000 DIV nullif(n_words, 0)").as("alpha_x10000"),
      col("stop_hits"),
      expr("CAST(n_words BETWEEN 50 AND 100000 AS BIGINT)").as("f_words"),
      expr("CAST(coalesce(word_chars * 100 DIV nullif(n_words, 0)" +
        " BETWEEN 300 AND 1000, false) AS BIGINT)").as("f_mwl"),
      expr("CAST(coalesce(n_symbols * 10000 DIV nullif(n_words, 0)" +
        " < 1000, false) AS BIGINT)").as("f_symbol"),
      expr("CAST(coalesce(alpha_words * 10000 DIV nullif(n_words, 0)" +
        " >= 8000, false) AS BIGINT)").as("f_alpha"),
      expr("CAST(stop_hits >= 2 AS BIGINT)").as("f_stop"))
      .withColumn("keep_doc",
        expr("f_words * f_mwl * f_symbol * f_alpha * f_stop"))
  }

  val gopherRulesSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
      |      AS BIGINT) AS word_chars,
      |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)
      |      AS n_symbols,
      |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[\p{L}]')))
      |      AS BIGINT) AS alpha_words,
      |    CAST(len(list_filter(
      |      ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'],
      |      s -> list_contains(list_transform(toks, t -> lower(t)), s)))
      |      AS BIGINT) AS stop_hits
      |  FROM (SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')
      |      AS toks
      |  FROM documents))
      |SELECT doc_id, n_words,
      |  word_chars * 100 // nullif(n_words, 0) AS mwl_x100,
      |  n_symbols * 10000 // nullif(n_words, 0) AS symbol_x10000,
      |  alpha_words * 10000 // nullif(n_words, 0) AS alpha_x10000,
      |  stop_hits,
      |  CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS f_words,
      |  CAST(coalesce(word_chars * 100 // nullif(n_words, 0)
      |    BETWEEN 300 AND 1000, false) AS BIGINT) AS f_mwl,
      |  CAST(coalesce(n_symbols * 10000 // nullif(n_words, 0)
      |    < 1000, false) AS BIGINT) AS f_symbol,
      |  CAST(coalesce(alpha_words * 10000 // nullif(n_words, 0)
      |    >= 8000, false) AS BIGINT) AS f_alpha,
      |  CAST(stop_hits >= 2 AS BIGINT) AS f_stop,
      |  CAST(n_words BETWEEN 50 AND 100000 AS BIGINT)
      |    * CAST(coalesce(word_chars * 100 // nullif(n_words, 0)
      |        BETWEEN 300 AND 1000, false) AS BIGINT)
      |    * CAST(coalesce(n_symbols * 10000 // nullif(n_words, 0)
      |        < 1000, false) AS BIGINT)
      |    * CAST(coalesce(alpha_words * 10000 // nullif(n_words, 0)
      |        >= 8000, false) AS BIGINT)
      |    * CAST(stop_hits >= 2 AS BIGINT) AS keep_doc
      |FROM base""".stripMargin

  /** Repetition / boilerplate detection: per-document distinct-token
    * ratio and top-token share (integer basis points — exact). High
    * top-share or low distinct-ratio marks degenerate/templated text.
    */
  def repetition(d: DataFrame): DataFrame =
    Layout.spread(d, "doc_id")
      .select(col("doc_id"), explode(TextOps.wsTokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("cnt").as("top_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        expr("CAST(n_distinct * 10000 DIV n_tokens AS BIGINT)")
          .as("distinct_x10000"),
        expr("CAST(top_cnt * 10000 DIV n_tokens AS BIGINT)")
          .as("top_share_x10000"))

  val repetitionSql: String =
    """SELECT doc_id, n_tokens, n_distinct,
      |  CAST(n_distinct * 10000 // n_tokens AS BIGINT) AS distinct_x10000,
      |  CAST(top_cnt * 10000 // n_tokens AS BIGINT) AS top_share_x10000
      |FROM (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
      |    max(cnt) AS top_cnt
      |  FROM (
      |    SELECT doc_id, tok, count(*) AS cnt FROM (
      |      SELECT doc_id,
      |        unnest(list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |          x -> x <> '')) AS tok
      |      FROM documents) GROUP BY doc_id, tok)
      |  GROUP BY doc_id)""".stripMargin

  /** Distributed BPE merge training (Sennrich et al. 2016,
    * arXiv:1508.07909): learn the first `nMerges` byte-pair merges of
    * the corpus — repeatedly count adjacent symbol pairs weighted by
    * word frequency, adopt the most frequent pair (ties broken
    * lexicographically, so the result is deterministic), and rewrite
    * the symbol sequences. Returns the learned merge table
    * (rank, left, right, pair_count) — the artifact a tokenizer ships.
    *
    * Scale — this is how production tokenizers train on web-scale
    * corpora: the corpus is scanned ONCE to build the word-frequency
    * table (vocabulary-sized, kept DISTRIBUTED — never collected);
    * each round then touches only that table: an algebraic pair-count
    * (map-side combined, shuffle = distinct pairs x partitions), a
    * 1-ROW argmax collect (the merge decision — legitimately
    * driver-sized), and a map-only symbol rewrite. Lineage across
    * rounds is bounded by localCheckpoint, the same discipline as
    * [[Dedup.dupClusters]]' label iteration.
    *
    * Oracle: the iteration is fixed-depth (nMerges = 10 as registered)
    * so [[bpeTrainSql]] unrolls each round as plain CTEs — the
    * PageRank trick — over a string encoding of the symbol sequence
    * that makes the greedy rewrite a single replace() (see the oracle
    * section below). A hand-computed Sennrich fixture in CurationSpec
    * guards the semantics independently of the oracle.
    */
  def bpeTrain(d: DataFrame, nMerges: Int = 10): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    var words = d
      .select(explode(TextOps.letterTokens(lower(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .map { case (w, f) => (BpeMerge.seedSymbols(w): Seq[String], f) }
      .barrier()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val top = words
        .flatMap { case (syms, f) =>
          syms.iterator.sliding(2).withPartial(false)
            .map(p => (p.head, p(1), f))
        }
        .toDF("l", "r", "f")
        .groupBy("l", "r").agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r + 1L, l, rt, cnt))
        val prev = words
        words = words
          .map { case (syms, f) =>
            (BpeMerge.applyMerge(syms.toIndexedSeq, l, rt): Seq[String], f)
          }
          .barrier() // eager: materialized before prev drops
        graft.core.Barrier.free(prev) // free takes the typed Dataset: plain
        // unpersist is a no-op on barriers, and a .toDF() wrapper here
        // measurably doubled the loop (re-analysis per round)
        r += 1
      }
    }
    // drop the final checkpoint too: only the driver-side merge table
    // escapes this method, and superseded vocabulary copies would
    // otherwise pin executor storage for the session's lifetime
    graft.core.Barrier.free(words)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** BPE ENCODE: tokenize every document with a learned merge table —
    * the real token-counting path of a training pipeline (whitespace
    * counts approximate; budget enforcement happens in BPE tokens).
    * Each word starts as characters and repeatedly applies the
    * LOWEST-RANK applicable merge (the standard encode loop, greedy
    * left-to-right within a rank). Reports per doc: word count, char
    * count (Unicode CODE POINTS, the same unit the seed symbols use —
    * NOT UTF-16 units, which would double-count the non-BMP letters
    * seedSymbols is careful about), BPE token count, and the
    * chars-per-token compression as an integer permyriad
    * (`compression_e4` = chars*10000 DIV tokens — integer-exact across
    * engines, the repo's no-float-ratio convention).
    *
    * Scale: the merge table is rank-bounded (nMerges rows — a real
    * tokenizer ships ~50k) and BROADCAST; encoding is then map-only
    * over docs, embarrassingly parallel, no shuffle at all. The
    * mapPartitions-style per-word loop is the documented imperative
    * exception (a per-symbol scan per merge rank — bounded by word
    * length x nMerges).
    */
  def bpeEncode(d: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    // ONE broadcast carries both lookup directions; the encode lambda
    // must touch only bc.value — referencing the driver-side `merges`
    // inside it would capture the whole table in every task closure,
    // defeating the broadcast for the ~50k-merge tables a real
    // tokenizer ships
    val bc = spark.sparkContext.broadcast(
      (merges.toArray, merges.zipWithIndex.toMap))
    def encodeLen(word: String): Int = {
      val (pairs, rankOf) = bc.value
      var syms: Vector[String] = BpeMerge.seedSymbols(word)
      var done = false
      while (!done && syms.length > 1) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rankOf.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (l, rr) = pairs(best)
          syms = BpeMerge.applyMerge(syms, l, rr)
        }
      }
      syms.length
    }
    d.select(col("doc_id"),
      TextOps.letterTokens(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        val chars = toks.iterator.map(w => w.codePointCount(0, w.length).toLong).sum
        val bpe = toks.iterator.map(encodeLen(_).toLong).sum
        (id, toks.size.toLong, chars, bpe)
      }
      .toDF("doc_id", "n_words", "n_chars", "n_bpe_tokens")
      .withColumn("compression_e4",
        when(col("n_bpe_tokens") === 0, lit(0L))
          .otherwise(expr("n_chars * 10000 div n_bpe_tokens")))
  }

  // The learned merge table is a deterministic trained artifact of the
  // corpus — memoized per (session, dir) exactly like the IVF codebook;
  // spark.graft.memoize=false (Bench) bypasses so timed runs re-pay
  // training.
  private val mergeCache =
    new graft.core.SessionCache[String, Seq[(String, String)]]

  /** Public face of [[trainedMerges]] for composing tools (the data
    * card's fertility panel).
    */
  def trainedMergesFor(
      s: SparkSession, dir: String): Seq[(String, String)] =
    trainedMerges(s, dir)

  private def trainedMerges(s: SparkSession, dir: String): Seq[(String, String)] = {
    def train(): Seq[(String, String)] = bpeTrain(docs(s, dir)).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    if (!s.conf.get("spark.graft.memoize", "true").toBoolean) train()
    else mergeCache.getOrElseUpdate(s, dir)(train())
  }

  /** Number of merges the registered q_text_bpe trains (bpeTrain's
    * default) — the unrolled oracles below must agree with it.
    */
  private val BpeMerges = 10

  // ----- DuckDB oracles for the BPE pair ---------------------------
  //
  // The PageRank trick (GraphOps.pageRankSql): fix the merge count and
  // unroll each training round as plain CTEs. The move that makes the
  // iterative rewrite ANSI-expressible is the SYMBOL-SEQUENCE STRING
  // ENCODING: a word's symbol list is carried as
  //   '<' sym1 '>' '<' sym2 '>' ...
  // ('<'/'>' can never occur inside a symbol — symbols are \p{L} runs).
  // Merging the pair (l, r) is then EXACTLY
  //   replace(enc, '<l><r>', '<lr>')
  // because SQL replace scans left to right, never overlaps matches,
  // and never rescans replacement text — the same non-overlapping
  // greedy pass as BpeMerge.applyMerge ([a,a,a,a] + (a,a) -> [aa,aa],
  // [a,a,a] -> [aa,a]) — and the '<'/'>' anchors force WHOLE-symbol
  // equality (a match needs '<l>' exactly, so a symbol merely ending
  // in l cannot fire; the naive single-separator encoding fails both
  // properties). Pair counting recovers the symbol list with
  // regexp_extract_all(enc, '<([^>]*)>', 1).

  /** Exploded (doc_id, word) occurrences — the shared tokenization of
    * both oracles, the established DuckDB mirror of
    * `letterTokens(lower(text))`. Non-interpolated so the regex
    * backslashes read literally.
    */
  private val bpeDocWordsFrom: String =
    """(SELECT doc_id, unnest(list_filter(
      |      regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> '')) AS w
      |    FROM documents)""".stripMargin

  /** Seed a word into the '<c1><c2>...' encoding; '.' matches one code
    * point in RE2, the same seeding unit as [[BpeMerge.seedSymbols]].
    */
  private val bpeSeedExpr: String =
    """regexp_replace(w, '(.)', '<\1>', 'g')"""

  /** One unrolled training round: pair counts from the previous
    * vocabulary, the deterministic argmax (count desc, then (l, r)
    * lexicographic — binary collation equals Spark's ordering on this
    * ASCII corpus), and the greedy rewrite.
    */
  private def bpeRoundCtes(k: Int): String = {
    val prev = s"w${k - 1}"
    s""",
       |p$k AS (
       |  SELECT syms[i] AS l, syms[i + 1] AS r, sum(f) AS cnt
       |  FROM (SELECT regexp_extract_all(enc, '<([^>]*)>', 1) AS syms, f
       |        FROM $prev),
       |    LATERAL unnest(generate_series(1, len(syms) - 1)) t(i)
       |  GROUP BY 1, 2),
       |m$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
       |w$k AS (
       |  SELECT replace(enc, '<' || l || '><' || r || '>',
       |                 '<' || l || r || '>') AS enc, f
       |  FROM $prev, m$k)""".stripMargin
  }

  private def bpeTrainingCtes: String = {
    val w0 =
      s"""w0 AS (
         |  SELECT $bpeSeedExpr AS enc, count(*) AS f
         |  FROM $bpeDocWordsFrom
         |  GROUP BY 1)""".stripMargin
    w0 + (1 to BpeMerges).map(bpeRoundCtes).mkString
  }

  /** Full-oracle mirror of [[bpeTrain]] at the registered nMerges: the
    * merge table row per round, types pinned BIGINT (DuckDB sum() is
    * HUGEINT). If the corpus exhausts before round k, m_k is empty, the
    * cross join empties w_k, and every later round contributes no row —
    * the same early stop as the Spark loop.
    */
  val bpeTrainSql: String = {
    val sel = (1 to BpeMerges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank, l AS "left", r AS "right",
         |  CAST(cnt AS BIGINT) AS pair_count FROM m$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $bpeTrainingCtes\n$sel"
  }

  /** Full-oracle mirror of [[bpeEncode]] over [[trainedMerges]]: the
    * training unroll feeds a (rank, pattern, replacement) merge table,
    * and a recursive CTE replays the encode loop per DISTINCT word —
    * each step applies the lowest-rank merge whose pattern occurs in
    * the current encoding (the same argmin the Scala loop takes; a
    * rank can fire again after later merges recreate its pair, which
    * is why this is a recursion and not a second unroll). A word's
    * final state is the row where no pattern applies; its token count
    * is its '<' count. Per-doc totals then ride the (doc, word)
    * occurrence table, and empty docs survive via the left join.
    */
  val bpeEncodeSql: String = {
    val mergesSel = (1 to BpeMerges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank, '<' || l || '><' || r || '>' AS pat,
         |  '<' || l || r || '>' AS rep FROM m$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE $bpeTrainingCtes,
       |merges AS (
       |$mergesSel),
       |docw AS (
       |  SELECT doc_id, w, count(*) AS occ
       |  FROM $bpeDocWordsFrom
       |  GROUP BY 1, 2),
       |words AS (SELECT DISTINCT w FROM docw),
       |walk AS (
       |  SELECT w, $bpeSeedExpr AS enc FROM words
       |  UNION ALL
       |  SELECT w, replace(enc, b['pat'], b['rep']) AS enc FROM (
       |    SELECT w, enc, (
       |      SELECT {'pat': pat, 'rep': rep} FROM merges
       |      WHERE contains(enc, pat) ORDER BY rank LIMIT 1) AS b
       |    FROM walk) s
       |  WHERE b IS NOT NULL),
       |encw AS (
       |  SELECT w, len(enc) - len(replace(enc, '<', '')) AS n_toks
       |  FROM walk
       |  WHERE NOT EXISTS (SELECT 1 FROM merges WHERE contains(enc, pat))),
       |agg AS (
       |  SELECT d.doc_id,
       |    sum(d.occ) AS n_words,
       |    sum(d.occ * len(d.w)) AS n_chars,
       |    sum(d.occ * e.n_toks) AS n_bpe_tokens
       |  FROM docw d JOIN encw e USING (w)
       |  GROUP BY 1)
       |SELECT doc_id,
       |  CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(n_chars, 0) AS BIGINT) AS n_chars,
       |  CAST(coalesce(n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
       |  CAST(CASE WHEN coalesce(n_bpe_tokens, 0) = 0 THEN 0
       |       ELSE (n_chars * 10000) // n_bpe_tokens END AS BIGINT)
       |    AS compression_e4
       |FROM (SELECT doc_id FROM documents) LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** Deterministic MLM-style token masking — the denoising-objective
    * data prep step (mask a fixed fraction of tokens, emit the
    * corrupted text plus label positions). The mask decision is a pure
    * function of (doc_id, position), so the corruption is reproducible
    * across runs and engines without seed bookkeeping — the same
    * no-rand() discipline as [[Sampling]]. Output: token counts, mask
    * count, the masked text's md5 (content identity), and the label
    * positions' sum (an order-sensitive checksum of WHICH tokens were
    * masked, cheap to mirror exactly).
    *
    * Scale: pure HOF transform over the token array — zero exchanges,
    * the classifier's map-only class.
    */
  def mlmMask(d: DataFrame, everyNth: Int = 7): DataFrame = {
    val toks = TextOps.wsTokens(col("text"))
    d.select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        transform(col("toks"), (t, i) =>
          when(pmod(i + col("doc_id"), lit(everyNth)) === 0, lit("<mask>"))
            .otherwise(t)).as("masked"),
        filter(transform(col("toks"), (_, i) => i),
          i => pmod(i + col("doc_id"), lit(everyNth)) === 0).as("positions"))
      .select(
        col("doc_id"), col("n_tokens"),
        size(col("positions")).cast("bigint").as("n_masked"),
        md5(concat_ws(" ", col("masked")).cast("binary")).as("masked_md5"),
        aggregate(col("positions"), lit(0L), (a, p) => a + p)
          .as("pos_checksum"))
  }

  /** T5-style span corruption (Raffel et al. 2020) — the seq2seq
    * denoising objective next to [[mlmMask]]'s BERT-style one: fixed
    * 2-token spans (start where pos % 10 == 3, deterministic — the
    * no-rand() discipline) are cut from the input and replaced by
    * numbered sentinels `<Xk>`; the TARGET sequence is each sentinel
    * followed by the tokens it swallowed. Emits counts plus md5
    * content identities of both sequences (the [[mlmMask]] compare
    * convention: full strings are heavy to sort-compare; digests pin
    * every byte).
    *
    * Scale: two HOF transforms over the token array — map-only, zero
    * exchanges.
    */
  def spanCorrupt(d: DataFrame): DataFrame = {
    val toks = TextOps.wsTokens(col("text"))
    def sid(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(i.cast("double") / 10.0).cast("long").cast("string")
    d.select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        filter(transform(col("toks"), (_, i) => i),
          i => pmod(i, lit(10)) === 3).as("starts"),
        filter(transform(col("toks"), (t, i) =>
          when(pmod(i, lit(10)) === 3,
            concat(lit("<X"), sid(i), lit(">")))
            .when(pmod(i, lit(10)) === 4, lit(null))
            .otherwise(t)), x => x.isNotNull).as("inp"),
        filter(transform(col("toks"), (t, i) =>
          when(pmod(i, lit(10)) === 3,
            concat(lit("<X"), sid(i), lit("> "), t))
            .when(pmod(i, lit(10)) === 4, t)
            .otherwise(lit(null))), x => x.isNotNull).as("tgt"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("starts")).cast("bigint").as("n_spans"),
        md5(concat_ws(" ", col("inp")).cast("binary")).as("input_md5"),
        md5(concat_ws(" ", col("tgt")).cast("binary")).as("target_md5"))
  }

  val spanCorruptSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')
      |      AS toks
      |  FROM documents)
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len([i FOR i IN range(1, len(toks) + 1)
      |    IF (i - 1) % 10 = 3]) AS BIGINT) AS n_spans,
      |  md5(array_to_string(
      |    [CASE WHEN (i - 1) % 10 = 3
      |       THEN '<X' || CAST((i - 1) // 10 AS VARCHAR) || '>'
      |       ELSE toks[i] END
      |     FOR i IN range(1, len(toks) + 1) IF (i - 1) % 10 <> 4],
      |    ' ')) AS input_md5,
      |  md5(array_to_string(
      |    [CASE WHEN (i - 1) % 10 = 3
      |       THEN '<X' || CAST((i - 1) // 10 AS VARCHAR) || '> ' || toks[i]
      |       ELSE toks[i] END
      |     FOR i IN range(1, len(toks) + 1) IF (i - 1) % 10 IN (3, 4)],
      |    ' ')) AS target_md5
      |FROM base""".stripMargin

  val mlmMaskSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')
      |      AS toks
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, len(toks) AS n_tokens,
      |    -- DuckDB lambda index i is 1-based; Spark's is 0-based.
      |    -- Double-% mirrors Spark's pmod: DuckDB % keeps the
      |    -- dividend's sign, so a negative doc_id would otherwise
      |    -- silently desync the engines
      |    list_transform(toks, (t, i) ->
      |      CASE WHEN ((i - 1 + doc_id) % 7 + 7) % 7 = 0
      |           THEN '<mask>' ELSE t END) AS masked,
      |    [i - 1 FOR i IN range(1, len(toks) + 1)
      |     IF ((i - 1 + doc_id) % 7 + 7) % 7 = 0] AS positions
      |  FROM base)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(len(positions) AS BIGINT) AS n_masked,
      |  md5(coalesce(array_to_string(masked, ' '), '')) AS masked_md5,
      |  CAST(coalesce(list_sum(positions), 0) AS BIGINT) AS pos_checksum
      |FROM m""".stripMargin

  /** Tokenizer fertility panel: BPE tokens per word, by language —
    * THE fairness metric of a tokenizer across languages (a language
    * whose fertility runs 2x pays 2x the context window and 2x the
    * inference cost for the same text; cf. the SentencePiece /
    * multilingual-tokenizer literature). Composes the trained encoder:
    * per-doc counts from [[bpeEncode]], rolled up per language in
    * scaled-integer DIVs. On the shared-vocabulary synthetic corpus
    * the languages score close together — the contract (trained-table
    * encode + exact per-lang rollup) is what is exercised, as with
    * [[TextOps.langId]].
    */
  def bpeFertility(
      d: DataFrame, merges: Seq[(String, String)]): DataFrame =
    bpeEncode(d, merges)
      .join(d.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(sum("n_bpe_tokens").as("bpe_tokens"), sum("n_words").as("words"))
      .select(col("lang"), col("bpe_tokens"), col("words"),
        expr("bpe_tokens * 10000 DIV nullif(words, 0)")
          .as("fertility_x10000"))

  val bpeFertilitySql: String =
    s"""SELECT d.lang,
       |  CAST(sum(e.n_bpe_tokens) AS BIGINT) AS bpe_tokens,
       |  CAST(sum(e.n_words) AS BIGINT) AS words,
       |  CAST(sum(e.n_bpe_tokens) * 10000 // nullif(sum(e.n_words), 0)
       |    AS BIGINT) AS fertility_x10000
       |FROM ($bpeEncodeSql) e
       |JOIN documents d USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** k-anonymity panel over release quasi-identifiers: treat
    * (lang, source, log2 length bucket) as the attribute combination an
    * attacker could join against an external dataset, and report — per
    * (lang, source) stratum — how many equivalence classes fall below
    * k=5 members and how many documents sit in them. A document alone
    * in its class is re-identifiable from the metadata alone; the
    * panel is the pre-release governance check next to [[piiRedact]]'s
    * content-level scrub (Sweeney 2002's k-anonymity, applied as a
    * diagnostic rather than a suppression pass).
    *
    * The length bucket uses the highest-set-bit device
    * (length(bin(n)), as in the HLL rho and the length histogram) so
    * the class boundaries are integer-exact in both engines.
    *
    * Scale: one map-side pass to class keys, one answer-sized
    * aggregate (classes <= |langs| x |sources| x ~40 buckets), then a
    * stratum rollup of that answer. Nothing corpus-sized shuffles.
    */
  def kAnonymity(d: DataFrame, k: Int = 5): DataFrame = {
    val bucket = when(col("n_chars") === 0, lit(0L))
      .otherwise(length(bin(col("n_chars"))).cast("bigint"))
    val classes = d
      .groupBy(col("lang"), col("source"), bucket.as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
    classes.groupBy("lang", "source").agg(
      count(lit(1)).as("n_classes"),
      sum(when(col("n_docs") < k, 1L).otherwise(0L)).as("n_small_classes"),
      sum("n_docs").as("total_docs"),
      sum(when(col("n_docs") < k, col("n_docs")).otherwise(0L))
        .as("n_docs_at_risk"),
      min("n_docs").as("min_class_size"))
  }

  val kAnonymitySql: String =
    """WITH classes AS (
      |  SELECT lang, source,
      |    CAST(CASE WHEN n_chars = 0 THEN 0
      |         ELSE length(bin(n_chars)) END AS BIGINT) AS len_bucket,
      |    count(*) AS n_docs
      |  FROM documents GROUP BY 1, 2, 3)
      |SELECT lang, source,
      |  count(*) AS n_classes,
      |  CAST(sum(CASE WHEN n_docs < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_small_classes,
      |  CAST(sum(n_docs) AS BIGINT) AS total_docs,
      |  CAST(sum(CASE WHEN n_docs < 5 THEN n_docs ELSE 0 END) AS BIGINT)
      |    AS n_docs_at_risk,
      |  min(n_docs) AS min_class_size
      |FROM classes GROUP BY 1, 2""".stripMargin

  /** l-diversity audit, the companion to [[kAnonymity]]: within each
    * quasi-identifier class (source, length bucket), how many DISTINCT
    * sensitive values (lang) appear — a class can be k-anonymous yet
    * still leak the sensitive attribute if every member shares it.
    * Per source: classes below l=3, docs at risk, minimum diversity.
    * Same two-level-aggregate shape as k-anon: one (source, bucket)
    * shuffle with a distinct-count, then a source-sized rollup.
    */
  def lDiversity(d: DataFrame, l: Int = 3): DataFrame = {
    val bucket = when(col("n_chars") === 0, lit(0L))
      .otherwise(length(bin(col("n_chars"))).cast("bigint"))
    val classes = d
      .groupBy(col("source"), bucket.as("len_bucket"))
      .agg(countDistinct("lang").as("n_langs"), count(lit(1)).as("n_docs"))
    classes.groupBy("source").agg(
      count(lit(1)).as("n_classes"),
      sum(when(col("n_langs") < l, 1L).otherwise(0L))
        .as("n_low_div_classes"),
      sum(when(col("n_langs") < l, col("n_docs")).otherwise(0L))
        .as("n_docs_at_risk"),
      min("n_langs").as("min_diversity"),
      sum("n_docs").as("total_docs"))
  }

  val lDiversitySql: String =
    """WITH classes AS (
      |  SELECT source,
      |    CAST(CASE WHEN n_chars = 0 THEN 0
      |         ELSE length(bin(n_chars)) END AS BIGINT) AS len_bucket,
      |    count(DISTINCT lang) AS n_langs,
      |    count(*) AS n_docs
      |  FROM documents GROUP BY 1, 2)
      |SELECT source,
      |  count(*) AS n_classes,
      |  CAST(sum(CASE WHEN n_langs < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_low_div_classes,
      |  CAST(sum(CASE WHEN n_langs < 3 THEN n_docs ELSE 0 END) AS BIGINT)
      |    AS n_docs_at_risk,
      |  min(n_langs) AS min_diversity,
      |  CAST(sum(n_docs) AS BIGINT) AS total_docs
      |FROM classes GROUP BY 1""".stripMargin

  /** t-closeness audit, completing the [[kAnonymity]] / [[lDiversity]]
    * trio (Li et al. 2007): a class can be k-anonymous AND l-diverse
    * yet still leak — if its sensitive-value DISTRIBUTION skews far
    * from the corpus-wide one, observing class membership updates an
    * attacker's posterior. Per quasi-identifier class (source, length
    * bucket), the VARIATIONAL distance t = ½·Σ|p_lang − q_lang|
    * between the class's lang distribution p and the global q, in
    * exact permille; per source: classes with t ≥ 0.2, docs in them,
    * and the worst class's t.
    *
    * Integer exactness without a class×lang cross join: absent langs
    * contribute q_lang each, and Σ_lang n_lang·n_cl = N·n_cl, so
    * t_num = Σ_present(|n_cl_lang·N − n_lang·n_cl| − n_lang·n_cl)
    *       + N·n_cl  and  t_permille = 1000·t_num DIV (2·n_cl·N) —
    * one aggregate over PRESENT (class, lang) rows plus class-level
    * constants. Products in DECIMAL(38,0) (HUGEINT oracle-side):
    * n_cl_lang·N caps at N², which wraps int64 past ~3e9 docs but is
    * exact to ~10¹⁹ docs in decimal.
    *
    * Scale: the (source, bucket, lang) table is answer-sized, the
    * lang marginal and N are 1-row/lang-row broadcasts, everything
    * after the first map-side-combined count is answer-sized.
    */
  def tCloseness(d: DataFrame, tPermille: Int = 200): DataFrame = {
    val bucket = when(col("n_chars") === 0, lit(0L))
      .otherwise(length(bin(col("n_chars"))).cast("bigint"))
    val base = d.select(col("source"), bucket.as("len_bucket"), col("lang"))
    val cl = base.groupBy("source", "len_bucket", "lang")
      .agg(count(lit(1)).as("n_cl_lang"))
    val glob = base.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val tot = base.agg(count(lit(1)).as("n_total"))
    val sizes = cl.groupBy("source", "len_bucket")
      .agg(sum("n_cl_lang").as("n_cl"))
    val classes = cl
      .join(broadcast(glob), "lang")
      .join(sizes, Seq("source", "len_bucket"))
      .crossJoin(broadcast(tot))
      .groupBy("source", "len_bucket")
      .agg(max("n_cl").as("n_cl"), max("n_total").as("nt"),
        sum(expr("abs(CAST(n_cl_lang AS DECIMAL(38,0)) * n_total - " +
          "CAST(n_lang AS DECIMAL(38,0)) * n_cl) - " +
          "CAST(n_lang AS DECIMAL(38,0)) * n_cl")).as("part"))
      .select(col("source"), col("n_cl"),
        expr("CAST(1000 * (part + CAST(n_cl AS DECIMAL(38,0)) * nt) DIV " +
          "(2 * CAST(n_cl AS DECIMAL(38,0)) * nt) AS BIGINT)")
          .as("t_permille"))
    classes.groupBy("source").agg(
      count(lit(1)).as("n_classes"),
      sum(when(col("t_permille") >= tPermille, 1L).otherwise(0L))
        .as("n_far_classes"),
      sum(when(col("t_permille") >= tPermille, col("n_cl")).otherwise(0L))
        .as("n_docs_at_risk"),
      max("t_permille").as("max_t_permille"),
      sum("n_cl").as("total_docs"))
  }

  val tClosenessSql: String =
    """WITH base AS (
      |  SELECT source,
      |    CAST(CASE WHEN n_chars = 0 THEN 0
      |         ELSE length(bin(n_chars)) END AS BIGINT) AS len_bucket,
      |    lang
      |  FROM documents),
      |cl AS (
      |  SELECT source, len_bucket, lang, count(*) AS n_cl_lang
      |  FROM base GROUP BY 1, 2, 3),
      |lang_marginal AS (SELECT lang, count(*) AS n_lang FROM base GROUP BY 1),
      |tot AS (SELECT count(*) AS n_total FROM base),
      |sizes AS (
      |  SELECT source, len_bucket, sum(n_cl_lang) AS n_cl
      |  FROM cl GROUP BY 1, 2),
      |classes AS (
      |  SELECT cl.source, cl.len_bucket,
      |    max(s.n_cl) AS n_cl, max(t.n_total) AS nt,
      |    sum(abs(CAST(cl.n_cl_lang AS HUGEINT) * t.n_total
      |          - CAST(g.n_lang AS HUGEINT) * s.n_cl)
      |        - CAST(g.n_lang AS HUGEINT) * s.n_cl) AS part
      |  FROM cl
      |  JOIN lang_marginal g USING (lang)
      |  JOIN sizes s ON cl.source = s.source
      |    AND cl.len_bucket = s.len_bucket
      |  CROSS JOIN tot t
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT source, n_cl,
      |    CAST(1000 * (part + CAST(n_cl AS HUGEINT) * nt)
      |      // (2 * CAST(n_cl AS HUGEINT) * nt) AS BIGINT) AS t_permille
      |  FROM classes)
      |SELECT source,
      |  count(*) AS n_classes,
      |  CAST(sum(CASE WHEN t_permille >= 200 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_far_classes,
      |  CAST(sum(CASE WHEN t_permille >= 200 THEN n_cl ELSE 0 END)
      |    AS BIGINT) AS n_docs_at_risk,
      |  max(t_permille) AS max_t_permille,
      |  CAST(sum(n_cl) AS BIGINT) AS total_docs
      |FROM scored GROUP BY 1""".stripMargin

  /** Blocklist audit: per source, documents matching any of a small
    * banned-term list, plus per-term hit counts. One pre-compiled
    * alternation regex with word boundaries evaluated in a single
    * codegen'd scan — the right shape for a small blocklist (for a
    * 10^5-term list you would broadcast an Aho-Corasick trie into a
    * native expression instead; the per-source partial-agg rollup
    * stays identical). Map-side combinable; no shuffle beyond the
    * source-sized aggregate.
    */
  /** THE blocklist — one definition shared by the batch audit and the
    * streaming feed ([[graft.streaming.DocStreams.blocklistBySource]]),
    * so the two can never silently audit different term sets.
    */
  val BlocklistTerms: Seq[String] = Seq("slow", "crash", "skew")

  def blocklistAudit(d: DataFrame): DataFrame = {
    val terms = BlocklistTerms
    val any = "\\b(" + terms.mkString("|") + ")\\b"
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      sum(when(col("text").rlike(any), 1L).otherwise(0L)).as("n_flagged")) ++
      terms.map(tm =>
        sum(when(col("text").rlike("\\b" + tm + "\\b"), 1L).otherwise(0L))
          .as(s"n_$tm"))
    d.groupBy("source").agg(aggs.head, aggs.tail: _*)
  }

  val blocklistAuditSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN regexp_matches(text, '\b(slow|crash|skew)\b')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(sum(CASE WHEN regexp_matches(text, '\bslow\b')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_slow,
      |  CAST(sum(CASE WHEN regexp_matches(text, '\bcrash\b')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_crash,
      |  CAST(sum(CASE WHEN regexp_matches(text, '\bskew\b')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_skew
      |FROM documents GROUP BY 1""".stripMargin

  /** Drop a barrier's backing blocks (see [[graft.core.Barrier.free]]
    * for why plain `unpersist` can't reach them).
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    graft.core.Barrier.free(df)

  /** Token -> one of 64 hash buckets — the exact hashing-trick feature
    * space of [[TextOps.classifierScore]] (two md5 hex chars, Knuth
    * mix), so the trained model below scores through the same plan.
    */
  private[graft] def classifierBucket(t: Column): Column = {
    val h = md5(t.cast("binary"))
    pmod(ascii(substring(h, 1, 1)) * 131 + ascii(substring(h, 2, 1)),
      lit(64)).cast("bigint")
  }

  /** Core of the distributed quality-classifier TRAINING: full-batch
    * gradient descent on a 64-bucket hashed-bag-of-words logistic
    * model. Returns (per-round eval rows, final weights, labels,
    * features) — all deterministic, all scaled-integer.
    *
    * Labels are the fixed classifier's own keep/drop rule (teacher
    * raw score > 0): the fastText/CCNet distillation shape (train a
    * cheap linear student on a heuristic teacher's labels), and the
    * only label signal in the synthetic corpus that is genuinely
    * learnable from this feature space — Gopher keep_doc is
    * constant-0 here and lang is independent of the shared
    * vocabulary. Teacher-linear labels make the data separable by
    * construction, so the loss-decreases-per-round contract is a real
    * convergence statement, not luck.
    *
    * Exactness: weights are millionths of a logit (0-initialized),
    * the logistic is the hard sigmoid in permille
    * p = clamp(500 + 250·z/S, 0, 1000) (piecewise-linear, integer),
    * z/gradient/loss sums run in DECIMAL(38,0) (HUGEINT oracle-side)
    * and cast to BIGINT before the truncating division (Spark `DIV`
    * and DuckDB `//` both truncate toward zero on BIGINT — verified
    * on negatives; DuckDB `//` on DECIMAL does NOT truncate, hence
    * the casts). lr=50 was swept to decrease loss strictly at every
    * test scale factor (sf0.001/0.01/0.1); larger steps saturate the
    * clamp and flatline the visible loss.
    *
    * Scale: features materialize once (one explode + (doc, bucket)
    * partial-agg shuffle, ≤64 rows per doc). Per round: a 64-row
    * broadcast model join + a doc-keyed partial agg (z) + a 64-key
    * partial agg (gradient — map-side combine absorbs the 64-key
    * fan-in exactly as PageRank's contribution sum absorbs hubs).
    * The only broadcasts are the 64-row model and the 1-row doc
    * count; per-round state is checkpointed and superseded snapshots
    * freed, the pageRankScaled discipline.
    */
  /** The per-doc hard-sigmoid score plan under literal weights: p =
    * clamp(500 + 250·z/S, 0, 1000), z = Σ c·w_b in DECIMAL(38,0) —
    * the exact arithmetic of the pre-r18 broadcast-join spelling,
    * with the 64-slot model injected as an ARRAY LITERAL instead of a
    * 64-row joined frame (same values, no join, no broadcast job).
    */
  private def scoredPlan(
      labels: DataFrame, feat: DataFrame, w: Array[Long],
      scale: Long): DataFrame =
    labels
      .join(
        feat.select(col("doc_id"),
          (col("c").cast("decimal(38,0)") *
            element_at(lit(w), (col("b") + 1).cast("int"))).as("cw"))
          .groupBy("doc_id").agg(sum("cw").as("zraw")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        // coalesce BEFORE the cast: only a doc with no features
        // (null zraw) is legitimately 0; a DECIMAL z past int64
        // must not silently read as 0 while the oracle raises.
        // int64 bound: |z| = |Σ c·w| ≤ maxTokPerDoc · max|w|, and
        // |w| ≤ rounds·lr·1000·avgTokPerDoc/1 ≈ 4e7 at the swept
        // settings, so |z| ≤ ~4e11 ≪ 2^63 by 7 orders.
        least(lit(1000L), greatest(lit(0L),
          lit(500L) +
            expr(s"(250 * CAST(coalesce(zraw, 0) AS BIGINT)) DIV $scale")))
          .as("p"))

  private def classifierTrainCore(
      d: DataFrame, rounds: Int, lr: Long, scale: Long)
      : (DataFrame, Array[Long], DataFrame, DataFrame) = {
    val toks = TextOps.letterTokens(lower(col("text")))
    // feat/labels are ONE-SHOT frames recomputable from the source
    // corpus: Barrier.scratch materializes them once in every mode but
    // skips the corpus-sized checkpoint-file writes in reliable mode —
    // an executor loss recomputes lost blocks from the parquet scan,
    // which is durable by definition. feat is pre-partitioned by
    // doc_id (the per-round join/aggregate key) so every round's
    // z-aggregation and gradient join find their distribution already
    // satisfied — no corpus-sized exchange per round at any scale.
    val feat = graft.core.Barrier.scratch(Layout.spread(d, "doc_id")
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"), classifierBucket(col("tok")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .repartition(Layout.shufflePartitions(d.sparkSession), col("doc_id")))
    val teacherW = pmod(col("b") * 2654435761L, lit(1001L)) - 500L
    val labels = graft.core.Barrier.scratch(d.select(col("doc_id"))
      .join(
        feat.select(col("doc_id"), (col("c") * teacherW).as("cw"))
          .groupBy("doc_id").agg(sum("cw").as("raw")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(coalesce(col("raw"), lit(0L)) > 0, 1L).otherwise(0L).as("y")))
    // MODEL STATE LIVES ON THE DRIVER (r18 optimization): the model is
    // 64 longs — driver-sized by construction, the same class as the
    // BPE merge table and the trainedWeights artifact. The pre-r18
    // spelling kept it as a 64-row DataFrame on a checkpoint-every-k
    // RoundBarrier, which cost ~14 jobs per round at bench scale
    // (broadcast of w, scratch materialization of the per-doc error
    // table, a separate loss collect, the chain checkpoint, plus AQE
    // stage jobs — JobProf measured 127 jobs / 6.1 s for 9 rounds).
    // Holding the weights in an Array[Long] and re-injecting them as a
    // literal makes each round ONE job: a 65-row aggregate that
    // computes the 64 gradient sums AND the loss row in a single pass
    // (sentinel group b = -1 carries per-doc err²/correct; feature
    // groups carry err·c). The weight chain leaves the DAG entirely,
    // so there is nothing to checkpoint and recovery depth is moot —
    // an executor loss recomputes the round's blocks from the
    // persisted feat/labels, and a driver loss restarts training, the
    // standard driver-held-model GD contract (the weights ARE the
    // model artifact; every distributed-ML driver holds them).
    // Arithmetic is bit-identical: same DECIMAL(38,0) sums, same
    // BIGINT casts, same truncating division (Spark DIV and Java /
    // both truncate toward zero — verified on negatives).
    val nDocs = labels.count()
    val w = new Array[Long](64)
    val losses = Seq.newBuilder[org.apache.spark.sql.Row]
    var r = 1
    while (r <= rounds + 1) {
      val err = scoredPlan(labels, feat, w, scale)
        .withColumn("err", col("p") - lit(1000L) * col("y"))
      // ONE aggregation for gradient + loss: feature rows keyed by
      // their bucket with c = the count; one sentinel row per doc
      // keyed b = -1 with c = the correctness flag. Group -1 then
      // yields (sq_loss, n_correct) as OBSERVED METRICS riding the
      // per-doc err frame (one CollectMetrics pass, the same device as
      // minLabelPropagation's convergence count) and groups 0..63 the
      // gradient. The former spelling unioned a per-doc sentinel
      // branch (b = -1) into the gradient aggregate: AQE stage reuse
      // dedup'd the shared z-aggregation exchange, but the
      // post-shuffle err join still replayed per branch and the
      // sentinel rows rode the gradient shuffle — the metrics are
      // global sums, exactly what CollectMetrics computes for free on
      // the rows already flowing into the feature join. Same
      // DECIMAL(38,0)->BIGINT arithmetic; an EMPTY corpus yields null
      // sums, keeping the pre-r18 null loss-row shape.
      val errObs = err.observe(s"gd_loss_$r",
        expr("CAST(sum(CAST(err AS DECIMAL(38,0)) * err) AS BIGINT)")
          .as("sq"),
        sum(expr("CAST((p > 500) = (y = 1) AS BIGINT)")).as("nc"))
      val gradDf = errObs.join(feat, "doc_id")
        .groupBy("b")
        .agg(expr("CAST(sum(CAST(err AS DECIMAL(38,0)) * c) AS BIGINT)")
          .as("g"))
      val agg = gradDf.collect()
      val byB = agg.map(row => row.getLong(0) -> row).toMap
      val lossRow = gradDf.queryExecution.observedMetrics.get(s"gd_loss_$r")
      losses += org.apache.spark.sql.Row(r.toLong,
        lossRow.flatMap(x => if (x.isNullAt(0)) None
          else Some(java.lang.Long.valueOf(x.getLong(0)))).orNull,
        lossRow.flatMap(x => if (x.isNullAt(1)) None
          else Some(java.lang.Long.valueOf(x.getLong(1)))).orNull)
      if (r <= rounds && nDocs > 0) {
        var b = 0
        while (b < 64) {
          // absent bucket (no feature rows) contributes zero gradient,
          // exactly the pre-r18 left-join coalesce(g, 0)
          val g = byB.get(b.toLong).map(_.getLong(1)).getOrElse(0L)
          w(b) = w(b) - (g * lr) / nDocs
          b += 1
        }
      }
      r += 1
    }
    val lossSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("round",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("sq_loss",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("n_correct",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val lossPanel = d.sparkSession.createDataFrame(
      java.util.Arrays.asList(losses.result(): _*), lossSchema)
    (lossPanel, w, labels, feat)
  }

  /** Training-curve panel: one row per evaluation (round r evaluates
    * the weights after r-1 updates; the last row is the post-final-
    * update model). sq_loss = Σ(p_permille - 1000·y)², n_correct =
    * docs where the sign prediction matches the teacher label. See
    * [[classifierTrainCore]] for the contract.
    */
  def classifierTrain(
      d: DataFrame, rounds: Int = 8, lr: Long = 50L,
      scale: Long = 1000000L): DataFrame = {
    val (losses, _, labels, feat) = classifierTrainCore(d, rounds, lr, scale)
    // the curve is already a driver-local relation; parents can go
    // (the weights are a driver array; feat/labels are scratch frames)
    graft.core.Barrier.freeScratch(labels)
    graft.core.Barrier.freeScratch(feat)
    losses
  }

  /** Scored panel composing the TRAINED model: every document scored
    * by the final weights of [[classifierTrain]]'s run (re-paid here —
    * the survivors/venn trio convention), with the teacher label
    * alongside so the distillation quality is a column, not a claim.
    */
  def classifierTrained(
      d: DataFrame, rounds: Int = 8, lr: Long = 50L,
      scale: Long = 1000000L): DataFrame = {
    val (_, w, labels, feat) = classifierTrainCore(d, rounds, lr, scale)
    scoredPlan(labels, feat, w, scale)
      .select(col("doc_id"), col("y"), col("p").as("p_permille"))
      .select(col("doc_id"), col("p_permille"),
        when(col("p_permille") > 500, "keep").otherwise("drop")
          .as("label_pred"),
        when(col("y") === 1, "keep").otherwise("drop").as("label_teacher"),
        expr("CAST((p_permille > 500) = (y = 1) AS BIGINT)").as("agree"))
  }

  /** Final trained weights as a 64-slot array (index = bucket): the
    * frozen model artifact a serving or monitoring path ships as a
    * literal — [[graft.streaming.DocStreams.classifierScoreFeed]]'s
    * axis, the driftFeed convention (a live scorer serves the model it
    * was given; it cannot train on data it has not seen). Driver work
    * is model-sized: the collect is exactly 64 rows; training itself
    * is re-paid, the trio convention.
    */
  def trainedWeights(d: DataFrame, rounds: Int = 8, lr: Long = 50L,
      scale: Long = 1000000L): Array[Long] = {
    val (_, w, labels, feat) = classifierTrainCore(d, rounds, lr, scale)
    graft.core.Barrier.freeScratch(labels)
    graft.core.Barrier.freeScratch(feat)
    w
  }

  /** Reliability panel for the TRAINED classifier — the calibration
    * check that closes the train -> score -> evaluate loop: scored
    * docs bucketed by predicted permille decile, each bucket carrying
    * its size, mean predicted keep probability, the teacher's
    * EMPIRICAL keep rate, and |gap| between them. A well-calibrated
    * scorer has small gaps; a confidently-wrong one shows up as a
    * high-p bucket with a low empirical rate — the number a curation
    * pipeline needs before using scores as sampling weights
    * (temperature sampling, DSIR) rather than as a hard gate.
    * Integer-exact end to end (permille sums, truncating DIV);
    * re-pays training per the trio convention. One decile-keyed
    * aggregation over the scored panel — answer-sized output.
    */
  def classifierCalibration(
      d: DataFrame, rounds: Int = 8, lr: Long = 50L,
      scale: Long = 1000000L): DataFrame =
    classifierTrained(d, rounds, lr, scale)
      .select(
        expr("least(CAST(9 AS BIGINT), p_permille DIV 100)").as("bucket"),
        col("p_permille"),
        when(col("label_teacher") === "keep", 1L).otherwise(0L).as("tk"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(p_permille) DIV count(1)").as("mean_pred_permille"),
        expr("(1000 * sum(tk)) DIV count(1)").as("teacher_keep_permille"))
      .withColumn("calib_gap",
        abs(col("mean_pred_permille") - col("teacher_keep_permille")))

  def classifierCalibrationSql(
      rounds: Int = 8, lr: Long = 50L, scale: Long = 1000000L): String =
    classifierCtes(rounds, lr, scale) +
      s"""
         |SELECT least(9, p // 100) AS bucket,
         |  count(*) AS n_docs,
         |  CAST(sum(p) // count(*) AS BIGINT) AS mean_pred_permille,
         |  CAST((1000 * sum(CASE WHEN y = 1 THEN 1 ELSE 0 END))
         |    // count(*) AS BIGINT) AS teacher_keep_permille,
         |  abs(CAST(sum(p) // count(*) AS BIGINT)
         |    - CAST((1000 * sum(CASE WHEN y = 1 THEN 1 ELSE 0 END))
         |      // count(*) AS BIGINT)) AS calib_gap
         |FROM e${rounds + 1} GROUP BY 1""".stripMargin

  /** Shared CTE chain for the training replays: features, teacher
    * labels, doc count, w0, then per round (z, err[, grad, w]) — every
    * CTE MATERIALIZED (DuckDB inlines multiply-referenced CTEs by
    * default; the w-chain references each level ~3x, which inlined is
    * exponential re-evaluation and an fd blow-up on the parquet scan).
    */
  private def classifierCtes(rounds: Int, lr: Long, scale: Long): String = {
    val head =
      s"""WITH feat AS MATERIALIZED (
         |  SELECT doc_id,
         |    (ascii(substr(md5(tok), 1, 1)) * 131 +
         |     ascii(substr(md5(tok), 2, 1))) % 64 AS b,
         |    count(*) AS c
         |  FROM (
         |    SELECT doc_id, unnest(list_filter(
         |      regexp_split_to_array(lower(text), '[^\\p{L}]+'),
         |      t -> t <> '')) AS tok
         |    FROM documents)
         |  GROUP BY 1, 2),
         |lab AS MATERIALIZED (
         |  SELECT d.doc_id,
         |    CAST(coalesce(sum(f.c * ((f.b * 2654435761) % 1001 - 500)), 0)
         |      > 0 AS BIGINT) AS y
         |  FROM documents d LEFT JOIN feat f ON d.doc_id = f.doc_id
         |  GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM documents),
         |w0 AS MATERIALIZED (
         |  SELECT CAST(range AS BIGINT) AS b, CAST(0 AS BIGINT) AS w
         |  FROM range(64))""".stripMargin
    val body = (1 to rounds + 1).map { r =>
      val zErr =
        s""",
           |z$r AS MATERIALIZED (
           |  SELECT l.doc_id, l.y,
           |    CAST(coalesce(sum(f.c * w.w), 0) AS BIGINT) AS z
           |  FROM lab l
           |  LEFT JOIN feat f ON l.doc_id = f.doc_id
           |  LEFT JOIN w${r - 1} w ON f.b = w.b
           |  GROUP BY 1, 2),
           |e$r AS MATERIALIZED (
           |  SELECT doc_id, y,
           |    least(1000, greatest(0, 500 + (250 * z) // $scale)) AS p,
           |    least(1000, greatest(0, 500 + (250 * z) // $scale))
           |      - 1000 * y AS err
           |  FROM z$r)""".stripMargin
      val gw = if (r <= rounds)
        s""",
           |g$r AS MATERIALIZED (
           |  SELECT w.b, CAST(coalesce(sum(e.err * f.c), 0) AS BIGINT) AS g
           |  FROM w${r - 1} w
           |  LEFT JOIN feat f ON f.b = w.b
           |  LEFT JOIN e$r e ON e.doc_id = f.doc_id
           |  GROUP BY 1),
           |w$r AS MATERIALIZED (
           |  SELECT w.b,
           |    CAST(w.w - (g.g * $lr) // (SELECT n FROM nn) AS BIGINT) AS w
           |  FROM w${r - 1} w JOIN g$r g ON w.b = g.b)""".stripMargin
      else ""
      zErr + gw
    }.mkString
    head + body
  }

  def classifierTrainSql(
      rounds: Int = 8, lr: Long = 50L, scale: Long = 1000000L): String = {
    val evals = (1 to rounds + 1).map { r =>
      s"""  SELECT CAST($r AS BIGINT) AS round,
         |    CAST(sum(err * err) AS BIGINT) AS sq_loss,
         |    CAST(sum(CAST((p > 500) = (y = 1) AS BIGINT)) AS BIGINT)
         |      AS n_correct
         |  FROM e$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    classifierCtes(rounds, lr, scale) + "\n" + evals
  }

  def classifierTrainedSql(
      rounds: Int = 8, lr: Long = 50L, scale: Long = 1000000L): String =
    classifierCtes(rounds, lr, scale) +
      s"""
         |SELECT doc_id, CAST(p AS BIGINT) AS p_permille,
         |  CASE WHEN p > 500 THEN 'keep' ELSE 'drop' END AS label_pred,
         |  CASE WHEN y = 1 THEN 'keep' ELSE 'drop' END AS label_teacher,
         |  CAST((p > 500) = (y = 1) AS BIGINT) AS agree
         |FROM e${rounds + 1}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_classifier_train" -> ((s, d) => classifierTrain(docs(s, d))),
    "q_text_classifier_trained" -> ((s, d) => classifierTrained(docs(s, d))),
    "q_text_classifier_calib" -> ((s, d) => classifierCalibration(docs(s, d))),
    "q_privacy_ldiv" -> ((s, d) => lDiversity(docs(s, d))),
    "q_privacy_tclose" -> ((s, d) => tCloseness(docs(s, d))),
    "q_text_blocklist" -> ((s, d) => blocklistAudit(docs(s, d))),
    "q_privacy_kanon" -> ((s, d) => kAnonymity(docs(s, d))),
    "q_text_fertility" -> ((s, d) =>
      bpeFertility(docs(s, d), trainedMerges(s, d))),
    "q_text_mlm_mask" -> ((s, d) => mlmMask(docs(s, d))),
    "q_text_span_corrupt" -> ((s, d) => spanCorrupt(docs(s, d))),
    "q_text_bpe" -> ((s, d) => bpeTrain(docs(s, d))),
    "q_text_bpe_encode" -> ((s, d) =>
      bpeEncode(docs(s, d), trainedMerges(s, d))),
    "q_text_chunk" -> ((s, d) => chunk(docs(s, d))),
    "q_pack_sequences" -> ((s, d) => packSequences(docs(s, d))),
    "q_text_pii" -> ((s, d) => piiRedact(docs(s, d))),
    "q_dedup_url" -> ((s, d) => urlDedup(docs(s, d))),
    "q_text_gopher" -> ((s, d) => gopherRules(docs(s, d))),
    "q_text_readability" -> ((s, d) => readabilityPanel(docs(s, d))),
    "q_text_repetition" -> ((s, d) => repetition(docs(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_text_classifier_train" -> classifierTrainSql(),
    "q_text_classifier_trained" -> classifierTrainedSql(),
    "q_text_classifier_calib" -> classifierCalibrationSql(),
    "q_privacy_kanon" -> kAnonymitySql,
    "q_privacy_ldiv" -> lDiversitySql,
    "q_privacy_tclose" -> tClosenessSql,
    "q_text_blocklist" -> blocklistAuditSql,
    "q_text_fertility" -> bpeFertilitySql,
    "q_text_bpe" -> bpeTrainSql,
    "q_text_bpe_encode" -> bpeEncodeSql,
    "q_text_mlm_mask" -> mlmMaskSql,
    "q_text_span_corrupt" -> spanCorruptSql,
    "q_text_chunk" -> chunkSql,
    "q_pack_sequences" -> packSequencesSql,
    "q_text_pii" -> piiRedactSql,
    "q_dedup_url" -> urlDedupSql,
    "q_text_gopher" -> gopherRulesSql,
    "q_text_readability" -> readabilityPanelSql,
    "q_text_repetition" -> repetitionSql)
}
