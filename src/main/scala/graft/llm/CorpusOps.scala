package graft.llm

import graft.core.Barrier.BarrierOps
import graft.core.{Layout, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level statistics and curation operators a training-data
  * pipeline runs before/while assembling a dataset: exact corpus-wide
  * frequent terms (heavy hitters), BM25 ranked retrieval, n-gram
  * boilerplate detection, and domain-mixing weights.
  *
  * Everything here has an exact DuckDB oracle — no seeded hashes, no
  * approximation without an exact verification pass.
  *
  * Scale notes live on each operator; the common theme is bounding
  * shuffle volume by the SIZE OF THE ANSWER (candidate terms, query
  * terms, boilerplate grams, languages) rather than the size of the
  * corpus, so every plan survives a 1000-executor / 100 TB scale-up.
  */
object CorpusOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** One Misra-Gries insert: count if tracked, claim a free slot, or
    * decrement-all (dropping zeros). Amortized O(1): every decrement
    * event is paid for by `capacity` prior inserts. Shared by the batch
    * per-partition sketch below and the streaming per-shard state in
    * [[graft.streaming.DocStreams.freqTermCandidates]].
    */
  private[graft] def mgAdd(
      acc: java.util.HashMap[String, Long], t: String, capacity: Int): Unit = {
    val cur = acc.getOrDefault(t, 0L)
    if (cur != 0L) acc.put(t, cur + 1)
    else if (acc.size < capacity) acc.put(t, 1L)
    else {
      val e = acc.entrySet().iterator()
      while (e.hasNext) {
        val en = e.next()
        if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
      }
    }
  }

  /** Merge MG sketch `b` into `a` in place (Agarwal et al.,
    * "Mergeability of Summaries"): sum counters keywise; if the union
    * exceeds `capacity` slots, subtract the (capacity+1)-th largest
    * counter value from every entry and drop the non-positive ones.
    * Undercount after merging sketches covering n1 and n2 items is
    * < (n1+n2)/(capacity+1), the same bound as one sketch over the
    * concatenation — so a tree of merges preserves [[freqTerms]]'s
    * superset guarantee while keeping every intermediate at
    * `capacity` entries.
    */
  private[graft] def mgMerge(
      a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long],
      capacity: Int): Unit = {
    val itB = b.entrySet().iterator()
    while (itB.hasNext) {
      val en = itB.next()
      a.put(en.getKey, a.getOrDefault(en.getKey, 0L) + en.getValue)
    }
    if (a.size > capacity) {
      val vals = new Array[Long](a.size)
      var i = 0
      a.values().forEach { v => vals(i) = v; i += 1 }
      java.util.Arrays.sort(vals)
      val dec = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      val itA = a.entrySet().iterator()
      while (itA.hasNext) {
        val en = itA.next()
        val nv = en.getValue - dec
        if (nv <= 0L) itA.remove() else en.setValue(nv)
      }
    }
  }

  // --------------------------------------------------------------------
  // Frequent terms: per-partition Misra-Gries sketch + exact recount.
  // --------------------------------------------------------------------

  /** Exact frequent items: every token whose corpus-wide count is at
    * least `phi * N` (N = total tokens), found WITHOUT shuffling the
    * full vocabulary.
    *
    * Pass 1 runs a Misra-Gries summary of `capacity` slots inside each
    * partition (genuine per-partition imperative state — the documented
    * `mapPartitions` exception), then TREE-MERGES the per-partition
    * sketches ([[mgMerge]]: sum counters, subtract the (capacity+1)-th
    * largest, drop non-positive — the Agarwal et al. mergeable-summary
    * rule) via `treeAggregate`, so what reaches the driver is ONE
    * `capacity`-slot sketch regardless of partition count, not
    * capacity x numPartitions candidates. Merged-MG undercount over N
    * items is < N/(capacity+1); with (capacity+1)*phi STRICTLY > 1 any
    * term with true count >= ceil(phi*N) keeps a positive residual in
    * the merged sketch, so the candidate set is a superset of the
    * answer (at exact equality a boundary term could cancel). The same
    * aggregate carries the global token count, so N needs no extra
    * scan.
    *
    * Pass 2 broadcast-semi-joins the corpus tokens against the
    * candidate set and recounts exactly — shuffle volume is
    * O(candidates x partitions), not O(vocabulary).
    *
    * At 100 TB: 2 corpus scans, both map-only until a candidate-sized
    * aggregation. A direct groupBy would shuffle every distinct token
    * (URLs, typos, hashes — easily billions of keys); this shuffles at
    * most `capacity x partitions` keys, and the sketch merge moves
    * capacity-sized maps up a 2-level tree instead of fanning them all
    * into the driver.
    */
  def freqTerms(
      d: DataFrame, phi: Double = 0.02, capacity: Int = 128): DataFrame = {
    // STRICT: at exact equality a term with count exactly ceil(phi*N)
    // can be evicted from every partition sketch (the MG bound is
    // count > n_p/(cap+1), not >=), breaking the superset guarantee
    require((capacity + 1) * phi > 1.0,
      s"capacity $capacity too small for phi=$phi: need (cap+1)*phi > 1")
    val spark = d.sparkSession
    import spark.implicits._

    // Deliberately NO Layout.spread here: both passes are map-only, so
    // an up-front repartition would shuffle the full corpus text —
    // costing as much as the vocabulary shuffle this operator exists
    // to avoid. The MG guarantee holds under ANY partitioning, and at
    // scale the parquet scan's splits provide the parallelism.
    val toks = d
      .select(explode(TextOps.letterTokens(col("text"))).as("tok"))

    // Tree-merged MG: one imperative sketch pass per partition (an
    // allocation-free loop over the hot path — a per-token fold would
    // box a tuple per element), then the (sketch, tokens-seen)
    // partials fold pairwise up a depth-2 tree, so the driver receives
    // one capacity-slot map, not one per partition.
    val partials = toks.as[String].rdd.mapPartitions { it =>
      val acc = new java.util.HashMap[String, Long](capacity * 2)
      var n = 0L
      it.foreach { t => n += 1; mgAdd(acc, t, capacity) }
      Iterator.single((acc, n))
    }
    val merge = (a: (java.util.HashMap[String, Long], Long),
        b: (java.util.HashMap[String, Long], Long)) => {
      mgMerge(a._1, b._1, capacity); (a._1, a._2 + b._2)
    }
    val (mgSketch, nTotal) = partials.treeAggregate(
      (new java.util.HashMap[String, Long](capacity * 2), 0L))(
      merge, merge, depth = 2)
    val cands = scala.collection.mutable.ArrayBuffer.empty[String]
    mgSketch.keySet().forEach(k => cands += k)
    val thresh = math.ceil(phi * nTotal).toLong
    val candDf = cands.toSeq.toDF("tok")
    toks.join(broadcast(candDf), "tok")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thresh)
      .select(
        col("tok").as("word"),
        col("cnt"),
        round(col("cnt").cast("double") / nTotal, 6).as("ratio"))
  }

  val freqTermsSql: String =
    """WITH toks AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |    t -> t <> '')) AS tok
      |  FROM documents),
      |tot AS (SELECT count(*) AS n FROM toks)
      |SELECT tok AS word, count(*) AS cnt,
      |  round(count(*)::DOUBLE / (SELECT n FROM tot), 6) AS ratio
      |FROM toks GROUP BY tok
      |HAVING count(*) >= ceil(0.02 * (SELECT n FROM tot))""".stripMargin

  // --------------------------------------------------------------------
  // BM25 ranked retrieval.
  // --------------------------------------------------------------------

  /** BM25 top-k: score every document against a fixed term set with
    * the Robertson/Sparck-Jones formulation
    * (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), k1/b saturation) and
    * return the `topK` best, ties broken by doc_id.
    *
    * Scale: tokens are FILTERED to the query terms before the first
    * shuffle, so the per-(doc, term) aggregation moves O(matching
    * postings), not O(corpus tokens). Document frequencies and the
    * global (N, avgdl) statistics are |terms|-row / 1-row broadcasts;
    * the only corpus-keyed shuffle is the doc-length join, and the
    * final top-k is a TakeOrderedAndProject (no global sort).
    */
  def bm25(
      d: DataFrame,
      terms: Seq[String] = Seq("spark", "join", "vector"),
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    val toks = Layout.spread(d, "doc_id")
      .select(col("doc_id"), explode(TextOps.letterTokens(col("text"))).as("word"))
    val dlens = d.select(
      col("doc_id"),
      size(TextOps.letterTokens(col("text"))).cast("double").as("dl"))
    val stats = d.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(TextOps.letterTokens(col("text")))).as("avgdl"))
    val tf = toks.filter(col("word").isin(terms: _*))
      .groupBy("doc_id", "word").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("word")
      .agg(count(lit(1)).cast("double").as("dfreq"))
    tf.join(broadcast(dfreq), "word")
      .join(dlens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5)))
      .withColumn("s",
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("s"), 4).as("score"),
        count(lit(1)).cast("bigint").as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** SHARED TEXT BUILDER for [[bm25]]'s SQL: the Spark-SQL facade
    * statement (q_sql_retrieval_bm25) and the DuckDB oracle are both
    * generated from this one template — constants, fold shape, and the
    * ONE float expression (identically parenthesized, rounded once at
    * the end) cannot drift between them. Dialect splits: tokenizer
    * HOF spellings and the regex literal escaping, nothing else.
    */
  def bm25SqlText(d: graft.sql.Dialect): String = {
    val tok = d.tokens("text", "[^\\p{L}]+")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    ${d.explode(tok, "word")}
       |  FROM documents),
       |dl AS (SELECT doc_id,
       |    CAST(${d.len(tok)} AS DOUBLE) AS dl
       |  FROM documents),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |    avg(${d.len(tok)}) AS avgdl
       |  FROM documents),
       |tf AS (SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf
       |  FROM toks WHERE word IN ('spark', 'join', 'vector')
       |  GROUP BY doc_id, word),
       |dfq AS (SELECT word, CAST(count(*) AS DOUBLE) AS dfreq FROM tf GROUP BY word)
       |SELECT tf.doc_id,
       |  round(sum(ln(1 + (st.n_docs - dfq.dfreq + 0.5) / (dfq.dfreq + 0.5))
       |    * tf.tf * (1.2 + 1)
       |    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 4) AS score,
       |  CAST(count(*) AS BIGINT) AS n_terms
       |FROM tf
       |JOIN dfq ON tf.word = dfq.word
       |JOIN dl ON tf.doc_id = dl.doc_id
       |CROSS JOIN st
       |GROUP BY tf.doc_id
       |ORDER BY score DESC, tf.doc_id
       |LIMIT 20""".stripMargin
  }

  val bm25Sql: String = bm25SqlText(graft.sql.Dialect.duck)

  // --------------------------------------------------------------------
  // Boilerplate detection: shared n-gram windows within a source.
  // --------------------------------------------------------------------

  /** Per-document boilerplate ratio: the fraction of a document's
    * token `n`-gram windows that appear in at least `minDocs` DISTINCT
    * documents of the SAME source — the line-frequency boilerplate
    * heuristic (headers, footers, navigation chrome) adapted to a
    * corpus without line structure.
    *
    * Scale: the gram table shuffles on (source, gram) twice — once to
    * count distinct docs per gram, once to join the verdict back — and
    * both exchanges share the same key, so the second is co-partitioned
    * with the first. The boilerplate gram set is aggregated BEFORE the
    * back-join (answer-sized, not corpus-sized); per-doc totals then
    * reduce on doc_id. No stage holds more than one document's grams in
    * memory; AQE's skew handling covers a pathologically hot gram.
    */
  def boilerplate(
      d: DataFrame, n: Int = 3, minDocs: Int = 5): DataFrame = {
    val base = Layout.spread(d, "doc_id").select(
      col("doc_id"), col("source"),
      TextOps.letterTokens(col("text")).as("toks"))
    // 1-based window starts; guard: size < n would make sequence()
    // count DOWN and fabricate windows.
    val grams = base.select(
      col("doc_id"), col("source"),
      explode(
        when(size(col("toks")) >= n,
          transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
          .otherwise(array().cast("array<string>"))).as("gram"))
    val common = grams.groupBy("source", "gram")
      .agg(countDistinct("doc_id").as("docs_with"))
      .filter(col("docs_with") >= minDocs)
    val perDoc = grams
      .join(common, Seq("source", "gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"), count(col("docs_with")).as("n_boiler"))
    d.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        round(
          when(coalesce(col("n_windows"), lit(0L)) === 0, lit(0.0))
            .otherwise(col("n_boiler").cast("double") / col("n_windows")),
          4).as("boiler_ratio"))
  }

  val boilerplateSql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source,
      |    unnest([array_to_string(toks[i:i+2], ' ')
      |            FOR i IN range(1, greatest(len(toks) - 1, 1))]) AS gram
      |  FROM base),
      |common AS (
      |  SELECT source, gram
      |  FROM (SELECT source, gram, count(DISTINCT doc_id) AS dw
      |        FROM g GROUP BY source, gram)
      |  WHERE dw >= 5),
      |agg AS (
      |  SELECT g.doc_id, count(*) AS n_windows, count(c.gram) AS n_boiler
      |  FROM g LEFT JOIN common c ON g.source = c.source AND g.gram = c.gram
      |  GROUP BY g.doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(a.n_windows, 0) AS BIGINT) AS n_windows,
      |  CAST(coalesce(a.n_boiler, 0) AS BIGINT) AS n_boiler,
      |  round(CASE WHEN coalesce(a.n_windows, 0) = 0 THEN 0
      |        ELSE a.n_boiler::DOUBLE / a.n_windows END, 4) AS boiler_ratio
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Unigram LM quality score.
  // --------------------------------------------------------------------

  /** Per-document unigram language-model score: the average negative
    * log-probability of the document's tokens under the corpus unigram
    * distribution (the CCNet-style LM quality filter with the corpus
    * itself as the model — low scores = typical text, high scores =
    * rare-token-heavy outliers).
    *
    * Scale: the unigram table is vocabulary-sized, far too large to
    * broadcast at web scale, so tokens JOIN it co-partitioned on word
    * (the count aggregation and the scoring join share the word key /
    * the same exchange); only the total-token count is a 1-row
    * broadcast. Per-doc reduction is algebraic (map-side combined). No
    * spread: every pre-shuffle stage is linear, scan splits provide
    * the parallelism.
    */
  def unigramLogProb(d: DataFrame): DataFrame = {
    val toks = d.select(
      col("doc_id"), explode(TextOps.letterTokens(col("text"))).as("word"))
    val counts = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").cast("double").as("n_total"))
    toks.join(counts, "word")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log(col("cnt") / col("n_total"))), 4).as("avg_neg_lp"))
  }

  val unigramLogProbSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '')) AS word
      |  FROM documents),
      |counts AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
      |total AS (SELECT sum(cnt)::DOUBLE AS n_total FROM counts)
      |SELECT toks.doc_id, count(*) AS n_tokens,
      |  round(avg(-ln(counts.cnt / total.n_total)), 4) AS avg_neg_lp
      |FROM toks JOIN counts ON toks.word = counts.word
      |CROSS JOIN total
      |GROUP BY toks.doc_id""".stripMargin

  /** Per-document BIGRAM language-model score: avg negative log of the
    * MLE transition probability P(w2|w1) = c(w1 w2) / c(w1 ·) over the
    * document's bigrams (denominator = occurrences of w1 as a bigram
    * START, so each row of the model is a proper distribution). The
    * conditional sibling of [[unigramLogProb]] — word-ORDER-sensitive
    * where the unigram score is bag-of-words: scrambled text scores
    * sharply worse here, which is exactly the gibberish signal a
    * curation pipeline wants. Docs with fewer than 2 tokens score 0
    * over 0 bigrams.
    *
    * Scale: the bigram model is corpus-bigram-sized — far beyond any
    * broadcast — so doc bigrams JOIN it co-partitioned on (w1, w2);
    * the count aggregation and the scoring join share that key, the
    * start-count join shares w1. Per-doc reduction is algebraic. Same
    * never-broadcast-the-model discipline as the unigram operator.
    */
  def bigramLogProb(d: DataFrame): DataFrame = {
    val base = d.select(
      col("doc_id"), TextOps.letterTokens(col("text")).as("toks"))
    val bi = base.select(
      col("doc_id"),
      explode(
        when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(
              element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val scored = bi
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("c2").cast("double") / col("c1"))), 4)
          .as("avg_neg_lp"))
    base.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_neg_lp"), lit(0.0)).as("avg_neg_lp"))
  }

  val bigramLogProbSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
      |    SELECT doc_id,
      |      unnest([{'w1': toks[i], 'w2': toks[i + 1]}
      |              FOR i IN range(1, len(toks))]) AS b
      |    FROM base)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
      |scored AS (
      |  SELECT bi.doc_id, count(*) AS n_bigrams,
      |    round(avg(-ln(c2.c2::DOUBLE / c1.c1)), 4) AS avg_neg_lp
      |  FROM bi
      |  JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
      |  JOIN c1 ON bi.w1 = c1.w1
      |  GROUP BY bi.doc_id)
      |SELECT b.doc_id,
      |  CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  coalesce(s.avg_neg_lp, 0.0) AS avg_neg_lp
      |FROM base b LEFT JOIN scored s USING (doc_id)""".stripMargin

  /** Collocation extraction: top-k adjacent bigrams by scaled-integer
    * PMI lift — `1000 · P(xy) / (P(x)·P(y))`, spelled exactly as
    * `1000·c2·N1² DIV (N2·cx·cy)` in both engines (one truncating
    * division, identical parenthesization) — with a minimum pair
    * support. The "merge these into one token / these are phrases"
    * signal a tokenizer-training or query-segmentation pass reads;
    * where [[bigramLogProb]] scores DOCS under transition
    * probabilities, this ranks the PAIRS by joint-vs-independent lift.
    *
    * Scale: pair candidates are support-filtered BEFORE the two
    * vocabulary-sized unigram joins (both co-partitioned hash joins —
    * the vocabulary is never broadcast), totals ride 1-row broadcasts,
    * and the top-k is a TakeOrdered under a total order (lift desc,
    * w1, w2) — no global sort materializes. The integer lift
    * `1000·c2·N1²` is computed in DECIMAL(38,0) (HUGEINT on the
    * oracle side), not int64 — in int64 it wraps silently past
    * N1 ≈ 3·10⁷ tokens even at c2 = 1. Decimal keeps the numerator
    * exact to N1 ≈ 10¹² tokens per corpus slice (4 + digits(c2) +
    * 2·digits(N1) ≤ 38), and past that Spark's non-ANSI decimal
    * overflow yields NULL — an explicit switch a guardrail query can
    * trip on, never a wrong number. The quotient itself is small
    * (≤ 1000·N1 / minSupport), so the final BIGINT cast is safe.
    */
  def pmiCollocations(
      d: DataFrame, minSupport: Long = 5L, k: Int = 40): DataFrame = {
    val base = d.select(TextOps.letterTokens(col("text")).as("toks"))
    val toks = base.select(explode(col("toks")).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c1"))
    val bi = base.select(
        explode(
          when(size(col("toks")) >= 2,
            transform(sequence(lit(1), size(col("toks")) - 1),
              i => struct(
                element_at(col("toks"), i).as("w1"),
                element_at(col("toks"), i + 1).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tot1 = uni.agg(sum("c1").as("n1"))
    val tot2 = bi.agg(count(lit(1)).as("n2"))
    bi.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
      .join(uni.select(col("w").as("w1"), col("c1").as("n_w1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c1").as("n_w2")), "w2")
      .crossJoin(broadcast(tot1))
      .crossJoin(broadcast(tot2))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        expr("CAST(1000 * CAST(n_pair AS DECIMAL(38,0)) * n1 * n1 DIV " +
          "(CAST(n2 AS DECIMAL(38,0)) * n_w1 * n_w2) AS BIGINT)")
          .as("lift_e3"))
      .orderBy(col("lift_e3").desc, col("w1"), col("w2"))
      .limit(k)
  }

  val pmiCollocationsSql: String =
    """WITH base AS (
      |  SELECT list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |uni AS (
      |  SELECT w, count(*) AS c1 FROM (
      |    SELECT unnest(toks) AS w FROM base) GROUP BY 1),
      |bi AS (
      |  SELECT b.w1 AS w1, b.w2 AS w2 FROM (
      |    SELECT unnest([{'w1': toks[i], 'w2': toks[i + 1]}
      |                   FOR i IN range(1, len(toks))]) AS b
      |    FROM base)),
      |tot1 AS (SELECT sum(c1) AS n1 FROM uni),
      |tot2 AS (SELECT count(*) AS n2 FROM bi),
      |pairs AS (
      |  SELECT w1, w2, count(*) AS n_pair FROM bi GROUP BY 1, 2
      |  HAVING count(*) >= 5)
      |SELECT p.w1, p.w2, CAST(p.n_pair AS BIGINT) AS n_pair,
      |  CAST(u1.c1 AS BIGINT) AS n_w1, CAST(u2.c1 AS BIGINT) AS n_w2,
      |  CAST(CAST(1000 AS HUGEINT) * p.n_pair * n1 * n1
      |       // (CAST(n2 AS HUGEINT) * u1.c1 * u2.c1) AS BIGINT)
      |    AS lift_e3
      |FROM pairs p
      |JOIN uni u1 ON p.w1 = u1.w
      |JOIN uni u2 ON p.w2 = u2.w
      |CROSS JOIN tot1 CROSS JOIN tot2
      |ORDER BY lift_e3 DESC, p.w1, p.w2
      |LIMIT 40""".stripMargin

  /** CCNet-style quality bucketing: split each language's documents
    * into head/middle/tail terciles of the unigram LM score (bucket 1 =
    * most typical text) and report per-bucket stats — the aggregate
    * form of the per-doc routing a curation pipeline does with these
    * buckets.
    *
    * The ntile window is PARTITIONED by lang (never global — the
    * single-reducer shape PlanSpec bans) and ordered by the rounded
    * score with doc_id tie-break, so bucket assignment is
    * deterministic.
    */
  def ccnetBuckets(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unigramLogProb(d)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
    val w = Window.partitionBy("lang")
      .orderBy(col("avg_neg_lp"), col("doc_id"))
    scored.withColumn("bucket", ntile(3).over(w))
      .groupBy("lang", "bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("bigint").as("n_tokens"),
        min("avg_neg_lp").as("lp_min"),
        max("avg_neg_lp").as("lp_max"))
  }

  val ccnetBucketsSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '')) AS word
      |  FROM documents),
      |counts AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
      |total AS (SELECT sum(cnt)::DOUBLE AS n_total FROM counts),
      |scored AS (
      |  SELECT toks.doc_id, count(*) AS n_tokens,
      |    round(avg(-ln(counts.cnt / total.n_total)), 4) AS avg_neg_lp
      |  FROM toks JOIN counts ON toks.word = counts.word
      |  CROSS JOIN total
      |  GROUP BY toks.doc_id),
      |bucketed AS (
      |  SELECT d.lang, s.n_tokens, s.avg_neg_lp,
      |    NTILE(3) OVER (PARTITION BY d.lang
      |                   ORDER BY s.avg_neg_lp, s.doc_id) AS bucket
      |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
      |SELECT lang, bucket, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  min(avg_neg_lp) AS lp_min, max(avg_neg_lp) AS lp_max
      |FROM bucketed GROUP BY lang, bucket""".stripMargin

  // --------------------------------------------------------------------
  // Domain mixing weights.
  // --------------------------------------------------------------------

  /** Per-language mixing weights: given target token shares, report
    * each language's actual share, the resample weight
    * (target/actual), and the token count a <=1-weight (downsample-
    * only) pass would keep. The static data-mixture step of a training
    * pipeline (cf. DoReMi-style domain reweighting, arXiv:2305.10429,
    * applied with fixed targets).
    *
    * Scale: one algebraic aggregation per language (map-side combined)
    * plus a 1-row broadcast of the total; the plan is answer-sized
    * after the first partial aggregate.
    */
  def mixDomains(d: DataFrame): DataFrame = {
    // derived from THE mix (Sampling.TargetMixPermille) — both engines
    // compute permille / 1000 in double, so deriving both sides keeps
    // them bit-identical for any permille value
    val target = Sampling.TargetMixPermille
      .map { case (l, p) => l -> p / 1000.0 }
    val tgt = typedLit(target.toMap)
    val perLang = d.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.wsTokens(col("text")))).cast("bigint").as("n_tokens"))
    val total = perLang.agg(sum("n_tokens").cast("double").as("tot_tokens"))
    val share = col("n_tokens") / col("tot_tokens")
    val weight = element_at(tgt, col("lang")) / share
    perLang.crossJoin(broadcast(total))
      // inner-join semantics vs the target map: a language without a
      // target has no defined weight — emitting it with a NULL target
      // (and, via least() skipping NULL, a full sampled_tokens) would
      // silently claim an unweighted language is fully sampled, and
      // diverge from the oracle's INNER JOIN
      .filter(element_at(tgt, col("lang")).isNotNull)
      .select(
        col("lang"), col("n_docs"), col("n_tokens"),
        round(share, 6).as("actual_share"),
        element_at(tgt, col("lang")).as("target_share"),
        round(weight, 6).as("weight"),
        round(col("n_tokens") * least(lit(1.0), weight), 0)
          .cast("bigint").as("sampled_tokens"))
  }

  val mixDomainsSql: String =
    """WITH pl AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(sum(len(list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |      t -> t <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |t AS (SELECT sum(n_tokens)::DOUBLE AS tot_tokens FROM pl),
      |tgt(lang, target_share) AS (VALUES __TGT_VALUES__)
      |SELECT pl.lang, pl.n_docs, pl.n_tokens,
      |  round(pl.n_tokens / t.tot_tokens, 6) AS actual_share,
      |  tgt.target_share,
      |  round(tgt.target_share / (pl.n_tokens / t.tot_tokens), 6) AS weight,
      |  CAST(round(pl.n_tokens * least(1.0,
      |    tgt.target_share / (pl.n_tokens / t.tot_tokens)), 0) AS BIGINT)
      |    AS sampled_tokens
      |FROM pl CROSS JOIN t JOIN tgt ON pl.lang = tgt.lang""".stripMargin
      // CAST(p AS DOUBLE)/1000 = Scala's p / 1000.0 bit-for-bit for ANY
      // permille value — the earlier f"0.$p%03d" rendering silently
      // produced 0.1000 (= 0.1) for p = 1000, desyncing the engines on
      // a single-language mix
      .replace("__TGT_VALUES__", Sampling.TargetMixPermille
        .map { case (l, p) => s"('$l', CAST($p AS DOUBLE) / 1000)" }
        .mkString(", "))

  // --------------------------------------------------------------------
  // Corpus summary (data-card panel).
  // --------------------------------------------------------------------

  /** Per-(source, lang) corpus summary — the data-card numbers a
    * curation run reports: doc/token counts, mean doc length, and the
    * exact-duplicate count within the stratum (docs beyond the first
    * of each identical text).
    *
    * Scale: one pass, two-level aggregation — level 1 keys
    * (source, lang, content-hash) so exact-dup counting rides the same
    * shuffle as the stratum rollup (both partial-agg friendly), level
    * 2 rolls up to the answer-sized (source, lang) panel. No joins,
    * no second corpus scan.
    */
  def corpusSummary(d: DataFrame): DataFrame =
    d.select(
      col("source"), col("lang"),
      md5(col("text").cast("binary")).as("h"),
      size(TextOps.wsTokens(col("text"))).cast("bigint").as("n_tok"))
      .groupBy("source", "lang", "h")
      .agg(count(lit(1)).as("n"), sum("n_tok").as("toks"))
      .groupBy("source", "lang")
      .agg(
        sum("n").cast("bigint").as("n_docs"),
        sum("toks").cast("bigint").as("n_tokens"),
        round(sum("toks").cast("double") / sum("n"), 2).as("avg_tokens"),
        sum(col("n") - 1).cast("bigint").as("dup_docs"))

  val corpusSummarySql: String =
    """WITH l1 AS (
      |  SELECT source, lang, md5(text) AS h, count(*) AS n,
      |    sum(len(list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |      t -> t <> ''))) AS toks
      |  FROM documents GROUP BY 1, 2, 3)
      |SELECT source, lang,
      |  CAST(sum(n) AS BIGINT) AS n_docs,
      |  CAST(sum(toks) AS BIGINT) AS n_tokens,
      |  round(sum(toks)::DOUBLE / sum(n), 2) AS avg_tokens,
      |  CAST(sum(n - 1) AS BIGINT) AS dup_docs
      |FROM l1 GROUP BY 1, 2""".stripMargin

  /** Tokenizer-vocabulary coverage per language: build the exact
    * corpus top-k token vocabulary (count desc, token asc — the unique
    * tiebreak keeps the k-boundary deterministic in every engine) and
    * report, per language, how many token OCCURRENCES fall outside it.
    * This is the out-of-vocabulary-rate panel a team checks before
    * committing to a tokenizer/vocab size: a language whose OOV rate
    * is high is about to be shredded into bytes by the tokenizer.
    *
    * Scale: the only corpus-sized shuffle is the map-side-combined
    * token count (inherent to an EXACT vocabulary; [[freqTerms]] is
    * the sketch path when approximate heavy hitters suffice). The
    * top-k is TakeOrdered over the vocabulary-sized count table, the
    * vocab (k rows) broadcasts to an answer-preserving left join, and
    * the final aggregate is |lang|-sized.
    */
  def vocabCoverage(d: DataFrame, k: Int = 1000): DataFrame = {
    val toks = Layout.spread(d, "doc_id").select(col("doc_id"), col("lang"),
      explode(TextOps.wsTokens(col("text"))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(k)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("lang")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  val vocabCoverageSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    unnest(list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |      t -> t <> '')) AS tok
      |  FROM documents),
      |vocab AS (
      |  SELECT tok FROM (
      |    SELECT tok, count(*) AS n FROM toks GROUP BY 1)
      |  ORDER BY n DESC, tok LIMIT 1000)
      |SELECT t.lang,
      |  CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  round(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS oov_rate
      |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
      |GROUP BY 1""".stripMargin

  /** Mergeable distinct-document sketches: one 256-register
    * deterministic HLL ([[graft.ops.Hll]]) per source over content
    * hashes, plus the MERGED all-sources sketch obtained purely by
    * per-bucket max over the per-source registers — never re-scanning
    * the corpus. That merge row IS the point: at 100 TB you build one
    * sketch per shard/day/source as data lands, and every rollup
    * (daily -> monthly, per-source -> global) is a 256-row max — the
    * property that makes HLL the distinct-count shape at scale. The
    * exact integer denominator `s` rides along as the mergeable audit
    * value.
    *
    * Scale: one corpus pass (map-side combined into <= sources x 256
    * register rows), then everything downstream is register-sized.
    */
  def hllMergeBySource(d: DataFrame): DataFrame = {
    import graft.ops.Hll
    val regs = d
      .select(col("source"), Hll.h60(col("text")).as("h"))
      .select(col("source"), Hll.bucket(col("h")).as("bucket"),
        Hll.rho(col("h")).as("rho"))
      .groupBy("source", "bucket").agg(max("rho").as("m"))
      // two consumers (per-source panel + merged rollup) over a
      // register-sized table whose PLAN is a corpus scan — materialize
      // so the corpus is read once
      .barrier()
    def summarize(
        g: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = g
      .agg(Hll.sUsed, count(lit(1)).as("n_used"))
      .withColumn("hll_docs", Hll.estimate(col("s_used"), col("n_used")))
      .withColumn("s", Hll.sTotal(col("s_used"), col("n_used")))
      .select(col("source"), col("hll_docs"), col("s"))
    val perSource = summarize(regs.groupBy("source"))
    val merged = summarize(
      regs.groupBy("bucket").agg(max("m").as("m"))
        .withColumn("source", lit("__all__"))
        .groupBy("source"))
    perSource.unionByName(merged)
  }

  val hllMergeBySourceSql: String = {
    import graft.ops.Hll
    s"""WITH h AS (
       |  SELECT source, ${Hll.h60Sql("text")} AS h60 FROM documents),
       |r AS (
       |  SELECT source, h60 % 256 AS bucket,
       |    ${Hll.rhoSql} AS rho
       |  FROM h),
       |regs AS (
       |  SELECT source, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
       |per_source AS (
       |  SELECT source,
       |    sum(1::BIGINT << (50 - m)) AS s_used, count(*) AS n_used
       |  FROM regs GROUP BY 1),
       |merged AS (
       |  SELECT '__all__' AS source,
       |    sum(1::BIGINT << (50 - m)) AS s_used, count(*) AS n_used
       |  FROM (SELECT bucket, max(m) AS m FROM regs GROUP BY 1)),
       |unioned AS (
       |  SELECT * FROM per_source UNION ALL SELECT * FROM merged)
       |SELECT source,
       |  ${Hll.estimateSql("s_used", "n_used")} AS hll_docs,
       |  ${Hll.sTotalSql("s_used", "n_used")} AS s
       |FROM unioned""".stripMargin
  }

  /** Cross-source duplication matrix: for every ordered source pair,
    * how many CANONICAL content hashes (sorted distinct token set —
    * the [[graft.llm.Dedup.canonical]] identity, which catches the
    * reorderings feeds introduce when they mirror each other) appear
    * in both — the provenance panel that shows which feeds copy
    * which (a crawl that re-ingests another feed's content inflates
    * its apparent contribution and double-counts tokens in the mix
    * plan).
    *
    * Scale: documents collapse map-side to distinct (hash, source)
    * pairs; the self-join runs per content hash, where the multiset is
    * bounded by a hash's source multiplicity (<= |sources|, tiny), and
    * the output aggregate is |sources|^2-sized.
    */
  def crossSourceOverlap(d: DataFrame): DataFrame = {
    val canon = array_join(
      sort_array(array_distinct(TextOps.wsTokens(col("text")))), " ")
    val hs = d.select(md5(canon.cast("binary")).as("h"), col("source"))
      .distinct()
    hs.as("a").join(hs.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  val crossSourceOverlapSql: String =
    """WITH hs AS (
      |  SELECT DISTINCT
      |    md5(coalesce(array_to_string(list_sort(list_distinct(
      |      list_filter(regexp_split_to_array(text, '[ \t-\r]+'),
      |        t -> t <> ''))), ' '), '')) AS h,
      |    source
      |  FROM documents)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  count(*) AS n_shared
      |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      |GROUP BY 1, 2""".stripMargin

  /** Per-language log2-bucketed document-length histogram — the
    * data-card panel that shows a corpus's length distribution shape
    * (truncation spikes, boilerplate shortness, a long tail worth
    * chunking). Bucket = position of the highest set bit of n_chars
    * (length(bin(n)) — the same integer-exact device as the HLL rho),
    * so bucket b holds lengths [2^(b-1), 2^b).
    *
    * Scale: one map-side pass + a |langs| x ~40-bucket aggregate.
    */
  def lengthHistogram(d: DataFrame): DataFrame =
    d.select(col("lang"),
        when(length(col("text")) === 0, lit(0L))
          .otherwise(length(bin(length(col("text")).cast("bigint")))
            .cast("bigint")).as("bucket"),
        length(col("text")).cast("bigint").as("n"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("n").as("min_chars"), max("n").as("max_chars"),
        sum("n").as("sum_chars"))

  val lengthHistogramSql: String =
    """SELECT lang,
      |  CAST(CASE WHEN length(text) = 0 THEN 0
      |       ELSE length(bin(CAST(length(text) AS BIGINT))) END AS BIGINT)
      |    AS bucket,
      |  count(*) AS n_docs,
      |  CAST(min(length(text)) AS BIGINT) AS min_chars,
      |  CAST(max(length(text)) AS BIGINT) AS max_chars,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY 1, 2""".stripMargin

  /** Held-out trigram perplexity with Stupid Backoff (Brants et al.
    * 2007, "Large Language Models in Machine Translation" — the
    * web-scale LM scoring recipe: no normalization, a fixed 0.4
    * back-off factor, counts all the way down). The model trains on
    * doc_id % 11 != 0 and scores the held-out % 11 == 0 slice — the
    * split is what makes back-off OBSERVABLE (scoring the training
    * corpus always finds its own trigrams; the unigram_lp/bigram_lp
    * panels are that in-corpus form). Per held-out doc:
    *   p(w3|w1 w2) = c3/c2            if the trigram was seen,
    *     else 0.4 * b2/b1             if the (w2, w3) bigram was seen,
    *     else 0.4^2 * (u1+1)/(N+V)    (add-one unigram floor, so OOV
    *                                   words score finitely)
    * emitting the back-off mix (n_tri/n_bi/n_uni — exact integers) and
    * the avg negative log score (one round(.,4) float, identically
    * parenthesized in the oracle).
    *
    * Scale: model tables are vocabulary-sized and stay DISTRIBUTED —
    * scoring joins co-partition on the n-gram keys; only the 1-row
    * (N, V) totals broadcast. Same shape as [[bigramLogProb]].
    */
  def trigramBackoff(d: DataFrame): DataFrame = {
    val base = d.select(
      col("doc_id"), TextOps.letterTokens(col("text")).as("toks"))
    def grams(src: DataFrame, n: Int): DataFrame = {
      val fields = (1 to n).map(j => s"w$j")
      src.select(
        col("doc_id"),
        explode(
          when(size(col("toks")) >= n,
            transform(sequence(lit(1), size(col("toks")) - (n - 1)),
              i => struct(fields.zipWithIndex.map { case (f, j) =>
                element_at(col("toks"), i + j).as(f)
              }: _*)))
            .otherwise(array().cast(
              s"array<struct<${fields.map(f => s"$f:string").mkString(",")}>>")))
          .as("g"))
        .select(col("doc_id") +: fields.map(f => col(s"g.$f").as(f)): _*)
    }
    val train = base.filter(col("doc_id") % 11 =!= 0)
    val held = base.filter(col("doc_id") % 11 === 0)
    val t3 = grams(train, 3).groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c3"))
    val t2 = grams(train, 3).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val b2 = grams(train, 2).groupBy("w1", "w2").agg(count(lit(1)).as("bc2"))
      .select(col("w1").as("v2"), col("w2").as("v3"), col("bc2"))
    val b1 = grams(train, 2).groupBy("w1").agg(count(lit(1)).as("bc1"))
      .select(col("w1").as("v2b"), col("bc1"))
    val uni = train.select(explode(col("toks")).as("w"))
    val u1 = uni.groupBy("w").agg(count(lit(1)).as("u1"))
      .select(col("w").as("v3u"), col("u1"))
    val totals = uni.agg(
      count(lit(1)).as("nn"), countDistinct("w").as("vv"))
    val p = col("p")
    val scored = grams(held, 3)
      .join(t3, Seq("w1", "w2", "w3"), "left")
      .join(t2, Seq("w1", "w2"), "left")
      .join(b2, col("w2") === col("v2") && col("w3") === col("v3"), "left")
      .join(b1, col("w2") === col("v2b"), "left")
      .join(u1, col("w3") === col("v3u"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("lvl",
        when(col("c3").isNotNull, lit(3))
          .when(col("bc2").isNotNull, lit(2)).otherwise(lit(1)))
      .withColumn("p",
        when(col("lvl") === 3, col("c3").cast("double") / col("c2"))
          .when(col("lvl") === 2,
            lit(0.4) * col("bc2").cast("double") / col("bc1"))
          .otherwise(lit(0.16) *
            (coalesce(col("u1"), lit(0L)).cast("double") + lit(1.0)) /
            (col("nn").cast("double") + col("vv"))))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_uni"),
        round(avg(-log(p)), 4).as("avg_neg_lp"))
    held.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        coalesce(col("avg_neg_lp"), lit(0.0)).as("avg_neg_lp"))
  }

  val trigramBackoffSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |train AS (SELECT * FROM base WHERE doc_id % 11 <> 0),
      |held AS (SELECT * FROM base WHERE doc_id % 11 = 0),
      |tr3 AS (
      |  SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM (
      |    SELECT doc_id,
      |      unnest([{'w1': toks[i], 'w2': toks[i + 1], 'w3': toks[i + 2]}
      |              FOR i IN range(1, len(toks) - 1)]) AS g
      |    FROM train)),
      |tr2 AS (
      |  SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM (
      |    SELECT doc_id,
      |      unnest([{'w1': toks[i], 'w2': toks[i + 1]}
      |              FOR i IN range(1, len(toks))]) AS g
      |    FROM train)),
      |h3 AS (
      |  SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM (
      |    SELECT doc_id,
      |      unnest([{'w1': toks[i], 'w2': toks[i + 1], 'w3': toks[i + 2]}
      |              FOR i IN range(1, len(toks) - 1)]) AS g
      |    FROM held)),
      |t3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tr3 GROUP BY 1, 2, 3),
      |t2 AS (SELECT w1, w2, count(*) AS c2 FROM tr3 GROUP BY 1, 2),
      |b2 AS (SELECT w1 AS v2, w2 AS v3, count(*) AS bc2
      |       FROM tr2 GROUP BY 1, 2),
      |b1 AS (SELECT w1 AS v2b, count(*) AS bc1 FROM tr2 GROUP BY 1),
      |uni AS (SELECT unnest(toks) AS w FROM train),
      |u1 AS (SELECT w AS v3u, count(*) AS u1 FROM uni GROUP BY 1),
      |totals AS (SELECT count(*) AS nn, count(DISTINCT w) AS vv FROM uni),
      |scored AS (
      |  SELECT h.doc_id,
      |    count(*) AS n_trigrams,
      |    CAST(sum(CASE WHEN t3.c3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_tri,
      |    CAST(sum(CASE WHEN t3.c3 IS NULL AND b2.bc2 IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
      |    CAST(sum(CASE WHEN t3.c3 IS NULL AND b2.bc2 IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
      |    round(avg(-ln(
      |      CASE
      |        WHEN t3.c3 IS NOT NULL THEN t3.c3::DOUBLE / t2.c2
      |        WHEN b2.bc2 IS NOT NULL THEN 0.4 * (bc2::DOUBLE) / b1.bc1
      |        ELSE 0.16 * (coalesce(u1.u1, 0)::DOUBLE + 1.0)
      |          / (totals.nn::DOUBLE + totals.vv)
      |      END)), 4) AS avg_neg_lp
      |  FROM h3 h
      |  LEFT JOIN t3 ON h.w1 = t3.w1 AND h.w2 = t3.w2 AND h.w3 = t3.w3
      |  LEFT JOIN t2 ON h.w1 = t2.w1 AND h.w2 = t2.w2
      |  LEFT JOIN b2 ON h.w2 = b2.v2 AND h.w3 = b2.v3
      |  LEFT JOIN b1 ON h.w2 = b1.v2b
      |  LEFT JOIN u1 ON h.w3 = u1.v3u
      |  CROSS JOIN totals
      |  GROUP BY h.doc_id)
      |SELECT b.doc_id,
      |  CAST(coalesce(s.n_trigrams, 0) AS BIGINT) AS n_trigrams,
      |  coalesce(s.n_tri, 0) AS n_tri,
      |  coalesce(s.n_bi, 0) AS n_bi,
      |  coalesce(s.n_uni, 0) AS n_uni,
      |  coalesce(s.avg_neg_lp, 0.0) AS avg_neg_lp
      |FROM held b LEFT JOIN scored s USING (doc_id)""".stripMargin

  /** Zipf rank-frequency panel: term counts bucketed by
    * floor(log2(rank)) with rank assigned count-desc, word-asc (the
    * deterministic boundary the vocab-coverage panel uses). The bucket
    * index is length(bin(rank)) - 1 — integer bit-length, so no float
    * log at exact powers of two can disagree between engines. The data
    * card's "does this corpus look natural-language" panel.
    *
    * Scale: the global rank is range-partition + in-partition sort +
    * zipWithIndex — the prefixRankJoin spelling, NOT a global window
    * (PlanSpec forbids single-reducer windows even over the
    * vocabulary-sized table); everything before it is a
    * map-side-combined count, everything after is answer-sized.
    */
  def zipfPanel(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val counts = d
      .select(explode(TextOps.letterTokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val ranked = counts
      .repartitionByRange(col("cnt").desc, col("w"))
      .sortWithinPartitions(col("cnt").desc, col("w"))
      .select(col("cnt")).rdd
      .zipWithIndex()
      .map { case (r, i) => (r.getLong(0), i + 1L) }
      .toDF("cnt", "rank")
    ranked
      .withColumn("bucket", (length(bin(col("rank"))) - 1).cast("bigint"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_terms"),
        sum("cnt").as("total_cnt"),
        max("cnt").as("max_cnt"), min("cnt").as("min_cnt"))
  }

  val zipfPanelSql: String =
    """WITH counts AS (
      |  SELECT w, count(*) AS cnt FROM (
      |    SELECT unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '')) AS w
      |    FROM documents)
      |  GROUP BY 1),
      |ranked AS (
      |  SELECT cnt,
      |    CAST(length(bin(CAST(row_number() OVER (ORDER BY cnt DESC, w)
      |      AS BIGINT))) - 1 AS BIGINT) AS bucket
      |  FROM counts)
      |SELECT bucket, count(*) AS n_terms,
      |  CAST(sum(cnt) AS BIGINT) AS total_cnt,
      |  CAST(max(cnt) AS BIGINT) AS max_cnt,
      |  CAST(min(cnt) AS BIGINT) AS min_cnt
      |FROM ranked GROUP BY 1""".stripMargin

  /** Batch retrieval join — BM25 search where the QUERIES are a table,
    * not a literal term list (the RAG-indexing shape: an eval/query
    * set retrieved against the corpus in one distributed job, versus
    * [[bm25]]'s single fixed query). Queries are the 1-in-97 doc
    * slice; each query is represented by its `qTerms` RAREST distinct
    * terms (corpus df asc, term asc — the rare-first candidate
    * heuristic that keeps posting lists short at scale), candidates
    * are corpus docs sharing at least one of them, and candidates are
    * BM25-scored over exactly those terms with a per-query top-k.
    *
    * Scale: term selection is a per-query window over its own distinct
    * terms; the candidate join is (query-term) x (posting list) —
    * bounded by the rare-term choice, hash-partitioned on the term;
    * scoring stats (n_docs, avgdl) broadcast as one row; the top-k
    * window partitions by query. No corpus broadcast, no all-pairs.
    */
  def retrievalJoin(
      d: DataFrame, qTerms: Int = 5, k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isQuery = col("doc_id") % 97 === 0
    val toks = TextOps.letterTokens(col("text"))
    val corpus = d.filter(!isQuery)
    val cTerms = graft.core.Layout.spread(corpus, "doc_id")
      .select(col("doc_id").as("c_id"), explode(toks).as("term"))
      .groupBy("c_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = cTerms.groupBy("term")
      .agg(count(lit(1)).cast("double").as("dfreq"))
    val dlens = corpus.select(col("doc_id").as("c_id"),
      size(toks).cast("double").as("dl"))
    val stats = corpus.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(toks)).as("avgdl"))
    val qw = Window.partitionBy("q_id").orderBy(col("dfreq"), col("term"))
    val qTermTable = d.filter(isQuery)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(toks)).as("term"))
      .join(dfreq, "term") // query terms absent from the corpus retrieve nothing
      .withColumn("tr", row_number().over(qw))
      .filter(col("tr") <= qTerms)
      .select("q_id", "term", "dfreq")
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("c_id"))
    qTermTable
      .join(cTerms, "term")
      .join(dlens, "c_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5)))
      .withColumn("s",
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") +
            lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("q_id", "c_id")
      .agg(round(sum("s"), 4).as("score"),
        count(lit(1)).as("n_shared_terms"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("c_id"), col("rank"), col("score"),
        col("n_shared_terms"))
  }

  def retrievalJoinSql(
      qTerms: Int = 5, k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 5): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
       |      t -> t <> '') AS tk
       |  FROM documents),
       |cterms AS (
       |  SELECT doc_id AS c_id, term, count(*)::DOUBLE AS tf FROM (
       |    SELECT doc_id, unnest(tk) AS term FROM toks
       |    WHERE doc_id % 97 <> 0)
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*)::DOUBLE AS dfreq FROM cterms
       |  GROUP BY 1),
       |dl AS (SELECT doc_id AS c_id, len(tk)::DOUBLE AS dl FROM toks
       |  WHERE doc_id % 97 <> 0),
       |st AS (
       |  SELECT count(*)::DOUBLE AS n_docs, avg(len(tk)) AS avgdl
       |  FROM toks WHERE doc_id % 97 <> 0),
       |qterms AS (
       |  SELECT q_id, term, dfreq FROM (
       |    SELECT q.q_id, q.term, f.dfreq,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY f.dfreq, q.term) AS tr
       |    FROM (SELECT doc_id AS q_id, unnest(list_distinct(tk)) AS term
       |          FROM toks WHERE doc_id % 97 = 0) q
       |    JOIN dfreq f ON q.term = f.term)
       |  WHERE tr <= $qTerms),
       |scored AS (
       |  SELECT qt.q_id, c.c_id,
       |    round(sum(
       |      ln(1.0 + (st.n_docs - qt.dfreq + 0.5) / (qt.dfreq + 0.5))
       |        * c.tf * ${k1 + 1} /
       |        (c.tf + $k1 * ((1 - $b) + $b * dl.dl / st.avgdl))), 4)
       |      AS score,
       |    count(*) AS n_shared_terms
       |  FROM qterms qt
       |  JOIN cterms c ON qt.term = c.term
       |  JOIN dl ON c.c_id = dl.c_id
       |  CROSS JOIN st
       |  GROUP BY 1, 2)
       |SELECT q_id, c_id, rank, score,
       |  CAST(n_shared_terms AS BIGINT) AS n_shared_terms
       |FROM (SELECT q_id, c_id, score, n_shared_terms,
       |        CAST(row_number() OVER (PARTITION BY q_id
       |          ORDER BY score DESC, c_id) AS BIGINT) AS rank
       |      FROM scored)
       |WHERE rank <= $topK""".stripMargin

  /** Reciprocal-rank-fusion hybrid retrieval (Cormack et al. 2009):
    * fuse two rankers' top-k lists per query into one result by
    * summing 1e6 div (60 + rank) per appearance — scaled-integer RRF,
    * so the fusion is bit-exact in both engines. Ranker A is the BM25
    * batch search ([[retrievalJoin]]); ranker B re-ranks the SAME
    * rare-term candidate set by coarse shared-term count with a
    * shorter-document preference — the precision-leaning counterpart
    * to BM25's tf/length calibration. A candidate found by both
    * rankers compounds; rank ties break by c_id everywhere.
    *
    * Both rankers keep the posting-list join bounded by the 5
    * RAREST query terms (corpus-df-ranked — the discipline that keeps
    * a stop word from exploding the candidate join at 100 TB); the
    * fusion itself is answer-sized (<= 2k rows per query).
    */
  /** Term-burstiness panel (index of dispersion): for the 20 most
    * frequent terms, the variance-to-mean ratio of per-document
    * counts — VMR ~ 1 is Poisson background (function words), VMR >> 1
    * is a bursty content term that clumps in few docs, the classic
    * keyword signal (Church & Gale's burstiness; what tf-idf's df term
    * approximates). Integer-exact throughout: with S1 = sum of counts,
    * S2 = sum of squared counts over NONZERO docs and D = corpus size,
    * population VMR = (D*S2 - S1^2) / (D*S1), emitted as the exact
    * integer permille `1000*(D*S2 - S1^2) DIV (D*S1)` — zero-count
    * docs enter through D without being materialized.
    *
    * Scale: one (term, doc) aggregation feeding one term aggregation
    * (both map-side combinable), a 1-row corpus count broadcast, and
    * an answer-sized top-20. Headroom: D*S2 <= D * S1 * max_count —
    * int64-safe to ~1e9 docs x 1e6-token docs.
    */
  def burstiness(d: DataFrame, topN: Int = 20): DataFrame = {
    val toks = TextOps.letterTokens(col("text"))
    val perDoc = d.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val perTerm = perDoc.groupBy("term").agg(
      count(lit(1)).as("n_docs_with"),
      sum("c").as("s1"),
      sum(col("c") * col("c")).as("s2"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    perTerm.crossJoin(broadcast(nDocs))
      .select(col("term"), col("n_docs_with"), col("s1"), col("s2"),
        expr("1000 * (n_docs * s2 - s1 * s1) DIV (n_docs * s1)")
          .as("vmr_permille"))
      .orderBy(col("s1").desc, col("term"))
      .limit(topN)
  }

  val burstinessSql: String =
    """WITH per_doc AS (
      |  SELECT doc_id, term, count(*) AS c FROM (
      |    SELECT doc_id,
      |      unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |        t -> t <> '')) AS term
      |    FROM documents)
      |  GROUP BY 1, 2),
      |per_term AS (
      |  SELECT term, count(*) AS n_docs_with,
      |    CAST(sum(c) AS BIGINT) AS s1,
      |    CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM per_doc GROUP BY 1),
      |nd AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT term, n_docs_with, s1, s2,
      |  CAST(1000 * (n_docs * s2 - s1 * s1) // (n_docs * s1) AS BIGINT)
      |    AS vmr_permille
      |FROM per_term CROSS JOIN nd
      |ORDER BY s1 DESC, term
      |LIMIT 20""".stripMargin

  /** KL-divergence mixture diagnostic: per source, KL(P_source ||
    * P_corpus) over unigram distributions — how far each source's
    * token mix sits from the blend, the number a data-mixture tuner
    * watches when re-weighting sources (cf. the DSIR sampler, which
    * importance-weights by the same ratio doc-by-doc). Every source
    * term exists in the corpus distribution by construction, so no
    * smoothing is needed and KL is finite. All counts stay exact
    * integers through the (source, term) x (term) join; the single
    * float appears in the final per-source sum, rounded at 6 dp (the
    * panel convention). Scale: one (source, term) shuffle + one
    * term-partitioned join against the vocabulary — never a corpus
    * broadcast; the per-source rollup is answer-sized.
    */
  def klBySource(d: DataFrame): DataFrame = {
    val toks = TextOps.letterTokens(col("text"))
    val st = d.select(col("source"), explode(toks).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c_st"))
    val srcTot = st.groupBy("source").agg(sum("c_st").as("n_s"))
    val corp = st.groupBy("term").agg(sum("c_st").as("c_t"))
    val nAll = corp.agg(sum("c_t").as("n_all"))
    st.join(srcTot, "source")
      .join(corp, "term")
      .crossJoin(broadcast(nAll))
      .groupBy("source")
      .agg(
        max("n_s").as("n_tokens"),
        count(lit(1)).as("vocab"),
        round(sum(
          (col("c_st").cast("double") / col("n_s")) *
            log((col("c_st").cast("double") * col("n_all")) /
              (col("n_s").cast("double") * col("c_t")))), 6)
          .as("kl_nats"))
  }

  val klBySourceSql: String =
    """WITH st AS (
      |  SELECT source, term, count(*) AS c_st FROM (
      |    SELECT source,
      |      unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |        t -> t <> '')) AS term
      |    FROM documents)
      |  GROUP BY 1, 2),
      |src_tot AS (
      |  SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st
      |  GROUP BY 1),
      |corp AS (
      |  SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
      |n_all AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_all FROM corp)
      |SELECT st.source,
      |  max(s.n_s) AS n_tokens,
      |  count(*) AS vocab,
      |  round(sum(
      |    (st.c_st::DOUBLE / s.n_s) *
      |      ln((st.c_st::DOUBLE * a.n_all) / (s.n_s::DOUBLE * c.c_t))),
      |    6) AS kl_nats
      |FROM st
      |JOIN src_tot s ON st.source = s.source
      |JOIN corp c ON st.term = c.term
      |CROSS JOIN n_all a
      |GROUP BY 1""".stripMargin

  /** nDCG@k ranking-quality panel for the BM25 batch search: within a
    * 50-candidate judged pool per query ([[retrievalJoin]] at
    * topK=50), graded relevance = the shared-rare-term count, system
    * order = BM25 rank, ideal order = relevance desc. Gains are the
    * exact integers `2^rel - 1` (shiftleft — rel <= 5 so no overflow);
    * only the final DCG/IDCG/nDCG sums round (6 dp), the convention
    * every float-bearing panel here uses so both engines agree.
    *
    * Scale: everything after the candidate join is answer-sized — two
    * row_number windows partitioned by query over <= 50 rows each,
    * then a per-query aggregate. The candidate join itself inherits
    * retrievalJoin's rare-term bound.
    */
  def retrievalNdcg(
      d: DataFrame, poolK: Int = 50, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pool = retrievalJoin(d, topK = poolK)
      .select(col("q_id"), col("c_id"), col("rank"),
        expr("shiftleft(1L, cast(n_shared_terms AS INT)) - 1L").as("gain"))
    val wIdeal = Window.partitionBy("q_id")
      .orderBy(col("gain").desc, col("c_id"))
    pool.withColumn("irank", row_number().over(wIdeal).cast("bigint"))
      .groupBy("q_id")
      .agg(
        count(lit(1)).as("n_judged"),
        round(sum(when(col("rank") <= k,
          col("gain").cast("double") / log2(col("rank") + 1))
          .otherwise(lit(0.0))), 6).as("dcg"),
        round(sum(when(col("irank") <= k,
          col("gain").cast("double") / log2(col("irank") + 1))
          .otherwise(lit(0.0))), 6).as("idcg"),
        round(
          sum(when(col("rank") <= k,
            col("gain").cast("double") / log2(col("rank") + 1))
            .otherwise(lit(0.0))) /
            sum(when(col("irank") <= k,
              col("gain").cast("double") / log2(col("irank") + 1))
              .otherwise(lit(0.0))), 6).as("ndcg"))
  }

  def retrievalNdcgSql(poolK: Int = 50, k: Int = 5): String =
    s"""WITH pool AS (
       |${retrievalJoinSql(topK = poolK)}),
       |graded AS (
       |  SELECT q_id, c_id, rank,
       |    (1::BIGINT << n_shared_terms::INT) - 1 AS gain
       |  FROM pool),
       |ranked AS (
       |  SELECT q_id, rank, gain,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY gain DESC, c_id) AS BIGINT) AS irank
       |  FROM graded)
       |SELECT q_id, count(*) AS n_judged,
       |  round(sum(CASE WHEN rank <= $k
       |    THEN gain::DOUBLE / log2(rank + 1) ELSE 0.0 END), 6) AS dcg,
       |  round(sum(CASE WHEN irank <= $k
       |    THEN gain::DOUBLE / log2(irank + 1) ELSE 0.0 END), 6) AS idcg,
       |  round(sum(CASE WHEN rank <= $k
       |    THEN gain::DOUBLE / log2(rank + 1) ELSE 0.0 END) /
       |    sum(CASE WHEN irank <= $k
       |      THEN gain::DOUBLE / log2(irank + 1) ELSE 0.0 END), 6) AS ndcg
       |FROM ranked GROUP BY 1""".stripMargin

  /** Pseudo-relevance-feedback query expansion (the RM3 recipe,
    * Lavrenko & Croft 2001 as deployed): retrieve each query's BM25
    * top-`fbK` FEEDBACK docs, mine the `expTerms` heaviest terms (by
    * summed tf across the feedback set, term tie-break) that are NOT
    * already query terms, then re-run the BM25 search over the
    * expanded term set — the vocabulary-mismatch fix (a query saying
    * "car" retrieves docs saying "automobile" on the second pass
    * because the first pass's top docs said both). Emits the re-ranked
    * top-k with `n_exp_terms` = how many EXPANSION terms each result
    * shares, so a relevance engineer can see which hits the expansion
    * earned vs the original query.
    *
    * Scale: feedback is [[retrievalJoin]] at its documented
    * candidate-bounded shape; expansion mining joins the fbK×|queries|
    * answer-sized feedback list against the term table co-partitioned
    * on c_id and windows per query; the second search is the same
    * term-bucketed join with ≤ qTerms+expTerms terms per query.
    * Nothing corpus×corpus; pays the generator twice by the panel
    * convention (venn/lsh_quality precedent).
    */
  def retrievalRm3(
      d: DataFrame, qTerms: Int = 5, expTerms: Int = 3, fbK: Int = 3,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isQuery = col("doc_id") % 97 === 0
    val toks = TextOps.letterTokens(col("text"))
    val corpus = d.filter(!isQuery)
    val cTerms = graft.core.Layout.spread(corpus, "doc_id")
      .select(col("doc_id").as("c_id"), explode(toks).as("term"))
      .groupBy("c_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = cTerms.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val dlens = corpus.select(col("doc_id").as("c_id"),
      size(toks).cast("double").as("dl"))
    val stats = corpus.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(toks)).as("avgdl"))
    val qw = Window.partitionBy("q_id").orderBy(col("dfreq"), col("term"))
    val qOrig = d.filter(isQuery)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(toks)).as("term"))
      .join(dfreq, "term")
      .withColumn("tr", row_number().over(qw))
      .filter(col("tr") <= qTerms)
      .select("q_id", "term", "dfreq")
    val fb = retrievalJoin(d, qTerms, k1, b, topK = fbK)
      .select("q_id", "c_id")
    val ew = Window.partitionBy("q_id").orderBy(col("etf").desc, col("term"))
    val exp = fb.join(cTerms, "c_id")
      .groupBy("q_id", "term").agg(sum("tf").as("etf"))
      .join(qOrig.select("q_id", "term"), Seq("q_id", "term"), "left_anti")
      .withColumn("er", row_number().over(ew))
      .filter(col("er") <= expTerms)
      .join(dfreq, "term")
      .select(col("q_id"), col("term"), col("dfreq"), lit(1L).as("is_exp"))
    // Expansion terms are by construction HIGH-tf terms of the
    // feedback docs — common terms with corpus-wide posting lists
    // (unlike retrievalJoin's rarest-first query terms), so the final
    // scoring join streams ~|corpus| posting rows per expansion term.
    // AQE broadcasts cTerms and coalesces the tiny qAll side to ONE
    // partition, putting that whole stream + BM25 scoring + aggregate
    // on a single task (r19 JobProf: a 1.9 s one-task stage = 60% of
    // the query). Spread the probe side by the join term instead:
    // REPARTITION_BY_NUM is coalescing-exempt, each task streams a
    // slice of the expansion postings.
    val qAll = qOrig
      .select(col("q_id"), col("term"), col("dfreq"), lit(0L).as("is_exp"))
      .unionByName(exp)
      .repartition(graft.core.Layout.shufflePartitions(d.sparkSession),
        col("q_id"), col("term"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("c_id"))
    qAll
      .join(cTerms, "term")
      .join(dlens, "c_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5)))
      .withColumn("s",
        col("idf") * col("tf").cast("double") * (k1 + 1) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("q_id", "c_id")
      .agg(round(sum("s"), 4).as("score"),
        count(lit(1)).as("n_shared_terms"),
        sum("is_exp").as("n_exp_terms"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("c_id"), col("rank"), col("score"),
        col("n_shared_terms"), col("n_exp_terms"))
  }

  def retrievalRm3Sql(
      qTerms: Int = 5, expTerms: Int = 3, fbK: Int = 3,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 5): String =
    s"""WITH fb AS (
       |${retrievalJoinSql(qTerms = qTerms, k1 = k1, b = b, topK = fbK)}
       |),
       |toks3 AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
       |      t -> t <> '') AS tk
       |  FROM documents),
       |cterms3 AS (
       |  SELECT doc_id AS c_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(tk) AS term FROM toks3
       |    WHERE doc_id % 97 <> 0)
       |  GROUP BY 1, 2),
       |dfreq3 AS (SELECT term, count(*) AS dfreq FROM cterms3 GROUP BY 1),
       |dl3 AS (SELECT doc_id AS c_id, len(tk)::DOUBLE AS dl FROM toks3
       |  WHERE doc_id % 97 <> 0),
       |st3 AS (
       |  SELECT count(*)::DOUBLE AS n_docs, avg(len(tk)) AS avgdl
       |  FROM toks3 WHERE doc_id % 97 <> 0),
       |qorig AS (
       |  SELECT q_id, term, dfreq FROM (
       |    SELECT q.q_id, q.term, f.dfreq,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY f.dfreq, q.term) AS tr
       |    FROM (SELECT doc_id AS q_id, unnest(list_distinct(tk)) AS term
       |          FROM toks3 WHERE doc_id % 97 = 0) q
       |    JOIN dfreq3 f ON q.term = f.term)
       |  WHERE tr <= $qTerms),
       |expterms AS (
       |  SELECT e.q_id, e.term, f.dfreq, 1 AS is_exp FROM (
       |    SELECT q_id, term,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY etf DESC, term) AS er
       |    FROM (
       |      SELECT fb.q_id, c.term, sum(c.tf) AS etf
       |      FROM fb JOIN cterms3 c ON fb.c_id = c.c_id
       |      WHERE NOT EXISTS (
       |        SELECT 1 FROM qorig o
       |        WHERE o.q_id = fb.q_id AND o.term = c.term)
       |      GROUP BY 1, 2)) e
       |  JOIN dfreq3 f ON e.term = f.term
       |  WHERE e.er <= $expTerms),
       |qall AS (
       |  SELECT q_id, term, dfreq, 0 AS is_exp FROM qorig
       |  UNION ALL
       |  SELECT q_id, term, dfreq, is_exp FROM expterms),
       |scored AS (
       |  SELECT qt.q_id, c.c_id,
       |    round(sum(
       |      ln(1.0 + (st3.n_docs - qt.dfreq + 0.5) / (qt.dfreq + 0.5))
       |        * c.tf::DOUBLE * ${k1 + 1} /
       |        (c.tf::DOUBLE + $k1 * ((1 - $b) + $b * dl3.dl / st3.avgdl))),
       |      4) AS score,
       |    count(*) AS n_shared_terms,
       |    CAST(sum(qt.is_exp) AS BIGINT) AS n_exp_terms
       |  FROM qall qt
       |  JOIN cterms3 c ON qt.term = c.term
       |  JOIN dl3 ON c.c_id = dl3.c_id
       |  CROSS JOIN st3
       |  GROUP BY 1, 2)
       |SELECT q_id, c_id, rank, score,
       |  CAST(n_shared_terms AS BIGINT) AS n_shared_terms, n_exp_terms
       |FROM (SELECT q_id, c_id, score, n_shared_terms, n_exp_terms,
       |        CAST(row_number() OVER (PARTITION BY q_id
       |          ORDER BY score DESC, c_id) AS BIGINT) AS rank
       |      FROM scored)
       |WHERE rank <= $topK""".stripMargin

  def retrievalRrf(
      d: DataFrame, qTerms: Int = 5, topK: Int = 5,
      rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isQuery = col("doc_id") % 97 === 0
    val toks = TextOps.letterTokens(col("text"))
    val bm25 = retrievalJoin(d, qTerms = qTerms, topK = topK)
      .select(col("q_id"), col("c_id"), col("rank"))
    val corpus = d.filter(!isQuery)
    val cTerms = corpus
      .select(col("doc_id").as("c_id"), explode(array_distinct(toks))
        .as("term"))
    val dfreq = cTerms.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val qw = Window.partitionBy("q_id").orderBy(col("dfreq"), col("term"))
    val qRare = d.filter(isQuery)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(toks)).as("term"))
      .join(dfreq, "term")
      .withColumn("tr", row_number().over(qw))
      .filter(col("tr") <= qTerms)
      .select("q_id", "term")
    val dlens = corpus.select(col("doc_id").as("c_id"),
      size(toks).cast("bigint").as("dl"))
    val wOv = Window.partitionBy("q_id")
      .orderBy(col("ov").desc, col("dl").asc, col("c_id"))
    val overlap = qRare.join(cTerms, "term")
      .groupBy("q_id", "c_id").agg(count(lit(1)).as("ov"))
      .join(dlens, "c_id")
      .withColumn("rank", row_number().over(wOv).cast("bigint"))
      .filter(col("rank") <= topK)
      .select("q_id", "c_id", "rank")
    val wR = Window.partitionBy("q_id")
      .orderBy(col("rrf_x1e6").desc, col("c_id"))
    bm25.unionByName(overlap)
      .select(col("q_id"), col("c_id"),
        expr(s"CAST(1000000 DIV ($rrfK + rank) AS BIGINT)").as("pts"))
      .groupBy("q_id", "c_id")
      .agg(sum("pts").as("rrf_x1e6"), count(lit(1)).as("n_rankers"))
      .withColumn("rank", row_number().over(wR).cast("bigint"))
      .filter(col("rank") <= topK)
      .select("q_id", "c_id", "rank", "rrf_x1e6", "n_rankers")
  }

  def retrievalRrfSql(
      qTerms: Int = 5, topK: Int = 5, rrfK: Int = 60): String =
    s"""WITH bm25 AS (
       |${retrievalJoinSql(qTerms = qTerms, topK = topK)}
       |),
       |toks2 AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
       |      t -> t <> '') AS tk
       |  FROM documents),
       |cterms2 AS (
       |  SELECT DISTINCT doc_id AS c_id, unnest(tk) AS term FROM toks2
       |  WHERE doc_id % 97 <> 0),
       |dfreq2 AS (SELECT term, count(*) AS dfreq FROM cterms2 GROUP BY 1),
       |dl2 AS (SELECT doc_id AS c_id, CAST(len(tk) AS BIGINT) AS dl
       |  FROM toks2 WHERE doc_id % 97 <> 0),
       |qrare AS (
       |  SELECT q_id, term FROM (
       |    SELECT q.q_id, q.term,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY f.dfreq, q.term) AS tr
       |    FROM (SELECT doc_id AS q_id, unnest(list_distinct(tk)) AS term
       |          FROM toks2 WHERE doc_id % 97 = 0) q
       |    JOIN dfreq2 f ON q.term = f.term)
       |  WHERE tr <= $qTerms),
       |ovr AS (
       |  SELECT q_id, c_id, rank FROM (
       |    SELECT o.q_id, o.c_id,
       |      CAST(row_number() OVER (PARTITION BY o.q_id
       |        ORDER BY o.ov DESC, d.dl, o.c_id) AS BIGINT) AS rank
       |    FROM (SELECT qr.q_id, c.c_id, count(*) AS ov
       |          FROM qrare qr JOIN cterms2 c ON qr.term = c.term
       |          GROUP BY 1, 2) o
       |    JOIN dl2 d ON o.c_id = d.c_id)
       |  WHERE rank <= $topK),
       |contrib AS (
       |  SELECT q_id, c_id, 1000000 // ($rrfK + rank) AS pts FROM bm25
       |  UNION ALL
       |  SELECT q_id, c_id, 1000000 // ($rrfK + rank) AS pts FROM ovr),
       |fused AS (
       |  SELECT q_id, c_id, CAST(sum(pts) AS BIGINT) AS rrf_x1e6,
       |    count(*) AS n_rankers
       |  FROM contrib GROUP BY 1, 2)
       |SELECT q_id, c_id, rank, rrf_x1e6, n_rankers
       |FROM (SELECT q_id, c_id, rrf_x1e6, n_rankers,
       |        CAST(row_number() OVER (PARTITION BY q_id
       |          ORDER BY rrf_x1e6 DESC, c_id) AS BIGINT) AS rank
       |      FROM fused)
       |WHERE rank <= $topK""".stripMargin

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998) —
    * the diversity-aware last stage of the retrieval stack
    * ([[retrievalJoin]] candidates -> [[retrievalRrf]] fusion -> MMR
    * selection): from each query's BM25 top-`poolK` pool, greedily
    * select `selK` results maximizing
    * `7*relevance - 3*max_similarity_to_selected` (lambda = 0.7,
    * scaled-integer so both engines agree bit-for-bit). Relevance is
    * rank-linear ((poolK+1-rank) x 1000); inter-candidate similarity
    * is integer Jaccard over distinct letter-token sets (x10000). The
    * op that stops a RAG context window from being five copies of the
    * same passage.
    *
    * Scale: after candidate generation (which inherits the rare-term
    * bound), EVERYTHING is answer-sized — the pool is poolK rows per
    * query, pairwise sims are <= poolK^2 per query partitioned by
    * q_id, and each of the selK greedy rounds is one join + one
    * per-query window over those rows. No stage's cost depends on
    * corpus cardinality. The selection loop is unrolled as DataFrame
    * rounds (no driver-side collect — per-query state can never be a
    * driver literal), localCheckpointed per round to keep lineage flat.
    */
  def retrievalMmr(
      d: DataFrame, qTerms: Int = 5, poolK: Int = 10,
      selK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cands = retrievalJoin(d, qTerms = qTerms, topK = poolK)
      .select(col("q_id"), col("c_id"),
        ((lit(poolK + 1L) - col("rank")) * 1000L).cast("bigint")
          .as("rel_x1e4"))
    // spread before the tokenize: the single-row-group documents file
    // scans as ONE task, and the whole corpus tokenization otherwise
    // runs inside it (r19 JobProf: a ~1 s one-task stage under the cd
    // barrier)
    val csets = graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id").as("c_id"),
        array_distinct(TextOps.letterTokens(col("text"))).as("tk"))
    // (r19: flipping this join to broadcast the candidate side and
    // stream the corpus was measured WORSE — 2.6 -> 3.8 s isolated;
    // the one-task cd barrier probe is cheaper than re-paying the
    // retrieval chain through a broadcast build)
    val cd = cands.join(csets, "c_id")
      .select("q_id", "c_id", "rel_x1e4", "tk").barrier()
    val inter = size(array_intersect(col("t1"), col("t2")))
    val psim = cd.select(col("q_id"), col("c_id").as("c1"), col("tk").as("t1"))
      .join(cd.select(col("q_id"), col("c_id").as("c2"), col("tk").as("t2")),
        Seq("q_id"))
      .filter(col("c1") =!= col("c2"))
      .select(col("q_id"), col("c1"), col("c2"), inter.as("i"),
        (size(col("t1")) + size(col("t2"))).as("su"))
      .select(col("q_id"), col("c1"), col("c2"),
        expr("CAST(i * 10000 DIV greatest(su - i, 1) AS BIGINT)").as("sim"))
      .barrier()
    def pick(scored: DataFrame, r: Int): DataFrame = {
      val w = Window.partitionBy("q_id")
        .orderBy(col("mmr_score").desc, col("c_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("c_id"), lit(r.toLong).as("sel"),
          col("rel_x1e4"), col("maxsim_x1e4"), col("mmr_score"))
    }
    var result = pick(cd.select(col("q_id"), col("c_id"), col("rel_x1e4"),
      lit(0L).as("maxsim_x1e4"),
      (col("rel_x1e4") * 7).as("mmr_score")), 1)
    for (r <- 2 to selK) {
      val selSet = result.select(col("q_id"), col("c_id"))
      val simToSel = psim
        .join(selSet.withColumnRenamed("c_id", "c2"), Seq("q_id", "c2"))
        .groupBy(col("q_id"), col("c1").as("c_id"))
        .agg(max("sim").as("ms"))
      val scored = cd.join(selSet, Seq("q_id", "c_id"), "left_anti")
        .join(simToSel, Seq("q_id", "c_id"), "left")
        .withColumn("maxsim_x1e4", coalesce(col("ms"), lit(0L)))
        .withColumn("mmr_score",
          col("rel_x1e4") * 7 - col("maxsim_x1e4") * 3)
      result = result.unionByName(pick(scored, r)).barrier()
    }
    result
  }

  def retrievalMmrSql(
      qTerms: Int = 5, poolK: Int = 10, selK: Int = 5): String = {
    val rounds = (2 to selK).map { r =>
      val selected = (1 until r).map(i => s"SELECT q_id, c_id FROM s$i")
        .mkString(" UNION ALL ")
      s"""sel$r AS ($selected),
         |m$r AS (
         |  SELECT c.q_id, c.c_id, c.rel, coalesce(max(p.sim), 0) AS maxsim
         |  FROM cd c LEFT JOIN (
         |    SELECT ps.q_id, ps.c1, ps.sim
         |    FROM psim ps JOIN sel$r s ON ps.q_id = s.q_id AND ps.c2 = s.c_id
         |  ) p ON p.q_id = c.q_id AND p.c1 = c.c_id
         |  WHERE NOT EXISTS (SELECT 1 FROM sel$r s
         |    WHERE s.q_id = c.q_id AND s.c_id = c.c_id)
         |  GROUP BY 1, 2, 3),
         |s$r AS (
         |  SELECT q_id, c_id, CAST($r AS BIGINT) AS sel, rel, maxsim,
         |    rel * 7 - maxsim * 3 AS score
         |  FROM (SELECT q_id, c_id, rel, maxsim,
         |          row_number() OVER (PARTITION BY q_id
         |            ORDER BY rel * 7 - maxsim * 3 DESC, c_id) AS rn
         |        FROM m$r)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to selK).map(i =>
      s"SELECT q_id, c_id, sel, rel, maxsim, score FROM s$i")
      .mkString("\nUNION ALL\n")
    s"""WITH bm AS (
       |${retrievalJoinSql(qTerms = qTerms, topK = poolK)}
       |),
       |cset AS (
       |  SELECT doc_id AS c_id,
       |    list_distinct(list_filter(regexp_split_to_array(text,
       |      '[^\\p{L}]+'), t -> t <> '')) AS tk
       |  FROM documents),
       |cd AS (
       |  SELECT b.q_id, b.c_id,
       |    CAST(($poolK + 1 - b.rank) * 1000 AS BIGINT) AS rel, s.tk
       |  FROM bm b JOIN cset s USING (c_id)),
       |psim AS (
       |  SELECT a.q_id, a.c_id AS c1, b.c_id AS c2,
       |    CAST(len(list_intersect(a.tk, b.tk)) * 10000 //
       |      greatest(len(a.tk) + len(b.tk)
       |        - len(list_intersect(a.tk, b.tk)), 1) AS BIGINT) AS sim
       |  FROM cd a JOIN cd b ON a.q_id = b.q_id AND a.c_id <> b.c_id),
       |s1 AS (
       |  SELECT q_id, c_id, CAST(1 AS BIGINT) AS sel, rel,
       |    CAST(0 AS BIGINT) AS maxsim, rel * 7 AS score
       |  FROM (SELECT q_id, c_id, rel,
       |          row_number() OVER (PARTITION BY q_id
       |            ORDER BY rel * 7 DESC, c_id) AS rn
       |        FROM cd)
       |  WHERE rn = 1),
       |$rounds
       |SELECT q_id, c_id, sel, rel AS rel_x1e4, maxsim AS maxsim_x1e4,
       |  score AS mmr_score
       |FROM ($out)""".stripMargin
  }

  /** N-gram diversity panel: total vs distinct n-gram counts for
    * n = 1..4 — the memorization/diversity diagnostic (a corpus whose
    * distinct-4-gram ratio is low is template- or duplicate-heavy and
    * trains a model that parrots; cf. the self-repetition analyses in
    * the memorization literature). Exact integers only.
    *
    * Scale: one explode + hash-partitioned distinct-count per n; the
    * four aggregates are a single union of answer-sized rows.
    */
  def diversityPanel(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // grams via posexplode + per-doc lead window, NOT a transform
    // lambda indexing back into the token-array expression — that
    // spelling re-ran the tokenizer per element access (O(doc^2);
    // 12 s warm at sf0.1, ~1 s this way — the winnowing HOF lesson
    // again). One window pass yields every n's gram column; the four
    // (count, distinct) pairs ride ONE multi-distinct aggregate.
    val w = Window.partitionBy("doc_id").orderBy("p")
    val grams = d
      .select(col("doc_id"),
        posexplode(TextOps.letterTokens(col("text"))).as(Seq("p", "t")))
      .select(col("t").as("g1"),
        lead(col("t"), 1).over(w).as("n1"),
        lead(col("t"), 2).over(w).as("n2"),
        lead(col("t"), 3).over(w).as("n3"))
      .select(col("g1"),
        when(col("n1").isNotNull,
          concat_ws(" ", col("g1"), col("n1"))).as("g2"),
        when(col("n2").isNotNull,
          concat_ws(" ", col("g1"), col("n1"), col("n2"))).as("g3"),
        when(col("n3").isNotNull,
          concat_ws(" ", col("g1"), col("n1"), col("n2"), col("n3")))
          .as("g4"))
    grams.agg(
        count(col("g1")).as("t1"), countDistinct(col("g1")).as("d1"),
        count(col("g2")).as("t2"), countDistinct(col("g2")).as("d2"),
        count(col("g3")).as("t3"), countDistinct(col("g3")).as("d3"),
        count(col("g4")).as("t4"), countDistinct(col("g4")).as("d4"))
      .select(expr("stack(4, 1L, t1, d1, 2L, t2, d2, 3L, t3, d3," +
        " 4L, t4, d4) AS (n, total_ngrams, distinct_ngrams)"))
      .withColumn("distinct_x10000",
        expr("distinct_ngrams * 10000 DIV nullif(total_ngrams, 0)"))
  }

  val diversityPanelSql: String = {
    def forN(n: Int): String = {
      val gram = (0 until n).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
      s"""SELECT CAST($n AS BIGINT) AS n,
         |  count(*) AS total_ngrams,
         |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
         |  CAST(count(DISTINCT g) * 10000 // nullif(count(*), 0) AS BIGINT)
         |    AS distinct_x10000
         |FROM (
         |  SELECT unnest([$gram FOR i IN range(1, len(toks) - ${n - 2})]) AS g
         |  FROM (SELECT list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
         |          t -> t <> '') AS toks
         |        FROM documents))""".stripMargin
    }
    (1 to 4).map(forN).mkString("\nUNION ALL\n")
  }

  // --------------------------------------------------------------------
  // Count-Min Sketch: linear, mergeable frequency estimation.
  // --------------------------------------------------------------------

  /** CMS depth (independent hash rows) and width (buckets per row).
    * Error bound: overestimate <= e*N/width with probability
    * 1 - exp(-depth) (Cormode & Muthukrishnan 2005). Sketch size is
    * depth x width longs — 32 KB here — regardless of corpus size.
    */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Row-j CMS bucket of a token column: md5-family 60-bit hash of
    * "cms<j>:<token>" mod width — the per-row salt makes the rows
    * independent hash functions, and the md5 family keeps the value
    * bit-replayable in the DuckDB oracle.
    */
  private def cmsBucket(j: Int, t: Column): Column =
    pmod(graft.ops.Hll.h60(concat(lit(s"cms$j:"), t)), lit(CmsWidth))

  /** JVM-side mirror of [[cmsBucket]] — byte-identical arithmetic
    * (md5 of "cms<j>:<token>" UTF-8, first 15 hex chars as a 60-bit
    * long, mod width), used by the streaming state operator
    * ([[graft.streaming.DocStreams.cmsWatch]]) whose per-key state is
    * the cell array itself, and by its spec to place watch terms.
    */
  private[graft] def cmsBucketScala(j: Int, t: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"cms$j:$t".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % CmsWidth).toInt
  }

  /** The CMS cell table for a token stream: (j, bucket) -> count,
    * at most depth x width rows. Exposed for the mergeability spec
    * (per-source cell tables SUM to the one-pass global table —
    * CMS is linear, which is what makes per-shard / per-day sketches
    * combine by addition without re-scanning anything).
    */
  private[graft] def cmsCells(toks: DataFrame): DataFrame = {
    val perTok = array((0 until CmsDepth).map(j =>
      struct(lit(j).as("j"), cmsBucket(j, col("t")).as("bucket"))): _*)
    toks.select(explode(perTok).as("cell"))
      .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Count-Min Sketch frequency panel: estimate the counts of the
    * exact top-k terms from a depth x width CMS and report the
    * one-sided error (estimate >= truth always, for every query —
    * the property the spec asserts row-by-row).
    *
    * This is the VERIFICATION panel for the sketch: the exact top-k
    * (a vocabulary-sized count, fine at test scale) is the ground
    * truth the estimates are judged against, the same convention as
    * q_ann_recall paying brute force. The production path at 100 TB
    * pairs the sketch with [[freqTerms]]'s Misra-Gries candidates:
    * MG names the heavy hitters, CMS prices any ad-hoc term later
    * WITHOUT re-scanning — the sketch's shuffle is map-side-combined
    * to <= depth x width cells per partition (32 KB) where an exact
    * vocabulary count shuffles every distinct token (billions of
    * keys: URLs, typos, hashes).
    *
    * Scale: one corpus scan for the cells (4 digests/token, fused
    * map-side), one for the ground truth; the probe join is k x depth
    * rows against a 4096-row cell table — answer-sized both sides.
    */
  def cmsFreqPanel(d: DataFrame, k: Int = 20): DataFrame = {
    val toks = d.select(explode(TextOps.wsTokens(col("text"))).as("t"))
    val cells = cmsCells(toks)
    val exact = toks.groupBy("t").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("t")).limit(k)
    val perTerm = array((0 until CmsDepth).map(j =>
      struct(lit(j).as("j"), cmsBucket(j, col("t")).as("bucket"))): _*)
    val probes = exact
      .select(col("t"), col("n_exact"), explode(perTerm).as("p"))
      .select(col("t"), col("n_exact"),
        col("p.j").as("j"), col("p.bucket").as("bucket"))
    broadcast(probes).join(cells, Seq("j", "bucket"))
      .groupBy("t", "n_exact").agg(min("c").as("n_cms"))
      .select(col("t"), col("n_exact"), col("n_cms"),
        (col("n_cms") - col("n_exact")).as("overest"))
  }

  val cmsFreqPanelSql: String = {
    import graft.ops.Hll
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'),
       |    t -> t <> '')) AS t
       |  FROM documents),
       |occ AS (
       |  SELECT t, r.j,
       |    ${Hll.h60Sql("'cms' || CAST(r.j AS VARCHAR) || ':' || t")}
       |      % $CmsWidth AS bucket
       |  FROM toks CROSS JOIN range($CmsDepth) AS r(j)),
       |cells AS (
       |  SELECT j, bucket, count(*) AS c FROM occ GROUP BY 1, 2),
       |exact AS (
       |  SELECT t, count(*) AS n_exact FROM toks GROUP BY 1
       |  ORDER BY n_exact DESC, t LIMIT 20),
       |probes AS (
       |  SELECT e.t, e.n_exact, r.j,
       |    ${Hll.h60Sql("'cms' || CAST(r.j AS VARCHAR) || ':' || e.t")}
       |      % $CmsWidth AS bucket
       |  FROM exact e CROSS JOIN range($CmsDepth) AS r(j))
       |SELECT p.t, p.n_exact, min(c.c) AS n_cms,
       |  min(c.c) - p.n_exact AS overest
       |FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
       |GROUP BY 1, 2""".stripMargin
  }

  // --------------------------------------------------------------------
  // Histogram quantile sketch: mergeable medians.
  // --------------------------------------------------------------------

  /** Mergeable quantile sketch panel: per-source medians of document
    * length from a log2-bucket HISTOGRAM (the sketch — ~40 counters
    * per source, mergeable by ADDITION like the CMS, so per-shard /
    * per-day histograms roll up without re-reading anything), next to
    * the exact median as ground truth. The `__all__` row is derived
    * purely by summing the per-source histograms — never re-scanning —
    * the same mergeability demonstration as [[hllMergeBySource]].
    *
    * The sketch's answer is the BUCKET holding the median (lower
    * median, rank (n+1) div 2): [bucket_lo, bucket_hi] brackets the
    * true value with relative error <= 2x by construction — the spec
    * asserts exact_p50 lands inside on every row. An exact distributed
    * median needs a per-group sort (fine at panel scale, the ground
    * truth here; [[graft.ops.Relational]]'s exact-quantile op is that
    * path) — at 100 TB the histogram is the shape that survives: one
    * map-side pass, answer-sized state, closed under merge.
    */
  def quantileSketch(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = d.select(col("source"),
      when(col("n_chars") === 0, lit(0L))
        .otherwise(length(bin(col("n_chars"))).cast("bigint")).as("b"),
      col("n_chars"))
    val hist = bucketed.groupBy("source", "b").agg(count(lit(1)).as("c"))
      .barrier() // feeds the per-source panel AND the merge
    val all = hist.groupBy("b").agg(sum("c").as("c"))
      .select(lit("__all__").as("source"), col("b"), col("c"))
    val wc = Window.partitionBy("source").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy("source")
    val cum = hist.unionByName(all)
      .withColumn("cum", sum("c").over(wc))
      .withColumn("n_docs", sum("c").over(wn))
    val picked = cum.filter(col("cum") >= expr("(n_docs + 1) DIV 2"))
      .groupBy("source", "n_docs").agg(min("b").as("p50_bucket"))
    val vals = d.select(col("source"), col("n_chars"))
      .unionByName(d.select(lit("__all__").as("source"), col("n_chars")))
    val wv = Window.partitionBy("source").orderBy("n_chars")
    val exact = vals
      .withColumn("rn", row_number().over(wv))
      .withColumn("n", count(lit(1)).over(wn))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("source"), col("n_chars").as("exact_p50"))
    picked.join(exact, Seq("source"))
      .select(col("source"), col("n_docs"), col("p50_bucket"),
        when(col("p50_bucket") === 0, lit(0L))
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(p50_bucket - 1 AS INT))"))
          .as("bucket_lo"),
        when(col("p50_bucket") === 0, lit(0L))
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(p50_bucket AS INT))") - 1)
          .as("bucket_hi"),
        col("exact_p50"))
  }

  val quantileSketchSql: String =
    """WITH bucketed AS (
      |  SELECT source,
      |    CAST(CASE WHEN n_chars = 0 THEN 0
      |         ELSE length(bin(n_chars)) END AS BIGINT) AS b,
      |    n_chars
      |  FROM documents),
      |hist AS (
      |  SELECT source, b, count(*) AS c FROM bucketed GROUP BY 1, 2
      |  UNION ALL
      |  SELECT '__all__' AS source, b, count(*) AS c FROM bucketed
      |  GROUP BY 2),
      |cum AS (
      |  SELECT source, b, c,
      |    sum(c) OVER (PARTITION BY source ORDER BY b
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(c) OVER (PARTITION BY source) AS n_docs
      |  FROM hist),
      |picked AS (
      |  SELECT source, n_docs, min(b) AS p50_bucket
      |  FROM cum WHERE cum >= (n_docs + 1) // 2 GROUP BY 1, 2),
      |vals AS (
      |  SELECT source, n_chars FROM documents
      |  UNION ALL
      |  SELECT '__all__' AS source, n_chars FROM documents),
      |ex AS (
      |  SELECT source, n_chars AS exact_p50 FROM (
      |    SELECT source, n_chars,
      |      row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
      |      count(*) OVER (PARTITION BY source) AS n
      |    FROM vals)
      |  WHERE rn = (n + 1) // 2)
      |SELECT p.source, CAST(p.n_docs AS BIGINT) AS n_docs, p.p50_bucket,
      |  CAST(CASE WHEN p.p50_bucket = 0 THEN 0
      |       ELSE 1::BIGINT << (p.p50_bucket - 1) END AS BIGINT) AS bucket_lo,
      |  CAST(CASE WHEN p.p50_bucket = 0 THEN 0
      |       ELSE (1::BIGINT << p.p50_bucket) - 1 END AS BIGINT) AS bucket_hi,
      |  ex.exact_p50
      |FROM picked p JOIN ex ON p.source = ex.source""".stripMargin

  // --------------------------------------------------------------------
  // KMV sketch: mergeable distinct counts WITH set operations.
  // --------------------------------------------------------------------

  /** KMV sketch size and hash universe. k = 64 keeps the sketch at
    * 512 bytes per source; the universe is the top 40 bits of the
    * md5-family 60-bit hash (2^40 — wide enough that collisions over
    * corpus-scale shingle sets are negligible, narrow enough that
    * (k-1) * UNIVERSE stays far from bigint overflow in BOTH engines,
    * which 2^60 would not).
    */
  val KmvK = 64
  val KmvM = 1099511627776L // 2^40

  /** KMV (k-minimum-values / theta-sketch) cross-source overlap panel:
    * per source, the 64 smallest hashed distinct 3-gram shingles; per
    * source PAIR, the union / intersection / Jaccard ESTIMATES those
    * two sketches yield under the shared threshold
    * theta = min(theta_a, theta_b), next to the exact intersection as
    * ground truth. Every estimator is integer-exact (Beyer et al.
    * 2007: distinct ~= (k-1) * U DIV kth-min; below-theta sketch
    * elements are a uniform sample of the union, so
    * jaccard ~= |both| DIV |either|).
    *
    * This is the capability [[hllMergeBySource]] cannot provide: HLL
    * registers merge to a UNION estimate only, while KMV sketches
    * support intersections — "how much does source A's content overlap
    * B's" answered from 512 bytes per source, no re-scan. A source
    * whose shingle set is smaller than k is carried exactly
    * (theta = U, estimate = count).
    *
    * Scale: one corpus scan builds all sketches (hash-partitioned
    * min-k per source); everything downstream — the pair grid, the
    * sect/union joins, the estimates — touches only k x sources rows.
    * The EXACT intersection column is the panel's ground truth and the
    * cost the sketch deletes at 100 TB: it joins the full per-source
    * shingle sets (fine at panel scale, linear-shuffle in the corpus
    * otherwise); a production pipeline keeps the sketches and drops
    * that column.
    */
  /** Heaps'-law vocabulary-growth panel: distinct-type count as a
    * function of corpus prefix (docs bucketed into 10 equal doc-id
    * ranges), the V(n) ~ K·n^β curve a tokenizer-training or
    * vocab-sizing pass reads — a flattening tail says more data stops
    * buying vocabulary; a straight log-log line says the corpus keeps
    * introducing novelty (or boilerplate churn). Spelled for
    * distribution: a running per-doc distinct is a sequential scan,
    * but "which bucket did each type FIRST appear in" is one min
    * aggregation over the type table, and the cumulative curve is a
    * ≤10-bucket triangular join — nothing orders the corpus globally.
    *
    * Scale: one vocabulary-sized min aggregation (map-side
    * combinable) + bucket-sized (≤10-row) rollups and a structurally
    * capped triangular join. No windows, no global sort.
    */
  def heapsGrowth(d: DataFrame, nBuckets: Int = 10): DataFrame = {
    val occ = d.select(col("doc_id"),
      explode(TextOps.letterTokens(col("text"))).as("tok"))
    val span = d.agg(min("doc_id").as("dmin"), max("doc_id").as("dmax"))
    val occB = occ.crossJoin(broadcast(span))
      .select(expr(s"(doc_id - dmin) * $nBuckets DIV (dmax - dmin + 1)")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val docsB = d.crossJoin(broadcast(span))
      .select(expr(s"(doc_id - dmin) * $nBuckets DIV (dmax - dmin + 1)")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
    val newTypes = occ.groupBy("tok").agg(min("doc_id").as("first_doc"))
      .crossJoin(broadcast(span))
      .select(expr(s"(first_doc - dmin) * $nBuckets DIV (dmax - dmin + 1)")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    // per-bucket table is ≤ nBuckets rows; the limit never binds but
    // makes the triangular join's broadcast side provably tiny
    val per = docsB.join(occB, "bucket").join(newTypes, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .orderBy("bucket").limit(nBuckets + 6)
    per.as("a").join(per.as("b"), col("b.bucket") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(max(col("a.n_docs")).as("n_docs"),
        max(col("a.n_tokens")).as("n_tokens"),
        max(col("a.new_types")).as("new_types"),
        sum(col("b.n_tokens")).as("cum_tokens"),
        sum(col("b.new_types")).as("cum_types"))
  }

  def heapsGrowthSql(nBuckets: Int = 10): String =
    s"""WITH occ AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '')) AS tok
       |  FROM documents),
       |span AS (
       |  SELECT min(doc_id) AS dmin, max(doc_id) AS dmax FROM documents),
       |occb AS (
       |  SELECT (doc_id - dmin) * $nBuckets // (dmax - dmin + 1) AS bucket,
       |    count(*) AS n_tokens
       |  FROM occ CROSS JOIN span GROUP BY 1),
       |docsb AS (
       |  SELECT (doc_id - dmin) * $nBuckets // (dmax - dmin + 1) AS bucket,
       |    count(*) AS n_docs
       |  FROM documents CROSS JOIN span GROUP BY 1),
       |types AS (
       |  SELECT tok, min(doc_id) AS first_doc FROM occ GROUP BY tok),
       |newt AS (
       |  SELECT (first_doc - dmin) * $nBuckets // (dmax - dmin + 1) AS bucket,
       |    count(*) AS new_types
       |  FROM types CROSS JOIN span GROUP BY 1),
       |per AS (
       |  SELECT d.bucket, d.n_docs, o.n_tokens,
       |    coalesce(n.new_types, 0) AS new_types
       |  FROM docsb d JOIN occb o USING (bucket)
       |  LEFT JOIN newt n USING (bucket))
       |SELECT CAST(a.bucket AS BIGINT) AS bucket,
       |  CAST(max(a.n_docs) AS BIGINT) AS n_docs,
       |  CAST(max(a.n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(max(a.new_types) AS BIGINT) AS new_types,
       |  CAST(sum(b.n_tokens) AS BIGINT) AS cum_tokens,
       |  CAST(sum(b.new_types) AS BIGINT) AS cum_types
       |FROM per a JOIN per b ON b.bucket <= a.bucket
       |GROUP BY a.bucket""".stripMargin

  /** Bloom-filter false-positive calibration panel — the
    * measured-vs-theory row for the family's remaining sketch: build a
    * DETERMINISTIC Bloom filter (m = 2¹⁷ bits, k = 4 h60-derived hash
    * functions — not Spark's built-in, whose seeds an oracle cannot
    * replay) over the even-doc shingle universe, probe it with the
    * odd-doc shingles that are TRUE negatives (anti-joined on the real
    * universe), and report observed vs theoretical FPR side by side —
    * the panel that says whether m/k fit a reference set BEFORE a
    * decontamination pass ships with a filter that passes everything.
    * Theory is the standard fill-rate bound (bits_set/m)^k in exact
    * integers: fill_e3⁴ DIV 10⁶ ≤ 10⁶.
    *
    * Scale: the bit table is ≤ m rows (answer-sized, broadcastable);
    * universe/probe distincts are vocabulary-sized hash aggregates
    * (map-side combinable); position generation is map-only. The
    * one-sided-error contract (a true member can never probe
    * negative) is what makes the observed count pure FPR.
    */
  def bloomCalibration(
      d: DataFrame, mBits: Int = 131072, k: Int = 4): DataFrame = {
    import graft.ops.Hll
    // materialize the token arrays BEFORE the per-position shingle
    // lambda: projection collapse otherwise inlines the whitespace
    // split into every element_at, re-splitting the doc once per
    // 3-gram — O(doc²) per doc, the composed-spelling trap the kmv
    // kernel fix documented (measured here: 31.5 s at sf0.1 collapsed
    // vs ~3 s materialized)
    val tk = d.select(col("doc_id"), TextOps.wsTokens(col("text")).as("toks"))
      .barrier()
    val toks = col("toks")
    val sset = when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(array(coalesce(array_join(toks, " "), lit(""))))
    val sh = tk.select(col("doc_id"), sset.as("sset"))
    val train = sh.filter(col("doc_id") % 2 === 0)
      .select(explode(col("sset")).as("g")).distinct().barrier()
    val probeNeg = sh.filter(col("doc_id") % 2 =!= 0)
      .select(explode(col("sset")).as("g")).distinct()
      .join(train, Seq("g"), "left_anti").barrier()
    def posArr = array((0 until k).map(j =>
      struct(lit(j).as("j"),
        pmod(Hll.h60(concat(lit(s"bf$j:"), col("g"))), lit(mBits.toLong))
          .as("pos"))): _*)
    val bits = train.select(explode(posArr).as("x"))
      .select(col("x.pos").as("pos")).distinct().barrier()
    val fp = probeNeg.select(col("g"), explode(posArr).as("x"))
      .select(col("g"), col("x.j").as("j"), col("x.pos").as("pos"))
      .join(bits, "pos")
      .groupBy("g").agg(countDistinct("j").as("kh"))
      .filter(col("kh") === k)
      .agg(count(lit(1)).as("n_fp"))
    train.agg(count(lit(1)).as("n_train_items"))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
      .crossJoin(broadcast(probeNeg.agg(count(lit(1)).as("n_probe_neg"))))
      .crossJoin(broadcast(fp))
      .select(col("n_train_items"), col("n_bits_set"), col("n_probe_neg"),
        col("n_fp"),
        expr(s"1000000 * n_fp DIV nullif(n_probe_neg, 0)")
          .as("fpr_x1e6"),
        // fill_e3^k DIV 10^(3k-6) == 1e6 * (bits/m)^k, exact integers
        expr(Seq.fill(k)(s"(1000 * n_bits_set DIV $mBits)")
          .mkString("(", " * ", ")") +
          s" DIV ${math.pow(10, 3 * k - 6).toLong}")
          .as("theory_fpr_x1e6"))
  }

  def bloomCalibrationSql(mBits: Int = 131072, k: Int = 4): String = {
    val h = graft.ops.Hll.h60Sql("'bf' || CAST(j AS VARCHAR) || ':' || g")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), x -> x <> '')
       |      AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) >= 3 THEN
       |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
       |        i -> array_to_string(toks[i:i + 2], ' ')))
       |    ELSE [coalesce(array_to_string(toks, ' '), '')] END AS sset
       |  FROM t),
       |train AS (
       |  SELECT DISTINCT unnest(sset) AS g FROM sh WHERE doc_id % 2 = 0),
       |probe_neg AS (
       |  SELECT g FROM (
       |    SELECT DISTINCT unnest(sset) AS g FROM sh WHERE doc_id % 2 <> 0)
       |  WHERE g NOT IN (SELECT g FROM train)),
       |ks AS (SELECT unnest(range($k)) AS j),
       |bits AS (
       |  SELECT DISTINCT ($h) % $mBits AS pos FROM train CROSS JOIN ks),
       |fp AS (
       |  SELECT count(*) AS n_fp FROM (
       |    SELECT p.g FROM probe_neg p CROSS JOIN ks
       |    JOIN bits b ON ($h) % $mBits = b.pos
       |    GROUP BY p.g HAVING count(DISTINCT j) = $k)),
       |stats AS (
       |  SELECT (SELECT count(*) FROM train) AS n_train_items,
       |    (SELECT count(*) FROM bits) AS n_bits_set,
       |    (SELECT count(*) FROM probe_neg) AS n_probe_neg,
       |    (SELECT n_fp FROM fp) AS n_fp)
       |SELECT CAST(n_train_items AS BIGINT) AS n_train_items,
       |  CAST(n_bits_set AS BIGINT) AS n_bits_set,
       |  CAST(n_probe_neg AS BIGINT) AS n_probe_neg,
       |  CAST(n_fp AS BIGINT) AS n_fp,
       |  CAST(1000000 * n_fp // nullif(n_probe_neg, 0) AS BIGINT)
       |    AS fpr_x1e6,
       |  CAST((1000 * n_bits_set // $mBits) * (1000 * n_bits_set // $mBits)
       |    * (1000 * n_bits_set // $mBits) * (1000 * n_bits_set // $mBits)
       |    // 1000000 AS BIGINT) AS theory_fpr_x1e6
       |FROM stats""".stripMargin
  }

  def kmvOverlap(d: DataFrame, k: Int = KmvK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // gram digests via the fused kernel (one tokenize + one md5 per
    // gram, straight from token byte spans) — the composed
    // string-building spelling re-ran the whitespace split inside the
    // per-gram lambda, O(doc^2) per doc: 11 s warm at sf0.1 vs ~1 s
    // with the kernel, the same lesson as the winnowing HOF fix. The
    // kernel hashes a short doc (< 3 tokens) as one whole-text gram,
    // so those docs are filtered first to keep "no 3-grams" semantics.
    val grams = d
      .filter(size(TextOps.wsTokens(col("text"))) >= 3)
      .select(col("source"),
        explode(graft.functions.text.winnow_grams_md5(col("text"), 3))
          .as("h60"))
      .select(col("source"), shiftright(col("h60"), 20).as("h"))
      .distinct()
      .barrier() // feeds sketches, exact counts, and exact inter
    val w = Window.partitionBy("source").orderBy("h")
    val sk = grams.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn").barrier()
    val stats = sk.groupBy("source")
      .agg(count(lit(1)).as("n_sk"), max("h").as("mx"))
      .join(grams.groupBy("source").agg(count(lit(1)).as("n_exact")),
        "source")
      .select(col("source"), col("n_exact"),
        when(col("n_sk") < k, lit(KmvM)).otherwise(col("mx")).as("th"))
    // The source-pair cross join is quadratic in |sources| BY DESIGN
    // (it is a per-source-pair panel); sources are a bounded registry,
    // not data-scale. Make that bound STRUCTURAL with a deterministic
    // top-1024-by-name cap so the plan audit can prove the
    // BroadcastNestedLoop build side is ≤1024 rows — identical
    // semantics for any real registry, and a corpus that somehow
    // carries more sources than that needs a different query shape
    // anyway (the pairwise output would be >500k panel rows).
    val statsCapped = stats.orderBy("source").limit(1024)
    val pairs = statsCapped.as("a").crossJoin(broadcast(statsCapped.as("b")))
      .filter(col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.n_exact").as("n_a"), col("b.n_exact").as("n_b"),
        least(col("a.th"), col("b.th")).as("theta"))
    val skA = sk.select(col("source").as("source_a"), col("h"))
    val skB = sk.select(col("source").as("source_b"), col("h"))
    val sect = pairs.join(skA, "source_a").join(skB, Seq("source_b", "h"))
      .filter(col("h") < col("theta"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_sect"))
    val uni = pairs.select("source_a", "source_b", "theta")
      .join(skA, "source_a")
      .unionByName(pairs.select("source_a", "source_b", "theta")
        .join(skB, "source_b").select("source_a", "source_b", "theta", "h"))
      .filter(col("h") < col("theta"))
      .select("source_a", "source_b", "h").distinct()
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_uni"))
    val exact = grams.as("x").join(grams.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter_exact"))
    pairs
      .join(uni, Seq("source_a", "source_b"), "left")
      .join(sect, Seq("source_a", "source_b"), "left")
      .join(exact, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        coalesce(col("n_sect"), lit(0L)).as("n_sect"),
        col("theta"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_inter_exact"),
        when(col("theta") === KmvM, col("n_uni"))
          .otherwise(expr(s"(n_uni - 1) * ${KmvM}L DIV theta"))
          .as("est_union"),
        expr("n_sect * 10000 DIV greatest(n_uni, 1)").as("est_jacc_x10000"))
      .withColumn("est_inter",
        when(col("est_jacc_x10000") === 0, lit(0L))
          .otherwise(expr("est_union * est_jacc_x10000 DIV 10000")))
  }

  val kmvOverlapSql: String = {
    import graft.ops.Hll
    s"""WITH t AS (
       |  SELECT source, list_filter(regexp_split_to_array(text,
       |    '[ \\t-\\r]+'), x -> x <> '') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT source,
       |    ${Hll.h60Sql("array_to_string(gr, ' ')")} // 1048576 AS h
       |  FROM (
       |    SELECT source, toks[i:i + 2] AS gr
       |    FROM t, LATERAL (SELECT unnest(generate_series(1,
       |      len(toks) - 2)) AS i)
       |    WHERE len(toks) >= 3)),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM g)
       |  WHERE rn <= $KmvK),
       |stats AS (
       |  SELECT s.source, e.n_exact,
       |    CASE WHEN s.n_sk < $KmvK THEN $KmvM ELSE s.mx END AS th
       |  FROM (SELECT source, count(*) AS n_sk, max(h) AS mx FROM sk
       |        GROUP BY 1) s
       |  JOIN (SELECT source, count(*) AS n_exact FROM g GROUP BY 1) e
       |    USING (source)),
       |pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    a.n_exact AS n_a, b.n_exact AS n_b,
       |    least(a.th, b.th) AS theta
       |  FROM stats a JOIN stats b ON a.source < b.source),
       |sect AS (
       |  SELECT p.source_a, p.source_b, count(*) AS n_sect
       |  FROM pairs p
       |  JOIN sk x ON x.source = p.source_a
       |  JOIN sk y ON y.source = p.source_b AND y.h = x.h
       |  WHERE x.h < p.theta
       |  GROUP BY 1, 2),
       |uni AS (
       |  SELECT source_a, source_b, count(*) AS n_uni FROM (
       |    SELECT DISTINCT p.source_a, p.source_b, s.h
       |    FROM pairs p JOIN sk s
       |      ON s.source = p.source_a OR s.source = p.source_b
       |    WHERE s.h < p.theta)
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT x.source AS source_a, y.source AS source_b,
       |    count(*) AS n_inter_exact
       |  FROM g x JOIN g y ON x.h = y.h AND x.source < y.source
       |  GROUP BY 1, 2),
       |base AS (
       |  SELECT p.source_a, p.source_b, p.n_a, p.n_b,
       |    coalesce(e.n_inter_exact, 0) AS n_inter_exact,
       |    coalesce(u.n_uni, 0) AS n_uni,
       |    coalesce(s.n_sect, 0) AS n_sect, p.theta
       |  FROM pairs p
       |  LEFT JOIN uni u USING (source_a, source_b)
       |  LEFT JOIN sect s USING (source_a, source_b)
       |  LEFT JOIN exact e USING (source_a, source_b))
       |SELECT source_a, source_b, CAST(n_a AS BIGINT) AS n_a,
       |  CAST(n_b AS BIGINT) AS n_b,
       |  CAST(n_inter_exact AS BIGINT) AS n_inter_exact,
       |  CAST(CASE WHEN theta = $KmvM THEN n_uni
       |       ELSE (n_uni - 1) * $KmvM // theta END AS BIGINT) AS est_union,
       |  CAST(n_sect * 10000 // greatest(n_uni, 1) AS BIGINT)
       |    AS est_jacc_x10000,
       |  CAST(CASE WHEN n_sect * 10000 // greatest(n_uni, 1) = 0 THEN 0
       |       ELSE (CASE WHEN theta = $KmvM THEN n_uni
       |             ELSE (n_uni - 1) * $KmvM // theta END)
       |         * (n_sect * 10000 // greatest(n_uni, 1)) // 10000
       |       END AS BIGINT) AS est_inter
       |FROM base""".stripMargin
  }

  // --------------------------------------------------------------------
  // Topic clustering: KMeans over hashed term-frequency vectors.
  // --------------------------------------------------------------------

  val TopicDims = 32
  val TopicK = 8
  val TopicIters = 2

  /** Hashing-trick bucket of a token (same md5-hex-char device as the
    * fastText-shaped classifier in [[TextOps.classifierScore]]).
    */
  private def topicBucket(t: Column): Column = {
    val h = md5(t.cast("binary"))
    pmod(ascii(substring(h, 1, 1)) * 131 + ascii(substring(h, 2, 1)),
      lit(TopicDims)).cast("bigint")
  }

  /** (doc_id, v) — a dense TopicDims-long integer vector per doc with
    * at least one letter token: v[b] = permyriad of the doc's tokens
    * hashing to bucket b (length-normalized so short and long docs
    * cluster by CONTENT SHAPE, not size; integer floor keeps both
    * engines bit-identical — numerators stay far below 2^53, so
    * Spark's floor(double division) equals DuckDB's integer `//`).
    *
    * Spelled explode -> (doc, bucket) count -> dense array via map
    * lookup, NOT a filter-per-bucket HOF over the token array (which
    * would re-evaluate the md5 TopicDims times per token — the
    * winnowing O(n^2) lesson).
    */
  private[graft] def topicFeatures(d: DataFrame): DataFrame = {
    val toks = TextOps.letterTokens(lower(col("text")))
    val bucketed = d.select(col("doc_id"), explode(toks).as("t"))
      .select(col("doc_id"), topicBucket(col("t")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    bucketed.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
        .as("m"), sum("c").as("nt"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(TopicDims - 1L)), i =>
          floor(coalesce(element_at(col("m"), i), lit(0L)) * lit(10000L) /
            col("nt")).cast("long")).as("v"))
  }

  /** EXACT integer Lloyd over the topic vectors — seeds are the TopicK
    * lowest doc_ids, TopicIters rounds of assign + per-dim rounded
    * mean (the [[Similarity]] codebook discipline: the collect is the
    * CODEBOOK, k x dims longs, never the data). Assignment reuses the
    * [[graft.functions.IvfProbesInt8]] kernel — argmin of
    * |m|^2 - 2 x.m is argmin of squared distance, ties by cell id.
    */
  private[graft] def topicCentroids(feats: DataFrame): Array[Array[Long]] = {
    def longs(r: org.apache.spark.sql.Row): Array[Long] =
      r.getAs[scala.collection.Seq[Long]]("v").toArray
    var cents: Array[Array[Long]] =
      feats.orderBy("doc_id").limit(TopicK).collect().map(longs)
    for (_ <- 0 until TopicIters) {
      val means = feats
        .withColumn("cell", element_at(
          graft.functions.vector.ivf_probes_int8(
            col("v"), cents.map(_.toSeq).toSeq, 1), 1))
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map { r =>
            java.math.BigDecimal.valueOf(r.getLong(2).toDouble / r.getLong(3))
              .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
          }
        }
      cents = cents.indices.map(i => means.getOrElse(i, cents(i))).toArray
    }
    cents
  }

  /** Topic clustering panel: every document assigned to one of TopicK
    * KMeans clusters over its hashed term-frequency shape, with the
    * exact squared distance to its centroid — the unsupervised "what
    * kinds of text are in this corpus" data-card panel (and the
    * de-facto diversity sampler: cap per-cluster doc counts to rebalance
    * a scrape dominated by one template). Docs with no letter tokens
    * get cluster -1.
    *
    * Scale: feature build is one explode + two doc-keyed aggregates;
    * training touches only per-(cell, dim) sums (a TopicK x TopicDims
    * collect per round — the codebook, not the corpus); final assign is
    * map-only via the codegen kernel. Nothing pair- or vocab-sized.
    * The DuckDB oracle replays the ENTIRE training in CTEs, so the
    * check covers the quantizer, not just the assignment.
    */
  def topicClusters(d: DataFrame): DataFrame = {
    // two consumers (training + final assign) over a plan that scans
    // the corpus — materialize the doc-sized feature table once
    val feats = topicFeatures(d).barrier()
    val cents = topicCentroids(feats)
    val centLit = array(cents.map(c =>
      array(c.map(x => lit(x)): _*)): _*)
    val assigned = feats
      .withColumn("cluster", element_at(
        graft.functions.vector.ivf_probes_int8(
          col("v"), cents.map(_.toSeq).toSeq, 1), 1).cast("bigint"))
      .withColumn("cm", element_at(centLit, (col("cluster") + 1).cast("int")))
      .select(col("doc_id"), col("cluster"),
        aggregate(zip_with(col("v"), col("cm"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("sq_dist"))
    d.select(col("doc_id"))
      .join(assigned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"),
        coalesce(col("sq_dist"), lit(0L)).as("sq_dist"))
  }

  /** The hashed-TF feature CTEs (toks/bc/grid/feats), shared by the
    * topic-clustering and k-center oracles.
    */
  private val topicFeatsCtesSql: String =
    s"""toks AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(lower(text),
       |      '[^\\p{L}]+'), t -> t <> '')) AS t
       |  FROM documents),
       |bc AS (
       |  SELECT doc_id,
       |    (ascii(substr(md5(t), 1, 1)) * 131 +
       |     ascii(substr(md5(t), 2, 1))) % $TopicDims AS b,
       |    count(*) AS c
       |  FROM toks GROUP BY 1, 2),
       |grid AS (
       |  SELECT n.doc_id, n.nt, r.i
       |  FROM (SELECT doc_id, sum(c) AS nt FROM bc GROUP BY 1) n
       |  CROSS JOIN range($TopicDims) AS r(i)),
       |feats AS (
       |  SELECT g.doc_id, list(coalesce(10000 * b.c // g.nt, 0) ORDER BY g.i)
       |    AS v
       |  FROM grid g LEFT JOIN bc b ON b.doc_id = g.doc_id AND b.b = g.i
       |  GROUP BY 1)""".stripMargin

  val topicClustersSql: String = {
    def assign(from: String, cents: String, out: String): String =
      s"""$out AS (
         |  SELECT doc_id, v, cell FROM (
         |    SELECT t.doc_id, t.v, c.cell,
         |      row_number() OVER (PARTITION BY t.doc_id ORDER BY
         |        CAST(list_dot_product(c.m, c.m) AS BIGINT)
         |          - 2 * CAST(list_dot_product(t.v, c.m) AS BIGINT), c.cell)
         |        AS rn
         |    FROM $from t CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    def means(prev: String, from: String, out: String): String =
      s"""$out AS (
         |  SELECT s.cell, COALESCE(n.m, s.m) AS m
         |  FROM $prev s LEFT JOIN (
         |    SELECT cell, list(mv ORDER BY pos) AS m
         |    FROM (SELECT cell, pos,
         |            CAST(round(CAST(sum(x) AS DOUBLE) / count(*), 0) AS BIGINT)
         |              AS mv
         |          FROM (SELECT cell, unnest(v) AS x,
         |                  generate_subscripts(v, 1) AS pos FROM $from)
         |          GROUP BY cell, pos)
         |    GROUP BY cell) n ON s.cell = n.cell)""".stripMargin
    val rounds = (1 to TopicIters).map { r =>
      val prev = if (r == 1) "seed" else s"m${r - 1}"
      s"${assign("feats", prev, s"a$r")},\n${means(prev, s"a$r", s"m$r")}"
    }.mkString(",\n")
    s"""WITH $topicFeatsCtesSql,
       |seed AS (
       |  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS cell, v AS m
       |  FROM (SELECT doc_id, v FROM feats ORDER BY doc_id LIMIT $TopicK)),
       |$rounds,
       |${assign("feats", s"m$TopicIters", "cells")}
       |SELECT d.doc_id,
       |  CAST(coalesce(k.cell, -1) AS BIGINT) AS cluster,
       |  CAST(coalesce(
       |    CAST(list_dot_product(k.v, k.v) AS BIGINT)
       |      + CAST(list_dot_product(k.m, k.m) AS BIGINT)
       |      - 2 * CAST(list_dot_product(k.v, k.m) AS BIGINT), 0) AS BIGINT)
       |    AS sq_dist
       |FROM documents d LEFT JOIN (
       |  SELECT a.doc_id, a.cell, a.v, c.m
       |  FROM cells a JOIN m$TopicIters c ON a.cell = c.cell) k
       |  USING (doc_id)""".stripMargin
  }

  /** Greedy k-center diversity sampling (Gonzalez 1985 farthest-point
    * traversal — the coreset-selection recipe): pick `k` documents
    * that maximize the minimum pairwise topic distance, by repeatedly
    * taking the doc FARTHEST from everything chosen so far (exact
    * integer squared distance over the [[topicFeatures]] vectors,
    * ties to the lower doc_id; seed = lowest doc_id). The selection a
    * curation pipeline uses to build a small maximally-diverse eval
    * or annotation set from a corpus one template dominates —
    * the greedy picks are a 2-approximation of the optimal k-center
    * cover.
    *
    * Scale: k-1 rounds, each ONE map-only pass over the doc-sized
    * feature table (min-distance to a k-sized literal center list)
    * plus a top-1 TakeOrdered — no shuffle larger than one row;
    * driver state is the k x dims center list (codebook discipline).
    * The oracle unrolls the identical rounds as CTEs.
    */
  def kCenterSample(d: DataFrame, k: Int = 5): DataFrame = {
    val spark = d.sparkSession
    val feats = topicFeatures(d).barrier()
    def distTo(c: Array[Long]): Column = {
      val cl = array(c.map(x => lit(x)): _*)
      aggregate(zip_with(col("v"), cl, (a, b) => (a - b) * (a - b)),
        lit(0L), (s, x) => s + x)
    }
    val seed = feats.orderBy("doc_id").limit(1).collect()(0)
    var cents = List(seed.getAs[scala.collection.Seq[Long]]("v").toArray)
    var chosen = List((1L, seed.getLong(0), 0L))
    for (r <- 2 to k) {
      val dmin = cents.map(distTo).reduce(least(_, _))
      val picked = feats
        .filter(!col("doc_id").isin(chosen.map(_._2): _*))
        .select(col("doc_id"), col("v"), dmin.as("dm"))
        .orderBy(col("dm").desc, col("doc_id")).limit(1).collect()(0)
      cents :+= picked.getAs[scala.collection.Seq[Long]]("v").toArray
      chosen :+= ((r.toLong, picked.getLong(0), picked.getLong(2)))
    }
    import spark.implicits._
    chosen.toDF("sel", "doc_id", "gain")
  }

  def kCenterSampleSql(k: Int = 5): String = {
    val dist = "CAST(list_dot_product(f.v, f.v) AS BIGINT)" +
      " + CAST(list_dot_product(c.v, c.v) AS BIGINT)" +
      " - 2 * CAST(list_dot_product(f.v, c.v) AS BIGINT)"
    val rounds = (2 to k).map { r =>
      val prev = if (r == 2) "SELECT doc_id, v FROM c1"
      else (1 until r).map(i => s"SELECT doc_id, v FROM c$i")
        .mkString(" UNION ALL ")
      s"""ch$r AS ($prev),
         |d$r AS (
         |  SELECT f.doc_id, min($dist) AS dm
         |  FROM feats f CROSS JOIN ch$r c
         |  WHERE f.doc_id NOT IN (SELECT doc_id FROM ch$r)
         |  GROUP BY 1),
         |c$r AS (
         |  SELECT d.doc_id, f.v, d.dm
         |  FROM d$r d JOIN feats f ON d.doc_id = f.doc_id
         |  ORDER BY d.dm DESC, d.doc_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (s"SELECT CAST(1 AS BIGINT) AS sel, doc_id," +
      " CAST(0 AS BIGINT) AS gain FROM c1") +:
      (2 to k).map(r =>
        s"SELECT CAST($r AS BIGINT) AS sel, doc_id, dm AS gain FROM c$r")
    s"""WITH $topicFeatsCtesSql,
       |c1 AS (SELECT doc_id, v FROM feats ORDER BY doc_id LIMIT 1),
       |$rounds
       |${out.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Per-source Gini coefficient of the term-frequency distribution —
    * the INEQUALITY read beside [[zipfPanel]] (shape) and
    * [[klBySource]] (divergence): how concentrated is each source's
    * token mass in its few head terms? A boilerplate-heavy crawl
    * source shows Gini near 1 (a handful of terms carry everything);
    * a diverse encyclopedic source sits lower. Exact, via the sorted
    * grouped identity G = (2·Σᵢ i·fᵢ − (n+1)·T) / (n·T) with fᵢ the
    * i-th SMALLEST term count — within a tie block every ordering
    * gives the same Σ i·fᵢ (the f values are equal), so the grouped
    * rank-sum m·c + m(m+1)/2 is exact with no tie correction needed.
    * All sums in DECIMAL(38,0) (HUGEINT oracle-side; rank·count
    * products reach vocab²·maxcount); one integer-permille answer.
    *
    * Scale: ranks come from the value-histogram two-level cumsum
    * (per-(source, octave) intra windows + a structurally-capped ≤64
    * octave triangular join per source — the [[graft.ops.EventOps]]
    * Mann-Whitney device), so no single reducer sees a source's
    * vocabulary. One corpus pass for counts; everything after is
    * vocabulary-histogram-sized, the answer one row per source.
    */
  def giniTerms(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = d
      .select(col("source"), explode(TextOps.letterTokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
    val vals = counts.groupBy("source", "cnt").agg(count(lit(1)).as("m"))
      .withColumn("oct", expr("length(bin(cnt))")) // cnt >= 1
    val wIn = Window.partitionBy("source", "oct").orderBy("cnt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = vals.withColumn("c_in", coalesce(sum("m").over(wIn), lit(0L)))
    val octTot = vals.groupBy("source", "oct").agg(sum("m").as("om"))
    val below = octTot.as("a")
      .join(octTot.as("b"),
        col("a.source") === col("b.source") && col("b.oct") < col("a.oct"))
      .groupBy(col("a.source").as("source"), col("a.oct").as("oct"))
      .agg(sum(col("b.om")).as("c_below"))
    val blocks = intra.join(below, Seq("source", "oct"), "left")
      .select(col("source"), col("cnt"), col("m"),
        (coalesce(col("c_below"), lit(0L)) + col("c_in")).as("c"))
    blocks.groupBy("source")
      .agg(sum("m").as("n_terms"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * m")).as("t"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * " +
          "(CAST(m AS DECIMAL(38,0)) * c + " +
          "(CAST(m AS DECIMAL(38,0)) * (m + 1)) DIV 2)")).as("srf"))
      .select(col("source"),
        col("n_terms").cast("bigint").as("n_terms"),
        col("t").cast("bigint").as("total_tokens"),
        expr("CAST((CAST(1000 AS DECIMAL(38,0)) * " +
          "(2 * srf - (n_terms + 1) * t)) DIV " +
          "(CAST(n_terms AS DECIMAL(38,0)) * t) AS BIGINT)")
          .as("gini_permille"))
  }

  val giniTermsSql: String =
    """WITH counts AS (
      |  SELECT source, w, count(*) AS cnt FROM (
      |    SELECT source,
      |      unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |        t -> t <> '')) AS w
      |    FROM documents)
      |  GROUP BY 1, 2),
      |vals AS (
      |  SELECT source, cnt, count(*) AS m FROM counts GROUP BY 1, 2),
      |blocks AS (
      |  SELECT source, cnt, m,
      |    coalesce(sum(m) OVER (PARTITION BY source ORDER BY cnt
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
      |  FROM vals)
      |SELECT source, CAST(sum(m) AS BIGINT) AS n_terms,
      |  CAST(sum(CAST(cnt AS HUGEINT) * m) AS BIGINT) AS total_tokens,
      |  CAST((1000 * (2 * sum(CAST(cnt AS HUGEINT) *
      |      (CAST(m AS HUGEINT) * c + (CAST(m AS HUGEINT) * (m + 1)) // 2))
      |    - (sum(m) + 1) * sum(CAST(cnt AS HUGEINT) * m)))
      |    // (CAST(sum(m) AS HUGEINT) * sum(CAST(cnt AS HUGEINT) * m))
      |    AS BIGINT) AS gini_permille
      |FROM blocks GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // KLL-lite: deterministic level-sampling quantile sketch.
  // --------------------------------------------------------------------

  /** Sample level for a group of `n` items targeting ~`k` survivors:
    * floor(log2(n/k)) (0 when n < k). Monotone in n — the property the
    * merge path below leans on. Integer-exact via length(bin(...)),
    * the [[quantileSketch]] discipline.
    */
  private def kllLevelSql(n: String, k: Int, div: String): String =
    s"CASE WHEN $n >= $k THEN CAST(length(bin($n $div $k)) - 1 AS BIGINT) " +
      s"ELSE CAST(0 AS BIGINT) END"

  /** Scala twin of [[kllLevelSql]] for the streaming state operator. */
  private[graft] def kllLevel(n: Long, k: Int): Long =
    if (n >= k) 63L - java.lang.Long.numberOfLeadingZeros(n / k) else 0L

  /** (source, doc_id, v, tz): doc length plus the trailing-zero count
    * of the doc's 60-bit md5 hash — the sketch's deterministic "coin
    * flips". An item belongs to the level-h sample iff tz >= h, i.e.
    * iff its hash is divisible by 2^h: a 2^-h hash-uniform sample that
    * any shard can compute locally with no coordination and no RNG.
    */
  private[graft] def kllBase(d: DataFrame): DataFrame =
    d.select(col("source"), col("doc_id"),
        col("n_chars").cast("long").as("v"))
      .withColumn("h", graft.ops.Hll.h60(col("doc_id")))
      .withColumn("tz",
        least(lit(60L), expr("CAST(bit_count((h & -h) - 1) AS BIGINT)")))
      .drop("h")

  /** KLL-lite mergeable quantile sketch panel (per source + `__all__`):
    * the sketch family's missing member next to HLL/CMS/KMV/MG/Bloom —
    * a quantile sketch whose "compaction" is a deterministic hash
    * predicate instead of KLL's coin flip, so (a) a CTE oracle replays
    * it exactly and (b) merging is EXACT, not just error-composing.
    *
    * Sketch: a group of n items keeps {x : tz(h60(x)) >= H} with
    * H = floor(log2(n/k)) — expected size in [k, 2k), each survivor
    * standing for weight w = 2^H items. Estimate: the smallest kept
    * value whose weighted rank w·i reaches the lower-median target
    * (n+1) div 2, falling back to the sample max. Rank error: the
    * sampled count below rank r is Binomial(r, 2^-H), so the rank
    * estimate's 3-sigma band is 3·sqrt(target·w), plus w for the
    * sketch's rank resolution — the `err_bound` column; `rank_err` is
    * the measured distance of the target from the returned value's
    * true rank interval (the Bloom-calibration measured-vs-theory
    * convention; the spec asserts measured <= bound on every row).
    *
    * Merge is exact BY CONSTRUCTION: the level predicate is per-item
    * and H is monotone in n, so re-filtering the union of per-source
    * samples at the global level recovers exactly the single-pass
    * global sample — `__all__` here is built ONLY from the per-source
    * samples (never re-scanning), while the DuckDB oracle computes it
    * single-pass from the raw table; the driver's hash compare IS the
    * merged == single-pass proof. [[graft.streaming.DocStreams
    * .kllBySource]] is the continuous-ingestion mirror (same state,
    * same estimator — batch == stream bit-for-bit).
    *
    * At 100 TB: the sketch half is one map-side filter (the per-group
    * count join is group-keyed, answer-sized per key) producing ~2k
    * rows per group; every aggregate after it is sample-sized. The
    * exact-median and true-rank columns are the ground-truth half and
    * pay one per-group sort each — the documented panel convention
    * (the sketch is what ships; the truth column is why you trust it).
    */
  def kllSketch(d: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = kllBase(d)
    val cnt = base.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("lvl", expr(kllLevelSql("n", k, "DIV")))
      .barrier() // group-keyed stats; feeds samples AND __all__
    val allCnt = cnt.agg(sum("n").as("n"))
      .select(col("n"), expr(kllLevelSql("n", k, "DIV")).as("lvl"))
    val sampSrc = base.join(cnt, "source")
      .filter(col("tz") >= col("lvl"))
      .select(col("source"), col("doc_id"), col("v"), col("tz"),
        col("n"), col("lvl"))
      .barrier() // ~2k rows per source; feeds panel AND merge
    val sampAll = sampSrc
      .crossJoin(broadcast(allCnt // 1-row global stat — audited idiom
        .select(col("n").as("n_all"), col("lvl").as("lvl_all"))))
      .filter(col("tz") >= col("lvl_all"))
      .select(lit("__all__").as("source"), col("doc_id"), col("v"),
        col("tz"), col("n_all").as("n"), col("lvl_all").as("lvl"))
    val samples = sampSrc.unionByName(sampAll)
    val wOrd = Window.partitionBy("source").orderBy("v", "doc_id")
    val est = samples
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("wt",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(lvl AS INT))"))
      .groupBy("source", "n", "lvl", "wt")
      .agg(count(lit(1)).as("sketch_size"),
        min(when(col("rn") * col("wt") >= expr("(n + 1) DIV 2"), col("v")))
          .as("picked"),
        max("v").as("vmax"))
      .withColumn("est_p50", coalesce(col("picked"), col("vmax")))
      .drop("picked", "vmax")
    val vals = d.select(col("source"), col("n_chars").cast("long").as("v"))
    val grp = vals.unionByName(
      vals.select(lit("__all__").as("source"), col("v")))
    val wv = Window.partitionBy("source").orderBy("v")
    val wn = Window.partitionBy("source")
    val exact = grp.withColumn("rn", row_number().over(wv))
      .withColumn("nn", count(lit(1)).over(wn))
      .filter(col("rn") === expr("(nn + 1) DIV 2"))
      .select(col("source"), col("v").as("exact_p50"))
    val ranks = grp
      .join(broadcast(est.select(col("source"), col("est_p50"))), "source")
      .groupBy("source")
      .agg(sum(when(col("v") < col("est_p50"), 1L).otherwise(0L))
          .as("cnt_lt"),
        sum(when(col("v") <= col("est_p50"), 1L).otherwise(0L))
          .as("cnt_le"))
    est.join(exact, "source").join(ranks, "source")
      .select(col("source"), col("n").as("n_docs"),
        col("lvl").as("level_h"), col("wt").as("weight"),
        col("sketch_size"), col("est_p50"), col("exact_p50"),
        greatest(lit(0L), col("cnt_lt") + 1L - expr("(n + 1) DIV 2"),
          expr("(n + 1) DIV 2") - col("cnt_le")).as("rank_err"),
        (expr("CAST(ceil(3.0 * sqrt(CAST((n + 1) DIV 2 AS DOUBLE) * wt))" +
          " AS BIGINT)") + col("wt")).as("err_bound"))
  }

  def kllSketchSql(k: Int = 64): String = {
    import graft.ops.Hll
    s"""WITH base AS MATERIALIZED (
       |  SELECT source, doc_id, n_chars AS v,
       |    CAST(least(60, bit_count((h60 & -h60) - 1)) AS BIGINT) AS tz
       |  FROM (SELECT source, doc_id, n_chars,
       |          ${Hll.h60Sql("CAST(doc_id AS VARCHAR)")} AS h60
       |        FROM documents)),
       |grp AS MATERIALIZED (
       |  SELECT source, doc_id, v, tz FROM base
       |  UNION ALL
       |  SELECT '__all__' AS source, doc_id, v, tz FROM base),
       |cnt AS (
       |  SELECT source, count(*) AS n,
       |    ${kllLevelSql("count(*)", k, "//")} AS lvl
       |  FROM grp GROUP BY 1),
       |samp AS (
       |  SELECT g.source, g.doc_id, g.v, c.n, c.lvl,
       |    (CAST(1 AS BIGINT) << c.lvl) AS wt
       |  FROM grp g JOIN cnt c USING (source)
       |  WHERE g.tz >= c.lvl),
       |est AS (
       |  SELECT source, n, lvl, wt, count(*) AS sketch_size,
       |    coalesce(min(CASE WHEN rn * wt >= (n + 1) // 2 THEN v END),
       |      max(v)) AS est_p50
       |  FROM (SELECT *, CAST(row_number() OVER (PARTITION BY source
       |          ORDER BY v, doc_id) AS BIGINT) AS rn
       |        FROM samp)
       |  GROUP BY 1, 2, 3, 4),
       |ex AS (
       |  SELECT source, v AS exact_p50 FROM (
       |    SELECT source, v,
       |      row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
       |      count(*) OVER (PARTITION BY source) AS nn
       |    FROM grp)
       |  WHERE rn = (nn + 1) // 2),
       |rk AS (
       |  SELECT g.source,
       |    CAST(sum(CASE WHEN g.v < e.est_p50 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cnt_lt,
       |    CAST(sum(CASE WHEN g.v <= e.est_p50 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cnt_le
       |  FROM grp g JOIN est e USING (source) GROUP BY 1)
       |SELECT e.source, e.n AS n_docs, e.lvl AS level_h, e.wt AS weight,
       |  CAST(e.sketch_size AS BIGINT) AS sketch_size, e.est_p50,
       |  ex.exact_p50,
       |  greatest(CAST(0 AS BIGINT), rk.cnt_lt + 1 - (e.n + 1) // 2,
       |    (e.n + 1) // 2 - rk.cnt_le) AS rank_err,
       |  CAST(ceil(3.0 * sqrt(CAST((e.n + 1) // 2 AS DOUBLE) * e.wt))
       |    AS BIGINT) + e.wt AS err_bound
       |FROM est e
       |JOIN ex ON e.source = ex.source
       |JOIN rk ON e.source = rk.source""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_kll" -> ((s, d) => kllSketch(docs(s, d))),
    "q_text_gini" -> ((s, d) => giniTerms(docs(s, d))),
    "q_sample_kcenter" -> ((s, d) => kCenterSample(docs(s, d))),
    "q_retrieval_mmr" -> ((s, d) => retrievalMmr(docs(s, d))),
    "q_sketch_kmv" -> ((s, d) => kmvOverlap(docs(s, d))),
    "q_sketch_bloom_calib" -> ((s, d) => bloomCalibration(docs(s, d))),
    "q_text_heaps" -> ((s, d) => heapsGrowth(docs(s, d))),
    "q_retrieval_rrf" -> ((s, d) => retrievalRrf(docs(s, d))),
    "q_retrieval_rm3" -> ((s, d) => retrievalRm3(docs(s, d))),
    "q_retrieval_ndcg" -> ((s, d) => retrievalNdcg(docs(s, d))),
    "q_text_kl" -> ((s, d) => klBySource(docs(s, d))),
    "q_text_burstiness" -> ((s, d) => burstiness(docs(s, d))),
    "q_sketch_quantile" -> ((s, d) => quantileSketch(docs(s, d))),
    "q_text_topics" -> ((s, d) => topicClusters(docs(s, d))),
    "q_sketch_cms" -> ((s, d) => cmsFreqPanel(docs(s, d))),
    "q_retrieval_join" -> ((s, d) => retrievalJoin(docs(s, d))),
    "q_text_diversity" -> ((s, d) => diversityPanel(docs(s, d))),
    "q_text_trigram_lp" -> ((s, d) => trigramBackoff(docs(s, d))),
    "q_text_zipf" -> ((s, d) => zipfPanel(docs(s, d))),
    "q_text_length_hist" -> ((s, d) => lengthHistogram(docs(s, d))),
    "q_source_overlap" -> ((s, d) => crossSourceOverlap(docs(s, d))),
    "q_hll_merge" -> ((s, d) => hllMergeBySource(docs(s, d))),
    "q_text_vocab_coverage" -> ((s, d) => vocabCoverage(docs(s, d))),
    "q_text_freq_terms" -> ((s, d) => freqTerms(docs(s, d))),
    "q_text_bm25" -> ((s, d) => bm25(docs(s, d))),
    "q_text_boilerplate" -> ((s, d) => boilerplate(docs(s, d))),
    "q_text_unigram_lp" -> ((s, d) => unigramLogProb(docs(s, d))),
    "q_text_bigram_lp" -> ((s, d) => bigramLogProb(docs(s, d))),
    "q_text_pmi" -> ((s, d) => pmiCollocations(docs(s, d))),
    "q_text_ccnet_buckets" -> ((s, d) => ccnetBuckets(docs(s, d))),
    "q_mix_domains" -> ((s, d) => mixDomains(docs(s, d))),
    "q_corpus_summary" -> ((s, d) => corpusSummary(docs(s, d))))

  def oracleSql: Map[String, String] = Map(
    "q_sketch_kll" -> kllSketchSql(),
    "q_text_gini" -> giniTermsSql,
    "q_sample_kcenter" -> kCenterSampleSql(),
    "q_retrieval_mmr" -> retrievalMmrSql(),
    "q_sketch_kmv" -> kmvOverlapSql,
    "q_sketch_bloom_calib" -> bloomCalibrationSql(),
    "q_text_heaps" -> heapsGrowthSql(),
    "q_retrieval_rrf" -> retrievalRrfSql(),
    "q_retrieval_rm3" -> retrievalRm3Sql(),
    "q_retrieval_ndcg" -> retrievalNdcgSql(),
    "q_text_kl" -> klBySourceSql,
    "q_text_burstiness" -> burstinessSql,
    "q_sketch_quantile" -> quantileSketchSql,
    "q_text_topics" -> topicClustersSql,
    "q_sketch_cms" -> cmsFreqPanelSql,
    "q_retrieval_join" -> retrievalJoinSql(),
    "q_text_diversity" -> diversityPanelSql,
    "q_text_trigram_lp" -> trigramBackoffSql,
    "q_text_zipf" -> zipfPanelSql,
    "q_text_length_hist" -> lengthHistogramSql,
    "q_source_overlap" -> crossSourceOverlapSql,
    "q_hll_merge" -> hllMergeBySourceSql,
    "q_text_vocab_coverage" -> vocabCoverageSql,
    "q_text_freq_terms" -> freqTermsSql,
    "q_text_bm25" -> bm25Sql,
    "q_text_boilerplate" -> boilerplateSql,
    "q_text_unigram_lp" -> unigramLogProbSql,
    "q_text_bigram_lp" -> bigramLogProbSql,
    "q_text_pmi" -> pmiCollocationsSql,
    "q_text_ccnet_buckets" -> ccnetBucketsSql,
    "q_mix_domains" -> mixDomainsSql,
    "q_corpus_summary" -> corpusSummarySql)
}
