package graft

import graft.core.Tables
import graft.llm.{CorpusOps, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ground truth for [[graft.llm.CorpusOps]] and the JL projection:
  * the Misra-Gries pass must be EXACT (equal to a brute-force count)
  * regardless of partitioning, BM25 must match a hand-computed score,
  * boilerplate must match closed-form expectations on a constructed
  * corpus, and the JL projection must preserve norms within the
  * Johnson-Lindenstrauss tolerance.
  */
class CorpusOpsSpec extends SparkSpec {

  private def docs: DataFrame = Tables.load(spark, sfDir, "documents")

  private def mkDocs(rows: Seq[(Long, String, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, t, l, s) => Row(i, t, l, s) }, 3),
      schema)
  }

  // ---------------------------------------------------------------- MG

  test("freqTerms equals brute-force exact counts (sf0.001)") {
    val got = CorpusOps.freqTerms(docs, phi = 0.02, capacity = 128)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val toks = docs.select(
      explode(TextOps.letterTokens(col("text"))).as("tok"))
    val n = toks.count()
    val thresh = math.ceil(0.02 * n).toLong
    val want = toks.groupBy("tok").count()
      .filter(col("count") >= thresh)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(want.nonEmpty, "fixture should have frequent terms")
    assert(got === want)
  }

  test("freqTerms exact at the minimal SOUND sketch capacity") {
    // capacity=10 with phi=0.1 is the smallest capacity satisfying the
    // STRICT bound (cap+1)*phi > 1 — the MG survival argument needs
    // strict inequality: at (cap+1)*phi == 1 a term with count exactly
    // ceil(phi*N) can be evicted from every partition sketch.
    // 60 tokens: 'hot' x 12 (20%), 'warm' x 6 (exactly phi*N), rest
    // unique. Letter-only fillers — letterTokens strips digits.
    val filler = (0 until 42)
      .map(i => s"u${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      .mkString(" ")
    val text = (Seq.fill(12)("hot") ++ Seq.fill(6)("warm")).mkString(" ") +
      " " + filler
    val d = mkDocs(Seq((1L, text, "en", "s0")))
    val got = CorpusOps.freqTerms(d, phi = 0.1, capacity = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("hot", 12L), ("warm", 6L)))
    // the zero-slack configuration is unsound and must be rejected
    intercept[IllegalArgumentException] {
      CorpusOps.freqTerms(d, phi = 0.1, capacity = 9)
    }
  }

  test("freqTerms is invariant to INPUT partition count (tree merge)") {
    // The sketch runs over scan partitions (not shuffle partitions),
    // and pass 1 tree-merges them — the exact recount must erase any
    // partitioning dependence of the candidate set.
    val baseline = CorpusOps.freqTerms(docs, phi = 0.02, capacity = 128)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(baseline.nonEmpty)
    Seq(1, 3, 8).foreach { n =>
      val got = CorpusOps.freqTerms(
        docs.repartition(n), phi = 0.02, capacity = 128)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === baseline, s"differs at $n input partitions")
    }
  }

  test("mgMerge keeps capacity and the merged undercount bound") {
    def sketch(items: Seq[String], cap: Int) = {
      val m = new java.util.HashMap[String, Long]()
      items.foreach(CorpusOps.mgAdd(m, _, cap))
      m
    }
    // Two streams whose union makes 'hot' frequent; merge at cap=4.
    val s1 = Seq.fill(10)("hot") ++ (0 until 12).map(i => s"a$i")
    val s2 = Seq.fill(8)("hot") ++ (0 until 12).map(i => s"b$i")
    val a = sketch(s1, 4)
    val b = sketch(s2, 4)
    CorpusOps.mgMerge(a, b, 4)
    assert(a.size <= 4, s"merged sketch exceeded capacity: ${a.size}")
    val n = (s1.size + s2.size).toLong
    // merged-MG undercount < N/(cap+1): any residual is a lower bound
    // within that slack of the true count, and 'hot' (true 18 > N/5)
    // must survive with a positive counter
    assert(a.containsKey("hot"), s"frequent item evicted by merge: $a")
    val trueCounts = (s1 ++ s2).groupBy(identity).view.mapValues(_.size.toLong)
    a.forEach { (k, v) =>
      val t = trueCounts(k)
      assert(v <= t && t - v < n.toDouble / 5,
        s"$k residual $v outside MG bound of true $t")
    }
  }

  // -------------------------------------------------------------- BM25

  test("bm25 matches a hand-computed score on a tiny corpus") {
    val d = mkDocs(Seq(
      (1L, "spark join spark filter", "en", "s0"),
      (2L, "join scan scan scan", "en", "s0"),
      (3L, "filter scan group agg", "en", "s0")))
    // N=3, avgdl=4. 'spark': df=1, tf(1)=2. 'join': df=2, tf(1)=1, tf(2)=1.
    val k1 = 1.2; val b = 0.75
    def idf(df: Double) = math.log(1 + (3 - df + 0.5) / (df + 0.5))
    def s(tf: Double, idfV: Double, dl: Double) =
      idfV * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 4.0))
    val want1 = BigDecimal(s(2, idf(1), 4) + s(1, idf(2), 4))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want2 = BigDecimal(s(1, idf(2), 4))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = CorpusOps.bm25(d, terms = Seq("spark", "join"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, want1, 2L), (2L, want2, 1L)))
  }

  test("bm25 on the corpus: descending, deterministic, bounded") {
    val rows = CorpusOps.bm25(docs).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse, "scores must be descending")
    assert(scores.forall(_ > 0))
  }

  // ------------------------------------------------------- boilerplate

  test("boilerplate flags shared windows, spares unique docs") {
    // 5 docs of source s0 share the identical 5-token page chrome
    // (3 windows each); one unique doc in s0 and one doc in s1 share
    // nothing. minDocs=5 flags exactly the chrome grams.
    val chrome = "home about contact privacy terms"
    // Letter-only unique suffixes — letterTokens strips digits, so
    // "body1"/"body2" would collapse to the same token.
    def sfx(i: Long): String = {
      val c = ('a' + i.toInt).toChar; s"body$c extra$c"
    }
    val d = mkDocs(
      (1L to 5L).map(i => (i, s"$chrome ${sfx(i)}", "en", "s0")) ++
        Seq((6L, "completely unique text here now", "en", "s0"),
          (7L, chrome, "en", "s1")))
    val got = CorpusOps.boilerplate(d, n = 3, minDocs = 5)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // chrome docs: 7 tokens -> 5 windows, 3 of them chrome windows
    (1L to 5L).foreach { i => assert(got(i) === ((5L, 3L, 0.6)), s"doc $i") }
    assert(got(6L) === ((3L, 0L, 0.0)))
    assert(got(7L) === ((3L, 0L, 0.0)), "same grams in another source don't count")
  }

  test("boilerplate handles docs shorter than the window") {
    val d = mkDocs(Seq((1L, "one two", "en", "s0"), (2L, "", "en", "s0")))
    val got = CorpusOps.boilerplate(d, n = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  // -------------------------------------------------------- unigram LM

  test("unigramLogProb matches hand-computed scores") {
    val d = mkDocs(Seq(
      (1L, "aa aa bb", "en", "s0"),
      (2L, "bb cc", "en", "s0")))
    // counts: aa=2, bb=2, cc=1; N=5
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Map(
      1L -> (3L, r4(-math.log(2.0 / 5) * 3 / 3)),
      2L -> (2L, r4((-math.log(2.0 / 5) - math.log(1.0 / 5)) / 2)))
    val got = CorpusOps.unigramLogProb(d)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
  }

  test("charEntropy matches closed forms: uniform = ln(k), constant = 0") {
    val d = mkDocs(Seq(
      (1L, "aaaa", "en", "s0"),   // one symbol -> H = 0
      (2L, "abcd", "en", "s0"),   // uniform over 4 -> H = ln 4
      (3L, "aab", "en", "s0")))   // H = ln 3 - (2 ln 2)/3
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.llm.TextOps.charEntropy(d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) === ((4L, 1L, 0.0)))
    assert(got(2L) === ((4L, 4L, r4(math.log(4)))))
    assert(got(3L) === ((3L, 2L, r4(math.log(3) - 2 * math.log(2) / 3))))
  }

  test("pmiCollocations matches a hand-computed lift") {
    // "x y" x5 alternating: c(x,y)=5, c(y,x)=4, c1(x)=c1(y)=5,
    // N1=10, N2=9; minSupport 5 keeps only (x,y):
    // lift_e3 = 1000*5*10*10 DIV (9*5*5) = 500000 DIV 225 = 2222
    val d = mkDocs(Seq((1L, "x y x y x y x y x y", "en", "s")))
    val got = CorpusOps.pmiCollocations(d, minSupport = 5L).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getString(0), r.getString(1)) === (("x", "y")))
    assert(r.getLong(2) === 5L && r.getLong(3) === 5L && r.getLong(4) === 5L)
    assert(r.getLong(5) === 2222L)
    // an independent pair scores ~1000; a collocation far above it
    assert(r.getLong(5) > 1000L)
  }

  test("bigramLogProb matches hand-computed transition scores") {
    val d = mkDocs(Seq(
      (1L, "aa bb aa cc", "en", "s0"),
      (2L, "aa bb", "en", "s0"),
      (3L, "dd", "en", "s0"))) // single token -> 0 bigrams, score 0
    // bigrams: d1 (aa,bb)(bb,aa)(aa,cc); d2 (aa,bb)
    // c2: (aa,bb)=2 (bb,aa)=1 (aa,cc)=1; starts: aa=3, bb=1
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Map(
      1L -> (3L, r4((-math.log(2.0 / 3) - math.log(1.0) - math.log(1.0 / 3)) / 3)),
      2L -> (1L, r4(-math.log(2.0 / 3))),
      3L -> (0L, 0.0))
    val got = CorpusOps.bigramLogProb(d)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
  }

  test("bigramLogProb is word-order-sensitive where unigram is not") {
    // same bag of words, one doc scrambled against the corpus pattern:
    // unigram scores tie, bigram must separate them
    val d = mkDocs(Seq(
      (1L, "aa bb aa bb aa bb", "en", "s0"),
      (2L, "aa bb aa bb aa bb", "en", "s0"),
      (3L, "bb bb aa aa bb aa", "en", "s0")))
    val uni = CorpusOps.unigramLogProb(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = CorpusOps.bigramLogProb(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) === uni(3L), "bag-of-words score can't see order")
    assert(bi(3L) > bi(1L), s"scrambled doc must score worse: $bi")
  }

  test("unigramLogProb: rare-token docs score higher than typical docs") {
    val scored = CorpusOps.unigramLogProb(docs).collect()
    assert(scored.length === docs.count())
    val scores = scored.map(_.getDouble(2))
    assert(scores.forall(s => s > 0 && !s.isNaN))
  }

  test("ccnetBuckets: 3 buckets per lang, disjoint score ranges, all docs") {
    val rows = CorpusOps.ccnetBuckets(docs).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(4), r.getDouble(5)))).toMap
    val langs = rows.keys.map(_._1).toSet
    assert(langs === Set("en", "zh", "es", "de", "fr"))
    langs.foreach { l =>
      val bs = (1 to 3).map(b => rows((l, b)))
      assert(bs.map(_._1).sum === docs.filter(col("lang") === l).count())
      // tercile sizes differ by at most 1; ranges are ordered
      assert(bs.map(_._1).max - bs.map(_._1).min <= 1)
      assert(bs(0)._3 <= bs(1)._2 + 1e-9 && bs(1)._3 <= bs(2)._2 + 1e-9,
        s"$l bucket score ranges must be ordered: $bs")
    }
  }

  // ------------------------------------------------------- mix domains

  test("mixDomains shares sum to 1 and downsample-only caps hold") {
    val rows = CorpusOps.mixDomains(docs).collect()
    assert(rows.length === 5)
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    rows.foreach { r =>
      val (nTok, w, sampled) = (r.getLong(2), r.getDouble(5), r.getLong(6))
      assert(w > 0)
      assert(sampled <= nTok, "downsample-only pass can't add tokens")
    }
  }

  // ------------------------------------------------------ JL projection

  test("jlProject preserves norms within JL tolerance (sf0.001)") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val k = 16
    val joined = Similarity.jlProject(e, outDim = k)
      .select(col("vec_id"),
        aggregate(col("proj"), lit(0L), (a, x) => a + x * x).as("p2"),
        col("scale_r"))
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .collect()
    val ratios = joined.map { r =>
      val p2 = r.getLong(1).toDouble
      val scale = r.getDouble(2)
      val emb = r.getSeq[Float](3)
      // quantized-int norm the projection actually acts on
      val q2 = emb.map(v => math.round(v / scale).toDouble).map(x => x * x).sum
      p2 / (k * q2)
    }
    // E[||Rq||^2] = k ||q||^2; the mean over 500 vectors concentrates
    // hard, and the median of a chi-square-like ratio sits near 1. A
    // SINGLE vector's ratio is a 16-dim quadratic form and can
    // legitimately land far out in either tail, so no per-vector bound.
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"norm-ratio mean $mean")
    // All vectors share ONE fixed R, so the ratio distribution mirrors
    // the corpus geometry (clustered vectors load the same directions
    // of R); the median is only a non-degeneracy check, not chi-square.
    val median = ratios.sorted.apply(ratios.length / 2)
    assert(median > 0.2 && median < 5.0, s"norm-ratio median $median")
  }

  test("jlProject is deterministic") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val a = Similarity.jlProject(e).collect().map(_.toString).sorted
    val b = Similarity.jlProject(e).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("hll merge row equals the sketch built over the whole corpus") {
    import org.apache.spark.sql.functions._
    // the merge property IS the operator's contract: per-bucket max
    // over per-source registers must reproduce the single-pass sketch
    val merged = graft.llm.CorpusOps.hllMergeBySource(docs)
      .filter(col("source") === "__all__").collect()
    assert(merged.length === 1)
    val direct = graft.llm.CorpusOps.hllMergeBySource(
      docs.withColumn("source", lit("only")))
      .filter(col("source") === "only").collect()
    assert(merged.head.getDouble(1) === direct.head.getDouble(1))
    assert(merged.head.getLong(2) === direct.head.getLong(2))
    // and the estimate lands within HLL error of the true distinct
    val exact = docs.select(countDistinct("text")).head().getLong(0)
    val est = merged.head.getDouble(1)
    assert(math.abs(est - exact) / exact < 0.25,
      s"hll $est vs exact $exact")
  }

  // --------------------------------------------------------------- CMS

  test("CMS cell tables are linear: per-source sketches SUM to global") {
    // linearity is what makes per-shard / per-day sketches combine by
    // addition without re-scanning — the counterpart of HLL's max-merge
    val toks = docs.select(col("source"),
      explode(TextOps.wsTokens(col("text"))).as("t"))
    def cellMap(df: DataFrame): Map[(Int, Long), Long] =
      CorpusOps.cmsCells(df.select("t")).collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val global = cellMap(toks)
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0))
    assert(sources.length >= 2, "fixture should have multiple sources")
    val summed = sources
      .map(s => cellMap(toks.filter(col("source") === s)))
      .flatMap(_.toSeq).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(summed === global)
  }

  test("CMS panel error is one-sided: estimate >= exact on every probe") {
    val rows = CorpusOps.cmsFreqPanel(docs).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L,
        s"${r.getString(0)}: cms ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("quantileSketch bucket brackets the exact median on every row") {
    val rows = CorpusOps.quantileSketch(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, p50) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p50 >= lo && p50 <= hi,
        s"${r.getString(0)}: exact $p50 outside sketch bucket [$lo, $hi]")
    }
    // the merged row covers the whole corpus without a re-scan
    val all = rows.find(_.getString(0) == "__all__").get
    assert(all.getLong(1) === docs.count())
  }

  test("retrievalRrf: consecutive ranks, monotone scores, bounded points") {
    val rows = CorpusOps.retrievalRrf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val lo = 1000000L / 65 // worst single-ranker appearance (rank 5)
    val hi = 2 * (1000000L / 61) // both rankers at rank 1
    rows.foreach { case (_, _, _, rrf, nr) =>
      assert(nr === 1L || nr === 2L)
      assert(rrf >= lo && rrf <= hi, s"rrf $rrf outside [$lo, $hi]")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3) === (1L to byRank.length).toSeq,
        s"query $q ranks not consecutive")
      val scores = byRank.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q fusion score not monotone in rank")
    }
  }

  test("kmvOverlap: full in-memory replay; small-source sketches exact") {
    val rows = docs.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def h40(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) >> 20
    }
    val bySrc: Map[String, Set[Long]] = rows.groupBy(_._1)
      .map { case (s, ds) =>
        s -> ds.flatMap { case (_, t) =>
          val tk = t.split("\\s+").filter(_.nonEmpty)
          if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).toSeq
          else Seq.empty
        }.map(h40).toSet
      }
    val K = CorpusOps.KmvK
    val M = CorpusOps.KmvM
    val sk = bySrc.map { case (s, hs) => s -> hs.toSeq.sorted.take(K) }
    def theta(s: String): Long = if (sk(s).size < K) M else sk(s).max
    val got = CorpusOps.kmvOverlap(docs).collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got.nonEmpty)
    val srcs = bySrc.filter(_._2.nonEmpty).keys.toSeq.sorted
    val expected = (for { a <- srcs; b <- srcs if a < b } yield {
      val th = math.min(theta(a), theta(b))
      val nUni = (sk(a) ++ sk(b)).distinct.count(_ < th).toLong
      val nSect = sk(a).toSet.intersect(sk(b).toSet).count(_ < th).toLong
      val estU = if (th == M) nUni else (nUni - 1) * M / th
      val jac = nSect * 10000 / math.max(nUni, 1)
      val estI = if (jac == 0) 0L else estU * jac / 10000
      (a, b) -> ((bySrc(a).size.toLong, bySrc(b).size.toLong,
        bySrc(a).intersect(bySrc(b)).size.toLong, estU, jac, estI))
    }).toMap
    assert(got === expected)
    // a sketch over fewer than k values IS the set: theta = U and the
    // union estimate equals the true union below theta
    srcs.filter(s => bySrc(s).size < K).take(1).foreach { s =>
      assert(theta(s) === M)
    }
  }

  test("klBySource: non-negative everywhere; zero iff source == blend") {
    // two sources with IDENTICAL token distributions -> KL exactly 0
    val same = mkDocs(Seq(
      (1L, "a a b c", "en", "s0"), (2L, "a a b c", "en", "s1")))
    CorpusOps.klBySource(same).collect().foreach { r =>
      assert(r.getDouble(3) === 0.0, s"${r.getString(0)} KL != 0")
    }
    // real corpus: Gibbs' inequality, and token totals cover the corpus
    val rows = CorpusOps.klBySource(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0,
      s"${r.getString(0)} negative KL ${r.getDouble(3)}"))
    val totalToks = docs
      .select(explode(TextOps.letterTokens(col("text"))).as("t"))
      .count()
    assert(rows.map(_.getLong(1)).sum === totalToks)
  }

  test("retrievalNdcg: in-memory replay of DCG/IDCG; ndcg in (0, 1]") {
    val pool = CorpusOps.retrievalJoin(docs, topK = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val want = pool.groupBy(_._1).map { case (q, rs) =>
      def dcgOf(ranked: Seq[Long]): Double =
        ranked.take(5).zipWithIndex.map { case (rel, i) =>
          ((1L << rel.toInt) - 1).toDouble /
            (math.log(i + 2.0) / math.log(2.0))
        }.sum
      val sys = rs.sortBy(_._3).map(_._4).toSeq
      val ideal = rs.map(_._4).toSeq.sorted.reverse
      (q, dcgOf(sys), dcgOf(ideal))
    }
    val got = CorpusOps.retrievalNdcg(docs).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.nonEmpty)
    want.foreach { case (q, dcg, idcg) =>
      val (nJudged, gDcg, gIdcg, gNdcg) = got(q)
      assert(nJudged > 0L)
      assert(math.abs(gDcg - dcg) < 1e-5, s"query $q dcg $gDcg != $dcg")
      assert(math.abs(gIdcg - idcg) < 1e-5, s"query $q idcg $gIdcg != $idcg")
      assert(math.abs(gNdcg - dcg / idcg) < 1e-5, s"query $q ndcg off")
      assert(gNdcg > 0.0 && gNdcg <= 1.0 + 1e-9, s"query $q ndcg $gNdcg")
      assert(gIdcg + 1e-9 >= gDcg, s"query $q idcg < dcg")
    }
  }

  test("retrievalRm3 bridges the vocabulary mismatch plain BM25 cannot") {
    val spark2 = spark
    import spark2.implicits._
    // query 0 says "car"; doc 2 says only "automobile". Plain BM25
    // can never retrieve 2 for 0 (zero shared terms). RM3's feedback
    // doc 1 says BOTH, so "automobile" (tf 3, the heaviest non-query
    // term) is mined as an expansion term and the second pass finds 2.
    val d = Seq(
      (0L, "car alpha beta gamma delta"), // query (doc_id % 97 == 0)
      (1L, "car alpha beta gamma delta automobile automobile automobile"),
      (2L, "automobile motor engine wheels"),
      (3L, "completely unrelated filler text")).toDF("doc_id", "text")
    val plain = CorpusOps.retrievalJoin(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain.contains((0L, 1L)) && !plain.contains((0L, 2L)),
      s"plain BM25 must hit the bridge doc only: $plain")
    val rm3 = CorpusOps.retrievalRm3(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(rm3.contains((0L, 2L)),
      s"expansion must retrieve the automobile-only doc: $rm3")
    assert(rm3((0L, 2L)) >= 1L,
      "the mismatch doc's hit must be credited to expansion terms")
    assert(rm3((0L, 1L)) >= 0L && rm3.contains((0L, 1L)),
      "the strong original match must survive expansion")
    // original-query-term hits are never counted as expansion hits:
    // n_exp_terms <= n_shared_terms everywhere on the real corpus
    val rows = CorpusOps.retrievalRm3(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(5) <= r.getLong(4),
      s"q ${r.getLong(0)} c ${r.getLong(1)}: exp > shared"))
  }

  test("retrievalMmr: independent greedy replay matches every round") {
    val pool = CorpusOps.retrievalJoin(docs, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tk = docs.select(col("doc_id"),
      array_distinct(TextOps.letterTokens(col("text"))).as("tk")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[String]]("tk").toSet).toMap
    def sim(a: Long, b: Long): Long = {
      val (x, y) = (tk(a), tk(b))
      val i = (x & y).size.toLong
      i * 10000 / math.max(x.size + y.size - i, 1)
    }
    val got = CorpusOps.retrievalMmr(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val cand = pool.filter(_._1 == q)
        .map { case (_, c, rank) => c -> (11 - rank) * 1000L }.toMap
      var selected = List.empty[Long]
      rows.sortBy(_._3).foreach { case (_, c, selR, rel, maxs, score) =>
        val remaining = cand.keySet -- selected
        // the greedy invariant: the pick maximizes 7*rel - 3*maxsim
        // over everything not yet selected, ties to the lower c_id
        val best = remaining.toSeq.map { cc =>
          val ms =
            if (selected.isEmpty) 0L else selected.map(s => sim(cc, s)).max
          (cc, ms, cand(cc) * 7 - ms * 3)
        }.sortBy { case (cc, _, sc) => (-sc, cc) }.head
        assert((best._1, best._2, best._3) === ((c, maxs, score)),
          s"q=$q round $selR")
        assert(rel === cand(c), s"q=$q round $selR relevance")
        selected :+= c
      }
    }
  }

  test("kCenterSample: greedy replay matches, gains non-increasing") {
    val feats = CorpusOps.topicFeatures(docs).localCheckpoint()
    val fmap = feats.collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("v").toArray).toMap
    val got = CorpusOps.kCenterSample(docs).collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 5)
    assert(got.map(_._2).distinct.length === got.length, "repeat pick")
    val gains = got.drop(1).map(_._3)
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      s"greedy gains must be non-increasing: ${gains.toSeq}")
    // independent in-memory replay of the farthest-point traversal
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(got(0)._2 === fmap.keys.min, "seed must be the lowest doc_id")
    var cents = List(fmap(got(0)._2))
    var chosenIds = Set(got(0)._2)
    got.drop(1).foreach { case (sel, id, gain) =>
      val (bestId, bestD) = fmap.toSeq
        .filterNot { case (i, _) => chosenIds(i) }
        .map { case (i, v) => (i, cents.map(c => d2(v, c)).min) }
        .sortBy { case (i, dm) => (-dm, i) }.head
      assert((bestId, bestD) === ((id, gain)), s"round $sel")
      cents :+= fmap(id)
      chosenIds += id
    }
  }

  // ------------------------------------------------------------ topics

  test("topicClusters: one row per doc, cluster is the exact argmin") {
    val feats = CorpusOps.topicFeatures(docs).localCheckpoint()
    val cents = CorpusOps.topicCentroids(feats)
    val fmap = feats.collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("v").toArray).toMap
    val out = CorpusOps.topicClusters(docs).collect()
    assert(out.length.toLong === docs.count())
    out.foreach { r =>
      val (id, cl, sd) = (r.getLong(0), r.getLong(1), r.getLong(2))
      fmap.get(id) match {
        case None => assert(cl === -1L && sd === 0L, s"tokenless doc $id")
        case Some(v) =>
          // independent replay: squared distance to EVERY centroid,
          // argmin with ties to the lower cell id
          val ds = cents.map(c =>
            v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
          val (bestD, bestI) = ds.zipWithIndex.min
          assert(cl === bestI.toLong, s"doc $id assigned $cl, argmin $bestI")
          assert(sd === bestD, s"doc $id sq_dist")
      }
    }
  }

  test("CMS estimate is exact on a collision-free fixture") {
    val d = mkDocs(Seq((1L, "alpha alpha alpha beta", "en", "s0")))
    val rows = CorpusOps.cmsFreqPanel(d, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(("alpha", 3L, 3L), ("beta", 1L, 1L)))
  }

  test("giniTerms: uniform counts -> 0; hand-computed skew; tie blocks") {
    val d = mkDocs(Seq(
      // s1: four terms, once each -> perfect equality, G = 0
      (1L, "aa bb cc dd", "en", "s1"),
      // s2: counts {x:1, y:3} -> G = (2*7 - 3*4)/(2*4) = 0.25
      (2L, "y x y y", "en", "s2"),
      // s3: counts {p:2, q:2, r:4} (a tie block + a distinct octave)
      //   sorted Sum i*f = 1*2+2*2+3*4 = 18 -> G = (36-32)/24 -> 166
      (3L, "p q r r", "en", "s3"),
      (4L, "r p q r", "en", "s3")))
    val got = CorpusOps.giniTerms(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("s1") === ((4L, 4L, 0L)))
    assert(got("s2") === ((2L, 4L, 250L)))
    assert(got("s3") === ((3L, 8L, 166L)))
  }

  // --------------------------------------------------------------- KLL

  test("kll: merging per-source samples == single-pass global sample") {
    val k = 64
    val base = CorpusOps.kllBase(docs)
    val n = base.count()
    val lvlAll = CorpusOps.kllLevel(n, k)
    // merge path: per-source samples (each at its own level), unioned,
    // re-filtered at the global level — what kllSketch's __all__ does
    val cnt = base.groupBy("source").agg(count(lit(1)).as("ns"))
    val merged = base.join(cnt, "source")
      .filter(col("tz") >= expr(
        s"CASE WHEN ns >= $k THEN CAST(length(bin(ns DIV $k)) - 1" +
          s" AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
      .filter(col("tz") >= lvlAll)
      .select("doc_id", "v", "tz").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // single-pass path: one filter over everything
    val direct = base.filter(col("tz") >= lvlAll)
      .select("doc_id", "v", "tz").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === direct, "merge must be EXACT, not just bounded")
    assert(direct.nonEmpty && direct.size < n,
      "sample must be a strict non-empty subset at this corpus size")
  }

  test("kll: measured rank error within the 3-sigma theory bound") {
    val rows = CorpusOps.kllSketch(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, nDocs, lvl, wt) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (size, err, bound) = (r.getLong(4), r.getLong(7), r.getLong(8))
      assert(wt === (1L << lvl))
      // expected sample size n/2^H lands in [k, 2k) when H > 0; allow
      // 3-sigma binomial wobble around it
      val expSize = nDocs.toDouble / wt
      assert(math.abs(size - expSize) <= 3.0 * math.sqrt(expSize) + 1.0,
        s"$src sample size $size vs expected $expSize")
      assert(err <= bound, s"$src rank_err $err > bound $bound")
    }
    // the __all__ row exists and aggregates every per-source count
    val all = rows.find(_.getString(0) == "__all__").get
    assert(all.getLong(1) ===
      rows.filter(_.getString(0) != "__all__").map(_.getLong(1)).sum)
  }
}
