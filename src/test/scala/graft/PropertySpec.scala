package graft

import graft.mr._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tier (SURVEY §5 port plan tier 3). Pure-Scala properties of
  * the app semantics run on generated corpora through the sequential
  * oracle (scalacheck generators, fixed seeds — scalatestplus isn't on
  * the offline classpath, so sampling is driven manually); one
  * Spark-backed case asserts associative fast path ≡ holistic path.
  */
class PropertySpec extends SparkSpec {

  private val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
  private val doc = Gen.listOf(Gen.oneOf(word, Gen.const("  "), Gen.const("42")))
    .map(_.mkString(" "))
  private val corpus: Gen[Seq[(String, String)]] =
    Gen.chooseNum(1, 6).flatMap { n =>
      Gen.listOfN(n, doc).map(_.zipWithIndex.map { case (c, i) => (s"f$i", c) })
    }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("wordcount counts sum to total token count (30 random corpora)") {
    samples(corpus, 30).foreach { files =>
      val out = SequentialOracle.run(files, WordCountApp)
      val totalCounted = out.map(_.split(" ").last.toLong).sum
      val totalTokens = files.map(f => GoTokens.split(f._2).length.toLong).sum
      assert(totalCounted === totalTokens, s"corpus: $files")
    }
  }

  test("inverted index round-trip: (word, doc) listed iff doc contains word") {
    samples(corpus, 30).foreach { files =>
      val out = SequentialOracle.run(files, InvertedIndexApp)
      val listed = out.flatMap { line =>
        val Array(word, rest) = line.split(" ", 2)
        rest.split(" ", 2)(1).split(",").map(d => (word, d))
      }.toSet
      val truth = files.flatMap { case (f, c) =>
        GoTokens.split(c).distinct.map(w => (w, f))
      }.toSet
      assert(listed === truth, s"corpus: $files")
    }
  }

  test("MG tree merge: mergeability theorem on random splits (40 cases)") {
    // The freqTerms superset guarantee rests on: merging per-stream
    // Misra-Gries sketches (sum counters, subtract the (cap+1)-th
    // largest, drop non-positive) keeps every item with true count
    // > N/(cap+1) at a positive counter, with residuals never above
    // the true counts — for ANY split of the stream and ANY merge
    // tree. Random multisets over a small vocab force heavy collisions
    // and eviction churn.
    val cap = 8
    val stream = Gen.chooseNum(20, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 30).map(i => s"t$i")))
    val withSplits = for {
      s <- stream
      k <- Gen.chooseNum(1, 7)
      cuts <- Gen.listOfN(k - 1, Gen.chooseNum(0, s.length))
    } yield (s, (Seq(0) ++ cuts.sorted ++ Seq(s.length)))
    samples(withSplits, 40).foreach { case (s, bounds) =>
      val parts = bounds.sliding(2).map { case Seq(a, b) => s.slice(a, b) }.toSeq
      val sketches = parts.map { p =>
        val m = new java.util.HashMap[String, Long]()
        p.foreach(graft.llm.CorpusOps.mgAdd(m, _, cap))
        m
      }
      // fold left-to-right (one shape of the merge tree; the bound is
      // per-merge so any tree satisfies it if this does + capacity holds)
      val merged = sketches.reduceLeft { (a, b) =>
        graft.llm.CorpusOps.mgMerge(a, b, cap); a
      }
      assert(merged.size <= cap)
      val truth = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = s.size.toLong
      truth.foreach { case (t, c) =>
        if (c > n.toDouble / (cap + 1))
          assert(merged.containsKey(t),
            s"item $t (count $c of $n, cap $cap) evicted; split $bounds")
      }
      merged.forEach { (k, v) =>
        assert(v <= truth(k), s"residual $v exceeds true ${truth(k)} for $k")
      }
    }
  }

  test("crash-payload reduce is order-insensitive (sorts values)") {
    val rnd = new scala.util.Random(7)
    samples(Gen.nonEmptyListOf(word), 30).foreach { values =>
      val a = CrashPayloadApp.reduce("k", values.iterator)
      val b = CrashPayloadApp.reduce("k", rnd.shuffle(values).iterator)
      assert(a === b)
    }
  }

  test("text kernels match reference semantics on random unicode (40 docs)") {
    // byte-level kernels vs String-level reference implementations over
    // adversarial inputs: mixed ASCII/CJK/accents/supplementary-plane
    // chars, every Java-regex \s whitespace, empty/ws-only strings
    import org.apache.spark.sql.functions.col
    import org.apache.spark.unsafe.types.UTF8String
    val wsChars = Seq(' ', '\t', '\n', '', '\f', '\r')
    val tokenChar = Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf('é', 'ü', '中', '文', 'й', '!', '.'))
    // supplementary-plane (4-byte UTF-8) content as a whole token so no
    // lone surrogate halves are generated
    val emojiTok = Gen.const(new String(Character.toChars(0x1F600)) + "x")
    val uText = Gen.listOf(Gen.oneOf(
      Gen.nonEmptyListOf(tokenChar).map(_.mkString),
      emojiTok,
      Gen.oneOf(wsChars).map(_.toString))).map(_.mkString)
    def xxh(s: String): Long = {
      val b = s.getBytes("UTF-8")
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }
    val texts = samples(uText, 40) ++ Seq("", " ", "a", "é 中文 é")
    texts.foreach { t =>
      val u = UTF8String.fromString(t)
      val toks = t.split("\\s+").filter(_.nonEmpty)
      // hashedSortedTokens == sorted distinct xxhash64 of \s+ tokens
      val got = graft.functions.TextKernels.hashedSortedTokens(u).toLongArray().toSeq
      assert(got === toks.map(xxh).distinct.sorted.toSeq, s"text=[$t]")
      // simhash64 == bit-vote reference
      val votes = new Array[Int](64)
      toks.foreach { w =>
        val h = xxh(w)
        (0 until 64).foreach(b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      val expSim = (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
      assert(graft.functions.TextKernels.simhash64(u) === expSim, s"text=[$t]")
      // charNgrams == code-point substring windows
      val cps = t.codePoints().toArray
      val expGrams = (0 to cps.length - 3).map(i =>
        new String(cps, i, 3))
      val gotGrams = graft.functions.TextKernels.charNgrams(u, 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(gotGrams === expGrams, s"text=[$t]")
      // tokenCounts == letter-run grouping
      val letterToks = t.split("[^\\p{L}]+").filter(_.nonEmpty)
      val gotTc = {
        val m = graft.functions.TextKernels.tokenCounts(u)
        val ks = m.keyArray().toArray[UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString)
        val vs = m.valueArray().toLongArray()
        ks.zip(vs).toMap
      }
      assert(gotTc ===
        letterToks.groupBy(identity).view.mapValues(_.length.toLong).toMap,
        s"text=[$t]")
    }
  }

  test("associative fast path == holistic path (wc + indexer, pg sample)") {
    val pg = Seq(
      "/root/reference/main/pg-being_ernest.txt",
      "/root/reference/main/pg-metamorphosis.txt")
    def canon(ds: org.apache.spark.sql.Dataset[KeyValue]): Seq[String] =
      MRJob.canonical(ds)
    assert(
      canon(AssociativeMRJob.run(spark, WordCountFast, pg)) ===
        canon(MRJob.run(spark, WordCountApp, pg)))
    assert(
      canon(AssociativeMRJob.run(spark, InvertedIndexFast, pg)) ===
        canon(MRJob.run(spark, InvertedIndexApp, pg)))
  }

  test("PPJoin positional filter keeps boundary-exact pairs at any set size") {
    // The filter is a NECESSARY condition: a pair with Jaccard exactly
    // at the threshold must pass at every magnitude — including sizes
    // (~1e7+ elements) where double rounding of the old
    // t/(1+t)*(sa+sb) - 1e-9 form exceeded the absolute slack. A pair
    // clearly below the bound must still be pruned (the filter's job).
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val thresholds = Seq(0.5, 0.8, 0.9)
    val sizes = Seq(30L, 3000L, 3_000_000L, 30_000_000L, 3_000_000_000L)
    val rows = for (t <- thresholds; n <- sizes) yield {
      // sa = sb = n; smallest qualifying overlap o = ceil(t/(1+t)*2n)
      // computed in exact rational arithmetic (BigDecimal(t) is the
      // exact double value, so this matches the filter's semantics).
      // When the bound is an integer (t=0.5 with 3|n) o sits EXACTLY on
      // it — the boundary-exact case the old absolute slack dropped.
      val num = BigDecimal(t) / (1 + BigDecimal(t)) * 2 * n
      val o = num.setScale(0, BigDecimal.RoundingMode.CEILING).toLongExact
      (t, n, n - o, n) // pposA = sz - o => overlap UB == o
    }
    val df = rows.toDF("t", "sz", "ppos", "n")
    thresholds.foreach { t =>
      val sub = df.filter(col("t") === t)
      val kept = sub.filter(graft.llm.Dedup.positionalFilter(
        col("sz"), col("ppos"), col("sz"), col("ppos"), t)).count()
      assert(kept === sub.count(),
        s"boundary-exact pair dropped at t=$t")
      // sanity: an overlap clearly below the bound must be pruned
      val pruned = sub.filter(graft.llm.Dedup.positionalFilter(
        col("sz"), col("sz") - 1, col("sz"), col("sz") - 1, t)).count()
      assert(pruned === 0L, s"filter vacuous at t=$t")
    }
  }

  test("codec fuzz: decode never escapes the IAE quarantine contract") {
    // The quarantine routing catches IllegalArgumentException ONLY —
    // any other throwable (ArrayIndexOutOfBounds, BufferUnderflow,
    // NegativeArraySize, OOM from a trusted size field) escapes and
    // kills the stage. Fuzz all three codecs with random buffers and
    // single-byte mutations of valid files; decode must either succeed
    // or raise IAE.
    val rnd = new scala.util.Random(42)
    def assertContained(name: String, decode: Array[Byte] => Any,
        valid: Array[Byte]): Unit = {
      def tryOne(b: Array[Byte], what: String): Unit =
        try { decode(b); () } catch {
          case _: IllegalArgumentException => ()
          case t: Throwable =>
            fail(s"$name escaped quarantine on $what: ${t.getClass.getName}: ${t.getMessage}")
        }
      (0 until 150).foreach { i =>
        val b = new Array[Byte](rnd.nextInt(200))
        rnd.nextBytes(b)
        tryOne(b, s"random buffer $i")
      }
      (0 until 300).foreach { i =>
        val b = valid.clone()
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        tryOne(b, s"mutation $i")
        tryOne(b.take(rnd.nextInt(b.length)), s"truncation $i")
      }
      // a NULL blob (nullable ingest column) must also route to IAE,
      // not escape as an untagged NPE from a length dereference
      tryOne(null, "null blob")
    }
    assertContained("BmpCodec", graft.llm.BmpCodec.decode,
      graft.llm.BmpCodec.encode(7, 5, (x, y, c) => x + y + c))
    assertContained("WavCodec", graft.llm.WavCodec.decode,
      graft.llm.WavCodec.encode(8000, Array.tabulate[Short](64)(_.toShort)))
    assertContained("Y4mCodec", graft.llm.Y4mCodec.decode,
      graft.llm.Y4mCodec.encode(6, 4, 2, (f, x, y) => f + x + y))
  }

  test("wav codec round-trips arbitrary rates and waveforms (40 cases)") {
    val wav = for {
      rate <- Gen.chooseNum(1, 192000)
      n <- Gen.chooseNum(0, 2000)
      samples <- Gen.listOfN(n,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (rate, samples.map(_.toShort).toArray)
    samples(wav, 40).foreach { case (rate, ss) =>
      val back = graft.llm.WavCodec.decode(graft.llm.WavCodec.encode(rate, ss))
      assert(back.sampleRate === rate)
      assert(back.samples.toSeq === ss.toSeq, s"rate=$rate n=${ss.length}")
    }
  }

  test("duplicateSpans == brute-force replay on random small-vocab corpora") {
    import org.apache.spark.sql.functions.col
    // tiny vocabulary + short docs force heavy window collisions and
    // adjacent/overlapping islands — the merge logic's hard regime
    val k = 3
    val doc = for {
      n <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield toks
    val corpus = Gen.chooseNum(2, 8).flatMap(Gen.listOfN(_, doc))
    val spark2 = spark
    import spark2.implicits._
    samples(corpus, 15).foreach { docsToks =>
      val df = docsToks.zipWithIndex
        .map { case (t, i) => (i.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.llm.Dedup.duplicateSpans(df, k).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val gotKept = graft.llm.Dedup.duplicateSpanRemove(df, k).collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
      // brute force: count every k-window across the corpus, mark docs'
      // duplicated positions, merge [p, p+k) unions per doc
      val wins = docsToks.zipWithIndex.flatMap { case (t, i) =>
        t.sliding(k).filter(_.size == k).zipWithIndex
          .map { case (w, p) => (i.toLong, p, w.mkString(" ")) }
      }
      val occ = wins.groupBy(_._3).view.mapValues(_.size).toMap
      docsToks.zipWithIndex.foreach { case (t, i) =>
        val dupPos = wins.collect {
          case (d, p, w) if d == i.toLong && occ(w) >= 2 => p
        }.sorted
        val covered = dupPos.flatMap(p => p until p + k).toSet.size
        var spans = 0
        var prevEnd = Int.MinValue
        dupPos.foreach { p =>
          if (p > prevEnd) spans += 1
          prevEnd = math.max(prevEnd, p + k)
        }
        val (nTok, nSpans, dupToks) = got(i.toLong)
        assert(nTok === t.size.toLong, s"doc $i token count")
        assert(nSpans === spans.toLong, s"doc $i spans: $t")
        assert(dupToks === covered.toLong, s"doc $i coverage: $t")
        // removal: kept tokens are exactly the uncovered positions
        val coveredPos = dupPos.flatMap(p => p until p + k).toSet
        val keptToks = t.zipWithIndex.collect {
          case (tok, p) if !coveredPos(p) => tok
        }
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(keptToks.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(gotKept(i.toLong) === ((keptToks.size.toLong, md)),
          s"doc $i cleaned text: $t")
      }
    }
  }

  test("Misra-Gries frequent terms exact on random zipf-ish streams (20 cases)") {
    import org.apache.spark.sql.functions.{col, explode}
    // skewed streams: token k drawn with weight ~ 1/(k+1); every
    // (phi, capacity) pair satisfies the (cap+1)*phi >= 1 bound with
    // little slack, the regime where sketch bugs surface
    val stream = for {
      n <- Gen.chooseNum(50, 400)
      toks <- Gen.listOfN(n, Gen.frequency(
        (60, Gen.const("zipfa")), (30, Gen.const("zipfb")),
        (15, Gen.const("zipfc")), (8, Gen.const("zipfd")),
        (40, Gen.identifier.map(s => "u" + s.filter(_.isLetter)))))
    } yield toks
    val spark2 = spark
    import spark2.implicits._
    samples(stream, 20).zipWithIndex.foreach { case (toks, i) =>
      val phi = 0.05 + (i % 4) * 0.05
      val cap = math.ceil(1.0 / phi).toInt // zero-slack capacity
      // split the stream over several docs so the sketch really runs
      // per-partition (a single row would give it the whole stream)
      val d = toks.grouped(40).zipWithIndex
        .map { case (g, j) => (j.toLong, g.mkString(" ")) }
        .toSeq.toDF("doc_id", "text").repartition(3)
      val got = graft.llm.CorpusOps.freqTerms(d, phi, cap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val letterToks = d.select(
        explode(graft.llm.TextOps.letterTokens(col("text"))).as("t"))
        .as[String].collect()
      val thresh = math.ceil(phi * letterToks.length).toLong
      val want = letterToks.groupBy(identity).view
        .mapValues(_.length.toLong).filter(_._2 >= thresh).toMap
      assert(got === want, s"case $i phi=$phi cap=$cap n=${letterToks.length}")
    }
  }

  test("tokenBudget two-pass decomposition == naive per-domain window") {
    // The operator's whole point is replacing the per-domain global
    // cumulative window with a class-histogram + boundary-class-only
    // doc window; this fuzz pins row-identical output. The vocabulary
    // is tiny so quality classes collide hard (every lang gets a fat
    // boundary class), and empty/zero-token/punct-only docs hit the
    // NULL-quality and zero-token edges of the boundary rule.
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val words = Array("aa", "bb", "cc!", "d.", "123", "!!")
    val docs = (0 until 400).map { i =>
      val text = Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length)))
        .mkString(" ")
      (s"l${rnd.nextInt(3)}", i.toLong, text)
    }.toDF("lang", "doc_id", "text")
    docs.createOrReplaceTempView("docs_tb")
    Seq(0L, 5L, 37L, 200L, 1000000L).foreach { budget =>
      val got = graft.llm.Sampling.tokenBudget(docs, budget)
      // NOT s-interpolated: the s interpolator processes \\ escapes even
      // in triple quotes, and the SQL lexer then eats the lone backslash
      // — '[^\p{L}]' silently becomes the regex [^p{L}] (this bit once)
      val naive = spark.sql(
        """SELECT lang, doc_id, q_x10000, n_tokens FROM (
          |  SELECT lang, doc_id, q_x10000, n_tokens,
          |    sum(n_tokens) OVER (PARTITION BY lang
          |      ORDER BY q_x10000 DESC, doc_id
          |      ROWS UNBOUNDED PRECEDING) AS cum
          |  FROM (
          |    SELECT lang, doc_id,
          |      coalesce(CAST(length(regexp_replace(text, '[^\\p{L}]', ''))
          |          AS BIGINT) * 10000 DIV nullif(length(text), 0),
          |        CAST(-1 AS BIGINT)) AS q_x10000,
          |      CAST(size(filter(split(text, '\\s+'), t -> t <> ''))
          |        AS BIGINT) AS n_tokens
          |    FROM docs_tb))
          |WHERE cum <= __BUDGET__""".stripMargin
          .replace("__BUDGET__", budget.toString))
      val extra = got.exceptAll(naive).count()
      val missing = naive.exceptAll(got).count()
      assert(extra === 0L && missing === 0L,
        s"budget=$budget extra=$extra missing=$missing")
    }
    // partition invariance: the selection is a pure function of the
    // data — the physical layout of the input must not change it
    val ref = graft.llm.Sampling.tokenBudget(docs, 37L)
    Seq(1, 13).foreach { p =>
      val alt = graft.llm.Sampling.tokenBudget(docs.repartition(p), 37L)
      assert(alt.exceptAll(ref).count() === 0L &&
        ref.exceptAll(alt).count() === 0L, s"parts=$p changed the selection")
    }
  }

  test("temperatureSample two-pass == naive window; sqrt reshapes the mix") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 500).map { i =>
      val lang = if (i % 10 < 7) "big" else if (i % 10 < 9) "mid" else "rare"
      val text = Seq.fill(1 + rnd.nextInt(10))("w" + rnd.nextInt(20))
        .mkString(" ")
      (lang, i.toLong, text)
    }.toDF("lang", "doc_id", "text")
    docs.createOrReplaceTempView("docs_temp")
    val got = graft.llm.Sampling.temperatureSample(docs)
    val naive = spark.sql(
      """WITH base AS (
        |  SELECT lang, doc_id,
        |    CAST(size(filter(split(text, '\\s+'), t -> t <> ''))
        |      AS BIGINT) AS n_toks,
        |    CAST(conv(substring(md5(CAST(concat('ts:',
        |      CAST(doc_id AS STRING)) AS BINARY)), 1, 15), 16, 10)
        |      AS BIGINT) AS hsel
        |  FROM docs_temp),
        |pl AS (SELECT lang, sum(n_toks) AS lang_tokens FROM base
        |  GROUP BY lang),
        |plw AS (
        |  SELECT lang, lang_tokens,
        |    CAST(floor(sqrt(CAST(lang_tokens AS DOUBLE))) AS BIGINT) AS w
        |  FROM pl),
        |tot AS (SELECT sum(lang_tokens) AS total_tokens, sum(w) AS sum_w
        |  FROM plw),
        |tgt AS (
        |  SELECT lang, (total_tokens DIV 2) * w DIV sum_w AS target_tokens
        |  FROM plw CROSS JOIN tot)
        |SELECT lang, doc_id, n_toks, target_tokens FROM (
        |  SELECT b.lang, b.doc_id, b.n_toks, t.target_tokens,
        |    sum(b.n_toks) OVER (PARTITION BY b.lang
        |      ORDER BY b.hsel, b.doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW) AS cum
        |  FROM base b JOIN tgt t ON b.lang = t.lang)
        |WHERE cum <= target_tokens""".stripMargin)
    assert(got.exceptAll(naive).count() === 0L &&
      naive.exceptAll(got).count() === 0L,
      "two-pass selection must equal the naive per-lang window")
    // partition invariance
    val alt = graft.llm.Sampling.temperatureSample(docs.repartition(13))
    assert(alt.exceptAll(got).count() === 0L &&
      got.exceptAll(alt).count() === 0L)
    // the sqrt temperature: the rare lang's budget share must exceed
    // its input share, the dominant lang's must shrink
    import org.apache.spark.sql.functions.{col, size, sum}
    val inTok = docs.select(col("lang"),
      size(graft.llm.TextOps.wsTokens(col("text"))).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tg = got.select("lang", "target_tokens").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tg("rare").toDouble / tg("big") >
      inTok("rare").toDouble / inTok("big"),
      s"sqrt must flatten the mix: targets $tg vs inputs $inTok")
  }

  test("epochUpsample copies are floor/ceil of the permille weight and stable") {
    import org.apache.spark.sql.functions._
    val d = graft.core.Tables.load(spark, sfDir, "documents")
    val out = graft.llm.Sampling.epochUpsample(d)
    // per-doc: emitted rows agree with n_copies and are numbered 1..n
    out.groupBy("doc_id", "n_copies")
      .agg(count(lit(1)).as("rows"), max("copy").as("mx"),
        min("copy").as("mn"))
      .collect().foreach { r =>
        assert(r.getLong(1) === r.getLong(2) && r.getLong(3) === r.getLong(1)
          && r.getLong(4) === 1L, s"inconsistent copy numbering: $r")
      }
    // independent replay of the integer-permille weight formula
    val toks = d.select(col("lang"),
      size(graft.llm.TextOps.wsTokens(col("text"))).cast("long").as("nt"))
      .groupBy("lang").agg(sum("nt").as("n_tokens")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = toks.values.sum
    val tgt = graft.llm.Sampling.TargetMixPermille.toMap
    val w = tgt.flatMap { case (l, p) =>
      toks.get(l).map(n => l -> math.min(4000L, p * tot / n)) }
    out.select("lang", "n_copies").distinct().collect().foreach { r =>
      val base = w(r.getString(0)) / 1000
      assert(r.getLong(1) === base || r.getLong(1) === base + 1,
        s"${r.getString(0)}: ${r.getLong(1)} copies outside floor/ceil " +
          s"of ${w(r.getString(0))} permille")
    }
    // partition invariance (pure row function contract)
    val alt = graft.llm.Sampling.epochUpsample(d.repartition(7))
    assert(out.exceptAll(alt).count() === 0L &&
      alt.exceptAll(out).count() === 0L)
  }

  test("splitLeakage: exact leakage is 0 by construction, canonical leaks") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // 40 canonical-dup pairs ("wA wB" vs "wB wA" — same sorted distinct
    // token set, different raw text) plus 3 copies of one exact dup.
    // The split is a hash OF THE TEXT, so the exact-dup class can never
    // cross splits; each reordered pair draws two independent splits.
    val words = (0 until 80).map(i => s"w${i}x")
    val pairs = (0 until 40).flatMap { i =>
      val (a, b) = (words(2 * i), words(2 * i + 1))
      Seq((2L * i, s"$a $b", "en", "s0"), (2L * i + 1, s"$b $a", "en", "s0"))
    }
    val exactDups = (100 until 103).map(i =>
      (i.toLong, "same same text", "en", "s0"))
    val d = (pairs ++ exactDups).toDF("doc_id", "text", "lang", "source")
    val got = graft.llm.Sampling.splitLeakage(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // exact level: one dup class (the 3 copies), zero cross-split
    assert(got("exact") === ((1L, 0L, 0L)))
    // canonical level: 40 reordered pairs + the exact-dup class; at
    // least one pair must land in different splits (the fixture is
    // deterministic — this pins the leak the panel exists to catch),
    // and every cross-split class puts BOTH its docs at risk
    val (canonClasses, canonCross, canonAtRisk) = got("canonical")
    assert(canonClasses === 41L)
    assert(canonCross >= 1L && canonCross <= 40L)
    assert(canonAtRisk === 2L * canonCross)
    // partition invariance: pure function of content
    val alt = graft.llm.Sampling.splitLeakage(d.repartition(7)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(alt === got)
  }

  test("kCore(k=1) keeps exactly the non-isolated nodes (random graphs)") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L)))
    samples(edgeGen, 8).foreach { es0 =>
      val es = es0.filter { case (u, v) => u != v }.distinct
        .map { case (u, v) => if (u < v) (u, v) else (v, u) }.distinct
      if (es.nonEmpty) {
        val got = graft.ops.GraphOps.kCore(es.toDF("u", "v"), k = 1, iters = 2)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = (es.map(_._1) ++ es.map(_._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        assert(got === want, s"edges: $es")
      }
    }
  }

  test("basketRules invariants: confidences <= 1000, support bounds (random)") {
    import spark.implicits._
    val rowGen = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 9L)))
    samples(rowGen, 6).foreach { rows =>
      val df = rows.toDF("l_orderkey", "l_partkey")
      val rules = graft.ops.GraphOps.basketRules(df, minSupport = 2L).collect()
      rules.foreach { r =>
        val (w, nu, nv) = (r.getLong(2), r.getLong(3), r.getLong(4))
        val (cuv, cvu) = (r.getLong(5), r.getLong(6))
        assert(w >= 2L && w <= math.min(nu, nv))
        assert(cuv >= 0L && cuv <= 1000L)
        assert(cvu >= 0L && cvu <= 1000L)
        // conf = 1000*w/n with w <= n: floor keeps it in [0, 1000]
        assert(cuv === 1000L * w / nu && cvu === 1000L * w / nv)
      }
    }
  }

  test("rfm scores stay in 1..5 and users partition across cells (random)") {
    import spark.implicits._
    import java.sql.Timestamp
    val evGen = Gen.listOfN(200, Gen.zip(
      Gen.chooseNum(1L, 40L), Gen.chooseNum(0L, 60L),
      Gen.chooseNum(1, 9999)))
    samples(evGen, 5).foreach { rows =>
      val ev = rows.zipWithIndex.map { case ((user, day, cents), i) =>
        (i.toLong, new Timestamp(1704067200000L + day * 86400000L),
          user, "purchase", cents / 100.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val cells = graft.ops.EventOps.rfmSegments(ev).collect()
      val nUsers = rows.map(_._1).distinct.size.toLong
      cells.foreach { r =>
        (0 to 2).foreach(i =>
          assert(r.getLong(i) >= 1L && r.getLong(i) <= 5L, r))
      }
      assert(cells.map(_.getLong(4)).sum === nUsers,
        "every purchasing user lands in exactly one (r, f, m) cell")
    }
  }

  test("saltedSides: every unordered in-block pair meets exactly once, any saltTarget") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // one hot block (600 co-keyed rows), one cold block, one singleton
    val keyed = ((1L to 600L).map(k => (k, "B1", "T", 1)) ++
      (1001L to 1010L).map(k => (k, "B2", "T", 1)) ++
      Seq((2001L, "B3", "T", 1)))
      .toDF("id", "blk", "typ", "sz")
    def pairs(st: Int) = {
      val (p, b) = graft.ops.Salting.saltedSides(
        keyed, Seq("blk", "typ", "sz"), col("id"), st)
      p.as("x").join(b.as("y"),
        col("x.blk") === col("y.blk") && col("x.typ") === col("y.typ") &&
          col("x.sz") === col("y.sz") && col("x.salt") === col("y.salt") &&
          col("x.id") < col("y.id"))
        .select(col("x.id"), col("y.id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val expect = 600 * 599 / 2 + 10 * 9 / 2
    // disabled, even splits, an UNEVEN split (600/7), and a split
    // larger than any block — the pair set must be invariant
    Seq(-1, 1024, 64, 7).foreach { st =>
      val ps = pairs(st)
      assert(ps.distinct.size === ps.size,
        s"saltTarget=$st emitted a pair more than once")
      assert(ps.size === expect, s"saltTarget=$st pair count off")
    }
  }

  test("boundedTrainMod: fixed 4 at every tested sf, bounded sample beyond") {
    import graft.llm.Similarity.boundedTrainMod
    // every tested corpus size (sf0.001/0.01: 500, sf0.1: 2000, derived
    // sf1: 20000) stays at the historical modulus 4 — oracle results
    // there are bit-identical to the fixed-mod-4 spelling
    Seq(0L, 1L, 500L, 2000L, 20000L, 32768L).foreach { n =>
      assert(boundedTrainMod(n, 16) === 4L, s"n=$n")
    }
    // beyond the knee the expected sample stays ~trainTarget: n/mod in
    // [target/2, target] for any n (mod quantized to multiples of 4)
    Seq(32769L, 100000L, 250000L, 1000000L, 100000000L).foreach { n =>
      val mod = boundedTrainMod(n, 16)
      assert(mod % 4 === 0)
      val sample = n / mod
      assert(sample <= 8192L, s"n=$n sample=$sample above budget")
      assert(sample >= 4096L, s"n=$n sample=$sample below half budget")
    }
    // the budget scales with k (>= 64 points per centroid)
    assert(boundedTrainMod(1000000L, 1024) === 16L) // target 65536
    assert(boundedTrainMod(1000000L, 16) === 124L)  // target 8192
  }
}
