package graft

import graft.core.Tables
import graft.llm.Curation
import org.apache.spark.sql.functions._

/** Semantic checks for the second-wave curation operators (the DuckDB
  * oracle pins exact values; these pin the operator CONTRACTS).
  */
class CurationSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("spanCorrupt: sentinel placement matches the hand-built sequences") {
    import spark.implicits._
    // 13 tokens -> one span at pos 3 covering (t3, t4); doc 2 is too
    // short for any span (4 tokens, positions 0..3: span at 3 has a
    // 1-token tail... pos 3 IS a start, span covers just t3)
    val d = Seq(
      (1L, (0 to 12).map(i => s"t$i").mkString(" ")),
      (2L, "a b c d"))
      .toDF("doc_id", "text")
    val got = graft.llm.Curation.spanCorrupt(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))).toMap
    def m(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val in1 = "t0 t1 t2 <X0> t5 t6 t7 t8 t9 t10 t11 t12"
    val tg1 = "<X0> t3 t4"
    assert(got(1L) === ((13L, 1L, m(in1), m(tg1))))
    // the 1-token-tail span: input keeps the sentinel, target has
    // only the swallowed token
    assert(got(2L) === ((4L, 1L, m("a b c <X0>"), m("<X0> d"))))
  }

  test("chunking covers every token with the configured stride/overlap") {
    val perDoc = Curation.chunk(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("n_chunk_tokens").as("sum_chunk_toks"),
        max("chunk_id").as("max_chunk"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val nToks = docs.select(col("doc_id"),
      size(graft.llm.TextOps.wsTokens(col("text"))).cast("bigint").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    nToks.foreach { case (id, n) =>
      val (nChunks, sumToks, maxChunk) = perDoc(id)
      val expChunks = math.max(1, math.ceil(n.toDouble / 40).toInt)
      assert(nChunks === expChunks.toLong, s"doc $id: $n tokens")
      assert(maxChunk === nChunks - 1)
      // stride 40 / size 50: every chunk except the last carries 50
      // tokens, so total chunked tokens = n + 10 * (full windows)
      val expSum = (0 until expChunks).map(i =>
        math.min(50L, n - i * 40L)).sum
      assert(sumToks === expSum, s"doc $id")
    }
  }

  test("packing bins are contiguous, ordered, and budget-aligned") {
    val rows = Curation.packSequences(docs)
      .orderBy("lang", "doc_id")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      var cum = 0L
      rs.foreach { case (_, id, n, bin) =>
        assert(bin === cum / 256, s"$lang doc $id")
        cum += n
      }
      // bins are non-decreasing in doc_id order
      assert(rs.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("pii redaction counts follow the deterministic injection rules") {
    val rows = Curation.piiRedact(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    rows.foreach { case (id, nEmail, nPhone) =>
      assert(nEmail === (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(nPhone === (if (id % 2 == 0) 1L else 0L), s"doc $id phones")
    }
  }

  test("url dedup collapses to distinct canonical pages") {
    val expected = docs
      .select(col("source"), col("lang"), pmod(col("doc_id"), lit(50)).as("p"))
      .distinct().count()
    val out = Curation.urlDedup(docs)
    assert(out.count() === expected)
    // canonical form: lowercase scheme+host, no www/query/fragment/
    // trailing slash
    val urls = out.select("canon_url").collect().map(_.getString(0))
    urls.foreach { u =>
      assert(u.startsWith("https://"), u)
      assert(!u.contains("www.") && !u.contains("?") && !u.contains("#"), u)
      assert(!u.endsWith("/"), u)
      assert(u.contains(".example.com/"), u)
    }
  }

  test("repetition metrics are consistent and bounded") {
    val rows = Curation.repetition(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, distinct, dRatio, topShare) =>
      assert(distinct <= n)
      assert(dRatio === distinct * 10000 / n)
      assert(topShare >= 10000L / n && topShare <= 10000L)
    }
  }

  test("bpeTrain learns the hand-computed merges of the Sennrich corpus") {
    import spark.implicits._
    // word freqs: low x3, lower x2, newest x4, widest x1. Hand trace:
    //  round 1: w-e = 4(newest) + 2(lower) = 6        -> merge (w, e)
    //  round 2: l-o = 5 ties s-t = 5; (l,o) < (s,t)   -> merge (l, o)
    //  round 3: s-t = 4(newest) + 1(widest) = 5       -> merge (s, t)
    val corpus = (Seq.fill(3)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(4)("newest") ++ Seq("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Curation.bpeTrain(corpus, nMerges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === Seq(
      (1L, "w", "e", 6L),
      (2L, "l", "o", 5L),
      (3L, "s", "t", 5L)))
  }

  test("bpeEncode applies merges by rank (closed form) and bounds hold") {
    import spark.implicits._
    // merges rank0 (a,b), rank1 (ab,c); word "abcabd":
    //   chars a b c a b d -> (a,b): ab c ab d -> (ab,c): abc ab d = 3
    val d = Seq((1L, "abcabd"), (2L, "xyz")).toDF("doc_id", "text")
    val got = Curation.bpeEncode(d, Seq(("a", "b"), ("ab", "c"))).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((1L, 6L, 3L, 20000L)))
    assert(got(2L) === ((1L, 3L, 3L, 10000L))) // no merge applies
    // on the real corpus with trained merges: word <= bpe <= chars
    val real = Curation.bpeEncode(docs,
      Curation.bpeTrain(docs).collect()
        .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq)
      .collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val (w, c, b) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w <= b && b <= c, s"doc ${r.getLong(0)}: words=$w bpe=$b chars=$c")
    }
  }

  test("bpeTrain stops when no pairs remain") {
    import spark.implicits._
    val corpus = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // merges: (a,b) cnt 2 -> then (c,d) cnt 1 -> symbols exhausted
    val got = Curation.bpeTrain(corpus, nMerges = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === Seq((1L, "a", "b", 2L), (2L, "c", "d", 1L)))
  }

  test("bpe seeds symbols by CODE POINT, not UTF-16 code unit") {
    import spark.implicits._
    // U+10348 GOTHIC LETTER HWAIR: a \p{L} letter outside the BMP
    // (2 chars in UTF-16). Code-unit seeding would learn a merge of
    // two unpaired surrogates; code-point seeding learns (hwair, a).
    val hwair = new String(Character.toChars(0x10348))
    val corpus = Seq((1L, s"${hwair}a ${hwair}a")).toDF("doc_id", "text")
    val got = Curation.bpeTrain(corpus, nMerges = 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq((hwair, "a", 2L)),
      s"expected the hwair+a merge, got $got")
    // every learned symbol is a VALID Unicode string: no code point
    // may land in the surrogate range (an UNPAIRED surrogate shows up
    // there; a correctly paired one decodes to its supplementary char)
    got.foreach { case (l, r, _) =>
      Seq(l, r).foreach { s =>
        assert(s.codePoints().toArray.forall(cp =>
          cp < 0xD800 || cp > 0xDFFF), s"unpaired surrogate in '$s'")
      }
    }
    // encode agrees: the word collapses to ONE token after the merge
    val merges = Curation.bpeTrain(corpus, 2).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Curation.bpeEncode(corpus, merges).collect()
    assert(enc.length === 1 && enc(0).getAs[Long]("n_bpe_tokens") === 2L,
      s"two hwair+a words -> 2 tokens, got ${enc.toSeq}")
  }

  test("kAnonymity matches a closed-form fixture and covers all docs") {
    val spark2 = spark
    import spark2.implicits._
    // (en, s0): 6 docs in length bucket 3 (n_chars 4..7) — safe class;
    // 2 docs in bucket 4 (8, 9) — small class. (de, s1): a singleton.
    val d = ((0 until 6).map(i => (i.toLong, "en", "s0", 4L + i % 4)) ++
      Seq((6L, "en", "s0", 8L), (7L, "en", "s0", 9L),
        (8L, "de", "s1", 5L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = Curation.kAnonymity(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got(("en", "s0")) === ((2L, 1L, 8L, 2L, 2L)))
    assert(got(("de", "s1")) === ((1L, 1L, 1L, 1L, 1L)))
    // every document lands in exactly one stratum row
    val out = Curation.kAnonymity(docs)
    assert(out.agg(sum("total_docs")).head().getLong(0) === docs.count())
  }

  test("lDiversity matches a closed-form fixture and bounds hold") {
    val spark2 = spark
    import spark2.implicits._
    // (s0, bucket 3): 3 langs over 4 docs — diverse; (s0, bucket 4):
    // 2 docs, 1 lang — low-diversity, both docs at risk. (s1): one
    // 2-doc 2-lang class, below l=3, both at risk.
    val d = (Seq((0L, "en", "s0", 4L), (1L, "de", "s0", 5L),
      (2L, "fr", "s0", 6L), (3L, "en", "s0", 7L),
      (4L, "en", "s0", 8L), (5L, "en", "s0", 9L),
      (6L, "en", "s1", 4L), (7L, "de", "s1", 5L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = Curation.lDiversity(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got("s0") === ((2L, 1L, 2L, 1L, 6L)))
    assert(got("s1") === ((1L, 1L, 2L, 2L, 2L)))
    // corpus-wide: every doc counted once; at-risk <= total; min >= 1
    val rows = Curation.lDiversity(docs).collect()
    assert(rows.map(_.getLong(5)).sum === docs.count())
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(5))
      assert(r.getLong(4) >= 1L)
    }
  }

  test("tCloseness matches a closed-form fixture and bounds hold") {
    val spark2 = spark
    import spark2.implicits._
    // global lang marginal en:10 de:10 (q = ½/½). (s0, bucket 3):
    // 5 en + 5 de — matches q exactly, t = 0. (s1, bucket 3): 5 en —
    // point mass, t = ½(|1-½|+|0-½|) = 500 permille; (s1, bucket 4):
    // 5 de — dually 500. Both s1 classes are k-anonymous at k=5 and
    // the source is 2-lang diverse, yet t-closeness flags them —
    // the leak the other two audits cannot see.
    val d = ((0 until 5).map(i => (i.toLong, "en", "s0", 4L)) ++
      (5 until 10).map(i => (i.toLong, "de", "s0", 4L)) ++
      (10 until 15).map(i => (i.toLong, "en", "s1", 4L)) ++
      (15 until 20).map(i => (i.toLong, "de", "s1", 8L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = Curation.tCloseness(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got("s0") === ((1L, 0L, 0L, 0L, 10L)))
    assert(got("s1") === ((2L, 2L, 10L, 500L, 10L)))
    // corpus-wide: every doc counted once; t in [0, 1000]
    val rows = Curation.tCloseness(docs).collect()
    assert(rows.map(_.getLong(5)).sum === docs.count())
    rows.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000L)
      assert(r.getLong(3) <= r.getLong(5))
    }
  }

  test("blocklistAudit equals an exact in-memory regex replay") {
    val rows = Curation.blocklistAudit(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    val terms = Seq("slow", "crash", "skew")
    val pats = terms.map(t => ("\\b" + t + "\\b").r)
    val anyPat = ("\\b(" + terms.mkString("|") + ")\\b").r
    val want = docs.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (src, ds) =>
        val texts = ds.map(_._2)
        src -> (texts.length.toLong,
          texts.count(t => anyPat.findFirstIn(t).isDefined).toLong,
          texts.count(t => pats(0).findFirstIn(t).isDefined).toLong,
          texts.count(t => pats(1).findFirstIn(t).isDefined).toLong,
          texts.count(t => pats(2).findFirstIn(t).isDefined).toLong)
      }
    assert(rows === want)
    // at least one source must actually flag something on this corpus
    assert(rows.values.map(_._2).sum > 0L)
  }

  test("classifier training: loss strictly decreases every round") {
    val curve = Curation.classifierTrain(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(curve.length === 9) // 8 update rounds + final eval
    val losses = curve.map(_._2)
    losses.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"loss must strictly decrease: ${losses.mkString(", ")}")
    }
    // accuracy never degrades and ends above the untrained start
    val correct = curve.map(_._3)
    correct.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    assert(correct.last > correct.head)
  }

  test("classifier on an EMPTY corpus: zero weights, null losses, no NPE") {
    // Pins the degenerate-input contract of the r18 driver-held-weights
    // rewrite: nDocs == 0 skips every update, so the weights stay at
    // their zero initialization (the pre-r18 DataFrame chain produced
    // NULL weights via DIV-by-zero and an NPE in trainedWeights); the
    // loss panel keeps its null shape, and the trained scorer is empty.
    val empty = docs.limit(0)
    val w = Curation.trainedWeights(empty, rounds = 2)
    assert(w.length === 64 && w.forall(_ == 0L),
      s"empty corpus must leave zero weights, got ${w.mkString(",")}")
    val curve = Curation.classifierTrain(empty, rounds = 2).collect()
    assert(curve.length === 3) // 2 update rounds + final eval, all null
    curve.foreach(r => assert(r.isNullAt(1) && r.isNullAt(2),
      s"empty-corpus loss rows must be null: $r"))
    assert(Curation.classifierTrained(empty, rounds = 2).count() === 0L)
  }

  test("classifier calibration: buckets close over the corpus, ordered rates") {
    val rows = Curation.classifierCalibration(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.forall(t => t._1 >= 0 && t._1 <= 9))
    // every scored doc lands in exactly one bucket
    assert(rows.map(_._2).sum === docs.count())
    rows.foreach { case (_, _, mp, tk, gap) =>
      assert(mp >= 0 && mp <= 1000 && tk >= 0 && tk <= 1000)
      assert(gap === math.abs(mp - tk))
    }
    // discrimination: the teacher keep rate in the top-scoring bucket
    // exceeds the bottom-scoring bucket's
    assert(rows.last._4 > rows.head._4,
      s"no discrimination: ${rows.head} vs ${rows.last}")
  }

  test("classifier trained scores agree with the teacher on most docs") {
    val n = docs.count()
    val scored = Curation.classifierTrained(docs)
    assert(scored.count() === n) // every doc scored, none dropped
    val agree = scored.agg(sum("agree")).head().getLong(0)
    // separable teacher + 8 GD rounds: the student must beat a
    // majority-class guess, and predictions must be two-sided
    assert(agree * 10 >= n * 9, s"agree $agree of $n")
    val preds = scored.select("label_pred").distinct().collect()
      .map(_.getString(0)).toSet
    assert(preds === Set("keep", "drop") || preds === Set("keep"))
  }
}
