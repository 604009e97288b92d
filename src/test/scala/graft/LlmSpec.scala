package graft

import graft.core.Tables
import graft.functions.vector
import graft.llm.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Ground-truth tests for the LLM-pipeline operators whose seeded
  * hashing makes them non-SQL-oracle-checkable (MinHash/SimHash/LSH),
  * plus the custom vector expressions and the multimodal stub plumbing.
  */
class LlmSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  // --- synthetic corpus with known duplicate structure -------------- //
  private lazy val synth = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", "s0"),
    (2L, "the quick brown fox jumps over the lazy dog again and again", "s0"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again", "s0"), // near dup of 1
    (4L, "completely different content about spark query engines here", "s0"),
    (5L, "yet another unrelated document mentioning snow and mountains", "s0"))
    .toDF("doc_id", "text", "source")

  test("minhash: exact duplicates always collide, unrelated never") {
    val pairs = Dedup.minhashPairs(synth, minAgree = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val dup = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(dup.isDefined, "identical docs must be candidates")
    assert(dup.get._3 === 1.0, "identical docs must agree on all components")
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L || p._2 == 5L),
      s"unrelated docs must not pass 0.5 agreement: ${pairs.mkString(",")}")
  }

  test("minhash md5 family (driver query) behaves like the kernel family") {
    // same estimator, different hash family: identical docs still
    // collide on every component, unrelated docs still never pass
    val pairs = Dedup.minhashPairsExact(synth, minAgree = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val dup = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(dup.isDefined && dup.get._3 === 1.0)
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L || p._2 == 5L))
    // and on the real corpus the two families agree on the pair SET at
    // the 0.5 threshold (both estimate the same underlying jaccard)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(Dedup.minhashPairsExact(docs)) ===
      pairSet(Dedup.minhashPairs(docs)),
      "hash families disagree on sf0.001 near-dup pairs")
  }

  test("minhash estimate tracks true shingle jaccard on real corpus") {
    val pairs = Dedup.minhashPairs(docs, minAgree = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty, "sf0.001 corpus is known to contain near-dups")
    // true 3-shingle jaccard, computed locally
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet
    val errs = pairs.map { case (a, b, est) =>
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val truth = sa.intersect(sb).size.toDouble / sa.union(sb).size
      math.abs(truth - est)
    }
    assert(errs.max <= 0.45, s"minhash-16 estimate too far off: ${errs.max}")
    assert(errs.sum / errs.length <= 0.2,
      s"mean abs error too high: ${errs.sum / errs.length}")
  }

  test("simhash: identical docs equal, near-dups closer than unrelated") {
    val sh = Dedup.simhash(synth).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sh(1L) === sh(2L))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)),
      "one-word-changed doc must be closer than unrelated doc")
  }

  test("banded simhash candidates: pigeonhole guarantee for hamming < nBands") {
    val full = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashPairsBanded(docs, nBands = 4)
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every within-source hamming<=3 pair must be recovered by banding
    // (banding also finds cross-source pairs - a superset there)
    assert(full.subsetOf(banded),
      s"banding missed guaranteed pairs: ${(full -- banded).take(5)}")
  }

  test("prefix-filter jaccard equals brute force (corpus-wide, both thresholds)") {
    def brute(threshold: Double): Set[(Long, Long)] = {
      val toks = docs.select("doc_id", "text").collect()
        .map(r => r.getLong(0) ->
          r.getString(1).split("\\s+").filter(_.nonEmpty).toSet).toMap
      (for {
        a <- toks.keys; b <- toks.keys if a < b
        j = toks(a).intersect(toks(b)).size.toDouble / toks(a).union(toks(b)).size
        if j >= threshold
      } yield (a, b)).toSet
    }
    for (t <- Seq(0.5, 0.9)) {
      val got = Dedup.jaccardPairs(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute(t), s"threshold $t: candidate generation lost pairs")
    }
  }

  test("editVerifiedPairs: payload and refetch spellings agree bit-for-bit") {
    // the two A/B spellings (heads riding the candidate join vs heads
    // re-fetched by pair-probed joins) must be the SAME operator —
    // ScaleProbe `edit` decides which ships on measured cost only
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    val a = rows(Dedup.editVerifiedPairs(docs))
    val b = rows(Dedup.editVerifiedPairsPayload(docs))
    assert(a === b, "A/B spellings diverge")
    assert(a.nonEmpty, "corpus should produce candidate pairs")
  }

  test("prefix-rank join is sub-quadratic on a realistic vocabulary (planted dups)") {
    // The bench corpus has a ~31-token vocabulary, which makes ANY
    // threshold join's OUTPUT quadratic (71% of pairs clear 0.5) and
    // hides the candidate generator's asymptotics. This corpus is the
    // regime the design targets: 20k docs over a 50k-token vocabulary —
    // 200M+ possible pairs, but random docs share ~0 tokens, so the
    // rarest-first prefix join touches only the 50 planted near-dup
    // pairs (plus astronomically unlikely collisions). Brute force at
    // this size is not even testable locally.
    val rnd = new scala.util.Random(7)
    val base = (0 until 20000).map { i =>
      (i.toLong, Array.fill(25)("w" + rnd.nextInt(50000)).mkString(" "))
    }
    val planted = (0 until 50).map { i =>
      val toks = base(i)._2.split(" ")
      toks(0) = "CHANGED" + i // one-token edit: J ~ (n-1)/(n+1) ~ 0.92
      (100000L + i, toks.mkString(" "))
    }
    val d = (base ++ planted).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = Dedup.jaccardPairs(d, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"20050 docs, 50k vocab: ${got.size} pairs in $secs%.1f s")
    val expected = (0 until 50).map(i => (i.toLong, 100000L + i)).toSet
    assert(expected.subsetOf(got), s"lost planted pairs: ${expected -- got}")
    assert(got === expected,
      s"unexpected extra pairs (random 25-of-50k docs can't reach J=0.5): " +
        s"${(got -- expected).take(5)}")
  }

  test("sorted prefixDups equals brute force on a chain-heavy multi-partition corpus") {
    // every binary string of length 1..9 -> deep prefix chains that are
    // guaranteed to straddle range-partition boundaries, plus duplicated
    // texts (same text twice is NOT a prefix dup, but both ids pair with
    // every extension)
    val texts = (1 to 9).flatMap(n =>
      (0 until (1 << n)).map(i =>
        (0 until n).map(b => if (((i >> b) & 1) == 1) 'b' else 'a').mkString))
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((10000L, "aaa"), (10001L, "ab"))
    val d = rows.toDF("doc_id", "text")
    val got = Dedup.prefixDups(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (ia, ta) <- rows; (ib, tb) <- rows
      if ta.length < tb.length && tb.startsWith(ta)
    } yield (ia, ib)).toSet
    assert(got === brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("hot-key salting preserves the exact pair set") {
    // saltTarget=64 makes every prefix rank hot on this corpus
    // (membership ~hundreds), so the probe/build sub-bucket split is
    // fully exercised — the result must be identical to the unsalted
    // default, scores included
    def pairs(st: Int) = Dedup.jaccardPairs(docs, 0.5, saltTarget = st)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(64) === pairs(4096))
  }

  test("sorted prefixDups scales past brute-force reach (planted truncations)") {
    // 20k distinct random docs (no accidental prefixes w.h.p., fixed
    // seed) + 50 planted truncations; brute force would be 400M
    // startswith evaluations. The range-sort + stack scan must return
    // exactly the planted pairs.
    val rnd = new scala.util.Random(11)
    val base = (0 until 20000).map { i =>
      (i.toLong, Array.fill(25)("w" + rnd.nextInt(50000)).mkString(" "))
    }
    val planted = (0 until 50).map { i =>
      (100000L + i, base(i)._2.take(60)) // strict prefix of base doc i
    }
    val d = (base ++ planted).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = Dedup.prefixDups(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"20050 docs: ${got.size} prefix pairs in $secs%.1f s")
    val expected = (0 until 50).map(i => (100000L + i, i.toLong)).toSet
    assert(got === expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("containment pairs equal brute force on the real corpus") {
    // mirror of the operator's shingle rule: distinct 3-token shingles,
    // whole-text fallback under 3 tokens (empty string for empty docs)
    def shingleSet(t: String): Set[String] = {
      val w = t.split("\\s+").filter(_.nonEmpty)
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val sets = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingleSet(r.getString(1))).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys
      (sa, sb) = (sets(a), sets(b))
      if sa.nonEmpty &&
        (sa.size < sb.size || (sa.size == sb.size && a < b))
      i = sa.intersect(sb).size
      if 1000L * i >= 900L * sa.size
    } yield (a, b, 1000L * i / sa.size,
      1000L * i / (sa.size + sb.size - i))).toSet
    val got = Dedup.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("containment finds the inclusion pair symmetric jaccard misses") {
    // a 20-word passage quoted verbatim inside a 100-word document:
    // full shingle containment, but J = 18/98 ~ 0.184 — below even the
    // loose 0.2 default of the symmetric shingle join. This asymmetry
    // is the operator's reason to exist.
    val big = (0 until 100).map("u" + _).mkString(" ")
    val small = (0 until 20).map("u" + _).mkString(" ")
    val d = Seq((1L, small), (2L, big), (3L, "nothing shared here at all"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(cont.toSeq === Seq((1L, 2L, 1000L)),
      s"expected exactly the planted inclusion, got ${cont.mkString(",")}")
    val jac = Dedup.jaccardShinglePairs(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)) && !jac.contains((2L, 1L)),
      "the planted pair must be invisible to symmetric jaccard at 0.5")
  }

  test("containment hot-posting salting preserves the exact pair set") {
    // saltTarget=1 marks every posting with >1 member hot, exercising
    // the replicate-probe / hash-split-index path everywhere
    def pairs(st: Int) = Dedup.containmentPairs(docs, saltTarget = st)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(pairs(1) === pairs(4096))
  }

  test("containment join is posting-bounded on a realistic vocabulary (planted inclusions)") {
    // 20k random-vocabulary docs (shingle df ~1) + 50 planted strict
    // slices; brute force is 200M pair tests. The rare-first prefix
    // probe against the posting index must return exactly the planted
    // inclusions, in bounded time.
    val rnd = new scala.util.Random(13)
    val base = (0 until 20000).map { i =>
      (i.toLong, Array.fill(40)("w" + rnd.nextInt(50000)).mkString(" "))
    }
    val planted = (0 until 50).map { i =>
      (100000L + i, base(i)._2.split(" ").slice(5, 20).mkString(" "))
    }
    val d = (base ++ planted).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = Dedup.containmentPairs(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"20050 docs, 50k vocab: ${got.size} containment pairs in $secs%.1f s")
    val expected = (0 until 50).map(i => (100000L + i, i.toLong)).toSet
    assert(got === expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("banded simhash equals corpus-wide brute force at maxHamming < nBands") {
    val sh = Dedup.simhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- sh; (ib, hb) <- sh
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val banded = Dedup.simhashPairsBanded(docs, nBands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute,
      s"missing=${(brute -- banded).take(5)} extra=${(banded -- brute).take(5)}")
  }

  test("md5-family simhash (driver query) equals brute force too") {
    // the oracle-checkable 60-bit family obeys the same pigeonhole
    // guarantee as the 64-bit kernel family
    val sh = Dedup.simhashExact(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- sh; (ib, hb) <- sh
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val banded = Dedup.simhashPairsExact(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute,
      s"missing=${(brute -- banded).take(5)} extra=${(banded -- brute).take(5)}")
    // identical docs carry identical fingerprints in this family too
    val synthSh = Dedup.simhashExact(synth).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(synthSh(1L) === synthSh(2L))
    assert(java.lang.Long.bitCount(synthSh(1L) ^ synthSh(3L)) <
      java.lang.Long.bitCount(synthSh(1L) ^ synthSh(4L)),
      "near-dup must be closer than unrelated")
  }

  test("lsh embedding pairs: exact precision, high recall on strong pairs") {
    val vecs = emb.collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Dedup.embeddingPairs(emb)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // precision is exact: every emitted pair is a true cos >= 0.3 pair
    // with the correctly-rounded score
    got.foreach { case ((a, b), s) =>
      val truth = cos(vecs(a), vecs(b))
      assert(truth >= 0.3 - 1e-9, s"false positive ($a,$b): $truth")
      assert(math.abs(s - BigDecimal(truth).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    val all = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
    } yield ((a, b), cos(vecs(a), vecs(b)))).toMap
    val strong = all.filter(_._2 >= 0.9).keySet
    val weak = all.filter(_._2 >= 0.3).keySet
    val strongRecall =
      if (strong.isEmpty) 1.0
      else strong.count(got.contains).toDouble / strong.size
    val weakRecall = weak.count(got.contains).toDouble / weak.size
    info(f"recall: cos>=0.9 $strongRecall%.3f (${strong.size}), " +
      f"cos>=0.3 $weakRecall%.3f (${weak.size})")
    assert(strongRecall >= 0.95,
      s"near-identical vectors must collide in some table: $strongRecall")
    assert(weakRecall >= 0.5, s"overall recall degenerate: $weakRecall")
  }

  test("int8 embedding pairs: exact sims + threshold; recall vs float") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)
      .toMap
    def qn(v: Array[Double]): Array[Long] = {
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      v.map(x => java.math.BigDecimal.valueOf(x / nrm * 127.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
    }
    val qns = vecs.view.mapValues(qn).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val got = Dedup.embeddingPairsInt8(emb).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // precision exact: every emitted pair has the true integer dot and
    // clears the threshold
    got.foreach { case ((a, b), s) =>
      assert(a < b)
      assert(s === dot(qns(a), qns(b)), s"sim mismatch ($a,$b)")
      assert(s >= Dedup.EmbedDupDotThreshold)
    }
    // recall vs the float-cosine truth at the equivalent threshold
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
    } yield ((a, b), cos(vecs(a), vecs(b)))).toMap
    // margin 0.31: pairs within quantization error of the 0.3 cut may
    // legitimately land on either side, so recall is measured on pairs
    // safely above it
    val safe = truth.filter(_._2 >= 0.31).keySet
    val recall =
      if (safe.isEmpty) 1.0 else safe.count(got.contains).toDouble / safe.size
    info(f"int8 pair recall (cos>=0.31): $recall%.3f (${safe.size})")
    assert(recall >= 0.5, s"int8 pair recall degenerate: $recall")
  }

  test("semDedup equals the brute-force greedy rule on its own cells") {
    // plant exact duplicates (the corpus has no true near-dups): every
    // planted copy must be dropped, and the rule replay must agree on
    // everything else
    val base = emb.select("vec_id", "embedding")
    val input = base.unionByName(
      base.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
    val res = Similarity.semDedup(input).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(res.length === input.count(), "one verdict per vector")
    val cells = res.map(r => r._1 -> r._2).toMap
    val vecs = input.collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // replay the greedy min-id rule on the cells the operator itself
    // assigned (the codebook is float-iterative, so the cells are the
    // operator's contract; the DROP decision within them must match
    // exact brute force)
    val ids = vecs.keys.toSeq.sorted
    val shouldDrop = (for {
      b <- ids
      if ids.exists(a => a < b && cells(a) == cells(b) &&
        cos(vecs(a), vecs(b)) >= 0.96)
    } yield b).toSet
    val gotDrop = res.collect { case (id, _, "drop") => id }.toSet
    assert(gotDrop === shouldDrop,
      s"missing=${(shouldDrop -- gotDrop).take(5)} " +
        s"extra=${(gotDrop -- shouldDrop).take(5)}")
    assert(shouldDrop.nonEmpty,
      "fixture must exercise the drop path (eps too high?)")
  }

  test("cosine_similarity expression matches double-precision formula") {
    val rows = emb.limit(50).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = cos(rows(0), rows(1))
    val pair = emb.filter(col("vec_id") === 0)
      .crossJoin(emb.filter(col("vec_id") === 1)
        .select(col("embedding").as("emb_b")))
    val got = pair
      .select(vector.cosine_similarity(col("embedding"), col("emb_b")))
      .head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
    // self-similarity is exactly 1 up to fp
    val self = pair
      .select(vector.cosine_similarity(col("embedding"), col("embedding")))
      .head().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("multi-table lsh recall beats single-table; both beat zero") {
    val n = emb.count().toInt
    val brute = Similarity.bruteForceTopK(emb, nQueries = n, k = 11)
      .filter(col("rank") > 1) // drop self-match (rank 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recall(nTables: Int): Double = {
      val lsh = Similarity.lshTopK(emb, nPlanes = 4, k = 10, nTables = nTables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val hits = brute.toSeq.map { case (q, truth) =>
        lsh.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      hits.sum / hits.size
    }
    assert(Similarity.lshBuckets(emb, 4).count() === n.toLong)
    val r1 = recall(1)
    val r2 = recall(2)
    info(f"recall@10: 1 table = $r1%.3f, 2 tables = $r2%.3f")
    assert(r1 > 0.05, s"single-table recall degenerate: $r1")
    assert(r2 > r1, s"multi-table must improve recall: $r2 vs $r1")
  }

  test("int8 lsh ann: sims replay exactly in memory; recall tracks float") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)
      .toMap
    // mirror of withUnitQuantized: HALF_UP rounding like Spark's round()
    def qn(v: Array[Double]): Array[Long] = {
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      v.map(x => java.math.BigDecimal.valueOf(x / nrm * 127.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
    }
    val res = Similarity.lshTopKInt8(emb, k = 10).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val (a, b, sim) = (r.getLong(0), r.getLong(1), r.getLong(3))
      val expect = qn(vecs(a)).zip(qn(vecs(b))).map { case (x, y) => x * y }.sum
      assert(sim === expect, s"pair ($a,$b): engine $sim vs replay $expect")
    }
    // ranking over quantized dots still finds the float-cosine neighbors
    val brute = Similarity.bruteForceTopK(emb, nQueries = vecs.size, k = 11)
      .filter(col("rank") > 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val got = res.map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = brute.toSeq.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val recall = hits.sum / hits.size
    info(f"int8 lsh recall@10: $recall%.3f")
    assert(recall > 0.05, s"int8 recall degenerate: $recall")
  }

  test("ivf ann: more probes raise recall; assignments cover the corpus") {
    val n = emb.count().toInt
    val brute = Similarity.bruteForceTopK(emb, nQueries = n, k = 11)
      .filter(col("rank") > 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recall(nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(emb, k = 10, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val hits = brute.toSeq.map { case (q, truth) =>
        ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      hits.sum / hits.size
    }
    val r1 = recall(1)
    val r3 = recall(3)
    info(f"ivf recall@10: 1 probe = $r1%.3f, 3 probes = $r3%.3f")
    assert(r1 > 0.05, s"single-probe recall degenerate: $r1")
    assert(r3 > r1, s"more probes must improve recall: $r3 vs $r1")
  }

  test("int8 ivf ann: recall tracks float; int8 semDedup drops every plant") {
    val n = emb.count().toInt
    val brute = Similarity.bruteForceTopK(emb, nQueries = n, k = 11)
      .filter(col("rank") > 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopKInt8(emb, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = brute.toSeq.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val recall = hits.sum / hits.size
    info(f"int8 ivf recall@10: $recall%.3f")
    assert(recall > 0.05, s"int8 ivf recall degenerate: $recall")
    // planted exact duplicates must always drop: identical vectors
    // quantize identically, so the pair scores |qn|^2 >= the eps cut
    val e = emb.select("vec_id", "embedding")
    val planted = e.unionByName(e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
    val actions = Similarity.semDedupInt8(planted).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val plantIds = actions.keys.filter(_ >= 10000000L)
    assert(plantIds.nonEmpty)
    plantIds.foreach { id =>
      assert(actions(id) === "drop", s"planted duplicate $id not dropped")
    }
  }

  test("int8 ivf search: full-probe equals exact int8 top-k per query") {
    val queries = emb.filter(col("vec_id") % Similarity.SearchQueryMod === 0)
    // probing ALL cells makes the candidate set the whole corpus (minus
    // the identity id), so the approximate path must equal exact top-k
    // over the quantized dots — the strongest property the operator has
    val res = Similarity.ivfSearchInt8(
      emb, queries, k = 5, nCells = 16, nProbe = 16).collect()
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)
      .toMap
    def qn(v: Array[Double]): Array[Long] = {
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      v.map(x => java.math.BigDecimal.valueOf(x / nrm * 127.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
    }
    val q = vecs.map { case (id, v) => id -> qn(v) }
    val expect = q.keys.filter(_ % Similarity.SearchQueryMod == 0).flatMap { qid =>
      q.keys.filter(_ != qid).map(nid =>
          (nid, q(qid).zip(q(nid)).map { case (a, b) => a * b }.sum))
        .toSeq.sortBy { case (nid, sim) => (-sim, nid) }.take(5)
        .zipWithIndex.map { case ((nid, sim), i) => (qid, nid, i + 1L, sim) }
    }.toSet
    val got = res.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    // default narrow probing still finds most of the full-probe answers
    val narrow = Similarity.ivfSearchInt8(emb, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = res.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = narrow.intersect(full).size.toDouble / full.size
    info(f"ivf search recall@5 (2 of 16 probes): $recall%.3f")
    assert(recall > 0.05, s"serving recall degenerate: $recall")
  }

  test("bmp codec: encode->decode round-trips every stride padding (0..3)") {
    for (w <- 5 to 8; h <- Seq(1, 3)) {
      def px(x: Int, y: Int, c: Int): Int = (x * 31 + y * 17 + c * 7 + 5) % 256
      val bytes = graft.llm.BmpCodec.encode(w, h, px)
      val r = graft.llm.BmpCodec.decode(bytes)
      assert((r.width, r.height) === (w, h))
      for (x <- 0 until w; y <- 0 until h; c <- 0 until 3)
        assert((r.pixels((y * w + x) * 3 + c) & 0xff) === px(x, y, c),
          s"w=$w h=$h pixel ($x,$y,$c)")
    }
  }

  test("bmp codec: decodes top-down (negative height) files too") {
    def px(x: Int, y: Int, c: Int): Int = (x + 10 * y + 100 * c) % 256
    val w = 5; val h = 3
    val bottomUp = graft.llm.BmpCodec.encode(w, h, px)
    // flip the height sign and reverse the stored row order -> a valid
    // top-down file with identical image content
    val stride = (w * 3 + 3) & ~3
    val topDown = bottomUp.clone()
    java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -h)
    for (row <- 0 until h)
      System.arraycopy(bottomUp, 54 + (h - 1 - row) * stride,
        topDown, 54 + row * stride, stride)
    assert(graft.llm.BmpCodec.decode(topDown).pixels.toSeq ===
      graft.llm.BmpCodec.decode(bottomUp).pixels.toSeq)
  }

  test("bmp codec: rejects garbage loudly instead of emitting pixels") {
    val bad = Seq(
      Array.empty[Byte],
      "not a bitmap at all, just text".getBytes,
      graft.llm.BmpCodec.encode(4, 4, (_, _, _) => 0).take(40)) // truncated
    bad.foreach { b =>
      assertThrows[IllegalArgumentException](graft.llm.BmpCodec.decode(b))
    }
  }

  test("wav codec: encode/decode round trip preserves every sample") {
    val samples = Array.tabulate[Short](777)(i => ((i * 31 - 12345) % 32768).toShort)
    val w = graft.llm.WavCodec.decode(graft.llm.WavCodec.encode(44100, samples))
    assert(w.sampleRate === 44100)
    assert(w.samples.toSeq === samples.toSeq)
  }

  test("wav codec: skips unknown chunks, rejects garbage loudly") {
    import graft.llm.WavCodec
    // LIST chunk between fmt and data must be skipped (odd size: RIFF
    // pads to even, the offset the chunk walk must honor)
    val good = WavCodec.encode(8000, Array[Short](1, -2, 3))
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 'a', 'b', 'c', 'd', 'e', 0)
    val withList = good.take(36) ++ list ++ good.drop(36)
    assert(WavCodec.decode(withList).samples.toSeq === Seq[Short](1, -2, 3))
    val bad = Seq(
      Array.empty[Byte],
      "just some text, definitely not RIFF audio".getBytes,
      good.take(20), // truncated fmt
      { val b = good.clone(); b(20) = 2; b }, // format tag 2 (ADPCM)
      { val b = good.clone(); b(22) = 2; b }) // stereo
    bad.foreach { b =>
      assertThrows[IllegalArgumentException](WavCodec.decode(b))
    }
  }

  test("wav codec: adversarial u32 chunk sizes raise IAE, not AIOOBE/OOM") {
    // a data chunk declaring 0xFFFFFFF0 bytes would be negative as Int;
    // the u32 Long read must range-check it against the real length
    val good = graft.llm.WavCodec.encode(8000, Array[Short](1, 2, 3))
    val evil = good.clone()
    // data chunk size field sits at offset 40 in the canonical layout
    evil(40) = 0xf0.toByte; evil(41) = 0xff.toByte
    evil(42) = 0xff.toByte; evil(43) = 0xff.toByte
    assertThrows[IllegalArgumentException](graft.llm.WavCodec.decode(evil))
  }

  test("y4m codec: encode/decode round trip preserves every luma plane") {
    import graft.llm.Y4mCodec
    val v = Y4mCodec.decode(Y4mCodec.encode(6, 4, 3,
      (f, x, y) => f * 50 + x * 7 + y * 3, fpsNum = 30))
    assert((v.width, v.height, v.fpsNum, v.fpsDen) === ((6, 4, 30, 1)))
    assert(v.lumaFrames.length === 3)
    for (f <- 0 until 3; y <- 0 until 4; x <- 0 until 6)
      assert((v.lumaFrames(f)(y * 6 + x) & 0xff) === (f * 50 + x * 7 + y * 3) % 256,
        s"f=$f x=$x y=$y")
  }

  test("y4m codec: rejects garbage and adversarial headers loudly") {
    import graft.llm.Y4mCodec
    val good = Y4mCodec.encode(4, 2, 1, (_, _, _) => 0)
    val bad = Seq(
      Array.empty[Byte],
      "MPEG4 is not this format at all........".getBytes,
      good.dropRight(3), // truncated chroma plane
      new String(good, "ISO-8859-1").replace("W4", "W5").getBytes("ISO-8859-1"), // odd width
      new String(good, "ISO-8859-1")
        .replace("W4", "W2000000000").getBytes("ISO-8859-1")) // overflow dims
    bad.foreach { b =>
      assertThrows[IllegalArgumentException](Y4mCodec.decode(b))
    }
  }

  test("decontamination matches local brute force; shuffle path identical") {
    // corpus split 99%/1% by doc_id % 97: the 1% is the "eval set",
    // flagged docs are those sharing >= 2 distinct 3-shingles with it
    val corpus = docs.limit(400)
    val ref = corpus.filter(col("doc_id") % 97 === 0)
    val corp = corpus.filter(col("doc_id") % 97 =!= 0)
    val out = Dedup.decontaminate(corp, ref).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val texts = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def sh(t: String): Set[String] = {
      val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val refSh = texts.filter(_._1 % 97 == 0).flatMap(p => sh(p._2)).toSet
    val truth = texts.filter(_._1 % 97 != 0).map { case (id, t) =>
      val s = sh(t)
      (id, (s.count(refSh.contains).toLong, s.size.toLong))
    }.filter(_._2._1 >= 2).toMap
    assert(out === truth)
    assert(out.nonEmpty, "fixture corpus must contain contaminated docs")
    assert(out.size < texts.length,
      "decontamination must not flag the whole corpus")
    // the shuffle-join path (reference outgrows an executor) must be
    // result-identical to the broadcast default
    val shuf = Dedup.decontaminate(corp, ref, broadcastRef = false).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(shuf === out)
    // bloom-prefiltered path: the sketch only prunes, the exact join
    // verifies — result must be identical at any fpp
    val bloom = Dedup.decontaminateBloom(corp, ref).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(bloom === out)
    val bloomCoarse = Dedup.decontaminateBloom(corp, ref, fpp = 0.5).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(bloomCoarse === out, "a coarse sketch may pass more candidates " +
      "to the verify join but must never change the verified result")
  }

  test("incremental dedup: new-batch anti-join equals set difference") {
    val incoming = docs.filter(col("source") === "src0")
    val standing = docs.filter(col("source") =!= "src0")
    val got = Dedup.incrementalNew(incoming, standing).collect()
      .map(_.getLong(0)).sorted
    val standingTexts = standing.select("text").collect()
      .map(_.getString(0)).toSet
    val want = incoming.select("doc_id", "text").collect()
      .filter(r => !standingTexts.contains(r.getString(1)))
      .map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty, "src0 should contribute genuinely new docs")
  }

  test("dup clusters: shuffle-join path computes identical labels to broadcast") {
    // broadcastLabels=false is the 100TB shape (label table outgrows an
    // executor): co-partitioned shuffle joins, edges partitioned once.
    // The two paths must be result-identical — min-label propagation is
    // deterministic regardless of join strategy.
    val corpus = docs.limit(300)
    val viaBroadcast = graft.llm.Dedup.dupClusters(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaShuffle = graft.llm.Dedup.dupClusters(corpus, broadcastLabels = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaShuffle === viaBroadcast)
    assert(viaBroadcast.exists { case (id, c) => id != c },
      "fixture corpus must contain at least one non-singleton cluster")
  }

  test("bmp codec: adversarial huge-dimension headers raise IAE, not AIOOBE") {
    // width > ~715M makes `width * 3` overflow Int; before the Long-math
    // fix the negative stride slipped past the bounds require and died
    // as ArrayIndexOutOfBounds — escaping decodeImages' quarantine
    // routing, which catches only IllegalArgumentException.
    val base = graft.llm.BmpCodec.encode(4, 4, (_, _, _) => 0)
    def withDims(w: Int, h: Int): Array[Byte] = {
      val b = base.clone()
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(18, w).putInt(22, h)
      b
    }
    val adversarial = Seq(
      withDims(750 * 1000 * 1000, 1),   // width*3 overflows Int
      withDims(1431655766, 1),          // width*3 wraps to exactly 2
      withDims(46341, 46341),           // width*height*3 overflows
      withDims(Int.MaxValue, Int.MaxValue))
    adversarial.foreach { b =>
      assertThrows[IllegalArgumentException](graft.llm.BmpCodec.decode(b))
    }
  }

  test("multimodal decode: real BMP kernel, schema and determinism") {
    val decoded = Multimodal.decodeImages(spark, Multimodal.bmpFixtures(docs.limit(20)))
    val rows = decoded.collect()
    assert(rows.length === 20)
    rows.foreach { img =>
      assert(img.channels === 3)
      assert(img.width === (img.doc_id % 13).toInt + 5)
      assert(img.height === (img.doc_id % 7).toInt + 3)
      assert(img.pixels.length === img.width * img.height * img.channels)
      // decoded (x,y,c) must be the generator's arithmetic exactly
      val w = img.width
      for (x <- 0 until w; c <- 0 until 3)
        assert((img.pixels(x * 3 + c) & 0xff) ===
          ((x * 3 + c * 11 + img.doc_id) % 256).toInt, s"(${x},0,$c)")
    }
    val again = Multimodal.decodeImages(spark, Multimodal.bmpFixtures(docs.limit(20)))
      .collect()
    assert(rows.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.pixels.sameElements(b.pixels) })
  }

  test("resize produces exact target dims and preserves corner pixels") {
    val decoded = Multimodal.decodeImages(spark, Multimodal.bmpFixtures(docs.limit(10)))
    val resized = Multimodal.resize(spark, decoded, 16, 12).collect()
    val originals = decoded.collect().map(i => i.doc_id -> i).toMap
    assert(resized.length === 10)
    resized.foreach { r =>
      assert((r.width, r.height) === (16, 12))
      assert(r.pixels.length === 16 * 12 * 3)
      // nearest-neighbor maps (0,0) to (0,0): top-left pixel survives
      val o = originals(r.doc_id)
      assert(r.pixels.take(3).toSeq === o.pixels.take(3).toSeq)
    }
  }

  test("decoded stats flow back into relational ops") {
    val stats = Multimodal.decodedStats(spark, docs.limit(20))
    assert(stats.count() === 20)
    assert(stats.columns.toSeq ===
      Seq("doc_id", "width", "height", "pixel_sum", "pos_sum", "top_left"))
  }

  test("sceneCuts: per-transition deltas match the closed form exactly") {
    val sample = docs.limit(50)
    val got = Multimodal.sceneCuts(spark, sample).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val ids = sample.select("doc_id").collect().map(_.getLong(0))
    var n = 0
    ids.foreach { id =>
      val w = (id % 3 + 2) * 2; val h = (id % 2 + 1) * 2; val nf = id % 5 + 1
      for (f <- 1L until nf) {
        val delta = (for { x <- 0L until w; y <- 0L until h } yield
          math.abs((id + f * 37 + x * 5 + y * 11) % 256 -
            (id + (f - 1) * 37 + x * 5 + y * 11) % 256)).sum
        val cut = if (delta >= 64 * w * h) 1L else 0L
        assert(got((id, f)) === ((delta, cut)), s"doc $id frame $f")
        n += 1
      }
    }
    assert(got.size === n, "exactly one row per consecutive-frame pair")
  }

  test("audioVad: frame energies match the closed-form waveform") {
    val sample = docs.limit(50)
    val got = Multimodal.audioVad(spark, sample).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ids = sample.select("doc_id").collect().map(_.getLong(0))
    var n = 0
    ids.foreach { id =>
      val ns = (id % 50 + 20).toInt
      (0 until ns).grouped(10).zipWithIndex.foreach { case (idxs, fi) =>
        val e = idxs.map { i =>
          val v = (id * 31 + i * 17) % 2003 - 1001
          v * v
        }.sum
        val speech = if (e >= 3000000L) 1L else 0L
        assert(got((id, fi.toLong)) === ((idxs.size.toLong, e, speech)),
          s"doc $id frame $fi")
        n += 1
      }
    }
    assert(got.size === n, "one row per frame, last frame partial")
    // the threshold must actually segment (both classes present)
    val flags = got.values.map(_._3).toSet
    assert(flags === Set(0L, 1L), s"threshold degenerate: $flags")
  }

  test("lumaStats: per-image luma panel matches the closed-form pixels") {
    val sample = docs.limit(50)
    val got = Multimodal.lumaStats(spark, sample).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val ids = sample.select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      val w = (id % 13 + 5).toInt; val h = (id % 7 + 3).toInt
      val ls = for { y <- 0 until h; x <- 0 until w } yield {
        def v(c: Int) = (x * 3 + y * 7 + c * 11 + id) % 256
        (299 * v(0) + 587 * v(1) + 114 * v(2)) / 1000
      }
      val n = w.toLong * h
      val (s1, s2) = (ls.sum, ls.map(l => l * l).sum)
      assert(got(id) === ((n, s1 / n, ls.min, ls.max, n * s2 - s1 * s1)),
        s"doc $id")
    }
    // variance numerator is non-negative by Cauchy-Schwarz; zero only
    // for a flat image (the fixture is never flat)
    got.values.foreach { case (_, _, _, _, vn) => assert(vn > 0L) }
  }

  test("audioDownsample: pair sums and checksum match the closed form") {
    val sample = docs.limit(50)
    val got = Multimodal.audioDownsample(spark, sample).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val ids = sample.select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      val n = (id % 50 + 20).toInt
      def s(i: Int) = (id * 31 + i * 17) % 2003 - 1001
      val out = (0 until (n + 1) / 2).map { i =>
        s(2 * i) + (if (2 * i + 1 < n) s(2 * i + 1) else 0L)
      }
      val chk = out.zipWithIndex.map { case (v, i) => (i + 13L) * v }.sum
      val rate = 8000L + (id % 4) * 4000L
      assert(got(id) ===
        ((rate / 2, out.length.toLong, out.min, out.max, chk)), s"doc $id")
    }
  }

  test("duplicateSpans merges windows into maximal spans (closed form)") {
    // k=3 fixture with every case hand-derivable:
    //  - docs 1/2 share "a b c d" -> windows abc,bcd dup; one 4-token span
    //  - doc 3 shares nothing -> zero spans
    //  - doc 4 repeats "m n o" x3 WITHIN itself -> all 7 windows dup,
    //    one span covering all 9 tokens
    //  - docs 5/6 share two SEPARATED runs (abc / def) -> two spans each
    // tokens are letter-runs and every token below is unique to its
    // role: shared runs never collide across doc pairs
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d z w"),
      (3L, "p q r s t u v"),
      (4L, "m n o m n o m n o"),
      (5L, "ga gb gc qa qb qc qd qe qf qg ha hb hc"),
      (6L, "ga gb gc za zb zc ha hb hc"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(d, k = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) === ((8L, 1L, 4L, 0.5)))
    assert(got(2L) === ((8L, 1L, 4L, 0.5)))
    assert(got(3L) === ((7L, 0L, 0L, 0.0)))
    assert(got(4L) === ((9L, 1L, 9L, 1.0)))
    assert(got(5L) === ((13L, 2L, 6L, round4(6.0 / 13))))
    assert(got(6L) === ((9L, 2L, 6L, round4(6.0 / 9))))
  }

  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("image near-dups: banded join equals brute-force hamming pairs") {
    val media = Multimodal.bmpFixtures(docs.limit(100))
    val input = media.unionByName(
      media.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("media")))
    val hashes = Multimodal.imageHashes(spark, input).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val got = Multimodal.imageNearDups(spark, input).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    // the planted exact copies are hamming-0 pairs and must all appear
    val planted = hashes.map(_._1).filter(_ >= 10000000L)
      .map(id => (id - 10000000L, id)).toSet
    assert(planted.subsetOf(got), s"planted copies missed: ${planted -- got}")
  }

  test("audio near-dups: banded join equals brute force; copies found") {
    val media = Multimodal.wavFixtures(docs.limit(100))
    val input = media.unionByName(
      media.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("media")))
    val hashes = Multimodal.audioHashes(spark, input).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val got = Multimodal.audioNearDups(spark, input).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    val planted = hashes.map(_._1).filter(_ >= 10000000L)
      .map(id => (id - 10000000L, id)).toSet
    assert(planted.subsetOf(got), s"planted copies missed: ${planted -- got}")
  }

  test("video near-dups: banded join equals brute force; copies found") {
    val media = Multimodal.y4mFixtures(docs.limit(100))
    val input = media.unionByName(
      media.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("media")))
    val hashes = Multimodal.videoHashes(spark, input).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val got = Multimodal.videoNearDups(spark, input).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    val planted = hashes.map(_._1).filter(_ >= 10000000L)
      .map(id => (id - 10000000L, id)).toSet
    assert(planted.subsetOf(got), s"planted copies missed: ${planted -- got}")
  }

  test("duplicateSpanRemove keeps exactly the tokens duplicateSpans spares") {
    val report = Dedup.duplicateSpans(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(3))).toMap
    val cleaned = Dedup.duplicateSpanRemove(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(cleaned.length === report.size)
    cleaned.foreach { case (id, nKept, md5hex) =>
      assert(nKept === report(id), s"doc $id kept-count mismatch")
      assert(md5hex.length === 32)
    }
    // a fully-duplicated doc cleans to the empty string's md5
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert(cleaned.exists(_._2 == 0L) ===
      cleaned.exists(c => c._2 == 0L && c._3 == emptyMd5))
  }

  test("quality-aware survivors agree with min-id survivors on clusters") {
    import org.apache.spark.sql.functions.col
    // same clustering underneath: identical cluster ids and member
    // counts; only the picked representative may differ, and the best
    // pick's quality must be >= the min-id pick's
    val base = graft.llm.Dedup.dedupSurvivors(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val best = graft.llm.Dedup.dedupSurvivorsBest(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(best.map(_._1).toSet === base.keySet)
    best.foreach { case (cluster, _, n) =>
      assert(base(cluster) === n, s"member count differs for $cluster")
    }
  }

  test("soft-dedup weights: one row per doc, weight = 1e6 div cluster size") {
    val rows = graft.llm.Dedup.softDedupWeights(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length.toLong === docs.count())
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (id, sz, w) =>
      assert(sz >= 1L)
      assert(w === 1000000L / sz, s"doc $id weight $w != 1e6/$sz")
    }
    // cluster sizes agree with the clustering this composes on
    val szByDoc = graft.llm.Dedup.dupClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).values.flatMap(ms => ms.map(m => m._1 -> ms.length.toLong))
      .toMap
    rows.foreach { case (id, sz, _) =>
      assert(sz === szByDoc.getOrElse(id, 1L), s"doc $id size $sz")
    }
    // clustered docs exist on this corpus, so some weight < 1
    assert(rows.exists(_._3 < 1000000L))
  }

  test("winnowing guarantee: docs sharing a w+k-1 token run share a hash") {
    val k = 4; val w = 5
    // doc 1 = X ++ SHARED, doc 2 = SHARED ++ Z where |SHARED| = w+k-1:
    // winnowing MUST select at least one common k-gram hash from the
    // shared run. doc 3 is disjoint — overlap would be a hash accident.
    val shared = (1 to (w + k - 1)).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (1L, ("x1 x2 x3 x4 x5 x6 " + shared)),
      (2L, (shared + " z1 z2 z3 z4 z5 z6")),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12"))
      .toDF("doc_id", "text")
    val sets = graft.llm.TextOps.winnowSets(d, k, w).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("selected").toSet).toMap
    assert((sets(1L) intersect sets(2L)).nonEmpty, "shared run not detected")
    assert((sets(1L) intersect sets(3L)).isEmpty, "disjoint docs collide")
    // and the public digest distinguishes all three
    val digests = graft.llm.TextOps.winnow(d, k, w).collect()
      .map(_.getString(3)).toSet
    assert(digests.size === 3)
  }

  test("clusterSplit: no near-dup cluster ever crosses a split boundary") {
    val res = graft.llm.Sampling.clusterSplit(docs)
    // the leakage-safety invariant the operator exists for
    val crossers = res.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(crossers === 0L, "a cluster was assigned to multiple splits")
    // every doc assigned exactly once, splits roughly 80/10/10
    assert(res.count() === docs.count())
    val bySplit = res.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train") > bySplit.getOrElse("val", 0L) &&
      bySplit("train") > bySplit.getOrElse("test", 0L))
  }

  test("winnowSelected column expr == winnowSets aggregate, bit-equal " +
      "on the real corpus") {
    // the venn shared scan computes the winnow fingerprints with the
    // shuffle-free HOF spelling; it must reproduce the window+agg
    // spelling EXACTLY or the venn pair set silently diverges from
    // q_dedup_winnow's
    val k = 4; val w = 5
    val viaAgg = graft.llm.TextOps.winnowSets(docs, k, w)
      .select("doc_id", "selected").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("selected").toSeq).toMap
    val viaExpr = docs.select(col("doc_id"),
        graft.llm.TextOps.winnowSelected(col("text"), k, w).as("selected"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("selected").toSeq).toMap
    assert(viaExpr.keySet === viaAgg.keySet)
    viaAgg.foreach { case (id, sel) =>
      assert(viaExpr(id) === sel, s"selected set differs for doc $id")
    }
  }

  // --- product quantization ----------------------------------------- //

  /** Unit-int8 quantization of every embedding, the spec-side replay. */
  private def unitQn: Map[Long, Array[Long]] =
    emb.select("vec_id", "embedding").collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      r.getLong(0) -> v.map(x => java.math.BigDecimal.valueOf(x / nrm * 127.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
    }.toMap

  /** Brute-force per-subspace assignment with the kernel's exact
    * metric (|m|^2 - 2 x·m, ties by cell id).
    */
  private def pqCode(
      books: Array[Array[Array[Long]]], x: Array[Long], s: Int): Int =
    books(s).zipWithIndex.map { case (m, c) =>
      val mm = m.map(v => v * v).sum
      val xm = x.slice(s * 8, (s + 1) * 8).zip(m).map { case (a, b) => a * b }.sum
      (mm - 2 * xm, c)
    }.min._2

  test("pq encode: codeword and recon_err equal the brute-force replay") {
    val books = Similarity.pqCodebooks(emb)
    assert(books.length === 8)
    assert(books.forall(_.length === 16))
    assert(books.forall(_.forall(_.length === 8)))
    // deterministic training: a re-run reproduces the codebook bit-for-bit
    val again = Similarity.pqCodebooks(emb)
    assert(books.flatten.flatten.toSeq === again.flatten.flatten.toSeq)
    // centroids stay int8-range (pack_int8 in the ADC path requires it)
    assert(books.flatten.flatten.forall(v => v >= -127L && v <= 127L))
    val vecs = unitQn
    val enc = Similarity.pqEncode(emb, books).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc.size === vecs.size)
    vecs.foreach { case (id, x) =>
      val codes = (0 until 8).map(s => pqCode(books, x, s))
      val cw = (0 until 8).map(s => codes(s).toLong << (4 * s)).sum
      val err = (0 until 8).map { s =>
        val m = books(s)(codes(s))
        x.slice(s * 8, (s + 1) * 8).zip(m)
          .map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      assert(enc(id) === ((cw, err)), s"vec $id: got ${enc(id)}")
    }
  }

  test("pq adc top-k: exact ADC replay; recall vs exact int8 nonzero") {
    val books = Similarity.pqCodebooks(emb)
    val vecs = unitQn
    def recon(x: Array[Long]): Array[Long] =
      (0 until 8).flatMap(s => books(s)(pqCode(books, x, s))).toArray
    val reconOf = vecs.map { case (id, x) => id -> recon(x) }
    val expect = (0L until 5L).flatMap { qid =>
      val q = vecs(qid)
      vecs.keys.filter(_ != qid).map { nid =>
        (nid, q.zip(reconOf(nid)).map { case (a, b) => a * b }.sum)
      }.toSeq.sortBy { case (nid, sim) => (-sim, nid) }.take(10)
        .zipWithIndex.map { case ((nid, sim), i) => (qid, nid, i + 1L, sim) }
    }.toSet
    val got = Similarity.pqTopK(emb, books).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expect)
    // PQ at 16 cells x 8 subspaces is coarse — recall must still beat
    // the degenerate floor against exact unit-int8 top-10
    val exact = (0L until 5L).map { qid =>
      val q = vecs(qid)
      qid -> vecs.keys.filter(_ != qid).map { nid =>
        (nid, q.zip(vecs(nid)).map { case (a, b) => a * b }.sum)
      }.toSeq.sortBy { case (nid, sim) => (-sim, nid) }.take(10)
        .map(_._1).toSet
    }.toMap
    val gotByQ = got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val hits = exact.map { case (q, truth) =>
      gotByQ.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val recall = hits.sum / hits.size
    info(f"pq adc recall@10: $recall%.3f")
    assert(recall > 0.05, s"pq recall degenerate: $recall")
  }

  test("ivf-pq: full-probe equals the brute replay; residuals tighten recon") {
    val cents = Similarity.ivfCentroidsInt8(emb)
    val books = Similarity.pqCodebooksQ(
      Similarity.ivfResiduals(emb, cents).select("vec_id", "qn"))
    val vecs = unitQn
    def cellOf(x: Array[Long]): Int =
      cents.zipWithIndex.map { case (mArr, c) =>
        (mArr.map(v => v * v).sum
          - 2 * x.zip(mArr).map { case (a, b) => a * b }.sum, c)
      }.min._2
    def fullRecon(x: Array[Long]): Array[Long] = {
      val c = cellOf(x)
      val r = x.zip(cents(c)).map { case (a, b) => a - b }
      val rec = (0 until 8).flatMap(s => books(s)(pqCode(books, r, s)))
      cents(c).zip(rec).map { case (a, b) => a + b }
    }
    val reconOf = vecs.map { case (id, x) => id -> fullRecon(x) }
    // probing ALL cells makes the candidate set the whole corpus, so
    // the index path must equal the exact ADC scan
    val expect = (0L until 5L).flatMap { qid =>
      val q = vecs(qid)
      vecs.keys.filter(_ != qid).map { nid =>
        (nid, q.zip(reconOf(nid)).map { case (a, b) => a * b }.sum)
      }.toSeq.sortBy { case (nid, sim) => (-sim, nid) }.take(10)
        .zipWithIndex.map { case ((nid, sim), i) => (qid, nid, i + 1L, sim) }
    }.toSet
    val got = Similarity.ivfPqTopK(emb, cents, books, nProbe = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expect)
    // the reason residual PQ exists: quantizing the (tighter) residual
    // cloud reconstructs closer than quantizing raw vectors with the
    // same 8x16 budget
    val plainBooks = Similarity.pqCodebooks(emb)
    def sqErr(x: Array[Long], r: Array[Long]): Long =
      x.zip(r).map { case (a, b) => (a - b) * (a - b) }.sum
    val residErr = vecs.map { case (id, x) => sqErr(x, reconOf(id)) }.sum
    val plainErr = vecs.map { case (_, x) =>
      sqErr(x, (0 until 8).flatMap(s =>
        plainBooks(s)(pqCode(plainBooks, x, s))).toArray)
    }.sum
    info(s"total squared recon error: ivf-pq $residErr vs plain pq $plainErr")
    assert(residErr < plainErr,
      s"residual PQ should reconstruct tighter: $residErr vs $plainErr")
  }

  // -------------------------------------------------------- kappa

  test("label kappa: 1000 on perfect agreement, exactly 0 on a constant labeler") {
    import graft.llm.TextOps
    def mk(rows: Seq[(Long, String, String)]) =
      rows.map { case (i, t, l) => (i, t, l, "s0") }
        .toDF("doc_id", "text", "lang", "source")
    // marker words force pred_lang == lang for every doc
    val perfect = mk(Seq(
      (1L, "der und nicht", "de"), (2L, "die das ist der", "de"),
      (3L, "the and of", "en"), (4L, "to is it the", "en"),
      (5L, "el la los", "es")))
    val p = TextOps.labelKappa(perfect).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      assert(r.getLong(7) === 1000L, s"perfect agreement must be 1000: $r")
      assert(r.getLong(6) === 1000L)
    }
    // a constant labeler (every text is English markers) earns the
    // majority-class accuracy but kappa EXACTLY 0 — the chance
    // correction working as designed
    val constant = mk(Seq(
      (1L, "the and of", "de"), (2L, "the to is", "en"),
      (3L, "the of it", "en"), (4L, "the is and", "fr")))
    val c = TextOps.labelKappa(constant).collect()
    c.foreach { r =>
      assert(r.getLong(7) === 0L, s"constant labeler must score 0: $r")
    }
    // agreement is the majority share: 2 of 4 docs gold-en
    assert(c.head.getLong(6) === 500L)
  }

  // ---------------------------------------------------------- PCA

  test("pca: recovers a planted dominant direction") {
    // 40 vectors along a fixed direction (both signs, varying length)
    // + 6 low-energy vectors on an orthogonal axis: the dominant
    // component must align with the planted direction
    val dir = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val ortho = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else 1.0f)
    val rows =
      (1 to 40).map { k =>
        val s = (if (k % 2 == 0) 1 else -1) * (1.0f + k / 10.0f)
        (k.toLong, dir.map(_ * s).toSeq, 0)
      } ++ (41 to 46).map { k =>
        (k.toLong, ortho.map(_ * 0.3f).toSeq, 1)
      }
    val e = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.pcaPower(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.length === 64)
    val v = got.map(_._2.toDouble)
    val cos = {
      val num = v.zip(dir.map(_.toDouble)).map { case (a, b) => a * b }.sum
      val d1 = math.sqrt(v.map(x => x * x).sum)
      val d2 = math.sqrt(dir.map(x => x.toDouble * x).sum)
      math.abs(num) / (d1 * d2)
    }
    assert(cos > 0.99, s"eigvec should align with the plant, cos=$cos")
    // the planted direction carries most of the variance: the scatter
    // matrix is 471040*dd' + 61440*J here, so lambda1/trace =
    // 471040/(471040+61440) = 0.8846 -> 884 permille analytically
    assert(got.head._3 === 884L, s"var explained ${got.head._3}")
    // sign convention: first nonzero component positive
    assert(v.find(_ != 0.0).get > 0)
  }

  test("pca top-2: recovers two planted orthogonal directions in order") {
    // period-2 and period-4 sign patterns are exactly orthogonal;
    // plant 40 vectors on d1 and 12 on d2 (both signs each, so
    // neither direction shows up in the mean)
    val d1 = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    val d2 = Array.tabulate(64)(i => if (i % 4 < 2) 1.0 else -1.0)
    val rows =
      (1 to 40).map { k =>
        val s = (if (k % 2 == 0) 1 else -1) * (1.0f + k / 10.0f)
        (k.toLong, d1.map(x => (x * s).toFloat).toSeq, 0)
      } ++ (41 to 52).map { k =>
        val s = (if (k % 2 == 0) 1 else -1) * 0.7f
        (k.toLong, d2.map(x => (x * s).toFloat).toSeq, 1)
      }
    val got = Similarity.pcaTop2(rows.toDF("vec_id", "embedding", "label"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(got.length === 64)
    def cos(v: Array[Double], d: Array[Double]): Double = {
      val num = v.zip(d).map { case (a, b) => a * b }.sum
      math.abs(num) /
        (math.sqrt(v.map(x => x * x).sum) * math.sqrt(d.map(x => x * x).sum))
    }
    val v1 = got.map(_._2.toDouble)
    val v2 = got.map(_._3.toDouble)
    assert(cos(v1, d1) > 0.99, s"first component off-plant: ${cos(v1, d1)}")
    assert(cos(v2, d2) > 0.99, s"second component off-plant: ${cos(v2, d2)}")
    // ordered by energy, deflation numerically clean, shares bounded
    val (ve1, ve2, ortho) = (got.head._4, got.head._5, got.head._6)
    assert(ve1 > ve2 && ve2 > 0, s"shares $ve1, $ve2")
    assert(ve1 + ve2 <= 1000)
    assert(ortho < 100, s"components not orthogonal: $ortho ppm")
  }

  test("pca projection separates the two planted populations") {
    val d1 = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    val d2 = Array.tabulate(64)(i => if (i % 4 < 2) 1.0 else -1.0)
    val rows =
      (1 to 40).map { k =>
        val s = (if (k % 2 == 0) 1 else -1) * (1.0f + k / 10.0f)
        (k.toLong, d1.map(x => (x * s).toFloat).toSeq, 0)
      } ++ (41 to 52).map { k =>
        val s = (if (k % 2 == 0) 1 else -1) * 0.7f
        (k.toLong, d2.map(x => (x * s).toFloat).toSeq, 1)
      }
    val got = Similarity.pcaProject(
        rows.toDF("vec_id", "embedding", "label")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === 52)
    // each population scores dominantly on ITS component: d1 vectors
    // land on pc1 with ~zero pc2, d2 vectors the other way round
    (1 to 40).foreach { k =>
      val (p1, p2) = got(k.toLong)
      assert(math.abs(p1) > 10 * math.abs(p2),
        s"d1 vec $k not pc1-dominant: $p1 vs $p2")
    }
    (41 to 52).foreach { k =>
      val (p1, p2) = got(k.toLong)
      assert(math.abs(p2) > 10 * math.abs(p1),
        s"d2 vec $k not pc2-dominant: $p1 vs $p2")
    }
  }

  test("embedding drift: zero on identical cohorts, alarms on a planted shift") {
    val d1 = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    val d2 = Array.tabulate(64)(i => if (i % 4 < 2) 1.0 else -1.0)
    def vec(d: Array[Double], s: Float) = d.map(x => (x * s).toFloat).toSeq
    // identical cohorts: every vector present at an even AND an odd id
    // -> p == q per bucket -> PSI exactly 0.0
    val same = (0 until 30).flatMap { k =>
      val v = vec(d1, (if (k % 2 == 0) 1 else -1) * (1.0f + k / 10.0f))
      Seq((2L * k, v, 0), (2L * k + 1, v, 0))
    }
    val zero = Similarity.embeddingDrift(
        same.toDF("vec_id", "embedding", "label")).collect()
    assert(zero.nonEmpty)
    zero.foreach { r =>
      assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0,
        s"identical cohorts must give PSI 0: $r")
    }
    // planted shift: even ids live on the dominant direction, odd ids
    // on an orthogonal one (pc1 scores collapse toward 0) -> the
    // bucket distributions separate and PSI crosses the 0.2 line
    val shifted = (0 until 30).map { k =>
      val s = (if (k % 4 < 2) 1 else -1) * (1.0f + k / 10.0f)
      (k.toLong, vec(if (k % 2 == 0) d1 else d2, s), 0)
    }
    val psi = Similarity.embeddingDrift(
        shifted.toDF("vec_id", "embedding", "label"))
      .collect().head.getDouble(4)
    assert(psi > 0.2, s"planted drift not detected: PSI $psi")
  }

  test("pca: corpus panel is well-formed and deterministic") {
    val a = Similarity.pcaPower(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.length === 64)
    val ve = a.head._3
    assert(ve > 0 && ve <= 1000, s"var_explained_permille $ve")
    assert(a.forall(_._3 == ve), "panel stat must be constant")
    assert(a.forall(t => math.abs(t._2) <= 2000000L),
      "components stay in the scaled unit box")
    val b = Similarity.pcaPower(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq, "re-run must be bit-identical")
  }
}
