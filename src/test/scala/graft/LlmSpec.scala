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

  test("multimodal decode stub: schema and batch shape are real") {
    val decoded = Multimodal.decodeImages(spark, Multimodal.asMedia(docs.limit(20)))
    val rows = decoded.collect()
    assert(rows.length === 20)
    rows.foreach { img =>
      assert(img.channels === 3)
      assert(img.pixels.length === img.width * img.height * img.channels)
    }
    // deterministic: same input -> same pixels
    val again = Multimodal.decodeImages(spark, Multimodal.asMedia(docs.limit(20)))
      .collect()
    assert(rows.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.pixels.sameElements(b.pixels) })
  }

  test("resize produces exact target dims and preserves corner pixels") {
    val decoded = Multimodal.decodeImages(spark, Multimodal.asMedia(docs.limit(10)))
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
      Seq("doc_id", "width", "height", "mean_pixel"))
  }
}
