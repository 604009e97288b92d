package graft.llm

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (content hash), canonicalized (token-set hash),
  * n-gram Jaccard (relational set-similarity), MinHash+LSH (scalable
  * near-dup candidates), SimHash (hamming-distance near-dup).
  *
  * Scale design:
  *   - exact/canonical dedup are a single hash-partitioned groupBy on a
  *     16-byte key — the canonical 100 TB dedup shape (shuffle is
  *     O(corpus), state per group is O(1));
  *   - Jaccard is restricted to within-`source` pairs (a real pipeline
  *     would use the LSH buckets instead of `source`): the join is
  *     token-partitioned, never a full cross product;
  *   - MinHash+LSH: signatures are k independent min-aggregates
  *     (algebraic, partial-agg friendly); candidate generation is a
  *     self-join on (band, band-hash) buckets only — the classic
  *     sub-quadratic near-dup path;
  *   - SimHash reduces each doc to one long; bucketing by prefix keeps
  *     the pair search bounded.
  *
  * MinHash/SimHash use deterministic seeded hash mixes (xxhash64 +
  * affine permutations mod a Mersenne-ish prime), so results are stable
  * across runs/partitionings — but not expressible in ANSI SQL, hence
  * no DuckDB oracle for those two (rows-only check); their correctness
  * is asserted in ScalaTest against brute-force Jaccard ground truth.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ------------------------------------------------------------ exact

  /** Exact dedup on raw content hash: one survivor (min doc_id) per
    * distinct text.
    */
  def exact(d: DataFrame): DataFrame =
    d.groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(
        min("doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"))

  val exactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Canonicalized dedup: hash of the sorted distinct token set —
    * catches reorderings/repetitions of the same vocabulary.
    */
  def canonical(d: DataFrame): DataFrame = {
    val canon = array_join(
      sort_array(array_distinct(TextOps.wsTokens(col("text")))), " ")
    d.groupBy(md5(canon.cast("binary")).as("canon_hash"))
      .agg(
        min("doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"),
        array_join(transform(sort_array(collect_set(col("doc_id"))),
          _.cast("string")), ",").as("members"))
  }

  val canonicalSql: String =
    """SELECT
      |  md5(array_to_string(list_sort(list_distinct(
      |    list_filter(regexp_split_to_array(text, '\s+'), t -> t <> ''))),
      |    ' ')) AS canon_hash,
      |  min(doc_id) AS keep_id, count(*) AS n_copies,
      |  array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS members
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------- jaccard

  /** Exact token-set Jaccard over within-source pairs: pair docs by
    * bucket key (here `source`; the LSH buckets in a real pipeline),
    * then |A∩B| via array_intersect on the compact distinct-token
    * arrays.
    *
    * Shape note: pairing first and intersecting arrays beats the
    * classic token-granularity inverted-index self-join whenever the
    * vocabulary is small relative to the corpus (the token join
    * produces O(sum over tokens of df(t)^2) rows; the pair join
    * produces O(pairs) rows with O(|doc|) work each). Bucket size
    * bounds the quadratic term either way.
    */
  def jaccardPairs(d: DataFrame, threshold: Double = 0.5): DataFrame = {
    import graft.functions.vector.sorted_intersect_count
    // Tokens are hashed (xxhash64), deduped, and SORTED once per
    // document; the per-pair kernel is then a codegen'd O(n+m) merge
    // (SortedIntersectCount) over primitive longs — the per-pair
    // ArrayIntersect hash-set build it replaces dominated the join.
    val withToks = d.select(
      col("doc_id"), col("source"),
      sort_array(array_distinct(
        transform(TextOps.wsTokens(col("text")), t => xxhash64(t))))
        .as("toks"))
    // Broadcast the build side: the bucket key (`source`) is
    // low-cardinality here, so a shuffled join would collapse to
    // #buckets-way parallelism; broadcasting keeps the probe side's
    // full partitioning. (At a scale where no side fits in memory, the
    // bucket key must be high-cardinality — LSH band buckets — and the
    // same join becomes a well-partitioned shuffle join; AQE demotes
    // the broadcast automatically if the side outgrows the threshold.)
    withToks.as("a")
      .join(broadcast(withToks.as("b")),
        col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        sorted_intersect_count(col("a.toks"), col("b.toks")).as("inter"),
        size(col("a.toks")).as("sz_a"), size(col("b.toks")).as("sz_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  val jaccardPairsSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_filter(
      |      regexp_split_to_array(text, '\s+'), t -> t <> '')) AS toks
      |  FROM documents)
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
      |      6) AS jaccard
      |  FROM t a JOIN t b
      |    ON a.source = b.source AND a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.5""".stripMargin

  // ------------------------------------------------- embedding cosine

  /** Embedding-cosine near-dup pairs within a `label` bucket: the
    * dense-vector sibling of [[jaccardPairs]], scored with the
    * codegen'd cosine kernel. DuckDB's double cosine is bitwise-equal
    * to a sequential double loop (verified), so the rounded score is
    * oracle-safe.
    */
  def embeddingPairs(e: DataFrame, threshold: Double = 0.3): DataFrame = {
    import graft.functions.vector.cosine_similarity
    val v = e.select(col("vec_id"), col("label"), col("embedding"))
    v.as("a")
      .join(broadcast(v.as("b")),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine_similarity(col("a.embedding"), col("b.embedding")), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  val embeddingPairsSql: String =
    """SELECT vec_a, vec_b, cos_sim FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(list_cosine_similarity(
      |      CAST(a.embedding AS DOUBLE[]),
      |      CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id < b.vec_id)
      |WHERE cos_sim >= 0.3""".stripMargin

  // ---------------------------------------------------------- minhash

  val MinhashK = 16          // signature length
  val BandSize = 4           // rows per LSH band -> 4 bands
  private val Prime = 2147483647L // 2^31 - 1
  /** Affine permutation coefficients, fixed seed for determinism. */
  private val perms: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(MinhashK)((math.abs(rnd.nextLong()) % (Prime - 1) + 1,
      math.abs(rnd.nextLong()) % Prime))
  }

  /** Per-document MinHash signatures over 3-token shingles.
    * Shingle -> xxhash64 -> k affine permutations -> column-wise min.
    * All algebraic aggregates: map-side combine works, no value lists.
    *
    * The token array is materialized as a column BEFORE the shingle
    * lambda runs: higher-order functions are interpreted, so an
    * unmaterialized `split()` inside the lambda would re-tokenize the
    * document on every `element_at` (measured 6x slower at sf0.1).
    */
  def minhashSignatures(d: DataFrame): DataFrame = {
    val withToks = d.select(col("doc_id"),
      TextOps.wsTokens(col("text")).as("toks"))
    val toks = col("toks")
    val n = size(toks)
    // 3-gram shingles as single strings; docs shorter than 3 tokens
    // contribute their whole text as one shingle.
    val shingles = when(n >= 3,
      transform(sequence(lit(0), n - 3),
        i => concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2),
          element_at(toks, i + 3))))
      .otherwise(array(array_join(toks, " ")))
    val exploded = withToks
      .select(col("doc_id"), explode(shingles).as("shingle"))
      .select(col("doc_id"),
        pmod(xxhash64(col("shingle")), lit(Prime)).as("h"))
    val minCols = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(Prime))).as(s"mh_$i")
    }
    exploded.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
  }

  /** Candidate near-dup pairs via LSH banding + signature agreement.
    * Two docs are candidates if any band of `BandSize` consecutive
    * signature components matches exactly; the emitted `est_jaccard`
    * is the fraction of agreeing components across the full signature.
    */
  def minhashPairs(d: DataFrame, minAgree: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(d)
    val sigCols = (0 until MinhashK).map(i => col(s"mh_$i"))
    val withSig = sigs.select(col("doc_id"), array(sigCols: _*).as("sig"))
    val nBands = MinhashK / BandSize
    // Narrow band stream (doc_id, band, bucket) — the signature arrays
    // stay out of the self-join and the pair-dedup, which is what makes
    // this shape scale: the shuffled rows are 3 longs wide.
    val banded = withSig.select(
      col("doc_id"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * BandSize + 1, BandSize)
            .cast("string")).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Re-attach signatures once per side (exchange reuse: both sides
    // come from the same sig subplan).
    pairs
      .join(withSig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        "doc_a")
      .join(withSig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b))
          .cast("double") / MinhashK).as("est_jaccard"))
      .filter(col("est_jaccard") >= minAgree)
  }

  // ---------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens: per token a 64-bit
    * xxhash64; each bit votes +1/-1 weighted by term frequency; the
    * sign vector is the fingerprint. Computed with per-bit algebraic
    * sums (bit b extracted via shiftright/and) — no UDF, partial-agg
    * friendly.
    */
  def simhash(d: DataFrame, bits: Int = 64): DataFrame = {
    val tok = d.select(col("doc_id"),
      explode(TextOps.wsTokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val votes = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v_$b")
    }
    val agg = tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val sig = (0 until bits).map { b =>
      when(col(s"v_$b") > 0, lit(1L) * lit(1L << b).cast("long"))
        .otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance (within-source bucket
    * to bound the pair count; a production pipeline buckets by simhash
    * prefix bands instead).
    */
  def simhashPairs(d: DataFrame, maxHamming: Int = 16): DataFrame = {
    val withSrc = simhash(d).join(d.select("doc_id", "source"), "doc_id")
    withSrc.as("a")
      .join(withSrc.as("b"),
        col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Scale-path SimHash candidate generation: band the 64-bit
    * fingerprint into `nBands` chunks and join on (band index, band
    * bits) — by pigeonhole, any pair with hamming distance < nBands
    * agrees on at least one band, so candidates are GUARANTEED to
    * contain every such pair with no per-bucket quadratic blowup
    * (the within-`source` variant above is the exhaustive small-scale
    * check; this is what runs at 100 TB).
    */
  def simhashPairsBanded(d: DataFrame, nBands: Int = 4): DataFrame = {
    val bits = 64
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    val sh = simhash(d)
    val banded = sh.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))
            .as("bits"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("bigint").as("hamming"))
      .distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, d) => exact(docs(s, d))),
    "q_dedup_canonical" -> ((s, d) => canonical(docs(s, d))),
    "q_dedup_jaccard" -> ((s, d) => jaccardPairs(docs(s, d))),
    "q_dedup_embedding" -> ((s, d) =>
      embeddingPairs(graft.core.Tables.load(s, d, "embeddings"))),
    "q_dedup_minhash" -> ((s, d) => minhashPairs(docs(s, d))),
    "q_dedup_simhash" -> ((s, d) => simhashPairs(docs(s, d))))

  /** minhash/simhash are not ANSI-SQL-expressible (seeded xxhash64) —
    * rows-only driver check; ScalaTest asserts them against brute-force
    * Jaccard ground truth instead.
    */
  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" -> exactSql,
    "q_dedup_canonical" -> canonicalSql,
    "q_dedup_jaccard" -> jaccardPairsSql,
    "q_dedup_embedding" -> embeddingPairsSql)
}
