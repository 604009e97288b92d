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
  *   - MinHash+LSH: signatures come from a single-pass codegen kernel
  *     inside the scan stage (map-only — no shuffle until candidate
  *     generation); candidates are a self-join on (band, band-hash)
  *     buckets only — the classic sub-quadratic near-dup path;
  *   - SimHash reduces each doc to one long in the same map-only way;
  *     bucketing by prefix bands keeps the pair search bounded.
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
    import graft.functions.text.hashed_sorted_tokens
    import graft.functions.vector.sorted_jaccard
    // Tokens are hashed (xxhash64), deduped, and SORTED once per
    // document by the single-pass HashedSortedTokens kernel (the
    // equivalent transform()-lambda runs interpreted per token); the
    // per-pair score is then ONE codegen'd O(n+m) merge (SortedJaccard)
    // over primitive longs — both the per-pair ArrayIntersect hash-set
    // build and the intersect+size+divide multi-node plan it replaces
    // dominated the join.
    val withToks = graft.core.Layout.spread(d, "doc_id").select(
      col("doc_id"), col("source"),
      hashed_sorted_tokens(col("text")).as("toks"))
    // Broadcast the build side: the bucket key (`source`) is
    // low-cardinality here, so a shuffled join would collapse to
    // #buckets-way parallelism; broadcasting keeps the probe side's
    // full partitioning. (At a scale where no side fits in memory, the
    // bucket key must be high-cardinality — LSH band buckets — and the
    // same join becomes a well-partitioned shuffle join; AQE demotes
    // the broadcast automatically if the side outgrows the threshold.)
    // length filter (PPJoin-family): J(A,B) >= t forces the set sizes
    // within a factor of t of each other — a necessary condition, so
    // pruning on it before the merge kernel cannot change the result,
    // and it skips the O(n+m) merge for obviously-dissimilar pairs
    withToks.as("a")
      .join(broadcast(withToks.as("b")),
        col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id") &&
          size(col("a.toks")) >= lit(threshold) * size(col("b.toks")) &&
          size(col("b.toks")) >= lit(threshold) * size(col("a.toks")))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(sorted_jaccard(col("a.toks"), col("b.toks")), 6).as("jaccard"))
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

  /** EXACT shingle (word n-gram) Jaccard pairs: the order-sensitive
    * sibling of [[jaccardPairs]] — two docs with the same vocabulary in
    * different order share tokens but few 3-gram shingles, so this
    * catches rewording that token-set Jaccard cannot. Same kernel
    * discipline: one single-pass shingle-hash per doc, one
    * SortedJaccard merge per pair. This is also exactly the similarity
    * the MinHash signature ([[minhashSignatures]]) estimates, so it
    * doubles as the ground-truth side of that estimate.
    */
  def jaccardShinglePairs(
      d: DataFrame, n: Int = 3, threshold: Double = 0.2): DataFrame = {
    import graft.functions.text.hashed_sorted_shingles
    import graft.functions.vector.sorted_jaccard
    val withSh = graft.core.Layout.spread(d, "doc_id").select(
      col("doc_id"), col("source"),
      hashed_sorted_shingles(col("text"), n).as("sh"))
    withSh.as("a")
      .join(broadcast(withSh.as("b")),
        col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id") &&
          // length filter — see jaccardPairs
          size(col("a.sh")) >= lit(threshold) * size(col("b.sh")) &&
          size(col("b.sh")) >= lit(threshold) * size(col("a.sh")))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(sorted_jaccard(col("a.sh"), col("b.sh")), 6).as("sh_jaccard"))
      .filter(col("sh_jaccard") >= threshold)
  }

  val jaccardShinglePairsSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')
      |      AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |        i -> array_to_string(toks[i:i + 2], ' ')))
      |    ELSE [array_to_string(toks, ' ')] END AS sset
      |  FROM t)
      |SELECT doc_a, doc_b, sh_jaccard FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    round(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
      |      (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))),
      |      6) AS sh_jaccard
      |  FROM sh a JOIN sh b
      |    ON a.source = b.source AND a.doc_id < b.doc_id)
      |WHERE sh_jaccard >= 0.2""".stripMargin

  /** Containment (truncation) duplicates: document A is a strict PREFIX
    * of document B — the scraped-data case where one copy was cut off.
    * Length ordering makes the pair direction deterministic and prunes
    * the candidate set before the O(len) startswith.
    */
  def prefixDups(d: DataFrame): DataFrame = {
    val t = graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"), col("source"), col("text"),
        length(col("text")).as("len"))
    t.as("a")
      .join(broadcast(t.as("b")),
        col("a.source") === col("b.source") &&
          col("a.len") < col("b.len") &&
          col("b.text").startsWith(col("a.text")))
      .select(col("a.doc_id").as("short_id"), col("b.doc_id").as("long_id"),
        col("a.len").cast("bigint").as("short_len"),
        col("b.len").cast("bigint").as("long_len"))
  }

  val prefixDupsSql: String =
    """SELECT a.doc_id AS short_id, b.doc_id AS long_id,
      |  CAST(length(a.text) AS BIGINT) AS short_len,
      |  CAST(length(b.text) AS BIGINT) AS long_len
      |FROM documents a JOIN documents b
      |  ON a.source = b.source
      |  AND length(a.text) < length(b.text)
      |  AND starts_with(b.text, a.text)""".stripMargin

  /** Near-dup CLUSTERS: connected components over the Jaccard pair
    * graph, by iterative min-label propagation (each vertex repeatedly
    * takes the min of its own and its neighbors' labels until
    * fixpoint) — the standard Spark spelling of what SQL engines write
    * as a recursive CTE (the DuckDB oracle is exactly that), since
    * Catalyst has no recursion operator. Every doc gets a cluster id;
    * docs outside the graph are their own singleton cluster.
    *
    * Scale shape: edges materialize once (persisted) and each round is
    * one join + one aggregate on them; rounds needed = component
    * diameter, which for near-dup graphs is small (dups of a page are
    * mutually similar). Deterministic: min-labels only.
    */
  def dupClusters(
      d: DataFrame, threshold: Double = 0.9, maxIters: Int = 20): DataFrame = {
    val pairs = jaccardPairs(d, threshold).select("doc_a", "doc_b")
    // localCheckpoint (eager) rather than cache: each round's plan must
    // START from materialized data, or lineage compounds and round N
    // re-derives rounds 1..N-1 (measured: per-round wall time DOUBLES
    // without the truncation).
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // `next` carries the previous label so the convergence count
      // reads the checkpointed result directly. The label table
      // broadcasts explicitly — checkpointed RDDs report no stats, so
      // AQE can't make the call; at a scale where |V| outgrows
      // broadcast, drop the hint and these become shuffle joins
      // co-partitioned on id (the Pregel shape).
      val nm = edges
        .join(broadcast(labels.select(col("id").as("dst"), col("label").as("nl"))),
          "dst")
        .groupBy(col("src").as("id"))
        .agg(min("nl").as("nmin"))
        .join(broadcast(labels), "id")
        .select(col("id"), col("label").as("old"),
          least(col("label"), col("nmin")).as("label"))
      // pointer jump: follow label -> label(label) once per round, which
      // roughly halves the rounds a long chain needs (min labels are
      // monotone non-increasing ids within the component, so the
      // fixpoint — every label = component min — is unchanged)
      val next = nm.as("x")
        .join(broadcast(nm.select(col("id").as("pid"), col("label").as("pl"))),
          col("x.label") === col("pid"), "left")
        .select(col("x.id").as("id"), col("x.old").as("old"),
          coalesce(col("pl"), col("x.label")).as("label"))
        .localCheckpoint()
      val changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select("id", "label")
      converged = changed == 0
      i += 1
    }
    // Exiting via the iteration cap means the labels are NOT component
    // minima and would silently diverge from the recursive-CTE oracle —
    // fail loudly instead. With per-round pointer jumping the effective
    // reach is ~2^maxIters, so hitting this requires a pathological
    // graph, not a big one.
    if (!converged) throw new IllegalStateException(
      s"dupClusters: label propagation did not converge within $maxIters " +
        "rounds; raise maxIters (reach doubles per round)")
    d.select(col("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
  }

  val dupClustersSql: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_filter(
      |      regexp_split_to_array(text, '\s+'), t -> t <> '')) AS toks
      |  FROM documents),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |      round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
      |        6) AS jaccard
      |    FROM t a JOIN t b
      |      ON a.source = b.source AND a.doc_id < b.doc_id)
      |  WHERE jaccard >= 0.9),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
      |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
      |SELECT d.doc_id,
      |  CAST(coalesce(comp.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
      |FROM documents d LEFT JOIN comp ON d.doc_id = comp.id""".stripMargin

  /** Two-phase fuzzy dedup: CHEAP candidates (token-set Jaccard) then
    * an EXPENSIVE per-pair verifier (Levenshtein over a bounded prefix)
    * only on the candidates — the standard shape when the precise
    * metric is quadratic in document length: at corpus scale you can
    * afford edit distance on thousands of candidate pairs, never on
    * all pairs. Prefix-bounding keeps the verifier O(prefix^2).
    */
  def editVerifiedPairs(
      d: DataFrame, threshold: Double = 0.5, prefix: Int = 60): DataFrame = {
    val texts = graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"), substring(col("text"), 1, prefix).as("head"))
    jaccardPairs(d, threshold)
      .join(broadcast(texts.select(col("doc_id").as("doc_a"),
        col("head").as("head_a"))), "doc_a")
      .join(broadcast(texts.select(col("doc_id").as("doc_b"),
        col("head").as("head_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        levenshtein(col("head_a"), col("head_b")).cast("bigint")
          .as(s"edit_$prefix"))
  }

  val editVerifiedPairsSql: String =
    """WITH t AS (
      |  SELECT doc_id, source, substring(text, 1, 60) AS head,
      |    list_distinct(list_filter(
      |      regexp_split_to_array(text, '\s+'), t -> t <> '')) AS toks
      |  FROM documents)
      |SELECT doc_a, doc_b, jaccard,
      |  CAST(levenshtein(head_a, head_b) AS BIGINT) AS edit_60
      |FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.head AS head_a, b.head AS head_b,
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
    val v = graft.core.Layout.spread(e, "vec_id")
      .select(col("vec_id"), col("label"), col("embedding"))
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

  /** Per-document MinHash signatures over 3-token shingles, computed by
    * the single-pass [[graft.functions.TextKernels.minhashSignature]]
    * kernel (shingle -> xxhash64 -> k affine permutations -> running
    * min, all inside one codegen'd projection).
    *
    * Scale shape: MAP-ONLY. The previous formulation exploded every
    * shingle through a hash-partitioned shuffle and re-aggregated k
    * column-wise mins; the kernel keeps the whole signature computation
    * inside the scan stage, so nothing crosses the network but
    * (doc_id, 16-long signature).
    */
  def minhashSignatures(d: DataFrame): DataFrame =
    graft.core.Layout.spread(d, "doc_id").select(col("doc_id"),
      graft.functions.text.minhash_signature(
        col("text"), perms.map(_._1), perms.map(_._2), Prime).as("sig"))

  /** Candidate near-dup pairs via LSH banding + signature agreement.
    * Two docs are candidates if any band of `BandSize` consecutive
    * signature components matches exactly; the emitted `est_jaccard`
    * is the fraction of agreeing components across the full signature.
    *
    * The signature array (16 longs) is carried THROUGH the band
    * self-join, so agreement is scored directly at pair time — two
    * fewer shuffles than re-attaching signatures by doc_id afterwards,
    * at +128 bytes per banded row. Candidate pairs found by several
    * bands score identically, so the final distinct() collapses them.
    */
  def minhashPairs(d: DataFrame, minAgree: Double = 0.5): DataFrame = {
    val withSig = minhashSignatures(d)
    val nBands = MinhashK / BandSize
    val banded = withSig.select(
      col("doc_id"), col("sig"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * BandSize + 1, BandSize)
            .cast("string")).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"),
          (x, y) => x === y), b => b))
          .cast("double") / MinhashK).as("est_jaccard"))
      .filter(col("est_jaccard") >= minAgree)
      .distinct()
  }

  // ---------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens: per token occurrence, each
    * bit of xxhash64(token) votes +1/-1; the sign vector is the
    * fingerprint. Computed by the single-pass
    * [[graft.functions.TextKernels.simhash64]] kernel — a MAP-ONLY
    * projection (the previous formulation exploded every token through
    * a shuffle and summed 64 per-bit vote columns back per document).
    */
  def simhash(d: DataFrame): DataFrame =
    graft.core.Layout.spread(d, "doc_id").select(col("doc_id"),
      graft.functions.text.simhash64(col("text")).as("simhash"))

  /** Near-dup pairs by SimHash hamming distance (within-source bucket
    * to bound the pair count; a production pipeline buckets by simhash
    * prefix bands instead). Fingerprint and bucket key come from one
    * projection — no join against the base table, and the broadcast
    * build side is the same map-only subplan (AQE demotes the
    * broadcast if a larger corpus outgrows the threshold).
    */
  def simhashPairs(d: DataFrame, maxHamming: Int = 16): DataFrame = {
    val withSrc = graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"), col("source"),
      graft.functions.text.simhash64(col("text")).as("simhash"))
    withSrc.as("a")
      .join(broadcast(withSrc.as("b")),
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
    "q_dedup_clusters" -> ((s, d) => dupClusters(docs(s, d))),
    "q_dedup_edit" -> ((s, d) => editVerifiedPairs(docs(s, d))),
    "q_dedup_shingle" -> ((s, d) => jaccardShinglePairs(docs(s, d))),
    "q_dedup_prefix" -> ((s, d) => prefixDups(docs(s, d))),
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
    "q_dedup_clusters" -> dupClustersSql,
    "q_dedup_edit" -> editVerifiedPairsSql,
    "q_dedup_shingle" -> jaccardShinglePairsSql,
    "q_dedup_prefix" -> prefixDupsSql,
    "q_dedup_embedding" -> embeddingPairsSql)
}
