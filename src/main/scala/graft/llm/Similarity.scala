package graft.llm

import graft.core.Barrier.BarrierOps
import graft.core.Tables
import graft.functions.vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors).
  *
  * Two paths:
  *   - brute-force top-k: broadcast the (small) query set, score every
  *     (query, vector) pair with the codegen'd [[vector.cosine_similarity]]
  *     expression, rank per query. Exact; O(|queries| x |corpus|) but
  *     embarrassingly parallel and shuffle-free until the final
  *     per-query top-k (window over |queries| partitions).
  *   - LSH-bucketed: random-hyperplane signatures (seeded, so
  *     deterministic) bucket the corpus; candidates are scored only
  *     within their bucket. Sub-linear scan at the cost of recall —
  *     the 100 TB path. Recall vs brute force is asserted in ScalaTest.
  *
  * The driver-facing top-k query emits (query_id, neighbor rank) only —
  * no float score column — so the DuckDB oracle (which computes cosine
  * in a different float precision) hash-matches: ordering is stable as
  * long as similarity gaps exceed float error, which the test tier
  * checks.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Exact top-k cosine neighbors for each query vector (queries =
    * vec_id < nQueries of the corpus itself).
    */
  def bruteForceTopK(e: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    // the .limit never binds (vec_id is the unique key, so the filter
    // already yields ≤ nQueries rows) — it makes the bound STRUCTURAL,
    // so PlanAudit can prove the BroadcastNestedLoop build side tiny
    val queries = e.filter(col("vec_id") < nQueries)
      .orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    graft.core.Layout.spread(e, "vec_id").crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        vector.cosine_similarity(col("q_emb"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank")
  }

  val bruteForceTopKSql: String =
    """SELECT query_id, vec_id, rank FROM (
      |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
      |    CAST(row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(
      |        CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
      |        DESC, e.vec_id) AS BIGINT) AS rank
      |  FROM embeddings e
      |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q)
      |WHERE rank <= 10""".stripMargin

  /** Deterministic random hyperplanes (seeded): nPlanes x dim. */
  private[llm] def planes(
      nPlanes: Int, dim: Int = 64, seed: Long = 1234L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-of-projection bucket id expression over `embedding`. */
  private def bucketCol(nPlanes: Int, seed: Long): Column =
    planes(nPlanes, seed = seed).zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(v => lit(v)): _*)
      when(vector.dot_product(col("embedding"), planeCol) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Sign-of-projection LSH bucket id for every vector. */
  def lshBuckets(
      e: DataFrame, nPlanes: Int = 4, seed: Long = 1234L): DataFrame =
    e.withColumn("bucket", bucketCol(nPlanes, seed))

  /** Approximate top-k via multi-table LSH: `nTables` independent
    * hyperplane sets, candidates unioned across tables (a miss in one
    * table is recovered by another — the standard recall lever), scored
    * once per distinct pair, ranked per query.
    *
    * Two further levers over the textbook shape:
    *   - embeddings are CARRIED through the bucket self-join and pairs
    *     are scored at match time — two fewer shuffle-joins than
    *     re-attaching vectors by id, at +`dim` floats per bucket row
    *     (the same bandwidth-for-stages trade as the MinHash band
    *     join); the pair-dedup distinct() keys on (ids, sim), which is
    *     deterministic per pair;
    *   - `multiprobe`: the probe side also visits every bucket at
    *     hamming distance 1 (flip each plane bit once), so a pair
    *     split by ONE hyperplane is still found without paying for
    *     another table — the classic multiprobe-LSH recall lever.
    *
    * Scale: each table's candidate join is bucket-partitioned; total
    * work is sum of per-bucket squares per table (x (nPlanes+1) probes
    * with multiprobe) — still sub-quadratic while recall rises.
    */
  def lshTopK(
      e: DataFrame, nPlanes: Int = 6, k: Int = 5,
      nTables: Int = 2, multiprobe: Boolean = true): DataFrame = {
    val v = graft.core.Layout.spread(e, "vec_id")
    val candidates =
      lshCandidatePairs(v, nPlanes, nTables, multiprobe, (a, b) => a =!= b)
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    candidates
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("a_id").as("vec_id"), col("b_id").as("neighbor_id"),
        col("rank"))
  }

  /** Scored LSH candidate pairs — the shared candidate generator behind
    * [[lshTopK]] and [[Dedup.embeddingPairs]]: per table, bucket by
    * hyperplane signs, (multi)probe, join within buckets, score each
    * matched pair with the codegen'd cosine at match time (embeddings
    * carried through the join — two fewer shuffles than re-attaching
    * them by id). `pairCond` picks the pair shape: `=!=` for per-query
    * neighbor lists, `<` for unordered dedup pairs. The same pair found
    * by several tables/probes scores identically (same kernel, same
    * inputs), so distinct() collapses duplicates exactly.
    */
  private[llm] def lshCandidatePairs(
      v: DataFrame, nPlanes: Int, nTables: Int, multiprobe: Boolean,
      pairCond: (Column, Column) => Column): DataFrame = {
    // All tables fused into ONE bucket join: each row computes its
    // nTables bucket ids in a single projection and explodes to
    // (table, bucket) — versus the naive per-table spelling (nTables
    // separate joins unioned), this scans the corpus twice instead of
    // 2 x nTables times and shuffles once per side instead of once per
    // table, for the identical candidate set (the table id is part of
    // the join key, so buckets never collide across tables).
    val tableBuckets =
      (0 until nTables).map(t => bucketCol(nPlanes, seed = 1234L + 7919L * t))
    val built = v.select(col("vec_id"), col("embedding"),
      posexplode(array(tableBuckets: _*)).as(Seq("tbl", "bucket")))
    val probes =
      if (!multiprobe) built.withColumnRenamed("bucket", "probe")
      else built.select(col("vec_id"), col("embedding"), col("tbl"),
        explode(array((col("bucket") +: (0 until nPlanes).map(i =>
          col("bucket").bitwiseXOR(lit(1L << i)))): _*)).as("probe"))
    // SHUFFLE_HASH, not planner's choice: Catalyst sizes an array column
    // as ONE element (ArrayType.defaultSize), so it estimates the built
    // side ~70x too small and happily BROADCASTS THE ENTIRE VECTOR
    // CORPUS — measured at 400k synthetic vectors (`ScaleProbe ann`),
    // and a guaranteed driver OOM at real corpus sizes. Per-bucket hash
    // build is small (planes are balanced), so shuffle-hash is the
    // scale-correct strategy. The int8 variant needs no hint: packed
    // binary is estimated at ~its true width, so the planner's
    // broadcast-vs-shuffle choice is already driven by honest sizes.
    probes.as("a")
      .join(built.as("b").hint("SHUFFLE_HASH"),
        col("a.tbl") === col("b.tbl") &&
          col("a.probe") === col("b.bucket") &&
          pairCond(col("a.vec_id"), col("b.vec_id")))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        vector.cosine_similarity(col("a.embedding"), col("b.embedding"))
          .as("sim"))
      .distinct()
  }

  // ---------------------------------------------- int8 ANN (oracle-exact)

  /** Base offset for the LSH plane sign stream — clear of the
    * [[jlProject]] index range (0..outDim*inDim).
    */
  private val PlaneBase = 1000003L

  /** splitmix64 finalizer — full-avalanche 64-bit mixer (Steele et al.,
    * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14; the
    * java.util.SplittableRandom mixer). Used for the LSH planes where
    * the LCG is NOT good enough: adjacent-index LCG sign streams are
    * strongly correlated (measured mean |plane·plane| ≈ 30 of 64 vs
    * ≈ 6 for iid ±1 — near-duplicate hyperplanes), which collapsed the
    * 2^14-bucket space to ~2.5k effective buckets and made the
    * candidate join superlinear (910 MB shuffle at 400k vecs vs
    * 181 MB for the float path — `ScaleProbe ann`, round 8). With this
    * mixer the planes are iid-quality (mean |dot| 6.3, ~10k distinct
    * buckets on 20k random vectors, max load 15).
    */
  private[llm] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** plane(t, p)[d] for the int8 LSH: one deterministic ±1 value per
    * (table, plane, dim) — the SINGLE source both the Spark bucket
    * expression and the generated DuckDB oracle inline, so the two
    * engines cannot drift. Driver-side only (both engines see literal
    * constants), so the generator needs no SQL spelling.
    */
  private[llm] def planeSign(t: Int, p: Int, d: Int, nPlanes: Int, dim: Int): Long =
    if ((mix64(PlaneBase + ((t.toLong * nPlanes + p) * dim + d)) & 1L) == 0L) 1L
    else -1L

  /** (vec_id, qn: bigint[]) — UNIT-scale int8 quantization:
    * qn[i] = round(v[i] / ||v||_2 * 127). Unlike [[withQuantized]]'s
    * max-abs scale, the unit scale makes the integer dot product a
    * cosine surrogate (dot(qn_a, qn_b) ≈ 127^2 cos), so ranking by it
    * IS approximate cosine ranking — the FAISS-SQ8 trade. The norm fold
    * runs in array order (IEEE double, same sequence as the DuckDB
    * list_reduce replay); every later step is exact long arithmetic.
    * Zero vectors (null scale) are dropped — they have no direction.
    */
  private[graft] def withUnitQuantized(e: DataFrame): DataFrame =
    // spread first: a single-row-group embeddings file scans as ONE
    // task, and the quantize kernel (plus everything up to the
    // consumer's first exchange) inherits that width — r18 JobProf
    // caught q_embed_label_sim's whole quantize+posexplode chain as
    // one 2 s task on a 32-core box.
    //
    // ONE KERNEL CALL (r19), not the former transform/aggregate HOF
    // chain: HOFs evaluate an interpreted lambda per element with a
    // per-element BigDecimal round (~0.3 ms/row measured), and
    // projection collapse duplicated the whole chain into every
    // consumer expression. vector.unit_quantize_int8 is bit-identical
    // (see the kernel's scaladoc) and whole-stage-codegen'd.
    graft.core.Layout.spread(e, "vec_id")
      .select(col("vec_id"),
        graft.functions.vector.unit_quantize_int8(col("embedding")).as("qn"))
      .filter(col("qn").isNotNull)

  /** SQL mirror of [[withUnitQuantized]] over an arbitrary
    * `(vec_id, embedding)` source select.
    */
  private def unitQuantSelect(src: String): String =
    s"""SELECT vec_id,
       |    list_transform(emb, v -> CAST(round(v / nrm * 127.0, 0) AS BIGINT))
       |      AS qn
       |  FROM (
       |    SELECT vec_id, emb,
       |      nullif(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list_transform(emb, v -> v * v)), (a, b) -> a + b)), 0) AS nrm
       |    FROM (SELECT vec_id,
       |            list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
       |          FROM ($src)))
       |  WHERE nrm IS NOT NULL""".stripMargin

  /** [[unitQuantSelect]] over the embeddings table — aliased `base`. */
  private val unitQuantizedSql: String =
    s"""base AS (
       |  ${unitQuantSelect("SELECT vec_id, embedding FROM embeddings")})""".stripMargin

  /** Bucket id over `qn` for table `t`: bit p = sign of the exact long
    * dot with plane(t, p).
    */
  private def int8BucketCol(t: Int, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { p =>
      val plane = array((0 until dim).map(d =>
        lit(planeSign(t, p, d, nPlanes, dim))): _*)
      when(vector.long_dot_product(col("qn"), plane) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Distinct scored candidate pairs over the int8 vectors — the shared
    * generator behind [[lshTopKInt8]] and [[Dedup.embeddingPairsInt8]]
    * (the integer sibling of [[lshCandidatePairs]], same fused
    * multi-table + hamming-1 multiprobe shape). `pairCond` picks the
    * pair shape: `=!=` for per-query neighbor lists, `<` for unordered
    * dedup pairs.
    */
  private[llm] def int8CandidatePairs(
      e: DataFrame, nPlanes: Int, nTables: Int,
      pairCond: (Column, Column) => Column, dim: Int = 64): DataFrame = {
    val q = withUnitQuantized(graft.core.Layout.spread(e, "vec_id"))
    val tableBuckets =
      (0 until nTables).map(t => int8BucketCol(t, nPlanes, dim))
    // buckets are computed map-side from the long array ONCE per row;
    // the vector crosses the candidate-join shuffle PACKED (one signed
    // byte per element — 8x smaller rows than the long array, 4x
    // smaller than the float32 original; measured in `ScaleProbe ann`)
    val built = q.select(col("vec_id"), vector.pack_int8(col("qn")).as("qb"),
      posexplode(array(tableBuckets: _*)).as(Seq("tbl", "bucket")))
    val probes = built.select(col("vec_id"), col("qb"), col("tbl"),
      explode(array((col("bucket") +: (0 until nPlanes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p)))): _*)).as("probe"))
    probes.as("a")
      .join(built.as("b"),
        col("a.tbl") === col("b.tbl") &&
          col("a.probe") === col("b.bucket") &&
          pairCond(col("a.vec_id"), col("b.vec_id")))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        vector.byte_dot_product(col("a.qb"), col("b.qb")).as("sim"))
      .distinct()
  }

  /** Shared WITH-clause prefix for the int8 oracle replays: `base`
    * (unit quantization), `built` (per-table buckets), `probes`
    * (hamming-1 multiprobe), `pairs` (distinct scored candidates with
    * `pairOp` between the two vec_ids). Plane constants inlined from
    * [[planeSign]].
    */
  private def int8PairsSqlCtes(
      nPlanes: Int, nTables: Int, pairOp: String, dim: Int = 64): String = {
    def planeList(t: Int, p: Int): String =
      (0 until dim).map(d => planeSign(t, p, d, nPlanes, dim))
        .mkString("[", ",", "]")
    def bucketExpr(t: Int): String =
      (0 until nPlanes).map(p =>
        s"(CASE WHEN list_dot_product(qn, ${planeList(t, p)}) >= 0 " +
          s"THEN ${1L << p} ELSE 0 END)").mkString(" + ")
    val builtSelects = (0 until nTables).map(t =>
      s"  SELECT vec_id, qn, $t AS tbl, ${bucketExpr(t)} AS bucket FROM base")
      .mkString("\n  UNION ALL\n")
    val masks = (0 until nPlanes).map(p => s"(${1L << p})").mkString(",")
    s"""WITH $unitQuantizedSql,
       |built AS (
       |$builtSelects),
       |probes AS (
       |  SELECT vec_id, qn, tbl, bucket AS probe FROM built
       |  UNION ALL
       |  SELECT vec_id, qn, tbl, xor(bucket, m.m) AS probe
       |  FROM built, (VALUES $masks) m(m)),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
       |    CAST(list_dot_product(a.qn, b.qn) AS BIGINT) AS sim
       |  FROM probes a JOIN built b
       |    ON a.tbl = b.tbl AND a.probe = b.bucket
       |    AND a.vec_id $pairOp b.vec_id)""".stripMargin
  }

  /** Approximate top-k in EXACT integer arithmetic — [[lshTopK]]'s
    * multi-table + multiprobe shape (fused bucket join, carried
    * vectors, hamming-1 probes) re-based on [[withUnitQuantized]]:
    * buckets are signs of long dots with splitmix64 ±1 planes,
    * candidates are scored with the packed-byte dot kernel. Every step
    * after the per-element quantization rounding is order-independent
    * long math, so the DuckDB oracle ([[lshTopKInt8Sql]]) replays the
    * whole query bit-for-bit — the driver-checkable ANN path.
    *
    * This is also the better 100 TB join: 64 packed signed bytes
    * carried per bucket row instead of 256 bytes of float32 (4x
    * candidate-join bandwidth), and the scoring kernel is long
    * multiply-adds with no sqrt/div per pair. Recall vs float brute
    * force is asserted in LlmSpec (quantization moves similarities by
    * < 1e-2 at dim 64, so neighbor sets are near-identical).
    */
  def lshTopKInt8(
      e: DataFrame, nPlanes: Int = 6, k: Int = 5, nTables: Int = 2,
      dim: Int = 64): DataFrame = {
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    int8CandidatePairs(e, nPlanes, nTables, (a, b) => a =!= b, dim)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("a_id").as("vec_id"), col("b_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** Generated DuckDB replay of [[lshTopKInt8]] — the plane constants
    * are inlined from [[planeSign]], the single source of truth.
    */
  def lshTopKInt8Sql(
      nPlanes: Int = 6, k: Int = 5, nTables: Int = 2, dim: Int = 64): String =
    s"""${int8PairsSqlCtes(nPlanes, nTables, "<>", dim)}
       |SELECT a_id AS vec_id, b_id AS neighbor_id, rank, sim
       |FROM (SELECT a_id, b_id, sim,
       |        CAST(row_number() OVER (PARTITION BY a_id
       |          ORDER BY sim DESC, b_id) AS BIGINT) AS rank
       |      FROM pairs)
       |WHERE rank <= $k""".stripMargin

  /** Oracle replay of [[Dedup.embeddingPairsInt8]]. */
  def embeddingPairsInt8Sql(
      threshold: Long, nPlanes: Int, nTables: Int, dim: Int = 64): String =
    s"""${int8PairsSqlCtes(nPlanes, nTables, "<", dim)}
       |SELECT a_id AS vec_a, b_id AS vec_b, sim
       |FROM pairs
       |WHERE sim >= $threshold""".stripMargin

  /** Deterministic IVF coarse quantizer: k centroids from a fixed-seed
    * Lloyd refinement (seeds = the k lowest vec_ids, `iters` rounds of
    * assign + per-cell mean). Returns (cellId, centroid) — k x dim
    * doubles, legitimately driver-sized (the *codebook*, not the data;
    * at 100 TB the codebook is still k x dim).
    *
    * Training runs on a deterministic 1-in-mod slice with a BOUNDED
    * expected size ([[boundedTrainMod]]) — the standard IVF practice
    * (the codebook needs the distribution, not the corpus; at 100 TB
    * training on everything is neither feasible nor useful), and with
    * the bound the training stage stops being the one corpus-linear
    * cost in the ANN family (the sf1 rehearsal's ivf 5.96x at 10x was
    * exactly this stage). `sampleMod > 0` forces a fixed modulus
    * (tests/probes); 0 = auto.
    */
  private[llm] def ivfCentroids(
      e: DataFrame, k: Int = 16, iters: Int = 2,
      sampleMod: Long = 0, knownCount: Long = -1L): Array[Array[Double]] = {
    def vecOf(r: org.apache.spark.sql.Row): Array[Double] =
      r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
    val mod = if (sampleMod > 0) sampleMod
      else boundedTrainMod(if (knownCount >= 0) knownCount else e.count(), k)
    val sample = e.filter(pmod(col("vec_id"), lit(mod)) === 0)
    var cents: Array[Array[Double]] =
      sample.orderBy("vec_id").limit(k).collect().map(vecOf)
    for (_ <- 0 until iters) {
      val assigned = assignCells(sample, cents)
      val means = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(avg(col("v").cast("double")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }
      // a cell that lost all members keeps its previous centroid
      cents = cents.indices.map(i => means.getOrElse(i, cents(i))).toArray
    }
    cents
  }

  /** Nearest-cell assignment: argmin over squared L2, computed as
    * `c.c - 2 x.c` (the `x.x` term is row-constant so argmin-safe),
    * with the cell index as deterministic tie-break via struct
    * ordering.
    */
  private def cellDists(cents: Array[Array[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      val cc = c.map(v => v * v).sum
      struct(
        (lit(cc) - lit(2.0) * vector.dot_product(col("embedding"),
          array(c.map(lit): _*))).as("d"),
        lit(i).as("i"))
    }: _*)

  private def assignCells(e: DataFrame, cents: Array[Array[Double]]): DataFrame =
    e.withColumn("cell", array_min(cellDists(cents)).getField("i"))

  /** Approximate top-k via IVF: coarse-quantize the corpus into
    * `nCells` cells, then for each query probe its `nProbe` nearest
    * cells and score only those candidates — the learned-partitioning
    * sibling of [[lshTopK]] (same carried-embedding join shape).
    *
    * Scale: the codebook broadcasts (k x dim); the candidate join is
    * cell-partitioned with expected cost n * nProbe * (n / nCells) —
    * sub-quadratic, tunable by nCells/nProbe.
    */
  def ivfTopK(
      e: DataFrame, k: Int = 5, nCells: Int = 16, nProbe: Int = 2,
      codebook: Option[Array[Array[Double]]] = None): DataFrame = {
    val v = graft.core.Layout.spread(e, "vec_id")
    val cents = codebook.getOrElse(ivfCentroids(v, nCells))
    val assigned = assignCells(v, cents)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val probes = v
      .select(col("vec_id"), col("embedding"),
        explode(slice(transform(array_sort(cellDists(cents)),
          s => s.getField("i")), 1, nProbe)).as("probe"))
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    probes.as("a")
      .join(assigned.as("b"),
        col("a.probe") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        vector.cosine_similarity(col("a.embedding"), col("b.embedding"))
          .as("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("a_id").as("vec_id"), col("b_id").as("neighbor_id"),
        col("rank"))
  }

  /** Training-sample budget for a k-cell codebook: >= 64 points per
    * centroid with an 8192 floor — the FAISS-style constant-size
    * training set.
    */
  private def trainTarget(k: Int): Long = math.max(8192L, 64L * k)

  /** Bounded 1-in-mod training slice: mod = 4 * ceil(n / (4 * target))
    * keeps the expected sample at ~[[trainTarget]] vectors no matter
    * the corpus size. mod = 4 whenever n <= 4 * target — every tested
    * sf, so results there are bit-identical to the old fixed-mod-4
    * spelling — and the SAME formula replays as a scalar subquery in
    * the DuckDB CTEs ([[trainModSql]]), so codebook training stays
    * oracle-exact at ANY scale: both engines derive the modulus from
    * the same count with the same double-precision ceil.
    */
  private[graft] def boundedTrainMod(n: Long, k: Int): Long =
    4L * math.max(1L, math.ceil(n / (4.0 * trainTarget(k))).toLong)

  /** Memoized embeddings-table row count for the auto-modulus: every
    * untrained codebook call needs the corpus count before training,
    * and a cold run trains several codebooks over the SAME table — the
    * cached driver paths thread this one shared count (keyed by DIR —
    * a plan-derived key cannot work: canonicalized parquet relations
    * print no path, so two same-schema tables would collide) through
    * `knownCount`, so they pay one count job per (session, dir)
    * instead of a scan each. Library callers training directly get a
    * per-call count over their actual relation — always correct, never
    * cross-table.
    */
  private val trainCountCache = new graft.core.SessionCache[String, Long]
  private def cachedEmbCount(s: SparkSession, dir: String): Long =
    trainCountCache.getOrElseUpdate(s, dir)(emb(s, dir).count())

  /** [[boundedTrainMod]] over a named relation, as a DuckDB scalar
    * subquery (the denominator is inlined so both engines divide by
    * the identical double literal).
    */
  private def trainModSql(rel: String, k: Int): String =
    s"(SELECT 4 * greatest(1, CAST(ceil(count(*) / ${4L * trainTarget(k)}.0) AS BIGINT)) FROM $rel)"

  // ------------------------------------------ int8 IVF (oracle-exact)

  /** EXACT integer Lloyd over the unit-quantized vectors — the
    * oracle-replayable sibling of [[ivfCentroids]]. Centroids are kept
    * as element-wise ROUNDED MEANS (HALF_UP, the shared rounding of
    * every int8 op), so they stay int8-range longs and the assignment
    * metric ||x − m||² reduces to the exact long expression
    * |m|² − 2·x·m (the row-constant |x|² dropped): every distance is
    * order-independent integer math, every comparison exact, and the
    * whole training loop nests as fixed-iteration CTEs in the DuckDB
    * oracle. Same scale shape as the float path: train on a bounded
    * 1-in-mod slice ([[boundedTrainMod]] — the modulus derives from
    * the RAW row count of `e`, matching the oracle's count over the
    * raw source relation; `sampleMod > 0` forces a fixed modulus),
    * distributed assign + per-cell sums, collect only the k x dim
    * codebook; magnitudes stay ≤ 64 * 127² ≈ 1e6, so nothing can
    * overflow at any corpus size.
    */
  private[graft] def ivfCentroidsInt8(
      e: DataFrame, k: Int = 16, iters: Int = 2,
      sampleMod: Long = 0, knownCount: Long = -1L): Array[Array[Long]] = {
    val mod = if (sampleMod > 0) sampleMod
      else boundedTrainMod(if (knownCount >= 0) knownCount else e.count(), k)
    val sample = withUnitQuantized(e)
      .filter(pmod(col("vec_id"), lit(mod)) === 0)
    def longs(r: org.apache.spark.sql.Row): Array[Long] =
      r.getAs[scala.collection.Seq[Long]]("qn").toArray
    var cents: Array[Array[Long]] =
      sample.orderBy("vec_id").limit(k).collect().map(longs)
    for (_ <- 0 until iters) {
      val means = assignCellsInt8Q(sample, cents)
        .select(col("cell"), posexplode(col("qn")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map { r =>
            // round(s / n) in the same IEEE-then-HALF_UP sequence the
            // DuckDB replay uses: CAST(round(s / n, 0) AS BIGINT)
            java.math.BigDecimal.valueOf(r.getLong(2).toDouble / r.getLong(3))
              .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
          }
        }
      cents = cents.indices.map(i => means.getOrElse(i, cents(i))).toArray
    }
    cents
  }

  /** The `nProbe` nearest cell ids for the `qn` column, as an array —
    * one [[graft.functions.IvfProbesInt8]] kernel call per row. The
    * earlier spelling unrolled a `struct(|m|^2 - 2 x·m, i)` expression
    * PER CELL and array_sort-ed them: an O(nCells) expression tree that
    * bursts codegen past ~100 cells and drops the projection to
    * interpreted eval (a 256-cell assignment over 250k rows effectively
    * hung). The kernel is a tight loop over a driver-sized codebook
    * reference — nCells is now a real knob instead of a plan-size
    * hazard. Ordering is identical (exact long metric, ties by cell
    * id), pinned by the unchanged DuckDB oracles and LlmSpec.
    */
  private def probeCellsInt8(
      cents: Array[Array[Long]], nProbe: Int): Column =
    vector.ivf_probes_int8(col("qn"), cents.map(_.toSeq).toSeq, nProbe)

  /** Assign rows that already carry `qn`. */
  private def assignCellsInt8Q(q: DataFrame, cents: Array[Array[Long]]): DataFrame =
    q.withColumn("cell", element_at(probeCellsInt8(cents, 1), 1))

  /** (vec_id, qn, cell) for every non-zero vector of `e`. */
  private[llm] def assignCellsInt8(
      e: DataFrame, cents: Array[Array[Long]]): DataFrame =
    assignCellsInt8Q(withUnitQuantized(e), cents)

  /** [[ivfTopK]] re-based on the exact int8 machinery: coarse cells
    * from [[ivfCentroidsInt8]], per-query probes = the `nProbe`
    * nearest cells by the exact long metric, candidates scored with
    * [[vector.long_dot_product]]. Bit-for-bit replayable in DuckDB
    * ([[ivfTopKInt8Sql]]) INCLUDING the codebook training — the oracle
    * recomputes the same integer Lloyd in nested CTEs, so the check
    * covers the quantizer, not just the scan.
    */
  def ivfTopKInt8(
      e: DataFrame, k: Int = 5, nCells: Int = 16, nProbe: Int = 2,
      codebook: Option[Array[Array[Long]]] = None): DataFrame = {
    val v = graft.core.Layout.spread(e, "vec_id")
    val cents = codebook.getOrElse(ivfCentroidsInt8(v, nCells))
    // cells computed map-side; the vector crosses the cell join packed
    // (see int8CandidatePairs)
    val assigned = assignCellsInt8(v, cents)
      .select(col("vec_id"), vector.pack_int8(col("qn")).as("qb"), col("cell"))
    val probes = withUnitQuantized(v)
      .select(col("vec_id"), vector.pack_int8(col("qn")).as("qb"),
        explode(probeCellsInt8(cents, nProbe)).as("probe"))
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    probes.as("a")
      .join(assigned.as("b"),
        col("a.probe") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        vector.byte_dot_product(col("a.qb"), col("b.qb")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("a_id").as("vec_id"), col("b_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** CTE chain replaying [[ivfCentroidsInt8]] + the final corpus
    * assignment in DuckDB: `qsrc` (unit-quantized assignment corpus,
    * from `srcSql`), `qtrain` (the bounded 1-in-mod training slice of
    * the ORIGINAL embeddings — modulus via [[trainModSql]], the scalar
    * subquery twin of [[boundedTrainMod]]), `seed` (k lowest-vec_id training
    * vectors), then `iters` rounds of assign → rounded-mean (empty
    * cells keep their previous centroid via the LEFT JOIN COALESCE),
    * ending in `cells` = (vec_id, qn, cell) over `qsrc`. Every
    * distance is exact long arithmetic; the mean rounding replays
    * Spark's HALF_UP sequence.
    */
  /** Name of the final trained-codebook CTE produced by
    * [[int8IvfCtes]] for the default iteration count — callers must
    * reference THIS, not a hardcoded round name, so changing `iters`
    * cannot silently leave a consumer reading a stale training round.
    */
  private val Int8IvfIters = 2
  private def int8IvfFinalCte: String = s"m$Int8IvfIters"

  private def int8IvfCtes(
      srcSql: String, k: Int = 16, iters: Int = Int8IvfIters,
      sampleModSql: String = null): String = {
    val modSql = Option(sampleModSql).getOrElse(trainModSql("embeddings", k))
    def assign(from: String, cents: String, out: String): String =
      s"""$out AS (
         |  SELECT vec_id, qn, cell FROM (
         |    SELECT t.vec_id, t.qn, c.cell,
         |      row_number() OVER (PARTITION BY t.vec_id ORDER BY
         |        CAST(list_dot_product(c.m, c.m) AS BIGINT)
         |          - 2 * CAST(list_dot_product(t.qn, c.m) AS BIGINT), c.cell)
         |        AS rn
         |    FROM $from t CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    def means(prev: String, from: String, out: String): String =
      s"""$out AS (
         |  SELECT s.cell, COALESCE(n.m, s.m) AS m
         |  FROM $prev s LEFT JOIN (
         |    SELECT cell, list(mv ORDER BY pos) AS m
         |    FROM (SELECT cell, pos,
         |            CAST(round(CAST(sum(q) AS DOUBLE) / count(*), 0) AS BIGINT)
         |              AS mv
         |          FROM (SELECT cell, unnest(qn) AS q,
         |                  generate_subscripts(qn, 1) AS pos FROM $from)
         |          GROUP BY cell, pos)
         |    GROUP BY cell) n ON s.cell = n.cell)""".stripMargin
    val rounds = (1 to iters).map { r =>
      val prev = if (r == 1) "seed" else s"m${r - 1}"
      s"${assign("qtrain", prev, s"a$r")},\n${means(prev, s"a$r", s"m$r")}"
    }.mkString(",\n")
    s"""WITH qsrc AS (
       |  ${unitQuantSelect(srcSql)}),
       |qtrain AS (
       |  ${unitQuantSelect(
             s"SELECT vec_id, embedding FROM embeddings WHERE vec_id % $modSql = 0")}),
       |seed AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, qn AS m
       |  FROM (SELECT vec_id, qn FROM qtrain ORDER BY vec_id LIMIT $k)),
       |$rounds,
       |${assign("qsrc", s"m$iters", "cells")}""".stripMargin
  }

  /** Oracle replay of [[ivfTopKInt8]] — codebook training included. */
  def ivfTopKInt8Sql(k: Int = 5, nCells: Int = 16, nProbe: Int = 2): String =
    s"""${int8IvfCtes("SELECT vec_id, embedding FROM embeddings", nCells)},
       |probes AS (
       |  SELECT vec_id, qn, cell AS probe FROM (
       |    SELECT t.vec_id, t.qn, c.cell,
       |      row_number() OVER (PARTITION BY t.vec_id ORDER BY
       |        CAST(list_dot_product(c.m, c.m) AS BIGINT)
       |          - 2 * CAST(list_dot_product(t.qn, c.m) AS BIGINT), c.cell)
       |        AS rn
       |    FROM qsrc t CROSS JOIN $int8IvfFinalCte c)
       |  WHERE rn <= $nProbe)
       |SELECT a_id AS vec_id, b_id AS neighbor_id, rank, sim
       |FROM (SELECT a_id, b_id, sim,
       |        CAST(row_number() OVER (PARTITION BY a_id
       |          ORDER BY sim DESC, b_id) AS BIGINT) AS rank
       |      FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |              CAST(list_dot_product(a.qn, b.qn) AS BIGINT) AS sim
       |            FROM probes a JOIN cells b
       |              ON a.probe = b.cell AND a.vec_id <> b.vec_id))
       |WHERE rank <= $k""".stripMargin

  /** Batch ANN serving — the ASYMMETRIC shape [[ivfTopKInt8]]'s
    * self-join doesn't cover: a query batch searched AGAINST a corpus.
    * The corpus side is the IVF index (assigned to cells once,
    * cell-partitioned, vectors packed int8 — at 100 TB this side is
    * built once per corpus snapshot and reused across query batches);
    * each query probes only its `nProbe` nearest cells, so query-side
    * work is |Q| x nProbe rows no matter how large the corpus — the
    * property that makes serving feasible where brute force
    * ([[bruteForceTopK]], which broadcasts the query batch and scans
    * everything) stops at small batches. Identity matches (a query
    * vector that IS a corpus vector) are excluded by id. Same exact
    * long arithmetic as the self-join path, so the DuckDB oracle
    * ([[ivfSearchInt8Sql]]) replays it bit-for-bit, codebook training
    * included.
    */
  def ivfSearchInt8(
      corpus: DataFrame, queries: DataFrame, k: Int = 5, nCells: Int = 16,
      nProbe: Int = 2,
      codebook: Option[Array[Array[Long]]] = None): DataFrame = {
    val v = graft.core.Layout.spread(corpus, "vec_id")
    val cents = codebook.getOrElse(ivfCentroidsInt8(v, nCells))
    ivfSearchInt8Indexed(ivfIndexInt8(v, cents), queries, cents, k, nProbe)
  }

  /** The index side of [[ivfSearchInt8]]: (vec_id, qb packed int8,
    * cell) for every corpus vector. In a deployment this is the
    * build-once artifact — materialize it (parquet partitioned/bucketed
    * by `cell`) and serve every query batch from it via
    * [[ivfSearchInt8Indexed]] without touching the corpus again. The
    * one-shot [[ivfSearchInt8]] fuses the two for the driver query.
    */
  def ivfIndexInt8(corpus: DataFrame, cents: Array[Array[Long]]): DataFrame =
    assignCellsInt8(corpus, cents)
      .select(col("vec_id"), vector.pack_int8(col("qn")).as("qb"), col("cell"))

  /** Search a prebuilt [[ivfIndexInt8]] index: per-batch cost is the
    * query-side quantize + probe (|Q| x nProbe rows) plus the probed
    * cells' candidates — independent of corpus size at constant
    * per-cell occupancy (`ScaleProbe serve` measures exactly this).
    */
  /** The query side of an indexed IVF search: (query_id, qb packed
    * int8, probe) with one row per (query, probed cell). Stateless
    * map-only (quantize + kernel probe + explode), so it applies
    * unchanged to a STREAMING source — the shared front half of
    * [[ivfSearchInt8Indexed]] and
    * [[graft.streaming.DocStreams.nearDupMatches]].
    */
  private[graft] def ivfProbeSide(
      queries: DataFrame, cents: Array[Array[Long]], nProbe: Int): DataFrame =
    withUnitQuantized(queries)
      .select(col("vec_id").as("query_id"),
        vector.pack_int8(col("qn")).as("qb"),
        explode(probeCellsInt8(cents, nProbe)).as("probe"))

  def ivfSearchInt8Indexed(
      index: DataFrame, queries: DataFrame, cents: Array[Array[Long]],
      k: Int = 5, nProbe: Int = 2): DataFrame = {
    val probes = ivfProbeSide(queries, cents, nProbe)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    probes.as("a")
      .join(index.as("b"),
        col("a.probe") === col("b.cell") &&
          col("a.query_id") =!= col("b.vec_id"))
      .select(col("a.query_id"), col("b.vec_id"),
        vector.byte_dot_product(col("a.qb"), col("b.qb")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** 1-in-`SearchQueryMod` slice of the embeddings used as the serving
    * query batch — one constant for the Spark query and the oracle.
    */
  private[graft] val SearchQueryMod = 7L

  /** Structural cap on a broadcast EXACT-ground-truth query batch: a
    * fractional (1-in-mod) sample grows with the corpus, so a quality
    * panel that crossJoin-broadcasts it would eventually broadcast
    * corpus/mod vectors. Capping the batch (deterministic
    * order-by-vec_id top-N) keeps the exact side a bounded
    * queries × corpus scan at ANY corpus size, and lets the plan audit
    * prove every ANN BroadcastNestedLoop build side ≤ this many rows.
    * Never binds at test SFs (≤ 2000 vectors); mirrored in the oracle
    * SQL so both engines agree at every scale.
    */
  private[graft] val MaxQueryBatch = 1024

  /** Oracle replay of [[ivfSearchInt8]] over the
    * [[SearchQueryMod]]-slice query batch — codebook training included.
    */
  def ivfSearchInt8Sql(k: Int = 5, nCells: Int = 16, nProbe: Int = 2): String =
    s"""${int8IvfCtes("SELECT vec_id, embedding FROM embeddings", nCells)},
       |qq AS (
       |  ${unitQuantSelect(
             s"SELECT vec_id, embedding FROM embeddings WHERE vec_id % $SearchQueryMod = 0")}),
       |probes AS (
       |  SELECT vec_id AS query_id, qn, cell AS probe FROM (
       |    SELECT t.vec_id, t.qn, c.cell,
       |      row_number() OVER (PARTITION BY t.vec_id ORDER BY
       |        CAST(list_dot_product(c.m, c.m) AS BIGINT)
       |          - 2 * CAST(list_dot_product(t.qn, c.m) AS BIGINT), c.cell)
       |        AS rn
       |    FROM qq t CROSS JOIN $int8IvfFinalCte c)
       |  WHERE rn <= $nProbe)
       |SELECT query_id, neighbor_id, rank, sim
       |FROM (SELECT query_id, neighbor_id, sim,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM (SELECT a.query_id, b.vec_id AS neighbor_id,
       |              CAST(list_dot_product(a.qn, b.qn) AS BIGINT) AS sim
       |            FROM probes a JOIN cells b
       |              ON a.probe = b.cell AND a.query_id <> b.vec_id))
       |WHERE rank <= $k""".stripMargin

  /** Cosine eps 0.96 on the int8 unit scale:
    * 15484 ≈ round(0.96 * 127^2). Identical vectors quantize
    * identically, so a planted duplicate scores |qn|^2 ≈ 127^2 — far
    * above the cut (LlmSpec asserts every plant drops).
    */
  val SemDupDotThreshold = 15484L

  /** Oracle replay of [[semDedupInt8]] over `srcSql`. */
  def semDedupInt8Sql(
      srcSql: String, epsDot: Long = SemDupDotThreshold,
      nCells: Int = 16): String =
    s"""${int8IvfCtes(srcSql, nCells)},
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM cells a JOIN cells b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE CAST(list_dot_product(a.qn, b.qn) AS BIGINT) >= $epsDot)
       |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
       |  CASE WHEN d.vec_id IS NOT NULL THEN 'drop' ELSE 'keep' END AS action
       |FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id""".stripMargin

  /** SEMANTIC dedup (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): coarse-cluster the embeddings with the IVF
    * codebook, then within each cluster drop every vector that has an
    * eps-similar neighbor with a smaller vec_id — the greedy
    * keep-lowest-id rule, so each chain of semantic duplicates keeps
    * exactly its minimum element. Unlike [[Dedup.embeddingPairs]]
    * (which REPORTS near-dup pairs), this emits the keep/drop decision
    * a curation pipeline applies.
    *
    * Scale — the paper's entire point is that clustering makes
    * within-cluster pairwise feasible: the self-join is
    * cell-partitioned (expected n^2/nCells work, tunable), the
    * codebook broadcast is k x dim, the dropped set is answer-sized,
    * and the verdict join is co-partitioned on vec_id. Nothing
    * quadratic crosses a cell boundary; a pathologically hot cell is
    * AQE's skew-join case and, structurally, the signal to raise
    * nCells.
    *
    * Seeded float centroids => not ANSI-expressible: rows-only driver
    * check; LlmSpec asserts equality against a brute-force in-memory
    * replay of the same rule.
    */
  def semDedup(
      e: DataFrame, eps: Double = 0.96, nCells: Int = 16,
      codebook: Option[Array[Array[Double]]] = None): DataFrame = {
    val v = graft.core.Layout.spread(e, "vec_id")
    val cents = codebook.getOrElse(ivfCentroids(v, nCells))
    val assigned = assignCells(v, cents)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val dropped = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(vector.cosine_similarity(
        col("a.embedding"), col("b.embedding")) >= eps)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cell").cast("bigint").as("cell"))
      .join(dropped.withColumn("d", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("d").isNotNull, "drop").otherwise("keep").as("action"))
  }

  /** [[semDedup]] re-based on the exact int8 machinery: cells from
    * [[ivfCentroidsInt8]], the within-cell greedy keep-lowest-id rule
    * applied at long dot >= `epsDot` (≈ cos 0.96 on the unit-int8
    * scale). Same cell-partitioned scale shape as the float path, and
    * — with the codebook training replayed in the oracle's CTEs
    * ([[semDedupInt8Sql]]) — the whole keep/drop decision is
    * hash-checked by the driver instead of rows-only.
    */
  def semDedupInt8(
      e: DataFrame, epsDot: Long = SemDupDotThreshold, nCells: Int = 16,
      codebook: Option[Array[Array[Long]]] = None): DataFrame = {
    val v = graft.core.Layout.spread(e, "vec_id")
    val cents = codebook.getOrElse(ivfCentroidsInt8(v, nCells))
    val assigned = assignCellsInt8(v, cents)
      .select(col("vec_id"), vector.pack_int8(col("qn")).as("qb"), col("cell"))
    val dropped = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(vector.byte_dot_product(col("a.qb"), col("b.qb")) >= epsDot)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cell").cast("bigint").as("cell"))
      .join(dropped.withColumn("d", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("d").isNotNull, "drop").otherwise("keep").as("action"))
  }

  /** Symmetric int8 quantization of the embedding column (the storage /
    * bandwidth lever for 100 TB vector corpora): per-vector max-abs
    * scale, elements rounded to [-127, 127], plus the reconstruction
    * error. Map-only; every arithmetic step is per-row IEEE double (the
    * error fold runs in array order), so the DuckDB oracle matches
    * exactly.
    */
  /** (vec_id, emb: double[], scale, q: bigint[]) — the shared max-abs
    * int8 quantization both [[quantizeInt8]] and [[jlProject]] derive
    * from (one definition, so the projection can never drift from the
    * quantization it claims to project). nullif guard: an all-zero
    * vector would make scale 0, v/scale NaN, and the bigint cast a
    * runtime ANSI error; NULL scale instead propagates NULL quantized
    * values — a clean row, and the identical spelling in the DuckDB
    * oracles.
    */
  private def withQuantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      transform(col("embedding"), v => v.cast("double")).as("emb"))
      .withColumn("scale", nullif(
        array_max(transform(col("emb"), v => abs(v))) / lit(127.0), lit(0.0)))
      .withColumn("q", transform(col("emb"), v =>
        round(v / col("scale"), 0).cast("bigint")))

  def quantizeInt8(e: DataFrame): DataFrame = {
    def resid(v: Column): Column =
      v - round(v / col("scale"), 0) * col("scale")
    withQuantized(e)
      .withColumn("err2", aggregate(
        transform(col("emb"), v => resid(v) * resid(v)),
        lit(0.0), (acc, x) => acc + x))
      .select(
        col("vec_id"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        round(col("scale"), 9).as("scale_r"),
        round(sqrt(col("err2")), 9).as("l2_err_r"))
  }

  /** SHARED TEXT BUILDER for [[quantizeInt8]]'s SQL: the Spark facade
    * statement (q_sql_embed_quantize) and the DuckDB oracle come from
    * this one template — the residual expression and its left-to-right
    * fold order (the float discipline) are spelled once. Dialect
    * splits are array-HOF names only. (The embed family's PCA faces
    * stay oracle-only: their power iteration needs 128-bit integers —
    * DuckDB HUGEINT — which Spark SQL has no counterpart for.)
    */
  def quantizeInt8SqlText(d: graft.sql.Dialect): String = {
    val resid = "(v - round(v / scale, 0) * scale)"
    s"""SELECT vec_id,
       |  CAST(${d.arrayMin("q")} AS BIGINT) AS q_min,
       |  CAST(${d.arrayMax("q")} AS BIGINT) AS q_max,
       |  round(scale, 9) AS scale_r,
       |  round(sqrt(${d.sumFoldDouble(
                       d.transform("emb", s"v -> $resid * $resid"))}), 9)
       |    AS l2_err_r
       |FROM (
       |  SELECT vec_id, emb, scale,
       |    ${d.transform("emb", "v -> CAST(round(v / scale, 0) AS BIGINT)")} AS q
       |  FROM (
       |    SELECT vec_id, emb,
       |      nullif(${d.arrayMax(d.transform("emb", "v -> abs(v)"))} / 127.0, 0)
       |        AS scale
       |    FROM (SELECT vec_id,
       |            ${d.transform("embedding", "v -> CAST(v AS DOUBLE)")} AS emb
       |          FROM embeddings)))""".stripMargin
  }

  val quantizeInt8Sql: String = quantizeInt8SqlText(graft.sql.Dialect.duck)

  // --------------------------------------------------------------------
  // Product quantization (PQ — Jégou et al. 2011, "Product Quantization
  // for Nearest Neighbor Search"). The 100 TB MEMORY path the int8
  // family doesn't cover: the corpus side of an ANN index stores one
  // `m`-code word per vector (4 bits x 8 subspaces = 8 B, vs 64 B for
  // int8, 256 B for float32), and asymmetric-distance (ADC) scoring
  // reads only the codes plus a driver-sized codebook. Everything is
  // exact long arithmetic over the unit-int8 vectors, so the DuckDB
  // oracle replays the FULL pipeline including per-subspace codebook
  // training.
  // --------------------------------------------------------------------

  private val PqM = 8        // subspaces
  private val PqSubDim = 8   // dims per subspace (8 x 8 = 64)
  private val PqK = 16       // centroids per subspace -> 4-bit codes
  private val PqIters = 2    // Lloyd rounds, same budget as the IVF book

  /** Per-subspace codebooks via the SAME exact integer Lloyd as
    * [[ivfCentroidsInt8]], trained on the unit-int8 slices: seeds are
    * the k lowest-vec_id sample vectors sliced per subspace; each round
    * assigns with the |m|^2 - 2 x·m long metric (ties by cell) and
    * re-centers on HALF_UP rounded means. All `m` subspaces train in
    * ONE pass per round — the per-sub assignment is m codegen kernel
    * calls in a single projection, the mean aggregation keys on
    * (sub, cell, pos) — so the training cost does not grow with m.
    * Only the m x k x subDim codebook (1024 longs) reaches the driver.
    */
  private[graft] def pqCodebooks(
      e: DataFrame, m: Int = PqM, subDim: Int = PqSubDim, k: Int = PqK,
      iters: Int = PqIters, sampleMod: Long = 0, knownCount: Long = -1L)
      : Array[Array[Array[Long]]] = {
    // modulus from the RAW count — the oracle's qtrain counts the raw
    // embeddings relation, before the zero-vector quantization filter
    val mod = if (sampleMod > 0) sampleMod
      else boundedTrainMod(if (knownCount >= 0) knownCount else e.count(), k)
    pqCodebooksQ(withUnitQuantized(e), m, subDim, k, iters, mod)
  }

  /** [[pqCodebooks]] over a pre-quantized `(vec_id, qn)` frame — the
    * entry point the IVF-PQ residual path trains through.
    */
  private[graft] def pqCodebooksQ(
      q: DataFrame, m: Int = PqM, subDim: Int = PqSubDim, k: Int = PqK,
      iters: Int = PqIters, sampleMod: Long = 0)
      : Array[Array[Array[Long]]] = {
    // auto-modulus counts `q` itself — the residual path's oracle
    // counts the resid CTE, the same (post-quantization) relation;
    // the frame is barriered by its one caller, so the count is a
    // materialized-block scan, and the codebook is session-cached
    val mod = if (sampleMod > 0) sampleMod else boundedTrainMod(q.count(), k)
    val sample = q.filter(pmod(col("vec_id"), lit(mod)) === 0)
    def longs(r: org.apache.spark.sql.Row): Array[Long] =
      r.getAs[scala.collection.Seq[Long]]("qn").toArray
    val seedRows = sample.orderBy("vec_id").limit(k).collect().map(longs)
    var books: Array[Array[Array[Long]]] =
      Array.tabulate(m)(s => seedRows.map(v => v.slice(s * subDim, (s + 1) * subDim)))
    for (_ <- 0 until iters) {
      val parts = array((0 until m).map { s =>
        struct(
          lit(s).as("sub"),
          element_at(vector.ivf_probes_int8(
            slice(col("qn"), s * subDim + 1, subDim),
            books(s).map(_.toSeq).toSeq, 1), 1).as("cell"),
          slice(col("qn"), s * subDim + 1, subDim).as("sv"))
      }: _*)
      val means = sample.select(explode(parts).as("p"))
        .select(col("p.sub").as("sub"), col("p.cell").as("cell"),
          posexplode(col("p.sv")).as(Seq("pos", "v")))
        .groupBy("sub", "cell", "pos")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2)).map { r =>
            // the IVF book's IEEE-then-HALF_UP rounding sequence,
            // replayed as CAST(round(s / n, 0) AS BIGINT) in DuckDB
            java.math.BigDecimal.valueOf(r.getLong(3).toDouble / r.getLong(4))
              .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
          }
        }
      books = Array.tabulate(m)(s => Array.tabulate(k)(c =>
        means.getOrElse((s, c), books(s)(c))))
    }
    books
  }

  /** (vec_id, qn, c0..c{m-1}) — every vector's per-subspace nearest
    * cell (0-based), one [[graft.functions.IvfProbesInt8]] kernel call
    * per subspace. Map-only.
    */
  private[llm] def pqCodes(
      e: DataFrame, books: Array[Array[Array[Long]]]): DataFrame =
    pqCodesQ(withUnitQuantized(graft.core.Layout.spread(e, "vec_id")), books)

  /** [[pqCodes]] over a pre-quantized frame carrying `qn` (any other
    * columns ride along untouched).
    */
  private[llm] def pqCodesQ(
      q: DataFrame, books: Array[Array[Array[Long]]]): DataFrame = {
    val m = books.length
    val subDim = books(0)(0).length
    q.select(
      (q.columns.map(col).toSeq ++ (0 until m).map { s =>
        element_at(vector.ivf_probes_int8(
          slice(col("qn"), s * subDim + 1, subDim),
          books(s).map(_.toSeq).toSeq, 1), 1).as(s"c$s")
      }): _*)
  }

  /** Codebook-reconstruction of the coded vector: concat over
    * subspaces of the selected centroid (the vector ADC scores
    * against). Pure literal-array lookup — no shuffle, no kernel.
    */
  private def pqRecon(books: Array[Array[Array[Long]]]): Column =
    concat(books.indices.map { s =>
      val bookLit = array(books(s).map(c => array(c.map(lit): _*)): _*)
      element_at(bookLit, col(s"c$s") + 1)
    }: _*)

  /** PQ encode: one 32-bit codeword (4 bits per subspace) plus the
    * exact integer reconstruction error per vector — the artifact a
    * 100 TB index SHIPS (8 B/vector) and the diagnostic that says
    * whether m/k suffice for the corpus. recon_err decomposes as
    * sum over subspaces of |sv|^2 - 2 sv·m + |m|^2 — exact longs,
    * identically computable from the zip_with spelling.
    */
  def pqEncode(
      e: DataFrame, books: Array[Array[Array[Long]]]): DataFrame = {
    val m = books.length
    pqCodes(e, books).select(
      col("vec_id"),
      (0 until m).map(s => col(s"c$s").cast("bigint") * lit(1L << (4 * s)))
        .reduce(_ + _).as("codeword"),
      aggregate(
        zip_with(col("qn"), pqRecon(books), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x).as("recon_err"))
  }

  /** ADC top-k: score every (query, corpus) pair as the exact long dot
    * of the query's unit-int8 vector with the corpus vector's PQ
    * RECONSTRUCTION — the corpus side carries only codes, rebuilt on
    * the fly from the broadcast codebook and packed to binary for the
    * codegen [[graft.functions.ByteDotProduct]] kernel. Self-pairs
    * excluded, ranking ties broken by vec_id, same conventions as the
    * int8 ANN family. Scale: the scored side reads 8 B/vector off
    * storage; scoring stays a linear scan (pair PQ with the IVF cells
    * for the sub-linear variant — the candidate-join machinery is
    * [[ivfSearchInt8Indexed]]'s, unchanged).
    */
  def pqTopK(
      e: DataFrame, books: Array[Array[Array[Long]]],
      nQueries: Int = 5, k: Int = 10): DataFrame =
    pqTopKFromCodes(
      pqEncode(e, books).select("vec_id", "codeword"), books,
      // limit is proof-only (vec_id unique ⇒ filter yields ≤ nQueries)
      e.filter(col("vec_id") < nQueries).orderBy("vec_id").limit(nQueries), k)

  /** Serve ADC top-k from a STORED code table — the deployment split:
    * `codes` is the [[pqEncode]] artifact a 100 TB pipeline persists
    * (8 B/vector; the probe measures ~10 B/vector on disk vs ~92 for
    * float32 parquet), `queries` is a fresh embedding batch. The 4-bit
    * codes decode from the codeword by shift-and-mask, reconstruct
    * against the broadcast codebook, and score with the codegen
    * byte-dot kernel — the corpus scan reads codewords only.
    */
  def pqTopKFromCodes(
      codes: DataFrame, books: Array[Array[Array[Long]]],
      queries: DataFrame, k: Int = 10): DataFrame = {
    val m = books.length
    val subDim = books(0)(0).length
    val corpus = codes.select(
      col("vec_id") +: (0 until m).map { s =>
        shiftright(col("codeword"), 4 * s).bitwiseAND(lit(15L))
          .cast("int").as(s"c$s")
      }: _*)
    // Per-query ADC lookup table, computed ONCE per query row on the
    // broadcast side: lut[s*k + c] = exact long dot of the query's
    // subspace s slice with centroid c. Scoring a pair is then m
    // array lookups + adds — the classic ADC trade (Jégou et al.
    // §III.C), and crucially the per-pair expression carries NO
    // per-corpus-row reconstruction for Catalyst's projection
    // collapse to re-evaluate per query (the recon-then-dot spelling
    // re-packed the reconstruction |Q| times per vector: 4.8 s for
    // 50q x 400k where this spelling is sub-float-brute).
    val lut = concat((0 until m).map { s =>
      array(books(s).map { cent =>
        aggregate(
          zip_with(
            slice(col("qn"), s * subDim + 1, subDim),
            array(cent.map(lit): _*), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x)
      }: _*)
    }: _*)
    val nCells = books(0).length
    val queriesSide = withUnitQuantized(queries)
      .select(col("vec_id").as("query_id"), lut.as("lut"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(queriesSide))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (0 until m).map(s =>
          element_at(col("lut"), col(s"c$s") + lit(s * nCells + 1)))
          .reduce(_ + _).as("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "sim")
  }

  /** CTE chain replaying [[pqCodebooks]] + [[pqCodes]] in DuckDB:
    * `qsrc` (unit-quantized corpus), `qtrain` (sample slice), `subs`
    * (0..m-1), `tsub` (per-subspace training slices), `p0` (sliced
    * seeds), then per round `pa{r}` (assign) / `p{r}` (rounded means,
    * empty cells keep the previous centroid), ending in `csub` =
    * (vec_id, sub, sv, cell) over the corpus and `recon` =
    * (vec_id, recon).
    */
  private def pqCtes(
      srcSql: String, m: Int = PqM, subDim: Int = PqSubDim, k: Int = PqK,
      iters: Int = PqIters, sampleModSql: String = null): String =
    s"""WITH qsrc AS (
       |  ${unitQuantSelect(srcSql)}),
       |qtrain AS (
       |  ${unitQuantSelect(
             s"SELECT vec_id, embedding FROM embeddings WHERE vec_id % ${
               Option(sampleModSql).getOrElse(trainModSql("embeddings", k))} = 0")}),
       |${pqCoreCtes("qsrc", "qtrain", m, subDim, k, iters)}""".stripMargin

  /** The training + assignment CTE chain over NAMED `(vec_id, qn)`
    * corpus / training CTEs — shared by the plain-PQ oracle (unit-int8
    * vectors) and the IVF-PQ oracle (coarse-cell residuals).
    */
  private def pqCoreCtes(
      corpusQn: String, trainQn: String, m: Int, subDim: Int, k: Int,
      iters: Int): String = {
    def sliced(alias: String) =
      s"$alias.qn[(s.sub * $subDim + 1):((s.sub + 1) * $subDim)]"
    def assign(from: String, cents: String, out: String): String =
      s"""$out AS (
         |  SELECT sub, vec_id, sv, cell FROM (
         |    SELECT t.sub, t.vec_id, t.sv, c.cell,
         |      row_number() OVER (PARTITION BY t.sub, t.vec_id ORDER BY
         |        CAST(list_dot_product(c.m, c.m) AS BIGINT)
         |          - 2 * CAST(list_dot_product(t.sv, c.m) AS BIGINT), c.cell)
         |        AS rn
         |    FROM $from t JOIN $cents c ON t.sub = c.sub)
         |  WHERE rn = 1)""".stripMargin
    def means(prev: String, from: String, out: String): String =
      s"""$out AS (
         |  SELECT s.sub, s.cell, COALESCE(n.m, s.m) AS m
         |  FROM $prev s LEFT JOIN (
         |    SELECT sub, cell, list(mv ORDER BY pos) AS m
         |    FROM (SELECT sub, cell, pos,
         |            CAST(round(CAST(sum(q) AS DOUBLE) / count(*), 0) AS BIGINT)
         |              AS mv
         |          FROM (SELECT sub, cell, unnest(sv) AS q,
         |                  generate_subscripts(sv, 1) AS pos FROM $from)
         |          GROUP BY sub, cell, pos)
         |    GROUP BY sub, cell) n
         |  ON s.sub = n.sub AND s.cell = n.cell)""".stripMargin
    val rounds = (1 to iters).map { r =>
      val prev = if (r == 1) "p0" else s"p${r - 1}"
      s"${assign("tsub", prev, s"pa$r")},\n${means(prev, s"pa$r", s"p$r")}"
    }.mkString(",\n")
    s"""subs AS (SELECT CAST(unnest(range($m)) AS INT) AS sub),
       |tsub AS (
       |  SELECT t.vec_id, s.sub, ${sliced("t")} AS sv
       |  FROM $trainQn t CROSS JOIN subs s),
       |p0 AS (
       |  SELECT s.sub,
       |    CAST(row_number() OVER (PARTITION BY s.sub ORDER BY v.vec_id) - 1
       |      AS INT) AS cell,
       |    ${sliced("v")} AS m
       |  FROM (SELECT vec_id, qn FROM $trainQn ORDER BY vec_id LIMIT $k) v
       |  CROSS JOIN subs s),
       |$rounds,
       |qsub AS (
       |  SELECT t.vec_id, s.sub, ${sliced("t")} AS sv
       |  FROM $corpusQn t CROSS JOIN subs s),
       |${assign("qsub", s"p$iters", "csub")},
       |recon AS (
       |  SELECT c.vec_id, flatten(list(b.m ORDER BY c.sub)) AS recon
       |  FROM csub c JOIN p$iters b ON c.sub = b.sub AND c.cell = b.cell
       |  GROUP BY c.vec_id)""".stripMargin
  }

  /** Oracle replay of [[pqEncode]] — training included. */
  def pqEncodeSql(m: Int = PqM, iters: Int = PqIters): String = {
    val caseConst = (0 until m)
      .map(s => s"WHEN $s THEN ${1L << (4 * s)}")
      .mkString(" ")
    s"""${pqCtes("SELECT vec_id, embedding FROM embeddings")}
       |SELECT c.vec_id,
       |  CAST(sum(CAST(c.cell AS BIGINT) * CASE c.sub $caseConst END)
       |    AS BIGINT) AS codeword,
       |  CAST(sum(CAST(list_dot_product(c.sv, c.sv) AS BIGINT)
       |    - 2 * CAST(list_dot_product(c.sv, b.m) AS BIGINT)
       |    + CAST(list_dot_product(b.m, b.m) AS BIGINT)) AS BIGINT)
       |    AS recon_err
       |FROM csub c JOIN p$iters b ON c.sub = b.sub AND c.cell = b.cell
       |GROUP BY c.vec_id""".stripMargin
  }

  /** Oracle replay of [[pqTopK]]. */
  def pqTopKSql(nQueries: Int = 5, k: Int = 10): String =
    s"""${pqCtes("SELECT vec_id, embedding FROM embeddings")}
       |SELECT query_id, vec_id, rank, sim FROM (
       |  SELECT q.vec_id AS query_id, r.vec_id AS vec_id,
       |    CAST(list_dot_product(q.qn, r.recon) AS BIGINT) AS sim,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      CAST(list_dot_product(q.qn, r.recon) AS BIGINT) DESC, r.vec_id)
       |      AS BIGINT) AS rank
       |  FROM (SELECT vec_id, qn FROM qsrc WHERE vec_id < $nQueries) q
       |  JOIN recon r ON q.vec_id <> r.vec_id)
       |WHERE rank <= $k""".stripMargin

  // --------------------------------------------------------------------
  // IVF-PQ (the composed index — Jégou et al. 2011 §IV): coarse IVF
  // cells prune the scan to nProbe cells per query, PQ codes over the
  // CELL RESIDUALS compress what remains to 8 B/vector. Residuals are
  // what make the composition work at scale: vectors in one cell share
  // its centroid, so their residual cloud is tighter than the raw
  // corpus and the same 4-bit codebook quantizes it with far less
  // error. Still exact long arithmetic end to end — residuals are
  // differences of longs — so the oracle replays BOTH trainings.
  // --------------------------------------------------------------------

  private def centArrLit(cents: Array[Array[Long]]): Column =
    array(cents.map(c => array(c.map(lit): _*)): _*)

  /** (vec_id, cell, qn = unit-int8 vector minus its coarse centroid).
    * Map-only over the assignment: one kernel call + one zip_with.
    */
  private[graft] def ivfResiduals(
      e: DataFrame, cents: Array[Array[Long]]): DataFrame =
    assignCellsInt8(graft.core.Layout.spread(e, "vec_id"), cents)
      .select(col("vec_id"), col("cell"),
        zip_with(col("qn"), element_at(centArrLit(cents), col("cell") + 1),
          (a, b) => a - b).as("qn"))

  /** ADC top-k over the IVF-PQ index: queries probe their `nProbe`
    * nearest coarse cells; candidates are scored as the exact long dot
    * of the query vector with (centroid + residual reconstruction).
    * The corpus side of this plan carries cell id + codes only — the
    * 100 TB shape: per-query work is probe-cell occupancy (the
    * `ScaleProbe serve` property), per-candidate memory is 8 B + the
    * driver-sized codebooks.
    */
  def ivfPqTopK(
      e: DataFrame, cents: Array[Array[Long]],
      books: Array[Array[Array[Long]]], nQueries: Int = 5, k: Int = 10,
      nProbe: Int = 2): DataFrame = {
    val full = pqCodesQ(ivfResiduals(e, cents), books)
      .select(col("vec_id"), col("cell"),
        zip_with(element_at(centArrLit(cents), col("cell") + 1),
          pqRecon(books), (a, b) => a + b).as("recon"))
    val probes = withUnitQuantized(e)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qn"),
        explode(probeCellsInt8(cents, nProbe)).as("probe"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    probes.join(full,
        col("probe") === col("cell") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        vector.long_dot_product(col("qn"), col("recon")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "sim")
  }

  /** Oracle replay of [[ivfPqTopK]] — coarse-cell training (IVF CTEs),
    * residuals, per-subspace residual codebook training, and the probed
    * ADC scan, all in one CTE chain.
    */
  def ivfPqTopKSql(
      nQueries: Int = 5, k: Int = 10, nCells: Int = 16, nProbe: Int = 2,
      m: Int = PqM, subDim: Int = PqSubDim, pk: Int = PqK,
      iters: Int = PqIters, sampleModSql: String = null): String =
    s"""${int8IvfCtes("SELECT vec_id, embedding FROM embeddings", nCells)},
       |resid AS (
       |  SELECT c.vec_id, c.cell,
       |    [c.qn[i] - b.m[i] FOR i IN range(1, len(c.qn) + 1)] AS qn
       |  FROM cells c JOIN $int8IvfFinalCte b ON c.cell = b.cell),
       |residtrain AS (
       |  SELECT vec_id, qn FROM resid WHERE vec_id % ${
             Option(sampleModSql).getOrElse(trainModSql("resid", pk))} = 0),
       |${pqCoreCtes("resid", "residtrain", m, subDim, pk, iters)},
       |full_recon AS (
       |  SELECT r.vec_id, c.cell,
       |    [b.m[i] + r.recon[i] FOR i IN range(1, len(r.recon) + 1)]
       |      AS recon
       |  FROM recon r
       |  JOIN cells c ON r.vec_id = c.vec_id
       |  JOIN $int8IvfFinalCte b ON c.cell = b.cell),
       |qprobes AS (
       |  SELECT vec_id, qn, cell AS probe FROM (
       |    SELECT t.vec_id, t.qn, c.cell,
       |      row_number() OVER (PARTITION BY t.vec_id ORDER BY
       |        CAST(list_dot_product(c.m, c.m) AS BIGINT)
       |          - 2 * CAST(list_dot_product(t.qn, c.m) AS BIGINT), c.cell)
       |        AS rn
       |    FROM (SELECT vec_id, qn FROM qsrc WHERE vec_id < $nQueries) t
       |    CROSS JOIN $int8IvfFinalCte c)
       |  WHERE rn <= $nProbe)
       |SELECT query_id, vec_id, rank, sim FROM (
       |  SELECT q.vec_id AS query_id, f.vec_id AS vec_id,
       |    CAST(list_dot_product(q.qn, f.recon) AS BIGINT) AS sim,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      CAST(list_dot_product(q.qn, f.recon) AS BIGINT) DESC, f.vec_id)
       |      AS BIGINT) AS rank
       |  FROM qprobes q JOIN full_recon f
       |    ON q.probe = f.cell AND q.vec_id <> f.vec_id)
       |WHERE rank <= $k""".stripMargin

  private val ivfPqBookCache =
    new graft.core.SessionCache[String, Array[Array[Array[Long]]]]

  private[llm] def cachedIvfPqBooks(
      s: SparkSession, dir: String): Array[Array[Array[Long]]] =
    ivfPqBookCache.getOrElseUpdate(s, dir)(
      pqCodebooksQ(
        // checkpoint: the residual frame re-derives quantize + cell
        // assignment per consumer (auto-mod count, seed collect, each
        // Lloyd round) — materialize it once instead of ~4 times
        ivfResiduals(emb(s, dir), cachedCentroidsInt8(s, dir))
          .select("vec_id", "qn").barrier()))

  private val pqBookCache =
    new graft.core.SessionCache[String, Array[Array[Array[Long]]]]

  private[llm] def cachedPqBooks(
      s: SparkSession, dir: String): Array[Array[Array[Long]]] =
    pqBookCache.getOrElseUpdate(s, dir)(
      pqCodebooks(emb(s, dir), knownCount = cachedEmbCount(s, dir)))

  /** Base offset for the JL sign stream — disjoint from [[PlaneBase]]'s
    * LSH range so the two [[mix64]] streams never alias.
    */
  private val JlBase = 2000003L

  /** sign(j, i) of the JL projection matrix — ONE driver-side source
    * (splitmix64, like [[planeSign]]) inlined as literal constants into
    * BOTH the Spark expression and the generated DuckDB oracle. The
    * previous inline-LCG spelling (bit 16 of 1103515245x+12345 mod
    * 2^31, replayed formula-for-formula in SQL) had the same disease
    * the round-8 ann probe caught in the LSH planes: adjacent-index
    * LCG sign streams are strongly correlated — measured mean
    * |row-pair dot| 30.6 of 64 (max 60: two of the 16 output dims were
    * near-duplicates), so the projection carried far fewer than 16
    * independent directions. With mix64 the rows are iid-quality, and
    * as literals the generator needs no SQL spelling at all.
    */
  private[llm] def jlSign(j: Int, i: Int, inDim: Int): Long =
    if ((mix64(JlBase + (j.toLong * inDim + i)) & 1L) == 0L) 1L else -1L

  /** Johnson-Lindenstrauss random projection to `outDim` dimensions
    * over the int8-QUANTIZED embedding (reusing [[quantizeInt8]]'s
    * max-abs scale): out[j] = sum_i q[i] * sign(j, i), with the ±1
    * sign matrix from [[jlSign]] (the Achlioptas projection, literal
    * constants in both engines).
    *
    * Projecting the quantized ints instead of the raw floats keeps
    * every sum ORDER-INDEPENDENT (bigint adds commute exactly; float
    * adds don't), so the DuckDB oracle matches bit-for-bit — unlike the
    * seeded-xxhash ops that are rows-only. The dimensionality knob for
    * 100 TB ANN: 64 float32 dims -> `outDim` small ints shrinks the
    * candidate-verify bandwidth ~8x while JL preserves pairwise
    * distances (asserted in CorpusOpsSpec). Map-only, no shuffle.
    */
  def jlProject(e: DataFrame, outDim: Int = 16, inDim: Int = 64): DataFrame = {
    withQuantized(e)
      .select(
        col("vec_id"),
        array((0 until outDim).map { j =>
          val signs = array((0 until inDim).map(i =>
            lit(jlSign(j, i, inDim))): _*)
          aggregate(sequence(lit(0), lit(inDim - 1)), lit(0L),
            (acc, i) => acc + element_at(col("q"), i + 1) *
              element_at(signs, i + 1))
        }: _*).as("proj"),
        round(col("scale"), 9).as("scale_r"))
  }

  /** Driver-facing shape of [[jlProject]]: the grading harness
    * canonicalizes results with a pandas sort, which cannot hash an
    * array column — so the projection vector is emitted as a CSV
    * string (bigint-to-decimal rendering is locale-free and identical
    * in Spark and DuckDB, so the hash check stays bit-exact).
    */
  def jlProjectFlat(e: DataFrame, outDim: Int = 16, inDim: Int = 64): DataFrame =
    jlProject(e, outDim, inDim).select(
      col("vec_id"),
      array_join(col("proj").cast("array<string>"), ",").as("proj_csv"),
      col("scale_r"))

  /** Oracle replay of [[jlProject]] — the sign matrix is inlined from
    * [[jlSign]], the single source of truth.
    */
  val jlProjectSql: String = {
    val dims = (0 until 16).map { j =>
      val signs = (0 until 64).map(i => jlSign(j, i, 64))
        .mkString("[", ",", "]")
      s"""    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(64), i -> q[i + 1] * ($signs)[i + 1])),
         |      (a, b) -> a + b) AS BIGINT)""".stripMargin
    }.mkString(",\n")
    s"""SELECT vec_id,
       |  [
       |$dims
       |  ] AS proj,
       |  round(scale, 9) AS scale_r
       |FROM (
       |  SELECT vec_id, scale,
       |    list_transform(emb, v -> CAST(round(v / scale, 0) AS BIGINT)) AS q
       |  FROM (
       |    SELECT vec_id, emb,
       |      nullif(list_max(list_transform(emb, v -> abs(v))) / 127.0, 0)
       |        AS scale
       |    FROM (SELECT vec_id,
       |            list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
       |          FROM embeddings)))""".stripMargin
  }

  /** [[jlProjectSql]] reshaped to match [[jlProjectFlat]]. */
  val jlProjectFlatSql: String =
    s"""SELECT vec_id,
       |  array_to_string(list_transform(proj, x -> CAST(x AS VARCHAR)), ',')
       |    AS proj_csv,
       |  scale_r
       |FROM (
       |$jlProjectSql
       |)""".stripMargin

  /** Centroid per label (classification-ish aggregate over vectors):
    * element-wise mean via posexplode + group — algebraic, partial-agg
    * friendly, and SQL-mirrorable.
    */
  def labelCentroidNorm(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(avg("v").as("m"))
      .groupBy("label")
      .agg(round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"),
        count(lit(1)).as("dim"))

  val labelCentroidNormSql: String =
    """SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm,
      |  count(*) AS dim
      |FROM (
      |  SELECT label, pos, avg(CAST(v AS DOUBLE)) AS m
      |  FROM (SELECT label,
      |          unnest(embedding) AS v,
      |          generate_subscripts(embedding, 1) - 1 AS pos
      |        FROM embeddings)
      |  GROUP BY label, pos)
      |GROUP BY label""".stripMargin

  // The codebook is a deterministic trained ARTIFACT of the corpus —
  // memoize it per (session, corpus dir) like any model: re-training it
  // on every query invocation would re-pay the Lloyd jobs for an
  // identical result. Session-stop evicts (SessionCache), so stopped
  // sessions' codebooks don't pile up across a JVM's lifetime.
  private val codebookCache =
    new graft.core.SessionCache[String, Array[Array[Double]]]

  private def cachedCentroids(s: SparkSession, dir: String): Array[Array[Double]] =
    codebookCache.getOrElseUpdate(s, dir)(
      ivfCentroids(emb(s, dir), knownCount = cachedEmbCount(s, dir)))

  private val int8CodebookCache =
    new graft.core.SessionCache[String, Array[Array[Long]]]

  private def cachedCentroidsInt8(
      s: SparkSession, dir: String): Array[Array[Long]] =
    int8CodebookCache.getOrElseUpdate(s, dir)(
      ivfCentroidsInt8(emb(s, dir), knownCount = cachedEmbCount(s, dir)))

  /** The planted-duplicate source for q_dedup_semantic, once for both
    * engines (Spark plant below; DuckDB plant inlined in the oracle):
    * the synthetic embeddings carry no true near-dups (max pairwise
    * cos ~0.51), so the query plants exact duplicates of a 1-in-50
    * slice under offset ids — the same make-the-operator-observable
    * device as the decontam queries' doc_id%97 reference split.
    */
  private val SemPlantMod = 50L
  private val SemPlantOffset = 10000000L
  private[llm] val semPlantSql: String =
    s"""SELECT vec_id, embedding FROM embeddings
       |    UNION ALL
       |    SELECT vec_id + $SemPlantOffset AS vec_id, embedding
       |    FROM embeddings WHERE vec_id % $SemPlantMod = 0""".stripMargin

  /** LSH geometry shared by [[Dedup.embeddingPairsInt8]] and
    * [[simHistogram]] — the histogram must bucket the SAME candidate
    * set the dedup threshold will be applied to. Hosted here (not in
    * Dedup) so object initialization stays one-directional.
    */
  val EmbedDupPlanes = 4
  val EmbedDupTables = 4

  /** Similarity-threshold selection histogram: bucket the int8 cosine
    * of every LSH CANDIDATE pair (no similarity filter) into 0.1-wide
    * cosine bins (1613 ≈ 0.1 x 127^2 on the int8 dot scale). This is
    * the diagnostic a curator reads BEFORE choosing a dedup threshold:
    * the histogram's valley between the near-dup mode and the
    * background mass is where the threshold belongs — picking it blind
    * is how a corpus loses 10% of its distinct mass. The bin index is
    * floor(sim/1613) over exact integer dots, so every engine agrees
    * on every boundary.
    *
    * Scale: identical join shape to [[Dedup.embeddingPairsInt8]]
    * (bucketed candidates, packed int8 rows, no corpus broadcast); the
    * histogram aggregate is ~30 rows.
    */
  def simHistogram(e: DataFrame): DataFrame =
    int8CandidatePairs(
        e.select(col("vec_id"), col("embedding")),
        EmbedDupPlanes, EmbedDupTables,
        (a, b) => a < b)
      .select(floor(col("sim").cast("double") / 1613.0).as("bin"),
        col("sim"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"),
        min("sim").as("min_sim"), max("sim").as("max_sim"))

  def simHistogramSql(nPlanes: Int, nTables: Int, dim: Int = 64): String =
    s"""${int8PairsSqlCtes(nPlanes, nTables, "<", dim)}
       |SELECT CAST(floor(CAST(sim AS DOUBLE) / 1613.0) AS BIGINT) AS bin,
       |  count(*) AS n_pairs, min(sim) AS min_sim, max(sim) AS max_sim
       |FROM pairs
       |GROUP BY 1""".stripMargin

  /** ANN recall panel: recall@k of the int8 LSH index against EXACT
    * int8 top-k ground truth on a 1-in-[[SearchQueryMod]] query sample
    * — [[Dedup.lshQuality]]'s sibling for the vector side, and the
    * panel that says whether nPlanes/nTables fit a corpus BEFORE a
    * recall regression ships. One answer row: query count, hit count,
    * scaled-integer average recall, and the worst single query's hit
    * count (the tail a mean hides).
    *
    * Scale: the exact side is the asymmetric serving shape (sampled
    * queries broadcast, one corpus scan — never corpus x corpus); the
    * LSH side is the bucketed candidate join the index already pays;
    * the compare is an answer-sized pair join.
    */
  def annQuality(e: DataFrame, k: Int = 5): DataFrame = {
    val uq = withUnitQuantized(e)
    val sample = uq.filter(pmod(col("vec_id"), lit(SearchQueryMod)) === 0)
      .orderBy("vec_id").limit(MaxQueryBatch)
      .select(col("vec_id").as("q_id"), vector.pack_int8(col("qn")).as("qb"))
    val corpus = uq
      .select(col("vec_id").as("c_id"), vector.pack_int8(col("qn")).as("cb"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    val exact = corpus.crossJoin(broadcast(sample))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        vector.byte_dot_product(col("qb"), col("cb")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "c_id")
    val lsh = lshTopKInt8(e, k = k)
      .filter(pmod(col("vec_id"), lit(SearchQueryMod)) === 0)
      .select(col("vec_id").as("q_id"), col("neighbor_id").as("c_id"))
    val perQ = exact.groupBy("q_id").agg(count(lit(1)).as("n_truth"))
      .join(exact.join(lsh, Seq("q_id", "c_id"))
          .groupBy("q_id").agg(count(lit(1)).as("n_hit")),
        Seq("q_id"), "left")
      .select(col("q_id"), col("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
    perQ.agg(
      count(lit(1)).as("n_queries"),
      sum("n_truth").as("n_truth"),
      sum("n_hit").as("n_hits"),
      min("n_hit").as("worst_hits"))
      .select(col("n_queries"), col("n_truth"), col("n_hits"),
        expr("n_hits * 10000 DIV nullif(n_truth, 0)").as("recall_x10000"),
        col("worst_hits"))
  }

  def annQualitySql(k: Int = 5): String =
    s"""WITH uq AS (
       |  ${unitQuantSelect("SELECT vec_id, embedding FROM embeddings")}),
       |qbatch AS (
       |  SELECT * FROM uq WHERE vec_id % $SearchQueryMod = 0
       |  ORDER BY vec_id LIMIT $MaxQueryBatch),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        CAST(list_dot_product(q.qn, c.qn) AS BIGINT) DESC, c.vec_id)
       |        AS BIGINT) AS rank
       |    FROM qbatch q JOIN uq c ON c.vec_id <> q.vec_id)
       |  WHERE rank <= $k),
       |lshres AS (
       |  SELECT vec_id AS q_id, neighbor_id AS c_id
       |  FROM (${lshTopKInt8Sql(k = k)})
       |  WHERE vec_id % $SearchQueryMod = 0),
       |perq AS (
       |  SELECT t.q_id,
       |    CAST(count(*) AS BIGINT) AS n_truth,
       |    CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit
       |  FROM exact t LEFT JOIN (
       |    SELECT e.q_id, count(*) AS n_hit
       |    FROM exact e JOIN lshres l ON e.q_id = l.q_id AND e.c_id = l.c_id
       |    GROUP BY e.q_id) h ON t.q_id = h.q_id
       |  GROUP BY t.q_id, h.n_hit)
       |SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(sum(n_truth) AS BIGINT) AS n_truth,
       |  CAST(sum(n_hit) AS BIGINT) AS n_hits,
       |  CAST(sum(n_hit) * 10000 // nullif(sum(n_truth), 0) AS BIGINT)
       |    AS recall_x10000,
       |  CAST(min(n_hit) AS BIGINT) AS worst_hits
       |FROM perq""".stripMargin

  /** Label-centroid similarity matrix — corpus redundancy at GROUP
    * grain: the unit-int8 centroid of each label class, every pair
    * scored by the exact integer dot and a SIGNED SQUARED cosine in
    * ppm (`sign(dot) · 10⁶·dot² DIV (|a|²·|b|²)` — the sqrt-free
    * spelling that keeps the panel bit-exact where a float cosine
    * would hash-diverge). Two near-parallel class centroids (~10⁶ ppm)
    * mean the classes are redundant for contrastive sampling; near-0
    * means orthogonal.
    *
    * Scale: one posexplode aggregate to (label, pos) sums, rounded
    * means via the shared IEEE-then-HALF_UP spelling, then an
    * answer-sized (|labels|·dim) self-join on pos. Magnitudes ≤
    * 64·127² keep 10⁶·dot² inside int64 at any corpus size.
    */
  def labelCentroidSim(e: DataFrame): DataFrame = {
    val q = withUnitQuantized(e)
      .join(e.select(col("vec_id"), col("label").cast("bigint").as("label")),
        "vec_id")
    // localCheckpoint: `sums` is answer-sized (|labels| x dim rows) but
    // feeds three consumers (norms + both sides of the dot self-join) —
    // uncheckpointed, each consumer re-pays the full corpus
    // quantization scan (PlanAudit: 11 exchanges for a panel)
    val sums = q.select(col("label"), posexplode(col("qn")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), col("n"),
        expr("CAST(round(CAST(s AS DOUBLE) / n, 0) AS BIGINT)").as("m"))
      .barrier()
    val norms = sums.groupBy("label")
      .agg(sum(col("m") * col("m")).as("m2"), max("n").as("n_vecs"))
    val dots = sums.as("a").join(sums.as("b"),
        col("a.pos") === col("b.pos") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.m") * col("b.m")).as("dot"))
    dots
      .join(norms.select(col("label").as("label_a"), col("m2").as("m2_a"),
        col("n_vecs").as("n_a")), "label_a")
      .join(norms.select(col("label").as("label_b"), col("m2").as("m2_b"),
        col("n_vecs").as("n_b")), "label_b")
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dot"),
        expr("""CASE WHEN dot >= 0 THEN 1 ELSE -1 END *
          (1000000 * dot * dot DIV (m2_a * m2_b))""").as("cos2_signed_ppm"))
  }

  val labelCentroidSimSql: String =
    s"""WITH $unitQuantizedSql,
       |lab AS (
       |  SELECT b.vec_id, b.qn, CAST(e.label AS BIGINT) AS label
       |  FROM base b JOIN embeddings e ON b.vec_id = e.vec_id),
       |sums AS (
       |  SELECT label, pos, count(*) AS n,
       |    CAST(round(CAST(sum(v) AS DOUBLE) / count(*), 0) AS BIGINT) AS m
       |  FROM (
       |    SELECT label, u.i - 1 AS pos, qn[u.i] AS v
       |    FROM lab, LATERAL (
       |      SELECT unnest(generate_series(1, len(qn))) AS i) u)
       |  GROUP BY 1, 2),
       |norms AS (
       |  SELECT label, sum(m * m) AS m2, max(n) AS n_vecs
       |  FROM sums GROUP BY 1),
       |dots AS (
       |  SELECT a.label AS label_a, b.label AS label_b,
       |    sum(a.m * b.m) AS dot
       |  FROM sums a JOIN sums b
       |    ON a.pos = b.pos AND a.label < b.label
       |  GROUP BY 1, 2)
       |SELECT d.label_a, d.label_b,
       |  CAST(na.n_vecs AS BIGINT) AS n_a, CAST(nb.n_vecs AS BIGINT) AS n_b,
       |  CAST(d.dot AS BIGINT) AS dot,
       |  CAST((CASE WHEN d.dot >= 0 THEN 1 ELSE -1 END) *
       |    (1000000 * d.dot * d.dot // (na.m2 * nb.m2)) AS BIGINT)
       |    AS cos2_signed_ppm
       |FROM dots d
       |JOIN norms na ON d.label_a = na.label
       |JOIN norms nb ON d.label_b = nb.label""".stripMargin

  /** kNN-classifier evaluation — the "are these embeddings any good
    * for classification" panel: every query-slice vector classified by
    * the majority label of its k nearest neighbors (self excluded —
    * scoring a point by its own label is the classic leakage), scored
    * against its true label, accuracy per class in permille. Composes
    * the deployed ANN path ([[ivfSearchInt8]]), so the panel measures
    * the classifier users would actually serve, probes and all.
    * Deterministic majority: (votes desc, label asc).
    *
    * Scale: the search at its documented per-cell cost; everything
    * after is (queries x k) rows into answer-sized aggregates.
    */
  def knnClassify(
      e: DataFrame,
      codebook: Option[Array[Array[Long]]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = e.filter(pmod(col("vec_id"), lit(SearchQueryMod)) === 0)
    val res = ivfSearchInt8(e, queries, k = 6, codebook = codebook)
    val labels = e.select(col("vec_id"), col("label").cast("bigint")
      .as("lbl"))
    val votes = res.filter(col("neighbor_id") =!= col("query_id"))
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("lbl").as("nlabel")), "neighbor_id")
      .groupBy("query_id", "nlabel").agg(count(lit(1)).as("v"))
    val wv = Window.partitionBy("query_id")
      .orderBy(col("v").desc, col("nlabel"))
    val pred = votes.withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("nlabel").as("pred"))
    pred.join(labels.select(col("vec_id").as("query_id"),
        col("lbl").as("true_label")), "query_id")
      .groupBy("true_label")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("pred") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("true_label"), col("n_queries"), col("n_correct"),
        expr("1000 * n_correct DIV n_queries").as("acc_permille"))
  }

  val knnClassifySql: String =
    s"""WITH res AS (${ivfSearchInt8Sql(k = 6)}),
       |lab AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS lbl FROM embeddings),
       |votes AS (
       |  SELECT r.query_id, nl.lbl AS nlabel, count(*) AS v
       |  FROM res r JOIN lab nl ON r.neighbor_id = nl.vec_id
       |  WHERE r.neighbor_id <> r.query_id
       |  GROUP BY 1, 2),
       |pred AS (
       |  SELECT query_id, nlabel AS pred FROM (
       |    SELECT query_id, nlabel,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY v DESC, nlabel) AS rn
       |    FROM votes)
       |  WHERE rn = 1)
       |SELECT q.lbl AS true_label, count(*) AS n_queries,
       |  CAST(sum(CASE WHEN p.pred = q.lbl THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_correct,
       |  CAST(1000 * sum(CASE WHEN p.pred = q.lbl THEN 1 ELSE 0 END)
       |    // count(*) AS BIGINT) AS acc_permille
       |FROM pred p JOIN lab q ON p.query_id = q.vec_id
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------ PCA (power method)

  /** Dominant principal component of the embedding corpus by
    * DETERMINISTIC power iteration — the whitening/decorrelation
    * primitive a SemDeDup-style pipeline runs before cosine
    * thresholds, reduced to Spark-shaped work: one corpus pass builds
    * the 64x64 integer scatter matrix, then everything else is
    * model-sized.
    *
    * Exactness: vectors go through the shared [[withUnitQuantized]]
    * int8 kernel (the one float fold both engines replay identically),
    * so the scatter matrix n*Sigma(x_i x_j) - S_i S_j is EXACT integer
    * (DECIMAL(38,0) here, HUGEINT oracle-side — the documented
    * pairing; entries bound 16129*n^2, past int64 at ~7.5e5 vectors).
    * Power iteration runs 8 fixed rounds from a deterministic
    * Knuth-hash start vector (a constant start would sit exactly
    * orthogonal to zero-sum directions and never escape — see the
    * inline note); each round divides by md = max(1, max|u| DIV 1e6)
    * — Spark DIV and DuckDB HUGEINT // both truncate toward zero
    * (verified on negatives), so the rounds match bit-for-bit. Sign
    * is fixed by making the first nonzero component positive (the
    * eigenvector's inherent sign ambiguity, resolved the same way in
    * both engines via min_by). lambda = Rayleigh quotient v'Cv / v'v;
    * var_explained_permille = 1000*lambda/trace(C), exact integer DIV.
    *
    * Scale: ONE corpus pass accumulates the X'X outer products in a
    * typed [[ScatterAgg]] (4161 longs of per-partition state, fused
    * multiply-adds, no explode) — the only shuffle is one buffer per
    * partition meeting at the final merge, the CMS-cell discipline.
    * The 4096-integer scatter matrix then collects to the driver and
    * the eigensolve runs locally — Spark MLlib's own RowMatrix PCA
    * shape (distribute the Gramian pass, never the 64x64 matvecs;
    * scheduling 16 tiny shuffles for microsecond arithmetic is pure
    * overhead). The collect is the audited bounded class (k-row
    * Lloyd's-seed size), and the BigInt loop is bit-identical to the
    * oracle's HUGEINT recurrence.
    */
  /** One-pass scatter accumulator: buffer = [ Σx_i x_j (4096) |
    * Σx_i (64) | n (1) ] as longs. Genuine per-partition imperative
    * state (the Misra-Gries exception): the explode-free alternative
    * to a 4096-term outer-product flatMap, so the corpus pass does
    * 64x64 fused multiply-adds per vector in place of building and
    * shuffling structs. Long cells bound 16129*n — exact to ~5.7e14
    * vectors, far past any corpus here (documented like the other
    * int64 bounds; the DECIMAL escape hatch is mechanical if ever
    * needed).
    */
  private[graft] class ScatterAgg
      extends org.apache.spark.sql.expressions
        .Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val D = 64
    def zero: Array[Long] = new Array[Long](D * D + D + 1)
    def reduce(b: Array[Long], x: Array[Long]): Array[Long] = {
      var i = 0
      while (i < D) {
        val xi = x(i)
        val row = i * D
        var j = 0
        while (j < D) { b(row + j) += xi * x(j); j += 1 }
        b(D * D + i) += xi
        i += 1
      }
      b(D * D + D) += 1L
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** ONE corpus pass: the typed scatter aggregator partial-aggregates
    * map-side, so the only shuffle is the 4161-long buffers (one per
    * partition) meeting at the final merge — sketch-sized, the CMS
    * discipline. Returns the MODEL-sized 64x64 BigInt scatter matrix
    * n*Sum(x_i x_j) - S_i S_j; the eigensolve then runs on the driver,
    * exactly what Spark MLlib's RowMatrix PCA does with its Gramian
    * (the distributed work is the corpus pass; iterating 64x64
    * matvecs through the scheduler would pay ~16 tiny shuffles for
    * arithmetic a core does in microseconds). Bounded-collect class:
    * same as the k-row Lloyd's codebook seeds, audited.
    */
  private def scatterBig(e: DataFrame): Array[Array[BigInt]] = {
    val spark = e.sparkSession
    import spark.implicits._
    val flat = withUnitQuantized(e).select(col("qn")).as[Array[Long]]
      .select(new ScatterAgg().toColumn)
      .head()
    val n = BigInt(flat(64 * 64 + 64))
    Array.tabulate(64, 64)((i, j) =>
      n * BigInt(flat(i * 64 + j)) -
        BigInt(flat(64 * 64 + i)) * BigInt(flat(64 * 64 + j)))
  }

  private def bigMatvec(
      cm: Array[Array[BigInt]], x: Array[BigInt]): Array[BigInt] =
    Array.tabulate(64)(i =>
      (0 until 64).foldLeft(BigInt(0))((a, j) => a + cm(i)(j) * x(j)))

  /** Deterministic Knuth-hash start vector (offset picks independent
    * starts per component), NOT all-ones: a constant vector is exactly
    * orthogonal to any zero-sum direction (alternating signs,
    * contrasts), and power iteration never escapes the orthogonal
    * complement of its start — the hash start is generic.
    */
  private def bigSeed(off: Long): Array[BigInt] =
    Array.tabulate(64)(j =>
      BigInt((j.toLong * 2654435761L + off) % 2000001L - 1000000L))

  /** Fixed-round power loop in BigInt — bit-identical to the oracle's
    * HUGEINT recurrence (BigInteger division truncates toward zero
    * like DuckDB //). With `proj = Some(v1)` each matvec result is
    * deflated DIVISION-FREE by u' = u*(v1'v1) - v1*(v1'u) — exact
    * orthogonal projection scaled by v1'v1, which the normalization
    * absorbs — so the iterate converges to the SECOND component while
    * every step stays integer-replayable.
    */
  private def bigPower(
      cm: Array[Array[BigInt]], seedOff: Long, rounds: Int,
      proj: Option[Array[BigInt]]): Array[BigInt] = {
    val q1 = proj.map(p =>
      (0 until 64).foldLeft(BigInt(0))((a, i) => a + p(i) * p(i)))
    var v = bigSeed(seedOff)
    var r = 0
    while (r < rounds) {
      val u0 = bigMatvec(cm, v)
      val u = proj match {
        case Some(p) =>
          val dot = (0 until 64).foldLeft(BigInt(0))((a, i) => a + p(i) * u0(i))
          Array.tabulate(64)(i => u0(i) * q1.get - p(i) * dot)
        case None => u0
      }
      val md = u.map(_.abs).max / 1000000 max BigInt(1)
      v = u.map(_ / md) // BigInt / truncates toward zero == HUGEINT //
      r += 1
    }
    v
  }

  private def bigDot(a: Array[BigInt], b: Array[BigInt]): BigInt =
    (0 until 64).foldLeft(BigInt(0))((x, i) => x + a(i) * b(i))

  /** Sign convention: first nonzero component positive. */
  private def bigSign(v: Array[BigInt]): Long =
    v.find(_ != 0).map(x => if (x < 0) -1L else 1L).getOrElse(1L)

  /** [[ScatterAgg]] keyed by label (input carries the group). */
  private class LabelScatterAgg
      extends org.apache.spark.sql.expressions
        .Aggregator[(Int, Array[Long]), Array[Long], Array[Long]] {
    private val inner = new ScatterAgg
    def zero: Array[Long] = inner.zero
    def reduce(b: Array[Long], x: (Int, Array[Long])): Array[Long] =
      inner.reduce(b, x._2)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      inner.merge(a, b)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Panel row from a flat scatter buffer: the pure function shared
    * by the batch panel below and the streaming per-label state in
    * [[graft.streaming.DocStreams.scatterByLabelFeed]] — batch ==
    * stream is then equality of inputs, not a re-derivation.
    * (n_vecs, trace, dominant_dim, offdiag_permille): trace = total
    * scaled variance, dominant_dim = the diagonal argmax (lowest dim
    * on ties), offdiag_permille = 1000*Sum|c_ij, i!=j| / (that + trace)
    * — a class whose mass sits off-diagonal is correlated/rotated,
    * one that is near-diagonal is axis-aligned.
    */
  private[graft] def scatterPanelRow(
      flat: Array[Long]): (Long, Long, Long, Long) = {
    val n = BigInt(flat(64 * 64 + 64))
    def c(i: Int, j: Int): BigInt =
      n * BigInt(flat(i * 64 + j)) -
        BigInt(flat(64 * 64 + i)) * BigInt(flat(64 * 64 + j))
    var tr = BigInt(0)
    var off = BigInt(0)
    var domDim = 0
    var domVal: BigInt = null
    var i = 0
    while (i < 64) {
      val d = c(i, i)
      tr += d
      if (domVal == null || d > domVal) { domVal = d; domDim = i }
      var j = 0
      while (j < 64) {
        if (j != i) off += c(i, j).abs
        j += 1
      }
      i += 1
    }
    val ratio =
      if (off + tr == 0) 0L else ((BigInt(1000) * off) / (off + tr)).toLong
    (n.toLong, tr.toLong, domDim.toLong, ratio)
  }

  /** Per-label scatter-matrix summary — the class-spread diagnostic a
    * labeled embedding corpus wants (is a class tight or diffuse?
    * axis-aligned or rotated? which dimension carries it?) computed
    * from the SAME additive 4161-long scatter buffers as
    * [[pcaPower]]: one typed aggregation keyed by label, partial-
    * aggregated map-side, so the shuffle is one buffer per
    * (label x partition) — the scatter buffer IS a mergeable sketch,
    * and [[graft.streaming.DocStreams.scatterByLabelFeed]] holds
    * exactly it as per-label streaming state (batch == stream
    * bit-for-bit, the HLL-register closure for second moments).
    * trace.toLong is exact while n*16129*n^2 < 2^63 (~5e4 vectors per
    * label at int8 scale) — the test tiers sit far under; the DECIMAL
    * escape is mechanical if a corpus ever crosses it.
    */
  /** (label, qn) — the labeled unit-int8 corpus, shared with the
    * streaming scatter feed so batch and stream quantize identically.
    * Same per-element math as [[withUnitQuantized]], but MAP-ONLY
    * (label carried through the projection, no join back) so it is
    * legal on a stream.
    */
  private[graft] def unitQuantizedLabeled(e: DataFrame): DataFrame =
    // spread by the unique key for the same single-scan-task reason as
    // [[withUnitQuantized]] (label is too coarse to spread by); same
    // r19 single-kernel spelling, bit-identical to the old HOF chain
    graft.core.Layout.spread(e, "vec_id")
      .select(col("label").cast("int").as("label"),
        graft.functions.vector.unit_quantize_int8(col("embedding")).as("qn"))
      .filter(col("qn").isNotNull)

  def scatterByLabel(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val perLabel = unitQuantizedLabeled(e)
      .as[(Int, Array[Long])]
      .groupByKey(_._1)
      .agg(new LabelScatterAgg().toColumn)
      .collect() // one 4161-long buffer per label — answer-sized
    perLabel.toSeq
      .map { case (lbl, flat) =>
        val (n, tr, dd, ratio) = scatterPanelRow(flat)
        (lbl.toLong, n, tr, dd, ratio)
      }
      .toDF("label", "n_vecs", "trace", "dominant_dim", "offdiag_permille")
  }

  val scatterByLabelSql: String =
    s"""WITH $unitQuantizedSql,
       |lab AS (SELECT e.vec_id, CAST(e.label AS INTEGER) AS label, b.qn
       |  FROM embeddings e JOIN base b ON e.vec_id = b.vec_id),
       |prods AS MATERIALIZED (
       |  SELECT label, r1.range AS i, r2.range AS j,
       |    CAST(sum(CAST(qn[r1.range + 1] AS HUGEINT)
       |      * qn[r2.range + 1]) AS HUGEINT) AS p
       |  FROM lab CROSS JOIN range(64) r1 CROSS JOIN range(64) r2
       |  GROUP BY 1, 2, 3),
       |sums AS MATERIALIZED (
       |  SELECT label, r.range AS i,
       |    CAST(sum(CAST(qn[r.range + 1] AS HUGEINT)) AS HUGEINT) AS s
       |  FROM lab CROSS JOIN range(64) r GROUP BY 1, 2),
       |nn AS (SELECT label, CAST(count(*) AS HUGEINT) AS n FROM lab
       |       GROUP BY 1),
       |cov AS MATERIALIZED (
       |  SELECT p.label, p.i, p.j, nn.n * p.p - s1.s * s2.s AS c
       |  FROM prods p
       |  JOIN sums s1 ON s1.label = p.label AND s1.i = p.i
       |  JOIN sums s2 ON s2.label = p.label AND s2.i = p.j
       |  JOIN nn ON nn.label = p.label),
       |stats AS (
       |  SELECT label,
       |    CAST(sum(CASE WHEN i = j THEN c ELSE 0 END) AS HUGEINT) AS tr,
       |    CAST(sum(CASE WHEN i <> j THEN abs(c) ELSE 0 END) AS HUGEINT)
       |      AS off
       |  FROM cov GROUP BY 1),
       |dom AS (
       |  SELECT label, CAST(i AS BIGINT) AS dd FROM (
       |    SELECT label, i, row_number() OVER (PARTITION BY label
       |      ORDER BY c DESC, i) AS rn
       |    FROM cov WHERE i = j)
       |  WHERE rn = 1)
       |SELECT CAST(n.label AS BIGINT) AS label,
       |  CAST(n.n AS BIGINT) AS n_vecs, CAST(s.tr AS BIGINT) AS trace,
       |  d.dd AS dominant_dim,
       |  CASE WHEN s.off + s.tr = 0 THEN 0
       |    ELSE CAST((1000 * s.off) // (s.off + s.tr) AS BIGINT)
       |  END AS offdiag_permille
       |FROM nn n
       |JOIN stats s ON s.label = n.label
       |JOIN dom d ON d.label = n.label""".stripMargin

  def pcaPower(e: DataFrame, rounds: Int = 8): DataFrame = {
    val spark = e.sparkSession
    val cm = scatterBig(e)
    val v = bigPower(cm, 0L, rounds, None)
    val num = bigDot(bigMatvec(cm, v), v)
    val den = bigDot(v, v)
    val tr = (0 until 64).foldLeft(BigInt(0))((a, i) => a + cm(i)(i))
    val ve =
      if (den * tr == 0) 0L else ((BigInt(1000) * num) / (den * tr)).toLong
    val s = bigSign(v)
    import spark.implicits._
    v.toSeq.zipWithIndex
      .map { case (x, j) => (j.toLong, x.toLong * s, ve) }
      .toDF("dim", "eig_micro", "var_explained_permille")
  }

  /** Top-2 PCA panel: the dominant component plus the SECOND one via
    * division-free integer deflation (see [[bigPower]] — each deflated
    * matvec is u*(v1'v1) - v1*(v1'u), exact projection up to the
    * normalization's truncating division, which re-admits at most one
    * scaled unit of v1 per round and is projected back out on the
    * next). Emits both eigvectors, both Rayleigh variance shares, and
    * the measured cross-component cos^2 in ppm (`ortho_ppm` — the
    * deflation-quality number, asserted tiny in the spec). Oracle
    * replays both loops in HUGEINT CTEs; products stay under the
    * 128-bit bound to ~1.6e6 vectors at this scale (Spark-side BigInt
    * is unbounded).
    */
  def pcaTop2(e: DataFrame, rounds: Int = 8): DataFrame = {
    val spark = e.sparkSession
    val cm = scatterBig(e)
    val tr = (0 until 64).foldLeft(BigInt(0))((a, i) => a + cm(i)(i))
    val v1 = bigPower(cm, 0L, rounds, None)
    val v2 = bigPower(cm, 999983L, rounds, Some(v1))
    def share(v: Array[BigInt]): Long = {
      val num = bigDot(bigMatvec(cm, v), v)
      val den = bigDot(v, v)
      if (den * tr == 0) 0L else ((BigInt(1000) * num) / (den * tr)).toLong
    }
    val (ve1, ve2) = (share(v1), share(v2))
    val d12 = bigDot(v1, v2)
    val (q1, q2) = (bigDot(v1, v1), bigDot(v2, v2))
    val ortho =
      if (q1 * q2 == 0) 0L
      else ((BigInt(1000000) * d12 * d12) / (q1 * q2)).toLong
    val (s1, s2) = (bigSign(v1), bigSign(v2))
    import spark.implicits._
    (0 until 64).map(j =>
        (j.toLong, v1(j).toLong * s1, v2(j).toLong * s2, ve1, ve2, ortho))
      .toDF("dim", "eig1_micro", "eig2_micro",
        "var1_permille", "var2_permille", "ortho_ppm")
  }

  /** Shared CTE prefix: unit quantization, scatter matrix `cov`, trace. */
  private val pcaHeadSql: String =
    s"""WITH $unitQuantizedSql,
       |prods AS MATERIALIZED (
       |  SELECT r1.range AS i, r2.range AS j,
       |    CAST(sum(CAST(qn[r1.range + 1] AS HUGEINT)
       |      * qn[r2.range + 1]) AS HUGEINT) AS p
       |  FROM base CROSS JOIN range(64) r1 CROSS JOIN range(64) r2
       |  GROUP BY 1, 2),
       |sums AS MATERIALIZED (
       |  SELECT r.range AS i,
       |    CAST(sum(CAST(qn[r.range + 1] AS HUGEINT)) AS HUGEINT) AS s
       |  FROM base CROSS JOIN range(64) r GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM base),
       |cov AS MATERIALIZED (
       |  SELECT p.i, p.j, nn.n * p.p - s1.s * s2.s AS c
       |  FROM prods p
       |  JOIN sums s1 ON s1.i = p.i
       |  JOIN sums s2 ON s2.i = p.j
       |  CROSS JOIN nn),
       |tr AS (SELECT CAST(sum(c) AS HUGEINT) AS tr FROM cov
       |       WHERE i = j)""".stripMargin

  /** Seed CTE for a power chain named `p0`. */
  private def pcaSeedSql(p: String, off: Long): String =
    s""",
       |${p}0 AS (SELECT CAST(range AS BIGINT) AS j,
       |    CAST((range * 2654435761 + $off) % 2000001 - 1000000 AS BIGINT)
       |      AS v FROM range(64))""".stripMargin

  /** One power round for chain `p`; with `proj = Some((chain, qCte))`
    * the matvec is deflated division-free: u*(v1'v1) - v1*(v1'u).
    */
  private def pcaRoundSql(
      p: String, r: Int, proj: Option[(String, String)]): String = {
    val raw =
      s""",
         |u$p$r AS (SELECT c.i AS j, CAST(sum(c.c * v.v) AS HUGEINT) AS u
         |  FROM cov c JOIN $p${r - 1} v ON c.j = v.j GROUP BY 1)"""
        .stripMargin
    val deflate = proj match {
      case Some((v1, q1)) =>
        s""",
           |d$p$r AS (SELECT CAST(sum(CAST(p.v AS HUGEINT) * u.u)
           |    AS HUGEINT) AS d
           |  FROM u$p$r u JOIN $v1 p ON u.j = p.j),
           |e$p$r AS (SELECT u.j,
           |    u.u * $q1.q - CAST(p.v AS HUGEINT) * d$p$r.d AS u
           |  FROM u$p$r u JOIN $v1 p ON u.j = p.j, d$p$r, $q1)"""
          .stripMargin
      case None => ""
    }
    val src = if (proj.isDefined) s"e$p$r" else s"u$p$r"
    raw + deflate +
      s""",
         |m$p$r AS (SELECT greatest(CAST(1 AS HUGEINT),
         |    CAST(max(abs(u)) AS HUGEINT) // 1000000) AS md FROM $src),
         |$p$r AS MATERIALIZED (
         |  SELECT j, CAST(u // md AS BIGINT) AS v FROM $src, m$p$r)"""
        .stripMargin
  }

  /** Rayleigh share CTE `ve<tag>` for the final chain table `vt`. */
  private def pcaShareSql(tag: String, vt: String): String =
    s""",
       |f$tag AS (SELECT c.i, CAST(sum(c.c * v.v) AS HUGEINT) AS u
       |  FROM cov c JOIN $vt v ON c.j = v.j GROUP BY 1),
       |st$tag AS (SELECT CAST(sum(f$tag.u * v.v) AS HUGEINT) AS num,
       |    CAST(sum(CAST(v.v AS HUGEINT) * v.v) AS HUGEINT) AS den
       |  FROM f$tag JOIN $vt v ON f$tag.i = v.j),
       |ve$tag AS (SELECT CASE WHEN st$tag.den * tr.tr = 0 THEN 0
       |    ELSE CAST((1000 * st$tag.num) // (st$tag.den * tr.tr) AS BIGINT)
       |    END AS ve FROM st$tag, tr)""".stripMargin

  /** Sign CTE `sg<tag>` (first nonzero component positive). */
  private def pcaSignSql(tag: String, vt: String): String =
    s""",
       |sg$tag AS (SELECT CAST(coalesce(
       |    min_by(CASE WHEN v < 0 THEN -1 ELSE 1 END, j), 1) AS BIGINT)
       |  AS s FROM $vt WHERE v <> 0)""".stripMargin

  def pcaPowerSql(rounds: Int = 8): String =
    pcaHeadSql + pcaSeedSql("v", 0L) +
      (1 to rounds).map(pcaRoundSql("v", _, None)).mkString +
      pcaShareSql("1", s"v$rounds") + pcaSignSql("1", s"v$rounds") +
      s"""
         |SELECT v.j AS dim, CAST(v.v * sg1.s AS BIGINT) AS eig_micro,
         |  ve1.ve AS var_explained_permille
         |FROM v$rounds v, sg1, ve1""".stripMargin

  def pcaTop2Sql(rounds: Int = 8): String =
    pcaHeadSql + pcaSeedSql("v", 0L) +
      (1 to rounds).map(pcaRoundSql("v", _, None)).mkString +
      s""",
         |q1 AS (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
         |  FROM v$rounds)""".stripMargin +
      pcaSeedSql("w", 999983L) +
      (1 to rounds)
        .map(pcaRoundSql("w", _, Some((s"v$rounds", "q1")))).mkString +
      pcaShareSql("1", s"v$rounds") + pcaShareSql("2", s"w$rounds") +
      pcaSignSql("1", s"v$rounds") + pcaSignSql("2", s"w$rounds") +
      s""",
         |q2 AS (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
         |  FROM w$rounds),
         |d12 AS (SELECT CAST(sum(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT)
         |    AS d
         |  FROM v$rounds a JOIN w$rounds b ON a.j = b.j),
         |orth AS (SELECT CASE WHEN q1.q * q2.q = 0 THEN 0
         |    ELSE CAST((1000000 * d12.d * d12.d) // (q1.q * q2.q)
         |      AS BIGINT) END AS o
         |  FROM d12, q1, q2)
         |SELECT a.j AS dim, CAST(a.v * sg1.s AS BIGINT) AS eig1_micro,
         |  CAST(b.v * sg2.s AS BIGINT) AS eig2_micro,
         |  ve1.ve AS var1_permille, ve2.ve AS var2_permille,
         |  orth.o AS ortho_ppm
         |FROM v$rounds a JOIN w$rounds b ON a.j = b.j,
         |  sg1, sg2, ve1, ve2, orth""".stripMargin

  /** APPLY form of the PCA pair: every vector scored on the top-2
    * components — (vec_id, pc1_score, pc2_score), the dimensionality-
    * reduced view a downstream near-dup / visualization / stratified-
    * sampling step consumes. Re-pays component training (the
    * survivors/venn trio convention), then scoring is one MAP-ONLY
    * pass: each int8 vector dotted with two 64-literal sign-fixed
    * eigvectors inside codegen'd zip_with/aggregate HOFs — no
    * shuffle, no join, scores bound 64*127*1e6 < int64.
    */
  def pcaProject(e: DataFrame, rounds: Int = 8): DataFrame = {
    val cm = scatterBig(e)
    val v1 = bigPower(cm, 0L, rounds, None)
    val v2 = bigPower(cm, 999983L, rounds, Some(v1))
    val (s1, s2) = (bigSign(v1), bigSign(v2))
    def litVec(v: Array[BigInt], s: Long): Column =
      array(v.map(x => lit(x.toLong * s)): _*)
    def score(vec: Column): Column =
      aggregate(zip_with(col("qn"), vec, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    withUnitQuantized(e).select(col("vec_id"),
      score(litVec(v1, s1)).as("pc1_score"),
      score(litVec(v2, s2)).as("pc2_score"))
  }

  def pcaProjectSql(rounds: Int = 8): String =
    pcaHeadSql + pcaSeedSql("v", 0L) +
      (1 to rounds).map(pcaRoundSql("v", _, None)).mkString +
      s""",
         |q1 AS (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
         |  FROM v$rounds)""".stripMargin +
      pcaSeedSql("w", 999983L) +
      (1 to rounds)
        .map(pcaRoundSql("w", _, Some((s"v$rounds", "q1")))).mkString +
      pcaSignSql("1", s"v$rounds") + pcaSignSql("2", s"w$rounds") +
      s"""
         |SELECT b.vec_id,
         |  CAST(sum(b.qn[r.range + 1] * a.v * sg1.s) AS BIGINT)
         |    AS pc1_score,
         |  CAST(sum(b.qn[r.range + 1] * w.v * sg2.s) AS BIGINT)
         |    AS pc2_score
         |FROM base b CROSS JOIN range(64) r
         |JOIN v$rounds a ON a.j = r.range
         |JOIN w$rounds w ON w.j = r.range
         |CROSS JOIN sg1 CROSS JOIN sg2
         |GROUP BY 1""".stripMargin

  /** Embedding-population DRIFT panel: PSI (population stability
    * index) between two corpus cohorts over signed log2 buckets of
    * the dominant-component score — the vector-side counterpart of
    * the events drift monitor (has the embedding distribution MOVED
    * since the baseline snapshot?). Cohorts here are the
    * deterministic even/odd vec_id halves standing in for
    * baseline/current (the q_dedup_diff derivation convention); a
    * production caller passes two real snapshots through the same
    * shape. Add-one smoothing over the observed buckets keeps ln
    * finite; counts and buckets are exact integers, the ONE float
    * expression (p - q) * ln(p / q) is identically parenthesized in
    * both engines and rounded at the end — the klBySource float
    * discipline. PSI > 0.2 is the conventional "investigate" line;
    * it is a COLUMN here, not a claim.
    *
    * Scale: re-pays component training (trio convention), then one
    * map-only bucket projection and a ~26-key aggregation —
    * answer-sized everything after the corpus pass.
    */
  /** Sign-fixed dominant-component axis in micro units — the frozen
    * "model" a drift monitor scores against ([[graft.streaming
    * .DocStreams.driftFeed]] trains it once on the baseline snapshot
    * and ships it into the stream as literals).
    */
  private[graft] def pc1SignedMicro(
      e: DataFrame, rounds: Int = 8): Array[Long] = {
    val cm = scatterBig(e)
    val v1 = bigPower(cm, 0L, rounds, None)
    val s = bigSign(v1)
    v1.map(_.toLong * s)
  }

  /** Scala twin of the drift bucket expression in [[embeddingDrift]]:
    * signed log2 octave of the micro-scaled component score —
    * length(bin(m)) == 64 - numberOfLeadingZeros(m) for m >= 1, so the
    * two spellings agree exactly.
    */
  private[graft] def driftBucket(score: Long): Long =
    if (score == 0L) 0L
    else {
      val m = math.abs(score) / 1000000L + 1L
      java.lang.Long.signum(score) *
        (64L - java.lang.Long.numberOfLeadingZeros(m))
    }

  def embeddingDrift(e: DataFrame, rounds: Int = 8): DataFrame = {
    val b = pcaProject(e, rounds).select(
      expr("CASE WHEN pc1_score = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE CAST(sign(pc1_score) AS BIGINT) " +
        "* length(bin(abs(pc1_score) DIV 1000000 + 1)) END").as("bucket"),
      (col("vec_id") % 2 === 0).as("is_base"))
    val counts = b.groupBy("bucket").agg(
      sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
      sum(when(!col("is_base"), 1L).otherwise(0L)).as("n_cur"))
    val tot = counts.agg(sum("n_base").as("nb"), sum("n_cur").as("nc"),
      count(lit(1)).as("nbuckets"))
    val wc = counts
      .crossJoin(broadcast(tot)) // 1-row totals — audited idiom
      .withColumn("p",
        (col("n_base") + 1).cast("double") / (col("nb") + col("nbuckets")))
      .withColumn("q",
        (col("n_cur") + 1).cast("double") / (col("nc") + col("nbuckets")))
      .withColumn("contrib", (col("p") - col("q")) * log(col("p") / col("q")))
    val ts = wc.agg(round(sum("contrib"), 6).as("psi_total"))
    wc.crossJoin(broadcast(ts)) // 1-row panel stat — audited idiom
      .select(col("bucket"), col("n_base"), col("n_cur"),
        round(col("contrib"), 6).as("psi_contrib"), col("psi_total"))
  }

  def embeddingDriftSql(rounds: Int = 8): String =
    pcaHeadSql + pcaSeedSql("v", 0L) +
      (1 to rounds).map(pcaRoundSql("v", _, None)).mkString +
      pcaSignSql("1", s"v$rounds") +
      s""",
         |proj AS (
         |  SELECT b.vec_id,
         |    CAST(sum(b.qn[r.range + 1] * a.v * sg1.s) AS BIGINT)
         |      AS pc1_score
         |  FROM base b CROSS JOIN range(64) r
         |  JOIN v$rounds a ON a.j = r.range
         |  CROSS JOIN sg1
         |  GROUP BY 1),
         |bk AS (
         |  SELECT vec_id,
         |    CASE WHEN pc1_score = 0 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(sign(pc1_score) AS BIGINT)
         |        * length(bin(abs(pc1_score) // 1000000 + 1)) END AS bucket,
         |    vec_id % 2 = 0 AS is_base
         |  FROM proj),
         |cnts AS (
         |  SELECT bucket,
         |    CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_base,
         |    CAST(sum(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_cur
         |  FROM bk GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS nb,
         |    CAST(sum(n_cur) AS BIGINT) AS nc, count(*) AS nbuckets
         |  FROM cnts),
         |wc AS (
         |  SELECT bucket, n_base, n_cur,
         |    (CAST(n_base + 1 AS DOUBLE) / (tot.nb + tot.nbuckets)) AS p,
         |    (CAST(n_cur + 1 AS DOUBLE) / (tot.nc + tot.nbuckets)) AS q
         |  FROM cnts, tot),
         |wc2 AS (SELECT bucket, n_base, n_cur,
         |    (p - q) * ln(p / q) AS contrib FROM wc),
         |ts AS (SELECT round(sum(contrib), 6) AS psi_total FROM wc2)
         |SELECT bucket, n_base, n_cur, round(contrib, 6) AS psi_contrib,
         |  ts.psi_total
         |FROM wc2, ts""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_drift" -> ((s, d) => embeddingDrift(emb(s, d))),
    "q_embed_pca" -> ((s, d) => pcaPower(emb(s, d))),
    "q_embed_pca_project" -> ((s, d) => pcaProject(emb(s, d))),
    "q_embed_scatter" -> ((s, d) => scatterByLabel(emb(s, d))),
    "q_embed_pca2" -> ((s, d) => pcaTop2(emb(s, d))),
    "q_knn_classify" -> ((s, d) =>
      knnClassify(emb(s, d), codebook = Some(cachedCentroidsInt8(s, d)))),
    "q_embed_label_sim" -> ((s, d) => labelCentroidSim(emb(s, d))),
    "q_knn_quality" -> ((s, d) => annQuality(emb(s, d))),
    "q_embed_sim_hist" -> ((s, d) => simHistogram(emb(s, d))),
    "q_knn_brute" -> ((s, d) => bruteForceTopK(emb(s, d))),
    "q_knn_lsh" -> ((s, d) => lshTopKInt8(emb(s, d))),
    "q_knn_ivf" -> ((s, d) =>
      ivfTopKInt8(emb(s, d), codebook = Some(cachedCentroidsInt8(s, d)))),
    "q_knn_search" -> ((s, d) =>
      ivfSearchInt8(emb(s, d),
        emb(s, d).filter(pmod(col("vec_id"), lit(SearchQueryMod)) === 0),
        codebook = Some(cachedCentroidsInt8(s, d)))),
    "q_dedup_semantic" -> ((s, d) => {
      val e = emb(s, d).select("vec_id", "embedding")
      semDedupInt8(
        e.unionByName(e.filter(col("vec_id") % SemPlantMod === 0)
          .select((col("vec_id") + SemPlantOffset).as("vec_id"),
            col("embedding"))),
        codebook = Some(cachedCentroidsInt8(s, d)))
    }),
    "q_embed_quantize" -> ((s, d) => quantizeInt8(emb(s, d))),
    "q_embed_pq" -> ((s, d) => pqEncode(emb(s, d), cachedPqBooks(s, d))),
    "q_knn_pq" -> ((s, d) => pqTopK(emb(s, d), cachedPqBooks(s, d))),
    "q_knn_ivfpq" -> ((s, d) =>
      ivfPqTopK(emb(s, d), cachedCentroidsInt8(s, d),
        cachedIvfPqBooks(s, d))),
    "q_embed_project" -> ((s, d) => jlProjectFlat(emb(s, d))),
    "q_label_centroid" -> ((s, d) => labelCentroidNorm(emb(s, d))))

  /** Every similarity query replays in DuckDB: the int8 paths
    * (q_knn_lsh / q_knn_ivf / q_dedup_semantic) in exact long
    * arithmetic with codebook training recomputed in CTEs; the float
    * paths via order-stable IEEE folds.
    */
  val oracleSql: Map[String, String] = Map(
    "q_embed_pca" -> pcaPowerSql(),
    "q_embed_pca2" -> pcaTop2Sql(),
    "q_embed_pca_project" -> pcaProjectSql(),
    "q_embed_scatter" -> scatterByLabelSql,
    "q_embed_drift" -> embeddingDriftSql(),
    "q_knn_classify" -> knnClassifySql,
    "q_embed_label_sim" -> labelCentroidSimSql,
    "q_knn_quality" -> annQualitySql(),
    "q_embed_sim_hist" ->
      simHistogramSql(EmbedDupPlanes, EmbedDupTables),
    "q_knn_brute" -> bruteForceTopKSql,
    "q_knn_lsh" -> lshTopKInt8Sql(),
    "q_knn_ivf" -> ivfTopKInt8Sql(),
    "q_knn_search" -> ivfSearchInt8Sql(),
    "q_dedup_semantic" -> semDedupInt8Sql(semPlantSql),
    "q_embed_quantize" -> quantizeInt8Sql,
    "q_embed_pq" -> pqEncodeSql(),
    "q_knn_pq" -> pqTopKSql(),
    "q_knn_ivfpq" -> ivfPqTopKSql(),
    "q_embed_project" -> jlProjectFlatSql,
    "q_label_centroid" -> labelCentroidNormSql)
}
