package graft.llm

import graft.core.Barrier.BarrierOps
import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (content hash), canonicalized (token-set hash),
  * n-gram Jaccard (relational set-similarity), MinHash+LSH (scalable
  * near-dup candidates), SimHash (hamming-distance near-dup).
  *
  * Scale design — every default path here is the shape that survives
  * 100 TB; nothing broadcasts the corpus and no candidate generator is
  * quadratic in a low-cardinality bucket:
  *   - exact/canonical dedup are a single hash-partitioned groupBy on a
  *     16-byte key — the canonical 100 TB dedup shape (shuffle is
  *     O(corpus), state per group is O(1));
  *   - exact Jaccard pairs use PREFIX-FILTER candidate generation
  *     (AllPairs/PPJoin): order each doc's distinct tokens by ascending
  *     document frequency, explode only the first |x|-ceil(t*|x|)+1 of
  *     them, and self-join on those prefix tokens. Any pair with
  *     J >= t provably shares its globally-smallest common token inside
  *     both prefixes, so the candidate set is COMPLETE — the verified
  *     output is the exact threshold join, oracle-checkable — while
  *     the join stays token-partitioned and sub-quadratic (rare tokens
  *     first means prefix buckets are small);
  *   - MinHash+LSH: signatures come from a single-pass codegen kernel
  *     inside the scan stage (map-only — no shuffle until candidate
  *     generation); candidates are a self-join on (band, band-hash)
  *     buckets only — the classic sub-quadratic near-dup path;
  *   - SimHash reduces each doc to one long in the same map-only way;
  *     the default pair path bands the fingerprint (pigeonhole: any
  *     pair with hamming < nBands agrees on a band) — guaranteed
  *     recall with bucketed sub-quadratic search;
  *   - prefix/truncation dups are found by RANGE-SORTING the corpus:
  *     in lexicographic order every string's extensions form a
  *     contiguous run, so one sorted scan with a stack yields each
  *     string's longest in-corpus proper prefix (its "parent"), and
  *     pointer-jumping closes the chain — O(n log n), no broadcast.
  *
  * MinHash/SimHash/LSH use deterministic seeded hash mixes (xxhash64 +
  * affine permutations mod a Mersenne-ish prime / seeded hyperplanes),
  * so results are stable across runs/partitionings — but not
  * expressible in ANSI SQL, hence no DuckDB oracle for those (rows-only
  * check); their correctness is asserted in ScalaTest against
  * brute-force ground truth.
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

  /** Normalization-robust exact dedup: group on the hash of the
    * NFC-normalized, case-folded text ([[graft.functions.NfcLower]],
    * a codegen'd kernel with an ASCII fast path) — catches the
    * case-variant and combining-character copies that byte-exact
    * [[exact]] misses. `n_raw_variants` counts how many DISTINCT raw
    * byte forms collapsed into each group, i.e. the copies only
    * normalization finds. Same one-shuffle 16-byte-key groupBy shape
    * as exact dedup. DuckDB mirror: nfc_normalize + lower (exact
    * equivalence on NFC+simple-case scripts; locale-sensitive case
    * pairs like dotted-I would need ICU on both sides).
    */
  def nfcDedup(d: DataFrame): DataFrame =
    d.groupBy(md5(graft.functions.text.nfc_lower(col("text"))
        .cast("binary")).as("norm_hash"))
      .agg(
        min("doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(md5(col("text").cast("binary")))
          .as("n_raw_variants"))

  val nfcDedupSql: String =
    """SELECT md5(nfc_normalize(lower(text))) AS norm_hash,
      |  min(doc_id) AS keep_id,
      |  count(*) AS n_copies,
      |  count(DISTINCT md5(text)) AS n_raw_variants
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
      |  -- coalesce: array_to_string([]) is NULL in DuckDB where
      |  -- Spark's concat_ws is '' — a tokenless doc must hash md5('')
      |  md5(coalesce(array_to_string(list_sort(list_distinct(
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> ''))),
      |    ' '), '')) AS canon_hash,
      |  min(doc_id) AS keep_id, count(*) AS n_copies,
      |  array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS members
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------- jaccard

  /** The prefix-filter threshold join in its CARRY-THROUGH form (the
    * published MapReduce set-similarity join shape), shared by the
    * token, shingle, and edit-verified pair operators.
    *
    * Pipeline:
    *   1. tokenize once per doc (single-pass kernel), explode, count
    *      document frequency per token (vocabulary-sized aggregate);
    *   2. assign every token its GLOBAL DENSE RANK in (df asc, tok asc)
    *      order — computed scalably by range-partition + in-partition
    *      sort + zipWithIndex (no single-partition window), so it holds
    *      for shingle "vocabularies" that are corpus-sized;
    *   3. re-express every doc as its sorted rank array (a bijection,
    *      so Jaccard over ranks == Jaccard over tokens), take the
    *      prefix = lowest |x|-ceil(t*|x|)+1 ranks (rank order IS
    *      rarest-first order, the AllPairs candidate-shrinking
    *      heuristic), and explode it;
    *   4. ONE self-join on prefix rank. Rank arrays ride through the
    *      join, so the pair is length-filtered, deduplicated, AND
    *      scored inside the join stage: the `sorted_first_common`
    *      condition keeps exactly the row whose join key is the
    *      smallest shared prefix rank — each pair emitted ONCE, no
    *      distinct(), no re-fetch joins, nothing shuffled after the
    *      join but the final pairs;
    *   5. adaptive HOT-KEY SALTING: a rank in `n` prefixes puts n^2
    *      key-equal pairs in one task, and AQE's skew split cannot see
    *      it (it measures input bytes, and these inputs are tiny while
    *      the join output explodes). Ranks above `saltTarget` members
    *      split into ceil(n/saltTarget) deterministic sub-buckets —
    *      probe side picks one by doc-id hash, build side replicates
    *      across all — so per-task pair count is ~n*saltTarget and
    *      replication is bounded by multiset/saltTarget (measured 2.1x
    *      on the degenerate-vocabulary bench corpus; a no-op when no
    *      rank is hot).
    *
    * Completeness: J(x,y) >= t implies overlap o >= t*max(|x|,|y|), so
    * o >= ceil(t*|x|) and the smallest common rank cannot sit outside
    * x's first |x|-ceil(t*|x|)+1 ranks (all o common ranks would have
    * to fit in the ceil(t*|x|)-1 suffix) — symmetrically for y, so the
    * smallest common rank lies in BOTH prefixes and the join finds it.
    */
  /** Positional filter (PPJoin): GIVEN the matched rank is the first
    * common element, every other common element sits after position
    * ppos on both sides, so overlap <= 1 + min(suffix lengths); J >= t
    * needs overlap >= t/(1+t)*(|a|+|b|). A necessary condition
    * evaluated in a few flops — kills below-threshold pairs before the
    * O(n+m) scoring merge.
    *
    * Numerics: compared in the rearranged form o*(1+t) >= t*(sa+sb)
    * (one rounding per side, no division) with a RELATIVE 1e-12 slack
    * on the right. An absolute slack does not scale — at sa+sb ~ 1e7+
    * elements double rounding of t/(1+t)*(sa+sb) can exceed any fixed
    * epsilon and drop a boundary-exact pair. The relative slack is
    * ~1e4x the worst-case rounding (a few ulps, ~4e-16 relative) yet
    * admits only borderline candidates, which the exact sorted_jaccard
    * conjunct after this filter then scores — correctness never
    * depends on the slack being tight.
    */
  private[graft] def positionalFilter(
      szA: Column, pposA: Column, szB: Column, pposB: Column,
      threshold: Double): Column =
    (lit(1) + least(szA - pposA - 1, szB - pposB - 1)).cast("double") *
      lit(1.0 + threshold) >=
      lit(threshold) * (szA + szB).cast("double") * lit(1.0 - 1e-12)

  private def prefixRankJoin(
      d: DataFrame, tokens: Column, threshold: Double, scoreName: String,
      payload: Option[(String, Column)] = None,
      saltTarget: Int = 512): DataFrame = {
    require(saltTarget != 0, s"saltTarget must be nonzero (negative disables)")
    import graft.functions.vector.{sorted_first_common, sorted_jaccard}
    val spark = d.sparkSession
    import spark.implicits._
    // CORRECTNESS GUARD: `ranked` below assigns ranks with
    // monotonically_increasing_id over a SAMPLED range exchange — the
    // assignment is injective and order-consistent but NOT
    // deterministic across re-computations (range boundaries sample
    // with an RDD-id-derived seed, so a second instantiation draws
    // different boundaries and different rank values). The rank
    // subtree is instantiated under BOTH sides of the pair self-join
    // (and under the hot-rank aggregate), so completeness relies on
    // exchange/stage reuse executing it ONCE and sharing the result.
    // Reuse is on by default and PlanSpec pins the single
    // materialization on the executed plan; fail loudly if a
    // deployment turns the conf off rather than silently missing
    // duplicate pairs.
    require(spark.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "prefixRankJoin requires spark.sql.exchange.reuse=true: rank " +
        "assignment is nondeterministic and must compute once (reused) " +
        "for the two sides of the pair join to agree")
    val base = graft.core.Layout.spread(d, "doc_id").select(
      Seq(col("doc_id"), tokens.as("toks")) ++
        payload.map { case (n, c) => c.as(n) }: _*)
    // explode_outer, NOT explode: explode makes Catalyst infer
    // `size(toks) > 0 AND isnotnull(toks)` and push it below the spread
    // exchange, where `toks` substitutes back to the tokenizer kernel —
    // the kernel then runs an extra time per row INSIDE the single
    // scan task (measured in the r18 plan audit: Filter(2) carried
    // hashed_sorted_tokens below the Exchange). With the outer variant
    // nothing is inferred; empty docs emit one null `tok` row that the
    // cheap isnotnull filter (on the generated column, after the
    // exchange) drops — the same row set, one kernel evaluation.
    val ex = base
      .select(col("doc_id"), explode_outer(col("toks")).as("tok"))
      .filter(col("tok").isNotNull)
    val dfreq = ex.groupBy("tok").agg(count(lit(1)).as("df"))
    // Global token rank = any INJECTIVE long encoding consistent with
    // the (df, tok) total order — candidate completeness needs only a
    // shared order (rare-first minimizes candidates), and rank VALUES
    // never reach the output. monotonically_increasing_id over a
    // range-partitioned, partition-sorted frame is exactly that
    // (partition id rides the high bits, so ids are monotone across
    // the range boundaries; AQE coalescing merges ADJACENT ranges and
    // preserves the order). Replaces the r1-r17 RDD zipWithIndex
    // bridge, which cost an extra full count pass, broke codegen
    // (SerializeFromObject), and — worse — gave the rank table
    // LogicalRDD's unknown stats, making the planner broadcast the
    // FAT EXPLODED CORPUS side of the rank join instead of the rank
    // table (r18 plan audit, BroadcastExchange(6) over the exploded
    // tokens). As a plain derived frame its stats are estimable: the
    // planner broadcasts it while the vocabulary is small and falls
    // back to a shuffle join when it is not — the per-scale choice.
    val ranked = dfreq
      .repartitionByRange(col("df"), col("tok"))
      .sortWithinPartitions("df", "tok")
      .select(col("tok"), monotonically_increasing_id().as("rank"))
    val ranksPerDoc = ex.join(ranked, "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("rank"))).as("ranks"))
    val docs = payload
      .map { case (n, _) => ranksPerDoc.join(base.select(col("doc_id"), col(n)),
        "doc_id") }
      .getOrElse(ranksPerDoc)
      .withColumn("sz", size(col("ranks")))
      .withColumn("pref", slice(col("ranks"), lit(1),
        (col("sz") - ceil(col("sz") * lit(threshold)) + lit(1)).cast("int")))
    val sideCols = Seq(col("doc_id"), col("ranks"), col("sz"), col("pref")) ++
      payload.map { case (n, _) => col(n) }
    val exploded = docs.select(
      sideCols :+ posexplode(col("pref")).as(Seq("ppos", "prank")): _*)
    // Adaptive HOT-KEY SALTING: the join's parallelism is capped by
    // prefix-rank cardinality, and a rank shared by n docs contributes
    // n^2 key-equal pairs to ONE task. AQE's skew split cannot help —
    // it detects byte-skew of join INPUTS, and these inputs are tiny
    // while the join OUTPUT explodes. So ranks whose prefix membership
    // exceeds `saltTarget` are split deterministically: the probe side
    // picks pmod(xxhash64(doc_id), nsalt), the build side replicates
    // its rows across all nsalt sub-buckets — every pair still meets
    // exactly once, per-task pair count drops to ~n*saltTarget, and
    // replication volume is bounded by multiset/saltTarget. The hot
    // set is a reduction (ranks above threshold), broadcast-safe by
    // construction. Cold ranks pay nothing (nsalt = 1).
    val (probeSide, buildSide) =
      if (saltTarget < 0) {
        // disabled (e.g. a caller that knows its element domain is
        // near-unique — shingles — and would only pay the hot
        // aggregate + replication plumbing for nothing)
        val p = exploded.withColumn("salt", lit(0))
        (p, p)
      } else {
        val hot = exploded.groupBy("prank")
          .agg(count(lit(1)).as("pn"))
          .filter(col("pn") > saltTarget)
          .select(col("prank"),
            // cap: the build side materializes a sequence(0, nsalt-1)
            // array per row before exploding — an uncapped nsalt on a
            // pathologically hot rank would allocate megabytes per row.
            // The cap only coarsens the split, never changes results.
            least(ceil(col("pn").cast("double") / saltTarget), lit(65536))
              .cast("int").as("nsalt"))
        val salted = exploded.join(broadcast(hot), Seq("prank"), "left")
          .withColumn("nsalt", coalesce(col("nsalt"), lit(1)))
        (salted.withColumn("salt",
          pmod(xxhash64(col("doc_id")), col("nsalt")).cast("int")),
          salted.withColumn("salt",
            explode(sequence(lit(0), col("nsalt") - 1))))
      }
    // Condition order is deliberate — Spark evaluates the non-equi
    // conjuncts left to right per key-equal pair, and the pair MULTISET
    // (one evaluation per shared prefix rank) is ~10x the pair count:
    // cheap prunes first (id order, lengths), then the early-exit
    // emit-once merge, and the O(n+m) scoring kernel LAST so it runs
    // once per pair, not once per shared rank. The threshold lives in
    // the join condition rather than a filter() above it precisely to
    // control this order (a pushed-down filter lands leftmost).
    //
    // hint("merge"): the exploded inputs can look broadcast-small while
    // the join's true cost is the key-equal multiset; AQE's
    // size-triggered broadcast conversion is a measured ~6x regression
    // on hot keys (probe rows walk long hash chains), so pin the
    // sort-merge strategy — on big corpora the inputs exceed the
    // broadcast threshold and SMJ is what AQE would pick anyway.
    //
    // Explicit repartition-by-NUM on the join keys: AQE coalesces
    // shuffle partitions by INPUT bytes, but this join's cost is its
    // key-equal OUTPUT multiset — the same blindness that motivates
    // the salting above. At sf0.1 the coalesce collapsed the scoring
    // merge to 4 tasks of ~600 ms on a 32-core box (r18 JobProf);
    // a REPARTITION_BY_NUM exchange is exempt from coalescing and the
    // join reuses it directly (same keys, same count, both sides), so
    // the merge runs at the session's configured shuffle parallelism —
    // the deployment-scaled knob, not a local constant. The salt
    // bounds per-task pair counts; this spreads the bounded tasks.
    val joinPar = graft.core.Layout.shufflePartitions(spark)
    probeSide.repartition(joinPar, col("prank"), col("salt")).as("a")
      .join(buildSide.repartition(joinPar, col("prank"), col("salt"))
          .as("b").hint("merge"),
        col("a.prank") === col("b.prank") &&
          col("a.salt") === col("b.salt") &&
          col("a.doc_id") < col("b.doc_id") &&
          // length filter: J >= t forces set sizes within factor t —
          // necessary, so pruning cannot drop a qualifying pair
          col("a.sz") >= lit(threshold) * col("b.sz") &&
          col("b.sz") >= lit(threshold) * col("a.sz") &&
          // emit-once: only the smallest shared prefix rank produces
          // the pair
          col("a.prank") === sorted_first_common(col("a.pref"), col("b.pref")) &&
          positionalFilter(col("a.sz"), col("a.ppos"),
            col("b.sz"), col("b.ppos"), threshold) &&
          // RAW comparison: the candidate filters above are complete
          // for exact J >= t, and the raw IEEE division is identical
          // in Spark and DuckDB — comparing the ROUNDED score instead
          // would diverge at exact-half boundaries (Spark rounds
          // decimal HALF_UP, DuckDB rounds the binary double) and
          // admit pairs the length filter already pruned. The score
          // COLUMN stays rounded for display.
          sorted_jaccard(col("a.ranks"), col("b.ranks")) >= lit(threshold))
      .select(
        Seq(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          round(sorted_jaccard(col("a.ranks"), col("b.ranks")), 6)
            .as(scoreName)) ++
          payload.toSeq.flatMap { case (n, _) =>
            Seq(col(s"a.$n").as(s"${n}_a"), col(s"b.$n").as(s"${n}_b")) }: _*)
  }

  /** Exact token-set Jaccard pairs over the WHOLE corpus — the
    * [[prefixRankJoin]] threshold join over whitespace-token sets
    * (hashed by the single-pass HashedSortedTokens kernel).
    */
  def jaccardPairs(
      d: DataFrame, threshold: Double = 0.5,
      saltTarget: Int = 128): DataFrame = {
    import graft.functions.text.hashed_sorted_tokens
    prefixRankJoin(d, hashed_sorted_tokens(col("text")), threshold, "jaccard",
      saltTarget = saltTarget)
  }

  val jaccardPairsSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(
      |      regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')) AS toks
      |  FROM documents)
      |SELECT doc_a, doc_b, round(raw, 6) AS jaccard FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      |      AS raw
      |  FROM t a JOIN t b
      |    ON a.doc_id < b.doc_id)
      |WHERE raw >= 0.5""".stripMargin

  /** EXACT shingle (word n-gram) Jaccard pairs: the order-sensitive
    * sibling of [[jaccardPairs]] — two docs with the same vocabulary in
    * different order share tokens but few 3-gram shingles, so this
    * catches rewording that token-set Jaccard cannot. Same discipline:
    * one single-pass shingle-hash kernel per doc, prefix-filter
    * candidates (shingles are near-unique, so prefix buckets are tiny
    * even at the low 0.2 threshold), one SortedJaccard merge per
    * surviving pair. This is also exactly the similarity the MinHash
    * signature ([[minhashSignatures]]) estimates, so it doubles as the
    * ground-truth side of that estimate.
    */
  def jaccardShinglePairs(
      d: DataFrame, n: Int = 3, threshold: Double = 0.2,
      saltTarget: Int = -1): DataFrame = {
    // salting defaults OFF here: n-gram shingles are a near-unique
    // domain (df mostly 1-2), so hot prefix ranks are rare and the hot
    // aggregate would scan the large exploded-prefix side for nothing;
    // a templated/boilerplate-heavy corpus can switch it on
    import graft.functions.text.hashed_sorted_shingles
    prefixRankJoin(d, hashed_sorted_shingles(col("text"), n), threshold,
      "sh_jaccard", saltTarget = saltTarget)
  }

  val jaccardShinglePairsSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')
      |      AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |        i -> array_to_string(toks[i:i + 2], ' ')))
      |    ELSE [coalesce(array_to_string(toks, ' '), '')] END AS sset
      |  FROM t)
      |SELECT doc_a, doc_b, round(raw, 6) AS sh_jaccard FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
      |      (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))
      |      AS raw
      |  FROM sh a JOIN sh b
      |    ON a.doc_id < b.doc_id)
      |WHERE raw >= 0.2""".stripMargin

  /** ASYMMETRIC containment pairs — the near-dup class a symmetric
    * Jaccard structurally misses: a small document (almost) wholly
    * INCLUDED in a big one (a quoted post inside a thread, an abstract
    * inside its paper, a README inside a bundle). For |A| ≪ |B|,
    * J = |A∩B|/|A∪B| stays tiny however complete the inclusion, so
    * [[jaccardShinglePairs]]'s symmetric length filter prunes exactly
    * the interesting pairs; containment C = |A∩B|/|A| is the right
    * score and needs its OWN join geometry. The set domain is 3-gram
    * SHINGLES, deliberately: inclusion of a passage preserves word
    * order, so shingle containment is the faithful signal — and the
    * shingle domain is near-unique (df mostly 1-2), which keeps the
    * full posting index this join must build sparse. (The token-set
    * variant was measured, not assumed, off: on a bag-of-words-
    * saturated corpus every posting is hot and the candidate multiset
    * is quadratic — 67k pairs / ~35 s at sf0.01 — while shingles stay
    * pair-bounded.) Emits the canonical (small, big) pair with both
    * scores so a curator sees what Jaccard would have said. The
    * threshold compare is integer-exact (1000·i ≥ t·|A| — no float
    * boundary), as are both output permilles (DIV).
    *
    * Scale: probe side explodes only each doc's rare-first CONTAINMENT
    * prefix (|A| − ⌈t·|A|⌉ + 1 rarest ranks — if A∩B misses the whole
    * prefix, the ≤ ⌈t·|A|⌉−1 suffix elements cannot reach the
    * threshold, so recall is exact); the index side is the full
    * inverted posting list (corpus-shingle-sized, the honest
    * containment cost — any B element can be the match point, the
    * [[graft.llm.TextOps]] inverted-index shape). Per-rank pair volume
    * is (probe occurrences)×(posting length); rare-first prefixes keep
    * probe occurrences of common shingles rare, and ranks whose
    * POSTING exceeds `saltTarget` are salted adaptively — the posting
    * side picks pmod(xxhash64(doc_id), nsalt), the (small) probe side
    * replicates across sub-buckets, mirroring [[prefixRankJoin]]'s
    * device with the roles swapped because here the build side is the
    * fat one. Verification is one O(|A|+|B|) codegen'd
    * SortedIntersectCount merge per emitted-once candidate.
    */
  def containmentPairs(
      d: DataFrame, thresholdPermille: Int = 900,
      saltTarget: Int = 4096): DataFrame = {
    import graft.functions.text.hashed_sorted_shingles
    import graft.functions.vector.{sorted_first_common, sorted_intersect_count}
    val spark = d.sparkSession
    import spark.implicits._
    val t = thresholdPermille
    val base = graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"),
        hashed_sorted_shingles(col("text"), 3).as("toks"))
    val ex = base.select(col("doc_id"), explode(col("toks")).as("tok"))
    val dfreq = ex.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = dfreq
      .repartitionByRange(col("df"), col("tok"))
      .sortWithinPartitions("df", "tok")
      .select("tok").rdd
      .zipWithIndex()
      .map { case (r, i) => (r.getLong(0), i) }
      .toDF("tok", "rank")
    val docs = ex.join(ranked, "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("rank"))).as("ranks"))
      .withColumn("sz", size(col("ranks")).cast("long"))
      .filter(col("sz") > 0)
      // ceil(t·sz/1000) spelled integer so both engines agree exactly
      .withColumn("pref", slice(col("ranks"), lit(1),
        (col("sz") - expr(s"($t * sz + 999) DIV 1000") + lit(1)).cast("int")))
    val probe0 = docs.select(col("doc_id"), col("ranks"), col("sz"),
      col("pref"), explode(col("pref")).as("prank"))
    val index0 = docs.select(col("doc_id"), col("ranks"), col("sz"),
      explode(col("ranks")).as("prank"))
    val hot = index0.groupBy("prank").agg(count(lit(1)).as("pn"))
      .filter(col("pn") > saltTarget)
      .select(col("prank"),
        least(ceil(col("pn").cast("double") / saltTarget), lit(65536))
          .cast("int").as("nsalt"))
    val probe = probe0.join(broadcast(hot), Seq("prank"), "left")
      .withColumn("nsalt", coalesce(col("nsalt"), lit(1)))
      .withColumn("salt", explode(sequence(lit(0), col("nsalt") - 1)))
    val index = index0.join(broadcast(hot), Seq("prank"), "left")
      .withColumn("nsalt", coalesce(col("nsalt"), lit(1)))
      .withColumn("salt", pmod(xxhash64(col("doc_id")), col("nsalt")).cast("int"))
    probe.as("a")
      .join(index.as("b").hint("merge"),
        col("a.prank") === col("b.prank") &&
          col("a.salt") === col("b.salt") &&
          // canonical: small strictly before big, doc order on ties
          (col("a.sz") < col("b.sz") ||
            (col("a.sz") === col("b.sz") &&
              col("a.doc_id") < col("b.doc_id"))) &&
          // emit-once: only A's first rank shared with B's FULL set
          col("a.prank") ===
            sorted_first_common(col("a.pref"), col("b.ranks")) &&
          // exact integer threshold — the O(n+m) kernel runs LAST
          lit(1000) * sorted_intersect_count(col("a.ranks"), col("b.ranks"))
            >= lit(t.toLong) * col("a.sz"))
      .select(col("a.doc_id").as("doc_small"), col("b.doc_id").as("doc_big"),
        col("a.sz").as("sz_small"), col("b.sz").as("sz_big"),
        sorted_intersect_count(col("a.ranks"), col("b.ranks")).as("i"))
      .select(col("doc_small"), col("doc_big"), col("sz_small"),
        col("sz_big"),
        expr("1000 * i DIV sz_small").as("cont_permille"),
        expr("1000 * i DIV (sz_small + sz_big - i)").as("jacc_permille"))
  }

  val containmentPairsSql: String =
    """WITH t0 AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')
      |      AS w
      |  FROM documents),
      |t AS (
      |  SELECT doc_id,
      |    CASE WHEN len(w) >= 3 THEN
      |      list_distinct(list_transform(generate_series(1, len(w) - 2),
      |        i -> array_to_string(w[i:i + 2], ' ')))
      |    ELSE [coalesce(array_to_string(w, ' '), '')] END AS toks
      |  FROM t0),
      |p AS (
      |  SELECT a.doc_id AS doc_small, b.doc_id AS doc_big,
      |    len(a.toks) AS sz_small, len(b.toks) AS sz_big,
      |    len(list_intersect(a.toks, b.toks)) AS i
      |  FROM t a JOIN t b
      |    ON (len(a.toks) < len(b.toks) OR
      |        (len(a.toks) = len(b.toks) AND a.doc_id < b.doc_id))
      |  WHERE len(a.toks) > 0)
      |SELECT doc_small, doc_big,
      |  CAST(sz_small AS BIGINT) AS sz_small,
      |  CAST(sz_big AS BIGINT) AS sz_big,
      |  CAST(1000 * i // sz_small AS BIGINT) AS cont_permille,
      |  CAST(1000 * i // (sz_small + sz_big - i) AS BIGINT) AS jacc_permille
      |FROM p WHERE 1000 * i >= 900 * sz_small""".stripMargin

  /** LSH configuration quality panel: precision/recall of the MinHash
    * banded candidate set against EXACT shingle-Jaccard ground truth
    * at the same 0.5 threshold — the diagnostic a curator reads before
    * trusting an LSH config on a new corpus (band/row geometry that
    * worked on web text can silently lose recall on code or template-
    * heavy data). Both sides filter on the ROUNDED score columns so
    * the two engines agree at the threshold boundary. One answer row:
    * candidate / truth / hit counts + scaled-integer precision and
    * recall.
    *
    * Scale: composes two already-bucketed pair generators (banded
    * minhash join, prefix-rank shingle join) plus a co-partitioned
    * pair-key join and three 1-row aggregates — nothing new shuffles
    * beyond what the two generators already pay.
    */
  def lshQuality(d: DataFrame): DataFrame = {
    val cand = minhashPairsExact(d).select("doc_a", "doc_b")
    val truth = jaccardShinglePairs(d)
      .filter(col("sh_jaccard") >= 0.5).select("doc_a", "doc_b")
    val hit = cand.join(truth, Seq("doc_a", "doc_b"))
    cand.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
      .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
      .select(col("n_candidates"), col("n_truth"), col("n_hit"),
        expr("n_hit * 10000 DIV nullif(n_candidates, 0)")
          .as("precision_x10000"),
        expr("n_hit * 10000 DIV nullif(n_truth, 0)").as("recall_x10000"))
  }

  // lazy: composes minhashPairsExactSql, declared later in this object
  lazy val lshQualitySql: String =
    s"""WITH cand AS (
       |  SELECT doc_a, doc_b FROM ($minhashPairsExactSql)),
       |truth AS (
       |  SELECT doc_a, doc_b FROM ($jaccardShinglePairsSql)
       |  WHERE sh_jaccard >= 0.5),
       |hit AS (
       |  SELECT c.doc_a FROM cand c
       |  JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b),
       |nc AS (SELECT count(*) AS n_candidates FROM cand),
       |nt AS (SELECT count(*) AS n_truth FROM truth),
       |nh AS (SELECT count(*) AS n_hit FROM hit)
       |SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
       |  CAST(n_truth AS BIGINT) AS n_truth,
       |  CAST(n_hit AS BIGINT) AS n_hit,
       |  CAST(n_hit * 10000 // nullif(n_candidates, 0) AS BIGINT)
       |    AS precision_x10000,
       |  CAST(n_hit * 10000 // nullif(n_truth, 0) AS BIGINT)
       |    AS recall_x10000
       |FROM nc, nt, nh""".stripMargin

  /** Containment (truncation) duplicates: document A is a strict PREFIX
    * of document B — the scraped-data case where one copy was cut off.
    *
    * Sort-based scale path (no broadcast of the corpus, no quadratic
    * bucket): range-partition + sort the DISTINCT texts. In
    * lexicographic order the extensions of any string form a CONTIGUOUS
    * run (if a <= x <= b and a is a prefix of b, a is a prefix of x),
    * so a single sorted scan with a stack finds each text's LONGEST
    * in-corpus proper prefix — its "parent"; a text's full ancestor set
    * is exactly its parent chain, closed by iterative doubling
    * (O(log depth) self-joins). Cross-partition chains are repaired via
    * the partition-first elements: any ancestor of any text in
    * partition p that lives in an earlier partition must be a prefix of
    * p's first text (same contiguity lemma), and those candidates —
    * at most numPartitions x chain-depth strings — are the ONLY thing
    * this operator ever broadcasts.
    */
  def prefixDups(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    // Equal texts are never prefix dups of each other (strict length),
    // so the scan runs over distinct texts; doc ids (all of them, for
    // duplicated texts) re-attach by hash join at the end.
    val texts = d.select(col("text")).distinct()
    val sorted = texts
      .repartitionByRange(col("text"))
      .sortWithinPartitions("text")
      .as[String]
      // materialized once: the boundary pass and the stack pass below
      // must see the SAME partitioning and order
      .barrier()
    val firsts: Array[String] = sorted.mapPartitions(_.take(1)).collect()
    // Stack scan: pop while the top is not a prefix of the current
    // text (a popped string can never be a prefix of anything later —
    // contiguity lemma), then the top is the longest in-partition
    // proper prefix. An empty stack means any parent lives in an
    // earlier partition -> repair below.
    val scanned = sorted.mapPartitions { it =>
      val stack = scala.collection.mutable.ArrayBuffer.empty[String]
      it.map { s =>
        while (stack.nonEmpty && !s.startsWith(stack.last))
          stack.remove(stack.length - 1)
        val parent = if (stack.isEmpty) null else stack.last
        stack += s
        (s, parent)
      }
    }.toDF("text", "parent")
    // Cross-partition repair: candidate ancestors are corpus texts that
    // are proper prefixes of some partition-first element — a tiny,
    // provably sufficient set (see scaladoc). For an unresolved text
    // the longest candidate prefix is its true parent.
    val firstsDf = firsts.toSeq.toDF("f")
    val cands = texts.join(broadcast(firstsDf),
        col("f").startsWith(col("text")) && col("f") =!= col("text"))
      .select(col("text").as("ctext")).distinct()
    val repaired = scanned.filter(col("parent").isNull)
      .join(broadcast(cands),
        col("text").startsWith(col("ctext")) && col("ctext") =!= col("text"))
      .groupBy("text")
      .agg(max_by(col("ctext"), length(col("ctext"))).as("parent"))
    // Ancestor closure over the parent forest by iterative doubling:
    // ancestors of x = parent chain of x, reach doubles per round.
    var anc = scanned.filter(col("parent").isNotNull)
      .unionAll(repaired)
      .barrier()
    var n = anc.count()
    var grown = true
    var rounds = 0
    while (grown && rounds < 30) {
      val next = anc.as("x")
        .join(anc.as("y"), col("x.parent") === col("y.text"))
        .select(col("x.text").as("text"), col("y.parent").as("parent"))
        .unionAll(anc)
        .distinct()
        .barrier()
      val m = next.count()
      grown = m > n
      anc = next
      n = m
      rounds += 1
    }
    // reach is 2^rounds; exhausting the cap while still growing means a
    // >2^30-deep prefix chain — fail loudly rather than emit a partial
    // ancestor set (same contract as dupClusters)
    if (grown) throw new IllegalStateException(
      "prefixDups: ancestor closure did not converge within 30 doubling " +
        "rounds (prefix chain deeper than 2^30?)")
    val ids = d.select(col("text"), col("doc_id"),
      length(col("text")).cast("bigint").as("len"))
    anc.select(col("parent").as("anc_text"), col("text").as("desc_text"))
      .join(ids.select(col("text").as("anc_text"), col("doc_id").as("short_id"),
        col("len").as("short_len")), "anc_text")
      .join(ids.select(col("text").as("desc_text"), col("doc_id").as("long_id"),
        col("len").as("long_len")), "desc_text")
      .select(col("short_id"), col("long_id"), col("short_len"), col("long_len"))
  }

  val prefixDupsSql: String =
    """SELECT a.doc_id AS short_id, b.doc_id AS long_id,
      |  CAST(length(a.text) AS BIGINT) AS short_len,
      |  CAST(length(b.text) AS BIGINT) AS long_len
      |FROM documents a JOIN documents b
      |  ON length(a.text) < length(b.text)
      |  AND starts_with(b.text, a.text)""".stripMargin

  /** Near-dup CLUSTERS: connected components over the Jaccard pair
    * graph, by iterative min-label propagation (each vertex repeatedly
    * takes the min of its own and its neighbors' labels until
    * fixpoint) — the standard Spark spelling of what SQL engines write
    * as a recursive CTE (the DuckDB oracle is exactly that), since
    * Catalyst has no recursion operator. Every doc gets a cluster id;
    * docs outside the graph are their own singleton cluster.
    *
    * Scale shape: edges come from the prefix-filter threshold join
    * (complete, sub-quadratic) and materialize once; each round is one
    * join + one aggregate on them; rounds needed = component diameter,
    * which for near-dup graphs is small (dups of a page are mutually
    * similar). Deterministic: min-labels only.
    *
    * `broadcastLabels`: with true (default) the label table rides each
    * round's joins as a broadcast — right while |V| (distinct docs IN
    * the pair graph, typically a small fraction of the corpus) fits an
    * executor. At a scale where it doesn't, pass false: every join
    * becomes a shuffle join co-partitioned on the join key (edges are
    * pre-partitioned by dst once, outside the loop, so the big edge
    * side does not re-shuffle every round) — the Pregel shape. Both
    * paths compute identical labels (LlmSpec asserts equality).
    */
  // Cluster labels are a deterministic ARTIFACT of (corpus, threshold)
  // — memoize the final label table per session like the IVF codebook:
  // q_dedup_survivors composes on q_dedup_clusters and would otherwise
  // re-pay the candidate join + propagation rounds for an identical
  // result in the same session. Keyed by the input's canonicalized
  // logical plan (semanticHash), so any semantically different corpus
  // misses; the cached table is localCheckpoint-materialized, which
  // lives exactly as long as the owning context — the same lifetime
  // SessionCache evicts on.
  private val labelCache =
    new graft.core.SessionCache[(Int, Double, Boolean, Int, String), DataFrame]

  def dupClusters(
      d: DataFrame, threshold: Double = 0.9, maxIters: Int = 20,
      broadcastLabels: Boolean = true): DataFrame = {
    // spark.graft.memoize=false bypasses the memo entirely — Bench sets
    // it so per-query timings measure the operator, not a cache hit
    // (min-of-N sampling would otherwise report the rerun).
    if (!d.sparkSession.conf.get("spark.graft.memoize", "true").toBoolean)
      return dupClustersUncached(d, threshold, maxIters, broadcastLabels)
    // shuffle.partitions is part of the key so partition-invariance
    // testing (same corpus under different settings) still recomputes —
    // results are invariant, but that must stay OBSERVED, not cached
    val key = (d.queryExecution.analyzed.canonicalized.semanticHash(),
      threshold, broadcastLabels, maxIters,
      d.sparkSession.conf.get("spark.sql.shuffle.partitions", "default"))
    labelCache.getOrElseUpdate(d.sparkSession, key)(
      dupClustersUncached(d, threshold, maxIters, broadcastLabels))
  }

  private def dupClustersUncached(
      d: DataFrame, threshold: Double, maxIters: Int,
      broadcastLabels: Boolean): DataFrame = {
    // Materialize the pair list BEFORE building symmetric edges: the
    // union below references `pairs` twice, and without this truncation
    // both union branches re-run the whole prefix-rank threshold join
    // (measured: the edges checkpoint cost 2x a single pairs pass —
    // 4.7 s vs 2.3 s warm at sf0.1). The pair list itself is tiny
    // (answer-sized), so checkpointing it costs nothing.
    // scratch, not a durable barrier: the pair list is read exactly
    // once (both branches of the union below) while cached; in
    // reliable mode a checkpoint-file write for it would be pure
    // volume (the durable anchor of the loop is `edges` below)
    val pairs = graft.core.Barrier.scratch(
      jaccardPairs(d, threshold).select("doc_a", "doc_b"))
    // localCheckpoint (eager) rather than cache: each round's plan must
    // START from materialized data, or lineage compounds and round N
    // re-derives rounds 1..N-1 (measured: per-round wall time DOUBLES
    // without the truncation).
    val edgesRaw = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // partition edges by the per-round hot key ONCE; localCheckpoint
    // preserves the partitioning (LogicalRDD carries it). Shuffle
    // path: by dst, the shuffle-join key, so each round only shuffles
    // the |V|-sized label table. Broadcast path: by src — the
    // broadcast join preserves the streamed side's partitioning, so
    // the per-round groupBy(src) aggregate finds its distribution
    // already satisfied and the |E|-row exchange per round disappears.
    // Layout.spread (explicit width, r18): a bare repartition(col) is
    // AQE-coalescible, so the per-round loop below inherited a 1-2
    // partition edge snapshot at bench scale
    val edges = (if (broadcastLabels)
      graft.core.Layout.spread(edgesRaw, "src")
      else graft.core.Layout.spread(edgesRaw, "dst")).barrier()
    // edges is materialized (eager barrier): the pair list is dead
    graft.core.Barrier.freeScratch(pairs)
    // shared min-label loop (round 14: extracted to GraphOps so the
    // convergence/checkpointing subtleties live once, serving this and
    // EntityOps.goldenRecords identically)
    val labels =
      graft.ops.GraphOps.minLabelPropagation(edges, maxIters, broadcastLabels)
    // the label table returned by the loop is a sealed barrier of its
    // own: the edge snapshot's blocks/files can be reclaimed instead
    // of pinning an |E|-sized copy for the app's lifetime
    graft.core.Barrier.free(edges)
    d.select(col("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
  }

  val dupClustersSql: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(
      |      regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')) AS toks
      |  FROM documents),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |      CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      |        AS raw
      |    FROM t a JOIN t b
      |      ON a.doc_id < b.doc_id)
      |  WHERE raw >= 0.9),
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

  /** Two-phase fuzzy dedup: CHEAP candidates (the prefix-filter
    * threshold join) then an EXPENSIVE per-pair verifier (Levenshtein
    * over a bounded prefix) only on the candidates — the standard shape
    * when the precise metric is quadratic in document length: at corpus
    * scale you can afford edit distance on thousands of candidate
    * pairs, never on all pairs. Prefix-bounding keeps the verifier
    * O(prefix^2).
    *
    * SHIPPED SPELLING (r15 A/B, measured): candidates from the plain
    * payload-free [[prefixRankJoin]], then the bounded heads
    * RE-FETCHED by two pair-list-probed joins against the corpus. The
    * alternative — heads riding the candidate join as prefix-row
    * payload ([[editVerifiedPairsPayload]]) — ties on wall (real
    * corpus isolated warm 3.2 vs 3.1 s; `ScaleProbe edit` 1x 51.5 vs
    * 50.2 s, 4x 83.1 vs 83.2 s on the bijected corpus) but ships
    * ~25% MORE shuffle (121.3 vs 92.9 MB at 4x) because every
    * exploded prefix row carries the 60-char head, multiplied by
    * build-side salt replication — at cluster scale shuffle bytes are
    * the network, so the refetch spelling wins. Identical results
    * proven by checksum in the probe and bit-for-bit in LlmSpec.
    */
  def editVerifiedPairs(
      d: DataFrame, threshold: Double = 0.5, prefix: Int = 60): DataFrame = {
    import graft.functions.text.hashed_sorted_tokens
    val pairs =
      prefixRankJoin(d, hashed_sorted_tokens(col("text")), threshold, "jaccard")
    val heads =
      d.select(col("doc_id"), substring(col("text"), 1, prefix).as("head"))
    pairs
      .join(heads.select(col("doc_id").as("doc_a"), col("head").as("head_a")),
        "doc_a")
      .join(heads.select(col("doc_id").as("doc_b"), col("head").as("head_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        levenshtein(col("head_a"), col("head_b")).cast("bigint")
          .as(s"edit_$prefix"))
  }

  /** A/B alternative to [[editVerifiedPairs]] (the r14 shipped
    * spelling, kept measurable): the bounded heads ride through the
    * candidate join as [[prefixRankJoin]] payload, so the verifier
    * runs inside the join stage with no re-fetch joins — but every
    * exploded prefix row (the ~10x pair multiset, times salt
    * replication) carries the head through the shuffle. Measured r15:
    * wall tie, ~25% more shuffle than the re-fetch spelling — see
    * [[editVerifiedPairs]] scaladoc and BASELINE.md for the numbers.
    * Same result set bit-for-bit (LlmSpec + probe checksums).
    */
  private[graft] def editVerifiedPairsPayload(
      d: DataFrame, threshold: Double = 0.5, prefix: Int = 60): DataFrame = {
    import graft.functions.text.hashed_sorted_tokens
    prefixRankJoin(d, hashed_sorted_tokens(col("text")), threshold, "jaccard",
      payload = Some("head" -> substring(col("text"), 1, prefix)))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        levenshtein(col("head_a"), col("head_b")).cast("bigint")
          .as(s"edit_$prefix"))
  }

  val editVerifiedPairsSql: String =
    """WITH t AS (
      |  SELECT doc_id, substring(text, 1, 60) AS head,
      |    list_distinct(list_filter(
      |      regexp_split_to_array(text, '[ \t-\r]+'), t -> t <> '')) AS toks
      |  FROM documents)
      |SELECT doc_a, doc_b, round(raw, 6) AS jaccard,
      |  CAST(levenshtein(head_a, head_b) AS BIGINT) AS edit_60
      |FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.head AS head_a, b.head AS head_b,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      |      AS raw
      |  FROM t a JOIN t b
      |    ON a.doc_id < b.doc_id)
      |WHERE raw >= 0.5""".stripMargin

  // ------------------------------------------------- embedding cosine

  /** Embedding-cosine near-dup pairs, LSH-bucketed (the 100 TB path):
    * candidates come from multi-table + multiprobe random-hyperplane
    * buckets ([[Similarity.lshCandidatePairs]] — the same generator the
    * ANN search uses), each candidate scored once with the codegen'd
    * cosine kernel and kept iff cos >= threshold. Precision is exact
    * (every emitted pair is verified); recall is the LSH collision
    * probability — near-1 for near-identical vectors, asserted against
    * the exhaustive variant in LlmSpec. Seeded hyperplanes are not
    * ANSI-expressible, so the driver check is rows-only.
    */
  def embeddingPairs(
      e: DataFrame, threshold: Double = 0.3,
      nPlanes: Int = 4, nTables: Int = 4): DataFrame = {
    val v = graft.core.Layout.spread(e, "vec_id")
      .select(col("vec_id"), col("embedding"))
    Similarity.lshCandidatePairs(v, nPlanes, nTables, multiprobe = true,
        (a, b) => a < b)
      .select(col("a_id").as("vec_a"), col("b_id").as("vec_b"),
        round(col("sim"), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Cosine threshold 0.3 expressed on the int8 unit scale:
    * dot(qn_a, qn_b) ≈ 127^2 cos, so 4839 ≈ round(0.3 * 127^2). One
    * constant, shared by the Spark filter and the generated oracle.
    */
  val EmbedDupDotThreshold = 4839L
  // hosted in Similarity (next to the candidate machinery) so that the
  // Dedup -> Similarity init dependency stays one-directional — a
  // Similarity -> Dedup reference in a val initializer would create a
  // JVM class-init cycle (deadlock under concurrent first touch)
  private def EmbedDupPlanes = Similarity.EmbedDupPlanes
  private def EmbedDupTables = Similarity.EmbedDupTables

  /** [[embeddingPairs]] re-based on the EXACT int8 machinery
    * ([[Similarity.int8CandidatePairs]] — unit-scale quantization,
    * splitmix64 sign-plane buckets, byte-dot scoring): every arithmetic
    * step after the per-element rounding is order-independent long
    * math, so the DuckDB oracle ([[Similarity.embeddingPairsInt8Sql]])
    * replays the emitted pair set bit-for-bit — near-dup reporting
    * graduates from rows-only to hash-checked. Also the 100 TB shape:
    * the candidate join carries 64 PACKED signed bytes per row instead
    * of 64 floats and verifies with sqrt-free integer multiply-adds. Precision stays
    * exact (every emitted pair is verified against the threshold);
    * recall vs the exhaustive float variant is asserted in LlmSpec.
    */
  def embeddingPairsInt8(
      e: DataFrame, threshold: Long = EmbedDupDotThreshold,
      nPlanes: Int = EmbedDupPlanes, nTables: Int = EmbedDupTables): DataFrame =
    Similarity.int8CandidatePairs(
        e.select(col("vec_id"), col("embedding")),
        nPlanes, nTables, (a, b) => a < b)
      .filter(col("sim") >= threshold)
      .select(col("a_id").as("vec_a"), col("b_id").as("vec_b"), col("sim"))

  val embeddingPairsInt8Sql: String = Similarity.embeddingPairsInt8Sql(
    EmbedDupDotThreshold, EmbedDupPlanes, EmbedDupTables)

  /** Exhaustive within-`label` variant — the small-scale ground truth
    * [[embeddingPairs]]' recall is measured against (LlmSpec). Not the
    * driver path: the all-pairs bucket join is quadratic in bucket
    * size.
    */
  def embeddingPairsExhaustive(
      e: DataFrame, threshold: Double = 0.3): DataFrame = {
    import graft.functions.vector.cosine_similarity
    val v = graft.core.Layout.spread(e, "vec_id")
      .select(col("vec_id"), col("label"), col("embedding"))
    v.as("a")
      .join(v.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine_similarity(col("a.embedding"), col("b.embedding")), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

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
  def minhashPairs(d: DataFrame, minAgree: Double = 0.5): DataFrame =
    minhashBandJoin(minhashSignatures(d), minAgree,
      band => xxhash64(band.cast("string")))

  /** LSH banding + signature agreement shared by the kernel and the
    * ANSI-replayable signature variants: explode each signature into
    * `nBands` (band, bucket) rows, self-join on bucket equality, score
    * agreement across the full signature carried through the join.
    */
  private def minhashBandJoin(
      withSig: DataFrame, minAgree: Double,
      bucketOf: Column => Column): DataFrame = {
    val nBands = MinhashK / BandSize
    val banded = withSig.select(
      col("doc_id"), col("sig"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          bucketOf(slice(col("sig"), b * BandSize + 1, BandSize))
            .as("bucket"))
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

  /** ANSI-replayable MinHash: same shingle convention and affine
    * permutation family as [[minhashSignatures]], but the shingle's
    * base hash is the first 8 hex chars of md5 (mod the Mersenne
    * prime) instead of xxhash64 — md5 is the one hash both Spark and
    * DuckDB evaluate identically, so the DRIVER oracle replays the
    * full signature bit-exactly (the xxhash64 kernel variant is
    * checked against spec ground truth instead). Same map-only,
    * fused-kernel shape as [[minhashSignatures]]:
    * [[graft.functions.TextKernels.minhashSignatureMd5]] digests each
    * shingle straight from the token byte spans — no shingle strings,
    * no hex strings (asserted equal to the composed-expression
    * spelling below).
    */
  def minhashSignaturesExact(d: DataFrame): DataFrame =
    graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"),
        graft.functions.text.minhash_signature_md5(col("text"),
          perms.map(_._1), perms.map(_._2), Prime).as("sig"))

  /** The composed-expression spelling of [[minhashSignaturesExact]]
    * (wsTokens -> concat_ws shingles -> md5/conv/pmod -> HOF mins) —
    * the readable reference the kernel is asserted equal to in
    * FunctionsSpec, and the direct mirror of the DuckDB oracle's CTEs.
    * ~4x slower than the kernel at sf0.1 (shingle + hex string
    * allocation), so the driver query uses the kernel.
    */
  private[graft] def minhashSignaturesExactExpr(d: DataFrame): DataFrame = {
    val tk = TextOps.wsTokens(col("text"))
    val shingles = when(size(tk) >= 3,
      transform(sequence(lit(1), size(tk) - 2), i =>
        concat_ws(" ", slice(tk, i, lit(3)))))
      .otherwise(array(concat_ws(" ", tk)))
    val hh = transform(shingles, s =>
      pmod(conv(substring(md5(s.cast("binary")), 1, 8), 16, 10)
        .cast("long"), lit(Prime)))
    graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"), hh.as("hh"))
      .select(col("doc_id"),
        array(perms.map { case (a, b) =>
          array_min(transform(col("hh"), h => (h * a + b) % Prime))
        }: _*).as("sig"))
  }

  /** [[minhashPairs]] over the md5-family signatures — the driver
    * query: every stage (tokenize, shingle, hash, permute, band,
    * join, score) has an exact DuckDB mirror in
    * [[minhashPairsExactSql]]. The band bucket is the band's
    * components joined as CSV (no bucket hash needed — equality on
    * the string is equality on the band).
    */
  def minhashPairsExact(d: DataFrame, minAgree: Double = 0.5): DataFrame =
    minhashBandJoin(minhashSignaturesExact(d), minAgree,
      band => concat_ws(",", band.cast("array<string>")))

  /** SHARED TEXT BUILDER for [[minhashPairsExact]]'s SQL: the DuckDB
    * oracle AND the Spark facade statement (q_sql_dedup_minhash) are
    * both generated here — the permutation coefficients, band layout,
    * Mersenne prime, and agreement threshold come from the SAME
    * `perms`/`BandSize`/`MinhashK` the DataFrame twin uses, so none of
    * the three spellings can drift. Dialect splits: tokenizer/HOF
    * names, 1-based slicing, array literals, and the md5-hex-to-long
    * parse (Spark has conv(); DuckDB folds the digits).
    *
    * The facade statement recomputes the md5 signature per shingle
    * with composed expressions (the [[minhashSignaturesExactExpr]]
    * spelling, ~4x the fused kernel at sf0.1) — the catalog face for a
    * SQL-string user; [[minhashPairsExact]] is the scale path.
    */
  def minhashPairsSqlText(d: graft.sql.Dialect): String = {
    val sigEntries = d.arrayOf(
      perms.map { case (a, b) =>
        d.arrayMin(d.transform("hh", s"h -> (h * $a + $b) % $Prime"))
      }, "      ")
    val nBands = MinhashK / BandSize
    val lenTk = d.len("tk")
    val hashLambda = s"s -> ${d.md5Head8("s")} % $Prime"
    val agree = s"""CAST(${d.len(d.filter(d.range0List(MinhashK),
      s"i -> ${d.elemAt("a.sig", "i + 1")} = ${d.elemAt("b.sig", "i + 1")}"))}
       |    AS DOUBLE) / $MinhashK""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    ${d.tokens("text", "[ \\t-\\r]+")}
       |      AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN $lenTk >= 3
       |      THEN ${d.transform(d.seq1(s"$lenTk - 2"),
                      s"i -> ${d.arrayJoin(d.slice1("tk", "i", 3), " ")}")}
       |      ELSE ${d.array1(d.arrayJoin("tk", " "))} END AS shingles
       |  FROM toks),
       |hs AS (
       |  SELECT doc_id,
       |    ${d.transform("shingles", hashLambda)} AS hh
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    $sigEntries AS sig
       |  FROM hs),
       |banded AS (
       |  SELECT doc_id, sig, b.band AS band,
       |    ${d.arrayJoin(
                d.slice1("sig", s"b.band * $BandSize + 1", BandSize), ",")}
       |      AS bucket
       |  FROM sig CROSS JOIN ${d.range0(nBands, "band")} b)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  $agree
       |    AS est_jaccard
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.doc_id < b.doc_id
       |WHERE $agree >= 0.5""".stripMargin
  }

  /** Exact DuckDB replay of [[minhashPairsExact]] — the duck rendering
    * of [[minhashPairsSqlText]].
    */
  val minhashPairsExactSql: String =
    minhashPairsSqlText(graft.sql.Dialect.duck)

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

  /** EXHAUSTIVE near-dup pairs by SimHash hamming distance within the
    * `source` bucket — the small-scale ground-truth check the banded
    * path's guarantee is asserted against (LlmSpec). Not the driver
    * path: the per-bucket pair count is quadratic.
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

  /** DEFAULT SimHash near-dup path (Charikar fingerprints searched the
    * way the simhash web-dedup literature prescribes): band the 64-bit
    * fingerprint into `nBands` chunks and join on (band index, band
    * bits) — by pigeonhole, any pair with hamming distance < nBands
    * agrees on at least one band, so with `maxHamming < nBands` the
    * result is EXACTLY the set of corpus-wide pairs at that distance,
    * found with a bucketed sub-quadratic join instead of all-pairs.
    */
  def simhashPairsBanded(
      d: DataFrame, nBands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < nBands,
      s"pigeonhole completeness needs maxHamming < nBands, " +
        s"got $maxHamming >= $nBands")
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
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** ANSI-replayable SimHash: 60-bit fingerprint (15 md5 hex chars per
    * token — the widest hash both engines derive identically without
    * overflowing a signed bigint) instead of the xxhash64 kernel's 64.
    * A bit is set iff strictly more token occurrences vote 1 than 0
    * (2 * count_ones > count — the integer form of the vote sum, no
    * +1/-1 accumulator needed). Map-only fused kernel
    * ([[graft.functions.TextKernels.simhash60Md5]]): one digest per
    * token, votes accumulated in one pass.
    */
  def simhashExact(d: DataFrame): DataFrame =
    graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"),
        graft.functions.text.simhash60_md5(col("text")).as("simhash"))

  /** Composed-expression spelling of [[simhashExact]] (md5/conv per
    * token, 60 HOF vote passes) — the kernel's reference in
    * FunctionsSpec and the direct mirror of the DuckDB oracle.
    */
  private[graft] def simhashExactExpr(d: DataFrame): DataFrame = {
    val tk = TextOps.wsTokens(col("text"))
    val hh = transform(tk, t =>
      conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long"))
    val sig = (0 until 60).map { b =>
      when(size(filter(col("hh"),
        h => h.bitwiseAND(lit(1L << b)) =!= 0)) * 2 > size(col("hh")),
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"), hh.as("hh"))
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** [[simhashPairsBanded]] over the md5-family fingerprint — the
    * driver query, mirrored bit-exactly by [[simhashPairsExactSql]].
    * 4 bands of 15 bits; pigeonhole completeness at maxHamming < 4 is
    * the same argument as the kernel path's.
    */
  def simhashPairsExact(d: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nBands = 4
    val bandBits = 15
    val mask = (1L << bandBits) - 1
    require(maxHamming < nBands, "pigeonhole needs maxHamming < nBands")
    val sh = simhashExact(d)
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
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact DuckDB replay of [[simhashPairsExact]]. */
  val simhashPairsExactSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'), t -> t <> '')
       |      AS tk
       |  FROM documents),
       |hs AS (
       |  SELECT doc_id,
       |    list_transform(tk, t ->
       |      list_reduce(list_transform(range(15), i ->
       |        CAST(strpos('0123456789abcdef', substr(md5(t), i + 1, 1)) - 1
       |          AS BIGINT)),
       |        (a, b) -> a * 16 + b)) AS hh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(60), b ->
       |        CASE WHEN 2 * len(list_filter(hh, h -> (h >> b) & 1 = 1))
       |                  > len(hh)
       |             THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT)
       |        END)),
       |      (a, b) -> a + b) AS simhash
       |  FROM hs),
       |banded AS (
       |  SELECT doc_id, simhash, b.band AS band,
       |    (simhash >> (b.band * 15)) & 32767 AS bits
       |  FROM sig, (SELECT unnest(range(4)) AS band) b)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin

  /** The DEDUPLICATED CORPUS — what a pipeline user actually runs: one
    * survivor (the min-doc_id member) per near-dup cluster, with the
    * member count it stands for. Composes [[dupClusters]] (itself the
    * prefix-rank threshold join + min-label propagation); the extra
    * cost over clustering is one map-side-combinable groupBy on
    * cluster_id. Singletons survive trivially (their own cluster), so
    * output row count = corpus minus discarded near-dup members.
    */
  def dedupSurvivors(
      d: DataFrame, threshold: Double = 0.9,
      broadcastLabels: Boolean = true): DataFrame =
    dupClusters(d, threshold, broadcastLabels = broadcastLabels)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("cluster_id").as("doc_id"), col("n_members"))

  /** DuckDB mirror: [[dupClustersSql]]'s recursive-CTE clustering,
    * re-aggregated to (survivor, member count).
    */
  val dedupSurvivorsSql: String = {
    // reuse the clustering CTE verbatim; min-label semantics make the
    // survivor (= cluster_id) identical on both sides
    val clusters = dupClustersSql
    s"""WITH clusters AS ($clusters)
       |SELECT cluster_id AS doc_id, count(*) AS n_members
       |FROM clusters GROUP BY 1""".stripMargin
  }

  /** SimHash calibration panel — the fingerprint-distance sibling of
    * [[minhashCalibration]]: for every banded SimHash candidate pair,
    * what EXACT token-set jaccard each hamming distance corresponds
    * to on this corpus (count + min/max jaccard permille per
    * distance) — the empirical mapping that justifies (or refutes)
    * the chosen maxHamming threshold. Integer-exact throughout.
    *
    * Scale: candidates from the banded join; two co-partitioned
    * token-set joins per pair; answer-sized aggregate.
    */
  def simhashCalibration(d: DataFrame): DataFrame = {
    val pairs = simhashPairsExact(d)
    val toks = d.select(col("doc_id"),
      array_distinct(TextOps.wsTokens(col("text"))).as("tk"))
    pairs
      .join(toks.select(col("doc_id").as("doc_a"), col("tk").as("ta")),
        "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("tk").as("tb")),
        "doc_b")
      .select(col("hamming"),
        expr("""1000 * size(array_intersect(ta, tb)) DIV
          (size(ta) + size(tb) - size(array_intersect(ta, tb)))""")
          .as("jac_permille"))
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"),
        min("jac_permille").as("min_jac_permille"),
        max("jac_permille").as("max_jac_permille"))
  }

  val simhashCalibrationSql: String =
    s"""WITH pairs AS ($simhashPairsExactSql),
       |tk AS (
       |  SELECT doc_id,
       |    list_distinct(list_filter(
       |      regexp_split_to_array(text, '[ \\t-\\r]+'), t -> t <> ''))
       |      AS tk
       |  FROM documents),
       |scored AS (
       |  SELECT p.hamming,
       |    1000 * len(list_intersect(a.tk, b.tk))
       |      // (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)))
       |      AS jac_permille
       |  FROM pairs p
       |  JOIN tk a ON p.doc_a = a.doc_id
       |  JOIN tk b ON p.doc_b = b.doc_id)
       |SELECT CAST(hamming AS BIGINT) AS hamming, count(*) AS n_pairs,
       |  CAST(min(jac_permille) AS BIGINT) AS min_jac_permille,
       |  CAST(max(jac_permille) AS BIGINT) AS max_jac_permille
       |FROM scored GROUP BY 1""".stripMargin

  /** MinHash estimator-calibration panel: for every banded-candidate
    * pair, the signature ESTIMATE (matching components / K) against
    * the EXACT shingle-set jaccard it estimates, bucketed by signed
    * error permille — the sketch-trust panel that says whether K=16
    * components suffice at the chosen threshold or the bands are
    * promoting junk (the HLL register panel's question, asked of the
    * similarity sketch). Integer-exact: est = 1000·agree DIV 16,
    * exact = 1000·|∩| DIV |∪| over the distinct hashed-shingle sets,
    * error bands shifted non-negative before the DIV (Spark DIV
    * truncates toward zero, DuckDB // floors — negative operands are
    * the one place they disagree).
    *
    * Scale: candidates from the banded join (its documented shape);
    * signatures and shingle-hash sets join back per-pair
    * co-partitioned on doc id; everything after is answer-sized.
    */
  def minhashCalibration(d: DataFrame): DataFrame = {
    val sigs = minhashSignaturesExact(d)
      .select(col("doc_id"), col("sig"))
    val tk = TextOps.wsTokens(col("text"))
    val shingles = when(size(tk) >= 3,
      transform(sequence(lit(1), size(tk) - 2), i =>
        concat_ws(" ", slice(tk, i, lit(3)))))
      .otherwise(array(concat_ws(" ", tk)))
    val sets = graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"),
        array_distinct(transform(shingles, s =>
          pmod(conv(substring(md5(s.cast("binary")), 1, 8), 16, 10)
            .cast("long"), lit(Prime)))).as("hh"))
    val cand = minhashPairsExact(d).select("doc_a", "doc_b")
    val scored = cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")),
        "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")),
        "doc_b")
      .join(sets.select(col("doc_id").as("doc_a"), col("hh").as("ha")),
        "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("hh").as("hb")),
        "doc_b")
      .select(
        expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), b -> b))")
          .as("agree"),
        size(array_intersect(col("ha"), col("hb"))).cast("bigint")
          .as("inter"),
        (size(col("ha")) + size(col("hb"))).cast("bigint").as("szsum"))
      .select(
        expr(s"1000 * agree DIV $MinhashK").as("est_permille"),
        expr("1000 * inter DIV (szsum - inter)").as("exact_permille"))
    scored
      .select(col("est_permille"), col("exact_permille"),
        expr("(est_permille - exact_permille + 1000) DIV 100")
          .as("err_band"))
      .groupBy("err_band")
      .agg(count(lit(1)).as("n_pairs"),
        min(expr("est_permille - exact_permille")).as("min_err"),
        max(expr("est_permille - exact_permille")).as("max_err"))
  }

  val minhashCalibrationSql: String = {
    val sigEntries = perms.map { case (a, b) =>
      s"list_min(list_transform(hh, h -> (h * $a + $b) % $Prime))"
    }.mkString("[\n      ", ",\n      ", "]")
    val nBands = MinhashK / BandSize
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '[ \\t-\\r]+'), t -> t <> '')
       |      AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tk) >= 3
       |      THEN list_transform(range(len(tk) - 2),
       |             i -> array_to_string(tk[i + 1:i + 3], ' '))
       |      ELSE [array_to_string(tk, ' ')] END AS shingles
       |  FROM toks),
       |hs AS (
       |  SELECT doc_id,
       |    list_transform(shingles, s ->
       |      list_reduce(list_transform(range(8), i ->
       |        CAST(strpos('0123456789abcdef', substr(md5(s), i + 1, 1)) - 1
       |          AS BIGINT)),
       |        (a, b) -> a * 16 + b) % $Prime) AS hh
       |  FROM sh),
       |sets AS (SELECT doc_id, list_distinct(hh) AS hh FROM hs),
       |sig AS (
       |  SELECT doc_id,
       |    $sigEntries AS sig
       |  FROM hs),
       |banded AS (
       |  SELECT doc_id, sig, b.band AS band,
       |    array_to_string(sig[b.band * $BandSize + 1:b.band * $BandSize + $BandSize], ',')
       |      AS bucket
       |  FROM sig, (SELECT unnest(range($nBands)) AS band) b),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket
       |      AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_filter(range($MinhashK),
       |      i -> a.sig[i + 1] = b.sig[i + 1])) AS DOUBLE) / $MinhashK
       |      >= 0.5),
       |scored AS (
       |  SELECT
       |    1000 * len(list_filter(range($MinhashK),
       |      i -> qa.sig[i + 1] = qb.sig[i + 1])) // $MinhashK
       |      AS est_permille,
       |    1000 * len(list_intersect(ha.hh, hb.hh))
       |      // (len(ha.hh) + len(hb.hh) - len(list_intersect(ha.hh, hb.hh)))
       |      AS exact_permille
       |  FROM cand c
       |  JOIN sig qa ON c.doc_a = qa.doc_id
       |  JOIN sig qb ON c.doc_b = qb.doc_id
       |  JOIN sets ha ON c.doc_a = ha.doc_id
       |  JOIN sets hb ON c.doc_b = hb.doc_id)
       |SELECT CAST((est_permille - exact_permille + 1000) // 100 AS BIGINT)
       |    AS err_band,
       |  count(*) AS n_pairs,
       |  CAST(min(est_permille - exact_permille) AS BIGINT) AS min_err,
       |  CAST(max(est_permille - exact_permille) AS BIGINT) AS max_err
       |FROM scored GROUP BY 1""".stripMargin
  }

  /** Detector-agreement (Venn) panel over the three EXACT near-dup
    * pair detectors — token-set jaccard, 3-gram shingle jaccard, and
    * winnow fingerprint overlap: how many pairs each subset of
    * detectors finds. The diagnostic that tells a curation pipeline
    * whether a cheaper detector subsumes a dearer one ON THIS CORPUS
    * (shingle ⊂ token-set nearly always; winnow-only pairs are the
    * copied-section cases both jaccards dilute) — measured, not
    * assumed.
    *
    * Scale: the three pair generators run at their own documented
    * scale shapes; everything after is answer-sized (pair lists union
    * into one flag aggregate). Bench pays all three generators in one
    * query — the dedup-trio convention, recorded where the numbers
    * are read.
    *
    * A SHARED tokenized checkpoint was tried and MEASURED OUT
    * (round 12): computing (hashed tokens, hashed shingles,
    * winnow-selected) in one corpus scan and localCheckpointing it
    * for all three detectors took the isolated venn from 5.7 s to
    * 11.8 s at sf0.1 (standalone detectors at-level in the same
    * window, load average ~3) — each prefix-rank join reads its
    * token structures several times, and re-reading fat uncompressed
    * array blocks from block storage costs MORE than re-running the
    * codegen'd md5/tokenize kernels against compact page-cached
    * parquet. The round-11 storage-pressure lesson, now with a
    * direct A/B. On a cold remote object store the trade flips
    * (IO-bound scans, compute nearly free) — the shared-scan
    * building blocks ([[TextOps.winnowSelected]],
    * [[TextOps.winnowPairsFromSets]]) stay available for that
    * deployment; the bench-graded default recomputes.
    */
  def detectorVenn(d: DataFrame): DataFrame = {
    def flag(df: DataFrame, f: String): DataFrame =
      df.select(col("doc_a"), col("doc_b"),
        lit(if (f == "j") 1L else 0L).as("j"),
        lit(if (f == "s") 1L else 0L).as("s"),
        lit(if (f == "w") 1L else 0L).as("w"))
    flag(jaccardPairs(d), "j")
      .unionByName(flag(jaccardShinglePairs(d), "s"))
      .unionByName(flag(TextOps.winnowPairs(d), "w"))
      .groupBy("doc_a", "doc_b")
      .agg(max("j").as("j"), max("s").as("s"), max("w").as("w"))
      .groupBy("j", "s", "w")
      .agg(count(lit(1)).as("n_pairs"))
      .select(
        concat_ws("+",
          when(col("j") === 1, lit("jaccard")),
          when(col("s") === 1, lit("shingle")),
          when(col("w") === 1, lit("winnow"))).as("detectors"),
        col("n_pairs"))
  }

  val detectorVennSql: String =
    s"""WITH jp AS ($jaccardPairsSql),
       |sp AS ($jaccardShinglePairsSql),
       |wp AS (${TextOps.winnowPairsSql}),
       |all_flags AS (
       |  SELECT doc_a, doc_b, 1 AS j, 0 AS s, 0 AS w FROM jp
       |  UNION ALL
       |  SELECT doc_a, doc_b, 0, 1, 0 FROM sp
       |  UNION ALL
       |  SELECT doc_a, doc_b, 0, 0, 1 FROM wp),
       |per_pair AS (
       |  SELECT doc_a, doc_b, max(j) AS j, max(s) AS s, max(w) AS w
       |  FROM all_flags GROUP BY 1, 2)
       |SELECT concat_ws('+',
       |    CASE WHEN j = 1 THEN 'jaccard' END,
       |    CASE WHEN s = 1 THEN 'shingle' END,
       |    CASE WHEN w = 1 THEN 'winnow' END) AS detectors,
       |  count(*) AS n_pairs
       |FROM per_pair GROUP BY j, s, w""".stripMargin

  /** Contrastive training-pair mining — the dataset-construction step
    * for embedding-model training (SimCSE/E5 shape): every doc with at
    * least one near-dup becomes an ANCHOR; its POSITIVE is the
    * highest-jaccard partner (deterministic (jaccard desc, id)
    * argmax), and its HARD NEGATIVE is the most-confusable non-pair —
    * same language, same log2-length bucket, minimal |length
    * difference|, excluding everything the anchor actually pairs with
    * (a negative that is secretly a positive poisons the loss).
    *
    * Scale: the pair list is localCheckpoint-shared by the positive
    * argmax and the negative anti-join, and the op's cost is
    * PAIR-LIST-BOUNDED — the synthetic corpus is vocabulary-saturated
    * (~9M pairs at sf0.1 even at threshold 0.8), so its bench row
    * reads as "argmax+anti-join over a quadratic pair list", the same
    * convention as q_dedup_jaccard itself; on a real corpus at
    * production thresholds the pair list is near-linear and this op
    * is marginal over it. Negative candidates are at most [[NegProbe]]
    * hash-ring neighbors per anchor (linear by construction — the
    * whole-cell spelling was quadratic per length octave).
    */
  def contrastivePairs(d: DataFrame, threshold: Double = 0.5,
      saltTarget: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // checkpoint the DIRECTED pair list once (its four consumers —
    // both argmax halves and both faces of the membership anti-join —
    // would otherwise re-run the prefix-rank join each); the SYMMETRIC
    // form stays LAZY over those blocks (materializing 18M sym rows
    // doubled storage pressure for nothing)
    val pairs = jaccardPairs(d, threshold, saltTarget).barrier()
    val sym = pairs
      .select(col("doc_a").as("anchor"), col("doc_b").as("partner"),
        col("jaccard"))
      .unionByName(pairs.select(col("doc_b").as("anchor"),
        col("doc_a").as("partner"), col("jaccard")))
    // positive argmax as ALGEBRAIC max-of-struct aggregates (map-side
    // combinable) instead of a window over the symmetric list — the
    // window's per-anchor sort over ~18M rows was the op's dominant
    // cost; (jaccard, -partner) struct order = (jaccard desc, partner
    // asc) tie-break, partner ids being non-negative
    def posHalf(a: String, b: String) =
      pairs.groupBy(col(a).as("anchor"))
        .agg(max(struct(col("jaccard"),
          (lit(0L) - col(b)).as("negp"))).as("m"))
        .select(col("anchor"), col("m"))
    val pos = posHalf("doc_a", "doc_b")
      .unionByName(posHalf("doc_b", "doc_a"))
      .groupBy("anchor").agg(max(col("m")).as("m"))
      .select(col("anchor"), (lit(0L) - col("m.negp")).as("pos_id"),
        col("m.jaccard").as("pos_jaccard"))
    // negative candidates: at most `NegProbe` deterministic HASH-RING
    // neighbors inside the anchor's (lang, log2-length-octave) cell —
    // NOT the whole cell. The whole-cell spelling was quadratic per
    // cell (most docs share 2-3 octaves: 13.3 s at sf0.1, the
    // suite's worst outlier) for no gain: octave membership already
    // enforces the "confusable length" property, and within it a
    // content-hash-ordered neighbor is an unbiased deterministic
    // sample. Candidate rows are |anchors| x NegProbe — linear.
    val meta = d.select(col("doc_id"), col("lang"),
      length(col("text")).cast("bigint").as("len"),
      md5(col("text").cast("binary")).as("h"))
      .withColumn("bucket", expr("length(bin(greatest(len, 1)))"))
    val wCell = Window.partitionBy("lang", "bucket")
      .orderBy(col("h"), col("doc_id"))
    val wCellAll = Window.partitionBy("lang", "bucket")
    val ranked = meta
      .withColumn("r", row_number().over(wCell) - 1)
      .withColumn("m", count(lit(1)).over(wCellAll))
      .barrier()
    val anchors = pos.join(
      ranked.select(col("doc_id").as("anchor"), col("lang"), col("bucket"),
        col("len").as("a_len"), col("r"), col("m")), "anchor")
    val cands = anchors
      .select(col("anchor"), col("pos_id"), col("pos_jaccard"),
        col("lang"), col("bucket"), col("a_len"), col("m"),
        explode(expr(s"transform(sequence(1, $NegProbe), o" +
          s" -> (r + o) % m)")).as("cr"))
      .filter(col("m") > 1)
      .join(ranked.select(col("lang"), col("bucket"),
        col("r").as("cr"), col("doc_id").as("cand"),
        col("len").as("cand_len")), Seq("lang", "bucket", "cr"))
      .filter(col("cand") =!= col("anchor"))
      .join(sym.select(col("anchor"), col("partner").as("cand")),
        Seq("anchor", "cand"), "left_anti")
    val wNeg = Window.partitionBy("anchor")
      .orderBy(abs(col("cand_len") - col("a_len")), col("cand"))
    cands.withColumn("rn", row_number().over(wNeg))
      .filter(col("rn") === 1)
      .select(col("anchor").as("anchor_id"), col("pos_id"),
        col("pos_jaccard"), col("cand").as("neg_id"),
        abs(col("cand_len") - col("a_len")).as("neg_len_diff"))
  }

  private val NegProbe = 8

  val contrastivePairsSql: String =
    s"""WITH pairs AS ($jaccardPairsSql),
       |sym AS (
       |  SELECT doc_a AS anchor, doc_b AS partner, jaccard FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a, jaccard FROM pairs),
       |pos AS (
       |  SELECT anchor, partner AS pos_id, jaccard AS pos_jaccard FROM (
       |    SELECT anchor, partner, jaccard,
       |      row_number() OVER (PARTITION BY anchor
       |        ORDER BY jaccard DESC, partner) AS rn
       |    FROM sym)
       |  WHERE rn = 1),
       |meta AS (
       |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS len,
       |    length(bin(greatest(length(text), 1))) AS bucket,
       |    md5(text) AS h
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, lang, bucket, len,
       |    row_number() OVER (PARTITION BY lang, bucket
       |      ORDER BY h, doc_id) - 1 AS r,
       |    count(*) OVER (PARTITION BY lang, bucket) AS m
       |  FROM meta),
       |cands AS (
       |  SELECT p.anchor, p.pos_id, p.pos_jaccard, a.a_len,
       |    c.doc_id AS cand, c.len AS cand_len
       |  FROM pos p
       |  JOIN (SELECT doc_id AS anchor, lang, bucket, len AS a_len,
       |          r, m FROM ranked) a ON p.anchor = a.anchor,
       |  LATERAL (SELECT unnest(generate_series(1, 8)) AS o) os
       |  JOIN ranked c ON c.lang = a.lang AND c.bucket = a.bucket
       |    AND c.r = (a.r + os.o) % a.m
       |    AND c.doc_id <> p.anchor
       |  WHERE a.m > 1
       |    AND NOT EXISTS (SELECT 1 FROM sym s
       |      WHERE s.anchor = p.anchor AND s.partner = c.doc_id))
       |SELECT anchor AS anchor_id, pos_id, pos_jaccard,
       |  cand AS neg_id, CAST(abs(cand_len - a_len) AS BIGINT)
       |    AS neg_len_diff
       |FROM (
       |  SELECT anchor, pos_id, pos_jaccard, a_len, cand, cand_len,
       |    row_number() OVER (PARTITION BY anchor
       |      ORDER BY abs(cand_len - a_len), cand) AS rn
       |  FROM cands)
       |WHERE rn = 1""".stripMargin

  /** Cluster-size histogram — the "how duplicated is this corpus"
    * summary read before choosing a dedup threshold: for each cluster
    * size, how many clusters and how many docs sit at it (size 1 =
    * unique docs; the tail is the mass dedup will delete). Derived
    * from [[dupClusters]] with two answer-sized aggregates — at 100 TB
    * a real pipeline computes clusters once and this panel is
    * marginal-cost; Bench times it unmemoized like the rest of the
    * trio (the documented convention).
    */
  def dedupClusterHist(
      d: DataFrame, threshold: Double = 0.9,
      broadcastLabels: Boolean = true): DataFrame =
    dupClusters(d, threshold, broadcastLabels = broadcastLabels)
      .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  val dedupClusterHistSql: String =
    s"""WITH clusters AS ($dupClustersSql),
       |sizes AS (
       |  SELECT cluster_id, count(*) AS sz FROM clusters GROUP BY 1)
       |SELECT CAST(sz AS BIGINT) AS cluster_size,
       |  count(*) AS n_clusters,
       |  CAST(sz * count(*) AS BIGINT) AS n_docs
       |FROM sizes GROUP BY sz""".stripMargin

  /** Soft dedup: instead of DROPPING near-duplicates, down-weight
    * them — every member of an n-doc cluster gets sampling weight 1/n
    * (integer-exact as `1000000 DIV n`), singletons keep weight 1.
    * The reweighting alternative to [[dedupSurvivors]]: total expected
    * exposure per unique content stays 1.0, so no information is lost
    * while duplicate gradient amplification is removed (the SoftDeDup
    * recipe). Rides the memoized clustering; the weight assignment is
    * one cluster-partitioned count window plus a LEFT join back to the
    * corpus for the singleton rows — both shapes the cluster trio
    * already pays for.
    */
  def softDedupWeights(
      d: DataFrame, threshold: Double = 0.9,
      broadcastLabels: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCluster = Window.partitionBy("cluster_id")
    val sized = dupClusters(d, threshold, broadcastLabels = broadcastLabels)
      .withColumn("sz", count(lit(1)).over(byCluster).cast("bigint"))
    d.select(col("doc_id"))
      .join(sized, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("sz"), lit(1L)).as("cluster_size"),
        (lit(1000000L) / coalesce(col("sz"), lit(1L))).cast("bigint")
          .as("weight_e6"))
  }

  val softDedupWeightsSql: String =
    s"""WITH clusters AS ($dupClustersSql),
       |sized AS (
       |  SELECT doc_id,
       |    count(*) OVER (PARTITION BY cluster_id) AS sz
       |  FROM clusters)
       |SELECT d.doc_id,
       |  CAST(coalesce(s.sz, 1) AS BIGINT) AS cluster_size,
       |  CAST(1000000 // coalesce(s.sz, 1) AS BIGINT) AS weight_e6
       |FROM documents d LEFT JOIN sized s ON d.doc_id = s.doc_id""".stripMargin

  /** QUALITY-AWARE survivor selection: keep each near-dup cluster's
    * BEST member (highest integer alpha-quality, doc_id tiebreak)
    * instead of [[dedupSurvivors]]' lowest-id member — what a curation
    * pipeline actually wants, since near-dup copies differ in
    * boilerplate/truncation and the arbitrary copy is often the worse
    * one. The shared quality score ([[TextOps.alphaX10000OfText]],
    * integer-exact) keeps the argmax deterministic in both engines.
    *
    * Scale: clustering as in [[dupClusters]]; the pick is a window
    * partitioned by cluster_id (bounded by the largest cluster — the
    * same bound the clustering itself already carries), plus one
    * cluster-sized count window on the same partitioning/exchange.
    */
  def dedupSurvivorsBest(
      d: DataFrame, threshold: Double = 0.9,
      broadcastLabels: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = coalesce(TextOps.alphaX10000OfText, lit(-1L))
    val scored = d.select(col("doc_id"), q.as("q_x10000"))
      .join(dupClusters(d, threshold, broadcastLabels = broadcastLabels),
        "doc_id")
    val byCluster = Window.partitionBy("cluster_id")
    scored
      .withColumn("rn", row_number().over(
        byCluster.orderBy(col("q_x10000").desc, col("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keep_id"),
        col("q_x10000").as("keep_q"),
        col("n_members").cast("bigint").as("n_members"))
  }

  /** DuckDB mirror: clustering CTE + the same quality argmax. */
  val dedupSurvivorsBestSql: String =
    s"""WITH clusters AS ($dupClustersSql),
       |scored AS (
       |  SELECT c.cluster_id, c.doc_id,
       |    coalesce(CAST(length(regexp_replace(d.text, '[^\\p{L}]', '', 'g'))
       |        AS BIGINT) * 10000 // nullif(length(d.text), 0), -1)
       |      AS q_x10000
       |  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id)
       |SELECT cluster_id, doc_id AS keep_id, q_x10000 AS keep_q,
       |  n_members
       |FROM (
       |  SELECT cluster_id, doc_id, q_x10000,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY q_x10000 DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_members
       |  FROM scored)
       |WHERE rn = 1""".stripMargin

  /** Benchmark DECONTAMINATION: flag corpus documents that share at
    * least `minHits` distinct n-token shingles with ANY document of a
    * reference (eval/benchmark) set — the training-data hygiene op
    * that keeps eval questions out of the training corpus. Asymmetric
    * by design: the reference side is small (benchmark suites, ~1e4-1e6
    * docs), the corpus side is the 100 TB one.
    *
    * Scale shape: the corpus is never broadcast and never self-joined.
    * Corpus shingles come from the same single-pass hash kernel as
    * [[jaccardShinglePairs]] and explode map-side; the reference
    * collapses to DISTINCT shingle hashes (one 8-byte value per
    * distinct reference shingle) which ride the join as a broadcast by
    * default (`broadcastRef = false` switches to a hash-partitioned
    * shuffle join for reference sets that outgrow an executor). Join
    * multiplicity is 1 on the reference side — every corpus shingle
    * matches at most one distinct reference hash — so output is
    * bounded by the exploded corpus, never quadratic, and a "stop
    * shingle" hot in the corpus cannot melt a reducer (its matches
    * stay on their map-side partitions under broadcast). The per-doc
    * hit count is a map-side-combinable groupBy on doc_id.
    *
    * Output: (doc_id, n_hits, n_shingles) for contaminated docs —
    * n_hits/n_shingles is the contamination fraction, left to the
    * caller as exact integers.
    */
  def decontaminate(
      corpus: DataFrame, reference: DataFrame, n: Int = 3,
      minHits: Int = 2, broadcastRef: Boolean = true): DataFrame = {
    import graft.functions.text.hashed_sorted_shingles
    val refSh = reference
      .select(explode(hashed_sorted_shingles(col("text"), n)).as("g"))
      .distinct()
    val refSide = if (broadcastRef) broadcast(refSh) else refSh
    graft.core.Layout.spread(corpus, "doc_id")
      .select(col("doc_id"),
        hashed_sorted_shingles(col("text"), n).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("bigint").as("n_shingles"),
        explode(col("sh")).as("g"))
      .join(refSide, "g")
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .select(col("doc_id"), col("n_hits"), col("n_shingles"))
  }

  /** [[decontaminate]] with a Bloom-filter prefilter: when the
    * reference set outgrows what a broadcast (or even a comfortable
    * shuffle) wants to carry, summarize its distinct shingle hashes
    * into a Bloom sketch (~1.2 MB per 1 M shingles at 1% fpp — built
    * with a tree aggregation, broadcast once) and drop the ~99% of
    * corpus shingles that cannot match BEFORE the exact join. The
    * join then verifies the survivors — hits plus the fpp sliver —
    * against the real reference hashes, so false positives are
    * eliminated and the RESULT IS EXACTLY [[decontaminate]]'s (same
    * DuckDB oracle). The join runs hash-partitioned (not broadcast):
    * the sketch already did the broadcast's job, and only
    * bloom-surviving shingles shuffle.
    *
    * The `mightContainLong` probe is a non-codegen UDF, but it guards
    * the exchange, not a per-row hot loop: at 100 TB it deletes the
    * shuffle of every clean document's shingles, which is the whole
    * cost of the operator.
    */
  def decontaminateBloom(
      corpus: DataFrame, reference: DataFrame, n: Int = 3,
      minHits: Int = 2, fpp: Double = 0.01): DataFrame = {
    import graft.functions.text.hashed_sorted_shingles
    // materialize ONCE: three consumers (the count below, the bloom
    // aggregation, the verify join) would otherwise each re-run the
    // reference scan + shingle explode + shuffle-distinct
    val refSh = reference
      .select(explode(hashed_sorted_shingles(col("text"), n)).as("g"))
      .distinct().barrier()
    // expectedNumItems needs a count — one reference-sized pass; the
    // reference is the small side by the operator's contract.
    val expected = math.max(refSh.count(), 1000L)
    val bf = refSh.stat.bloomFilter("g", expected, fpp)
    val bfBc = corpus.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((g: Long) => bfBc.value.mightContainLong(g))
    // Deliberately NO Layout.spread (unlike [[decontaminate]]): this
    // variant's whole point is that everything before the verify join
    // is map-side, so an up-front repartition would shuffle the full
    // corpus — the very cost the sketch deletes (measured in
    // `ScaleProbe bloom`: the spread was 100% of the shuffle volume).
    // Scan splits provide the parallelism at scale.
    corpus
      .select(col("doc_id"),
        hashed_sorted_shingles(col("text"), n).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("bigint").as("n_shingles"),
        explode(col("sh")).as("g"))
      .filter(mightContain(col("g")))
      .join(refSh, "g")
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .select(col("doc_id"), col("n_hits"), col("n_shingles"))
  }

  /** Incremental (snapshot-delta) exact dedup: the documents of an
    * incoming batch whose content hash does NOT already exist in the
    * standing corpus — the continuous-ingest shape of [[exact]]. A
    * left-anti join on the content hash: both sides co-partition on
    * the hash (no broadcast hint — at scale both sides are large),
    * and map-side distinct-ish partial aggregation is unnecessary
    * because the anti join already short-circuits on first match.
    */
  def incrementalNew(incoming: DataFrame, corpus: DataFrame): DataFrame =
    incoming
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"))
      .join(
        corpus.select(md5(col("text").cast("binary")).as("content_hash")),
        Seq("content_hash"), "left_anti")
      .select(col("doc_id"), col("content_hash"))

  val incrementalNewSql: String =
    """SELECT doc_id, md5(text) AS content_hash
      |FROM documents
      |WHERE source = 'src0'
      |  AND md5(text) NOT IN
      |    (SELECT md5(text) FROM documents WHERE source <> 'src0')""".stripMargin

  /** SNAPSHOT DIFF between two corpus versions: per-status counts of
    * added / removed / changed / unchanged documents, by full-outer
    * joining the two sides' (doc_id, content hash). The audit step of
    * an incremental ingestion pipeline ([[incrementalNew]] answers
    * "which docs are new by CONTENT"; this answers "what happened to
    * each doc_id between snapshots").
    *
    * Scale: both sides reduce to (doc_id, 16-byte hash) map-side; one
    * co-partitioned full-outer join on doc_id; answer-sized rollup.
    * Nothing broadcasts — at 100 TB both snapshots are corpus-sized.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    def keyed(df: DataFrame, hname: String) = df.select(
      col("doc_id"), md5(col("text").cast("binary")).as(hname))
    keyed(oldSnap, "old_h")
      .join(keyed(newSnap, "new_h"), Seq("doc_id"), "full_outer")
      .select(
        when(col("old_h").isNull, "added")
          .when(col("new_h").isNull, "removed")
          .when(col("old_h") =!= col("new_h"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
  }

  /** The driver query derives both snapshots from the documents table:
    * old = doc_id % 10 != 0, new = doc_id % 7 != 0 with a ' v2' text
    * suffix on doc_id % 13 == 0 — exercising all four statuses.
    */
  val snapshotDiffSql: String =
    """WITH oldv AS (
      |  SELECT doc_id, md5(text) AS old_h FROM documents
      |  WHERE doc_id % 10 <> 0),
      |newv AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END)
      |      AS new_h
      |  FROM documents WHERE doc_id % 7 <> 0)
      |SELECT CASE
      |    WHEN o.old_h IS NULL THEN 'added'
      |    WHEN n.new_h IS NULL THEN 'removed'
      |    WHEN o.old_h <> n.new_h THEN 'changed'
      |    ELSE 'unchanged' END AS status,
      |  count(*) AS n_docs
      |FROM oldv o FULL OUTER JOIN newv n USING (doc_id)
      |GROUP BY 1""".stripMargin

  /** TIME-TRAVEL diff: the [[snapshotDiff]] panel computed over two
    * PINNED storage snapshots instead of two in-memory frames — the
    * full write-audit-publish -> pointer-log -> readAt loop as one
    * query. Both corpus versions (the q_dedup_diff derivations) are
    * published through [[graft.core.Layout.writeAuditPublish]] into a
    * fresh root, so the table's pointer log holds seq 1 and seq 2;
    * the diff then reads BOTH through [[graft.core.Layout.readAt]] —
    * seq 1 resolved AFTER seq 2 published, which is exactly the
    * guarantee time travel adds over readCurrent. The audit step
    * gates each publish on non-empty doc_ids (a real WAP audit, not a
    * pass-through). The DuckDB oracle computes the same diff straight
    * from the documents table: hash-equality proves the
    * publish/pin/read round-trip is lossless.
    *
    * Scale: two snapshot materializations (corpus-sized parquet
    * writes — the operator IS storage) + snapshotDiff's map-side
    * (doc_id, hash) full-outer join. Pointer resolution is O(#snapshots)
    * driver-side file listings, independent of data size.
    */
  def timeTravelDiff(d: DataFrame): DataFrame = {
    import graft.core.Layout
    val spark = d.sparkSession
    val root = java.nio.file.Files.createTempDirectory("graft-timetravel")
      .toString
    // try/finally: any failure past this point (a publish, a read, the
    // diff itself) must not leak a corpus-sized temp directory.
    try {
      val audit = (s: DataFrame) =>
        if (s.filter(col("doc_id").isNotNull).limit(1).count() == 0)
          Seq("empty_snapshot") else Nil
      val v1 = d.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("text"), col("source"))
      val v2 = d.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .select(col("doc_id"), col("text"), col("source"))
      val p1 = Layout.writeAuditPublish(v1, root, "1", audit)
      val p2 = Layout.writeAuditPublish(v2, root, "2", audit)
      if (p1.isLeft || p2.isLeft) {
        // Degenerate-panel convention (kllSketch/pcaPower/scatter):
        // an EMPTY corpus fails the WAP audit — which is the audit
        // doing its job — so the panel is empty rather than a thrown
        // require; a real diff always has >= 1 status row.
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("old_seq", LongType), StructField("new_seq", LongType),
            StructField("status", StringType), StructField("n_docs", LongType))))
      } else {
        val seqs = Layout.snapshots(spark, root).map(_._1)
        val out = snapshotDiff(
          Layout.readAt(spark, root, seqs.head),
          Layout.readAt(spark, root, seqs.last))
          .select(lit(seqs.head).as("old_seq"), lit(seqs.last).as("new_seq"),
            col("status"), col("n_docs"))
        // materialize before the temp root is deleted below; the
        // result is answer-sized (<= 4 rows)
        out.barrier()
      }
    } finally {
      org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
    }
  }

  val timeTravelDiffSql: String =
    """WITH oldv AS (
      |  SELECT doc_id, md5(text) AS old_h FROM documents
      |  WHERE doc_id % 10 <> 0),
      |newv AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END)
      |      AS new_h
      |  FROM documents WHERE doc_id % 7 <> 0)
      |SELECT CAST(1 AS BIGINT) AS old_seq, CAST(2 AS BIGINT) AS new_seq,
      |  CASE
      |    WHEN o.old_h IS NULL THEN 'added'
      |    WHEN n.new_h IS NULL THEN 'removed'
      |    WHEN o.old_h <> n.new_h THEN 'changed'
      |    ELSE 'unchanged' END AS status,
      |  count(*) AS n_docs
      |FROM oldv o FULL OUTER JOIN newv n USING (doc_id)
      |GROUP BY 3""".stripMargin

  /** DuckDB mirror of [[decontaminate]] with the documents table split
    * by doc_id % 97 (≈1% reference sample): string shingles stand in
    * for the kernel's xxhash64'd shingles — distinct-count identical
    * absent 64-bit collisions, the same equivalence every shingle
    * oracle here relies on.
    */
  /** Graded contamination scoring — [[decontaminate]]'s continuous
    * sibling. Instead of flagging docs at a hit threshold, report EVERY
    * train doc's overlap fraction with the eval reference (distinct
    * shingles hit / distinct shingles) and a contamination band, the
    * input to contamination-aware weighting or doc-level quarantine
    * review (dropping at a hard threshold throws away the borderline
    * mass a curator usually wants to inspect or down-weight instead).
    * Banding compares the ROUNDED ratio so the band boundary is the
    * same literal in both engines.
    *
    * Scale: identical shape to [[decontaminate]] — reference shingles
    * broadcast (or [[decontaminateBloom]]'s sketch when they outgrow
    * it), corpus shingles map-side, one hit aggregate; the extra left
    * join for zero-hit docs is corpus-row-sized against an
    * answer-sized hit table.
    */
  def contaminationScore(
      corpus: DataFrame, reference: DataFrame, n: Int = 3,
      broadcastRef: Boolean = true): DataFrame = {
    import graft.functions.text.hashed_sorted_shingles
    val refSh = reference
      .select(explode(hashed_sorted_shingles(col("text"), n)).as("g"))
      .distinct()
    val refSide = if (broadcastRef) broadcast(refSh) else refSh
    val spread = graft.core.Layout.spread(corpus, "doc_id")
      .select(col("doc_id"), hashed_sorted_shingles(col("text"), n).as("sh"))
    val hits = spread
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(refSide, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
    val contam = round(
      when(col("n_shingles") === 0, lit(0.0))
        .otherwise(col("n_hits").cast("double") / col("n_shingles")), 6)
    spread.select(col("doc_id"),
        size(col("sh")).cast("bigint").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contam", contam)
      .withColumn("band",
        when(col("contam") >= 0.5, "heavy")
          .when(col("contam") >= 0.1, "medium")
          .when(col("contam") > 0.0, "light")
          .otherwise("clean"))
  }

  val contaminationScoreSql: String =
    """WITH t AS (
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
      |ref AS (
      |  SELECT DISTINCT unnest(sset) AS g FROM sh WHERE doc_id % 97 = 0),
      |corp AS (
      |  SELECT doc_id, unnest(sset) AS g FROM sh WHERE doc_id % 97 <> 0),
      |hits AS (
      |  SELECT c.doc_id, count(*) AS n_hits
      |  FROM corp c JOIN ref r ON c.g = r.g GROUP BY 1),
      |scored AS (
      |  SELECT s.doc_id,
      |    CAST(len(s.sset) AS BIGINT) AS n_shingles,
      |    CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      |    round(CASE WHEN len(s.sset) = 0 THEN 0.0
      |      ELSE CAST(coalesce(h.n_hits, 0) AS DOUBLE) / len(s.sset) END, 6)
      |      AS contam
      |  FROM sh s LEFT JOIN hits h USING (doc_id)
      |  WHERE s.doc_id % 97 <> 0)
      |SELECT doc_id, n_shingles, n_hits, contam,
      |  CASE WHEN contam >= 0.5 THEN 'heavy'
      |       WHEN contam >= 0.1 THEN 'medium'
      |       WHEN contam > 0.0 THEN 'light'
      |       ELSE 'clean' END AS band
      |FROM scored""".stripMargin

  val decontaminateSql: String =
    """WITH t AS (
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
      |ref AS (
      |  SELECT DISTINCT unnest(sset) AS g FROM sh WHERE doc_id % 97 = 0),
      |corp AS (
      |  SELECT doc_id, unnest(sset) AS g FROM sh WHERE doc_id % 97 <> 0),
      |szs AS (
      |  SELECT doc_id, len(sset) AS n_shingles FROM sh
      |  WHERE doc_id % 97 <> 0),
      |hits AS (
      |  SELECT c.doc_id, count(*) AS n_hits
      |  FROM corp c JOIN ref r ON c.g = r.g GROUP BY 1)
      |SELECT h.doc_id, h.n_hits, s.n_shingles
      |FROM hits h JOIN szs s USING (doc_id)
      |WHERE h.n_hits >= 2""".stripMargin

  // ------------------------------------------- duplicate substring spans

  /** Exact duplicate-SUBSTRING detection: for every document, find the
    * maximal token spans whose every `k`-token window occurs at least
    * twice in the corpus (in any document, including the same one) —
    * the ExactSubstr dedup of Lee et al. 2022 (arXiv:2107.06499),
    * re-expressed relationally. Suffix arrays find the same spans with
    * a global sort; here each k-token window is reduced to a 16-byte
    * hash and duplicate windows are found by a hash-partitioned count,
    * then per-document overlapping windows merge into maximal spans by
    * a gaps-and-islands pass.
    *
    * Output per document: token count, number of maximal duplicated
    * spans, tokens covered by those spans, and the covered fraction —
    * the statistic a curation pipeline thresholds on (or uses to cut
    * the spans out).
    *
    * Scale: the window table is O(corpus tokens) rows but each row is
    * (doc_id, pos, 16-byte hash) — the duplicate-window count is ONE
    * hash-partitioned algebraic aggregation on the hash (map-side
    * combined, so a virally-copied span costs its partition count, not
    * its occurrence count, in shuffle), and the verdict join back is
    * co-partitioned on the same key. The islands merge runs in windows
    * PARTITIONED per doc_id (never global) and the final span
    * aggregation is answer-sized. No stage broadcasts or collects
    * anything; two corpus-token-sized exchanges total — the same cost
    * class as the suffix-array sort it replaces, with Spark handling
    * distribution.
    */
  /** The k-token window table (doc_id, pos, g) shared by the report
    * and apply forms. 1-based window starts; docs shorter than k
    * contribute no windows (guard: sequence() would count DOWN and
    * fabricate them). g is the RAW 16-byte digest (unhex), not the
    * 32-char hex string: the window table is the dominant shuffle (it
    * crosses the wire twice — count exchange + verdict exchange) and
    * the key is most of the row, so this halves the operator's shuffle
    * volume. The oracle is unaffected: g never reaches any output.
    */
  private def windowTable(base: DataFrame, k: Int): DataFrame =
    base.select(
      col("doc_id"),
      explode(
        when(size(col("toks")) >= k,
          transform(sequence(lit(1), size(col("toks")) - (k - 1)),
            i => struct(
              i.as("pos"),
              unhex(md5(concat_ws(" ", slice(col("toks"), i, lit(k)))
                .cast("binary"))).as("g"))))
          .otherwise(array().cast("array<struct<pos:int,g:binary>>")))
        .as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.g").as("g"))

  def duplicateSpans(d: DataFrame, k: Int = 15): DataFrame = {
    val base = d.select(
      col("doc_id"), TextOps.letterTokens(col("text")).as("toks"))
    val wins = windowTable(base, k)
    val spans = spanRanges(wins, k)
      .select(col("doc_id"), (col("e") - col("s") + 1).as("span_len"))
    val perDoc = spans.groupBy("doc_id").agg(
      count(lit(1)).as("n_spans"),
      sum(col("span_len")).cast("bigint").as("dup_tokens"))
    val dupToks = coalesce(col("dup_tokens"), lit(0L))
    base.select(col("doc_id"), size(col("toks")).cast("bigint").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        dupToks.as("dup_tokens"),
        round(
          when(col("n_tokens") === 0, lit(0.0))
            .otherwise(dupToks.cast("double") / col("n_tokens")),
          4).as("dup_ratio"))
  }

  /** Maximal duplicated-span ranges (doc_id, island, s, e) from the
    * window table — the shared core of [[duplicateSpans]] (reporting)
    * and [[duplicateSpanRemove]] (applying). Windows are fixed-length
    * k at ascending pos, so the cumulative max end is lag(pos)+k-1 and
    * a new span starts exactly when the current window clears it
    * (pos > lag(pos)+k would leave a gap of uncovered tokens;
    * pos = lag(pos)+k is adjacent = same coverage run). First row per
    * doc: lag is null -> sentinel -1 -> new span. Both windows are
    * PARTITIONED by doc_id.
    */
  private def spanRanges(wins: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dup = wins.groupBy("g")
      .agg(count(lit(1)).as("occ")).filter(col("occ") >= 2)
    val marked = wins.join(dup.select("g"), "g")
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("flag",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(byPos) + k,
          lit(-1)), 1).otherwise(0))
      .withColumn("island",
        sum(col("flag")).over(byPos.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
  }

  /** The APPLY form of [[duplicateSpans]]: cut every maximal
    * duplicated span out of each document and emit the kept token
    * count plus an md5 of the cleaned text (the content identity a
    * downstream exact-dedup pass keys on) — the "remove duplicated
    * passages, keep the rest" step of Lee et al. 2022.
    *
    * Scale: identical exchanges to the detection operator plus one
    * answer-sized span-list aggregation (spans per doc, bounded by
    * doc length / k); the reconstruction is a HOF filter over the
    * token array against the doc's own span list — no explode, no
    * extra shuffle beyond the per-doc join.
    */
  def duplicateSpanRemove(d: DataFrame, k: Int = 15): DataFrame = {
    val base = d.select(
      col("doc_id"), TextOps.letterTokens(col("text")).as("toks"))
    val wins = windowTable(base, k)
    val spanList = spanRanges(wins, k)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("sp"))
    base.join(spanList, Seq("doc_id"), "left")
      .withColumn("spn",
        coalesce(col("sp"), array().cast("array<struct<s:int,e:int>>")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        filter(col("toks"), (_, i) =>
          !exists(col("spn"), r =>
            (i + 1) >= r.getField("s") && (i + 1) <= r.getField("e")))
          .as("kept"))
      .select(
        col("doc_id"), col("n_tokens"),
        size(col("kept")).cast("bigint").as("n_kept"),
        md5(concat_ws(" ", col("kept")).cast("binary")).as("kept_md5"))
  }

  val duplicateSpanRemoveSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |wins AS (
      |  SELECT doc_id,
      |    unnest([{'pos': i, 'g': md5(array_to_string(toks[i:i+14], ' '))}
      |            FOR i IN range(1, greatest(len(toks) - 13, 1))]) AS w
      |  FROM base),
      |wp AS (SELECT doc_id, w.pos AS pos, w.g AS g FROM wins),
      |dup AS (SELECT g FROM wp GROUP BY g HAVING count(*) >= 2),
      |m AS (SELECT doc_id, pos FROM wp JOIN dup USING (g)),
      |fl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(
      |        lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 15, -1)
      |      THEN 1 ELSE 0 END AS flag
      |  FROM m),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM fl),
      |sp AS (
      |  SELECT doc_id, island, min(pos) AS s, max(pos) + 14 AS e
      |  FROM isl GROUP BY 1, 2),
      |spl AS (SELECT doc_id, list({'s': s, 'e': e}) AS sp FROM sp GROUP BY 1),
      |cleaned AS (
      |  SELECT b.doc_id, b.toks,
      |    [b.toks[i] FOR i IN range(1, len(b.toks) + 1)
      |     IF len(list_filter(coalesce(l.sp, []),
      |           x -> i >= x.s AND i <= x.e)) = 0] AS kept
      |  FROM base b LEFT JOIN spl l USING (doc_id))
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(kept) AS BIGINT) AS n_kept,
      |  -- array_to_string([]) is NULL in DuckDB; Spark's concat_ws is ''
      |  md5(coalesce(array_to_string(kept, ' '), '')) AS kept_md5
      |FROM cleaned""".stripMargin

  val duplicateSpansSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |wins AS (
      |  SELECT doc_id,
      |    unnest([{'pos': i, 'g': md5(array_to_string(toks[i:i+14], ' '))}
      |            FOR i IN range(1, greatest(len(toks) - 13, 1))]) AS w
      |  FROM base),
      |wp AS (SELECT doc_id, w.pos AS pos, w.g AS g FROM wins),
      |dup AS (SELECT g FROM wp GROUP BY g HAVING count(*) >= 2),
      |m AS (SELECT doc_id, pos FROM wp JOIN dup USING (g)),
      |fl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(
      |        lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 15, -1)
      |      THEN 1 ELSE 0 END AS flag
      |  FROM m),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM fl),
      |sp AS (
      |  SELECT doc_id, island, max(pos) + 15 - min(pos) AS span_len
      |  FROM isl GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_spans, sum(span_len) AS dup_tokens
      |  FROM sp GROUP BY 1)
      |SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
      |  CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
      |  round(CASE WHEN len(b.toks) = 0 THEN 0
      |    ELSE coalesce(a.dup_tokens, 0)::DOUBLE / len(b.toks) END, 4)
      |    AS dup_ratio
      |FROM base b LEFT JOIN agg a USING (doc_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_substring" -> ((s, d) => duplicateSpans(docs(s, d))),
    "q_dedup_substring_clean" -> ((s, d) => duplicateSpanRemove(docs(s, d))),
    "q_dedup_decontam" -> ((s, d) => decontaminate(
      docs(s, d).filter(col("doc_id") % 97 =!= 0),
      docs(s, d).filter(col("doc_id") % 97 === 0))),
    "q_dedup_contam_score" -> ((s, d) => contaminationScore(
      docs(s, d).filter(col("doc_id") % 97 =!= 0),
      docs(s, d).filter(col("doc_id") % 97 === 0))),
    "q_dedup_decontam_bloom" -> ((s, d) => decontaminateBloom(
      docs(s, d).filter(col("doc_id") % 97 =!= 0),
      docs(s, d).filter(col("doc_id") % 97 === 0))),
    "q_dedup_incremental" -> ((s, d) => incrementalNew(
      docs(s, d).filter(col("source") === "src0"),
      docs(s, d).filter(col("source") =!= "src0"))),
    "q_storage_timetravel" -> ((s, d) => timeTravelDiff(docs(s, d))),
    "q_dedup_diff" -> ((s, d) => snapshotDiff(
      docs(s, d).filter(col("doc_id") % 10 =!= 0),
      docs(s, d).filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))))),
    "q_dedup_exact" -> ((s, d) => exact(docs(s, d))),
    "q_dedup_nfc" -> ((s, d) => nfcDedup(docs(s, d))),
    "q_dedup_canonical" -> ((s, d) => canonical(docs(s, d))),
    "q_dedup_jaccard" -> ((s, d) => jaccardPairs(docs(s, d))),
    "q_dedup_containment" -> ((s, d) => containmentPairs(docs(s, d))),
    "q_dedup_clusters" -> ((s, d) => dupClusters(docs(s, d))),
    "q_dedup_cluster_hist" -> ((s, d) => dedupClusterHist(docs(s, d))),
    "q_dedup_soft_weights" -> ((s, d) => softDedupWeights(docs(s, d))),
    "q_pairs_contrastive" -> ((s, d) => contrastivePairs(docs(s, d))),
    "q_dedup_venn" -> ((s, d) => detectorVenn(docs(s, d))),
    "q_sketch_minhash_calib" -> ((s, d) => minhashCalibration(docs(s, d))),
    "q_sketch_simhash_calib" -> ((s, d) => simhashCalibration(docs(s, d))),
    "q_dedup_survivors" -> ((s, d) => dedupSurvivors(docs(s, d))),
    "q_dedup_survivors_best" -> ((s, d) => dedupSurvivorsBest(docs(s, d))),
    "q_dedup_edit" -> ((s, d) => editVerifiedPairs(docs(s, d))),
    "q_dedup_shingle" -> ((s, d) => jaccardShinglePairs(docs(s, d))),
    "q_dedup_prefix" -> ((s, d) => prefixDups(docs(s, d))),
    "q_dedup_embedding" -> ((s, d) =>
      embeddingPairsInt8(graft.core.Tables.load(s, d, "embeddings"))),
    "q_dedup_minhash" -> ((s, d) => minhashPairsExact(docs(s, d))),
    "q_dedup_lsh_quality" -> ((s, d) => lshQuality(docs(s, d))),
    "q_dedup_simhash" -> ((s, d) => simhashPairsExact(docs(s, d))))

  /** minhash and simhash are oracle-checked via their md5 hash
    * families ([[minhashPairsExact]], [[simhashPairsExact]]), embedding
    * near-dup via the int8 machinery ([[embeddingPairsInt8]]); the
    * xxhash64 / float-LSH kernel paths keep their spec ground truth.
    */
  val oracleSql: Map[String, String] = Map(
    "q_dedup_embedding" -> embeddingPairsInt8Sql,
    "q_dedup_lsh_quality" -> lshQualitySql,
    "q_dedup_minhash" -> minhashPairsExactSql,
    "q_dedup_simhash" -> simhashPairsExactSql,
    "q_dedup_substring" -> duplicateSpansSql,
    "q_dedup_substring_clean" -> duplicateSpanRemoveSql,
    "q_dedup_decontam" -> decontaminateSql,
    "q_dedup_contam_score" -> contaminationScoreSql,
    // bloom prefilter is result-transparent: same oracle as decontam
    "q_dedup_decontam_bloom" -> decontaminateSql,
    "q_dedup_incremental" -> incrementalNewSql,
    "q_storage_timetravel" -> timeTravelDiffSql,
    "q_dedup_diff" -> snapshotDiffSql,
    "q_dedup_exact" -> exactSql,
    "q_dedup_nfc" -> nfcDedupSql,
    "q_dedup_canonical" -> canonicalSql,
    "q_dedup_jaccard" -> jaccardPairsSql,
    "q_dedup_containment" -> containmentPairsSql,
    "q_dedup_clusters" -> dupClustersSql,
    "q_dedup_cluster_hist" -> dedupClusterHistSql,
    "q_dedup_soft_weights" -> softDedupWeightsSql,
    "q_pairs_contrastive" -> contrastivePairsSql,
    "q_dedup_venn" -> detectorVennSql,
    "q_sketch_minhash_calib" -> minhashCalibrationSql,
    "q_sketch_simhash_calib" -> simhashCalibrationSql,
    "q_dedup_survivors" -> dedupSurvivorsSql,
    "q_dedup_survivors_best" -> dedupSurvivorsBestSql,
    "q_dedup_edit" -> editVerifiedPairsSql,
    "q_dedup_shingle" -> jaccardShinglePairsSql,
    "q_dedup_prefix" -> prefixDupsSql)
}
