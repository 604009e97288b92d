package graft.streaming

import graft.core.Barrier.BarrierOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming mirrors of the document-pipeline operators — continuous
  * ingestion shapes of the batch ops in [[graft.llm.Dedup]].
  */
object DocStreams {

  /** Streaming benchmark decontamination: the continuous-ingestion
    * mirror of [[graft.llm.Dedup.decontaminate]]. The incoming document
    * stream is shingled map-side (same single-pass hash kernel), joined
    * STREAM-STATIC against the reference set's distinct shingle hashes
    * — a stateless per-micro-batch join, no stream state — and
    * aggregated per doc_id.
    *
    * State contract, stated honestly: the per-doc hit-count
    * aggregation keeps ONE state entry per doc_id, and Spark can only
    * evict aggregation state whose grouping key carries an event-time
    * window — doc_id does not, so over an unbounded stream this form's
    * state grows with the number of distinct documents seen. It is the
    * right shape for bounded replays (tests, backfills). For the
    * unbounded 100 TB ingest, run the BATCH operator inside
    * foreachBatch instead: each doc_id arrives within one micro-batch,
    * so per-batch decontamination needs NO cross-batch state at all —
    * the same pattern as the CDC upsert loop in StatefulStreamingSpec.
    *
    * The reference side is static, materialized once (an eager
    * localCheckpoint — a per-trigger recompute would re-run the scan +
    * shingle explode + shuffle-distinct on every micro-batch; NOT
    * `cache()`, which would pin a CacheManager entry for the session
    * per call with no handle to unpersist — checkpoint blocks are
    * reclaimed by the ContextCleaner once the returned stream and its
    * plan are unreachable), and broadcast — the same asymmetry
    * contract as the batch operator: eval suites are small, the
    * stream is the 100 TB side.
    */
  def decontaminate(
      docsStream: DataFrame, reference: DataFrame, n: Int = 3,
      minHits: Int = 2): DataFrame = {
    import graft.functions.text.hashed_sorted_shingles
    val refSh = reference
      .select(explode(hashed_sorted_shingles(col("text"), n)).as("g"))
      .distinct().barrier()
    docsStream
      .select(col("doc_id"),
        explode(hashed_sorted_shingles(col("text"), n)).as("g"))
      .join(broadcast(refSh), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Streaming near-duplicate check against a standing int8 ANN index:
    * incoming vectors are checked for eps-similar neighbors in the
    * corpus as they arrive — the continuous-ingestion mirror of
    * [[graft.llm.Similarity.semDedupInt8]]'s pair-finding half, built
    * on the SAME machinery the batch serving path uses
    * ([[graft.llm.Similarity.ivfProbeSide]] + the
    * [[graft.llm.Similarity.ivfIndexInt8]] artifact).
    *
    * Emits one row per (incoming vector, eps-similar corpus neighbor):
    * (query_id, dup_of, sim). Fully STATELESS streaming — the query
    * side is map-only (quantize + kernel probe + explode) and the join
    * is stream-static against the prebuilt index, so Append mode works
    * with no watermark and no cross-batch state; dedup DECISIONS
    * (drop/keep, cluster assignment) compose downstream exactly as in
    * the batch pipeline. At 100 TB the index side is the
    * cell-partitioned build-once artifact; per-trigger cost is the
    * micro-batch's |rows| x nProbe probe rows — the serving economics
    * measured in `ScaleProbe serve`.
    *
    * StreamingSpec asserts stream output == the batch spelling of the
    * same join, and that every planted exact duplicate is flagged.
    */
  def nearDupMatches(
      vecStream: DataFrame, index: DataFrame,
      cents: Array[Array[Long]],
      epsDot: Long = graft.llm.Similarity.SemDupDotThreshold,
      nProbe: Int = 2): DataFrame =
    graft.llm.Similarity.ivfProbeSide(vecStream, cents, nProbe).as("a")
      .join(index.as("b"),
        col("a.probe") === col("b.cell") &&
          col("a.query_id") =!= col("b.vec_id"))
      .select(col("a.query_id"),
        col("b.vec_id").as("dup_of"),
        graft.functions.vector.byte_dot_product(col("a.qb"), col("b.qb"))
          .as("sim"))
      .filter(col("sim") >= epsDot)
      // no distinct needed (and none allowed — it would be stateful in
      // streaming): the probed cells are distinct by construction and
      // each index vector lives in exactly ONE cell, so a (query,
      // neighbor) pair can match at most once

  /** Streaming quality classification: the continuous-ingestion mirror
    * of [[graft.llm.TextOps.classifierScore]]. The scorer is a pure
    * per-row HOF fold (no state, no shuffle), so the streaming form is
    * the IDENTICAL expression applied to an unbounded source — the
    * no-op case of stream/batch unification, and exactly why the batch
    * operator was built map-only: stateless map operators stream for
    * free in Append mode with no watermark.
    */
  def classify(docsStream: DataFrame): DataFrame =
    graft.llm.TextOps.classifierScore(docsStream)

  /** A token routed to its sketch shard (shard = hash(tok) mod
    * nShards, so every occurrence of a token lands in ONE shard and
    * the per-shard Misra-Gries bound applies to its full count).
    */
  case class ShardTok(shard: Int, tok: String)

  /** One shard's sketch snapshot after a batch: `lower` is the MG
    * count (true count minus at most n_shard/(capacity+1)), `n_shard`
    * the shard's total tokens so far — together they let a consumer
    * apply the frequent-items threshold without a second pass.
    */
  case class MGSnapshot(shard: Int, tok: String, lower: Long, n_shard: Long)

  /** Per-shard sketch state: MG entries + the shard's token count.
    * Public: Spark's state-store encoder codegen constructs it. */
  case class MGFreqState(items: Map[String, Long], n: Long)

  /** Streaming frequent-terms candidates: the continuous-ingestion
    * mirror of [[graft.llm.CorpusOps.freqTerms]]'s pass 1. Tokens are
    * sharded BY TOKEN HASH and each shard folds them into a
    * Misra-Gries summary held in `flatMapGroupsWithState` state —
    * bounded at `capacity` entries per shard, regardless of stream
    * length. After every batch the shard re-emits its snapshot
    * (Update mode); any token whose global count so far is STRICTLY
    * greater than n_shard/(capacity+1) is guaranteed present (its
    * count lives entirely in its own shard, so the batch-MG survival
    * argument applies verbatim — at exact equality a boundary token
    * can be evicted, the same strictness [[graft.llm.CorpusOps]]
    * documents), so the snapshot union is a superset of the
    * true frequent set at every point in the stream — candidates for
    * the same exact recount the batch operator runs.
    *
    * Tokenize + shard with
    * `explode(letterTokens(text))` / `pmod(hash(tok), nShards)`
    * map-side; the only shuffle is the state-store hash exchange on
    * shard — nShards keys, not vocabulary keys.
    */
  def freqTermCandidates(
      toks: org.apache.spark.sql.Dataset[ShardTok],
      capacity: Int = 128): org.apache.spark.sql.Dataset[MGSnapshot] = {
    import toks.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    toks.groupByKey(_.shard)
      .flatMapGroupsWithState[MGFreqState, MGSnapshot](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard, rows, state) =>
          val prev = state.getOption.getOrElse(MGFreqState(Map.empty, 0L))
          val acc = new java.util.HashMap[String, Long](capacity * 2)
          prev.items.foreach { case (k, v) => acc.put(k, v) }
          var n = prev.n
          rows.foreach { r =>
            n += 1; graft.llm.CorpusOps.mgAdd(acc, r.tok, capacity)
          }
          val items = Map.newBuilder[String, Long]
          acc.forEach((k, v) => items += ((k, v)))
          state.update(MGFreqState(items.result(), n))
          val nFinal = n
          import scala.jdk.CollectionConverters._
          acc.entrySet().asScala.toVector.iterator.map(e =>
            MGSnapshot(shard, e.getKey, e.getValue, nFinal))
      }
  }

  /** Streaming per-source distinct-document sketch: the incremental
    * mirror of [[graft.llm.CorpusOps.hllMergeBySource]]'s per-source
    * rows. Per-key state IS the 256-register array (1 KB per source —
    * the constant-size-state property is exactly why HLL is the
    * streaming distinct shape); each micro-batch folds its rows in by
    * per-bucket max and emits the source's refreshed (estimate, s).
    * The arithmetic is [[graft.ops.Hll.estimateScala]] — the same
    * integer-denominator math as the batch operator, so after a full
    * replay the final emission per source equals the batch sketch row
    * bit-for-bit (asserted in StatefulStreamingSpec).
    *
    * Scale: hash/bucket/rho are map-side; the only shuffle is the
    * state-store exchange on source, and state size is
    * |sources| x 1 KB regardless of corpus size.
    */
  def hllBySource(docsStream: DataFrame): DataFrame = {
    import graft.ops.Hll
    val spark = docsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    docsStream
      .select(col("source"), Hll.h60(col("text")).as("h"))
      .select(col("source"), Hll.bucket(col("h")).cast("int").as("bucket"),
        Hll.rho(col("h")).cast("int").as("rho"))
      .as[(String, Int, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Int], (String, Double, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source, rows, state) =>
          val regs = state.getOption.getOrElse(new Array[Int](Hll.M))
          rows.foreach { case (_, b, r) => if (r > regs(b)) regs(b) = r }
          state.update(regs)
          val (est, s) = Hll.estimateScala(regs)
          Iterator((source, est, s))
      }
      .toDF("source", "hll_docs", "s")
  }

  /** Streaming Count-Min Sketch with a term watchlist: the online face
    * of [[graft.llm.CorpusOps.cmsFreqPanel]]. Per-source state is the
    * flat depth x width cell array (32 KB — constant in corpus size,
    * the same bounded-state story as [[hllBySource]]'s 1 KB register
    * array); every micro-batch folds its tokens in by simple addition
    * (CMS is linear, so arrival order and batching cannot change the
    * final state) and re-prices the watchlist: one
    * (source, term, n_cms) row per watch term per refresh.
    *
    * This is the "price any ad-hoc term without re-scanning" serving
    * shape: the ingest pipeline keeps the sketch warm at the door, and
    * a dashboard reads current frequency estimates for its watch terms
    * from the latest emission — no corpus scan, no vocabulary state.
    * Estimates carry the CMS one-sided error (never undercount).
    */
  def cmsWatch(docsStream: DataFrame, watch: Seq[String]): DataFrame = {
    import graft.llm.{CorpusOps, TextOps}
    import CorpusOps.{CmsDepth, CmsWidth}
    val spark = docsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // (term -> bucket per row) for the driver-sized watchlist, computed
    // once with the byte-identical JVM mirror of the cell hash
    val probes: Map[String, Array[Int]] = watch.map(t =>
      t -> Array.tabulate(CmsDepth)(j => CorpusOps.cmsBucketScala(j, t))).toMap
    val perTok = array((0 until CmsDepth).map(j =>
      struct(lit(j).as("j"),
        pmod(graft.ops.Hll.h60(concat(lit(s"cms$j:"), col("t"))),
          lit(CmsWidth)).cast("int").as("bucket"))): _*)
    docsStream
      .select(col("source"), explode(TextOps.wsTokens(col("text"))).as("t"))
      .select(col("source"), explode(perTok).as("cell"))
      .select(col("source"), col("cell.j"), col("cell.bucket"))
      .as[(String, Int, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (String, String, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source, rows, state) =>
          val cells = state.getOption
            .getOrElse(new Array[Long](CmsDepth * CmsWidth))
          rows.foreach { case (_, j, b) => cells(j * CmsWidth + b) += 1L }
          state.update(cells)
          watch.iterator.map { t =>
            val est = probes(t).zipWithIndex
              .map { case (b, j) => cells(j * CmsWidth + b) }.min
            (source, t, est)
          }
      }
      .toDF("source", "t", "n_cms")
  }

  /** Streaming per-source Count-Min sketch FEED: where [[cmsWatch]]
    * re-prices a fixed watchlist, this emits the source's refreshed
    * sketch itself — every nonzero (j, bucket, n_cms) cell — so a
    * downstream consumer can price ANY term later, merge sketches
    * across sources (CMS is linear: cells add), or hand the cell
    * table to the batch panel's machinery. Stream-flush == batch
    * closure: after a full replay the final emission per source
    * equals [[graft.llm.CorpusOps.cmsCells]] over that source's
    * tokens BIT-FOR-BIT (same h60-based cell hash, same simple
    * addition; asserted in StatefulStreamingSpec) — the same
    * sketch-level loop [[hllBySource]] closes for HLL registers.
    *
    * Scale: per-source state is the flat depth x width array (32 KB,
    * constant in corpus size); an emission is at most depth x width
    * rows — sketch-sized, never vocabulary-sized. The only shuffle is
    * the state-store exchange on source.
    */
  def cmsBySource(docsStream: DataFrame): DataFrame = {
    import graft.llm.{CorpusOps, TextOps}
    import CorpusOps.{CmsDepth, CmsWidth}
    val spark = docsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val perTok = array((0 until CmsDepth).map(j =>
      struct(lit(j).as("j"),
        pmod(graft.ops.Hll.h60(concat(lit(s"cms$j:"), col("t"))),
          lit(CmsWidth)).cast("int").as("bucket"))): _*)
    docsStream
      .select(col("source"), explode(TextOps.wsTokens(col("text"))).as("t"))
      .select(col("source"), explode(perTok).as("cell"))
      .select(col("source"), col("cell.j"), col("cell.bucket"))
      .as[(String, Int, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (String, Int, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source, rows, state) =>
          val cells = state.getOption
            .getOrElse(new Array[Long](CmsDepth * CmsWidth))
          rows.foreach { case (_, j, b) => cells(j * CmsWidth + b) += 1L }
          state.update(cells)
          (0 until CmsDepth * CmsWidth).iterator
            .filter(i => cells(i) != 0L)
            .map(i => (source, i / CmsWidth, (i % CmsWidth).toLong, cells(i)))
      }
      .toDF("source", "j", "bucket", "n_cms")
  }

  /** Streaming per-source running-median FEED: the continuous-
    * ingestion mirror of [[graft.llm.CorpusOps.quantileSketch]]'s
    * sketch half. Per-source state is the log2-bucket length
    * histogram (≤64 counters — constant in stream length, additive
    * across sources/shards like CMS cells); each micro-batch re-emits
    * the source's refreshed (n_docs, median bucket, bracket), so a
    * dashboard always has the current length median without any
    * re-scan. Stream-flush == batch closure: after a full replay the
    * final emission per source equals the batch panel's sketch
    * columns exactly (asserted in StatefulStreamingSpec) — an exact
    * streaming median would need the full value multiset as state;
    * the 2x bracket is precisely what the histogram can promise, and
    * it is the SAME promise the batch panel makes.
    *
    * Scale: state 64 longs per source; emission one row per source
    * per micro-batch; the only shuffle is the state-store exchange.
    */
  def quantileBySource(docsStream: DataFrame): DataFrame = {
    val spark = docsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    docsStream
      .select(col("source"),
        when(col("n_chars") === 0, lit(0L))
          .otherwise(length(bin(col("n_chars"))).cast("bigint")).as("b"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long],
        (String, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source, rows, state) =>
          val h = state.getOption.getOrElse(new Array[Long](64))
          rows.foreach { case (_, b) => h(b.toInt) += 1L }
          state.update(h)
          val n = h.sum
          // lower median, rank (n+1) DIV 2 — the batch panel's rule
          val target = (n + 1) / 2
          var cum = 0L
          var p50 = 0
          var found = false
          var i = 0
          while (i < h.length && !found) {
            cum += h(i)
            if (cum >= target) { p50 = i; found = true }
            i += 1
          }
          val lo = if (p50 == 0) 0L else 1L << (p50 - 1)
          val hi = if (p50 == 0) 0L else (1L << p50) - 1
          Iterator.single((source, n, p50.toLong, lo, hi))
      }
      .toDF("source", "n_docs", "p50_bucket", "bucket_lo", "bucket_hi")
  }

  /** Streaming embedding-drift MONITOR: PSI of the ARRIVING embedding
    * population against a STATIC baseline snapshot — the alert wire
    * for "the data feeding this model no longer looks like what it
    * was trained on". The dominant-component axis and the baseline's
    * bucket histogram are computed ONCE from the baseline (driver-
    * side, both model-sized) and shipped into the stream as literals/
    * closure state; each arriving vector then costs one map-side
    * int8 dot + octave bucket. Global state is the current cohort's
    * bucket histogram (~26 counters — the statistic is inherently
    * corpus-global, so the stateful operator is single-keyed; all the
    * per-vector work stays parallel in the codegen'd projection).
    * Every refresh re-emits (n_seen, psi) with the batch panel's
    * exact formula (add-one smoothing over the union of observed
    * buckets). The one honest difference from the batch panel,
    * documented: the monitor trains the axis on the BASELINE ONLY
    * (a live monitor cannot train on data it has not seen — training
    * on the union would leak the future), while q_embed_drift's
    * within-corpus cohort split trains on the union; the spec
    * therefore asserts replay == an independent in-memory PSI over
    * the baseline-trained axis, the holtFeed convention.
    */
  def driftFeed(
      embBaseline: DataFrame, embStream: DataFrame): DataFrame = {
    val spark = embStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val v1s = graft.llm.Similarity.pc1SignedMicro(embBaseline)
    // Baseline histogram computed CLUSTER-SIDE: per-vector scores are
    // bucketed with the same SQL octave spelling as the batch panel
    // (documented bit-equal to Similarity.driftBucket) and aggregated
    // before collect — only the ~26-row histogram reaches the driver,
    // never a corpus of scores, so the "model-sized driver work" claim
    // holds at any baseline size.
    val baseHist: Map[Long, Long] =
      graft.llm.Similarity.withUnitQuantized(embBaseline)
        .select(aggregate(
          zip_with(col("qn"), array(v1s.map(lit): _*), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("score"))
        .select(expr("CASE WHEN score = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST(sign(score) AS BIGINT) " +
          "* length(bin(abs(score) DIV 1000000 + 1)) END").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nBase = baseHist.values.sum
    graft.llm.Similarity.withUnitQuantized(embStream)
      .select(aggregate(
        zip_with(col("qn"), array(v1s.map(lit): _*), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as("score"))
      .as[Long]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Array[Long], (Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state) =>
          // state: flat [bucket, count, ...] pairs of the current
          // cohort's histogram
          val prev = state.getOption.getOrElse(Array.empty[Long])
          val hist = scala.collection.mutable.Map.empty[Long, Long]
          var i = 0
          while (i < prev.length) {
            hist(prev(i)) = prev(i + 1); i += 2
          }
          rows.foreach { s =>
            val b = graft.llm.Similarity.driftBucket(s)
            hist(b) = hist.getOrElse(b, 0L) + 1L
          }
          state.update(hist.iterator
            .flatMap { case (b, c) => Iterator(b, c) }.toArray)
          val nCur = hist.valuesIterator.sum
          // the batch panel's exact formula, summed in bucket order
          val buckets = (baseHist.keySet ++ hist.keySet).toSeq.sorted
          val bCount = buckets.length
          val psi = buckets.iterator.map { b =>
            val p = (baseHist.getOrElse(b, 0L) + 1).toDouble /
              (nBase + bCount)
            val q = (hist.getOrElse(b, 0L) + 1).toDouble / (nCur + bCount)
            (p - q) * math.log(p / q)
          }.sum
          Iterator.single((nCur,
            java.math.BigDecimal.valueOf(psi)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
      }
      .toDF("n_seen", "psi")
  }

  /** Streaming per-label scatter-matrix FEED over an EMBEDDINGS
    * stream: the continuous-ingestion mirror of
    * [[graft.llm.Similarity.scatterByLabel]]. The per-label state is
    * the 4161-long scatter buffer itself — X'X outer products +
    * per-dim sums + count, folded by ADDITION per micro-batch (the
    * buffer is a linear sketch like CMS cells, so arrival order and
    * batching cannot change it) — and every refresh re-emits the
    * label's class-spread panel row computed by the SAME pure
    * function the batch panel uses. Batch == stream bit-for-bit
    * after a full replay (StatefulStreamingSpec): the second-moment
    * closure next to the HLL-register and CMS-cell feeds.
    *
    * Scale: 33 KB of state per label, constant in stream length; the
    * only shuffle is the state-store exchange on label; quantization
    * runs map-side in the codegen'd projection.
    */
  def scatterByLabelFeed(embStream: DataFrame): DataFrame = {
    val spark = embStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    graft.llm.Similarity.unitQuantizedLabeled(embStream)
      .as[(Int, Array[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long],
        (Long, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (label, rows, state) =>
          val agg = new graft.llm.Similarity.ScatterAgg
          var b = state.getOption.getOrElse(agg.zero)
          rows.foreach { case (_, qn) => b = agg.reduce(b, qn) }
          state.update(b)
          val (n, tr, dd, ratio) = graft.llm.Similarity.scatterPanelRow(b)
          Iterator.single((label.toLong, n, tr, dd, ratio))
      }
      .toDF("label", "n_vecs", "trace", "dominant_dim", "offdiag_permille")
  }

  /** Streaming deterministic-reservoir FEED: the continuous-ingestion
    * mirror of [[graft.llm.Sampling.samplePerGroup]]. Per-group state
    * is the current sample itself — the k (md5(text), doc_id) pairs
    * with the smallest hash order — which is a BOTTOM-K structure:
    * order-independent, mergeable, and closed under insertion, so the
    * final per-group emission after a full replay equals the batch
    * operator's keep set exactly (asserted in StatefulStreamingSpec).
    * This is the streaming form a training-data pipeline wants for
    * "keep a representative per-language probe set as data arrives":
    * the sample never depends on arrival order, and a re-ingested
    * duplicate lands on the same decision.
    *
    * Scale: state is k short strings per group (constant in stream
    * length); the only shuffle is the state-store exchange on the
    * group key. Each refresh re-emits the group's current k rows.
    */
  def samplePerGroupFeed(
      docsStream: DataFrame, groupCol: String = "lang",
      k: Int = 5): DataFrame = {
    val spark = docsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    docsStream
      .select(col(groupCol).as("g"),
        md5(col("text").cast("binary")).as("h"), col("doc_id"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[String], (String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g, rows, state) =>
          // state: "hash|doc_id" strings, kept sorted ascending — the
          // batch window's (md5(text), doc_id) total order verbatim
          var keep = state.getOption.getOrElse(Array.empty[String])
            .map { s =>
              val cut = s.lastIndexOf('|')
              (s.substring(0, cut), s.substring(cut + 1).toLong)
            }.toVector
          rows.foreach { case (_, h, id) =>
            keep = (keep :+ ((h, id))).distinct.sorted.take(k)
          }
          state.update(keep.map { case (h, id) => s"$h|$id" }.toArray)
          keep.iterator.zipWithIndex.map { case ((_, id), i) =>
            (g, id, (i + 1).toLong)
          }
      }
      .toDF(groupCol, "doc_id", "rn")
  }

  /** Streaming KLL-lite quantile FEED: the continuous-ingestion mirror
    * of [[graft.llm.CorpusOps.kllSketch]]'s sketch half. Per-source
    * state is the level sample itself — (value, tz) pairs with
    * tz >= the source's current level H = floor(log2(n/k)) — plus the
    * running count. Because the level predicate is a deterministic
    * per-item hash property and H only GROWS with n, arrivals below
    * the current level can be dropped at the door and the end-of-batch
    * re-filter keeps the state identical to what a batch pass over
    * everything-seen-so-far would keep: after a full replay the final
    * emission per source equals the batch panel's sketch columns
    * bit-for-bit (asserted in StatefulStreamingSpec). This is the
    * sketch-family closure the HLL/CMS/quantile-histogram feeds
    * already have — and unlike the log2-histogram feed, the promise
    * here is a rank ERROR BOUND, not a 2x value bracket.
    *
    * Scale: expected state 2k (value, tz) pairs + 1 counter per
    * source — constant in stream length; the only shuffle is the
    * state-store exchange on source. The estimator sort is over the
    * ~2k-item sample, per source per micro-batch.
    */
  def kllBySource(docsStream: DataFrame, k: Int = 64): DataFrame = {
    val spark = docsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    docsStream
      .select(col("source"), col("n_chars").cast("long").as("v"),
        graft.ops.Hll.h60(col("doc_id")).as("h"))
      .withColumn("tz",
        least(lit(60L), expr("CAST(bit_count((h & -h) - 1) AS BIGINT)")))
      .select(col("source"), col("v"), col("tz"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long],
        (String, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source, rows, state) =>
          // state: [n, v1, tz1, v2, tz2, ...] — the sample at level
          // kllLevel(n): a flat Long array, the histogram-feed idiom
          val prev = state.getOption.getOrElse(Array(0L))
          var n = prev(0)
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var i = 1
          while (i < prev.length) { buf += ((prev(i), prev(i + 1))); i += 2 }
          var lvl = graft.llm.CorpusOps.kllLevel(n, k)
          rows.foreach { case (_, v, tz) =>
            n += 1
            // insert-time filter at the CURRENT level is safe: the
            // level is monotone in n, so an item failing it now would
            // also fail every later re-filter
            if (tz >= lvl) buf += ((v, tz))
            lvl = graft.llm.CorpusOps.kllLevel(n, k)
          }
          val kept = buf.filter(_._2 >= lvl)
          state.update(
            (Array(n) ++ kept.iterator.flatMap(t => Iterator(t._1, t._2)))
              .toArray)
          if (kept.isEmpty) Iterator.empty
          else {
            // the batch panel's estimator: smallest sample value whose
            // weighted rank reaches the lower-median target, else max
            val wt = 1L << lvl
            val sorted = kept.map(_._1).sorted
            val target = (n + 1) / 2
            var est = sorted.last
            var idx = sorted.length - 1
            while (idx >= 0 && (idx + 1).toLong * wt >= target) {
              est = sorted(idx); idx -= 1
            }
            Iterator.single((source, n, lvl, kept.length.toLong, est))
          }
      }
      .toDF("source", "n_docs", "level_h", "sketch_size", "est_p50")
  }

  /** Streaming blocklist audit feed: the continuous-ingestion mirror
    * of [[graft.llm.Curation.blocklistAudit]]. The regex flags are
    * computed MAP-SIDE in the codegen'd projection (the stateful
    * operator only ever sees five small ints per doc); per-source
    * state is one fixed-size counter array, refreshed and re-emitted
    * per micro-batch — so a downstream consumer always has the
    * current per-source audit row, and after a full replay the final
    * emission per source equals the batch panel bit-for-bit
    * (asserted in StatefulStreamingSpec).
    *
    * Scale: state is 5 longs per source (constant in stream length);
    * the only shuffle is the state-store exchange on source. Counters
    * are additive, so sources can also be sharded (source, shard) and
    * merged downstream, the CMS-cell discipline.
    */
  def blocklistBySource(docsStream: DataFrame): DataFrame = {
    val spark = docsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val terms = graft.llm.Curation.BlocklistTerms
    val any = "\\b(" + terms.mkString("|") + ")\\b"
    val flag = (p: String) =>
      when(col("text").rlike(p), 1L).otherwise(0L)
    docsStream
      .select(col("source"), flag(any).as("f"),
        flag("\\b" + terms(0) + "\\b").as("f0"),
        flag("\\b" + terms(1) + "\\b").as("f1"),
        flag("\\b" + terms(2) + "\\b").as("f2"))
      .as[(String, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long],
        (String, Long, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source, rows, state) =>
          val c = state.getOption.getOrElse(new Array[Long](5))
          rows.foreach { case (_, f, f0, f1, f2) =>
            c(0) += 1L; c(1) += f; c(2) += f0; c(3) += f1; c(4) += f2
          }
          state.update(c)
          Iterator.single((source, c(0), c(1), c(2), c(3), c(4)))
      }
      .toDF("source", "n_docs", "n_flagged", "n_slow", "n_crash", "n_skew")
  }

  /** Streaming CLASSIFIER-SCORE monitor — closes the round-13 training
    * loop the way the sketches closed theirs: every arriving doc is
    * scored map-side with the FROZEN trained 64-bucket weights
    * (shipped as an array literal from
    * [[graft.llm.Curation.trainedWeights]] — the driftFeed convention:
    * a live scorer serves the model it was given, it cannot train on
    * data it has not seen), and the calibration panel (per
    * predicted-permille decile: n_docs, mean predicted permille,
    * teacher empirical keep rate, |gap|) is re-emitted on every
    * refresh — the wire that says "the scorer is drifting off its
    * teacher on arriving data" before anyone re-trains.
    *
    * Per-doc work is one codegen'd map-side pass: z = Σ_tokens
    * w[bucket(tok)] — identically Σ_b c_b·w_b, the batch spelling —
    * and the teacher's raw score via the same token walk; the hard
    * sigmoid/clamp is the batch expression verbatim. The stateful
    * operator is keyed by DECILE: <= 10 groups, each holding three
    * counters (n, Σp, Σy) — constant in stream length; all per-doc
    * work stays parallel upstream of the 10-key shuffle. int64
    * bounds: |z| <= maxTokPerDoc·max|w| (~4e11, the
    * classifierTrainCore note); Σp <= 1000·n. Final emission after a
    * full replay == batch [[graft.llm.Curation.classifierCalibration]]
    * bit-for-bit when `weights` was trained on the same corpus
    * (StatefulStreamingSpec asserts it).
    */
  def classifierScoreFeed(
      docsStream: DataFrame, weights: Array[Long],
      scale: Long = 1000000L): DataFrame = {
    val spark = docsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(weights.length == 64, "64-bucket hashed model")
    val wLit = array(weights.map(lit): _*)
    // null-safe: the batch panel's left-join scores a featureless doc
    // as z=0 -> p=500, y=0; a null text must land on the same row, not
    // null-poison the typed pipeline (encoder NPE on the decile key)
    val toks = graft.llm.TextOps.letterTokens(
      lower(coalesce(col("text"), lit(""))))
    val bucket = (t: org.apache.spark.sql.Column) =>
      graft.llm.Curation.classifierBucket(t)
    val z = aggregate(
      transform(toks, t => element_at(wLit, bucket(t).cast("int") + 1)),
      lit(0L), (acc, x) => acc + x)
    val teacherRaw = aggregate(
      transform(toks, t => pmod(bucket(t) * 2654435761L, lit(1001L)) - 500L),
      lit(0L), (acc, x) => acc + x)
    docsStream
      .select(z.as("z"), teacherRaw.as("raw"))
      .select(
        expr(s"least(CAST(1000 AS BIGINT), greatest(CAST(0 AS BIGINT), " +
          s"500 + (250 * z) DIV $scale))").as("p"),
        when(col("raw") > 0, 1L).otherwise(0L).as("y"))
      .select(expr("least(CAST(9 AS BIGINT), p DIV 100)").as("decile"),
        col("p"), col("y"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (Long, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (decile, rows, state) =>
          // state: (n_docs, Σ p_permille, Σ teacher_keep)
          val c = state.getOption.getOrElse(new Array[Long](3))
          rows.foreach { case (_, p, y) =>
            c(0) += 1L; c(1) += p; c(2) += y
          }
          state.update(c)
          // the batch panel's exact integer formulas (all non-negative,
          // so Scala / == Spark DIV here)
          val mean = c(1) / c(0)
          val keep = (1000L * c(2)) / c(0)
          Iterator.single((decile, c(0), mean, keep, math.abs(mean - keep)))
      }
      .toDF("bucket", "n_docs", "mean_pred_permille",
        "teacher_keep_permille", "calib_gap")
  }

  /** Streaming exact dedup-on-arrival: the continuous-ingestion mirror
    * of [[graft.llm.Dedup.exact]]'s keep-one-survivor rule. Keyed by
    * the 16-byte content hash; per-key state is one boolean, so a
    * duplicate arriving in ANY later micro-batch is suppressed without
    * re-reading the corpus — the shape an ingest pipeline wants
    * (dedup at the door, not in a nightly batch). Within a single
    * micro-batch the min doc_id wins, so replaying the whole corpus in
    * one AvailableNow batch emits exactly the batch operator's
    * keep set — the spec's equality.
    *
    * State contract, stated honestly (same as [[decontaminate]]):
    * one boolean per DISTINCT content ever seen — bounded by corpus
    * distinct count, not stream length, but still unbounded over an
    * infinite stream. The production knob is a state TTL
    * (ProcessingTimeTimeout) at the dedup horizon the pipeline
    * guarantees, or per-epoch state resets; the first-wins rule is
    * unchanged by either.
    */
  def dedupOnArrival(docsStream: DataFrame): DataFrame = {
    val spark = docsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    docsStream
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (h, rows, state) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator((h, rows.map(_._1).min))
          }
      }
      .toDF("text_hash", "keep_id")
  }
}
