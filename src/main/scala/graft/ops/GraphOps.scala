package graft.ops

import graft.core.Barrier.BarrierOps
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph operators for corpus-quality analysis. Web-scale curation
  * pipelines use link-graph centrality as a document quality signal
  * (host-level PageRank over the crawl graph, the C4/RefinedWeb-era
  * recipe); the engine provides the iterative machinery over any
  * weighted edge table.
  *
  * The driver query derives a REAL graph from the events table —
  * per-user consecutive-event transitions — and ranks its nodes. The
  * node set there is small; the operator is written for the
  * billion-node case: nothing is broadcast or collected except the
  * node COUNT (one scalar), and every iteration is two co-partitioned
  * joins plus one aggregation — the Pregel message-passing shape, same
  * discipline as [[graft.llm.Dedup.dupClusters]].
  */
object GraphOps {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Weighted directed edge table: consecutive-event transitions per
    * user (ordered by ts with event_id tie-break), weighted by count.
    * One window per user partition + one algebraic aggregation.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Distributed PageRank power iteration over weighted edges
    * (columns src, dst, w): rank = (1-d)/N + d * sum of in-coming
    * rank * w / out_w. Dangling mass (nodes with no out-edges) is
    * dropped, the standard simplification — ranks then sum to < 1 but
    * ordering is unaffected; the spec replays the same rule.
    *
    * Scale: the rank table is node-sized and stays DISTRIBUTED — the
    * per-iteration plan is rank-join-edges on src (co-partitioned),
    * contribution shuffle on dst, and a left join back to the node
    * set; lineage across iterations is bounded by localCheckpoint.
    * Only the node count crosses to the driver (one scalar). At a
    * billion nodes the edge join partitions on src exactly as here;
    * a supernode (hot dst) is an AQE skew case, and the aggregation
    * is algebraic so map-side combine absorbs most of it.
    */
  /** Eagerly drop a barrier's storage blocks (see
    * [[graft.core.Barrier.free]] for why plain `unpersist` can't).
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    graft.core.Barrier.free(df)

  /** Connected components by MIN-LABEL PROPAGATION with per-round
    * pointer jumping — the shared loop behind
    * [[graft.llm.Dedup.dupClusters]] (document dup clusters) and
    * [[EntityOps.goldenRecords]] (entity fusion), extracted so the
    * convergence/checkpointing subtleties live once.
    *
    * `edges` must be SYMMETRIC (both directions present); the caller
    * chooses its partitioning (dupClusters pre-partitions by the
    * per-round hot key so localCheckpoint preserves it). Returns
    * (id, label) where label = the component's minimum id.
    *
    * Per round: each node takes min(own, neighbors' labels)
    * (localCheckpointed BEFORE the pointer-jump self-join — nm feeds
    * it twice, and an unmaterialized plan re-runs the edge join per
    * consumer), then follows label -> label(label) once, roughly
    * halving the rounds a long chain needs (min labels are monotone
    * non-increasing within a component, so the fixpoint is unchanged).
    * `broadcastLabels` pins the |V|-sized label table's join side —
    * checkpointed RDDs report no stats, so AQE can't make the call.
    * Exiting via the cap would silently diverge from the recursive-CTE
    * oracles, so it fails loudly; with pointer jumping the reach is
    * ~2^maxIters.
    */
  private[graft] def minLabelPropagation(
      edges: DataFrame, maxIters: Int,
      broadcastLabels: Boolean): DataFrame = {
    def side(df: DataFrame): DataFrame =
      if (broadcastLabels) broadcast(df) else df
    // label chain rides the checkpoint-every-k RoundBarrier: on
    // local[*] this is exactly the old per-round localCheckpoint +
    // free-previous; in reliable mode only every k-th round writes
    // checkpoint files. nm is the round's SCRATCH frame (feeds the
    // pointer jump twice, dead within the round): Barrier.scratch
    // keeps it off the checkpoint-file path entirely in reliable mode
    // — together they cut the loop's reliable write volume from two
    // |V|-sized files per round to one every k rounds.
    val rb = new graft.core.RoundBarrier(edges.sparkSession)
    var labels = rb.next(edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // nm is NOT materialized (r18): its two consumers (the pointer
      // jump's probe and build sides) share one plan, and the only
      // expensive part — the neighbor-min aggregation's exchange — is
      // one shuffle that AQE stage reuse computes once; only the cheap
      // post-shuffle joins replay per consumer. The former per-round
      // scratch localCheckpoint bought that dedup by WRITING |V| rows
      // to the block store each round — a whole extra job at bench
      // scale, a block-store write at cluster scale. Lineage stays
      // bounded: rb.next checkpoints the round's OUTPUT either way.
      val nm = edges
        .join(side(labels.select(col("id").as("dst"), col("label").as("nl"))),
          "dst")
        .groupBy(col("src").as("id"))
        .agg(min("nl").as("nmin"))
        .join(side(labels), "id")
        .select(col("id"), col("label").as("old"),
          least(col("label"), col("nmin")).as("label"))
      // convergence count rides the round's own materialization as an
      // observed metric (CollectMetrics accumulator, read off the
      // executed plan synchronously) — no separate count job. If the
      // barrier's action path ever stops populating the metric, fall
      // back to a count over the just-persisted frame.
      val nextPre = nm.as("x")
        .join(side(nm.select(col("id").as("pid"), col("label").as("pl"))),
          col("x.label") === col("pid"), "left")
        .select(col("x.id").as("id"), col("x.old").as("old"),
          coalesce(col("pl"), col("x.label")).as("label"))
        .observe("mlp_changed", coalesce(sum(
          when(col("label") =!= col("old"), 1L).otherwise(0L)), lit(0L))
          .as("changed"))
      val next = rb.next(nextPre)
      val changed = nextPre.queryExecution.observedMetrics
        .get("mlp_changed").map(_.getLong(0)).getOrElse {
          // The fallback is CORRECT but re-pays a full count pass per
          // round — it only triggers if a barrier/config change stops
          // rb.next materializing this exact QueryExecution eagerly.
          // Log so that silent O(rounds) regression is visible.
          log.warn("minLabelPropagation: observed metric 'mlp_changed' " +
            "absent from the round's QueryExecution; paying a separate " +
            "count pass (check RoundBarrier eagerness / observe support)")
          next.filter(col("label") =!= col("old")).count()
        }
      labels = next.select("id", "label")
      converged = changed == 0
      i += 1
    }
    labels = rb.seal(labels)
    if (!converged) throw new IllegalStateException(
      s"minLabelPropagation: did not converge within $maxIters " +
        "rounds; raise maxIters (reach doubles per round)")
    labels
  }

  def pageRank(
      edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
      tol: Double = 1e-7): DataFrame = {
    // edges materialize ONCE: every iteration joins them, and an
    // unmaterialized lineage (e.g. the eventTransitions scan + window
    // + aggregation) would re-execute per round. outW is node-sized
    // and joined per round — same treatment. All three are ONE-SHOT
    // frames recomputable from the caller's edge plan, so they ride
    // Barrier.scratch: materialized once in every mode, but no
    // checkpoint-file write in reliable mode (only the rank CHAIN
    // needs durable snapshots — its recompute depth grows with the
    // round count; these stay depth-1 over a durable source).
    // pre-partition the loop-invariant edge snapshot by src ONCE (the
    // per-round join key; spread's explicit width survives AQE): each
    // round then joins rank (hash(node)) against edges (hash(src))
    // co-partitioned, and the only per-round exchange left is the
    // contribution shuffle on dst — without this, the |E|-sized edge
    // table re-shuffled EVERY round (r18 JobProf: one ~3.3 s-task-time
    // 20-task stage per iteration). outW inherits the layout for free
    // (groupBy(src) over a src-partitioned frame needs no exchange).
    val e = graft.core.Barrier.scratch(
      graft.core.Layout.spread(edges, "src"))
    val nodes = graft.core.Barrier.scratch(e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct())
    val outW = graft.core.Barrier.scratch(
      e.groupBy(col("src")).agg(sum("w").as("out_w")))
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge table")
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    // checkpoint-every-k chain barrier: on local[*] this is exactly the
    // old per-round localCheckpoint + free-previous; in reliable mode
    // it persists most rounds and writes checkpoint files every k-th,
    // cutting the measured 1.61x flat-reliable cost (BarrierProf)
    val rb = new graft.core.RoundBarrier(edges.sparkSession)
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val contribs = ranks
        .join(e, col("node") === col("src"))
        .join(outW, "src")
        .select(col("dst").as("node"),
          (col("rank") * col("w") / col("out_w")).as("c"))
        .groupBy("node").agg(sum("c").as("in_rank"))
      val next = rb.next(nodes
        .join(contribs, Seq("node"), "left")
        .join(ranks.select(col("node"), col("rank").as("prev")), Seq("node"))
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("in_rank"), lit(0.0))).as("rank"),
          col("prev")))
      // driver-sized convergence probe: one max-delta scalar per round
      // (the standard power-iteration stop; saves the tail rounds on
      // small-diameter graphs where min-label-style fixpoints arrive
      // early)
      val delta = next.agg(max(abs(col("rank") - col("prev")))).head()
        .getDouble(0)
      ranks = next.drop("prev")
      converged = delta < tol
      i += 1
    }
    // seal: the escaping frame becomes a barrier root in every mode
    // (identity on local[*] and when the last round checkpointed)
    ranks = rb.seal(ranks)
    // loop-only intermediates; after >= 1 iteration the result plan
    // reads only the final barrier (with iters = 0 the init plan
    // still derives from nodes, which must then stay alive)
    graft.core.Barrier.freeScratch(e); graft.core.Barrier.freeScratch(outW)
    if (i > 0) graft.core.Barrier.freeScratch(nodes)
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** ANSI-replayable PageRank: FIXED iteration count and SCALED-INTEGER
    * arithmetic, so a (non-recursive, unrolled) DuckDB CTE chain
    * replays every rank bit-exactly — float power iteration is not
    * oracle-checkable because float addition does not commute across
    * partitionings. Ranks live as `rank * scale` bigints; each
    * iteration is
    *   rank' = base + (dp * in_rank) DIV 1000,
    *   in_rank = sum over in-edges of (rank * w) DIV out_w,
    * with base = ((1000 - dp) * (scale DIV n)) DIV 1000 — every
    * division integer, every operand nonnegative, so Spark DIV and
    * DuckDB // agree exactly. Same distributed shape as [[pageRank]]
    * (two co-partitioned joins + one algebraic agg per round,
    * checkpoint-bounded lineage); `scale` caps rank*w at ~1e12 * max
    * edge weight — far from bigint overflow for any real corpus graph.
    * Truncation loses < n * iters / scale of total mass — ordering at
    * scale=1e12 is unaffected for any graph whose ranks differ by more
    * than 1e-9.
    */
  def pageRankScaled(
      edges: DataFrame, iters: Int = 10, dampingPermille: Int = 850,
      scale: Long = 1000000000000L): DataFrame = {
    // one-shot frames ride Barrier.scratch; the edge snapshot is
    // pre-partitioned by the per-round join key (see [[pageRank]])
    val e = graft.core.Barrier.scratch(
      graft.core.Layout.spread(edges, "src"))
    val nodes = graft.core.Barrier.scratch(e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct())
    val outW = graft.core.Barrier.scratch(
      e.groupBy(col("src")).agg(sum("w").as("out_w")))
    val n = nodes.count()
    require(n > 0, "pageRankScaled needs a non-empty edge table")
    val init = scale / n
    val base = ((1000L - dampingPermille) * init) / 1000L
    var ranks = nodes.withColumn("rank_scaled", lit(init))
    // every-k chain barrier (see [[pageRank]]): local mode unchanged,
    // reliable mode persists between checkpoints
    val rb = new graft.core.RoundBarrier(edges.sparkSession)
    var i = 0
    while (i < iters) {
      val contribs = ranks
        .join(e, col("node") === col("src"))
        .join(outW, "src")
        .select(col("dst").as("node"),
          expr("rank_scaled * w DIV out_w").as("c"))
        .groupBy("node").agg(sum("c").as("in_rank"))
      // EAGER rounds (one job per round, plan depth 1): the lazy
      // alternative — no job between checkpoints, the k-th round
      // computing the whole segment in one pass — measured SUPER-LINEAR
      // in k at production round counts (BarrierProf sweep, 20 iters:
      // lazy 14.8 s at the default k=4 and 32.6 s at k=16 vs eager
      // 8.7 / 9.0 s — a 2k-shuffle single-job plan pays AQE replanning
      // across the whole chain). Eager is flat in k.
      ranks = rb.next(nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampingPermille * coalesce(in_rank, CAST(0 AS BIGINT)))" +
              " DIV 1000")).as("rank_scaled")))
      i += 1
    }
    ranks = rb.seal(ranks)
    graft.core.Barrier.freeScratch(e); graft.core.Barrier.freeScratch(outW)
    if (iters > 0) graft.core.Barrier.freeScratch(nodes)
    ranks
  }

  /** DuckDB replay of [[pageRankScaled]] over the same
    * event-transition graph: the power iteration is UNROLLED into one
    * plain CTE per round (generated from the same iteration count and
    * constants the Spark side uses — recursive-CTE aggregation
    * restrictions never enter the picture).
    */
  def pageRankScaledSql(
      iters: Int = 10, dampingPermille: Int = 850,
      scale: Long = 1000000000000L, div: String = "//"): String = {
    val head =
      s"""WITH edges AS (
         |  SELECT src, dst, count(*) AS w FROM (
         |    SELECT event_type AS src,
         |      lead(event_type) OVER (
         |        PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |    FROM events)
         |  WHERE dst IS NOT NULL GROUP BY src, dst),
         |outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
         |nodes AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM edges
         |    UNION ALL SELECT dst FROM edges)),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |consts AS (
         |  SELECT $scale $div n AS init,
         |    ((1000 - $dampingPermille) * ($scale $div n)) $div 1000 AS base
         |  FROM nn),
         |r0 AS (
         |  SELECT node, (SELECT init FROM consts) AS rank_scaled
         |  FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |r$i AS (
         |  SELECT nodes.node,
         |    (SELECT base FROM consts)
         |      + ($dampingPermille * coalesce(c.in_rank, 0)) $div 1000
         |      AS rank_scaled
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node,
         |      sum((p.rank_scaled * e.w) $div o.out_w) AS in_rank
         |    FROM r${i - 1} p
         |    JOIN edges e ON p.node = e.src
         |    JOIN outw o ON e.src = o.src
         |    GROUP BY e.dst) c ON nodes.node = c.node)""".stripMargin
    }.mkString
    // DuckDB's sum() widens to HUGEINT — cast back so the driver
    // canonicalizes both sides as int64. (`div` parameterizes the
    // integer-division spelling: DuckDB `//` for the oracle, Spark
    // `DIV` for the SQL-catalog face — the rest of the text is the
    // dialect intersection.)
    s"$head$rounds\nSELECT node, CAST(rank_scaled AS BIGINT) AS rank_scaled FROM r$iters"
  }

  /** HITS hubs & authorities (Kleinberg) over weighted directed edges
    * (src, dst, w) — the OTHER classic link-centrality: where PageRank
    * scores a page by being pointed AT, HITS separates "points at good
    * things" (hub) from "is pointed at by good hubs" (authority). On
    * the event-transition graph that reads as "event types that feed
    * the funnel" vs "event types the funnel converges to". Fixed
    * iteration count, SCALED-INTEGER arithmetic with per-round MAX
    * normalization (the textbook L2 norm is not integer-replayable;
    * max-norm keeps the same fixpoint ordering and every operand
    * exact): a_v = Σ h_u·w then a ← a·scale DIV max(a), dually for h.
    * Sums in DECIMAL(38,0) (HUGEINT oracle-side), so raw·scale is
    * exact to ~10³⁸ — no silent wrap at any real degree; quotients are
    * ≤ scale and land back in BIGINT.
    *
    * Scale: identical discipline to [[pageRankScaled]] — per round two
    * co-partitioned edge joins + two algebraic aggregations, lineage
    * bounded by localCheckpoint with superseded snapshots freed; the
    * only driver/broadcast values are the two 1-row per-round maxima
    * (the PlanAudit-gated 1-row-stats pattern). Hub/authority tables
    * stay node-sized and distributed.
    */
  def hitsScaled(
      edges: DataFrame, iters: Int = 6,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, "hitsScaled needs at least one iteration")
    // HITS alternates join keys (hub pass joins on src, authority pass
    // on dst), so ONE edge layout cannot serve both. A dual
    // src-/dst-partitioned snapshot pair (the GraphX edge-replication
    // trade) was MEASURED OUT in r18: the two extra shuffle+checkpoint
    // materializations cost more than the per-round dst shuffles they
    // save at 6 iterations (3-pass A/B 2.37 -> 2.58 s); it re-enters
    // at round counts long enough to amortize two |E| materializations.
    val e = edges.barrier()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().barrier()
    def normalized(raw: DataFrame, out: String): DataFrame = nodes
      .join(raw, Seq("node"), "left")
      .crossJoin(broadcast(raw.agg(max("raw").as("m"))))
      .select(col("node"),
        coalesce(expr(s"CAST(raw * $scale DIV m AS BIGINT)"), lit(0L))
          .as(out))
      .barrier()
    var hubs = nodes.withColumn("h", lit(scale)).barrier()
    var auths: DataFrame = null
    var i = 0
    while (i < iters) {
      val aRaw = hubs.join(e, col("node") === col("src"))
        .select(col("dst").as("n2"),
          expr("CAST(h AS DECIMAL(38,0)) * w").as("c"))
        .groupBy(col("n2").as("node")).agg(sum("c").as("raw"))
      val a = normalized(aRaw, "a")
      val hRaw = a.join(e, col("node") === col("dst"))
        .select(col("src").as("n2"),
          expr("CAST(a AS DECIMAL(38,0)) * w").as("c"))
        .groupBy(col("n2").as("node")).agg(sum("c").as("raw"))
      val h = normalized(hRaw, "h")
      freeCheckpoint(hubs)
      if (auths != null) freeCheckpoint(auths)
      hubs = h; auths = a
      i += 1
    }
    val out = hubs.join(auths, Seq("node"))
      .select(col("node"), col("h").as("hub_scaled"),
        col("a").as("auth_scaled"))
    freeCheckpoint(e); freeCheckpoint(nodes)
    out
  }

  /** DuckDB replay of [[hitsScaled]] over the event-transition graph:
    * one (authority, hub) CTE pair per round, maxima as NULL-ignoring
    * unpartitioned window maxima (each CTE referenced once — see the
    * inline comment), HUGEINT where the Spark side uses DECIMAL(38,0).
    */
  def hitsScaledSql(
      iters: Int = 6, scale: Long = 1000000000L): String = {
    val head =
      s"""WITH edges AS (
         |  SELECT src, dst, count(*) AS w FROM (
         |    SELECT event_type AS src,
         |      lead(event_type) OVER (
         |        PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |    FROM events)
         |  WHERE dst IS NOT NULL GROUP BY src, dst),
         |nodes AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM edges
         |    UNION ALL SELECT dst FROM edges)),
         |h0 AS (SELECT node, CAST($scale AS BIGINT) AS h FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |ar$i AS (
         |  SELECT e.dst AS node, sum(CAST(p.h AS HUGEINT) * e.w) AS raw
         |  FROM h${i - 1} p JOIN edges e ON p.node = e.src
         |  GROUP BY e.dst),
         |a$i AS (
         |  -- max as a window over the joined rows (NULL-ignoring, so it
         |  -- equals max over ar$i): a scalar subquery would reference
         |  -- the CTE twice and DuckDB's inlining then grows the plan
         |  -- EXPONENTIALLY across rounds (observed as fd exhaustion)
         |  SELECT nodes.node,
         |    coalesce(CAST(r.raw * $scale // max(r.raw) OVER ()
         |      AS BIGINT), 0) AS a
         |  FROM nodes LEFT JOIN ar$i r ON nodes.node = r.node),
         |hr$i AS (
         |  SELECT e.src AS node, sum(CAST(p.a AS HUGEINT) * e.w) AS raw
         |  FROM a$i p JOIN edges e ON p.node = e.dst
         |  GROUP BY e.src),
         |h$i AS (
         |  SELECT nodes.node,
         |    coalesce(CAST(r.raw * $scale // max(r.raw) OVER ()
         |      AS BIGINT), 0) AS h
         |  FROM nodes LEFT JOIN hr$i r ON nodes.node = r.node)""".stripMargin
    }.mkString
    s"""$head$rounds
       |SELECT h.node, h.h AS hub_scaled, a.a AS auth_scaled
       |FROM h$iters h JOIN a$iters a ON h.node = a.node""".stripMargin
  }

  /** Holdout evaluation of mined association rules — the train/test
    * discipline applied to [[basketRules]]' model exactly as
    * q_text_trigram_lp applies it to the language model: DIRECTED
    * rules u→v mined from the training baskets (order keys % 7 != 0,
    * the decontamination split convention) with their train
    * confidence, then scored on the HELD-OUT baskets: of test baskets
    * containing u, how many also contain v (hit-rate permille) — the
    * number that tells a recommender whether train confidence
    * transfers or the rules memorized noise. Rules never applied to
    * their own training data; rules with zero test applications keep
    * a row (NULL hit-rate) rather than vanishing.
    *
    * Scale: rule mining at [[basketRules]]' documented shape over the
    * train slice; application is a rules-vs-test join co-partitioned
    * on the item key, hits an answer-sized (basket, item) left join;
    * output is rule-sized.
    */
  def basketRulesEval(
      lineitem: DataFrame, minSupport: Long = 3L): DataFrame = {
    val li = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .barrier()
    val train = li.filter(pmod(col("ok"), lit(7)) =!= 0)
    val test = li.filter(pmod(col("ok"), lit(7)) === 0)
    val pairs = train.as("a").join(train.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
    val items = train.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val rules = pairs
      .select(col("u"), col("v"), col("w"))
      .unionByName(pairs.select(col("v").as("u"), col("u").as("v"),
        col("w")))
      .join(items.select(col("pk").as("u"), col("n_item").as("n_u")), "u")
      .select(col("u"), col("v"), col("w").as("n_train"),
        expr("1000 * w DIV n_u").as("conf_train_permille"))
    val app = rules
      .join(test.select(col("ok"), col("pk").as("u")), "u")
      .join(test.select(col("ok"), col("pk").as("v"))
        .withColumn("hit", lit(1L)), Seq("ok", "v"), "left")
      .groupBy("u", "v")
      .agg(count(lit(1)).as("n_applicable"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
    rules.join(app, Seq("u", "v"), "left")
      .select(col("u"), col("v"), col("n_train"),
        col("conf_train_permille"),
        coalesce(col("n_applicable"), lit(0L)).as("n_applicable"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("1000 * coalesce(n_hits, CAST(0 AS BIGINT)) DIV " +
          "nullif(coalesce(n_applicable, CAST(0 AS BIGINT)), 0)")
          .as("hitrate_permille"))
  }

  val basketRulesEvalSql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |train AS (SELECT * FROM li WHERE ok % 7 <> 0),
      |test AS (SELECT * FROM li WHERE ok % 7 = 0),
      |pairs AS (
      |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
      |  FROM train a JOIN train b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |items AS (SELECT pk, count(*) AS n_item FROM train GROUP BY 1),
      |rules AS (
      |  SELECT d.u, d.v, d.w AS n_train,
      |    1000 * d.w // i.n_item AS conf_train_permille
      |  FROM (
      |    SELECT u, v, w FROM pairs
      |    UNION ALL SELECT v, u, w FROM pairs) d
      |  JOIN items i ON d.u = i.pk),
      |app AS (
      |  SELECT r.u, r.v, count(*) AS n_applicable,
      |    sum(CASE WHEN h.pk IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
      |  FROM rules r
      |  JOIN test t ON r.u = t.pk
      |  LEFT JOIN test h ON h.ok = t.ok AND h.pk = r.v
      |  GROUP BY 1, 2)
      |SELECT r.u, r.v, CAST(r.n_train AS BIGINT) AS n_train,
      |  CAST(r.conf_train_permille AS BIGINT) AS conf_train_permille,
      |  CAST(coalesce(a.n_applicable, 0) AS BIGINT) AS n_applicable,
      |  CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
      |  CAST(1000 * coalesce(a.n_hits, 0)
      |    // nullif(coalesce(a.n_applicable, 0), 0) AS BIGINT)
      |    AS hitrate_permille
      |FROM rules r LEFT JOIN app a ON r.u = a.u AND r.v = a.v""".stripMargin

  /** Personalized PageRank (seed-teleport): the random walk restarts
    * at the SEED instead of uniformly, so rank mass measures proximity
    * TO THE SEED — the "customers who bought this also orbit these"
    * recommender score, where [[pageRankScaled]] measures global
    * centrality. Seed is data-derived (the lowest node id in the
    * graph, as a 1-row broadcast — no literal in the query); init and
    * teleport mass live entirely on the seed; everything else is the
    * same exact-integer fixed-horizon iteration, so the oracle unrolls
    * identically. Nodes the walk never reaches keep rank 0 and are
    * dropped (answer stays reachable-set-sized).
    *
    * Scale: identical per-round shape to [[pageRankScaled]] — two
    * co-partitioned joins + one algebraic aggregate per round,
    * localCheckpoint-bounded lineage; the seed flag rides a 1-row
    * broadcast join.
    */
  def personalizedPageRankScaled(
      edges: DataFrame, iters: Int = 8, dampingPermille: Int = 850,
      scale: Long = 1000000000000L): DataFrame = {
    val e0 = edges.barrier()
    // symmetric edges pre-partitioned by src, the per-round join key
    // (see [[pageRank]]): outW and the rank join then find their
    // distribution satisfied and only the contribution shuffle remains
    val sym = graft.core.Layout.spread(
      e0.select(col("u").as("src"), col("v").as("dst"), col("w"))
        .unionByName(e0.select(col("v").as("src"), col("u").as("dst"),
          col("w"))), "src")
      .barrier()
    val nodes = sym.select(col("src").as("node")).distinct().barrier()
    val outW = sym.groupBy(col("src")).agg(sum("w").as("out_w"))
      .barrier()
    // the seed is ONE data-derived scalar (min node id): collect it
    // once instead of re-broadcasting a 1-row aggregate subplan in
    // every round's plan — same value, deterministic, and the teleport
    // term becomes a literal comparison (one fewer broadcast job per
    // round). An empty graph keeps the empty-result contract via the
    // always-false null comparison, exactly as the old
    // `node === seed(null)` join produced no teleport rows.
    val seedRow = nodes.agg(min("node")).head()
    val seedLit = if (seedRow.isNullAt(0)) lit(null).cast("bigint")
      else lit(seedRow.getLong(0))
    val base = ((1000L - dampingPermille) * scale) / 1000L
    var ranks = nodes
      .select(col("node"),
        when(col("node") === seedLit, lit(scale)).otherwise(lit(0L))
          .as("rank_scaled"))
    var i = 0
    while (i < iters) {
      val contribs = ranks
        .join(sym, col("node") === col("src"))
        .join(outW, "src")
        .select(col("dst").as("node"),
          expr("rank_scaled * w DIV out_w").as("c"))
        .groupBy("node").agg(sum("c").as("in_rank"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (when(col("node") === seedLit, lit(base)).otherwise(lit(0L)) +
            expr(s"($dampingPermille * coalesce(in_rank, CAST(0 AS BIGINT)))" +
              " DIV 1000")).as("rank_scaled"))
        .barrier()
      if (i > 0) freeCheckpoint(ranks)
      ranks = next
      i += 1
    }
    freeCheckpoint(e0); freeCheckpoint(sym); freeCheckpoint(outW)
    if (iters > 0) freeCheckpoint(nodes)
    ranks.filter(col("rank_scaled") > 0)
      .select(col("node").as("part_key"), col("rank_scaled"))
  }

  def personalizedPageRankSql(
      iters: Int = 8, dampingPermille: Int = 850,
      scale: Long = 1000000000000L): String = {
    val base = ((1000L - dampingPermille) * scale) / 1000L
    val head =
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |edges AS (
         |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |sym AS (
         |  SELECT u AS src, v AS dst, w FROM edges
         |  UNION ALL SELECT v, u, w FROM edges),
         |outw AS (SELECT src, sum(w) AS out_w FROM sym GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM sym),
         |sd AS (SELECT min(node) AS seed FROM nodes),
         |r0 AS (
         |  SELECT node, CASE WHEN node = (SELECT seed FROM sd)
         |    THEN $scale ELSE 0 END AS rank_scaled
         |  FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |r$i AS (
         |  SELECT nodes.node,
         |    (CASE WHEN nodes.node = (SELECT seed FROM sd)
         |       THEN $base ELSE 0 END)
         |      + ($dampingPermille * coalesce(c.in_rank, 0)) // 1000
         |      AS rank_scaled
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node,
         |      sum((p.rank_scaled * e.w) // o.out_w) AS in_rank
         |    FROM r${i - 1} p
         |    JOIN sym e ON p.node = e.src
         |    JOIN outw o ON e.src = o.src
         |    GROUP BY e.dst) c ON nodes.node = c.node)""".stripMargin
    }.mkString
    s"""$head$rounds
       |SELECT node AS part_key, CAST(rank_scaled AS BIGINT) AS rank_scaled
       |FROM r$iters WHERE rank_scaled > 0""".stripMargin
  }

  /** Undirected co-occurrence edges over lineitem: two parts are
    * linked when they ship in the same order, kept at weight >= `minW`
    * (the market-basket graph). Pair expansion is per-order — bounded
    * by order size squared, and orders are small; a pathological
    * giant order is the same hot-key salting case as any self-join.
    */
  /** Bounded-round weighted single-source shortest paths — Bellman-
    * Ford over the min-plus semiring on the undirected weighted
    * co-occurrence graph. Edge cost is `1000000 DIV w` (stronger
    * co-occurrence = cheaper hop — the "how related is this part to
    * the seed, along its strongest chain" metric); seed is the lowest
    * node participating in any edge (data-derived, stable across
    * partitionings); exactly `rounds` relaxations, so the result is
    * deterministic — the exact min cost over paths of ≤ `rounds`
    * edges — and DuckDB-replayable by the identical unrolled CTE
    * chain. Where [[bfsHops]] counts HOPS, this accumulates integer
    * COSTS: the weighted sibling.
    *
    * Scale: each round is one co-partitioned dist-edge join plus a
    * map-side-combinable min aggregation keyed by node; the frontier
    * table is node-bounded and checkpointed per round with the
    * previous round's blocks freed ([[personalizedPageRankScaled]]'s
    * lifecycle). Cost stays in int64: ≤ rounds · 10⁶.
    */
  def ssspScaled(edges: DataFrame, rounds: Int = 6): DataFrame = {
    val e0 = edges.barrier()
    // pre-partitioned by src, the per-round relaxation join key (see
    // [[pageRank]]); seed collected once as a scalar (see
    // [[personalizedPageRankScaled]] — null on an empty graph keeps
    // the empty-result contract through the always-false comparison)
    val sym = graft.core.Layout.spread(e0
      .select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionByName(e0.select(col("v").as("src"), col("u").as("dst"),
        col("w")))
      .select(col("src"), col("dst"), expr("1000000 DIV w").as("cost")),
      "src")
      .barrier()
    val seedRow = sym.agg(min("src")).head()
    val seedLit = if (seedRow.isNullAt(0)) lit(null).cast("bigint")
      else lit(seedRow.getLong(0))
    var dist = sym.filter(col("src") === seedLit)
      .select(col("src").as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .barrier()
    var i = 0
    while (i < rounds) {
      val relaxed = dist.join(sym, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("cost")).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .barrier()
      freeCheckpoint(dist)
      dist = next
      i += 1
    }
    freeCheckpoint(e0); freeCheckpoint(sym)
    dist.select(col("node").as("part_key"), col("dist").as("dist_cost"))
  }

  def ssspSql(rounds: Int = 6): String = {
    val steps = (1 to rounds).map { i =>
      s""",
         |d$i AS (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT s.dst AS node, d.dist + s.cost AS dist
         |    FROM d${i - 1} d JOIN sym s ON d.node = s.src)
         |  GROUP BY node)""".stripMargin
    }.mkString
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |edges AS (
       |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |sym AS (
       |  SELECT u AS src, v AS dst, 1000000 // w AS cost FROM edges
       |  UNION ALL
       |  SELECT v, u, 1000000 // w FROM edges),
       |sd AS (SELECT min(src) AS seed FROM sym),
       |d0 AS (
       |  SELECT (SELECT seed FROM sd) AS node, CAST(0 AS BIGINT) AS dist)
       |$steps
       |SELECT node AS part_key, CAST(dist AS BIGINT) AS dist_cost
       |FROM d$rounds""".stripMargin
  }

  /** Degree-distribution panel over the undirected co-occurrence
    * graph: nodes bucketed by log2 degree octave (`length(bin(deg))`,
    * the [[graft.ops.Relational]] octave device), with node count,
    * total/max degree, and each octave's permille share of all edge
    * endpoints — the "is this graph power-law, and how hubby is the
    * tail" panel read before choosing salting/orientation strategies
    * (a heavy top octave is exactly when degree-ordered orientation
    * and hot-key salting pay).
    *
    * Scale: one degree aggregation (map-side combinable) + one
    * octave aggregation (≤64 rows) + a 1-row total broadcast. All
    * exact integers.
    */
  def degreeDistribution(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val tot = deg.agg(sum("deg").as("tot_deg"))
    deg.withColumn("octave", expr("length(bin(deg))"))
      .groupBy("octave")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("sum_deg"),
        max("deg").as("max_deg"))
      .crossJoin(broadcast(tot))
      .select(col("octave").cast("bigint").as("octave"), col("n_nodes"),
        col("sum_deg"), col("max_deg"),
        expr("1000 * sum_deg DIV tot_deg").as("share_permille"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over every (symmetrized) edge — do hubs link to
    * hubs (r > 0) or to leaves (r < 0)? The one-number companion to
    * [[degreeDistribution]] when choosing a join strategy: a
    * disassortative hub-and-spoke graph concentrates whole
    * neighborhoods on single keys (salting territory) where an
    * assortative one spreads them.
    *
    * All five moment sums are exact integers (degree sums over edges);
    * only the final Pearson ratio goes through doubles, rounded 6 dp.
    * By symmetry of the doubled edge list Sy=Sx and Syy=Sxx, so
    * r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2). Int64 headroom: M*Sxy <=
    * 2m^2*dmax^2 — fine to m*dmax ~ 3e9 edge-endpoints; past that,
    * compute the moments per-octave and combine in doubles.
    *
    * Scale: one degree aggregation + two node-keyed joins of the edge
    * list against the node-sized degree table + one algebraic
    * aggregate. No window, nothing driver-side.
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
    sym
      .join(deg.select(col("node").as("u"), col("deg").as("dx")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dy")), "v")
      .agg(
        count(lit(1)).as("m2"),
        sum("dx").as("sx"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(col("m2"), col("sx"), col("sxx"), col("sxy"),
        round((col("m2").cast("double") * col("sxy") -
          col("sx").cast("double") * col("sx")) /
          (col("m2").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sx")), 6).as("r"))
  }

  /** Edge reciprocity over the directed event-transition graph: of
    * all distinct directed edges, the permille whose reverse edge also
    * exists — how two-way the user-journey graph is (a checkout->cart
    * back-edge is product friction; a one-way funnel reciprocates
    * nothing). One self-join of the distinct edge list on the swapped
    * key + one 1-row aggregate; integer-exact.
    */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    e.join(rev, Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_reciprocal"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_edges"), col("n_reciprocal"),
        expr("1000 * n_reciprocal DIV n_edges").as("reciprocity_permille"))
  }

  val reciprocitySql: String =
    """WITH e AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT e1.event_type AS src, e2.event_type AS dst
      |    FROM (SELECT user_id, ts, event_id, event_type,
      |            row_number() OVER (PARTITION BY user_id
      |              ORDER BY ts, event_id) AS rn
      |          FROM events) e1
      |    JOIN (SELECT user_id, ts, event_id, event_type,
      |            row_number() OVER (PARTITION BY user_id
      |              ORDER BY ts, event_id) AS rn
      |          FROM events) e2
      |      ON e1.user_id = e2.user_id AND e2.rn = e1.rn + 1)
      |  WHERE src <> dst),
      |r AS (
      |  SELECT count(*) AS n_reciprocal
      |  FROM e a SEMI JOIN e b ON a.src = b.dst AND a.dst = b.src),
      |n AS (SELECT count(*) AS n_edges FROM e)
      |SELECT n.n_edges, r.n_reciprocal,
      |  CAST(1000 * r.n_reciprocal // n.n_edges AS BIGINT)
      |    AS reciprocity_permille
      |FROM n CROSS JOIN r""".stripMargin

  val assortativitySql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |edges AS (
      |  SELECT a.pk AS u, b.pk AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (
      |  SELECT node, count(*) AS deg FROM (
      |    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      |  GROUP BY node),
      |sym AS (
      |  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
      |moments AS (
      |  SELECT count(*) AS m2,
      |    CAST(sum(du.deg) AS BIGINT) AS sx,
      |    CAST(sum(du.deg * du.deg) AS BIGINT) AS sxx,
      |    CAST(sum(du.deg * dv.deg) AS BIGINT) AS sxy
      |  FROM sym s
      |  JOIN deg du ON s.u = du.node
      |  JOIN deg dv ON s.v = dv.node)
      |SELECT m2, sx, sxx, sxy,
      |  round((m2::DOUBLE * sxy - sx::DOUBLE * sx) /
      |    (m2::DOUBLE * sxx - sx::DOUBLE * sx), 6) AS r
      |FROM moments""".stripMargin

  val degreeDistributionSql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |edges AS (
      |  SELECT a.pk AS u, b.pk AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (
      |  SELECT node, count(*) AS deg FROM (
      |    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      |  GROUP BY node),
      |tot AS (SELECT sum(deg) AS tot_deg FROM deg)
      |SELECT CAST(length(bin(deg)) AS BIGINT) AS octave,
      |  count(*) AS n_nodes,
      |  CAST(sum(deg) AS BIGINT) AS sum_deg,
      |  CAST(max(deg) AS BIGINT) AS max_deg,
      |  CAST(1000 * sum(deg) // tot_deg AS BIGINT) AS share_permille
      |FROM deg CROSS JOIN tot
      |GROUP BY 1, tot_deg""".stripMargin

  def coOccurrenceEdges(lineitem: DataFrame, minW: Int = 2): DataFrame =
    coOccurrenceWeighted(lineitem, minW).select("u", "v")

  /** [[coOccurrenceEdges]] keeping the co-occurrence count as the edge
    * weight — the form community detection votes with.
    */
  def coOccurrenceWeighted(lineitem: DataFrame, minW: Int = 2): DataFrame = {
    val li = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minW)
      .select("u", "v", "w")
  }

  /** Weighted label propagation (Raghavan et al. 2007) over an
    * undirected weighted edge list: every node starts as its own
    * label; each synchronous round it adopts the label with the
    * highest incident weight among its neighbors (ties to the lowest
    * label id — the determinism LPA's usual random tie-break gives
    * up, and what makes the op oracle-checkable). Fixed `iters`
    * rounds, like the scaled PageRank: a convergence stop would be
    * data-dependent; a fixed horizon unrolls into plain CTEs.
    *
    * Where [[graft.llm.Dedup.dupClusters]]' min-label propagation
    * finds CONNECTED COMPONENTS (any path merges), weighted majority
    * finds DENSE groups — two weakly-bridged cliques keep separate
    * labels here but are one component there.
    *
    * Scale: per round, one co-partitioned join of the symmetric edge
    * list against the node-sized label table (both hash-partitioned
    * on node keys) and one (node, label)-keyed vote aggregate bounded
    * by 2|E| rows; the winner pick is a node-partitioned window. The
    * label table is localCheckpoint-ed per round (pageRank's lineage
    * discipline). Nothing global, nothing collected.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    val e = edges.barrier()
    // pre-partitioned by src, the per-round vote-join key (see
    // [[pageRank]])
    val sym = graft.core.Layout.spread(
      e.select(col("u").as("src"), col("v").as("dst"), col("w"))
        .unionByName(e.select(col("v").as("src"), col("u").as("dst"),
          col("w"))), "src")
      .barrier()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    // only label tables the loop itself checkpointed may be freed —
    // the round-0 table's PLAN references sym's checkpoint blocks, so
    // freeing it would tear sym out from under every later round
    var freeable: Option[DataFrame] = None
    for (_ <- 0 until iters) {
      val votes = sym
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(sum("w").as("wv"))
      val win = Window.partitionBy("node")
        .orderBy(col("wv").desc, col("label").asc)
      labels = votes.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1).select("node", "label")
        .barrier() // eager — safe to drop the previous round
      freeable.foreach(freeCheckpoint)
      freeable = Some(labels)
    }
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "label")
      .select(col("node").as("part_key"), col("label").as("community"),
        col("n_members"))
  }

  val labelPropagationSql: String = {
    val iters = 3
    val rounds = (1 to iters).map { r =>
      val prev = if (r == 1) "l0" else s"l${r - 1}"
      s"""v$r AS (
         |  SELECT s.dst AS node, l.label, sum(s.w) AS wv
         |  FROM sym s JOIN $prev l ON s.src = l.node
         |  GROUP BY 1, 2),
         |l$r AS (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (PARTITION BY node
         |      ORDER BY wv DESC, label) AS rn
         |    FROM v$r)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |edges AS (
       |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |sym AS (
       |  SELECT u AS src, v AS dst, w FROM edges
       |  UNION ALL
       |  SELECT v AS src, u AS dst, w FROM edges),
       |l0 AS (
       |  SELECT DISTINCT src AS node, src AS label FROM sym),
       |$rounds
       |SELECT l.node AS part_key, CAST(l.label AS BIGINT) AS community,
       |  c.n_members
       |FROM l$iters l JOIN (
       |  SELECT label, count(*) AS n_members FROM l$iters GROUP BY 1) c
       |  ON l.label = c.label""".stripMargin
  }

  /** Distributed triangle counting (node clustering structure — the
    * corpus-graph diagnostic next to PageRank's centrality): per-node
    * triangle participation plus degree, over an undirected edge list
    * (columns u < v, one row per edge).
    *
    * Uses the degree-ordered orientation (Suri & Vassilvitskii 2011,
    * "Counting Triangles and the Curse of the Last Reducer"): orient
    * every edge from its (degree, id)-smaller endpoint to the larger,
    * so each triangle {x,y,z} materializes exactly once as the wedge
    * x->y->z closed by x->z, and — the scale property — every node's
    * OUT-degree is O(sqrt(|E|)), so the wedge join's fan-out is
    * bounded even when a hub node has millions of neighbors. All three
    * joins hash-partition on node keys; nothing is collected.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // materialize ONCE: the raw edge list feeds deg + orientation, the
    // oriented list is referenced three times by the wedge join, and
    // deg twice — without the checkpoints every reference re-executes
    // the full upstream edge derivation (the co-occurrence self-join),
    // a 69-exchange plan at any scale (same lineage discipline as
    // pageRank / dupClusters; both lists are |E|-sized)
    val e = edges.barrier()
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val orient = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(fwd, col("u")).otherwise(col("v")).as("s"),
        when(fwd, col("v")).otherwise(col("u")).as("t"))
      .barrier()
    val tri = orient.as("e1")
      .join(orient.as("e2"), col("e1.t") === col("e2.s"))
      .join(orient.as("e3"),
        col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .join(deg, "node")
      .select(col("node").as("part_key"), col("deg").as("degree"),
        col("n_tri"))
  }

  val triangleCountsSql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |edges AS (
      |  SELECT a.pk AS u, b.pk AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (
      |  SELECT node, count(*) AS deg FROM (
      |    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      |  GROUP BY 1),
      |orient AS (
      |  SELECT
      |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
      |      THEN e.u ELSE e.v END AS s,
      |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
      |      THEN e.v ELSE e.u END AS t
      |  FROM edges e
      |  JOIN deg du ON e.u = du.node
      |  JOIN deg dv ON e.v = dv.node),
      |tri AS (
      |  SELECT e1.s AS a, e1.t AS b, e2.t AS c
      |  FROM orient e1
      |  JOIN orient e2 ON e1.t = e2.s
      |  JOIN orient e3 ON e3.s = e1.s AND e3.t = e2.t)
      |SELECT p.node AS part_key, CAST(d.deg AS BIGINT) AS degree,
      |  p.n_tri
      |FROM (
      |  SELECT node, count(*) AS n_tri FROM (
      |    SELECT a AS node FROM tri
      |    UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri)
      |  GROUP BY 1) p
      |JOIN deg d ON p.node = d.node""".stripMargin

  /** Link prediction over an undirected edge list (columns u < v):
    * for every NON-adjacent pair with >= `minCn` common neighbors,
    * the three classic topology scores — common-neighbor count,
    * preferential attachment (deg(u) x deg(v)), and the
    * resource-allocation index (Zhou et al. 2009: sum over common
    * neighbors z of 1/deg(z), here sum of 1000000 DIV deg(z) so the
    * score is integer-exact in both engines; RA outperforms
    * Adamic-Adar in the benchmark literature and its reciprocal needs
    * no logarithm). The "related items you haven't co-bought yet"
    * readout of the market-basket graph.
    *
    * Scale: candidate pairs are WEDGES (u-z-v), so the fan-out is
    * sum over centers of deg(z)^2 — unbounded under hubs. The guard is
    * `maxDeg`: wedges through centers with deg > maxDeg are dropped
    * BEFORE the self-join (their RA contribution, 1e6/deg, is noise by
    * construction — the graph analog of dropping stop words before a
    * posting-list join; production link predictors do exactly this).
    * Everything else is hash-partitioned joins on node keys; the
    * non-adjacency check is an answer-sized left_anti against the edge
    * list; nothing is collected or broadcast.
    */
  def linkPrediction(
      edges: DataFrame, minCn: Int = 2, maxDeg: Long = 64): DataFrame = {
    val e = edges.select("u", "v").barrier()
    val adj = e.select(col("u").as("z"), col("v").as("nb"))
      .unionByName(e.select(col("v").as("z"), col("u").as("nb")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("deg")).barrier()
    val small = adj.join(deg.filter(col("deg") <= maxDeg), "z")
    val wedges = small.as("a")
      .join(small.as("b"),
        col("a.z") === col("b.z") && col("a.nb") < col("b.nb"))
      .select(col("a.nb").as("u"), col("b.nb").as("v"),
        col("a.deg").as("zdeg"))
    val scores = wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 DIV zdeg")).as("ra_x1e6"))
      .filter(col("cn") >= minCn)
      .join(e, Seq("u", "v"), "left_anti")
    scores
      .join(deg.select(col("z").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("z").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        (col("du") * col("dv")).as("pa"), col("ra_x1e6"))
  }

  val linkPredictionSql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |edges AS (
      |  SELECT a.pk AS u, b.pk AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |adj AS (
      |  SELECT u AS z, v AS nb FROM edges
      |  UNION ALL
      |  SELECT v AS z, u AS nb FROM edges),
      |deg AS (SELECT z, count(*) AS deg FROM adj GROUP BY 1),
      |small AS (
      |  SELECT a.z, a.nb, d.deg FROM adj a JOIN deg d ON a.z = d.z
      |  WHERE d.deg <= 64),
      |wedges AS (
      |  SELECT a.nb AS u, b.nb AS v, a.deg AS zdeg
      |  FROM small a JOIN small b ON a.z = b.z AND a.nb < b.nb),
      |scores AS (
      |  SELECT u, v, count(*) AS cn, sum(1000000 // zdeg) AS ra
      |  FROM wedges GROUP BY 1, 2 HAVING count(*) >= 2),
      |ne AS (
      |  SELECT s.u, s.v, s.cn, s.ra FROM scores s
      |  WHERE NOT EXISTS (SELECT 1 FROM edges e
      |    WHERE e.u = s.u AND e.v = s.v))
      |SELECT ne.u, ne.v, CAST(ne.cn AS BIGINT) AS cn,
      |  CAST(du.deg * dv.deg AS BIGINT) AS pa,
      |  CAST(ne.ra AS BIGINT) AS ra_x1e6
      |FROM ne
      |JOIN deg du ON ne.u = du.z
      |JOIN deg dv ON ne.v = dv.z""".stripMargin

  /** Market-basket association rules over order baskets (Agrawal &
    * Srikant's Apriori output at itemset size 2 — the "customers who
    * bought X also bought Y" panel): for every part pair co-occurring
    * in >= minSupport baskets, the support count, both directional
    * confidences, and the lift, all in exact integer permille
    * (1000·n_xy DIV n_x; lift = 1000·n_xy·N DIV (n_x·n_y)). Where
    * [[graft.llm.CorpusOps.pmiCollocations]] ranks ADJACENT text
    * bigrams, this scores UNORDERED co-membership — the retail/
    * recommendation shape.
    *
    * Scale: the pair-generation self-join is the co-occurrence kernel
    * (support-filtered before anything joins it); per-item basket
    * counts join co-partitioned on the item key (item vocabulary never
    * broadcast); the basket total rides a 1-row broadcast. Integer
    * range: the lift numerator `1000·n_xy·N` wraps int64 silently
    * past N ≈ 3·10⁹ baskets at n_xy ~ N, so it is computed in
    * DECIMAL(38,0) (HUGEINT on the oracle side) — exact to ~10¹⁶
    * baskets, and past that Spark's non-ANSI decimal overflow yields
    * NULL, an explicit switch rather than a wrong number. The
    * quotient is ≤ 1000·N / minSupport, safe in the final BIGINT.
    */
  def basketRules(lineitem: DataFrame, minSupport: Long = 5L): DataFrame = {
    val li = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val items = li.groupBy("pk").agg(count(lit(1)).as("n_item"))
    val total = li.agg(countDistinct("ok").as("n_baskets"))
    coOccurrenceWeighted(lineitem, minW = minSupport.toInt)
      .join(items.select(col("pk").as("u"), col("n_item").as("n_u")), "u")
      .join(items.select(col("pk").as("v"), col("n_item").as("n_v")), "v")
      .crossJoin(broadcast(total))
      .select(col("u"), col("v"), col("w").as("n_pairs"),
        col("n_u"), col("n_v"),
        expr("1000 * w DIV n_u").as("conf_uv_permille"),
        expr("1000 * w DIV n_v").as("conf_vu_permille"),
        expr("CAST(1000 * CAST(w AS DECIMAL(38,0)) * n_baskets DIV " +
          "(CAST(n_u AS DECIMAL(38,0)) * n_v) AS BIGINT)").as("lift_e3"))
  }

  val basketRulesSql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |items AS (SELECT pk, count(*) AS n_item FROM li GROUP BY 1),
      |total AS (SELECT count(DISTINCT ok) AS n_baskets FROM li),
      |pairs AS (
      |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT p.u, p.v, CAST(p.w AS BIGINT) AS n_pairs,
      |  CAST(iu.n_item AS BIGINT) AS n_u, CAST(iv.n_item AS BIGINT) AS n_v,
      |  CAST(1000 * p.w // iu.n_item AS BIGINT) AS conf_uv_permille,
      |  CAST(1000 * p.w // iv.n_item AS BIGINT) AS conf_vu_permille,
      |  CAST(CAST(1000 AS HUGEINT) * p.w * n_baskets
      |       // (CAST(iu.n_item AS HUGEINT) * iv.n_item) AS BIGINT)
      |    AS lift_e3
      |FROM pairs p
      |JOIN items iu ON p.u = iu.pk
      |JOIN items iv ON p.v = iv.pk
      |CROSS JOIN total""".stripMargin

  /** k-core decomposition by fixed-round peeling (Seidman 1983; the
    * "dense backbone" extractor — spam rings, core communities, the
    * subgraph worth running expensive analytics on): each round drops
    * every node whose CURRENT degree is below k, then drops edges that
    * lost an endpoint; surviving nodes after `iters` rounds are
    * reported with their residual degree. A convergence-stopped peel
    * yields the exact k-core; the FIXED horizon (like the scaled
    * PageRank and LPA) is what unrolls into plain oracle CTEs — each
    * extra round only removes nodes, so the output is a monotone
    * over-approximation that is exact once a round removes nothing
    * (the spec asserts sf0.001 converges inside the horizon).
    *
    * Scale: per round, one degree aggregate over the live edge list
    * and two node-keyed semi-joins (edge list vs the node-sized
    * survivor set) — all hash-partitioned on node keys, nothing
    * collected, nothing broadcast beyond what AQE elects. The live
    * edge list shrinks monotonically, so round cost falls; lineage is
    * localCheckpoint-bounded with the LPA discipline (previous round's
    * blocks freed only after the next is materialized).
    */
  def kCore(edges: DataFrame, k: Int = 3, iters: Int = 4): DataFrame = {
    val e = edges.select("u", "v").barrier()
    var cur = e.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e.select(col("v").as("src"), col("u").as("dst")))
      .barrier()
    var freeable: Option[DataFrame] = Some(cur)
    for (_ <- 0 until iters) {
      val keep = cur.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      val next = cur.join(keep, "src")
        .join(keep.withColumnRenamed("src", "dst"), "dst")
        .select("src", "dst")
        .barrier() // eager — safe to drop the previous round
      freeable.foreach(freeCheckpoint)
      freeable = Some(next)
      cur = next
    }
    cur.groupBy(col("src").as("part_key"))
      .agg(count(lit(1)).as("core_deg"))
  }

  def kCoreSql(k: Int = 3, iters: Int = 4): String = {
    val rounds = (1 to iters).map { r =>
      val prev = s"e${r - 1}"
      s"""k$r AS (
         |  SELECT src FROM $prev GROUP BY 1 HAVING count(*) >= $k),
         |e$r AS (
         |  SELECT e.src, e.dst FROM $prev e
         |  JOIN k$r a ON e.src = a.src
         |  JOIN k$r b ON e.dst = b.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |edges AS (
       |  SELECT a.pk AS u, b.pk AS v
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |e0 AS (
       |  SELECT u AS src, v AS dst FROM edges
       |  UNION ALL
       |  SELECT v AS src, u AS dst FROM edges),
       |$rounds
       |SELECT src AS part_key, count(*) AS core_deg
       |FROM e$iters GROUP BY 1""".stripMargin
  }

  /** BFS hop distance from a deterministic seed over the co-occurrence
    * graph, driven through the RECURSIVE CTE surface (`WITH RECURSIVE`
    * / Catalyst `UnionLoop`, new in Spark 4) — the SQL-parity face of
    * graph traversal next to the DataFrame-loop operators above. The
    * recursive step expands the PREVIOUS frontier one hop with a
    * per-level DISTINCT, so frontier rows are bounded by |V| per level
    * (path-count explosion collapses at each level); a node reached at
    * several depths keeps its minimum via the outer min(hop). Depth is
    * capped at `maxHops`, making the result deterministic and
    * DuckDB-replayable with the identical recursive query.
    *
    * Seed: the lowest part key participating in any edge — data-derived
    * (no literal in the query), stable across partitionings.
    *
    * Scale: each level is one co-partitioned frontier-edge join plus a
    * level-local distinct — the textbook iterative-BFS shuffle shape;
    * state per level is node-bounded. Spark's UnionLoop executes
    * exactly this loop; at 100 TB the same query runs unchanged, with
    * the co-occurrence edge CTE feeding both the seed and the
    * traversal off one scan.
    */
  private val bfsViewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  def bfsHops(s: SparkSession, dir: String, maxHops: Int = 4): DataFrame = {
    // materialize the SYMMETRIC edge list BEFORE entering the
    // recursion: a CTE is a plan alias, not a result, so UnionLoop
    // would re-run the co-occurrence self-join + aggregate on every
    // level (measured 15.9 s at sf0.1; 2.0 s checkpointed — the loop
    // itself is cheap, recomputing its input per level was the cost)
    // the view name is per-invocation (session-scoped views are shared
    // session state — two concurrent bfsHops calls on one SparkSession,
    // e.g. parallel bench threads, would clobber a fixed name mid-query)
    val view = s"graft_bfs_sym_${bfsViewSeq.incrementAndGet()}"
    val e = coOccurrenceEdges(Tables.load(s, dir, "lineitem"))
    e.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e.select(col("v").as("src"), col("u").as("dst")))
      .barrier()
      .createOrReplaceTempView(view)
    s.sql(
      s"""WITH RECURSIVE sym AS (
         |  SELECT src, dst FROM $view),
         |reach AS (
         |  SELECT min(src) AS node, CAST(0 AS BIGINT) AS hop FROM sym
         |  UNION ALL
         |  SELECT DISTINCT s.dst AS node, r.hop + CAST(1 AS BIGINT) AS hop
         |  FROM reach r JOIN sym s ON s.src = r.node
         |  WHERE r.hop < $maxHops)
         |SELECT node AS part_key, min(hop) AS hops
         |FROM reach GROUP BY node""".stripMargin)
  }

  def bfsHopsSql(maxHops: Int = 4): String =
    s"""WITH RECURSIVE li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |edges AS (
       |  SELECT a.pk AS u, b.pk AS v
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |sym AS (
       |  SELECT u AS src, v AS dst FROM edges
       |  UNION ALL
       |  SELECT v AS src, u AS dst FROM edges),
       |reach AS (
       |  SELECT min(src) AS node, CAST(0 AS BIGINT) AS hop FROM sym
       |  UNION ALL
       |  SELECT DISTINCT s.dst AS node, r.hop + 1 AS hop
       |  FROM reach r JOIN sym s ON s.src = r.node
       |  WHERE r.hop < $maxHops)
       |SELECT node AS part_key, CAST(min(hop) AS BIGINT) AS hops
       |FROM reach GROUP BY node""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_basket_rules" -> ((s, d) =>
      basketRules(Tables.load(s, d, "lineitem"))),
    "q_basket_eval" -> ((s, d) =>
      basketRulesEval(Tables.load(s, d, "lineitem"))),
    "q_graph_ppr" -> ((s, d) =>
      personalizedPageRankScaled(
        coOccurrenceWeighted(Tables.load(s, d, "lineitem")))),
    "q_graph_kcore" -> ((s, d) =>
      kCore(coOccurrenceEdges(Tables.load(s, d, "lineitem")))),
    "q_graph_bfs" -> ((s, d) => bfsHops(s, d)),
    "q_graph_linkpred" -> ((s, d) =>
      linkPrediction(coOccurrenceEdges(Tables.load(s, d, "lineitem")))),
    "q_graph_communities" -> ((s, d) =>
      labelPropagation(coOccurrenceWeighted(Tables.load(s, d, "lineitem")))),
    "q_graph_triangles" -> ((s, d) =>
      triangleCounts(coOccurrenceEdges(Tables.load(s, d, "lineitem")))),
    "q_graph_pagerank" -> ((s, d) =>
      pageRankScaled(eventTransitions(Tables.load(s, d, "events")))),
    "q_graph_hits" -> ((s, d) =>
      hitsScaled(eventTransitions(Tables.load(s, d, "events")))),
    "q_graph_sssp" -> ((s, d) =>
      ssspScaled(coOccurrenceWeighted(Tables.load(s, d, "lineitem")))),
    "q_graph_degree_dist" -> ((s, d) =>
      degreeDistribution(coOccurrenceEdges(Tables.load(s, d, "lineitem")))),
    "q_graph_assortativity" -> ((s, d) =>
      assortativity(coOccurrenceEdges(Tables.load(s, d, "lineitem")))),
    "q_graph_reciprocity" -> ((s, d) =>
      reciprocity(eventTransitions(Tables.load(s, d, "events")))))

  /** The driver query is the scaled-integer fixed-iteration form, so
    * it IS oracle-checkable; the float [[pageRank]] (convergence stop,
    * production default) keeps its GraphSpec ground truth.
    */
  val oracleSql: Map[String, String] = Map(
    "q_basket_rules" -> basketRulesSql,
    "q_basket_eval" -> basketRulesEvalSql,
    "q_graph_ppr" -> personalizedPageRankSql(),
    "q_graph_kcore" -> kCoreSql(),
    "q_graph_bfs" -> bfsHopsSql(),
    "q_graph_linkpred" -> linkPredictionSql,
    "q_graph_communities" -> labelPropagationSql,
    "q_graph_triangles" -> triangleCountsSql,
    "q_graph_pagerank" -> pageRankScaledSql(),
    "q_graph_hits" -> hitsScaledSql(),
    "q_graph_sssp" -> ssspSql(),
    "q_graph_degree_dist" -> degreeDistributionSql,
    "q_graph_assortativity" -> assortativitySql,
    "q_graph_reciprocity" -> reciprocitySql)
}
