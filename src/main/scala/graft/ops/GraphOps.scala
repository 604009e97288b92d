package graft.ops

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
  /** Eagerly drop a localCheckpoint's storage blocks. NOTE
    * `Dataset.unpersist` is a NO-OP for a checkpointed dataset: it only
    * consults the CacheManager, which never sees a checkpoint's backing
    * RDD (verified against Spark 4.1.2 — `localCheckpoint` persists the
    * internal RDD directly and wraps it in a `LogicalRDD`). The blocks
    * must be dropped on that RDD itself, reached via the plan's leaf.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  def pageRank(
      edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
      tol: Double = 1e-7): DataFrame = {
    // edges materialize ONCE: every iteration joins them, and an
    // unmaterialized lineage (e.g. the eventTransitions scan + window
    // + aggregation) would re-execute per round. outW is node-sized
    // and joined per round — same treatment.
    val e = edges.localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint()
    val outW = e.groupBy(col("src")).agg(sum("w").as("out_w"))
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge table")
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val contribs = ranks
        .join(e, col("node") === col("src"))
        .join(outW, "src")
        .select(col("dst").as("node"),
          (col("rank") * col("w") / col("out_w")).as("c"))
        .groupBy("node").agg(sum("c").as("in_rank"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .join(ranks.select(col("node"), col("rank").as("prev")), Seq("node"))
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("in_rank"), lit(0.0))).as("rank"),
          col("prev"))
        // every round materializes anyway for the convergence check,
        // which also bounds lineage (the old interval-3 trade is moot)
        .localCheckpoint()
      // driver-sized convergence probe: one max-delta scalar per round
      // (the standard power-iteration stop; saves the tail rounds on
      // small-diameter graphs where min-label-style fixpoints arrive
      // early)
      val delta = next.agg(max(abs(col("rank") - col("prev")))).head()
        .getDouble(0)
      // superseded rank snapshot: drop its blocks (they would otherwise
      // pin `iters` node-sized copies until the ContextCleaner gets to
      // them; `next` is already materialized so nothing recomputes).
      // The FINAL checkpoint must stay alive — it backs the returned
      // DataFrame and a truncated lineage cannot recompute. At i = 0
      // `ranks` still derives from `nodes`, whose blocks are shared.
      if (i > 0) freeCheckpoint(ranks)
      ranks = next.drop("prev")
      converged = delta < tol
      i += 1
    }
    // loop-only intermediates; after >= 1 iteration the result plan
    // reads only the final checkpoint (with iters = 0 the init plan
    // still derives from nodes, which must then stay alive)
    freeCheckpoint(e); freeCheckpoint(outW)
    if (i > 0) freeCheckpoint(nodes)
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
    val e = edges.localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint()
    val outW = e.groupBy(col("src")).agg(sum("w").as("out_w"))
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRankScaled needs a non-empty edge table")
    val init = scale / n
    val base = ((1000L - dampingPermille) * init) / 1000L
    var ranks = nodes.withColumn("rank_scaled", lit(init))
    var i = 0
    while (i < iters) {
      val contribs = ranks
        .join(e, col("node") === col("src"))
        .join(outW, "src")
        .select(col("dst").as("node"),
          expr("rank_scaled * w DIV out_w").as("c"))
        .groupBy("node").agg(sum("c").as("in_rank"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampingPermille * coalesce(in_rank, CAST(0 AS BIGINT)))" +
              " DIV 1000")).as("rank_scaled"))
        .localCheckpoint()
      if (i > 0) freeCheckpoint(ranks)
      ranks = next
      i += 1
    }
    freeCheckpoint(e); freeCheckpoint(outW)
    if (iters > 0) freeCheckpoint(nodes)
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
      scale: Long = 1000000000000L): String = {
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
         |  SELECT $scale // n AS init,
         |    ((1000 - $dampingPermille) * ($scale // n)) // 1000 AS base
         |  FROM nn),
         |r0 AS (
         |  SELECT node, (SELECT init FROM consts) AS rank_scaled
         |  FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |r$i AS (
         |  SELECT nodes.node,
         |    (SELECT base FROM consts)
         |      + ($dampingPermille * coalesce(c.in_rank, 0)) // 1000
         |      AS rank_scaled
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node,
         |      sum((p.rank_scaled * e.w) // o.out_w) AS in_rank
         |    FROM r${i - 1} p
         |    JOIN edges e ON p.node = e.src
         |    JOIN outw o ON e.src = o.src
         |    GROUP BY e.dst) c ON nodes.node = c.node)""".stripMargin
    }.mkString
    // DuckDB's sum() widens to HUGEINT — cast back so the driver
    // canonicalizes both sides as int64
    s"$head$rounds\nSELECT node, CAST(rank_scaled AS BIGINT) AS rank_scaled FROM r$iters"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> ((s, d) =>
      pageRankScaled(eventTransitions(Tables.load(s, d, "events")))))

  /** The driver query is the scaled-integer fixed-iteration form, so
    * it IS oracle-checkable; the float [[pageRank]] (convergence stop,
    * production default) keeps its GraphSpec ground truth.
    */
  val oracleSql: Map[String, String] = Map(
    "q_graph_pagerank" -> pageRankScaledSql())
}
