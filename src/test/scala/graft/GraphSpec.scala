package graft

import graft.core.Tables
import graft.ops.GraphOps
import org.apache.spark.sql.functions._

/** Ground truth for the iterative graph operators (float power
  * iteration — not SQL-oracle-checkable).
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("pageRank on a symmetric cycle is the uniform fixed point") {
    // a->b->c->a: every iteration maps 1/3 to (1-d)/3 + d/3 = 1/3
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val got = GraphOps.pageRank(edges, iters = 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set("a", "b", "c"))
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6, got))
  }

  test("pageRank matches an in-memory replay on the event graph") {
    val edges = GraphOps.eventTransitions(Tables.load(spark, sfDir, "events"))
    val es = edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val outW = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val d = 0.85
    var rank = nodes.map(_ -> 1.0 / nodes.size).toMap
    var it = 0
    var done = false
    while (it < 10 && !done) {
      val in = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => rank(s) * w / outW(s) }.sum).toMap
      val next = nodes.map(n =>
        n -> ((1 - d) / nodes.size + d * in.getOrElse(n, 0.0))).toMap
      // mirror the operator's convergence stop exactly
      done = nodes.map(n => math.abs(next(n) - rank(n))).max < 1e-7
      rank = next
      it += 1
    }
    val got = GraphOps.pageRank(edges).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === rank.keySet)
    rank.foreach { case (n, v) =>
      assert(math.abs(got(n) - v) < 1e-6, s"$n: got ${got(n)} want $v")
    }
    // sanity: a real distribution, not degenerate
    assert(got.values.sum > 0.5 && got.values.max < 1.0)
  }

  test("pageRankScaled matches an exact integer replay on the event graph") {
    val edges = GraphOps.eventTransitions(Tables.load(spark, sfDir, "events"))
    val es = edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val outW = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val scale = 1000000000000L
    val dp = 850L
    val init = scale / nodes.size
    val base = ((1000L - dp) * init) / 1000L
    var rank = nodes.map(_ -> init).toMap
    for (_ <- 0 until 10) {
      val in = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => rank(s) * w / outW(s) }.sum).toMap
      rank = nodes.map(n => n -> (base + dp * in.getOrElse(n, 0L) / 1000L)).toMap
    }
    val got = GraphOps.pageRankScaled(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === rank, "scaled-integer ranks must replay EXACTLY")
    // scaled ranks track the float operator's ordering
    val fl = GraphOps.pageRank(edges).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.toSeq.sortBy(-_._2).map(_._1) ===
      fl.toSeq.sortBy(-_._2).map(_._1),
      "integer and float PageRank must agree on node ordering")
  }

  test("hitsScaled matches an exact integer replay on the event graph") {
    val edges = GraphOps.eventTransitions(Tables.load(spark, sfDir, "events"))
    val es = edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    // BigInt mirrors DECIMAL(38,0): products exact, / truncates toward
    // zero on nonnegative operands exactly like DIV
    val scale = BigInt(1000000000L)
    var h = nodes.map(_ -> scale).toMap
    var a = Map.empty[String, BigInt]
    for (_ <- 0 until 6) {
      val araw = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => h(s) * w }.sum).toMap
      val am = araw.values.max
      a = nodes.map(n =>
        n -> araw.get(n).map(_ * scale / am).getOrElse(BigInt(0))).toMap
      val hraw = es.groupBy(_._1).view.mapValues(
        _.map { case (_, d, w) => a(d) * w }.sum).toMap
      val hm = hraw.values.max
      h = nodes.map(n =>
        n -> hraw.get(n).map(_ * scale / hm).getOrElse(BigInt(0))).toMap
    }
    val got = GraphOps.hitsScaled(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === nodes.toSet)
    nodes.foreach { n =>
      assert(got(n) === ((h(n).toLong, a(n).toLong)),
        s"node $n: got ${got(n)}, replay (${h(n)}, ${a(n)})")
    }
  }

  test("hitsScaled separates pure hubs from pure authorities (hand graph)") {
    // h1 -> x,y,z and h2 -> x: h1 dominates the hub side (it feeds
    // every authority), x the authority side (fed by both hubs), and
    // the y/z symmetry must be exact; pure hubs score authority 0 and
    // pure authorities hub 0 — the separation PageRank cannot express
    val edges = Seq(("h1", "x", 1L), ("h1", "y", 1L), ("h1", "z", 1L),
      ("h2", "x", 1L)).toDF("src", "dst", "w")
    val got = GraphOps.hitsScaled(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val s = 1000000000L
    assert(got("h1")._1 === s && got("h2")._1 > 0 && got("h2")._1 < s,
      s"hub side: $got")
    assert(got("x")._2 === s && got("y")._2 === got("z")._2 &&
      got("y")._2 > 0 && got("y")._2 < s, s"authority side: $got")
    assert(got("h1")._2 === 0L && got("h2")._2 === 0L &&
      got("x")._1 === 0L && got("y")._1 === 0L && got("z")._1 === 0L,
      s"pure roles must not leak: $got")
  }

  test("hitsScaled frees superseded checkpoint blocks (result pair stays)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("c", "d", 2L), ("d", "a", 1L)).toDF("src", "dst", "w")
    val result = GraphOps.hitsScaled(edges, iters = 4)
    assert(result.count() === 4L)
    val added = sc.getPersistentRDDs.filter { case (id, r) =>
      !before.contains(id) &&
        r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
    }
    // the returned plan joins the final hub AND authority snapshots —
    // exactly two survivors; edges, nodes, init, and every superseded
    // round must be gone
    assert(added.size === 2,
      s"expected the final hub+auth snapshots persisted, found ${added.keys}")
  }

  test("pageRank frees superseded checkpoint blocks (only the result stays)") {
    // Regression for the no-op-unpersist finding: Dataset.unpersist
    // does nothing for localCheckpointed datasets, so pageRank frees
    // blocks via the LogicalRDD's RDD directly. After a multi-round
    // run, exactly ONE of the RDDs it persisted may remain persisted —
    // the final rank snapshot backing the returned DataFrame; edges,
    // nodes, out-weights, and every superseded snapshot must be gone.
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("c", "d", 2L), ("d", "a", 1L)).toDF("src", "dst", "w")
    val result = GraphOps.pageRank(edges, iters = 4, tol = 0.0)
    assert(result.count() === 4L) // materialize through the checkpoint
    val added = sc.getPersistentRDDs.filter { case (id, r) =>
      !before.contains(id) &&
        r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
    }
    assert(added.size === 1,
      s"expected only the final snapshot persisted, found ${added.keys}")
  }

  test("eventTransitions weights sum to (events - users) and self-loops exist") {
    val ev = Tables.load(spark, sfDir, "events")
    val edges = GraphOps.eventTransitions(ev)
    val totalW = edges.agg(sum("w")).head().getLong(0)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(totalW === nEvents - nUsers,
      "every user contributes (events-1) transitions")
  }

  test("labelPropagation separates two cliques a weak bridge connects") {
    val spark2 = spark
    import spark2.implicits._
    // two 5-cliques (heavy internal weight) joined by ONE weight-1
    // bridge: connected components would merge them into one label;
    // weighted majority must keep two communities of 5
    def clique(ids: Seq[Long], w: Long) =
      for (i <- ids; j <- ids if i < j) yield (i, j, w)
    val edges = (clique(1L to 5L, 10L) ++ clique(11L to 15L, 10L) ++
      Seq((5L, 11L, 1L))).toDF("u", "v", "w")
    val got = GraphOps.labelPropagation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val commA = (1L to 5L).map(got).toSet
    val commB = (11L to 15L).map(got).toSet
    assert(commA.size === 1, s"clique A split: $commA")
    assert(commB.size === 1, s"clique B split: $commB")
    assert(commA != commB, "weak bridge merged the cliques")
    // partition invariance: deterministic tie-break, pure of layout
    val alt = GraphOps.labelPropagation(edges.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt === got)
  }

  test("linkPrediction matches a brute-force replay; hub cap drops wedges") {
    val spark2 = spark
    import spark2.implicits._
    // path 1-2-3-4-5 plus 1-6, 3-6: candidate pairs and scores all
    // hand-derivable; hub 100 connects to everything so a low maxDeg
    // must remove every wedge through it
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 6L), (3L, 6L))
    val edges = base.toDF("u", "v")
    def replay(es: Seq[(Long, Long)], maxDeg: Long): Map[(Long, Long), (Long, Long, Long)] = {
      val nbrs = (es.flatMap { case (u, v) => Seq(u -> v, v -> u) })
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val deg = nbrs.map { case (k, vs) => k -> vs.size.toLong }
      val eset = es.toSet
      val pairs = for {
        z <- nbrs.keys.toSeq if deg(z) <= maxDeg
        u <- nbrs(z); v <- nbrs(z) if u < v
      } yield ((u, v), z)
      pairs.groupBy(_._1).collect {
        case ((u, v), ws) if ws.size >= 2 && !eset((u, v)) =>
          (u, v) -> (ws.size.toLong, deg(u) * deg(v),
            ws.map { case (_, z) => 1000000L / deg(z) }.sum)
      }.toMap
    }
    val got = GraphOps.linkPrediction(edges, minCn = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === replay(base, 64L))
    assert(got.nonEmpty)
    // hub cap: connect node 100 to every node; with maxDeg below its
    // degree no NEW candidate may appear via wedges through the hub
    val withHub = base ++ (1L to 6L).map(i => (i, 100L))
    val capped = GraphOps.linkPrediction(withHub.toDF("u", "v"),
      minCn = 2, maxDeg = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(capped === replay(withHub, 4L))
    assert(!capped.keys.exists { case (u, v) => u == 100L || v == 100L })
  }

  test("basketRules: hand-computed support/confidence/lift") {
    // baskets: {1,2} x3, {1,3} x1, {2,3} x1, {1} x1  (N = 6 baskets)
    // n_1 = 5, n_2 = 4, n_3 = 2; pair (1,2): w = 3
    val rows = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L), (14L, 2L), (14L, 3L), (15L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val got = graft.ops.GraphOps.basketRules(rows, minSupport = 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // only (1,2) clears support 3: conf(1->2) = 3000/5 = 600,
    // conf(2->1) = 3000/4 = 750, lift = 1000*3*6/(5*4) = 900
    assert(got === Map((1L, 2L) -> ((3L, 5L, 4L, 600L, 750L, 900L))))
  }

  test("kCore converges within the horizon and matches an exact peel") {
    val edges = GraphOps.coOccurrenceEdges(Tables.load(spark, sfDir, "lineitem"))
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    // replay: peel to the TRUE fixed point in memory
    def peel(k: Int): Map[Long, Long] = {
      var live = es
      var changed = true
      while (changed) {
        val deg = (live.map(_._1) ++ live.map(_._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = live.filter { case (u, v) => keep(u) && keep(v) }
        changed = next.length != live.length
        live = next
      }
      (live.map(_._1) ++ live.map(_._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val got = GraphOps.kCore(edges, k = 3, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the fixed horizon reached the fixed point on this corpus (the
    // over-approximation caveat in the scaladoc is vacuous here)
    assert(got === peel(3))
    assert(got.nonEmpty)
    // and the defining property independently: every member has >= k
    // surviving neighbors
    got.foreach { case (_, d) => assert(d >= 3L) }
  }

  test("assortativity equals an exact in-memory Pearson replay") {
    val edges = GraphOps.coOccurrenceEdges(Tables.load(spark, sfDir, "lineitem"))
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (es.map(_._1) ++ es.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairs = es.flatMap { case (u, v) =>
      Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    val m2 = pairs.length.toDouble
    val sx = pairs.map(_._1).sum.toDouble
    val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
    val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
    val want = (m2 * sxy - sx * sx) / (m2 * sxx - sx * sx)
    val row = GraphOps.assortativity(edges).head()
    assert(row.getLong(0) === pairs.length.toLong)
    assert(math.abs(row.getDouble(4) - want) < 1e-5,
      s"r ${row.getDouble(4)} != $want")
    assert(row.getDouble(4) >= -1.0 - 1e-9 && row.getDouble(4) <= 1.0 + 1e-9)
  }

  test("bfsHops: seed at 0, every hop-h node adjacent to some hop-(h-1) node") {
    val got = GraphOps.bfsHops(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = GraphOps.coOccurrenceEdges(Tables.load(spark, sfDir, "lineitem"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val seed = edges.flatMap(e => Seq(e._1, e._2)).min
    assert(got(seed) === 0L)
    // exact BFS replay (bounded at the op's horizon)
    var frontier = Set(seed)
    var seen = Map(seed -> 0L)
    for (h <- 1L to 4L) {
      frontier = frontier.flatMap(nbrs.getOrElse(_, Set.empty[Long]))
        .filterNot(seen.contains)
      seen = seen ++ frontier.map(_ -> h)
    }
    assert(got === seen)
  }

  test("ssspScaled: hand graph + exact Bellman-Ford replay on the corpus") {
    // hand graph: 1-2 (w=4, cost 250000), 2-3 (w=2, cost 500000),
    // 1-3 (w=1, cost 1000000): the two-hop path 1-2-3 (750000) beats
    // the direct edge (1000000); node 4 is disconnected
    val hand = Seq((1L, 2L, 4L), (2L, 3L, 2L), (1L, 3L, 1L), (4L, 5L, 9L))
      .toDF("u", "v", "w")
    val gotHand = GraphOps.ssspScaled(hand).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotHand === Map(1L -> 0L, 2L -> 250000L, 3L -> 750000L))
    // corpus: exact min-plus replay bounded at the op's horizon
    val edges = GraphOps
      .coOccurrenceWeighted(Tables.load(spark, sfDir, "lineitem"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val adj: Map[Long, Seq[(Long, Long)]] = edges
      .flatMap { case (u, v, w) => Seq((u, v, 1000000L / w), (v, u, 1000000L / w)) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(t => (t._2, t._3)).toSeq }
    val seed = edges.flatMap(e => Seq(e._1, e._2)).min
    var dist = Map(seed -> 0L)
    for (_ <- 1 to 6) {
      val relaxed = dist.toSeq.flatMap { case (n, c) =>
        adj.getOrElse(n, Seq.empty[(Long, Long)])
          .map { case (m, w) => m -> (c + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    val got = GraphOps
      .ssspScaled(GraphOps.coOccurrenceWeighted(
        Tables.load(spark, sfDir, "lineitem")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === dist)
  }
}
