package graft

import graft.ops.IntervalJoin
import org.apache.spark.sql.execution.ExplainMode

/** Bucketized interval join: brute-force equivalence, bucket-boundary
  * edges, and the plan property that motivates the rewrite (equi-join,
  * not BroadcastNestedLoop).
  */
class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  test("matches brute-force window filter on random data") {
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(300)((rnd.nextInt(6), rnd.nextInt(1000).toLong, rnd.nextInt(1 << 20)))
      .toDF("k", "lt", "lv")
    val right = Seq.fill(300)((rnd.nextInt(6), rnd.nextInt(1000).toLong, rnd.nextInt(1 << 20)))
      .toDF("k", "rt", "rv")
    val window = 37L
    val got = IntervalJoin.within(left, right, Seq("k"), "lt", "rt", window)
      .select("k", "lt", "lv", "rt", "rv")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getInt(4)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val lRows = left.collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    val rRows = right.collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    val expected = (for {
      (lk, lt, lv) <- lRows
      (rk, rt, rv) <- rRows
      if lk == rk && rt >= lt - window && rt <= lt
    } yield (lk, lt, lv, rt, rv))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got === expected)
  }

  test("bucket boundaries: matches exactly window apart and same-instant") {
    val left = Seq((1, 100L, "l")).toDF("k", "lt", "lv")
    val right = Seq(
      (1, 100L, "same"), (1, 90L, "edge"), (1, 89L, "outside"),
      (1, 101L, "future")).toDF("k", "rt", "rv")
    val got = IntervalJoin.within(left, right, Seq("k"), "lt", "rt", 10L)
      .select("rv").collect().map(_.getString(0)).toSet
    assert(got === Set("same", "edge"))
  }

  test("plan is an equi-join on (keys, bucket) — no nested loop") {
    val ev = graft.ops.EventOps.events(spark, sfDir)
    val p = graft.ops.EventOps.intervalPurchaseClick(ev)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("stable across partitioning") {
    val left = (1 to 200).map(i => (i % 5, i.toLong)).toDF("k", "lt")
    val right = (1 to 80).map(i => (i % 5, (i * 2).toLong)).toDF("k", "rt")
    def run(parts: Int) = IntervalJoin.within(
      left.repartition(parts), right.repartition(parts),
      Seq("k"), "lt", "rt", 13L)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(run(1) === run(9))
  }

  test("point-in-time feature join matches every purchase exactly once") {
    // SCD2 intervals partition each user's timeline, so the PIT join
    // must be a bijection from purchases to rows — a duplicate means
    // overlapping intervals (leaky history), a miss means a gap
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val out = graft.ops.EventOps.featuresAtPurchase(events)
    val nPurchases = events
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(out.count() === nPurchases)
    assert(out.select("purchase_id").distinct().count() === nPurchases)
  }
}
