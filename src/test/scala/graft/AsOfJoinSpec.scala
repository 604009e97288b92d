package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions.col

/** Unit semantics of the composed as-of join, pinned to the same
  * example verified against DuckDB's native ASOF LEFT JOIN.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("as-of join matches latest right <= left, null when none") {
    val left = Seq((1, 10L), (1, 20L), (1, 5L), (2, 7L)).toDF("k", "lt")
    val right = Seq((1, 10L, "a"), (1, 15L, "b"), (2, 99L, "z"))
      .toDF("k", "rt", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt")
      .select("k", "lt", "asof_rt", "v")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        r.getString(3)))
      .sortBy(r => (r._1, r._2))
      .toSeq
    // DuckDB: ASOF LEFT JOIN ON l.k = r.k AND r.rt <= l.lt
    assert(got === Seq(
      (1, 5L, null, null),
      (1, 10L, 10L, "a"),   // equal time matches
      (1, 20L, 15L, "b"),
      (2, 7L, null, null)))
  }

  test("as-of join matches brute-force reference on random data") {
    val rnd = new scala.util.Random(99)
    val leftRows = Seq.fill(300)((rnd.nextInt(8), rnd.nextInt(1000).toLong))
    val rightRows = Seq.fill(120)(
      (rnd.nextInt(8), rnd.nextInt(1000).toLong, rnd.nextInt(100000)))
      // dedupe (k, rt): as-of picks an arbitrary one among exact ties
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val expected = leftRows.map { case (k, lt) =>
      val m = rightRows.filter(r => r._1 == k && r._2 <= lt)
      val best = if (m.isEmpty) None else Some(m.maxBy(_._2))
      (k, lt, best.map(_._2), best.map(_._3))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val got = AsOfJoin.asOf(
      leftRows.toDF("k", "lt"), rightRows.toDF("k", "rt", "v"),
      Seq("k"), "lt", "rt")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got === expected)
  }

  test("as-of join right-side ties are deterministic with tieBreak") {
    // three right rows share (k=1, rt=10); tieBreak on "seq" must make
    // the largest-seq payload win, on every partitioning
    val left = Seq((1, 10L), (1, 50L)).toDF("k", "lt")
    val right = Seq((1, 10L, 1, "lo"), (1, 10L, 3, "hi"), (1, 10L, 2, "mid"))
    def run(parts: Int) = AsOfJoin.asOf(
      left.repartition(parts), right.toDF("k", "rt", "seq", "v")
        .repartition(parts),
      Seq("k"), "lt", "rt", tieBreak = Seq("seq"))
      .select("k", "lt", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val expected = Seq((1, 10L, "hi"), (1, 50L, "hi"))
    assert(run(1) === expected)
    assert(run(5) === expected)
  }

  test("native as-of exec == composed as-of on random data") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(31)
    val left = Seq.fill(400)((rnd.nextInt(7), rnd.nextInt(500).toLong,
      rnd.nextInt(1000))).toDF("k", "lt", "lv")
    // dedupe right per (k, rt): tie winner is undefined in both impls
    val right = Seq.fill(150)((rnd.nextInt(7), rnd.nextInt(500).toLong,
      rnd.nextInt(100000)))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "rt", "rv")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      assert(df.columns.toSeq === Seq("k", "lt", "lv", "asof_rt", "rv"))
      df.collect().map(_.mkString("|")).sorted.toSeq
    }
    val composed = canon(AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt"))
    val native = canon(AsOfJoin.asOfNative(left, right, Seq("k"), "lt", "rt"))
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("native as-of plans as AsOfJoinExec with per-side sort, no window") {
    graft.functions.GraftFunctions.register(spark)
    val left = Seq((1, 10L, "x")).toDF("k", "lt", "lv")
    val right = Seq((1, 5L, "y")).toDF("k", "rt", "rv")
    val p = AsOfJoin.asOfNative(left, right, Seq("k"), "lt", "rt")
      .queryExecution.executedPlan.toString
    // SparkPlan nodeName drops the Exec suffix
    assert(p.contains("AsOfJoin ["), p)
    assert(!p.contains("!AsOfJoin"), s"unresolved attributes in exec:\n$p")
    assert(!p.contains("Window"), s"native path must not use a window:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) === 2, p)
  }

  test("native as-of tieBreak matches composed tieBreak semantics") {
    graft.functions.GraftFunctions.register(spark)
    val left = Seq((1, 10L), (1, 50L)).toDF("k", "lt")
    val right = Seq((1, 10L, 1, "lo"), (1, 10L, 3, "hi"), (1, 10L, 2, "mid"))
      .toDF("k", "rt", "seq", "v")
    def run(parts: Int) = AsOfJoin.asOfNative(
      left.repartition(parts), right.repartition(parts),
      Seq("k"), "lt", "rt", tieBreak = Seq("seq"))
      .select("k", "lt", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val expected = Seq((1, 10L, "hi"), (1, 50L, "hi"))
    assert(run(1) === expected)
    assert(run(6) === expected)
  }

  test("native as-of handles self-join shape (both sides from one scan)") {
    graft.functions.GraftFunctions.register(spark)
    val base = Seq((1, 10L, "a", 1), (1, 20L, "b", 2), (2, 5L, "c", 3),
      (1, 15L, "d", 4)).toDF("k", "t", "tag", "n")
    val l = base.filter(col("n") % 2 === 0)
      .select(col("k"), col("t").as("lt"), col("tag").as("ltag"))
    val r = base.filter(col("n") % 2 === 1)
      .select(col("k"), col("t").as("rt"), col("tag").as("rtag"))
    val native = AsOfJoin.asOfNative(l, r, Seq("k"), "lt", "rt")
      .collect().map(_.mkString("|")).sorted.toSeq
    val composed = AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("native as-of is stable across partitioning") {
    graft.functions.GraftFunctions.register(spark)
    val left = (1 to 300).map(i => (i % 6, i.toLong)).toDF("k", "lt")
    val right = (1 to 60).map(i => (i % 6, (i * 4).toLong, s"p$i"))
      .toDF("k", "rt", "v")
    def run(parts: Int) =
      AsOfJoin.asOfNative(left.repartition(parts), right.repartition(parts),
        Seq("k"), "lt", "rt")
        .collect().map(_.mkString("|")).sorted.toSeq
    assert(run(1) === run(8))
  }

  test("as-of join is stable across partitioning") {
    val left = (1 to 200).map(i => (i % 5, i.toLong)).toDF("k", "lt")
    val right = (1 to 50).map(i => (i % 5, (i * 3).toLong, s"p$i"))
      .toDF("k", "rt", "v")
    def run(parts: Int) =
      AsOfJoin.asOf(left.repartition(parts), right.repartition(parts),
        Seq("k"), "lt", "rt")
        .collect().map(_.mkString("|")).sorted.toSeq
    assert(run(1) === run(7))
  }
}
