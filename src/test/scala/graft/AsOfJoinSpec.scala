package graft

import graft.ops.AsOfJoin

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
