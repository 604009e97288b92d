package graft

import graft.ops.{AsOfJoin, IntervalJoin}
import org.apache.spark.sql.functions.col

/** Error-path contracts: misuse must fail FAST with a clear message,
  * not produce silently wrong results at scale.
  */
class RobustnessSpec extends SparkSpec {

  import spark.implicits._

  private lazy val l = Seq((1, 10L, "x")).toDF("k", "lt", "v")
  private lazy val r = Seq((1, 5L, "y")).toDF("k", "rt", "w")

  test("as-of join rejects colliding payload column names") {
    val rBad = Seq((1, 5L, "y")).toDF("k", "rt", "v") // v collides
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, rBad, Seq("k"), "lt", "rt")
    }
    assert(e.getMessage.contains("collision"))
  }

  test("as-of join rejects tieBreak columns that are not right payload") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt", tieBreak = Seq("nope"))
        .collect()
    }
    assert(e.getMessage.contains("tieBreak"))
  }

  test("native as-of rejects unknown columns by name") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, r, Seq("k"), "lt", "missing")
    }
    assert(e.getMessage.contains("missing"))
  }

  test("interval join rejects non-positive windows") {
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.within(l, r, Seq("k"), "lt", "rt", 0L)
    }
    assert(e.getMessage.contains("window"))
  }

  test("text kernels reject non-string input at analysis time") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("simhash64"))
  }

  test("vector kernels reject mismatched types at analysis time") {
    graft.functions.GraftFunctions.register(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_jaccard(array('a'), array('b'))").collect()
    }
  }
}
