package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev profiler: run named queries (or the slowest-N known set) twice
  * in one session and print cold vs warm seconds — separates fixed
  * cost (planning + codegen compile + AQE rounds) from per-row work.
  * Usage: runMain graft.tools.QueryProf <sfDir> q_a q_b ...
  */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_QP_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // measure the operator, not a memo hit — the Bench convention, so
    // isolated readings here adjudicate bench numbers apples-to-apples
    spark.conf.set("spark.graft.memoize", "false")
    spark.sparkContext.setLogLevel("ERROR")
    // absorb session startup
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    println(f"${"query"}%-24s cold     warm")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val c = once(); val w = once()
      println(f"$n%-24s $c%6.2f   $w%6.2f")
    }
    spark.stop()
  }
}
