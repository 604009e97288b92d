package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness. Prints ONE JSON line with the total and the
  * slowest per-query times, and writes the COMPLETE per-query map to
  * `bench_full.json`.
  *
  * Why the stdout line is size-capped: the round driver stores only the
  * last ~2000 characters of sbt output and JSON-parses lines found
  * there. 97 query names at full float precision are ~3.3 KB — the line
  * gets beheaded by the tail window and never parses (BENCH_r1..r4 all
  * have `parsed: null`). So the line packs queries slowest-first until
  * a fixed byte budget and points at `bench_full.json` for the rest;
  * the JSON prefix shape ({"metric","value","unit","queries",...}) is
  * unchanged for any consumer that greps it.
  */
object Bench {
  // stdout-line byte budget: 2000-char driver tail minus sbt's
  // "[success] Total time ..." trailer (~80 chars) minus safety margin
  private val LineBudget = 1700

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default mirrors the documented bench environment (local[32],
    // 32 hardware threads); SPARK_GRAFT_CPUS overrides for smaller boxes.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); see graft.core.Graft
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorbs one-time session/codegen/JIT startup so
    // per-query numbers measure the queries, not the JVM.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // A failed query reports its elapsed time NEGATED (and lands in
    // "failed") so a fast failure can't masquerade as a fast query.
    def ms3(v: Double): String = f"$v%.3f"
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum

    // Complete map, full precision, alphabetical — written to a file the
    // driver commits with the round, so nothing is lost to the tail cap.
    val fullQs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v else -v)
    }.mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"failed":$failed,"sf":"$sfDir","cpus":$cpus}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try {
      val w = new java.io.PrintWriter(outPath, "UTF-8")
      try w.println(fullJson) finally w.close()
    } catch { case _: Throwable => () } // read-only cwd: stdout line still stands

    // stdout line: slowest-first entries (failed negated) packed until
    // the byte budget; fast queries are the omitted ones.
    val byCost = results.sortBy { case (_, v, _) => -v }
    val tailFixed =
      s"""},"failed":$failed,"sf":"$sfDir","nq":${results.size},"full":"$outPath"}"""
    val head = s"""{"metric":"total","value":${ms3(total)},"unit":"sec","queries":{"""
    val sb = new StringBuilder(head)
    var first = true
    var omitted = 0
    byCost.foreach { case (k, v, ok) =>
      val entry = (if (first) "" else ",") +
        "\"" + k + "\":" + (if (ok) ms3(v) else "-" + ms3(v))
      // reserve room for the fixed tail plus the worst-case omitted count
      if (sb.length + entry.length + tailFixed.length + 20 <= LineBudget) {
        sb.append(entry); first = false
      } else omitted += 1
    }
    sb.append("},\"failed\":").append(failed)
      .append(",\"sf\":\"").append(sfDir).append('"')
      .append(",\"nq\":").append(results.size)
      .append(",\"omitted\":").append(omitted)
      .append(",\"full\":\"").append(outPath).append('"').append('}')
    println(sb.toString)
    Console.out.flush()
    spark.stop()
  }
}
