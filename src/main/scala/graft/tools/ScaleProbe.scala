package graft.tools

import graft.core.{Layout, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: run representative operators at 1x and 10x sf0.1 (the
  * 10x input is the same parquet unioned ten times with shifted keys,
  * so the engine re-reads and re-processes 10x the bytes) and report
  * the wall-time ratio. Linear operators should land near 10x or
  * below (below = fixed costs amortizing; well above = a scaling
  * bottleneck). Results feed BASELINE.md's scale-evidence table.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [salt]
  *
  * With `salt`: instead of the operator sweep, probe the prefix-rank
  * threshold join's hot-key salting on a 10x-unioned documents corpus
  * (the corpus' degenerate ~31-token vocabulary makes every prefix
  * rank hot, and the union multiplies each rank's membership 10x — the
  * worst-case output-skew shape). Reports wall time, emitted pairs,
  * pair throughput, and PEAK SINGLE-TASK runtime (the straggler the
  * salting exists to break up) with salting off vs on. Run with sf0.01
  * (10x-unioned = sf0.1-sized input, quadratic-output corpus).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def rep(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame =
      (0 until n).map { i =>
        keyCols.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i * 100000000L)))
      }.reduce(_ unionAll _)

    if (args.contains("salt")) {
      val docs10 = rep(Tables.load(spark, dir, "documents"), Seq("doc_id"), 10)
        .localCheckpoint() // probe the JOIN, not the union re-scan
      // peak single-task runtime across the query — output skew shows
      // up as one task grinding through a hot rank's n^2 pairs
      final class TaskPeak extends org.apache.spark.scheduler.SparkListener {
        val maxRunMs = new java.util.concurrent.atomic.AtomicLong(0L)
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            maxRunMs.getAndAccumulate(t.taskMetrics.executorRunTime, math.max)
      }
      Seq("unsalted" -> -1, "salt512" -> 512).foreach { case (label, st) =>
        val pairs = graft.llm.Dedup.jaccardPairs(docs10, 0.5, saltTarget = st)
        pairs.count() // warm codegen/JIT so the timed run measures the join
        val l = new TaskPeak
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val n = pairs.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000) // listener bus drains async
        spark.sparkContext.removeSparkListener(l)
        println(f"[salt-probe] $label%-9s $n%11d pairs  $dt%7.2f s  " +
          f"${n / dt / 1e6}%6.2f M pairs/s  peak task ${l.maxRunMs.get / 1e3}%6.2f s")
      }
      spark.stop()
      return
    }

    def timeWarm(name: String)(mk: => DataFrame): Double = {
      mk.count() // warm: codegen + JIT
      val t0 = System.nanoTime()
      val n = mk.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $dt%7.2f s  ($n rows)")
      dt
    }

    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    val docs = Tables.load(spark, dir, "documents")
    val ev = Tables.load(spark, dir, "events")

    case class Probe(name: String, mk1: () => DataFrame, mk10: () => DataFrame)
    def q1Agg(l: DataFrame) = l
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
    def joinAgg(l: DataFrame, o: DataFrame) = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    def sigs(d: DataFrame) = Layout.spread(d, "doc_id")
      .select(col("doc_id"),
        graft.functions.text.minhash_signature(col("text"),
          Seq(7L, 13L, 29L, 31L), Seq(3L, 5L, 11L, 17L), 2147483647L).as("s"))
      .select(sum(element_at(col("s"), 1)).as("x"))
    def exactDedup(d: DataFrame) = d
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
    def winRank(o: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }
    def asofN(e: DataFrame) = {
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          unix_micros(col("ts")).as("pt"))
      val c = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("ct"))
        .agg(max("event_id").as("cid"))
      graft.ops.AsOfJoin.asOfNative(p, c, Seq("user_id"), "pt", "ct")
    }

    val li10 = rep(li, Seq("l_orderkey"), 10)
    val ord10 = rep(ord, Seq("o_orderkey", "o_custkey"), 10)
    val docs10 = rep(docs, Seq("doc_id"), 10)
    val ev10 = rep(ev, Seq("event_id", "user_id"), 10)

    val probes = Seq(
      Probe("agg (q1 core)", () => q1Agg(li), () => q1Agg(li10)),
      Probe("join+agg (q3 core)",
        () => joinAgg(li, ord), () => joinAgg(li10, ord10)),
      Probe("minhash sigs (kernel)", () => sigs(docs), () => sigs(docs10)),
      Probe("exact dedup (md5 groupBy)",
        () => exactDedup(docs), () => exactDedup(docs10)),
      Probe("window top-3 per key", () => winRank(ord), () => winRank(ord10)),
      Probe("native as-of join", () => asofN(ev), () => asofN(ev10)))

    println(f"${"operator"}%-28s ${"1x"}%8s ${"10x"}%9s  ratio")
    probes.foreach { p =>
      val t1 = timeWarm(p.name + " @1x")(p.mk1())
      val t10 = timeWarm(p.name + " @10x")(p.mk10())
      println(f"${p.name}%-28s $t1%7.2f s $t10%7.2f s  ${t10 / t1}%5.1fx")
    }
    spark.stop()
  }
}
