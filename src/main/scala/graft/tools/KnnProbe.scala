package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe: decompose q_knn_classify's wall time into the
  * codebook-training phases vs the main query (r19 investigation of
  * the persistent 1.6 s single-task job).
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.conf.set("spark.graft.memoize", "false")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val e = graft.core.Tables.load(spark, sfDir, "embeddings")
    for (round <- 1 to 3) {
      println(s"-- round $round --")
      time("count")(e.count())
      time("raw collect")(e.collect())
      time("raw collect 2")(e.collect())
      time("spread noop")(graft.core.Layout.spread(e, "vec_id")
        .write.format("noop").mode("overwrite").save())
      time("spread noop 2")(graft.core.Layout.spread(e, "vec_id")
        .write.format("noop").mode("overwrite").save())
      time("quantized noop")(graft.llm.Similarity.withUnitQuantized(e)
        .write.format("noop").mode("overwrite").save())
      time("quantized noop 2")(graft.llm.Similarity.withUnitQuantized(e)
        .write.format("noop").mode("overwrite").save())
      val q = graft.llm.Similarity.withUnitQuantized(e)
        .filter(pmod(col("vec_id"), lit(4)) === 0)
      time("quantized sample collect")(
        q.orderBy("vec_id").limit(16).collect())
      time("quantized sample collect 2")(
        q.orderBy("vec_id").limit(16).collect())
      val m = time("full int8 training")(
        graft.llm.Similarity.ivfCentroidsInt8(e, 16, 2, knownCount = 2000L))
      println(s"  (trained ${m.length} cells)")
      // inline replay of the training loop with per-phase timing
      locally {
        val sample = q
        var cents: Array[Array[Long]] = time("  seed")(
          sample.orderBy("vec_id").limit(16).collect()
            .map(_.getAs[scala.collection.Seq[Long]]("qn").toArray))
        for (it <- 0 until 2) {
          val assigned = sample.withColumn("cell", element_at(
            graft.functions.vector.ivf_probes_int8(
              col("qn"), cents.map(_.toSeq).toSeq, 1), 1))
          time(s"  iter$it sample-only noop")(sample
            .write.format("noop").mode("overwrite").save())
          time(s"  iter$it assigned noop")(assigned
            .write.format("noop").mode("overwrite").save())
          time(s"  iter$it posexplode noop")(assigned
            .select(col("cell"), posexplode(col("qn")).as(Seq("pos", "v")))
            .write.format("noop").mode("overwrite").save())
          val aggDf = assigned
            .select(col("cell"), posexplode(col("qn")).as(Seq("pos", "v")))
            .groupBy("cell", "pos")
            .agg(sum("v").as("s"), count(lit(1)).as("n"))
          val rows = time(s"  iter$it assign+agg collect")(aggDf.collect())
          time(s"  iter$it SAME df re-collect")(aggDf.collect())
          val re = assigned
            .select(col("cell"), posexplode(col("qn")).as(Seq("pos", "v")))
            .groupBy("cell", "pos")
            .agg(sum("v").as("s"), count(lit(1)).as("n"))
          time(s"  iter$it REBUILT analyze")(re.queryExecution.analyzed)
          time(s"  iter$it REBUILT optimize")(re.queryExecution.optimizedPlan)
          time(s"  iter$it REBUILT physical")(re.queryExecution.executedPlan)
          time(s"  iter$it REBUILT execute")(re.collect())
          def rebuilt() = assigned
            .select(col("cell"), posexplode(col("qn")).as(Seq("pos", "v")))
            .groupBy("cell", "pos")
            .agg(sum("v").as("s"), count(lit(1)).as("n"))
          spark.conf.set("spark.sql.codegen.wholeStage", "false")
          time(s"  iter$it REBUILT noWSCG")(rebuilt().collect())
          spark.conf.set("spark.sql.codegen.wholeStage", "true")
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          time(s"  iter$it REBUILT noAQE")(rebuilt().collect())
          time(s"  iter$it REBUILT noAQE 2nd")(rebuilt().collect())
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          val means = rows.groupBy(_.getInt(0)).map { case (cell, rs) =>
            cell -> rs.sortBy(_.getInt(1)).map { r =>
              java.math.BigDecimal.valueOf(r.getLong(2).toDouble / r.getLong(3))
                .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
            }
          }
          cents = cents.indices.map(i => means.getOrElse(i, cents(i))).toArray
        }
      }
      val t0 = System.nanoTime()
      val full = graft.llm.Similarity.queries("q_knn_classify")(spark, sfDir)
      println(f"  construct+train             ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      time("main query count")(full.count())
    }
    spark.stop()
  }
}
