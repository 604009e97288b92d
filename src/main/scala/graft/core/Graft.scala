package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Design notes (100 TB target):
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join
  *     splitting, and dynamic broadcast-join demotion are exactly the
  *     knobs that keep a fixed logical plan healthy when data volume
  *     changes by 1000x between dev (sf0.001) and prod.
  *   - `spark.sql.shuffle.partitions` defaults to 32 to match the
  *     local[32] test harness; on a real cluster this is expected to be
  *     overridden (or simply left to AQE's coalescing with a high
  *     initial partition number).
  *   - UTC session timezone: all testdata timestamps are written in UTC;
  *     correctness of date_trunc/window queries depends on it.
  */
object Graft {

  def session(
      appName: String = "graft",
      master: String = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"),
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark
      // rejects; read them as raw long nanos and convert explicitly
      // (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
