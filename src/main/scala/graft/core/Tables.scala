package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata star schema
  * (`/root/repo/TESTDATA.md`): TPC-H-ish tables plus `events`
  * (timestamped stream table), `documents` (text corpus) and
  * `embeddings` (64-dim float vectors).
  *
  * All loads are plain parquet scans so Catalyst's predicate pushdown /
  * column pruning reach the file source (`PushedFilters` / `ReadSchema`
  * in `.explain`) — no eager caching, no collect.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, table): a load is file listing + footer
  // schema inference, and re-running it for every query in a bench or
  // verify sweep re-pays that per query. The cached value is just an
  // immutable logical plan — execution state is not shared. Entries are
  // evicted when the owning session's context stops (SessionCache), so
  // multi-session JVMs don't leak stopped sessions' plans.
  private val cache = new SessionCache[(String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate(spark, (sfDir, name))(doLoad(spark, sfDir, name))

  private def doLoad(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    name match {
      // events.ts is parquet TIMESTAMP(NANOS); with
      // spark.sql.legacy.parquet.nanosAsLong=true it surfaces as a
      // long. Convert to a proper (microsecond) timestamp here so every
      // consumer sees a TimestampType `ts` column. DuckDB truncates
      // TIMESTAMP_NS -> TIMESTAMP the same way (floor division).
      case "events" if raw.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType =>
        // integer division — `/` would go through double and lose
        // sub-microsecond precision at 2024-epoch nanos (~1.7e18)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      // events.ts written as parquet TIMESTAMP(MICROS, isAdjustedToUTC
      // =false) surfaces as TIMESTAMP_NTZ, which unix_micros/watermark
      // APIs reject. The session timezone is pinned to UTC everywhere
      // (Graft.session), so reinterpreting NTZ wall-clock values as
      // UTC instants is value-preserving — and matches DuckDB, whose
      // plain TIMESTAMP carries the same naive-as-UTC semantics.
      case "events" if raw.schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Load every table and register `<name>` temp views for spark.sql. */
  def registerAll(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map { n =>
      val df = load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap
}
