package graft.sql

import graft.core.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string entry point for the graft engine.
  *
  * Everything else in this library is a programmatic DataFrame builder;
  * this facade is the front door for a user who has a SQL string: it
  * binds the testdata star schema as temp views ([[Tables.registerAll]])
  * and registers every graft custom expression
  * ([[GraftFunctions.register]] — `nfc_lower`, `char_ngrams`,
  * `byte_dot_product`, ...) so plain `spark.sql(...)` resolves them,
  * then runs the statement. Deployments that set
  * `spark.sql.extensions=graft.functions.GraftExtensions` get the
  * function half for free; [[init]] is idempotent either way.
  *
  * Scale: the facade adds nothing to the plan — a statement run here
  * goes through the same Catalyst analysis/optimization as the
  * equivalent DataFrame builder (SqlEntrySpec pins result equality
  * bit-for-bit against [[graft.ops.Relational.q1Pricing]] and the
  * semi/anti-join physical shape of the EXISTS statement), so
  * pushdown/pruning/AQE behave identically. Views are plain parquet
  * scans, never cached.
  *
  * [[statements]] is a small named-statement catalog demonstrating the
  * surface (analytic windows, EXISTS/NOT EXISTS decorrelation, custom
  * functions inside SQL text); each entry is also a driver query with a
  * DuckDB oracle. Statements are written in the ANSI intersection of
  * Spark SQL and DuckDB where possible; where the dialects split, the
  * oracle spelling diverges only in the documented places
  * (`nfc_lower` = `nfc_normalize(lower(...))`, `DIV` = `//`).
  */
object GraftSql {

  /** Bind table views + custom functions on `spark`. Idempotent. */
  def init(spark: SparkSession, sfDir: String): Unit = {
    Tables.registerAll(spark, sfDir)
    GraftFunctions.register(spark)
  }

  /** Run one SQL statement against the `sfDir` tables. */
  def sql(spark: SparkSession, sfDir: String, statement: String): DataFrame = {
    init(spark, sfDir)
    spark.sql(statement)
  }

  /** Run a named statement from [[statements]]. */
  def named(spark: SparkSession, sfDir: String, name: String): DataFrame =
    sql(spark, sfDir, statements(name))

  /** The streaming face of [[sql]]: bind `stream` (a `readStream`
    * DataFrame) as a watermarked temp view and compile `statement`
    * against it. The result is an unstarted streaming DataFrame — the
    * caller owns the `writeStream` (sink, output mode, trigger), same
    * as every [[graft.streaming.EventStreams]] mirror. The watermark
    * must be attached to the VIEW (Spark SQL has no watermark clause),
    * which is why this entry point exists instead of documenting a
    * recipe: windowed aggregates in the statement get bounded state for
    * free. Custom graft expressions resolve in the statement text.
    */
  def sqlStream(
      spark: SparkSession, stream: DataFrame, statement: String,
      viewName: String = "events_stream", watermarkCol: String = "ts",
      delay: String = "30 minutes"): DataFrame = {
    GraftFunctions.register(spark)
    stream.withWatermark(watermarkCol, delay)
      .createOrReplaceTempView(viewName)
    spark.sql(statement)
  }

  /** Hourly per-type pulse over the events stream — the statement the
    * streaming-SQL spec pins batch==stream with (cents kept exact, the
    * engine-wide integer-money discipline).
    */
  val streamPulse: String =
    """SELECT window(ts, '1 hour').start AS ws, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS value_cents
      |FROM events_stream
      |GROUP BY window(ts, '1 hour'), event_type""".stripMargin

  // ------------------------------------------------- statement catalog

  /** Regional revenue pulse: per region x year-month, order count,
    * exact revenue cents, and the running (cumulative) revenue within
    * the region. Three broadcast-sized dimension joins feed one
    * hash-partitioned aggregate; the window runs over one row per
    * (region, month) — bounded by the calendar, not the fact table.
    */
  private val regionPulse: String =
    """SELECT region, ym, n_orders, rev_cents,
      |  CAST(sum(rev_cents) OVER (PARTITION BY region ORDER BY ym)
      |    AS BIGINT) AS run_cents
      |FROM (
      |  SELECT r.r_name AS region,
      |    CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT)
      |      AS ym,
      |    count(*) AS n_orders,
      |    CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS rev_cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY r.r_name,
      |    CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT))
      |""".stripMargin

  /** Custom graft expressions inside SQL text: per-language document
    * profile over the NFC-casefolded form ([[graft.functions.NfcLower]],
    * codegen'd — resolves in SQL after [[init]]). Map-side kernel +
    * one aggregate; the distinct rides the same hash partitioning.
    */
  private val docProfile: String =
    """SELECT lang, count(*) AS n_docs,
      |  count(DISTINCT md5(nfc_lower(text))) AS n_norm_distinct,
      |  CAST(sum(length(nfc_lower(text))) AS BIGINT) AS norm_chars
      |FROM documents
      |GROUP BY lang""".stripMargin

  private val docProfileOracle: String =
    """SELECT lang, count(*) AS n_docs,
      |  count(DISTINCT md5(nfc_normalize(lower(text)))) AS n_norm_distinct,
      |  CAST(sum(length(nfc_normalize(lower(text)))) AS BIGINT) AS norm_chars
      |FROM documents
      |GROUP BY lang""".stripMargin

  /** Correlated EXISTS / NOT EXISTS in SQL text: customers with a
    * finished order and no open one. Catalyst decorrelates both
    * subqueries into one semi- plus one anti-join on `o_custkey`
    * (SqlEntrySpec pins the plan) — the 100 TB shape, no per-row
    * subquery execution.
    */
  private val settledCustomers: String =
    """SELECT c.c_custkey, c.c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderstatus = 'F')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'O')""".stripMargin

  /** Named statements, Spark-SQL dialect. */
  val statements: Map[String, String] = Map(
    "q_sql_region_pulse" -> regionPulse,
    "q_sql_doc_profile" -> docProfile,
    "q_sql_settled_customers" -> settledCustomers)

  // ------------------------------------------------- driver contract

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    statements.keys.map { name =>
      name -> ((s: SparkSession, dir: String) => named(s, dir, name))
    }.toMap

  /** Statements are written in the Spark/DuckDB dialect intersection,
    * so the oracle IS the statement — except where a graft custom
    * function appears in the SQL text and the oracle substitutes the
    * documented DuckDB spelling.
    */
  val oracleSql: Map[String, String] =
    statements + ("q_sql_doc_profile" -> docProfileOracle)
}
