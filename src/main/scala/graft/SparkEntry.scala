package graft

import graft.llm.{CorpusOps, Curation, Dedup, Multimodal, Pipeline, Sampling, Similarity, TextOps}
import graft.ops.{EntityOps, EventOps, GraphOps, Relational}
import graft.sql.GraftSql
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2 + LLM-pipeline
  * extensions); `oracleSql` holds the DuckDB-equivalent SQL for every
  * query whose semantics are ANSI-expressible. Queries absent from
  * `oracleSql` (seeded-hash MinHash/SimHash/LSH) get the driver's
  * rows-only check and are asserted against ground truth in ScalaTest
  * instead.
  *
  * Reference-parity surface not representable here (whole-file text
  * scan + `key value` text sink, `mr/worker.go`) is exercised by
  * [[graft.tools.MRMain]] and the golden differential specs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3Shipping(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventOps.queries ++ TextOps.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Pipeline.queries ++ Sampling.queries ++ Curation.queries ++
      CorpusOps.queries ++ GraphOps.queries ++ EntityOps.queries ++
      GraftSql.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ EventOps.oracleSql ++ TextOps.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ Multimodal.oracleSql ++
      Pipeline.oracleSql ++ Sampling.oracleSql ++ Curation.oracleSql ++
      CorpusOps.oracleSql ++ GraphOps.oracleSql ++ EntityOps.oracleSql ++
      GraftSql.oracleSql
}
