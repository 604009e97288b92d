package graft

import graft.ops.Relational
import graft.sql.GraftSql
import org.apache.spark.sql.execution.ExplainMode

/** The SQL-string entry point: same plans, same results, custom
  * functions resolvable from SQL text.
  */
class SqlEntrySpec extends SparkSpec {

  test("init is idempotent and binds every table view") {
    GraftSql.init(spark, sfDir)
    GraftSql.init(spark, sfDir)
    val keyCol = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
    graft.core.Tables.names.foreach { t =>
      assert(spark.catalog.tableExists(t), s"view $t not bound")
      // the view resolves to the real relation: its key column exists
      // and the table is non-empty at every sf
      assert(spark.sql(s"SELECT ${keyCol(t)} FROM $t LIMIT 1").count() === 1,
        s"view $t empty or missing ${keyCol(t)}")
    }
  }

  test("a SQL statement equals its programmatic DataFrame twin bit-for-bit") {
    // TPC-H q1 spelled as a SQL string through the facade vs the
    // Relational builder: identical rows (modulo order).
    val viaSql = GraftSql.sql(spark, sfDir,
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(cents) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(cents * (100 - disc_bp)) AS BIGINT) AS sum_disc_micros,
        |  CAST(CAST(sum(l_quantity) AS BIGINT) * 10000 DIV count(*) AS BIGINT)
        |    AS avg_qty_x10000,
        |  CAST(sum(disc_bp) * 100 DIV count(*) AS BIGINT) AS avg_disc_x10000,
        |  count(*) AS count_order
        |FROM (SELECT l_returnflag, l_linestatus, l_quantity,
        |        CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |        CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_bp
        |      FROM lineitem WHERE l_shipdate <= '1998-09-01')
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    val viaApi = Relational.q1Pricing(spark, sfDir)
    assert(viaSql.columns.sorted.sameElements(viaApi.columns.sorted))
    val cols = viaSql.columns.sorted.toIndexedSeq
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).sortBy(_.mkString("\u0000"))
    assert(canon(viaSql).sameElements(canon(viaApi)))
  }

  test("custom graft expressions resolve inside SQL text") {
    GraftSql.init(spark, sfDir)
    val r = spark.sql(
      "SELECT nfc_lower('ÁB') AS n, char_ngrams('abcd', 3) AS g").head()
    assert(r.getString(0) == "áb")
    assert(r.getSeq[String](1) == Seq("abc", "bcd"))
  }

  test("EXISTS / NOT EXISTS decorrelate to semi + anti joins") {
    val p = GraftSql.named(spark, sfDir, "q_sql_settled_customers")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    assert(!p.toLowerCase.contains("nestedloop"), s"nested loop:\n$p")
  }

  test("catalog statements all run and agree with their oracle columns") {
    GraftSql.statements.keys.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
      assert(SparkEntry.oracleSql.contains(name), s"$name has no oracle")
    }
  }

  test("family statements are bit-equal to their DataFrame twins") {
    val twins = Map(
      "q_sql_topk" -> "q_topk",
      "q_sql_dedup_exact" -> "q_dedup_exact",
      "q_sql_events_funnel" -> "q_events_funnel",
      "q_sql_text_tfidf" -> "q_text_tfidf",
      "q_sql_knn_brute" -> "q_knn_brute",
      "q_sql_train_test_split" -> "q_train_test_split",
      "q_sql_sketch_quantile" -> "q_sketch_quantile",
      "q_sql_privacy_kanon" -> "q_privacy_kanon",
      // gaps-and-islands SQL vs the native session_window operator —
      // two different plans that must agree row-for-row
      "q_sql_events_session" -> "q_events_session",
      "q_sql_graph_pagerank" -> "q_graph_pagerank",
      // round-18 faces (statement and oracle from one shared builder)
      "q_sql_retrieval_bm25" -> "q_text_bm25",
      "q_sql_dedup_minhash" -> "q_dedup_minhash",
      "q_sql_graph_communities" -> "q_graph_communities",
      "q_sql_embed_quantize" -> "q_embed_quantize",
      "q_sql_multimodal_phash" -> "q_multimodal_phash")
    twins.foreach { case (sqlName, apiName) =>
      val viaSql = SparkEntry.queries(sqlName)(spark, sfDir)
      val viaApi = SparkEntry.queries(apiName)(spark, sfDir)
      assert(viaSql.columns.sorted.sameElements(viaApi.columns.sorted),
        s"$sqlName schema differs from $apiName")
      val cols = viaSql.columns.sorted.toIndexedSeq
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(cols.map(org.apache.spark.sql.functions.col): _*)
          .collect().map(_.toSeq).sortBy(_.mkString("\u0000"))
      val (s, a) = (canon(viaSql), canon(viaApi))
      assert(s.nonEmpty, s"$sqlName returned no rows")
      assert(s.sameElements(a), s"$sqlName != $apiName")
    }
  }

  test("init does not clobber a user view on repeat calls; rebinds a drop") {
    import spark.implicits._
    GraftSql.init(spark, sfDir)
    val nBound = spark.table("region").count()
    // user overrides a facade view; a repeat init with the SAME dir
    // must leave it alone
    Seq((999L, "mine")).toDF("r_regionkey", "r_name")
      .createOrReplaceTempView("region")
    GraftSql.init(spark, sfDir)
    assert(spark.table("region").count() === 1L, "user view was clobbered")
    try {
      // a DROPPED view is re-bound on the next init
      spark.catalog.dropTempView("region")
      GraftSql.init(spark, sfDir)
      assert(spark.table("region").count() === nBound)
    } finally GraftSql.init(spark, sfDir)
  }

  test("sqlStream(sfDir=...) resolves dimension joins in one call") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("graft-sql-stream-dim")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = graft.streaming.EventStreams.readEvents(spark, d.toString)
    val stmt =
      """SELECT c.c_mktsegment AS seg, count(*) AS n
        |FROM events_stream e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_mktsegment""".stripMargin
    val q = GraftSql.sqlStream(spark, stream, stmt, sfDir = Some(sfDir))
      .writeStream.format("memory").queryName("sql_stream_dim")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    GraftSql.init(spark, sfDir)
    val want = spark.sql(stmt.replace("events_stream", "events"))
      .collect().map(_.mkString("|")).toSet
    val got = spark.table("sql_stream_dim")
      .collect().map(_.mkString("|")).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("sliding-pulse streaming SQL == the same statement over batch") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("graft-sql-stream-slide")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = graft.streaming.EventStreams.readEvents(spark, d.toString)
    val q = GraftSql.sqlStream(spark, stream,
      GraftSql.streamStatements("stream_sliding_pulse"))
      .writeStream.format("memory").queryName("sql_stream_slide")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    GraftSql.init(spark, sfDir)
    val want = spark.sql(
      GraftSql.streamSlidingPulse.replace("events_stream", "events"))
      .collect().map(_.mkString("|")).toSet
    val got = spark.table("sql_stream_slide")
      .collect().map(_.mkString("|")).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming SQL == the same statement over the batch view") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("graft-sql-stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = graft.streaming.EventStreams.readEvents(spark, d.toString)
    val q = GraftSql.sqlStream(spark, stream, GraftSql.streamPulse)
      .writeStream.format("memory").queryName("sql_stream_pulse")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    GraftSql.init(spark, sfDir)
    val want = spark.sql(
      GraftSql.streamPulse.replace("events_stream", "events"))
      .collect().map(_.mkString("|")).toSet
    val got = spark.table("sql_stream_pulse")
      .collect().map(_.mkString("|")).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("doc profile counts normalized-distinct correctly on a planted fixture") {
    import spark.implicits._
    Seq(
      (1L, "Café au lait", "fr"),    // composed
      (2L, "Café au lait", "fr"), // decomposed NFD — same NFC form
      (3L, "CAFÉ AU LAIT", "fr"),    // case-folds to the same
      (4L, "something else", "fr"))
      .toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
    try {
      val r = spark.sql(GraftSql.statements("q_sql_doc_profile")).head()
      assert(r.getAs[Long]("n_docs") == 4L)
      assert(r.getAs[Long]("n_norm_distinct") == 2L)
    } finally spark.catalog.dropTempView("documents")
  }
}
