package graft

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.ops.Skew
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** SQL-registered custom functions, salted aggregation equivalence, and
  * source/sink format round-trips.
  */
class FunctionsSpec extends SparkSpec {

  test("custom expressions are callable from spark.sql after registration") {
    GraftFunctions.register(spark)
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT vec_id,
        |  cosine_similarity(embedding, embedding) AS self_sim,
        |  dot_product(embedding, embedding) AS self_dot,
        |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS ic
        |FROM emb_v LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    r.foreach { row =>
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
      assert(row.getDouble(2) > 0.0)
      assert(row.getLong(3) === 2L)
    }
  }

  test("text kernels are callable from spark.sql after registration") {
    GraftFunctions.register(spark)
    Tables.load(spark, sfDir, "documents").createOrReplaceTempView("docs_v")
    val r = spark.sql(
      """SELECT
        |  size(hashed_sorted_tokens(text)) AS n_tok,
        |  simhash64(text) AS sh,
        |  size(token_counts(text)) AS n_tc,
        |  size(char_ngrams(text, 3)) AS n_ng,
        |  sorted_jaccard(hashed_sorted_tokens(text),
        |                 hashed_sorted_tokens(text)) AS self_j
        |FROM docs_v LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    r.foreach { row =>
      assert(row.getInt(0) > 0)
      assert(row.getInt(2) > 0 && row.getInt(3) > 0)
      assert(row.getDouble(4) === 1.0)
    }
  }

  test("nfc_lower: ASCII fast path, NFC composition, case fold, null safety") {
    GraftFunctions.register(spark)
    val spark2 = spark
    import spark2.implicits._
    // e+combining-acute composes to precomposed e-acute; case folds;
    // pure-ASCII takes the byte path; already-lower ASCII is identity
    val d = Seq(
      (1L, "Hello WORLD"),
      (2L, "cafe\u0301 CAFE\u0301"), // DECOMPOSED e + combining acute
      (3L, "caf\u00e9 caf\u00e9"), // precomposed, already lower
      (4L, "plain ascii")).toDF("id", "text")
    val got = d.select(col("id"),
      graft.functions.text.nfc_lower(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "hello world")
    assert(got(2L) === "caf\u00e9 caf\u00e9") // composed AND folded
    assert(got(2L) === got(3L))
    assert(got(4L) === "plain ascii")
    // SQL registration + null propagation
    d.createOrReplaceTempView("nfc_v")
    val viaSql = spark.sql(
      "SELECT nfc_lower(text) FROM nfc_v WHERE id = 2").head().getString(0)
    assert(viaSql === got(2L))
    assert(spark.sql("SELECT nfc_lower(CAST(NULL AS STRING))").head().isNullAt(0))
  }

  test("pack_int8 + byte_dot_product agree with long_dot_product exactly") {
    GraftFunctions.register(spark)
    // randomized int8-range vectors, incl. the extremes
    val r = spark.sql(
      """SELECT
        |  long_dot_product(a, b) AS ld,
        |  byte_dot_product(pack_int8(a), pack_int8(b)) AS bd
        |FROM (
        |  SELECT
        |    transform(sequence(0, 63), i ->
        |      CAST(pmod(hash(id, i), 255) - 127 AS BIGINT)) AS a,
        |    transform(sequence(0, 63), i ->
        |      CAST(pmod(hash(id + 1000, i), 255) - 127 AS BIGINT)) AS b
        |  FROM range(200))""".stripMargin).collect()
    assert(r.length === 200)
    r.foreach(row => assert(row.getLong(0) === row.getLong(1)))
    // extremes survive the signed-byte round trip
    val e = spark.sql(
      """SELECT byte_dot_product(pack_int8(array(-127L, 127L)),
        |                        pack_int8(array(-127L, 127L))) AS d
        |""".stripMargin).head()
    assert(e.getLong(0) === 2L * 127L * 127L)
    // out-of-range input throws instead of silently truncating
    val ex = intercept[Exception] {
      spark.sql("SELECT pack_int8(array(128L))").collect()
    }
    assert(ex.getMessage != null)
  }

  test("md5 minhash/simhash kernels equal the composed-expression spelling") {
    // the composed spellings mirror the DuckDB oracle CTEs; the fused
    // kernels must match them bit-for-bit on real docs + edge cases
    val edge = Seq(
      (910001L, ""), (910002L, "   \t\n  "), (910003L, "one"),
      (910004L, "one two"), (910005L, " ab\fc\rd e\tf "),
      (910006L, "dup dup dup dup"), (910007L, "café 中文 café naïve 中文"))
    val d = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      .unionByName(spark.createDataFrame(edge).toDF("doc_id", "text"))
    val mh = graft.llm.Dedup.minhashSignaturesExact(d).as("k")
      .join(graft.llm.Dedup.minhashSignaturesExactExpr(d).as("e"), "doc_id")
      .select(col("doc_id"), col("k.sig").as("ks"), col("e.sig").as("es"))
      .collect()
    assert(mh.nonEmpty)
    mh.foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2),
      s"minhash md5 kernel mismatch doc ${r.getLong(0)}"))
    val sh = graft.llm.Dedup.simhashExact(d).as("k")
      .join(graft.llm.Dedup.simhashExactExpr(d).as("e"), "doc_id")
      .select(col("doc_id"), col("k.simhash").as("ks"), col("e.simhash").as("es"))
      .collect()
    assert(sh.nonEmpty)
    sh.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"simhash md5 kernel mismatch doc ${r.getLong(0)}"))
    // winnow gram hashes: fused kernel == composed md5/conv spelling
    val toks = graft.llm.TextOps.wsTokens(col("text"))
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val composed = when(size(toks) >= 4,
      transform(sequence(lit(1), size(toks) - 3),
        i => h60(concat_ws(" ", slice(toks, i, lit(4))))))
      .otherwise(array(h60(concat_ws(" ", toks))))
    val wg = d.select(col("doc_id"),
        graft.functions.text.winnow_grams_md5(col("text"), 4).as("ks"),
        composed.as("es"))
      .collect()
    assert(wg.nonEmpty)
    wg.foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2),
      s"winnow gram kernel mismatch doc ${r.getLong(0)}"))
  }

  test("winnow_grams_md5 is callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT winnow_grams_md5('a b c d e', 4) AS g").head()
    assert(r.getSeq[Long](0).length === 2) // 5 tokens, k=4 -> 2 grams
  }

  test("sorted_intersect_count agrees with array_intersect semantics") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  sorted_intersect_count(array(1L,2L,3L), array(4L,5L)) AS disjoint,
        |  sorted_intersect_count(CAST(array() AS ARRAY<BIGINT>), array(1L)) AS empty,
        |  sorted_intersect_count(array(1L,2L,3L), array(1L,2L,3L)) AS same
        |""".stripMargin).head()
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === 3L)
  }

  test("text kernels match their Column-expression formulations") {
    // Pins TextKernels' numeric-compatibility invariants: byte-level
    // tokenize+hash must equal split("\\s+")+xxhash64, per doc, on the
    // real corpus plus whitespace/short-doc edge cases.
    import graft.functions.text._
    import graft.llm.TextOps
    val edge = Seq(
      (900001L, ""), (900002L, "   \t\n  "), (900003L, "one"),
      (900004L, "one two"), (900005L, " ab\fc\rd e\tf "),
      (900006L, "dup dup dup"), (900007L, "café 中文 café"))
    val d = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      .unionByName(spark.createDataFrame(edge).toDF("doc_id", "text"))
    val toks = TextOps.wsTokens(col("text"))
    // TokenHashKernelRule would rewrite the composed side INTO the
    // kernel (making this compare kernel vs kernel) — suspend any
    // session-installed extra optimizations for the comparison
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val rows =
      try d.select(
        hashed_sorted_tokens(col("text")).as("k_toks"),
        sort_array(array_distinct(transform(toks, t => xxhash64(t))))
          .as("e_toks"))
        .collect()
      finally spark.experimental.extraOptimizations = saved
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"token hash mismatch: $r")
    }
    // token_counts (letter-run TF map) vs the explode+count formulation
    val tcRows = d.select(col("doc_id"),
      graft.functions.text.token_counts(col("text")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getMap[String, Long](1)).toMap
    d.collect().foreach { r =>
      val id = r.getLong(0)
      val expected = r.getString(1).split("[^\\p{L}]+").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(tcRows(id).toMap === expected, s"token_counts mismatch doc $id")
    }

    // simhash + minhash checked against a direct Scala reimplementation
    // from the *string* tokens (independent of byte scanning)
    val local = d.collect().map(r => (r.getLong(0), r.getString(1)))
    val got = d.select(col("doc_id"), simhash64(col("text")).as("s"),
      minhash_signature(col("text"), Seq(7L, 13L), Seq(3L, 5L), 2147483647L)
        .as("m")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val P = 2147483647L
    def xxh(s: String): Long = {
      val b = s.getBytes("UTF-8")
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }
    local.foreach { case (id, text) =>
      val tk = text.split("\\s+").filter(_.nonEmpty)
      val votes = new Array[Int](64)
      tk.foreach { t =>
        val h = xxh(t)
        (0 until 64).foreach(b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      val expSim = (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
      assert(got(id)._1 === expSim, s"simhash mismatch doc $id")
      val shingles =
        if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).toSeq
        else Seq(tk.mkString(" "))
      val expMh = Seq((7L, 3L), (13L, 5L)).map { case (a, b) =>
        shingles.map { sh =>
          val h = ((xxh(sh) % P) + P) % P
          (h * a + b) % P
        }.min
      }
      assert(got(id)._2 === expMh, s"minhash mismatch doc $id")
    }
  }

  test("minhash SQL kernel rewrites: equivalence and rule firing") {
    GraftFunctions.register(spark)
    // 1) element-wise equivalence of both kernels vs the composed
    // expressions they replace, on real docs + edge cases — with the
    // rewrite rule SUSPENDED so the composed side stays composed
    import spark.implicits._
    val edge = Seq(
      (900001L, Seq("a", "bb", "ccc")),
      (900002L, Seq.empty[String]),
      (900003L, Seq("", "x")))
    val ss = edge.toDF("id", "ss")
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    try {
      val p = 2147483647L
      val composed = ss.selectExpr("id",
        s"transform(ss, s -> CAST(conv(substring(md5(CAST(s AS BINARY)), 1, 8), 16, 10) AS BIGINT) % $p) AS hh")
        .selectExpr("id", "hh",
          s"array_min(transform(hh, h -> (h * 1234567 + 42) % $p)) AS m")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.getSeq[Long](1)).map(_.toList),
            if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
      val kernel = ss.select(col("id"),
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.functions.Md5Head8Mod(
            org.apache.spark.sql.graftbridge.Bridge.expression(col("ss")),
            p)).as("hh"))
        .select(col("id"), col("hh"),
          org.apache.spark.sql.graftbridge.Bridge.column(
            graft.functions.AffineMinMod(
              org.apache.spark.sql.graftbridge.Bridge.expression(col("hh")),
              1234567L, 42L, p)).as("m"))
        .collect().map(r => r.getLong(0) ->
          ((Option(r.getSeq[Long](1)).map(_.toList),
            if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
      assert(composed === kernel)
      assert(kernel(900002L)._2.isEmpty) // empty array -> null min
    } finally spark.experimental.extraOptimizations = saved
    // 2) the rule actually FIRES on the spec-pinned SQL face (drift
    // guard: a Spark parse-tree change that stops the match is a
    // silent perf regression)
    val plan = graft.sql.GraftSql
      .named(spark, sfDir, "q_sql_dedup_minhash")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("affine_min_mod") && plan.contains("md5_head8_mod"),
      s"MinhashSqlKernelRule did not fire on q_sql_dedup_minhash:\n" +
        plan.take(2000))
  }

  test("unit_quantize_int8 kernel matches the HOF-chain formulation") {
    // Pins the r19 kernel replacement of withUnitQuantized's
    // transform/aggregate chain: same qn values AND the same
    // null/dropped-row contract, on the real embeddings plus edge
    // cases (zero vector, empty array, NaN element, null element,
    // exact .5 rounding boundaries).
    import graft.functions.vector.unit_quantize_int8
    val edge = Seq(
      (900001L, Array(0.0f, 0.0f)),              // zero norm -> null
      (900002L, Array.empty[Float]),             // empty -> null
      (900004L, Array(3.0f, 4.0f)),              // exact norm 5
      (900005L, Array(1.0f, 1.0f, 1.0f, 1.0f)))  // .5-boundary-ish
    val e = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
      .unionByName(spark.createDataFrame(edge).toDF("vec_id", "embedding"))
    val chain = e
      .select(col("vec_id"),
        transform(col("embedding"), v => v.cast("double")).as("emb"))
      .withColumn("nrm", nullif(
        sqrt(aggregate(transform(col("emb"), v => v * v),
          lit(0.0), (acc, x) => acc + x)), lit(0.0)))
      .select(col("vec_id"), when(col("nrm").isNotNull,
        transform(col("emb"), v =>
          round(v / col("nrm") * lit(127.0), 0).cast("bigint"))).as("qn"))
    val kernel = e.select(col("vec_id"),
      unit_quantize_int8(col("embedding")).as("qn"))
    val cm = chain.collect().map(r =>
      r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toList)).toMap
    val km = kernel.collect().map(r =>
      r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toList)).toMap
    assert(cm.keySet === km.keySet)
    cm.foreach { case (id, v) =>
      assert(km(id) === v, s"qn mismatch for vec $id")
    }
    assert(km(900001L).isEmpty && km(900002L).isEmpty)
    assert(km(900004L).contains(List(76L, 102L)))
    // non-finite input fails loudly (the old chain's ANSI bigint cast
    // threw there too — never a silent zero)
    val nan = spark.createDataFrame(Seq((1L, Array(Float.NaN, 1.0f))))
      .toDF("vec_id", "embedding")
    intercept[Exception] {
      nan.select(unit_quantize_int8(col("embedding"))).collect()
    }
  }

  test("salted aggregation == direct aggregation") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val salted = Skew.saltedSumCount(
      li, Seq("l_returnflag", "l_linestatus"), "l_quantity", buckets = 8)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSet
    val direct = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(salted === direct)
  }

  test("approximate aggregates land within sketch error of exact values") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val approx = graft.ops.Relational.qApproxAgg(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(5)))
      .toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("d"),
        expr("median(l_extendedprice)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (d, m)) =>
      val (ad, am) = approx(flag)
      // HLL (m=256, linear-counting in the n < 2.5m regime this tiny
      // SF sits in): LC error grows as the occupancy estimate's
      // variance at a few hundred distincts — bound at 25%; at real
      // scale the raw-HLL regime applies with ~6.5% std error
      assert(math.abs(ad - d) / d < 0.25,
        s"$flag: hll distinct $ad vs exact $d")
      // 25% hash-sample median: ~sqrt(n) error on a few hundred
      // samples at sf0.001 — bound at 15% (at real scale the sample is
      // millions of rows and the error vanishes)
      assert(math.abs(am - m) / m < 0.15,
        s"$flag: sampled median $am vs exact $m")
    }
  }

  test("csv and json sinks/sources round-trip the documents table") {
    val d = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "source", "n_chars")  // text has newlines-free synthetic content but keep it simple
    val base = Files.createTempDirectory("graft-formats").toString
    d.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    d.write.mode("overwrite").json(s"$base/json")
    val fromCsv = spark.read.option("header", "true")
      .schema(d.schema).csv(s"$base/csv")
    val fromJson = spark.read.schema(d.schema).json(s"$base/json")
    def key(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    assert(key(fromCsv) === key(d))
    assert(key(fromJson) === key(d))
  }

  test("count-min sketch and bloom filter obey their error contracts") {
    // the remaining sketch family beyond HLL/approx-quantile: both are
    // mergeable fixed-size summaries (the only viable distinct/filter
    // state at 100 TB); Spark exposes them via DataFrameStatFunctions
    val orders = Tables.load(spark, sfDir, "orders")
    val n = orders.count()
    // CMS estimate >= true count, within eps * total (w.h.p.)
    val cms = orders.stat.countMinSketch(
      "o_orderpriority", eps = 0.01, confidence = 0.99, seed = 42)
    val truth = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS under-counted $k")
      assert(est <= c + (0.01 * n).toLong + 1, s"CMS over-counted $k: $est vs $c")
    }
    // Bloom filter: zero false negatives; FPP near configured
    val bloom = orders.stat.bloomFilter("o_orderkey", expectedNumItems = n, fpp = 0.03)
    val keys = orders.select("o_orderkey").collect().map(_.getLong(0))
    assert(keys.forall(bloom.mightContain), "bloom false negative")
    val misses = (1 to 20000).map(i => -i.toLong)
      .count(bloom.mightContain)
    assert(misses <= 20000 * 0.06, s"bloom fpp too high: $misses/20000")
  }

  test("orc sink/source round-trips with predicate pushdown") {
    val d = Tables.load(spark, sfDir, "documents")
    val base = Files.createTempDirectory("graft-orc").toString
    d.write.mode("overwrite").orc(s"$base/orc")
    val back = spark.read.orc(s"$base/orc")
    assert(back.collect().map(_.mkString("|")).toSet ===
      d.collect().map(_.mkString("|")).toSet)
    // ORC scans take pushed filters like parquet ones
    val p = back.filter(col("doc_id") === 42L).queryExecution
      .executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,42)]"),
      s"orc pushdown missing:\n$p")
  }
}
