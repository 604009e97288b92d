package graft

import graft.ops.{AsOfJoin, IntervalJoin}
import org.apache.spark.sql.functions.col

/** Error-path contracts: misuse must fail FAST with a clear message,
  * not produce silently wrong results at scale.
  */
class RobustnessSpec extends SparkSpec {

  import spark.implicits._

  private lazy val l = Seq((1, 10L, "x")).toDF("k", "lt", "v")
  private lazy val r = Seq((1, 5L, "y")).toDF("k", "rt", "w")

  test("as-of join rejects colliding payload column names") {
    val rBad = Seq((1, 5L, "y")).toDF("k", "rt", "v") // v collides
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, rBad, Seq("k"), "lt", "rt")
    }
    assert(e.getMessage.contains("collision"))
  }

  test("as-of join rejects tieBreak columns that are not right payload") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt", tieBreak = Seq("nope"))
        .collect()
    }
    assert(e.getMessage.contains("tieBreak"))
  }

  test("native as-of rejects unknown columns by name") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, r, Seq("k"), "lt", "missing")
    }
    assert(e.getMessage.contains("missing"))
  }

  test("native as-of rejects mismatched key/time types at construction") {
    graft.functions.GraftFunctions.register(spark)
    // int key on the left vs bigint key on the right: the merge's
    // comparators are built from left types, so this must fail fast
    // instead of reading right rows with the wrong accessor.
    val rLong = Seq((1L, 5L, "y")).toDF("k", "rt", "w")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, rLong, Seq("k"), "lt", "rt")
    }
    assert(e.getMessage.contains("key types"))
    val rIntTime = Seq((1, 5, "y")).toDF("k", "rt", "w")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, rIntTime, Seq("k"), "lt", "rt")
    }
    assert(e2.getMessage.contains("time types"))
  }

  test("int8 quantization survives an all-zero embedding") {
    // zero vector => scale 0 => v/scale NaN => ANSI bigint cast crash
    // without the nullif guard; with it the row comes back NULL-quantized
    val df = Seq(
      (1L, Array(0f, 0f, 0f), "a"),
      (2L, Array(1f, -2f, 3f), "a")).toDF("vec_id", "embedding", "label")
    val out = graft.llm.Similarity.quantizeInt8(df)
      .orderBy("vec_id").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(out(0).fieldIndex("scale_r")))
    assert(out(0).isNullAt(out(0).fieldIndex("q_min")))
    assert(!out(1).isNullAt(out(1).fieldIndex("scale_r")))
    assert(out(1).getLong(out(1).fieldIndex("q_max")) == 127L)
  }

  test("session cache evicts a session's entries") {
    val c = new graft.core.SessionCache[String, Int]
    c.getOrElseUpdate(spark, "a")(1)
    c.getOrElseUpdate(spark, "b")(2)
    assert(c.size == 2)
    c.evict(spark)
    assert(c.size == 0)
    // re-populate after evict works (hook registry is per-context and
    // survives a manual evict — no listener stacking)
    assert(c.getOrElseUpdate(spark, "a")(3) == 3)
  }

  test("session cache stays bounded under newSession() churn") {
    // Per-request sessions on one shared context never fire
    // onApplicationEnd, so without the LRU session bound every churned
    // session's entries would accumulate until the CONTEXT died.
    val c = new graft.core.SessionCache[String, Int](maxSessions = 8)
    (1 to 100).foreach { i =>
      val s = spark.newSession()
      c.getOrElseUpdate(s, "a")(i)
      c.getOrElseUpdate(s, "b")(i)
    }
    assert(c.size <= 16, // 8 sessions x 2 keys
      s"cache grew to ${c.size} entries across 100 churned sessions")
    // the ACTIVE session's entries survive churn: touch one session
    // throughout and verify its value is still memoized at the end
    val live = spark.newSession()
    c.getOrElseUpdate(live, "pinned")(7)
    (1 to 20).foreach { i =>
      val s = spark.newSession()
      c.getOrElseUpdate(s, "a")(i)
      assert(c.getOrElseUpdate(live, "pinned")(-1) == 7,
        "recently-used session must not be evicted by churn")
    }
  }

  test("decontamination/survivors handle degenerate corpora") {
    import graft.llm.Dedup
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val one = Seq((1L, "only one document here")).toDF("doc_id", "text")
    // empty reference: nothing can be contaminated
    assert(Dedup.decontaminate(one, empty).count() === 0)
    // empty corpus: nothing to flag
    assert(Dedup.decontaminate(empty, one).count() === 0)
    // blank texts on either side don't crash and don't match
    val blank = Seq((2L, "")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(blank, one).count() === 0)
    // survivors of an empty corpus / singleton corpus
    assert(Dedup.dedupSurvivors(empty).count() === 0)
    val sv = Dedup.dedupSurvivors(one).collect()
    assert(sv.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 1L)))
  }

  test("dedup joins handle degenerate corpora (empty, single-doc, blank texts)") {
    import graft.llm.Dedup
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(empty).count() === 0)
    assert(Dedup.prefixDups(empty).count() === 0)
    val one = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(one).count() === 0)
    assert(Dedup.prefixDups(one).count() === 0)
    // blank texts: empty token sets pair with nothing under Jaccard,
    // but "" IS a strict prefix of every non-empty text
    val blank = Seq((1L, ""), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(blank).count() === 0)
    assert(Dedup.prefixDups(blank).collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet === Set((1L, 3L), (2L, 3L)))
  }

  test("kll sketch handles degenerate corpora (empty, single doc)") {
    import graft.llm.CorpusOps
    val empty = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "source", "n_chars")
    assert(CorpusOps.kllSketch(empty).count() === 0)
    val one = Seq((1L, "s0", 42L)).toDF("doc_id", "source", "n_chars")
    val rows = CorpusOps.kllSketch(one).collect()
      .map(r => r.getString(0) -> (r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    // level 0, sample = the doc itself: estimate IS the exact median
    assert(rows.keySet === Set("s0", "__all__"))
    rows.values.foreach { case (est, exact, err) =>
      assert(est === 42L && exact === 42L && err === 0L)
    }
  }

  test("classifier training stays well-formed on a tiny corpus") {
    import graft.llm.Curation
    val tiny = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "alpha delta"), (4L, "beta epsilon"))
      .toDF("doc_id", "text")
    val curve = Curation.classifierTrain(tiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(curve.length === 9)
    // loss never increases (strict decrease needs a corpus where the
    // visible permille loss can move every round; 4 docs can plateau)
    curve.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"loss rose: $a -> $b")
    }
    assert(curve.forall(t => t._3 >= 0 && t._3 <= 4))
  }

  test("pca returns the zero panel on an empty corpus") {
    import graft.llm.Similarity
    val empty = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.pcaPower(empty).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 64)
    assert(got.forall(t => t._2 === 0L && t._3 === 0L))
  }

  test("scatter/drift handle degenerate corpora (empty, single vector)") {
    import graft.llm.Similarity
    val empty = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.scatterByLabel(empty).count() === 0)
    assert(Similarity.embeddingDrift(empty).count() === 0)
    // a single vector: zero scatter (n*x_i*x_j == S_i*S_j), panel sane
    val one = Seq((1L, Seq.fill(64)(1.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val row = Similarity.scatterByLabel(one).collect()
    assert(row.length === 1)
    assert(row.head.getLong(0) === 3L && row.head.getLong(1) === 1L)
    assert(row.head.getLong(2) === 0L, "single-vector scatter is zero")
    // one odd-id vector: no baseline cohort, PSI finite via smoothing
    val drift = Similarity.embeddingDrift(one).collect()
    assert(drift.length === 1 && !drift.head.getDouble(4).isNaN)
  }

  test("session cache: racing first accesses compute the value exactly once") {
    val c = new graft.core.SessionCache[String, Int]
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val results = (1 to 8).map(_ => pool.submit(
        new java.util.concurrent.Callable[Int] {
          def call(): Int = c.getOrElseUpdate(spark, "expensive") {
            Thread.sleep(50) // widen the race window
            computes.incrementAndGet()
            42
          }
        }))
      assert(results.map(_.get()).toSet === Set(42))
      assert(computes.get() === 1,
        s"value thunk ran ${computes.get()} times — codebook-sized work " +
          "must not duplicate under concurrent first access")
    } finally pool.shutdown()
  }

  test("interval join rejects non-positive windows") {
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.within(l, r, Seq("k"), "lt", "rt", 0L)
    }
    assert(e.getMessage.contains("window"))
  }

  test("text kernels reject non-string input at analysis time") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("simhash64"))
  }

  test("vector kernels reject mismatched types at analysis time") {
    graft.functions.GraftFunctions.register(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_jaccard(array('a'), array('b'))").collect()
    }
  }

  test("audio envelope hash survives clips past the Int*64 overflow point") {
    // 34M samples: i*64 overflows Int (negative window index) unless
    // the index math is done in Long — a ~35-minute 16 kHz clip
    val n = 34000000
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = ((i % 251) - 125).toShort; i += 1 }
    val blob = graft.llm.WavCodec.encode(16000, samples)
    val media = Seq((1L, blob)).toDF("doc_id", "media")
    val h = graft.llm.Multimodal.audioHashes(spark, media).collect()
    assert(h.length === 1)
    assert(h(0).getLong(0) === 1L) // doc survived; not crashing IS the test
    // determinism across two runs of the same clip
    val h2 = graft.llm.Multimodal.audioHashes(spark, media).collect()
    assert(h2(0).getLong(1) === h(0).getLong(1))
  }

  test("event operators return empty results on an empty stream, not errors") {
    import org.apache.spark.sql.types._
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    // zero-event day: every derived table must be empty, never a crash
    assert(graft.ops.EventOps.markovTransitions(emptyEvents).count() === 0)
    assert(graft.ops.EventOps.gapFill(emptyEvents).count() === 0)
    assert(graft.ops.EventOps.scd2States(emptyEvents).count() === 0)
    assert(graft.ops.EventOps.featuresAtPurchase(emptyEvents).count() === 0)
    assert(graft.ops.EventOps.attribution(emptyEvents).count() === 0)
    assert(graft.ops.EventOps.holtForecast(emptyEvents).count() === 0)
    assert(graft.ops.EventOps.holtDaily(emptyEvents).count() === 0)
    // a zero-user experiment: the panels surface an all-NULL stat row
    // or nothing, never a division crash
    assert(graft.ops.EventOps.abCuped(emptyEvents).count() === 0)
    val mwu = graft.ops.EventOps.abMannWhitney(emptyEvents).collect()
    assert(mwu.length <= 1 &&
      mwu.forall(r => r.isNullAt(0) || r.getLong(0) == 0L))
  }

  test("attribution: touchless and trailing-touch journeys route exactly") {
    import java.time.LocalDateTime
    def t(m: Int) = LocalDateTime.of(2026, 1, 1, 0, m)
    val ev = Seq(
      // user 1: view -> purchase(300) -> click -> (no further purchase)
      (1L, t(1), 1L, "view", 0.0),
      (2L, t(2), 1L, "purchase", 3.0),
      (3L, t(3), 1L, "click", 0.0),
      // user 2: purchase(500) with no touches at all -> 'direct'
      (4L, t(1), 2L, "purchase", 5.0),
      // user 3: three touches then purchase(1000); linear = 334/333/333
      (5L, t(1), 3L, "view", 0.0),
      (6L, t(2), 3L, "click", 0.0),
      (7L, t(3), 3L, "view", 0.0),
      (8L, t(4), 3L, "purchase", 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.attribution(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // user 1's trailing click never converts and is dropped entirely
    // channel -> (n_touches, n_first, n_last, first, last, linear)
    assert(got("direct") === ((1L, 1L, 1L, 500L, 500L, 500L)))
    // views: u1's single touch (300 all three ways) + u3's rank-1
    // (first: 1000, linear 334) and rank-3 (last: 1000, linear 333)
    assert(got("view") === ((3L, 2L, 2L, 1300L, 1300L, 967L)))
    // u3's middle click: no first/last credit, linear 333
    assert(got("click") === ((1L, 0L, 0L, 0L, 0L, 333L)))
    val total = got.values.map(_._6).sum
    assert(total === 1800L, "linear credits must sum to total conversions")
  }

  test("ewmaDaily matches a hand-computed integer recurrence") {
    import java.time.LocalDateTime
    def day(d: Int, h: Int = 12) = LocalDateTime.of(2026, 1, d, h, 0)
    val ev = Seq(
      // user 1: day1 = 800c, day2 quiet (0), day3 = 100c + 60c,
      // day4 = 6000c (spike: 6000 > 4 * s3)
      (1L, day(1), 1L, "purchase", 8.0),
      (2L, day(3), 1L, "purchase", 1.0),
      (3L, day(3, 18), 1L, "purchase", 0.6),
      (4L, day(4), 1L, "purchase", 60.0),
      // noise the filter must drop
      (5L, day(2), 1L, "click", 99.0),
      // user 2: a single purchase day — no spikes possible
      (6L, day(5), 2L, "purchase", 2.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.ewmaDaily(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // user 1 by hand: s1 = 800; s2 = (7*800+0)/8 = 700;
    // s3 = (7*700+160)/8 = floor(5060/8) = 632;
    // day4: 6000 > 4*632 = 2528 -> spike;
    // s4 = (7*632+6000)/8 = 10424/8 = 1303
    assert(got(1L) === ((4L, 1303L, 1L)))
    assert(got(2L) === ((1L, 250L, 0L)))
  }

  test("holtForecast matches a hand-computed level/trend recurrence") {
    import java.time.LocalDateTime
    def day(d: Int) = LocalDateTime.of(2026, 2, d, 12, 0)
    // band 0 (user 3): y = [1000, 2000, 0 (gap day), 3000] cents.
    // By hand (alpha=300, beta=100, DIV truncating):
    //   init level=1000 trend=0
    //   y=2000: err=1000; level=(600000+700000)/1000=1300;
    //           trend=(100*300)/1000=30
    //   y=0:    f=1330, err=1330; level=931000/1000=931;
    //           trend=(-36900+27000)/1000=-9   (trunc toward zero)
    //   y=3000: f=922, err=2078; level=1545400/1000=1545;
    //           trend=(61400-8100)/1000=53
    // final: forecast=1598, mae=4408 DIV 3=1469
    val ev = Seq(
      (1L, day(1), 3L, "purchase", 10.0),
      (2L, day(2), 3L, "purchase", 20.0),
      (3L, day(4), 3L, "purchase", 30.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.holtForecast(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap
    assert(got(0L) === ((4L, 1545L, 53L, 1598L, 1469L)))
    // empty bands ride the dense grid: all-zero series, zero state
    assert(got(1L) === ((4L, 0L, 0L, 0L, 0L)))
    assert(got(2L) === ((4L, 0L, 0L, 0L, 0L)))
  }

  test("cusumDaily alarms on a planted persistent shift and stays quiet on flat") {
    import java.time.LocalDateTime
    def day(d: Int) = LocalDateTime.of(2026, 2, d, 12, 0)
    // band 0 (user 3): 7 warmup days at 1000 cents -> mu=1000, k=50,
    // h=1000; then a +50% persistent shift (1500/day) that NO single
    // day would flag. pos accumulates 450/day: 450, 900, alarm at
    // 1350 on day 10, reset, and again on day 13 — the sequential-
    // detection behavior the panel exists for. band 1 (user 4): flat
    // 1000 throughout -> both statistics pinned at 0, zero alarms.
    // band 2: empty -> all-zero series, mu=0, zero alarms.
    val ev = ((1 to 14).map(d =>
      (d.toLong, day(d), 3L, "purchase", if (d <= 7) 10.0 else 15.0)) ++
      (1 to 14).map(d => (100L + d, day(d), 4L, "purchase", 10.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.cusumDaily(ev).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.getDayOfMonth) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet.map(_._2) === (8 to 14).toSet)
    val band0 = (8 to 14).map(d => got((0L, d)))
    assert(band0.map(_._1) === Seq(450L, 900L, 1350L, 450L, 900L, 1350L, 450L),
      s"pos path: $band0")
    assert(band0.map(_._3) === Seq(0L, 0L, 1L, 0L, 0L, 1L, 0L),
      s"alarm path: $band0")
    assert(band0.forall(_._2 === 0L), s"neg must stay 0 on an up-shift: $band0")
    (8 to 14).foreach { d =>
      assert(got((1L, d)) === ((0L, 0L, 0L)), s"flat band day $d")
      assert(got((2L, d)) === ((0L, 0L, 0L)), s"empty band day $d")
    }
  }

  test("acfDaily matches an exact in-memory Pearson replay per lag") {
    import java.time.LocalDateTime
    def day(d: Int) = LocalDateTime.of(2026, 3, d, 12, 0)
    // user 1 -> band 1; series over the day-1..5 grid (day 4 is a gap
    // the dense grid must zero-fill): [100, 200, 300, 0, 500] cents
    val ev = Seq(
      (1L, day(1), 1L, "purchase", 1.0),
      (2L, day(2), 1L, "purchase", 2.0),
      (3L, day(3), 1L, "purchase", 3.0),
      (4L, day(5), 1L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val series = Seq(100L, 200L, 300L, 0L, 500L)
    def replay(lag: Int): Option[Double] = {
      val pairs = series.dropRight(lag).zip(series.drop(lag))
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
      if (den == 0) None
      else Some(BigDecimal((n * sxy - sx * sy).toDouble /
        math.sqrt(den.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.ops.EventOps.acfDaily(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    // span 5 days -> only lags 1..4 produce pairs; 3 bands x 4 lags
    assert(got.size === 12)
    (1 to 4).foreach { lag =>
      assert(got((1L, lag.toLong)) === (((5 - lag).toLong, replay(lag))),
        s"lag $lag")
      // bands 0 and 2 are all-zero series: zero variance -> NULL acf
      assert(got((0L, lag.toLong)) === (((5 - lag).toLong, None)))
      assert(got((2L, lag.toLong)) === (((5 - lag).toLong, None)))
    }
  }

  test("jackknifeSe: constant metric has zero SE; spread metric > 0") {
    import java.time.LocalDateTime
    def t(u: Int) = LocalDateTime.of(2026, 3, 1, 0, u)
    // 8 users, identical totals: every leave-block-out mean equals the
    // grand mean, so the jackknife variance is EXACTLY zero whatever
    // the hash assigns
    val flat = (1 to 8).map(u => (u.toLong, t(u), u.toLong, "purchase", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val rowsF = graft.ops.EventOps.jackknifeSe(flat).collect()
    assert(rowsF.map(_.getLong(1)).sum === 8L) // users conserved
    rowsF.foreach { r =>
      assert(r.getLong(2) <= 32L) // block count bounded by design
      assert(r.getLong(3) === 200000000L) // 200 cents in micros
      if (r.getLong(1) >= 2 && !r.isNullAt(4))
        assert(r.getDouble(4) === 0.0, s"variant ${r.getString(0)}")
    }
    // now spread the totals: any variant with >= 2 users in >= 2
    // blocks must report strictly positive SE
    val spread = (1 to 8).map(u =>
      (u.toLong, t(u), u.toLong, "purchase", u.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val rowsS = graft.ops.EventOps.jackknifeSe(spread).collect()
    assert(rowsS.exists(r =>
      r.getLong(2) >= 2 && !r.isNullAt(4) && r.getDouble(4) > 0.0))
  }

  test("funnelSteps enforces step ordering (pre-view clicks don't count)") {
    import java.time.LocalDateTime
    def t(i: Int) = LocalDateTime.of(2026, 4, 1, 0, i)
    val ev = Seq(
      // u1 walks the whole funnel in order
      (1L, t(1), 1L, "view", 0.0), (2L, t(2), 1L, "click", 0.0),
      (3L, t(3), 1L, "purchase", 5.0),
      // u2: click BEFORE the first view, purchase after — the click
      // must not count, so the purchase has no qualifying click either
      (4L, t(1), 2L, "click", 0.0), (5L, t(2), 2L, "view", 0.0),
      (6L, t(3), 2L, "purchase", 5.0),
      // u3: view then click, never buys
      (7L, t(1), 3L, "view", 0.0), (8L, t(2), 3L, "click", 0.0),
      // u4: purchase only — reaches no step
      (9L, t(1), 4L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.funnelSteps(ev).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === (("view", 3L, 10000L)))             // u1 u2 u3
    assert(got(2L) === (("click_after_view", 2L, 6666L)))  // u1 u3 only
    assert(got(3L) === (("purchase_after_click", 1L, 5000L))) // u1 only
  }

  test("abExperiment: stable hash split, panel arithmetic, B-A row") {
    import java.time.LocalDateTime
    // independent replay of the salted-hash splitter (md5 of
    // "ab:<user_id>", first 15 hex chars as a 60-bit long, mod 2)
    def variant(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ab:$u".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) "A"
      else "B"
    }
    def t(i: Int) = LocalDateTime.of(2026, 2, 1, i, 0)
    // 6 users: everyone views; 1 and 2 purchase; 3 errors twice
    val rows = Seq(
      (1L, t(1), 1L, "view", 0.0), (2L, t(2), 1L, "purchase", 10.0),
      (3L, t(1), 2L, "view", 0.0), (4L, t(2), 2L, "purchase", 2.5),
      (5L, t(3), 2L, "purchase", 2.5),
      (6L, t(1), 3L, "view", 0.0), (7L, t(2), 3L, "error", 0.0),
      (8L, t(3), 3L, "error", 0.0),
      (9L, t(1), 4L, "view", 0.0), (10L, t(1), 5L, "view", 0.0),
      (11L, t(1), 6L, "view", 0.0))
    val ev = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    // expected panel replayed on plain collections
    val byVar = rows.groupBy { case (_, _, u, _, _) => variant(u) }
    def panel(v: String): (Long, Long, Long, Long, Long, Long, Long) = {
      val evs = byVar.getOrElse(v, Seq.empty)
      val users = evs.map(_._3).distinct
      val nU = users.size.toLong
      val pur = evs.filter(_._4 == "purchase")
      val conv = pur.map(_._3).distinct.size.toLong
      val cents = pur.map(e => math.round(e._5 * 100)).sum
      val nErr = evs.count(_._4 == "error").toLong
      (nU, conv, conv * 1000 / nU, pur.size.toLong, cents, cents / nU,
        nErr * 1000 / evs.size)
    }
    val got = graft.ops.EventOps.abExperiment(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got("A") === panel("A"))
    assert(got("B") === panel("B"))
    val (a, b, d) = (got("A"), got("B"), got("B-A"))
    assert(d === ((b._1 - a._1, b._2 - a._2, b._3 - a._3, b._4 - a._4,
      b._5 - a._5, b._6 - a._6, b._7 - a._7)),
      "B-A row must be the per-metric difference of the derived panels")
  }

  test("entity resolution: blocking gates, fuzzy verify, TRANSITIVE golden fusion") {
    // chain fixture: 1-2 and 2-3 are each one edit apart but 1-3 is
    // TWO (past maxEdit), so a single entity for {1,2,3} proves real
    // connected components, not pair-grouping; 4 shares the block with
    // a distant name (verifier must reject); 5 shares the NAME but not
    // the block (blocking is a hard gate, the scale contract)
    val p = Seq(
      (1L, "red widget", "Brand#1", "ECONOMY", 10, 9.00),
      (2L, "red widgetx", "Brand#1", "ECONOMY", 10, 9.50),
      (3L, "red widgetxx", "Brand#1", "ECONOMY", 10, 8.00),
      (4L, "blue bolt", "Brand#1", "ECONOMY", 10, 7.00),
      (5L, "red widget", "Brand#2", "ECONOMY", 10, 9.00))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val pairs = graft.ops.EntityOps.entityPairs(p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 1L), (2L, 3L, 1L)))
    val golden = graft.ops.EntityOps.goldenRecords(p).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toMap
    assert(golden(1L) === ((3L, 3L, "red widget", 800L, 950L)),
      "chain {1,2,3} must fuse into one entity with survivor=min key")
    assert(golden(4L) === ((1L, 1L, "blue bolt", 700L, 700L)))
    assert(golden(5L) === ((1L, 1L, "red widget", 900L, 900L)))
    assert(golden.size === 3)
  }

  test("abBootstrap: constant metric collapses the CI to the point estimate") {
    import java.time.LocalDateTime
    // 200 users, every one with exactly one 5.00 purchase: any
    // reweighting of a constant is the constant, so all 32 resample
    // means equal 500 cents in both variants and the rank-based CI is
    // degenerate [point, point] — a sharp check of the weight/rank
    // plumbing with no distributional slack
    val rows = (1L to 200L).map(u =>
      (u, LocalDateTime.of(2026, 2, 1, (u % 24).toInt, 0), u,
        "purchase", 5.0))
    val ev = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.abBootstrap(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("A") === ((500L, 500L, 500L, 32L)))
    assert(got("B") === ((500L, 500L, 500L, 32L)))
    assert(got("B-A") === ((0L, 0L, 0L, 32L)))
    // and on the real table: the CI must bracket its point estimate
    val real = graft.ops.EventOps.abBootstrap(
      graft.core.Tables.load(spark, sfDir, "events")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(real.length === 3)
    real.foreach { case (v, p, lo, hi) =>
      assert(lo <= p && p <= hi, s"$v: CI [$lo, $hi] misses point $p")
      assert(lo < hi, s"$v: CI degenerate on real (non-constant) data")
    }
  }

  test("pq survives duplicate and degenerate vectors") {
    // 20 identical vectors + 20 distinct: seeds collapse to few
    // distinct centroids, most cells go empty and must keep their
    // previous centroid instead of dividing by zero
    val e = spark.range(40).select(
      col("id").as("vec_id"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(
          org.apache.spark.sql.functions.lit(0),
          org.apache.spark.sql.functions.lit(63)),
        i => org.apache.spark.sql.functions.when(
          col("id") < 20, org.apache.spark.sql.functions.lit(1.0f))
          .otherwise((i + col("id")).cast("float") / 64.0f))
        .as("embedding"))
    val books = graft.llm.Similarity.pqCodebooks(e, sampleMod = 1)
    val enc = graft.llm.Similarity.pqEncode(e, books).collect()
    assert(enc.length === 40)
    // identical vectors must encode to the identical codeword
    val dupWords = enc.filter(_.getLong(0) < 20).map(_.getLong(1)).distinct
    assert(dupWords.length === 1)
  }

  test("gopher/trigram/zipf/fertility survive empty and degenerate docs") {
    val d = Seq(
      (0L, "", "en", "s0"), (11L, "   ", "en", "s0"),
      (22L, "one", "de", "s1"), (3L, "a b c a b c", "en", "s0"),
      (4L, "x y z w v u t s", "fr", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    // gopher: empty docs yield NULL ratios and keep_doc 0, never a crash
    val g = graft.llm.Curation.gopherRules(d).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("keep_doc"))).toMap
    assert(g.keySet === Set(0L, 11L, 22L, 3L, 4L))
    assert(g(0L) === 0L && g(11L) === 0L)
    // trigram backoff: held-out docs (0, 11, 22) are empty or sub-3
    // tokens -> zero trigrams, zero score, present in the output
    val t = graft.llm.CorpusOps.trigramBackoff(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t.keySet === Set(0L, 11L, 22L))
    assert(t.values.forall(_ === 0L))
    // zipf: tiny vocabulary still buckets, ranks dense from 1
    val z = graft.llm.CorpusOps.zipfPanel(d).collect()
    assert(z.nonEmpty)
    assert(z.map(_.getLong(1)).sum === 12L) // 12 distinct terms
  }

  test("readabilityPanel: hand-computed Flesch/FK on a known sentence") {
    val d = Seq(
      (1L, "The cat sat. The dog ran away!", "en", "s0"),
      (2L, "", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val got = graft.llm.Curation.readabilityPanel(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    // sentences: ". " and "!" runs -> 2; words (ws tokens) -> 7;
    // syllable proxy (vowel-group runs, min 1 per word):
    // the=1 cat=1 sat.=1 the=1 dog=1 ran=1 away!=2 ("a","ay") -> 8
    assert(r1.getLong(1) === 2L && r1.getLong(2) === 7L &&
      r1.getLong(3) === 8L)
    // wps_e3 = 3500, spw_e3 = 8000 DIV 7 = 1142
    // flesch_e3 = 206835 - 3552 - 96613 = 106670
    // fk_e3 = 1365 + 13475 - 15590 = -750
    assert(r1.getLong(4) === 3500L && r1.getLong(5) === 1142L)
    assert(r1.getLong(6) === 106670L && r1.getLong(7) === -750L)
    // empty doc: sentence floor 1, zero words, NULL scaled scores
    val r2 = got(2L)
    assert(r2.getLong(1) === 1L && r2.getLong(2) === 0L)
    assert(r2.isNullAt(5) && r2.isNullAt(6) && r2.isNullAt(7))
  }

  test("conversionLag: hand-computed fixture (prior-view semantics)") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: view 10:00, purchase 10:05 (lag 300), purchase 10:06
    //   (lag 360 — the SAME view converts again; last-view semantics),
    //   view 11:00 with no purchase after (never emitted)
    // user 2: purchase with NO prior view -> dropped
    // 2024-01-01 is dow 0 by the epoch arithmetic
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "purchase", 5.0, "{}"),
      (3L, ts("2024-01-01 10:06:00"), 1L, "purchase", 5.0, "{}"),
      (4L, ts("2024-01-01 11:00:00"), 1L, "view", 0.0, "{}"),
      (5L, ts("2024-01-01 12:00:00"), 2L, "purchase", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.conversionLag(ev).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(r.fieldIndex("dow")) === 0L)
    assert(r.getLong(r.fieldIndex("n_conversions")) === 2L)
    assert(r.getLong(r.fieldIndex("min_sec")) === 300L)
    // type-1 quantiles over {300, 360}: ranks ceil(q*2) = 1, 1, 2
    assert(r.getLong(r.fieldIndex("p25_sec")) === 300L)
    assert(r.getLong(r.fieldIndex("p50_sec")) === 300L)
    assert(r.getLong(r.fieldIndex("p75_sec")) === 360L)
    assert(r.getLong(r.fieldIndex("max_sec")) === 360L)
  }

  test("qDataAudit: every check fires on a planted-violation snapshot") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-dq").toString
    def w(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    w("nation", Seq((0, "ALPHA")).toDF("n_nationkey", "n_name"))
    w("customer", Seq((1L, 0), (2L, 99)) // 2 -> orphan nation
      .toDF("c_custkey", "c_nationkey"))
    w("orders", Seq(
      (10L, 1L, ts), (11L, 77L, ts), // 11 -> orphan customer
      (12L, 1L, ts), (12L, 1L, ts),  // dup pk
      (13L, 1L, Timestamp.valueOf("1970-01-01 00:00:00"))) // date range
      .toDF("o_orderkey", "o_custkey", "o_orderdate"))
    w("part", Seq((5L, 10.0), (6L, -1.0)) // 6 -> nonpositive price
      .toDF("p_partkey", "p_retailprice"))
    w("lineitem", Seq(
      (Some(10L), Some(5L)),  // clean
      (Some(99L), Some(5L)),  // orphan order
      (Some(10L), Some(44L)), // orphan part
      (None, Some(5L)))       // null key (also an orphan-order row:
                              // a NULL FK can never match its parent)
      .toDF("l_orderkey", "l_partkey"))
    w("events", Seq((1L, ts, 1L, "view", -5.0), (2L, ts, 1L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    val got = graft.ops.Relational.qDataAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "lineitem_orphan_order" -> ((2L, 0L)),
      "lineitem_orphan_part" -> ((1L, 0L)),
      "order_orphan_customer" -> ((1L, 0L)),
      "customer_orphan_nation" -> ((1L, 0L)),
      "order_pk_dup" -> ((1L, 0L)),
      "customer_pk_dup" -> ((0L, 1L)),
      "lineitem_null_keys" -> ((1L, 0L)),
      "part_nonpositive_price" -> ((1L, 0L)),
      "order_date_out_of_range" -> ((1L, 0L)),
      "event_negative_value" -> ((1L, 0L)),
      "event_id_gaps" -> ((0L, 1L))))
  }

  test("forecastBacktest: seasonal-naive MAE on a linear series") {
    import java.sql.Timestamp
    // user 1 (band 1): purchase of i dollars on day i, i = 1..15.
    // pred(day i) = cents(i-7), so each of the 7 backtest days
    // (9..15) misses by exactly 700 cents; next-day forecast =
    // cents(day 9) = 900. Bands 0/2 are all-zero series: MAE 0.
    val ev = (1 to 15).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"), 1L,
        "purchase", i.toDouble, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.forecastBacktest(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      0L -> ((7L, 0L, 0L)),
      1L -> ((7L, 700L, 900L)),
      2L -> ((7L, 0L, 0L))))
  }

  test("sessionPaths: gap cut and first-3 ordering on a fixture") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: view,click @+1m,purchase @+2m,error @+3m (one session,
    //   path stops at 3) | 20-min gap | click (second session)
    // user 2: single view session
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "purchase", 0.0, "{}"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "error", 0.0, "{}"),
      (5L, ts("2024-01-01 10:23:30"), 1L, "click", 0.0, "{}"),
      (6L, ts("2024-01-01 09:00:00"), 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.EventOps.sessionPaths(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      "view>click>purchase" -> ((1L, 333L)),
      "click" -> ((1L, 333L)),
      "view" -> ((1L, 333L))))
  }

  test("lateral top-k: at most 2 rows per customer, and they are the top 2") {
    val got = graft.ops.Relational.qLateralTopOrders(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val auto = graft.core.Tables.load(spark, sfDir, "customer")
      .filter($"c_mktsegment" === "AUTOMOBILE")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val want = auto.toSeq.flatMap { c =>
      orders.getOrElse(c, Array.empty[(Long, Long, Double)])
        .sortBy(t => (-t._3, t._2)).take(2).map(t => (c, t._2, t._3))
    }.toSet
    assert(got.toSet === want)
    assert(got.nonEmpty)
  }

  test("winnow handles empty and single-token docs") {
    val d = Seq((1L, ""), (2L, "only"), (3L, "  \t ")).toDF("doc_id", "text")
    val w = graft.llm.TextOps.winnow(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every doc fingerprints (whole-text gram), nothing crashes
    assert(w.keySet === Set(1L, 2L, 3L))
    w.values.foreach { case (nGrams, nSel) =>
      assert(nGrams === 1L && nSel === 1L)
    }
    // empty and whitespace-only docs hash identically (both md5(""))
    val digs = graft.llm.TextOps.winnow(d).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(digs(1L) === digs(3L))
    assert(digs(1L) !== digs(2L))
  }
}
