package graft.ops

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-windowed operators over the `events` table — the batch mirrors
  * of the Structured Streaming pipelines in [[graft.streaming]]. Both
  * share these definitions, so the streaming tests can assert
  * stream == batch on identical input.
  *
  * `events.ts` arrives as parquet TIMESTAMP(NANOS); [[Tables.load]]
  * floor-truncates to microseconds, and every oracle casts
  * TIMESTAMP_NS -> TIMESTAMP first, which truncates identically.
  *
  * Scale: all three window shapes are single-shuffle group-bys on
  * (window, key); session windows use Spark's built-in session_window
  * (state is per-key and bounded by the watermark in the streaming
  * variant).
  */
object EventOps {

  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Tumbling 1-hour windows per event_type. */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("bigint")).as("sum_value_cents"))
      .select(fmtTs(col("w.start")).as("window_start"), col("event_type"),
        col("n_events"), col("sum_value_cents"))

  val tumblingSql: String =
    """SELECT strftime(CAST(date_trunc('hour', ts) AS TIMESTAMP),
      |    '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS sum_value_cents
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sliding windows: 1 hour wide, every 30 minutes. Each event falls
    * in exactly 2 windows; the oracle reproduces that with an explicit
    * 2-shift unnest.
    */
  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("bigint")).as("sum_value_cents"))
      .select(fmtTs(col("w.start")).as("window_start"),
        col("n_events"), col("sum_value_cents"))

  val slidingSql: String =
    """SELECT strftime(CAST(time_bucket(INTERVAL '30 minutes', ts)
      |      AS TIMESTAMP) - INTERVAL '30 minutes' * shift.k,
      |    '%Y-%m-%d %H:%M:%S') AS window_start,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS sum_value_cents
      |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) shift
      |GROUP BY 1""".stripMargin

  /** Session windows per user: a session closes after a 10-minute gap.
    * The oracle is the classic gaps-and-islands rewrite; `>=` matches
    * Spark's merge rule (events merge while next.ts < prev.ts + gap).
    */
  def sessions(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("bigint")).as("sum_value_cents"))
      .select(col("user_id"), fmtTs(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value_cents"))

  val sessionsSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts >= lag(ts) OVER w + INTERVAL '10 minutes'
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS sum_value_cents
      |FROM sess GROUP BY user_id, sid""".stripMargin

  /** Pivot: events per day x event_type (missing combos filled with 0
    * to match the oracle's conditional-aggregation form).
    */
  def pivotDaily(ev: DataFrame): DataFrame =
    ev.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)

  val pivotDailySql: String =
    """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
      |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
      |    AS click,
      |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
      |    AS error,
      |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
      |    AS purchase,
      |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT)
      |    AS signup,
      |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
      |    AS view
      |FROM events GROUP BY 1""".stripMargin

  /** JSON extraction from the props column (wire-format JSON exposed as
    * a queryable scalar, which the reference never had).
    */
  def jsonExtract(ev: DataFrame): DataFrame =
    ev.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("bigint").as("prop_k"))

  val jsonExtractSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
      |FROM events""".stripMargin

  /** Semi-structured props through Spark 4's VARIANT type — the
    * modern path for schema-on-read at scale: parse_json encodes the
    * document ONCE into Variant's binary form (typed access without
    * per-query string re-parsing; the representation columnar engines
    * shred), variant_get extracts a typed field, schema_of_variant
    * observes the per-row inferred schema. The panel aggregates per
    * event_type so the round-trip (parse -> typed get -> aggregate)
    * is value-checked, and n_schemas pins schema uniformity as a
    * COLUMN (a drifting producer shows up here before a consumer
    * breaks). Map-only + one small aggregation; at 100 TB the win is
    * exactly that the parse is in the scan stage and only typed
    * BIGINTs move.
    */
  def variantExtract(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
      expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
      // n_schemas counts NUMERIC-CLASS-NORMALIZED schemas: every
      // numeric leaf type collapses to NUM before the distinct, on
      // BOTH engines, because the two inference engines carve numbers
      // differently — DuckDB types integers BY SIGN (UBIGINT vs
      // BIGINT), Spark's schema_of_variant types decimals BY PRECISION
      // (DECIMAL(3,1) vs DECIMAL(4,2)) where DuckDB says DOUBLE for
      // both — so an un-normalized count drifts for ENGINE reasons,
      // not data reasons (r14 advice). What the column then detects is
      // STRUCTURAL producer drift: a field appearing/vanishing, or a
      // type-CLASS change (number -> string), which is the alarm a
      // consumer actually pages on; numeric widening within the class
      // is deliberately not counted.
      regexp_replace(
        expr("schema_of_variant(parse_json(props))"),
        lit("DECIMAL\\(\\d+,\\d+\\)|BIGINT|SMALLINT|TINYINT|INT|DOUBLE|FLOAT"),
        lit("NUM")).as("sch"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        countDistinct("k").as("n_distinct_k"),
        min("k").as("k_min"), max("k").as("k_max"),
        countDistinct("sch").as("n_schemas"))

  /** DuckDB mirror: json_extract + json_structure. The structure
    * STRINGS differ between engines (OBJECT<k: NUM> vs {"k":"NUM"})
    * but only their DISTINCT COUNTS are consumed; the numeric-class
    * normalization above is mirrored here over DuckDB's own type
    * vocabulary (sign-typed integers, DOUBLE for any decimal).
    */
  val variantExtractSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS sum_k,
      |  count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
      |    AS n_distinct_k,
      |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
      |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
      |  count(DISTINCT regexp_replace(json_structure(props),
      |    '"(UBIGINT|BIGINT|UHUGEINT|HUGEINT|UINTEGER|INTEGER|DOUBLE|FLOAT)"',
      |    '"NUM"', 'g')) AS n_schemas
      |FROM events GROUP BY 1""".stripMargin

  /** As-of join over the event stream: each purchase matched to the
    * user's latest click at-or-before it ([[AsOfJoin]]; oracle uses
    * DuckDB's native ASOF LEFT JOIN).
    */
  def asOfPurchaseClick(ev: DataFrame, native: Boolean = false): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    // dedupe right side to one row per (key, time): ASOF picks an
    // arbitrary row among equal timestamps otherwise
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("click_id"))
    val joined =
      if (native) AsOfJoin.asOfNative(purchases, clicks, Seq("user_id"), "ts", "ts")
      else AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "ts")
    joined
      .select(
        col("user_id"), col("purchase_id"),
        fmtTs(col("ts")).as("purchase_ts"),
        fmtTs(col("asof_ts")).as("click_ts"),
        col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts")))
          .as("gap_micros"))
  }

  val asOfPurchaseClickSql: String =
    """WITH p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.user_id, p.event_id AS purchase_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
      |  c.click_id,
      |  CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_micros
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin

  /** Interval join over the event stream: each purchase matched to ALL
    * of the user's clicks in the preceding 30 minutes
    * ([[IntervalJoin.within]] — bucketized equi-join, no nested-loop).
    */
  def intervalPurchaseClick(ev: DataFrame): DataFrame = {
    val win = 1800000000L // 30 min in micros
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pt"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("ct"))
    IntervalJoin.within(purchases, clicks, Seq("user_id"), "pt", "ct", win)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (col("pt") - col("ct")).as("gap_micros"))
  }

  val intervalPurchaseClickSql: String =
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
      |  CAST(epoch_us(CAST(p.ts AS TIMESTAMP)) -
      |    epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS gap_micros
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      |  AND p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND epoch_us(CAST(c.ts AS TIMESTAMP))
      |    BETWEEN epoch_us(CAST(p.ts AS TIMESTAMP)) - 1800000000
      |    AND epoch_us(CAST(p.ts AS TIMESTAMP))""".stripMargin

  /** LEFT OUTER interval join: every purchase, with its in-window
    * clicks when any exist and NULL click columns otherwise — the
    * "which conversions had no attributable click" shape. Composed as
    * purchases left-joined to the INNER bucketized interval join on
    * (user_id, purchase_id): the non-equi work stays in the bucketized
    * equi-join (no nested loop), and the outer extension is an
    * ordinary co-partitioned left join. Streaming mirror:
    * [[graft.streaming.EventStreams.intervalJoinLeftOuter]].
    */
  def intervalPurchaseClickLeft(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"))
      .join(intervalPurchaseClick(ev), Seq("user_id", "purchase_id"), "left")

  val intervalPurchaseClickLeftSql: String =
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
      |  CAST(epoch_us(CAST(p.ts AS TIMESTAMP)) -
      |    epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS gap_micros
      |FROM events p LEFT JOIN events c
      |  ON p.user_id = c.user_id
      |  AND c.event_type = 'click'
      |  AND epoch_us(CAST(c.ts AS TIMESTAMP))
      |    BETWEEN epoch_us(CAST(p.ts AS TIMESTAMP)) - 1800000000
      |    AND epoch_us(CAST(p.ts AS TIMESTAMP))
      |WHERE p.event_type = 'purchase'""".stripMargin

  /** Funnel / sequence analytics: per user, the first click, the first
    * purchase AT-OR-AFTER that click, and a conversion flag — the
    * order-sensitive pattern ("did B happen after A") spelled as
    * conditional aggregates over event time, one shuffle by user.
    */
  def funnel(ev: DataFrame): DataFrame = {
    val t = unix_micros(col("ts"))
    ev.groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        min(when(col("event_type") === "click", t)).as("first_click_us"))
      .join(
        ev.select(col("user_id"),
          when(col("event_type") === "purchase", t).as("pt")),
        Seq("user_id"), "left")
      .groupBy("user_id", "n_clicks", "n_purchases", "first_click_us")
      .agg(min(when(col("pt") >= col("first_click_us"), col("pt")))
        .as("first_purchase_after_us"))
      .select(col("user_id"), col("n_clicks"), col("n_purchases"),
        col("first_click_us"), col("first_purchase_after_us"),
        when(col("first_purchase_after_us").isNotNull, 1L).otherwise(0L)
          .as("converted"))
  }

  val funnelSql: String =
    """WITH base AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_clicks,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_purchases,
      |    min(CASE WHEN event_type = 'click'
      |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_click_us
      |  FROM events GROUP BY user_id),
      |pa AS (
      |  SELECT e.user_id,
      |    min(CASE WHEN e.event_type = 'purchase'
      |      AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= b.first_click_us
      |      THEN epoch_us(CAST(e.ts AS TIMESTAMP)) END)
      |      AS first_purchase_after_us
      |  FROM events e JOIN base b ON e.user_id = b.user_id
      |  GROUP BY e.user_id)
      |SELECT b.user_id, b.n_clicks, b.n_purchases, b.first_click_us,
      |  pa.first_purchase_after_us,
      |  CAST(CASE WHEN pa.first_purchase_after_us IS NOT NULL
      |    THEN 1 ELSE 0 END AS BIGINT) AS converted
      |FROM base b LEFT JOIN pa ON b.user_id = pa.user_id""".stripMargin

  /** Forward as-of: each click matched to the user's NEXT purchase
    * at-or-after it (the "time to conversion" join).
    */
  def forwardClickPurchase(ev: DataFrame): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("ct"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("pt"))
      .agg(max("event_id").as("purchase_id"))
    AsOfJoin.asOfForward(clicks, purchases, Seq("user_id"), "ct", "pt")
      .select(col("user_id"), col("click_id"), col("asof_pt"),
        col("purchase_id"),
        (col("asof_pt") - col("ct")).as("wait_micros"))
  }

  val forwardClickPurchaseSql: String =
    """WITH c AS (
      |  SELECT user_id, event_id AS click_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ct
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pt,
      |    max(event_id) AS purchase_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |nxt AS (
      |  SELECT c.user_id, c.click_id, c.ct, min(p.pt) AS asof_pt
      |  FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.pt >= c.ct
      |  GROUP BY 1, 2, 3)
      |SELECT n.user_id, n.click_id, n.asof_pt, p.purchase_id,
      |  n.asof_pt - n.ct AS wait_micros
      |FROM nxt n LEFT JOIN p ON n.user_id = p.user_id AND n.asof_pt = p.pt""".stripMargin

  /** Trending: top-2 event types per tumbling hour (windowed top-k —
    * the aggregation + per-window rank composite behind every
    * "top items this hour" feed), deterministic tie-break.
    */
  def topKPerWindow(ev: DataFrame, k: Int = 2): DataFrame = {
    val counts = ev
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(fmtTs(col("w.start")).as("window_start"),
        col("event_type"), col("n"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start").orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rnk", row_number().over(rankW).cast("bigint"))
      .filter(col("rnk") <= k)
  }

  val topKPerWindowSql: String =
    """SELECT window_start, event_type, n, rnk FROM (
      |  SELECT window_start, event_type, n,
      |    CAST(row_number() OVER (PARTITION BY window_start
      |      ORDER BY n DESC, event_type) AS BIGINT) AS rnk
      |  FROM (
      |    SELECT strftime(CAST(date_trunc('hour', ts) AS TIMESTAMP),
      |        '%Y-%m-%d %H:%M:%S') AS window_start,
      |      event_type, count(*) AS n
      |    FROM events GROUP BY 1, 2))
      |WHERE rnk <= 2""".stripMargin

  /** Hour-over-hour retention: of the distinct users active in hour h,
    * how many are also active in hour h+1 — the cohort-retention shape
    * (distinct per bucket, self-join on adjacent buckets).
    */
  def retention(ev: DataFrame): DataFrame = {
    val hourly = ev.select(
      date_trunc("hour", col("ts")).as("h"), col("user_id")).distinct()
    hourly.as("a")
      .join(hourly.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.h") === col("a.h") + expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("a.h"))
      .agg(countDistinct(col("a.user_id")).as("active"),
        countDistinct(col("b.user_id")).as("retained"))
      .select(fmtTs(col("h")).as("hour"), col("active"), col("retained"))
  }

  val retentionSql: String =
    """WITH hourly AS (
      |  SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
      |    user_id
      |  FROM events)
      |SELECT strftime(a.h, '%Y-%m-%d %H:%M:%S') AS hour,
      |  count(DISTINCT a.user_id) AS active,
      |  count(DISTINCT b.user_id) AS retained
      |FROM hourly a LEFT JOIN hourly b
      |  ON a.user_id = b.user_id AND b.h = a.h + INTERVAL 1 HOUR
      |GROUP BY a.h""".stripMargin

  /** Anomalous traffic windows: hourly event counts per type sitting
    * more than `z` population standard deviations above the type's
    * mean hourly count — the monitoring/alerting query an ingest
    * pipeline runs over its own event firehose.
    *
    * Scale: one windowed aggregation over the events (map-side
    * combined), then a |types|-row stats broadcast back onto the
    * window counts — the corpus is touched once. A zero-variance type
    * can't divide by zero: its filter `n > mu` is unsatisfiable when
    * every window count equals mu.
    */
  def anomalyWindows(ev: DataFrame, z: Double = 2.0): DataFrame = {
    val wins = ev
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(fmtTs(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"))
    val stats = wins.groupBy("event_type")
      .agg(avg("n_events").as("mu"), stddev_pop("n_events").as("sigma"))
    wins.join(broadcast(stats), "event_type")
      .filter(col("n_events") > col("mu") + lit(z) * col("sigma"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("mu"), 4).as("mu"),
        round((col("n_events") - col("mu")) / col("sigma"), 4).as("zscore"))
  }

  val anomalyWindowsSql: String =
    """WITH wins AS (
      |  SELECT strftime(CAST(date_trunc('hour', ts) AS TIMESTAMP),
      |      '%Y-%m-%d %H:%M:%S') AS window_start,
      |    event_type, count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, avg(n_events) AS mu,
      |    stddev_pop(n_events) AS sigma
      |  FROM wins GROUP BY 1)
      |SELECT w.window_start, w.event_type, w.n_events,
      |  round(s.mu, 4) AS mu,
      |  round((w.n_events - s.mu) / s.sigma, 4) AS zscore
      |FROM wins w JOIN stats s USING (event_type)
      |WHERE w.n_events > s.mu + 2.0 * s.sigma""".stripMargin

  /** First-order Markov transition matrix over per-user event
    * sequences — the sequence-model prep step of a behavioral
    * training-data pipeline (next-event prediction labels, session
    * simulators). Each user's events are ordered by (ts, event_id) —
    * the unique tiebreak makes the sequence, and hence every
    * transition, deterministic — lagged one step, and the corpus-wide
    * transition counts are normalized into per-source probabilities.
    *
    * Scale: ONE shuffle on user_id for the per-user window (users are
    * independent — no global ordering anywhere), then an agg whose
    * cardinality is |event_type|^2 (here 5x5); the probability
    * normalization windows over that answer-sized table, not the
    * events. Survives any corpus size that has bounded vocabulary of
    * event types.
    */
  def markovTransitions(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = e
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    trans.withColumn("p", round(
      col("n_trans").cast("double") /
        sum("n_trans").over(Window.partitionBy("prev_type")), 6))
  }

  val markovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |trans AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS n_trans
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n_trans,
      |  round(CAST(n_trans AS DOUBLE) /
      |    sum(n_trans) OVER (PARTITION BY prev_type), 6) AS p
      |FROM trans""".stripMargin

  /** Time-series gap-fill: resample each user's purchase stream onto a
    * dense hourly grid (their first..last purchase hour) and
    * forward-fill missing hours with the last observed cumulative
    * spend — the resampling step that turns sparse event telemetry
    * into the fixed-step sequences a forecasting/behavior model trains
    * on. Hourly sums are kept in exact integer cents so the fill value
    * is deterministic (no float-summation-order dependence); `filled`
    * marks carried-forward rows.
    *
    * Scale: the hourly aggregate is a map-side-combined groupBy; the
    * grid explodes to users x span-hours — rows/(user density) times
    * smaller than the input for any realistic event rate — and both
    * the grid join and the forward-fill window are partitioned by
    * user_id (one shuffle, reused; no global sort anywhere).
    */
  def gapFill(e: DataFrame): DataFrame = {
    val hourly = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("cents"))
    val grid = hourly.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), fmtTs(col("h")).as("hour"),
        last(col("cents"), ignoreNulls = true).over(w).as("cents"),
        col("cents").isNull.as("filled"))
  }

  val gapFillSql: String =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1,
      |    INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT user_id, min(h) AS h0, max(h) AS h1
      |        FROM hourly GROUP BY 1)),
      |joined AS (
      |  SELECT g.user_id, g.h, hr.cents
      |  FROM grid g LEFT JOIN hourly hr
      |    ON g.user_id = hr.user_id AND g.h = hr.h)
      |SELECT user_id,
      |  strftime(CAST(h AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS hour,
      |  last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS cents,
      |  cents IS NULL AS filled
      |FROM joined""".stripMargin

  /** Slowly-changing-dimension (SCD2) history build: collapse each
    * user's event stream into state-validity intervals — one row per
    * state CHANGE carrying [valid_from, valid_to) and an is_current
    * flag. This is the warehouse-side table a feature store joins
    * point-in-time-correctly (see the as-of join family) — training
    * labels must see the state that was valid AT the example's
    * timestamp, never the latest one.
    *
    * Scale: everything is windows partitioned by user_id over the
    * event stream — one shuffle, no global order; change rows are a
    * tiny fraction of events, and the output is change-sized.
    */
  /** The SCD2 interval table (user_id, state, valid_from raw ts,
    * valid_to raw ts nullable) — ONE definition of change detection
    * and interval construction, shared by [[scd2States]] (the
    * reporting form) and [[featuresAtPurchase]] (the join form) so
    * the PIT join can never desynchronize from the history table it
    * is documented to join against.
    *
    * Equal-timestamp ties: change DETECTION orders by (ts, event_id),
    * but the intervals carry only the raw ts — so two state changes at
    * an identical (user_id, ts) produce a zero-width interval for the
    * earlier event_id (unreachable by any PIT lookup) and a purchase
    * sharing that exact ts reads the LATER state, regardless of how
    * its own event_id compares. This is a deliberate tie rule (state
    * validity is a function of TIME, and sub-timestamp ordering is not
    * time), implemented identically in the oracle CTEs below; callers
    * needing strict event-sequence semantics should pre-disambiguate
    * ts (e.g. micros + event_id as a synthetic clock) before building
    * the history.
    */
  private[graft] def scd2Intervals(e: DataFrame): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byTs))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(byTs))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to_ts").as("valid_to"))
  }

  /** Shared oracle CTEs mirroring [[scd2Intervals]]: yields a `hist`
    * relation (user_id, state, valid_from, valid_to).
    */
  private def scd2IntervalsSqlCtes(source: String = "events"): String =
    s"""WITH marked AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM $source),
      |hist AS (
      |  SELECT user_id, event_type AS state, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS valid_to
      |  FROM marked WHERE prev IS NULL OR prev <> event_type)""".stripMargin

  def scd2States(e: DataFrame): DataFrame =
    scd2Intervals(e)
      .select(col("user_id"), col("state"),
        fmtTs(col("valid_from")).as("valid_from"),
        fmtTs(col("valid_to")).as("valid_to"),
        col("valid_to").isNull.as("is_current"))

  val scd2StatesSql: String =
    s"""${scd2IntervalsSqlCtes()}
       |SELECT user_id, state,
       |  strftime(CAST(valid_from AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
       |    AS valid_from,
       |  strftime(CAST(valid_to AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
       |    AS valid_to,
       |  valid_to IS NULL AS is_current
       |FROM hist""".stripMargin

  /** Point-in-time-correct feature join: label each purchase with the
    * state that was valid AT its timestamp according to the SCD2
    * history ([[scd2States]]) — the end-to-end form of the temporal
    * correctness contract (a training example must never see a state
    * from its future; joining "latest state" leaks). The purchase's
    * own state change is visible at its timestamp (valid_from <= ts),
    * matching the as-of family's inclusive semantics.
    *
    * Scale: equi-join on user_id with the interval condition as a
    * residual — per-user history is bounded (state CHANGES, not
    * events), so the per-key multiset stays small; both sides already
    * hash-partition on user_id. Intervals partition each user's
    * timeline, so exactly one match per purchase (spec-asserted).
    */
  def featuresAtPurchase(e: DataFrame): DataFrame = {
    // history from NON-label events only: a feature store's state
    // table must not contain the label event itself, or every label
    // trivially reads its own state change (state was degenerately
    // 'purchase' for every row before round 11). LEFT join: a
    // purchase before the user's first state event keeps its row with
    // a NULL state — label completeness beats inner-join tidiness.
    val hist = scd2Intervals(e.filter(col("event_type") =!= "purchase"))
    e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value"))
      .join(hist,
        col("p_user") === col("user_id") &&
          col("p_ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("p_ts") < col("valid_to")),
        "left")
      .select(col("purchase_id"),
        fmtTs(col("p_ts")).as("purchase_ts"), col("state"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("value_cents"))
  }

  val featuresAtPurchaseSql: String =
    s"""${scd2IntervalsSqlCtes(
          "(SELECT * FROM events WHERE event_type <> 'purchase')")}
       |SELECT p.event_id AS purchase_id,
      |  strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
      |    AS purchase_ts,
      |  h.state,
      |  CAST(round(p.value * 100, 0) AS BIGINT) AS value_cents
      |FROM events p LEFT JOIN hist h
      |  ON p.user_id = h.user_id
      |  AND p.ts >= h.valid_from
      |  AND (h.valid_to IS NULL OR p.ts < h.valid_to)
      |WHERE p.event_type = 'purchase'""".stripMargin

  /** Multi-touch attribution over the event stream: each purchase is a
    * conversion; its touch set is every non-purchase event by the same
    * user since that user's previous purchase (the journey), ordered by
    * (ts, event_id) — the table's total order, so equal-timestamp ties
    * are deterministic. Three models are credited at once, in exact
    * integer cents:
    *   - first-touch / last-touch: the full conversion value to the
    *     journey's first / last channel;
    *   - linear: value DIV n touches, the remainder cents to the
    *     earliest touches (sum-preserving by construction).
    * A touchless purchase credits the synthetic channel 'direct';
    * touches after a user's last purchase never convert and are
    * dropped, the standard attribution-window rule.
    *
    * Scale: both windows and the (user_id, journey) join partition by
    * user — no global window anywhere; the final aggregation is
    * algebraic over |channels| groups. At 100 TB this is one shuffle
    * of the event table by user_id (reused by window AND join under
    * AQE) plus an answer-sized rollup.
    */
  def attribution(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val seq = e.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .withColumn("journey",
        coalesce(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + 1L)
    val purch = seq.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("journey"), col("cents").as("p_cents"))
    val touch = seq.filter(col("event_type") =!= "purchase")
    val tw = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    val ranked = touch
      .withColumn("rnk", row_number().over(tw).cast("bigint"))
      .withColumn("n_t",
        count(lit(1)).over(Window.partitionBy("user_id", "journey"))
          .cast("bigint"))
      .select(col("user_id"), col("journey"), col("event_type").as("channel"),
        col("rnk"), col("n_t"))
    val credits = ranked.join(purch, Seq("user_id", "journey"))
      .select(col("channel"), col("rnk"), col("n_t"), col("p_cents"))
      .unionByName(
        purch.join(ranked.select("user_id", "journey").distinct(),
            Seq("user_id", "journey"), "left_anti")
          .select(lit("direct").as("channel"), lit(1L).as("rnk"),
            lit(1L).as("n_t"), col("p_cents")))
    credits
      .withColumn("lin_cents",
        expr("p_cents DIV n_t + CAST(rnk <= p_cents % n_t AS BIGINT)"))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_touches"),
        sum(when(col("rnk") === 1L, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("rnk") === col("n_t"), 1L).otherwise(0L)).as("n_last"),
        sum(when(col("rnk") === 1L, col("p_cents")).otherwise(0L))
          .as("first_cents"),
        sum(when(col("rnk") === col("n_t"), col("p_cents")).otherwise(0L))
          .as("last_cents"),
        sum(col("lin_cents")).as("linear_cents"))
  }

  val attributionSql: String =
    """WITH seq AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
      |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
      |      AS journey
      |  FROM events),
      |purch AS (
      |  SELECT user_id, journey, cents AS p_cents FROM seq
      |  WHERE event_type = 'purchase'),
      |touch AS (
      |  SELECT user_id, journey, event_type AS channel,
      |    CAST(row_number() OVER (PARTITION BY user_id, journey
      |      ORDER BY ts, event_id) AS BIGINT) AS rnk,
      |    CAST(count(*) OVER (PARTITION BY user_id, journey) AS BIGINT)
      |      AS n_t
      |  FROM seq WHERE event_type <> 'purchase'),
      |credits AS (
      |  SELECT t.channel, t.rnk, t.n_t, p.p_cents
      |  FROM touch t JOIN purch p USING (user_id, journey)
      |  UNION ALL
      |  SELECT 'direct', CAST(1 AS BIGINT), CAST(1 AS BIGINT), p.p_cents
      |  FROM purch p
      |  WHERE NOT EXISTS (SELECT 1 FROM touch t
      |    WHERE t.user_id = p.user_id AND t.journey = p.journey))
      |SELECT channel,
      |  count(*) AS n_touches,
      |  CAST(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
      |  CAST(sum(CASE WHEN rnk = n_t THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
      |  CAST(sum(CASE WHEN rnk = 1 THEN p_cents ELSE 0 END) AS BIGINT)
      |    AS first_cents,
      |  CAST(sum(CASE WHEN rnk = n_t THEN p_cents ELSE 0 END) AS BIGINT)
      |    AS last_cents,
      |  CAST(sum(p_cents // n_t
      |    + CAST(rnk <= p_cents % n_t AS BIGINT)) AS BIGINT) AS linear_cents
      |FROM credits GROUP BY channel""".stripMargin

  /** Cohort lifetime-value curves: users cohorted by first-seen day,
    * purchase revenue aggregated by cohort age (days since first
    * event) with the running cumulative — the revenue-retention panel
    * next to [[retention]]'s activity panel. Exact integer cents.
    *
    * Scale: the cohort table is user-sized and joins purchases
    * co-partitioned on user_id; the (cohort, age) aggregate is
    * answer-sized (days x days), so the cumulative window over it is
    * free. No global window, nothing collected.
    */
  def cohortLtv(e: DataFrame): DataFrame = {
    val firsts = e.groupBy("user_id").agg(to_date(min("ts")).as("cohort"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("pday"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val byAge = purchases.join(firsts, "user_id")
      .select(col("cohort"),
        datediff(col("pday"), col("cohort")).cast("bigint").as("age_days"),
        col("user_id"), col("cents"))
      .groupBy("cohort", "age_days")
      .agg(countDistinct("user_id").as("n_active"),
        sum("cents").as("revenue_cents"))
    val cw = Window.partitionBy("cohort").orderBy("age_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byAge
      .withColumn("cum_revenue_cents", sum("revenue_cents").over(cw))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("age_days"), col("n_active"), col("revenue_cents"),
        col("cum_revenue_cents"))
  }

  val cohortLtvSql: String =
    """WITH firsts AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT user_id, CAST(ts AS DATE) AS pday,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |byage AS (
      |  SELECT f.cohort,
      |    CAST(date_diff('day', f.cohort, p.pday) AS BIGINT) AS age_days,
      |    CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_active,
      |    CAST(sum(p.cents) AS BIGINT) AS revenue_cents
      |  FROM p JOIN firsts f USING (user_id) GROUP BY 1, 2)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort, age_days, n_active,
      |  revenue_cents,
      |  CAST(sum(revenue_cents) OVER (PARTITION BY cohort ORDER BY age_days
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_revenue_cents
      |FROM byage""".stripMargin

  /** Integer EWMA spike monitor: per user, exponentially-weighted
    * moving average of DAILY purchase cents (alpha = 1/8 spelled as
    * s' = (7*s + x) div 8 — pure integer recurrence, so both engines
    * replay it bit-for-bit; all terms are non-negative so floor and
    * truncation coincide) over the dense day grid (quiet days count
    * as 0 — a burst after silence must raise the alarm), counting
    * days where the day's spend exceeds 4x the running average — the
    * classic smoothed-baseline spike rule, the per-entity sibling of
    * [[anomalyWindows]]'s population z-score.
    *
    * Scale: daily rollup + grid are the [[gapFill]] shape (one user_id
    * shuffle); the recurrence is inherently sequential PER USER, so it
    * runs as a fold over each user's packed day series — bounded by
    * the TIME SPAN (days), not by event volume, which is exactly the
    * state a streaming monitor would carry. No window over anything
    * larger than one user's days; nothing global.
    *
    * The DuckDB oracle replays the recurrence as a recursive CTE
    * joining step i to i+1 — depth = the longest user's day span.
    */
  def ewmaDaily(e: DataFrame): DataFrame = {
    val daily = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("cents"))
    val grid = daily.groupBy("user_id")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("d"))
    val series = grid.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"), coalesce(col("cents"), lit(0L)).as("x"))
    // sort_array orders the (d, x) structs by day; the fold carries
    // (s = running average, spikes). s = -1 marks "before first day"
    // (spend cents are never negative, so the sentinel is unambiguous)
    series.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("xs"))
      .select(col("user_id"),
        size(col("xs")).cast("bigint").as("n_days"),
        aggregate(col("xs"),
          struct(lit(-1L).as("s"), lit(0L).as("spikes")),
          (acc, el) => {
            val x = el.getField("x")
            val sPrev = acc.getField("s")
            val first = sPrev === lit(-1L)
            val spike = when(!first && x > sPrev * 4, lit(1L))
              .otherwise(lit(0L))
            val sNew = when(first, x)
              // integer div on non-negative longs: floor(double) is
              // exact (numerators < 2^53) and equals DuckDB's `//`
              .otherwise(floor((sPrev * 7 + x).cast("double") / 8)
                .cast("long"))
            struct(sNew.as("s"),
              (acc.getField("spikes") + spike).as("spikes"))
          }).as("st"))
      .select(col("user_id"), col("n_days"),
        col("st.s").as("ewma_cents"), col("st.spikes").as("n_spikes"))
  }

  val ewmaDailySql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS d,
      |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
      |  FROM (SELECT user_id, min(d) AS d0, max(d) AS d1
      |        FROM daily GROUP BY 1)),
      |series AS (
      |  SELECT g.user_id, coalesce(dd.cents, 0) AS x,
      |    row_number() OVER (PARTITION BY g.user_id ORDER BY g.d) AS i
      |  FROM grid g LEFT JOIN daily dd
      |    ON g.user_id = dd.user_id AND g.d = dd.d),
      |r AS (
      |  SELECT user_id, i, x AS s, CAST(0 AS BIGINT) AS spikes
      |  FROM series WHERE i = 1
      |  UNION ALL
      |  SELECT s2.user_id, s2.i, (r.s * 7 + s2.x) // 8 AS s,
      |    r.spikes + CASE WHEN s2.x > 4 * r.s THEN 1 ELSE 0 END AS spikes
      |  FROM r JOIN series s2
      |    ON s2.user_id = r.user_id AND s2.i = r.i + 1)
      |SELECT user_id, CAST(n_days AS BIGINT) AS n_days, s AS ewma_cents,
      |  CAST(spikes AS BIGINT) AS n_spikes
      |FROM (SELECT user_id, i AS n_days, s, spikes,
      |        row_number() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
      |      FROM r)
      |WHERE rn = 1""".stripMargin

  /** Ordered 3-step funnel report (view -> click -> purchase, each
    * step at-or-after the previous): per step, how many users reached
    * it and the drop-off vs the previous step (x10000, integer). The
    * classic product-analytics funnel — [[funnel]] is the 2-step
    * per-user detail; this is the ORDERED multi-step rollup a review
    * reads (a click before any view does not count, which a naive
    * per-type count gets wrong).
    *
    * Scale: each step is one user-keyed aggregate co-partitioned with
    * the previous step's min-timestamp table (three hash joins on
    * user_id, no window); the panel is three 1-row broadcasts. Depth
    * generalizes linearly — an N-step funnel is N such joins.
    */
  def funnelSteps(ev: DataFrame): DataFrame = {
    val t = unix_micros(col("ts"))
    val e = ev.select(col("user_id"), col("event_type"), t.as("tu"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tu").as("t1"))
    val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("tu") >= col("t1"))
      .groupBy("user_id").agg(min("tu").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("tu") >= col("t2"))
      .groupBy("user_id").agg(min("tu").as("t3"))
    s1.agg(count(lit(1)).as("n1"))
      .crossJoin(broadcast(s2.agg(count(lit(1)).as("n2"))))
      .crossJoin(broadcast(s3.agg(count(lit(1)).as("n3"))))
      .select(expr(
        "stack(3," +
          " CAST(1 AS BIGINT), 'view', n1, CAST(10000 AS BIGINT)," +
          " CAST(2 AS BIGINT), 'click_after_view', n2," +
          " n2 * 10000 DIV nullif(n1, CAST(0 AS BIGINT))," +
          " CAST(3 AS BIGINT), 'purchase_after_click', n3," +
          " n3 * 10000 DIV nullif(n2, CAST(0 AS BIGINT)))" +
          " AS (step, step_name, n_users, pct_x10000_of_prev)"))
  }

  val funnelStepsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS tu
      |  FROM events),
      |s1 AS (SELECT user_id, min(tu) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.tu) AS t2
      |  FROM e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.tu >= s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.tu) AS t3
      |  FROM e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.tu >= s2.t2 GROUP BY 1),
      |ns AS (
      |  SELECT (SELECT count(*) FROM s1) AS n1,
      |    (SELECT count(*) FROM s2) AS n2,
      |    (SELECT count(*) FROM s3) AS n3)
      |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
      |  CAST(n1 AS BIGINT) AS n_users,
      |  CAST(10000 AS BIGINT) AS pct_x10000_of_prev FROM ns
      |UNION ALL
      |SELECT 2, 'click_after_view', CAST(n2 AS BIGINT),
      |  CAST(n2 * 10000 // nullif(n1, 0) AS BIGINT) FROM ns
      |UNION ALL
      |SELECT 3, 'purchase_after_click', CAST(n3 AS BIGINT),
      |  CAST(n3 * 10000 // nullif(n2, 0) AS BIGINT) FROM ns""".stripMargin

  /** A/B experiment readout: deterministic salted-hash assignment of
    * every user to variant A or B (md5-family 60-bit hash of
    * "ab:<user_id>" mod 2 — the splitter real experiment frameworks
    * use, so a user's variant is stable across reruns, days, and
    * engines, with no assignment table to store or join), then the
    * standard panel per variant — users, converters (>=1 purchase),
    * conversion permille, purchases, revenue, revenue per user — plus
    * the GUARDRAIL metric (error-event permille) that catches a
    * variant winning conversion while breaking the product. A final
    * `B-A` row carries the per-metric difference (computed on the
    * derived ratios, not ratios of differences), which is the number
    * an experiment review actually reads.
    *
    * All metrics are integers (cents / permille via integer div), so
    * the oracle is bit-exact.
    *
    * Scale: assignment is a map-side expression (no join against an
    * assignment table — at 100 TB of events that join IS the job, and
    * the hash deletes it); the per-user rollup is one hash shuffle on
    * user_id; the variant panel and diff row aggregate 2 rows. Nothing
    * else moves.
    */
  def abExperiment(e: DataFrame): DataFrame = {
    val cents = expr("CAST(round(value * 100, 0) AS BIGINT)")
    val perUser = e
      .withColumn("variant",
        when(pmod(graft.ops.Hll.h60(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2)) === 0,
          lit("A")).otherwise(lit("B")))
      .groupBy("variant", "user_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)))
          .as("n_pur"),
        sum(when(col("event_type") === "purchase", cents).otherwise(lit(0L)))
          .as("cents"),
        sum(when(col("event_type") === "error", lit(1L)).otherwise(lit(0L)))
          .as("n_err"))
    val panel = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("n_pur") > 0, lit(1L)).otherwise(lit(0L)))
          .as("n_converters"),
        sum("n_pur").as("n_purchases"),
        sum("cents").as("revenue_cents"),
        sum("n_ev").as("n_events"),
        sum("n_err").as("n_errors"))
      .select(col("variant"), col("n_users"), col("n_converters"),
        expr("n_converters * 1000 DIV n_users").as("conv_permille"),
        col("n_purchases"), col("revenue_cents"),
        expr("revenue_cents DIV n_users").as("rpu_cents"),
        expr("n_errors * 1000 DIV n_events").as("err_permille"))
    def bMinusA(c: String): Column =
      sum(when(col("variant") === "B", col(c)).otherwise(-col(c))).as(c)
    val diff = panel.agg(bMinusA("n_users"), bMinusA("n_converters"),
      bMinusA("conv_permille"), bMinusA("n_purchases"),
      bMinusA("revenue_cents"), bMinusA("rpu_cents"),
      bMinusA("err_permille"))
      .select(lit("B-A").as("variant"), col("n_users"), col("n_converters"),
        col("conv_permille"), col("n_purchases"), col("revenue_cents"),
        col("rpu_cents"), col("err_permille"))
    panel.unionByName(diff)
  }

  val abExperimentSql: String = {
    val h = graft.ops.Hll.h60Sql("'ab:' || CAST(user_id AS VARCHAR)")
    s"""WITH pu AS (
       |  SELECT CASE WHEN ($h) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
       |    user_id, count(*) AS n_ev,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_pur,
       |    sum(CASE WHEN event_type = 'purchase'
       |        THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS cents,
       |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
       |  FROM events GROUP BY 1, 2),
       |panel AS (
       |  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(CASE WHEN n_pur > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_converters,
       |    CAST(sum(n_pur) AS BIGINT) AS n_purchases,
       |    CAST(sum(cents) AS BIGINT) AS revenue_cents,
       |    CAST(sum(n_ev) AS BIGINT) AS n_events,
       |    CAST(sum(n_err) AS BIGINT) AS n_errors
       |  FROM pu GROUP BY 1),
       |derived AS (
       |  SELECT variant, n_users, n_converters,
       |    n_converters * 1000 // n_users AS conv_permille,
       |    n_purchases, revenue_cents,
       |    revenue_cents // n_users AS rpu_cents,
       |    n_errors * 1000 // n_events AS err_permille
       |  FROM panel)
       |SELECT variant, n_users, n_converters, conv_permille, n_purchases,
       |  revenue_cents, rpu_cents, err_permille
       |FROM derived
       |UNION ALL
       |SELECT 'B-A' AS variant,
       |  CAST(sum(CASE WHEN variant = 'B' THEN n_users ELSE -n_users END)
       |    AS BIGINT),
       |  CAST(sum(CASE WHEN variant = 'B' THEN n_converters
       |      ELSE -n_converters END) AS BIGINT),
       |  CAST(sum(CASE WHEN variant = 'B' THEN conv_permille
       |      ELSE -conv_permille END) AS BIGINT),
       |  CAST(sum(CASE WHEN variant = 'B' THEN n_purchases
       |      ELSE -n_purchases END) AS BIGINT),
       |  CAST(sum(CASE WHEN variant = 'B' THEN revenue_cents
       |      ELSE -revenue_cents END) AS BIGINT),
       |  CAST(sum(CASE WHEN variant = 'B' THEN rpu_cents
       |      ELSE -rpu_cents END) AS BIGINT),
       |  CAST(sum(CASE WHEN variant = 'B' THEN err_permille
       |      ELSE -err_permille END) AS BIGINT)
       |FROM derived""".stripMargin
  }

  /** RFM segmentation (recency / frequency / monetary), the classic
    * customer-value panel: per purchasing user, days since last
    * purchase (vs the corpus's last purchase day — a fixed anchor, so
    * the result is deterministic and replayable), purchase count, and
    * lifetime cents; each metric scored 1-5 against its own quintile
    * boundaries, and the (r, f, m) cells rolled up into named
    * segments.
    *
    * Quintile boundaries are VALUE-based, not rank-based: boundary i
    * is the smallest metric value whose cumulative user count reaches
    * ceil(i*n/5) — spelled `(i*n + 4) DIV 5` so both engines compute
    * the rank in pure integers (0.2 is not a binary-exact double; a
    * float ceil could disagree at exact multiples). Users tied on a
    * boundary value tie on score, which is what makes the scoring
    * deterministic and partition-invariant.
    *
    * Scale: the per-user rollup is ONE hash shuffle on user_id.
    * Boundaries come from per-metric VALUE HISTOGRAMS — recency is
    * bounded by the time span in days, frequency by purchases per
    * user, and monetary is quantized to whole dollars for scoring
    * (the panel still reports exact cents) — so the cumulative window
    * runs per-metric over histogram rows, never over users; a global
    * rank over users would single-reduce 100 TB. The 12 boundary
    * values ride back as a 1-row broadcast, and the final aggregate
    * has at most 125 (r, f, m) cells.
    */
  def rfmSegments(e: DataFrame): DataFrame = {
    val perUser = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("pday"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .groupBy("user_id")
      .agg(max("pday").as("last_day"), count(lit(1)).as("freq"),
        sum("cents").as("monetary_cents"))
    val anchor = perUser.agg(max("last_day").as("anchor"))
    val rfm = perUser.crossJoin(broadcast(anchor))
      .select(col("user_id"),
        datediff(col("anchor"), col("last_day")).cast("bigint")
          .as("recency_days"),
        col("freq"), col("monetary_cents"),
        expr("monetary_cents DIV 100").as("monetary_dollars"))
    // ONE pass over rfm for all three metric streams: the 3-branch
    // union spelling re-derived the per-user aggregate per branch
    // (PlanAudit: 3 extra scans + groupBys at 100 TB for zero gain)
    val metrics = rfm.select(explode(array(
        struct(lit("r").as("metric"), col("recency_days").as("value")),
        struct(lit("f").as("metric"), col("freq").as("value")),
        struct(lit("m").as("metric"), col("monetary_dollars").as("value"))))
        .as("e"))
      .select(col("e.metric").as("metric"), col("e.value").as("value"))
    val wc = Window.partitionBy("metric").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy("metric")
    val cum = metrics.groupBy("metric", "value")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wc))
      .withColumn("n", sum("cnt").over(wn))
    def bnd(i: Int): Column =
      min(when(col("cum") >= expr(s"($i * n + 4) DIV 5"), col("value")))
        .as(s"b$i")
    val bounds = cum.groupBy("metric").agg(bnd(1), bnd(2), bnd(3), bnd(4))
    def pick(m: String, i: Int): Column =
      max(when(col("metric") === m, col(s"b$i"))).as(s"${m}b$i")
    val oneRow = bounds.groupBy().agg(
      pick("r", 1), (2 to 4).map(pick("r", _)) ++
        (1 to 4).map(pick("f", _)) ++ (1 to 4).map(pick("m", _)): _*)
    def hi(v: String, m: String): Column =
      (1 to 4).map(i => when(col(v) > col(s"${m}b$i"), 1L).otherwise(0L))
        .reduce(_ + _) + lit(1L)
    def lo(v: String, m: String): Column =
      (1 to 4).map(i => when(col(v) < col(s"${m}b$i"), 1L).otherwise(0L))
        .reduce(_ + _) + lit(1L)
    rfm.crossJoin(broadcast(oneRow))
      .withColumn("r_score", lo("recency_days", "r"))
      .withColumn("f_score", hi("freq", "f"))
      .withColumn("m_score", hi("monetary_dollars", "m"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"),
        sum("monetary_cents").as("revenue_cents"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 &&
          col("m_score") >= 4, "champion")
          .when(col("r_score") >= 4 && col("f_score") >= 3, "loyal")
          .when(col("r_score") >= 4, "recent")
          .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .otherwise("regular"))
      .select("r_score", "f_score", "m_score", "segment", "n_users",
        "revenue_cents")
  }

  val rfmSegmentsSql: String =
    """WITH per_user AS (
      |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      |      AS monetary_cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |anchor AS (SELECT max(last_day) AS anchor FROM per_user),
      |rfm AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', last_day, anchor) AS BIGINT)
      |      AS recency_days,
      |    freq, monetary_cents,
      |    monetary_cents // 100 AS monetary_dollars
      |  FROM per_user CROSS JOIN anchor),
      |metrics AS (
      |  SELECT 'r' AS metric, recency_days AS value FROM rfm
      |  UNION ALL SELECT 'f', freq FROM rfm
      |  UNION ALL SELECT 'm', monetary_dollars FROM rfm),
      |cum AS (
      |  SELECT metric, value, cnt,
      |    sum(cnt) OVER (PARTITION BY metric ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(cnt) OVER (PARTITION BY metric) AS n
      |  FROM (SELECT metric, value, count(*) AS cnt
      |        FROM metrics GROUP BY 1, 2)),
      |bounds AS (
      |  SELECT metric,
      |    min(CASE WHEN cum >= (1 * n + 4) // 5 THEN value END) AS b1,
      |    min(CASE WHEN cum >= (2 * n + 4) // 5 THEN value END) AS b2,
      |    min(CASE WHEN cum >= (3 * n + 4) // 5 THEN value END) AS b3,
      |    min(CASE WHEN cum >= (4 * n + 4) // 5 THEN value END) AS b4
      |  FROM cum GROUP BY 1),
      |one AS (
      |  SELECT
      |    max(CASE WHEN metric = 'r' THEN b1 END) AS rb1,
      |    max(CASE WHEN metric = 'r' THEN b2 END) AS rb2,
      |    max(CASE WHEN metric = 'r' THEN b3 END) AS rb3,
      |    max(CASE WHEN metric = 'r' THEN b4 END) AS rb4,
      |    max(CASE WHEN metric = 'f' THEN b1 END) AS fb1,
      |    max(CASE WHEN metric = 'f' THEN b2 END) AS fb2,
      |    max(CASE WHEN metric = 'f' THEN b3 END) AS fb3,
      |    max(CASE WHEN metric = 'f' THEN b4 END) AS fb4,
      |    max(CASE WHEN metric = 'm' THEN b1 END) AS mb1,
      |    max(CASE WHEN metric = 'm' THEN b2 END) AS mb2,
      |    max(CASE WHEN metric = 'm' THEN b3 END) AS mb3,
      |    max(CASE WHEN metric = 'm' THEN b4 END) AS mb4
      |  FROM bounds),
      |scored AS (
      |  SELECT monetary_cents,
      |    1 + (CASE WHEN recency_days < rb1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN recency_days < rb2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN recency_days < rb3 THEN 1 ELSE 0 END)
      |      + (CASE WHEN recency_days < rb4 THEN 1 ELSE 0 END) AS r_score,
      |    1 + (CASE WHEN freq > fb1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN freq > fb2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN freq > fb3 THEN 1 ELSE 0 END)
      |      + (CASE WHEN freq > fb4 THEN 1 ELSE 0 END) AS f_score,
      |    1 + (CASE WHEN monetary_dollars > mb1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN monetary_dollars > mb2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN monetary_dollars > mb3 THEN 1 ELSE 0 END)
      |      + (CASE WHEN monetary_dollars > mb4 THEN 1 ELSE 0 END) AS m_score
      |  FROM rfm CROSS JOIN one),
      |labeled AS (
      |  SELECT CAST(r_score AS BIGINT) AS r_score,
      |    CAST(f_score AS BIGINT) AS f_score,
      |    CAST(m_score AS BIGINT) AS m_score,
      |    CASE
      |      WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
      |        THEN 'champion'
      |      WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
      |      WHEN r_score >= 4 THEN 'recent'
      |      WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
      |      WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
      |      ELSE 'regular' END AS segment,
      |    monetary_cents
      |  FROM scored)
      |SELECT r_score, f_score, m_score, segment,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(monetary_cents) AS BIGINT) AS revenue_cents
      |FROM labeled GROUP BY 1, 2, 3, 4""".stripMargin

  /** Rolling active users: per calendar day, DAU (distinct users that
    * day), trailing-7-day distinct actives (WAU7 — each user counted
    * ONCE however many days they appeared), and the DAU/WAU7
    * stickiness ratio in permille — the growth panel every
    * product/ingest dashboard leads with.
    *
    * The rolling distinct is NOT a windowed sum of daily counts (that
    * double-counts returning users); each (day, user) row is exploded
    * onto the 7 window-end days it participates in and the window
    * aggregates distinct users — a bounded map-side 7x fan-out
    * followed by one hash shuffle, not a range self-join. Window-end
    * days past the corpus's last day are clipped against a 1-row max
    * broadcast; days with a window but no same-day activity report
    * DAU 0.
    *
    * Scale: |distinct (day, user)| x 7 shuffle rows — linear, and the
    * per-day distinct is the exact form; at extreme scale the same
    * panel runs on mergeable per-day HLL registers
    * ([[graft.llm.CorpusOps]]' q_hll_merge machinery) at 1 KB/day of
    * state, trading exactness for a constant-size shuffle. The exact
    * form here is what makes the oracle bit-checkable.
    */
  def rollingActives(ev: DataFrame): DataFrame = {
    val du = ev.select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val maxDay = du.agg(max("day").as("max_day"))
    val w7 = du
      .select(explode(expr("sequence(day, date_add(day, 6))")).as("wday"),
        col("user_id"))
      .groupBy("wday")
      .agg(countDistinct("user_id").as("wau7"))
    val dau = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
    w7.join(broadcast(maxDay), col("wday") <= col("max_day"))
      .join(dau, col("wday") === col("day"), "left")
      .select(date_format(col("wday"), "yyyy-MM-dd").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"), col("wau7"),
        expr("1000 * coalesce(dau, CAST(0 AS BIGINT)) DIV wau7")
          .as("stickiness_permille"))
  }

  val rollingActivesSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |mx AS (SELECT max(day) AS max_day FROM du),
      |w7 AS (
      |  SELECT day + k AS wday, count(DISTINCT user_id) AS wau7
      |  FROM du CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS k)
      |  GROUP BY 1),
      |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1)
      |SELECT strftime(w7.wday, '%Y-%m-%d') AS day,
      |  CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
      |  CAST(w7.wau7 AS BIGINT) AS wau7,
      |  CAST(1000 * coalesce(dau.dau, 0) // w7.wau7 AS BIGINT)
      |    AS stickiness_permille
      |FROM w7 CROSS JOIN mx LEFT JOIN dau ON w7.wday = dau.day
      |WHERE w7.wday <= mx.max_day""".stripMargin

  /** Conversion-lag distribution: for every purchase with a prior view
    * by the same user, the view→purchase latency in whole seconds,
    * summarized per day-of-week as count / min / exact p25 / p50 / p75
    * / max — the "how long does intent take to convert" panel, and the
    * empirical basis for choosing the as-of/interval join windows used
    * elsewhere (a 30-minute attribution window is a claim THIS table
    * checks).
    *
    * The prior view is a per-user running `last(view ts)` over one
    * user_id-partitioned window (the as-of shape without a second
    * table); quantiles are EXACT type-1 (value at rank ceil(q*n)) via
    * a row_number over each dow group — 7 answer-sized groups, so the
    * per-group sort is bounded; no global window anywhere. Day-of-week
    * is integer day-index arithmetic from a fixed epoch Monday
    * (2024-01-01), NOT the engines' dayofweek() (Spark counts from
    * Sunday=1, DuckDB from Sunday=0 — a bug that type systems don't
    * catch and hash compares do).
    *
    * Scale: one user_id shuffle for the lag, one 7-group aggregate;
    * the dow window sorts only purchase rows. At 100 TB the lag rows
    * are purchase-bounded (not event-bounded) before the quantile.
    */
  def conversionLag(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val lags = ev.filter(col("event_type").isin("view", "purchase"))
      .withColumn("last_view_us",
        last(when(col("event_type") === "view", unix_micros(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" &&
        col("last_view_us").isNotNull)
      .select(
        expr("pmod(datediff(to_date(ts), DATE '2024-01-01'), 7)")
          .cast("bigint").as("dow"),
        expr("(unix_micros(ts) - last_view_us) DIV 1000000").as("lag_sec"))
    val wd = Window.partitionBy("dow").orderBy("lag_sec")
    val wn = Window.partitionBy("dow")
    lags
      .withColumn("rn", row_number().over(wd))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("mn", min("lag_sec").over(wn))
      .withColumn("mx", max("lag_sec").over(wn))
      .filter(col("rn") === expr("(1 * n + 3) DIV 4") ||
        col("rn") === expr("(2 * n + 3) DIV 4") ||
        col("rn") === expr("(3 * n + 3) DIV 4"))
      .groupBy("dow")
      .agg(max("n").as("n_conversions"), max("mn").as("min_sec"),
        max(when(col("rn") === expr("(1 * n + 3) DIV 4"), col("lag_sec")))
          .as("p25_sec"),
        max(when(col("rn") === expr("(2 * n + 3) DIV 4"), col("lag_sec")))
          .as("p50_sec"),
        max(when(col("rn") === expr("(3 * n + 3) DIV 4"), col("lag_sec")))
          .as("p75_sec"),
        max("mx").as("max_sec"))
  }

  val conversionLagSql: String =
    """WITH vp AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |runs AS (
      |  SELECT event_type, ts,
      |    last_value(CASE WHEN event_type = 'view'
      |        THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS last_view_us
      |  FROM vp),
      |lags AS (
      |  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
      |      AS dow,
      |    (epoch_us(ts) - last_view_us) // 1000000 AS lag_sec
      |  FROM runs
      |  WHERE event_type = 'purchase' AND last_view_us IS NOT NULL),
      |ranked AS (
      |  SELECT dow, lag_sec,
      |    row_number() OVER (PARTITION BY dow ORDER BY lag_sec) AS rn,
      |    count(*) OVER (PARTITION BY dow) AS n,
      |    min(lag_sec) OVER (PARTITION BY dow) AS mn,
      |    max(lag_sec) OVER (PARTITION BY dow) AS mx
      |  FROM lags)
      |SELECT CAST(dow AS BIGINT) AS dow,
      |  CAST(max(n) AS BIGINT) AS n_conversions,
      |  CAST(max(mn) AS BIGINT) AS min_sec,
      |  CAST(max(CASE WHEN rn = (1 * n + 3) // 4 THEN lag_sec END)
      |    AS BIGINT) AS p25_sec,
      |  CAST(max(CASE WHEN rn = (2 * n + 3) // 4 THEN lag_sec END)
      |    AS BIGINT) AS p50_sec,
      |  CAST(max(CASE WHEN rn = (3 * n + 3) // 4 THEN lag_sec END)
      |    AS BIGINT) AS p75_sec,
      |  CAST(max(mx) AS BIGINT) AS max_sec
      |FROM ranked
      |WHERE rn = (1 * n + 3) // 4 OR rn = (2 * n + 3) // 4
      |  OR rn = (3 * n + 3) // 4
      |GROUP BY 1""".stripMargin

  /** Hour-of-week seasonality profile: event counts per (day-of-week,
    * hour) cell with a permille load index vs the uniform-traffic
    * expectation (1000 = average cell; 2000 = double) — the panel
    * capacity planning and anomaly thresholds read before trusting a
    * spike. Day-of-week by the same epoch-Monday integer arithmetic as
    * [[conversionLag]]; the index is exact integer permille
    * (1000 * n * 168 DIV total). One answer-sized (≤168-cell)
    * aggregate + a 1-row total broadcast. Scales by construction.
    */
  def seasonality(ev: DataFrame): DataFrame = {
    val cells = ev.groupBy(
        expr("pmod(datediff(to_date(ts), DATE '2024-01-01'), 7)")
          .cast("bigint").as("dow"),
        hour(col("ts")).cast("bigint").as("hod"))
      .agg(count(lit(1)).as("n_events"))
    val total = cells.agg(sum("n_events").as("total"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hod"), col("n_events"),
        expr("1000 * n_events * 168 DIV total").as("load_permille"))
  }

  val seasonalitySql: String =
    """WITH cells AS (
      |  SELECT date_diff('day', DATE '2024-01-01',
      |      CAST(ts AS DATE)) % 7 AS dow,
      |    hour(CAST(ts AS TIMESTAMP)) AS hod,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT sum(n_events) AS total FROM cells)
      |SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  CAST(1000 * n_events * 168 // total AS BIGINT) AS load_permille
      |FROM cells CROSS JOIN tot""".stripMargin

  /** Top clickstream paths: sessions cut at a 10-minute inactivity gap
    * (the lag-based session id — the batch spelling of what
    * session_window states up in streaming), each session reduced to
    * its first up-to-3 event types in arrival order, counted per path
    * with a permille share — the "how do users actually enter" panel
    * next to the funnel's prescribed order.
    *
    * Determinism: session membership and the first-3 picks ride one
    * per-user (ts, event_id) total order; the path string is built
    * from rank-conditional maxes, never collect_list (whose order is
    * partition-dependent).
    *
    * Scale: two user_id-partitioned windows on the same partitioning
    * (one exchange), then a path-keyed aggregate bounded by
    * |event_types|³ rows and a 1-row total broadcast. No global
    * window, no collect.
    */
  def sessionPaths(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 600L * 1000000L, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(w))
    val ws = Window.partitionBy("user_id", "sid")
      .orderBy(col("ts"), col("event_id"))
    val paths = sess
      .withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= 3)
      .groupBy("user_id", "sid")
      .agg(
        max(when(col("rn") === 1, col("event_type"))).as("e1"),
        max(when(col("rn") === 2, col("event_type"))).as("e2"),
        max(when(col("rn") === 3, col("event_type"))).as("e3"))
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
    val total = paths.agg(sum("n_sessions").as("total"))
    paths.crossJoin(broadcast(total))
      .select(col("path"), col("n_sessions"),
        expr("1000 * n_sessions DIV total").as("share_permille"))
  }

  val sessionPathsSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |sess AS (
      |  SELECT user_id, event_id, event_type, us,
      |    CASE WHEN lag(us, 1) OVER w IS NULL
      |      OR us - lag(us, 1) OVER w > 600 * 1000000 THEN 1 ELSE 0 END
      |      AS new_s
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sid AS (
      |  SELECT user_id, event_id, event_type, us,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM sess),
      |ranked AS (
      |  SELECT user_id, sid, event_type,
      |    row_number() OVER (PARTITION BY user_id, sid
      |      ORDER BY us, event_id) AS rn
      |  FROM sid),
      |paths AS (
      |  SELECT concat_ws('>',
      |      max(CASE WHEN rn = 1 THEN event_type END),
      |      max(CASE WHEN rn = 2 THEN event_type END),
      |      max(CASE WHEN rn = 3 THEN event_type END)) AS path
      |  FROM ranked WHERE rn <= 3 GROUP BY user_id, sid),
      |agg AS (SELECT path, count(*) AS n_sessions FROM paths GROUP BY 1),
      |tot AS (SELECT sum(n_sessions) AS total FROM agg)
      |SELECT path, CAST(n_sessions AS BIGINT) AS n_sessions,
      |  CAST(1000 * n_sessions // total AS BIGINT) AS share_permille
      |FROM agg CROSS JOIN tot""".stripMargin

  /** Seasonal-naive forecast backtest: daily purchase revenue per
    * event-value band forecast by "same weekday last week" (the
    * baseline every real forecasting system must beat), scored by
    * integer MAE over the final 7 days, plus the next-day forecast
    * itself. The panel a pipeline-health monitor uses to set alert
    * thresholds: if yesterday missed the seasonal-naive by 3x the
    * backtest MAE, page someone.
    *
    * The daily series is DENSE (calendar grid from the corpus's own
    * min/max day, zero-filled) so lag(7) is truly "a week earlier",
    * not "7 purchase-days earlier" — the gap-fill discipline of
    * [[gapFill]] at corpus grain. Everything is exact integer cents;
    * MAE is a truncating DIV.
    *
    * Scale: the grid is days x event_types (answer-sized); one
    * aggregate over purchases reaches it, the lag rides a per-type
    * window over grid rows. The 1-row min/max broadcast seeds the
    * grid. Nothing is user- or event-sized after the first aggregate.
    */
  def forecastBacktest(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"),
        (col("user_id") % 3).cast("bigint").as("band"))
      .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("cents"))
    val span = ev.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
    val grid = span
      .select(explode(expr("sequence(d0, d1)")).as("day"), col("d1"))
      .select(col("day"), col("d1"),
        explode(array(lit(0L), lit(1L), lit(2L))).as("band"))
    val w = Window.partitionBy("band").orderBy("day")
    val series = grid.join(daily, Seq("day", "band"), "left")
      .select(col("day"), col("d1"), col("band"),
        coalesce(col("cents"), lit(0L)).as("cents"))
      .withColumn("pred", lag("cents", 7).over(w))
    val back = series
      .filter(col("pred").isNotNull &&
        col("day") > date_sub(col("d1"), 7))
      .groupBy("band")
      .agg(count(lit(1)).as("n_backtest"),
        expr("CAST(sum(abs(cents - pred)) DIV count(*) AS BIGINT)")
          .as("mae_cents"))
    val next = series.filter(col("day") === date_sub(col("d1"), 6))
      .select(col("band"), col("cents").as("next_forecast_cents"))
    back.join(next, "band")
      .select("band", "n_backtest", "mae_cents", "next_forecast_cents")
  }

  val forecastBacktestSql: String =
    """WITH p AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id % 3 AS band,
      |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |span AS (
      |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
      |  FROM events),
      |grid AS (
      |  SELECT g.day, s.d1, b.band
      |  FROM span s,
      |    LATERAL (SELECT unnest(generate_series(s.d0, s.d1,
      |      INTERVAL 1 DAY)) AS day) g,
      |    (SELECT unnest([0, 1, 2]) AS band) b),
      |series AS (
      |  SELECT g.day, g.d1, g.band,
      |    coalesce(p.cents, 0) AS cents,
      |    lag(coalesce(p.cents, 0), 7)
      |      OVER (PARTITION BY g.band ORDER BY g.day) AS pred
      |  FROM grid g LEFT JOIN p ON g.day = p.day AND g.band = p.band),
      |back AS (
      |  SELECT band, count(*) AS n_backtest,
      |    CAST(sum(abs(cents - pred)) // count(*) AS BIGINT) AS mae_cents
      |  FROM series
      |  WHERE pred IS NOT NULL AND day > d1 - INTERVAL 7 DAY
      |  GROUP BY 1),
      |nxt AS (
      |  SELECT band, cents AS next_forecast_cents FROM series
      |  WHERE day = d1 - INTERVAL 6 DAY)
      |SELECT CAST(b.band AS BIGINT) AS band,
      |  CAST(b.n_backtest AS BIGINT) AS n_backtest, b.mae_cents,
      |  CAST(n.next_forecast_cents AS BIGINT) AS next_forecast_cents
      |FROM back b JOIN nxt n ON b.band = n.band""".stripMargin

  /** Churn training-set builder: one row per user active BEFORE the
    * cutoff (corpus end minus 14 days), with behavioral features
    * computed STRICTLY from pre-cutoff events and the churn label
    * (no activity after the cutoff) from post-cutoff events — label
    * leakage is impossible by construction because the two windows
    * partition the timeline, the same point-in-time discipline
    * [[featuresAtPurchase]] applies per-event. The panel an ML
    * pipeline materializes before handing anything to a trainer.
    *
    * Scale: two disjoint per-user aggregates sharing one user_id
    * partitioning + a 1-row cutoff broadcast. No windows.
    */
  def churnFeatures(ev: DataFrame): DataFrame = {
    val withDay = ev.select(col("user_id"), col("event_type"),
      expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"),
      to_date(col("ts")).as("day"))
    val cutoff = withDay.agg(date_sub(max("day"), 14).as("cutoff"))
    val tagged = withDay.crossJoin(broadcast(cutoff))
    val feats = tagged.filter(col("day") <= col("cutoff"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(0L)).as("revenue_cents"),
        countDistinct("day").as("days_active"),
        datediff(max("cutoff"), max("day")).cast("bigint")
          .as("recency_days"))
    val future = tagged.filter(col("day") > col("cutoff"))
      .select("user_id").distinct()
    feats.join(future.withColumn("active_after", lit(1L)),
        Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_purchases"),
        col("revenue_cents"), col("days_active"), col("recency_days"),
        when(col("active_after").isNull, 1L).otherwise(0L)
          .as("churn_label"))
  }

  val churnFeaturesSql: String =
    """WITH wd AS (
      |  SELECT user_id, event_type,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
      |    CAST(ts AS DATE) AS day
      |  FROM events),
      |co AS (SELECT max(day) - INTERVAL 14 DAY AS cutoff FROM wd),
      |feats AS (
      |  SELECT user_id, count(*) AS n_events,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS n_purchases,
      |    sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
      |      AS revenue_cents,
      |    count(DISTINCT day) AS days_active,
      |    date_diff('day', max(day), max(CAST(cutoff AS DATE)))
      |      AS recency_days
      |  FROM wd CROSS JOIN co WHERE day <= cutoff GROUP BY 1),
      |fut AS (
      |  SELECT DISTINCT user_id FROM wd CROSS JOIN co WHERE day > cutoff)
      |SELECT f.user_id, CAST(f.n_events AS BIGINT) AS n_events,
      |  CAST(f.n_purchases AS BIGINT) AS n_purchases,
      |  CAST(f.revenue_cents AS BIGINT) AS revenue_cents,
      |  CAST(f.days_active AS BIGINT) AS days_active,
      |  CAST(f.recency_days AS BIGINT) AS recency_days,
      |  CAST(CASE WHEN fut.user_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS churn_label
      |FROM feats f LEFT JOIN fut ON f.user_id = fut.user_id""".stripMargin

  /** Feature-drift panel: the purchase-value distribution of the
    * corpus's first half of days (the "training window") vs its
    * second half (the "serving window"), per log2-cents bucket, with
    * each side's share in permille and the absolute share difference —
    * the drift monitor an ML-ops pipeline reads before trusting a
    * model trained on last month (total variation distance = half the
    * sum of abs_diff_permille, derivable by the reader). Integer
    * permille on both sides; log2 buckets via the highest-set-bit
    * device; the midpoint split is data-derived (1-row broadcast).
    *
    * Scale: one purchase pass into a ≤64-bucket x 2-side aggregate;
    * side totals ride the same answer-sized table. Nothing global.
    */
  def valueDrift(ev: DataFrame): DataFrame = {
    val p = ev.filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val mid = p.agg(expr(
      "date_add(min(day), CAST(datediff(max(day), min(day)) DIV 2 AS INT))")
      .as("mid"))
    val sided = p.crossJoin(broadcast(mid))
      .select(
        when(col("day") <= col("mid"), lit("ref")).otherwise(lit("cur"))
          .as("side"),
        expr("length(bin(greatest(cents, 1)))").cast("bigint").as("bucket"))
    val cells = sided.groupBy("bucket")
      .agg(sum(when(col("side") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("side") === "cur", 1L).otherwise(0L)).as("n_cur"))
    val totals = sided.groupBy()
      .agg(sum(when(col("side") === "ref", 1L).otherwise(0L)).as("t_ref"),
        sum(when(col("side") === "cur", 1L).otherwise(0L)).as("t_cur"))
    cells.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        expr("1000 * n_ref DIV t_ref").as("ref_permille"),
        expr("1000 * n_cur DIV t_cur").as("cur_permille"),
        expr("abs(1000 * n_ref DIV t_ref - 1000 * n_cur DIV t_cur)")
          .as("abs_diff_permille"))
  }

  val valueDriftSql: String =
    """WITH p AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |m AS (
      |  SELECT min(day) + CAST(date_diff('day', min(day), max(day)) // 2
      |    AS INTEGER) AS mid FROM p),
      |sided AS (
      |  SELECT CASE WHEN day <= mid THEN 'ref' ELSE 'cur' END AS side,
      |    length(bin(greatest(cents, 1))) AS bucket
      |  FROM p CROSS JOIN m),
      |cells AS (
      |  SELECT bucket,
      |    sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS n_ref,
      |    sum(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS n_cur
      |  FROM sided GROUP BY 1),
      |tot AS (
      |  SELECT sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS t_ref,
      |    sum(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS t_cur
      |  FROM sided)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
      |  CAST(1000 * n_ref // t_ref AS BIGINT) AS ref_permille,
      |  CAST(1000 * n_cur // t_cur AS BIGINT) AS cur_permille,
      |  CAST(abs(1000 * n_ref // t_ref - 1000 * n_cur // t_cur) AS BIGINT)
      |    AS abs_diff_permille
      |FROM cells CROSS JOIN tot""".stripMargin

  /** Sample-ratio-mismatch guardrail for the A/B split — the
    * invalidity check every experiment platform runs BEFORE reading
    * the conversion panel: each variant's exposed-user count against
    * the 50/50 expectation, deviation in permille of total, plus a
    * scaled chi-square statistic (1e6·Σ(n−e)²/e as exact integers;
    * the 3.84 critical value at α=0.05 and df=1 is 3.84e6 on this
    * scale — a reading above it means the assignment is broken and
    * the experiment's panel is untrustworthy regardless of its
    * lift). One user-level aggregate reusing the exact hash split of
    * [[abExperiment]]; panel is 2 rows + the broadcast total.
    */
  def abSrmCheck(e: DataFrame): DataFrame = {
    val perVariant = e
      .withColumn("variant",
        when(pmod(graft.ops.Hll.h60(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2)) === 0,
          lit("A")).otherwise(lit("B")))
      .groupBy("variant")
      .agg(countDistinct("user_id").as("n_users"))
    val total = perVariant.agg(sum("n_users").as("t"))
    perVariant.crossJoin(broadcast(total))
      .select(col("variant"), col("n_users"),
        expr("t DIV 2").as("expected"),
        expr("1000 * abs(2 * n_users - t) DIV t").as("dev_permille"),
        expr("""1000000 * (2 * n_users - t) * (2 * n_users - t)
          DIV (2 * t)""").as("chi2_x1e6_term"))
  }

  val abSrmCheckSql: String = {
    val h = graft.ops.Hll.h60Sql("'ab:' || CAST(user_id AS VARCHAR)")
    s"""WITH pv AS (
       |  SELECT CASE WHEN ($h) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
       |    count(DISTINCT user_id) AS n_users
       |  FROM events GROUP BY 1),
       |tot AS (SELECT sum(n_users) AS t FROM pv)
       |SELECT variant, CAST(n_users AS BIGINT) AS n_users,
       |  CAST(t // 2 AS BIGINT) AS expected,
       |  CAST(1000 * abs(2 * n_users - t) // t AS BIGINT) AS dev_permille,
       |  CAST(1000000 * (2 * n_users - t) * (2 * n_users - t)
       |    // (2 * t) AS BIGINT) AS chi2_x1e6_term
       |FROM pv CROSS JOIN tot""".stripMargin
  }

  /** Holt linear-trend exponential smoothing (double exponential) per
    * revenue band over the dense daily-cents grid — the
    * level-plus-trend upgrade of [[ewmaDaily]] and the parametric
    * sibling of [[forecastBacktest]]'s seasonal-naive: with integer
    * permille smoothing weights,
    *   level_t = (α·y_t + (1000-α)·(level+trend)) DIV 1000,
    *   trend_t = (β·(level_t - level) + (1000-β)·trend) DIV 1000,
    * initialized level_0 = y_0, trend_0 = 0 (the zero-trend init —
    * deterministic, no lookahead). Emits per band the final state, the
    * 1-step-ahead forecast (level + trend), and the one-step backtest
    * MAE accumulated DURING the fold (each day scored against the
    * previous state's forecast) — the honest in-sample residual a
    * dashboard compares today's error against.
    *
    * Scale: the fold is a per-band `aggregate` HOF over the collected
    * day series — the series length is the TIME SPAN, not the corpus
    * (a year is 365 structs per band regardless of event volume), and
    * the daily rollup feeding it is map-side combinable. Truncating
    * integer division matches DuckDB `//` for negative trends too
    * (both truncate toward zero — verified).
    */
  def holtForecast(
      ev: DataFrame, alphaPermille: Int = 300,
      betaPermille: Int = 100): DataFrame = {
    val a = alphaPermille; val b = betaPermille
    val daily = ev.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"),
        (col("user_id") % 3).cast("bigint").as("band"))
      .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("cents"))
    val span = ev.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
    val grid = span
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .select(col("day"), explode(array(lit(0L), lit(1L), lit(2L))).as("band"))
    val series = grid.join(daily, Seq("day", "band"), "left")
      .select(col("band"), col("day"),
        coalesce(col("cents"), lit(0L)).as("cents"))
    // newLevel is inlined twice in the trend line — SQL lambdas have
    // no let-binding; identical arithmetic either way
    val newLevel =
      s"($a * y.cents + ${1000 - a} * (acc.level + acc.trend)) DIV 1000"
    series.groupBy("band")
      .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
        .as("ys"))
      .select(col("band"), size(col("ys")).cast("bigint").as("n_days"),
        expr(
          s"""aggregate(ys,
             |  struct(CAST(0 AS BIGINT) AS level, CAST(0 AS BIGINT) AS trend,
             |         CAST(0 AS BIGINT) AS errsum, CAST(0 AS BIGINT) AS n,
             |         0 AS started),
             |  (acc, y) -> CASE WHEN acc.started = 0 THEN
             |      struct(y.cents AS level, CAST(0 AS BIGINT) AS trend,
             |             CAST(0 AS BIGINT) AS errsum, CAST(0 AS BIGINT) AS n,
             |             1 AS started)
             |    ELSE struct(
             |      $newLevel AS level,
             |      ($b * (($newLevel) - acc.level) + ${1000 - b} * acc.trend)
             |        DIV 1000 AS trend,
             |      acc.errsum + abs(y.cents - (acc.level + acc.trend))
             |        AS errsum,
             |      acc.n + CAST(1 AS BIGINT) AS n, 1 AS started) END)
             |""".stripMargin).as("h"))
      .select(col("band"), col("n_days"),
        col("h.level").as("level_cents"), col("h.trend").as("trend_cents"),
        (col("h.level") + col("h.trend")).as("forecast_next_cents"),
        expr("h.errsum DIV nullif(h.n, 0)").as("holt_mae_cents"))
  }

  val holtForecastSql: String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT CAST(ts AS DATE) AS day, user_id % 3 AS band,
       |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |span AS (
       |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
       |  FROM events),
       |grid AS (
       |  -- separate derived tables: DuckDB ZIPS parallel unnests in
       |  -- one SELECT; the grid needs the cross product
       |  SELECT d.day, b.band FROM
       |    (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
       |       AS DATE) AS day FROM span) d
       |    CROSS JOIN (SELECT unnest([0, 1, 2]) AS band) b),
       |series AS (
       |  SELECT g.band, g.day, coalesce(d.cents, 0) AS cents
       |  FROM grid g LEFT JOIN daily d ON g.day = d.day AND g.band = d.band),
       |-- the fold is a recursive CTE stepping one day per level, NOT
       |-- a struct-accumulator list_reduce: DuckDB 1.0's list_reduce
       |-- evaluates later struct fields against ALREADY-UPDATED
       |-- accumulator fields in multi-step folds (reproduced: errsum
       |-- read newLevel + newTrend), so the lambda spelling silently
       |-- diverges from any sequential semantics
       |numbered AS (
       |  SELECT band, cents,
       |    row_number() OVER (PARTITION BY band ORDER BY day) AS i,
       |    count(*) OVER (PARTITION BY band) AS n_days
       |  FROM series),
       |fold AS (
       |  SELECT band, n_days, i,
       |    CAST(cents AS BIGINT) AS level, CAST(0 AS BIGINT) AS trend,
       |    CAST(0 AS BIGINT) AS errsum, CAST(0 AS BIGINT) AS n
       |  FROM numbered WHERE i = 1
       |  UNION ALL
       |  SELECT f.band, f.n_days, s.i,
       |    (300 * s.cents + 700 * (f.level + f.trend)) // 1000,
       |    (100 * (((300 * s.cents + 700 * (f.level + f.trend)) // 1000)
       |      - f.level) + 900 * f.trend) // 1000,
       |    f.errsum + abs(s.cents - (f.level + f.trend)),
       |    f.n + 1
       |  FROM fold f JOIN numbered s ON s.band = f.band AND s.i = f.i + 1)
       |SELECT CAST(band AS BIGINT) AS band,
       |  CAST(n_days AS BIGINT) AS n_days,
       |  CAST(level AS BIGINT) AS level_cents,
       |  CAST(trend AS BIGINT) AS trend_cents,
       |  CAST(level + trend AS BIGINT) AS forecast_next_cents,
       |  CAST(errsum // nullif(n, 0) AS BIGINT) AS holt_mae_cents
       |FROM fold WHERE i = n_days""".stripMargin

  /** Per-day Holt residual rows — [[holtForecast]]'s fold with each
    * step EMITTED instead of only the final state: for every grid day
    * after the init day, (actual, prior-state forecast, absolute
    * error). The driver-verifiable batch mirror of the streaming
    * [[graft.streaming.StatefulOps.holtFeed]] — same recurrence, same
    * emission shape — closing the batch/stream/oracle triangle the
    * seasonal-naive family has (forecastBacktest /
    * forecastResidualFeed). The fold accumulates the row array inside
    * the aggregate HOF; its length is the TIME SPAN, not the corpus.
    */
  def holtDaily(
      ev: DataFrame, alphaPermille: Int = 300,
      betaPermille: Int = 100): DataFrame = {
    val a = alphaPermille; val b = betaPermille
    val daily = ev.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"),
        (col("user_id") % 3).cast("bigint").as("band"))
      .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("cents"))
    val span = ev.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
    val grid = span
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .select(col("day"), explode(array(lit(0L), lit(1L), lit(2L))).as("band"))
    val series = grid.join(daily, Seq("day", "band"), "left")
      .select(col("band"), col("day"),
        coalesce(col("cents"), lit(0L)).as("cents"))
    val newLevel =
      s"($a * y.cents + ${1000 - a} * (acc.level + acc.trend)) DIV 1000"
    series.groupBy("band")
      .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
        .as("ys"))
      .select(col("band"),
        explode(expr(
          s"""aggregate(ys,
             |  struct(CAST(0 AS BIGINT) AS level, CAST(0 AS BIGINT) AS trend,
             |    0 AS started,
             |    CAST(array() AS
             |      array<struct<day:date,cents:bigint,forecast:bigint,
             |                   abs_err:bigint>>) AS rows),
             |  (acc, y) -> CASE WHEN acc.started = 0 THEN
             |      struct(y.cents AS level, CAST(0 AS BIGINT) AS trend,
             |        1 AS started, acc.rows AS rows)
             |    ELSE struct(
             |      $newLevel AS level,
             |      ($b * (($newLevel) - acc.level) + ${1000 - b} * acc.trend)
             |        DIV 1000 AS trend,
             |      1 AS started,
             |      concat(acc.rows, array(struct(
             |        y.day AS day, y.cents AS cents,
             |        acc.level + acc.trend AS forecast,
             |        abs(y.cents - (acc.level + acc.trend)) AS abs_err)))
             |        AS rows) END).rows
             |""".stripMargin)).as("r"))
      .select(col("band"), col("r.day").as("day"), col("r.cents").as("cents"),
        col("r.forecast").as("forecast_cents"),
        col("r.abs_err").as("abs_err"))
  }

  val holtDailySql: String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT CAST(ts AS DATE) AS day, user_id % 3 AS band,
       |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |span AS (
       |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
       |  FROM events),
       |grid AS (
       |  SELECT d.day, b.band FROM
       |    (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
       |       AS DATE) AS day FROM span) d
       |    CROSS JOIN (SELECT unnest([0, 1, 2]) AS band) b),
       |series AS (
       |  SELECT g.band, g.day, coalesce(d.cents, 0) AS cents
       |  FROM grid g LEFT JOIN daily d ON g.day = d.day AND g.band = d.band),
       |numbered AS (
       |  SELECT band, day, cents,
       |    row_number() OVER (PARTITION BY band ORDER BY day) AS i
       |  FROM series),
       |fold AS (
       |  SELECT band, i, day, CAST(cents AS BIGINT) AS cents,
       |    CAST(NULL AS BIGINT) AS forecast, CAST(NULL AS BIGINT) AS abs_err,
       |    CAST(cents AS BIGINT) AS level, CAST(0 AS BIGINT) AS trend
       |  FROM numbered WHERE i = 1
       |  UNION ALL
       |  SELECT f.band, s.i, s.day, CAST(s.cents AS BIGINT),
       |    f.level + f.trend,
       |    abs(s.cents - (f.level + f.trend)),
       |    (300 * s.cents + 700 * (f.level + f.trend)) // 1000,
       |    (100 * (((300 * s.cents + 700 * (f.level + f.trend)) // 1000)
       |      - f.level) + 900 * f.trend) // 1000
       |  FROM fold f JOIN numbered s ON s.band = f.band AND s.i = f.i + 1)
       |SELECT CAST(band AS BIGINT) AS band, day, cents,
       |  forecast AS forecast_cents, abs_err
       |FROM fold WHERE i >= 2""".stripMargin

  /** Two-sided CUSUM changepoint monitor over the daily revenue
    * series — the sequential-detection classic (Page 1954) that fills
    * the gap between [[anomalyWindows]] (point outliers vs a rolling
    * band) and [[holtForecast]] (trend): a SMALL persistent shift that
    * never trips a per-day z-test accumulates in the CUSUM until it
    * crosses the decision threshold. Per band: reference mean μ =
    * first-7-day average (integer DIV), slack k = μ DIV 20 (shifts
    * under 5% of a day's revenue are noise by declaration), threshold
    * h = μ (one average day of accumulated excess). Recurrences
    *   pos' = max(0, pos + x − μ − k), neg' = max(0, neg + μ − k − x),
    * alarm when either exceeds h, both reset on alarm (restart
    * detection, the textbook discipline). Emits one row per post-
    * warmup day with both pre-reset statistics and the alarm flag —
    * all arithmetic integer cents, so the DuckDB replay is bit-exact.
    *
    * Scale: identical shape to [[holtDaily]] — the per-band fold runs
    * over a TIME-SPAN-sized array (days, not events) assembled by one
    * map-side-combined daily aggregate; bands are independent
    * partitions. The fold is sequential by nature (each day's state
    * needs the prior day's), so the array HOF is the honest spelling,
    * not a shortcut.
    */
  def cusumDaily(ev: DataFrame, warmDays: Int = 7): DataFrame = {
    val w = warmDays
    val daily = ev.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"),
        (col("user_id") % 3).cast("bigint").as("band"))
      .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("cents"))
    val span = ev.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
    val grid = span
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .select(col("day"), explode(array(lit(0L), lit(1L), lit(2L))).as("band"))
    val series = grid.join(daily, Seq("day", "band"), "left")
      .select(col("band"), col("day"),
        coalesce(col("cents"), lit(0L)).as("cents"))
    // pre-reset statistics, inlined wherever read (SQL lambdas have no
    // let-binding; identical arithmetic at every site)
    val posRaw = "greatest(CAST(0 AS BIGINT), acc.pos + y.cents - acc.mu - acc.k)"
    val negRaw = "greatest(CAST(0 AS BIGINT), acc.neg + acc.mu - acc.k - y.cents)"
    val alarm = s"IF($posRaw > acc.h OR $negRaw > acc.h, " +
      "CAST(1 AS BIGINT), CAST(0 AS BIGINT))"
    series.groupBy("band")
      .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
        .as("ys"))
      .select(col("band"),
        explode(expr(
          s"""aggregate(ys,
             |  struct(CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS warm,
             |    CAST(0 AS BIGINT) AS mu, CAST(0 AS BIGINT) AS k,
             |    CAST(0 AS BIGINT) AS h,
             |    CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS neg,
             |    CAST(array() AS
             |      array<struct<day:date,cents:bigint,cusum_pos:bigint,
             |                   cusum_neg:bigint,alarm:bigint>>) AS rows),
             |  (acc, y) -> CASE
             |    WHEN acc.i < ${w - 1} THEN
             |      struct(acc.i + 1 AS i, acc.warm + y.cents AS warm,
             |        acc.mu AS mu, acc.k AS k, acc.h AS h,
             |        acc.pos AS pos, acc.neg AS neg, acc.rows AS rows)
             |    WHEN acc.i = ${w - 1} THEN
             |      struct(acc.i + 1 AS i, acc.warm + y.cents AS warm,
             |        (acc.warm + y.cents) DIV $w AS mu,
             |        ((acc.warm + y.cents) DIV $w) DIV 20 AS k,
             |        (acc.warm + y.cents) DIV $w AS h,
             |        CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS neg,
             |        acc.rows AS rows)
             |    ELSE
             |      struct(acc.i + 1 AS i, acc.warm AS warm,
             |        acc.mu AS mu, acc.k AS k, acc.h AS h,
             |        IF($alarm = 1, CAST(0 AS BIGINT), $posRaw) AS pos,
             |        IF($alarm = 1, CAST(0 AS BIGINT), $negRaw) AS neg,
             |        concat(acc.rows, array(struct(
             |          y.day AS day, y.cents AS cents,
             |          $posRaw AS cusum_pos, $negRaw AS cusum_neg,
             |          $alarm AS alarm))) AS rows) END).rows
             |""".stripMargin)).as("r"))
      .select(col("band"), col("r.day").as("day"), col("r.cents").as("cents"),
        col("r.cusum_pos").as("cusum_pos"),
        col("r.cusum_neg").as("cusum_neg"), col("r.alarm").as("alarm"))
  }

  /** DuckDB replay of [[cusumDaily]]: the warmup mean per band as one
    * filtered aggregate, the fold as a recursive CTE stepping one day
    * per level (the [[holtDailySql]] device — DuckDB's list_reduce
    * mis-sequences multi-field struct folds), carrying post-reset
    * state and emitting pre-reset statistics.
    */
  val cusumDailySql: String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT CAST(ts AS DATE) AS day, user_id % 3 AS band,
       |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |span AS (
       |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
       |  FROM events),
       |grid AS (
       |  SELECT d.day, b.band FROM
       |    (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
       |       AS DATE) AS day FROM span) d
       |    CROSS JOIN (SELECT unnest([0, 1, 2]) AS band) b),
       |series AS (
       |  SELECT g.band, g.day, coalesce(d.cents, 0) AS cents
       |  FROM grid g LEFT JOIN daily d ON g.day = d.day AND g.band = d.band),
       |numbered AS (
       |  SELECT band, day, cents,
       |    row_number() OVER (PARTITION BY band ORDER BY day) AS i
       |  FROM series),
       |ref AS (
       |  SELECT band,
       |    CAST(sum(cents) FILTER (WHERE i <= 7) AS BIGINT) // 7 AS mu
       |  FROM numbered GROUP BY band),
       |fold AS (
       |  SELECT n.band, n.i, n.day, CAST(n.cents AS BIGINT) AS cents,
       |    r.mu, r.mu // 20 AS k, r.mu AS h,
       |    CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS neg,
       |    CAST(0 AS BIGINT) AS cusum_pos, CAST(0 AS BIGINT) AS cusum_neg,
       |    CAST(0 AS BIGINT) AS alarm
       |  FROM numbered n JOIN ref r ON n.band = r.band WHERE n.i = 7
       |  UNION ALL
       |  SELECT f.band, s.i, s.day, CAST(s.cents AS BIGINT),
       |    f.mu, f.k, f.h,
       |    CASE WHEN greatest(0, f.pos + s.cents - f.mu - f.k) > f.h
       |           OR greatest(0, f.neg + f.mu - f.k - s.cents) > f.h
       |      THEN 0 ELSE greatest(0, f.pos + s.cents - f.mu - f.k) END,
       |    CASE WHEN greatest(0, f.pos + s.cents - f.mu - f.k) > f.h
       |           OR greatest(0, f.neg + f.mu - f.k - s.cents) > f.h
       |      THEN 0 ELSE greatest(0, f.neg + f.mu - f.k - s.cents) END,
       |    greatest(0, f.pos + s.cents - f.mu - f.k),
       |    greatest(0, f.neg + f.mu - f.k - s.cents),
       |    CASE WHEN greatest(0, f.pos + s.cents - f.mu - f.k) > f.h
       |           OR greatest(0, f.neg + f.mu - f.k - s.cents) > f.h
       |      THEN 1 ELSE 0 END
       |  FROM fold f JOIN numbered s ON s.band = f.band AND s.i = f.i + 1)
       |SELECT CAST(band AS BIGINT) AS band, day, cents,
       |  CAST(cusum_pos AS BIGINT) AS cusum_pos,
       |  CAST(cusum_neg AS BIGINT) AS cusum_neg,
       |  CAST(alarm AS BIGINT) AS alarm
       |FROM fold WHERE i >= 8""".stripMargin

  /** Mann-Whitney U panel for the A/B split — the NONPARAMETRIC
    * effect check (rank-based, outlier-robust) beside [[abExperiment]]
    * (means), [[abCuped]] (variance-reduced means), and
    * [[abSrmCheck]] (validity): per-user total purchase cents ranked
    * across both variants with average-rank tie handling, everything
    * DOUBLED to stay integer (`r2` = twice the rank sum, `u2` = twice
    * the U statistic, `2·E[U] = n_a·n_b`). The identity
    * U_A + U_B = n_a·n_b is emitted as a consistency column.
    *
    * Scale: ranks need "how many users are below each value", which is
    * NOT a global window here — the value histogram cumulates
    * TWO-LEVEL (log2-octave-partitioned intra windows + a
    * structurally-capped ≤64-octave triangular join, the
    * [[graft.ops.Relational.qRevenueConcentration]] device), so no
    * single reducer ever sees the corpus. Rank-sum products are
    * accumulated in DECIMAL(38,0) (HUGEINT oracle-side): blockwise
    * n_b·(2c+n+1) sums reach ~n² and would wrap int64 past ~10⁹
    * users.
    */
  def abMannWhitney(e: DataFrame): DataFrame = {
    val perUser = e
      .withColumn("variant",
        when(pmod(graft.ops.Hll.h60(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2)) === 0,
          lit("A")).otherwise(lit("B")))
      .groupBy("variant", "user_id")
      .agg(sum(when(col("event_type") === "purchase",
        expr("CAST(round(value * 100, 0) AS BIGINT)")).otherwise(lit(0L)))
        .as("cents"))
    val vals = perUser.groupBy("cents")
      .agg(sum(when(col("variant") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("nb"))
      .withColumn("oct", expr("length(bin(greatest(cents, 1)))"))
    val wIn = Window.partitionBy("oct").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = vals.withColumn("c_in",
      coalesce(sum(col("na") + col("nb")).over(wIn), lit(0L)))
    val octTot = vals.groupBy("oct")
      .agg(sum(col("na") + col("nb")).as("oc"))
      .orderBy("oct").limit(64) // ≤64 octaves for int64 by construction
    val below = octTot.as("a")
      .join(octTot.as("b"), col("b.oct") < col("a.oct"))
      .groupBy(col("a.oct").as("oct")).agg(sum(col("b.oc")).as("c_below"))
    val blocks = intra.join(below, Seq("oct"), "left")
      .select(col("cents"), col("na"), col("nb"),
        (coalesce(col("c_below"), lit(0L)) + col("c_in")).as("c"),
        (col("na") + col("nb")).as("n"))
    val sums = blocks.agg(
      sum("na").as("n_a"), sum("nb").as("n_b"),
      sum(expr("CAST(na AS DECIMAL(38,0)) * (2 * c + n + 1)")).as("r2a"),
      sum(expr("CAST(nb AS DECIMAL(38,0)) * (2 * c + n + 1)")).as("r2b"))
    sums.select(col("n_a"), col("n_b"),
      expr("CAST(r2b AS BIGINT)").as("r2_b"),
      expr("CAST(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) AS BIGINT)")
        .as("u2_a"),
      expr("CAST(r2b - CAST(n_b AS DECIMAL(38,0)) * (n_b + 1) AS BIGINT)")
        .as("u2_b"),
      expr("n_a * n_b").as("u2_mean"),
      expr("CAST(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) " +
        "+ r2b - CAST(n_b AS DECIMAL(38,0)) * (n_b + 1) " +
        "- 2 * CAST(n_a AS DECIMAL(38,0)) * n_b AS BIGINT)")
        .as("identity_check"))
  }

  val abMannWhitneySql: String = {
    val h = graft.ops.Hll.h60Sql("'ab:' || CAST(user_id AS VARCHAR)")
    s"""WITH pu AS (
       |  SELECT CASE WHEN ($h) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
       |    user_id,
       |    sum(CASE WHEN event_type = 'purchase'
       |        THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
       |      AS cents
       |  FROM events GROUP BY 1, 2),
       |vals AS (
       |  SELECT cents,
       |    sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS na,
       |    sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS nb
       |  FROM pu GROUP BY 1),
       |blocks AS (
       |  SELECT cents, na, nb, na + nb AS n,
       |    coalesce(sum(na + nb) OVER (ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
       |  FROM vals),
       |sums AS (
       |  SELECT CAST(sum(na) AS BIGINT) AS n_a,
       |    CAST(sum(nb) AS BIGINT) AS n_b,
       |    sum(CAST(na AS HUGEINT) * (2 * c + n + 1)) AS r2a,
       |    sum(CAST(nb AS HUGEINT) * (2 * c + n + 1)) AS r2b
       |  FROM blocks)
       |SELECT n_a, n_b,
       |  CAST(r2b AS BIGINT) AS r2_b,
       |  CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
       |  CAST(r2b - CAST(n_b AS HUGEINT) * (n_b + 1) AS BIGINT) AS u2_b,
       |  CAST(n_a * n_b AS BIGINT) AS u2_mean,
       |  CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1)
       |    + r2b - CAST(n_b AS HUGEINT) * (n_b + 1)
       |    - 2 * CAST(n_a AS HUGEINT) * n_b AS BIGINT) AS identity_check
       |FROM sums""".stripMargin
  }

  /** CUPED variance-reduced A/B panel (Deng et al. 2013): the
    * pre-period covariate X (each user's pre-midpoint purchase cents)
    * absorbs between-user variance from the post-period metric Y, so
    * the adjusted per-variant means separate with far fewer users.
    * θ is the pooled regression slope, scaled-integer:
    *   θ_e3 = 1000·(n·Sxy − Sx·Sy) DIV (n·Sxx − Sx²),
    * computed in DECIMAL(38,0) (HUGEINT oracle-side — the sums of
    * squares are the overflow-prone terms; per-user MEANS stay small
    * regardless of corpus size, so the adjustment arithmetic below is
    * plain int64):
    *   adj_mean_e3 = mean_post_e3 − θ_e3·(mean_pre_e3 −
    *                 grand_mean_pre_e3) DIV 1000.
    * Split day and variant hash follow [[valueDrift]] /
    * [[abExperiment]].
    *
    * Scale: one per-user aggregate (map-side combinable), a 1-row
    * pooled-stats broadcast, a 2-row variant panel. Nothing global.
    */
  def abCuped(e: DataFrame): DataFrame = {
    val withDay = e.select(col("user_id"), col("event_type"),
      to_date(col("ts")).as("day"),
      expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val mid = withDay.agg(expr(
      "date_add(min(day), CAST(datediff(max(day), min(day)) DIV 2 AS INT))")
      .as("mid"))
    val perUser = withDay.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "purchase" && col("day") <= col("mid"),
          col("cents")).otherwise(lit(0L))).as("x"),
        sum(when(col("event_type") === "purchase" && col("day") > col("mid"),
          col("cents")).otherwise(lit(0L))).as("y"))
      .withColumn("variant",
        when(pmod(graft.ops.Hll.h60(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2)) === 0,
          lit("A")).otherwise(lit("B")))
    val pooled = perUser.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .select(col("n"), col("sx"),
        expr("CAST(coalesce(" +
          "CAST(1000 AS DECIMAL(38,0)) * (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)" +
          " DIV nullif(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx, 0)," +
          " 0) AS BIGINT)").as("theta_e3"))
    perUser.groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum("x").as("pre_cents"), sum("y").as("post_cents"))
      .crossJoin(broadcast(pooled))
      .select(col("variant"), col("n_users"),
        col("pre_cents"), col("post_cents"), col("theta_e3"),
        expr("1000 * post_cents DIV n_users").as("mean_post_e3"),
        expr("1000 * post_cents DIV n_users - theta_e3 * " +
          "(1000 * pre_cents DIV n_users - 1000 * sx DIV n) DIV 1000")
          .as("adj_mean_post_e3"))
  }

  val abCupedSql: String = {
    val h = graft.ops.Hll.h60Sql("'ab:' || CAST(user_id AS VARCHAR)")
    s"""WITH wd AS (
       |  SELECT user_id, event_type, CAST(ts AS DATE) AS day,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents
       |  FROM events),
       |mid AS (
       |  SELECT min(day) + CAST((max(day) - min(day)) // 2 AS INT) AS mid
       |  FROM wd),
       |pu AS (
       |  SELECT user_id,
       |    sum(CASE WHEN event_type = 'purchase' AND day <= mid
       |        THEN cents ELSE 0 END) AS x,
       |    sum(CASE WHEN event_type = 'purchase' AND day > mid
       |        THEN cents ELSE 0 END) AS y,
       |    CASE WHEN ($h) % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM wd CROSS JOIN mid GROUP BY user_id),
       |pooled AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(coalesce(
       |      CAST(1000 AS HUGEINT) * (count(*) * sum(CAST(x AS HUGEINT) * y)
       |        - CAST(sum(x) AS HUGEINT) * sum(y))
       |      // nullif(count(*) * sum(CAST(x AS HUGEINT) * x)
       |        - CAST(sum(x) AS HUGEINT) * sum(x), 0),
       |      0) AS BIGINT) AS theta_e3
       |  FROM pu)
       |SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(sum(x) AS BIGINT) AS pre_cents,
       |  CAST(sum(y) AS BIGINT) AS post_cents,
       |  theta_e3,
       |  CAST(1000 * sum(y) // count(*) AS BIGINT) AS mean_post_e3,
       |  CAST(1000 * sum(y) // count(*) - theta_e3 *
       |    (1000 * sum(x) // count(*) - 1000 * sx // n) // 1000 AS BIGINT)
       |    AS adj_mean_post_e3
       |FROM pu CROSS JOIN pooled
       |GROUP BY variant, theta_e3, sx, n""".stripMargin
  }

  /** Autocorrelation panel of the daily purchase series — the
    * "is yesterday predictive, and at what horizon" read a modeler
    * takes BEFORE choosing between [[ewmaDaily]], [[holtForecast]],
    * and [[seasonality]]: per revenue band (`user_id % 3`, the
    * [[holtForecast]] banding) and lag 1..7, the exact Pearson
    * autocorrelation of daily total cents over the DENSE zero-filled
    * corpus grid (a sparse series would correlate presence, not
    * value — the [[gapFill]] discipline). Moment sums (n, Σx, Σy,
    * Σxy, Σx², Σy²) accumulate exactly in DECIMAL(38,0) (HUGEINT
    * oracle-side); only the final ratio rounds (6 dp), the
    * [[graft.ops.GraphOps]] assortativity convention. Zero-variance
    * windows yield NULL (constant series have no correlation), via
    * nullif on the denominator product.
    *
    * Scale: everything after the per-(band, day) aggregate is
    * GRID-sized — the lag self-join is an equi-join on
    * (band, day+lag) over span×3 rows, the moment aggregate is
    * map-side combinable, and the answer is 3 bands × 7 lags. The
    * corpus is touched once, by the first aggregate.
    */
  def acfDaily(e: DataFrame): DataFrame = {
    val daily = e.filter(col("event_type") === "purchase")
      .groupBy((col("user_id") % 3).as("band"),
        to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("cents"))
    val span = e.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
    // the band domain is closed by construction (x % 3 ∈ {0,1,2}),
    // so the grid's band axis is a 3-row literal, not a second pass
    val bands = e.sparkSession.range(3).select(col("id").as("band"))
    val grid = span
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
        .as("day"))
      .crossJoin(bands)
    val series = grid.join(daily, Seq("band", "day"), "left")
      .select(col("band"), col("day"),
        coalesce(col("cents"), lit(0L)).as("x"))
    val lagged = series
      .select(col("band"), explode(sequence(lit(1), lit(7))).as("lag"),
        col("day"), col("x"))
      .withColumn("day", expr("date_add(day, lag)"))
      .withColumnRenamed("x", "xl")
    val pairs = lagged.join(series, Seq("band", "day"))
    pairs.groupBy(col("band"), col("lag").cast("bigint").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(xl AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(xl AS DECIMAL(38,0)) * x")).as("sxy"),
        sum(expr("CAST(xl AS DECIMAL(38,0)) * xl")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("syy"))
      .select(col("band"), col("lag"), col("n_pairs"),
        round(expr(
          """CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
            |sqrt(CAST(nullif((n_pairs * sxx - sx * sx) *
            |  (n_pairs * syy - sy * sy), 0) AS DOUBLE))""".stripMargin), 6)
          .as("acf"))
  }

  val acfDailySql: String =
    """WITH daily AS (
      |  SELECT user_id % 3 AS band, CAST(ts AS DATE) AS day,
      |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |span AS (
      |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
      |  FROM events),
      |grid AS (
      |  SELECT d.day, b.band FROM
      |    (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
      |       AS DATE) AS day FROM span) d
      |    CROSS JOIN (SELECT unnest([0, 1, 2]) AS band) b),
      |series AS (
      |  SELECT g.band, g.day, coalesce(d.cents, 0) AS x
      |  FROM grid g LEFT JOIN daily d ON g.day = d.day AND g.band = d.band),
      |pairs AS (
      |  SELECT a.band, l.lag, a.x AS xl, b.x AS x
      |  FROM series a
      |  CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag) l
      |  JOIN series b
      |    ON b.band = a.band AND b.day = a.day + l.lag)
      |SELECT CAST(band AS BIGINT) AS band, CAST(lag AS BIGINT) AS lag,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  round(CAST(count(*) * sum(CAST(xl AS HUGEINT) * x)
      |      - sum(CAST(xl AS HUGEINT)) * sum(x) AS DOUBLE) /
      |    sqrt(CAST(nullif(
      |      (count(*) * sum(CAST(xl AS HUGEINT) * xl)
      |        - sum(CAST(xl AS HUGEINT)) * sum(xl)) *
      |      (count(*) * sum(CAST(x AS HUGEINT) * x)
      |        - sum(CAST(x AS HUGEINT)) * sum(x)), 0) AS DOUBLE)), 6)
      |    AS acf
      |FROM pairs GROUP BY 1, 2""".stripMargin

  /** Delete-one-block jackknife standard error for the per-variant
    * mean purchase cents — the A/B family's UNCERTAINTY row (the
    * means panel says "B is higher"; this says "by more than the
    * noise floor or not"): users hash into 32 fixed blocks
    * (h60-keyed, an oracle can replay), θ_b = the leave-block-out
    * mean (micros, integer DIV on non-negative sums), and
    *   se² = (B−1)·(B·Σθ_b² − (Σθ_b)²) / B³
    * — the grouped-jackknife variance with the Σ(θ−θ̄)² expanded so
    * every term before the final sqrt is an exact DECIMAL(38,0)
    * integer (HUGEINT oracle-side; θ² sums reach ~1e29 at corpus
    * scale, far past int64). Only the final sqrt rounds (3 dp).
    *
    * Scale: one per-user aggregate (map-side combinable), then a
    * ≤64-row (variant × block) table; everything after is
    * answer-sized. The block count is FIXED at 32, so the jackknife
    * costs one extra tiny aggregate regardless of corpus size —
    * the reason block (not leave-one-user-out) jackknife is the
    * distributed estimator of choice.
    */
  def jackknifeSe(e: DataFrame): DataFrame = {
    val perUser = e
      .withColumn("variant",
        when(pmod(graft.ops.Hll.h60(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2)) === 0,
          lit("A")).otherwise(lit("B")))
      .withColumn("block", pmod(graft.ops.Hll.h60(
        concat(lit("jk:"), col("user_id").cast("string"))), lit(32)))
      .groupBy("variant", "block", "user_id")
      .agg(sum(when(col("event_type") === "purchase",
        expr("CAST(round(value * 100, 0) AS BIGINT)")).otherwise(lit(0L)))
        .as("cents"))
    val blocks = perUser.groupBy("variant", "block")
      .agg(count(lit(1)).as("nb"), sum("cents").as("sb"))
    val tot = blocks.groupBy("variant")
      .agg(sum("nb").as("n"), sum("sb").as("s"))
    val theta = blocks.join(tot, "variant")
      .select(col("variant"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * (s - sb)) DIV (n - nb)")
          .as("theta"))
    theta.groupBy("variant")
      .agg(count(lit(1)).as("n_blocks"),
        sum(expr("CAST(theta AS DECIMAL(38,0))")).as("st"),
        sum(expr("CAST(theta AS DECIMAL(38,0)) * theta")).as("st2"))
      .join(tot, "variant")
      .select(col("variant"), col("n").as("n_users"), col("n_blocks"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * s) DIV n").cast("bigint")
          .as("mean_micros"),
        round(
          sqrt(expr(
            "CAST((n_blocks - 1) * (n_blocks * st2 - st * st) AS DOUBLE)"))
            / pow(col("n_blocks").cast("double"), 1.5), 3)
          .as("jk_se_micros"))
      .orderBy("variant")
  }

  val jackknifeSeSql: String = {
    val hv = graft.ops.Hll.h60Sql("'ab:' || CAST(user_id AS VARCHAR)")
    val hb = graft.ops.Hll.h60Sql("'jk:' || CAST(user_id AS VARCHAR)")
    s"""WITH pu AS (
       |  SELECT CASE WHEN ($hv) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
       |    ($hb) % 32 AS block, user_id,
       |    sum(CASE WHEN event_type = 'purchase'
       |        THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
       |      AS cents
       |  FROM events GROUP BY 1, 2, 3),
       |blocks AS (
       |  SELECT variant, block, count(*) AS nb, sum(cents) AS sb
       |  FROM pu GROUP BY 1, 2),
       |tot AS (
       |  SELECT variant, sum(nb) AS n, sum(sb) AS s FROM blocks GROUP BY 1),
       |theta AS (
       |  SELECT b.variant,
       |    (CAST(1000000 AS HUGEINT) * (t.s - b.sb)) // (t.n - b.nb)
       |      AS theta
       |  FROM blocks b JOIN tot t ON b.variant = t.variant),
       |agg AS (
       |  SELECT variant, count(*) AS n_blocks,
       |    sum(CAST(theta AS HUGEINT)) AS st,
       |    sum(CAST(theta AS HUGEINT) * theta) AS st2
       |  FROM theta GROUP BY 1)
       |SELECT a.variant, CAST(t.n AS BIGINT) AS n_users,
       |  CAST(a.n_blocks AS BIGINT) AS n_blocks,
       |  CAST((CAST(1000000 AS HUGEINT) * t.s) // t.n AS BIGINT)
       |    AS mean_micros,
       |  round(sqrt(CAST((a.n_blocks - 1)
       |      * (a.n_blocks * a.st2 - a.st * a.st) AS DOUBLE))
       |    / (CAST(a.n_blocks AS DOUBLE) ^ 1.5), 3) AS jk_se_micros
       |FROM agg a JOIN tot t ON a.variant = t.variant
       |ORDER BY a.variant""".stripMargin
  }

  /** 32-bit Morton (Z-ORDER) key over two min-max-normalized 16-bit
    * dimensions — returns (un, hn, z) per event. Shared by the panel
    * query and the layout spec so both speak about the same key.
    * Normalization is integer min-max to the full 16-bit domain (the
    * production shape bins by range quantiles; min-max keeps the
    * oracle exact) off a 1-row broadcast stats row; the interleave is
    * one codegen'd HOF per row — no join, no shuffle to compute it.
    */
  private[graft] def zorderKeyed(e: DataFrame): DataFrame = {
    val dims = e.select(
      col("user_id").as("u"),
      expr("unix_micros(ts) DIV 3600000000").as("h"))
    val stats = dims.agg(
      min("u").as("umin"), max("u").as("umax"),
      min("h").as("hmin"), max("h").as("hmax"))
    dims.crossJoin(broadcast(stats)) // 1-row stats — audited idiom
      .select(
        expr("((u - umin) * 65535) DIV greatest(1, umax - umin)").as("un"),
        expr("((h - hmin) * 65535) DIV greatest(1, hmax - hmin)").as("hn"))
      .withColumn("z", expr(
        "aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, i) -> " +
          "acc + shiftleft(shiftright(un, i) & 1, 2*i) + " +
          "shiftleft(shiftright(hn, i) & 1, 2*i + 1))"))
  }

  /** Z-ORDER locality panel — the layout primitive behind
    * Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the bits of two
    * query dimensions (user_id, hour-of-epoch; each min-max-normalized
    * to 16 bits) into one 32-bit Morton key, so ONE range-partitioned
    * sort leaves files tight in BOTH dimensions at once — min/max file
    * skipping then serves range predicates on either dimension, where
    * a single-column sort serves only its own. The panel reports, per
    * top-6-bit z octant (64 buckets = the top 3 bits of EACH dim), the
    * bucket's event count and its span in each normalized dimension —
    * exactly the numbers file skipping reads from footer stats.
    * Locality is exact by construction: a 6-bit z prefix pins 3 high
    * bits of each dim, so every bucket's u_span and h_span are
    * < 2^13 = 8192 (1/8 of the domain) — StorageSpec asserts it, and
    * demonstrates the layout effect (repartitionByRange(z): BOTH
    * per-partition spans bounded; a time-only sort leaves the user
    * span at full domain).
    *
    * Scale: the key is map-side codegen; the panel is one 64-key
    * partial aggregation. At 100 TB the sort this key feeds is the
    * standard write-amplification trade every OPTIMIZE job makes —
    * the panel itself never moves more than 64 rows past the scan.
    */
  def zorderPanel(e: DataFrame): DataFrame =
    zorderKeyed(e)
      .select(expr("shiftright(z, 26)").as("octant"), col("un"), col("hn"))
      .groupBy("octant")
      .agg(count(lit(1)).as("n_events"),
        min("un").as("u_min"), max("un").as("u_max"),
        (max("un") - min("un")).as("u_span"),
        min("hn").as("h_min"), max("hn").as("h_max"),
        (max("hn") - min("hn")).as("h_span"))

  val zorderPanelSql: String =
    """WITH d AS (
      |  SELECT event_id, user_id AS u,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
      |  FROM events),
      |st AS (
      |  SELECT min(u) AS umin, max(u) AS umax,
      |    min(h) AS hmin, max(h) AS hmax FROM d),
      |norm AS (
      |  SELECT event_id,
      |    ((u - umin) * 65535) // greatest(1, umax - umin) AS un,
      |    ((h - hmin) * 65535) // greatest(1, hmax - hmin) AS hn
      |  FROM d CROSS JOIN st),
      |zt AS (
      |  SELECT event_id, un, hn,
      |    CAST(sum((((un >> r.i) & 1) << (2 * r.i))
      |      + (((hn >> r.i) & 1) << (2 * r.i + 1))) AS BIGINT) AS z
      |  FROM norm CROSS JOIN
      |    (SELECT CAST(range AS INTEGER) AS i FROM range(16)) r
      |  GROUP BY 1, 2, 3)
      |SELECT z >> 26 AS octant, count(*) AS n_events,
      |  min(un) AS u_min, max(un) AS u_max, max(un) - min(un) AS u_span,
      |  min(hn) AS h_min, max(hn) AS h_max, max(hn) - min(hn) AS h_span
      |FROM zt GROUP BY 1""".stripMargin

  /** Poisson-bootstrap CI for revenue-per-user — the hash-resample
    * bootstrap production experiment platforms run at scale (Chamandy
    * et al. 2012, "Estimating uncertainty for massive data streams"):
    * resample weights come from a hash of (resample index, user), so
    * there is NO resample table to join and no RNG state to
    * coordinate — every engine recomputes the same weights from the
    * row itself. Weights are Binomial(4, 1/4) (mean 1, the bounded
    * integer stand-in for Poisson(1): four 2-bit hash chunks tested
    * against zero — exactly replicable in any engine with shifts).
    * Per variant AND per the B-A difference (resamples coupled by
    * index r — common random numbers, variance-reduced), the panel
    * carries the point estimate and a rank-based percentile CI (order
    * statistics 2 and B-1 of the B=32 resample means, ~94% nominal).
    *
    * All integer (cents, truncating DIV), so the oracle is bit-exact.
    * Scale: the per-user rollup is the ONE user-keyed shuffle
    * (identical to [[abExperiment]]); the x32 explode happens AFTER
    * it, on users not events; per-(variant, r) means are 96 rows and
    * the CI window orders 32 rows per variant — answer-sized.
    */
  def abBootstrap(e: DataFrame, b: Int = 32): DataFrame = {
    require(b >= 4, "need enough resamples for order-stat CI")
    val cents = expr("CAST(round(value * 100, 0) AS BIGINT)")
    val perUser = e
      .withColumn("variant",
        when(pmod(graft.ops.Hll.h60(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2)) === 0,
          lit("A")).otherwise(lit("B")))
      .groupBy("variant", "user_id")
      .agg(sum(when(col("event_type") === "purchase", cents)
        .otherwise(lit(0L))).as("cents"))
    val rs = perUser
      .select(col("variant"), col("user_id"), col("cents"),
        explode(sequence(lit(0), lit(b - 1))).as("r"))
      .withColumn("hh", graft.ops.Hll.h60(concat_ws(":",
        lit("bs"), col("r").cast("string"), col("user_id").cast("string"))))
      .withColumn("w", expr(
        "CAST(hh & 3 = 0 AS BIGINT) + CAST(shiftright(hh, 2) & 3 = 0 AS BIGINT)" +
          " + CAST(shiftright(hh, 4) & 3 = 0 AS BIGINT)" +
          " + CAST(shiftright(hh, 6) & 3 = 0 AS BIGINT)"))
    // nullif guards the (vanishing, but possible on a tiny cohort)
    // all-weights-zero resample; a null mean drops out of the order
    // statistics rather than fabricating a 0
    val means = rs.groupBy("variant", "r")
      .agg(expr("sum(w * cents) DIV nullif(sum(w), 0)").as("rpu"))
    val dmeans = means.groupBy("r")
      .agg(sum(when(col("variant") === "B", col("rpu"))
        .otherwise(-col("rpu"))).as("rpu"))
      .select(lit("B-A").as("variant"), col("r"), col("rpu"))
    val wv = Window.partitionBy("variant").orderBy(col("rpu"), col("r"))
    // nulls are FILTERED before ranking, not left to the engine's
    // default placement — Spark ranks NULLS FIRST, DuckDB NULLS LAST,
    // so an unfiltered null would shift the order statistics
    // differently in each engine
    val ci = means.unionByName(dmeans)
      .filter(col("rpu").isNotNull)
      .withColumn("rn", row_number().over(wv))
      .groupBy("variant")
      .agg(count(lit(1)).as("n_resamples"),
        max(when(col("rn") === 2, col("rpu"))).as("ci_lo_cents"),
        max(when(col("rn") === lit(b - 1), col("rpu"))).as("ci_hi_cents"))
    val point = perUser.groupBy("variant")
      .agg(expr("sum(cents) DIV count(1)").as("rpu_cents"))
    val pointD = point
      .agg(sum(when(col("variant") === "B", col("rpu_cents"))
        .otherwise(-col("rpu_cents"))).as("rpu_cents"))
      .select(lit("B-A").as("variant"), col("rpu_cents"))
    point.unionByName(pointD).join(ci, "variant")
      .select(col("variant"), col("rpu_cents"), col("ci_lo_cents"),
        col("ci_hi_cents"), col("n_resamples"))
  }

  def abBootstrapSql(b: Int = 32): String = {
    val hAb = graft.ops.Hll.h60Sql("'ab:' || CAST(user_id AS VARCHAR)")
    val hBs = graft.ops.Hll.h60Sql(
      "'bs:' || CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")
    s"""WITH pu AS (
       |  SELECT CASE WHEN ($hAb) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
       |    user_id,
       |    sum(CASE WHEN event_type = 'purchase'
       |        THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS cents
       |  FROM events GROUP BY 1, 2),
       |rs AS (
       |  SELECT variant, user_id, cents, CAST(rr.range AS BIGINT) AS r
       |  FROM pu CROSS JOIN range($b) rr),
       |wt AS (
       |  SELECT variant, r, cents,
       |    CAST(hh & 3 = 0 AS BIGINT) + CAST((hh >> 2) & 3 = 0 AS BIGINT)
       |      + CAST((hh >> 4) & 3 = 0 AS BIGINT)
       |      + CAST((hh >> 6) & 3 = 0 AS BIGINT) AS w
       |  FROM (SELECT variant, user_id, cents, r, ($hBs) AS hh FROM rs)),
       |means AS (
       |  SELECT variant, r,
       |    CAST(sum(w * cents) // nullif(sum(w), 0) AS BIGINT) AS rpu
       |  FROM wt GROUP BY 1, 2),
       |dmeans AS (
       |  SELECT 'B-A' AS variant, r,
       |    sum(CASE WHEN variant = 'B' THEN rpu ELSE -rpu END) AS rpu
       |  FROM means GROUP BY 2),
       |allm AS (
       |  SELECT * FROM means UNION ALL SELECT * FROM dmeans),
       |ranked AS (
       |  SELECT variant, rpu,
       |    row_number() OVER (PARTITION BY variant ORDER BY rpu, r) AS rn
       |  FROM allm WHERE rpu IS NOT NULL),
       |ci AS (
       |  SELECT variant, CAST(count(*) AS BIGINT) AS n_resamples,
       |    CAST(max(CASE WHEN rn = 2 THEN rpu END) AS BIGINT) AS ci_lo_cents,
       |    CAST(max(CASE WHEN rn = ${b - 1} THEN rpu END) AS BIGINT)
       |      AS ci_hi_cents
       |  FROM ranked GROUP BY 1),
       |point AS (
       |  SELECT variant, CAST(sum(cents) // count(*) AS BIGINT) AS rpu_cents
       |  FROM pu GROUP BY 1),
       |pall AS (
       |  SELECT * FROM point
       |  UNION ALL
       |  SELECT 'B-A',
       |    CAST(sum(CASE WHEN variant = 'B' THEN rpu_cents
       |      ELSE -rpu_cents END) AS BIGINT)
       |  FROM point)
       |SELECT p.variant, p.rpu_cents, c.ci_lo_cents, c.ci_hi_cents,
       |  c.n_resamples
       |FROM pall p JOIN ci c USING (variant)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_storage_zorder" -> ((s, d) => zorderPanel(events(s, d))),
    "q_events_ab_bootstrap" -> ((s, d) => abBootstrap(events(s, d))),
    "q_events_acf" -> ((s, d) => acfDaily(events(s, d))),
    "q_events_jackknife" -> ((s, d) => jackknifeSe(events(s, d))),
    "q_events_holt" -> ((s, d) => holtForecast(events(s, d))),
    "q_events_holt_daily" -> ((s, d) => holtDaily(events(s, d))),
    "q_events_cusum" -> ((s, d) => cusumDaily(events(s, d))),
    "q_events_cuped" -> ((s, d) => abCuped(events(s, d))),
    "q_events_ab_mwu" -> ((s, d) => abMannWhitney(events(s, d))),
    "q_events_ab_srm" -> ((s, d) => abSrmCheck(events(s, d))),
    "q_events_drift" -> ((s, d) => valueDrift(events(s, d))),
    "q_events_churn" -> ((s, d) => churnFeatures(events(s, d))),
    "q_events_forecast" -> ((s, d) => forecastBacktest(events(s, d))),
    "q_events_paths" -> ((s, d) => sessionPaths(events(s, d))),
    "q_events_conversion_lag" -> ((s, d) => conversionLag(events(s, d))),
    "q_events_seasonality" -> ((s, d) => seasonality(events(s, d))),
    "q_events_rfm" -> ((s, d) => rfmSegments(events(s, d))),
    "q_events_active_rolling" -> ((s, d) => rollingActives(events(s, d))),
    "q_events_ab" -> ((s, d) => abExperiment(events(s, d))),
    "q_events_funnel_steps" -> ((s, d) => funnelSteps(events(s, d))),
    "q_events_ewma" -> ((s, d) => ewmaDaily(events(s, d))),
    "q_events_ltv" -> ((s, d) => cohortLtv(events(s, d))),
    "q_events_attribution" -> ((s, d) => attribution(events(s, d))),
    "q_events_feature_at" -> ((s, d) => featuresAtPurchase(events(s, d))),
    "q_events_scd2" -> ((s, d) => scd2States(events(s, d))),
    "q_events_gapfill" -> ((s, d) => gapFill(events(s, d))),
    "q_events_markov" -> ((s, d) => markovTransitions(events(s, d))),
    "q_events_anomaly" -> ((s, d) => anomalyWindows(events(s, d))),
    "q_events_retention" -> ((s, d) => retention(events(s, d))),
    "q_events_window_topk" -> ((s, d) => topKPerWindow(events(s, d))),
    "q_asof_forward" -> ((s, d) => forwardClickPurchase(events(s, d))),
    "q_events_funnel" -> ((s, d) => funnel(events(s, d))),
    "q_interval_join" -> ((s, d) => intervalPurchaseClick(events(s, d))),
    "q_interval_join_left" -> ((s, d) => intervalPurchaseClickLeft(events(s, d))),
    "q_asof_join" -> ((s, d) => asOfPurchaseClick(events(s, d))),
    "q_asof_join_native" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s) // planner strategy
      asOfPurchaseClick(events(s, d), native = true)
    }),
    "q_events_tumbling" -> ((s, d) => tumbling(events(s, d))),
    "q_events_sliding" -> ((s, d) => sliding(events(s, d))),
    "q_events_session" -> ((s, d) => sessions(events(s, d))),
    "q_events_pivot" -> ((s, d) => pivotDaily(events(s, d))),
    "q_events_json" -> ((s, d) => jsonExtract(events(s, d))),
    "q_events_variant" -> ((s, d) => variantExtract(events(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_storage_zorder" -> zorderPanelSql,
    "q_events_ab_bootstrap" -> abBootstrapSql(),
    "q_events_acf" -> acfDailySql,
    "q_events_jackknife" -> jackknifeSeSql,
    "q_events_ab_srm" -> abSrmCheckSql,
    "q_events_drift" -> valueDriftSql,
    "q_events_churn" -> churnFeaturesSql,
    "q_events_forecast" -> forecastBacktestSql,
    "q_events_paths" -> sessionPathsSql,
    "q_events_conversion_lag" -> conversionLagSql,
    "q_events_seasonality" -> seasonalitySql,
    "q_events_rfm" -> rfmSegmentsSql,
    "q_events_active_rolling" -> rollingActivesSql,
    "q_events_ab" -> abExperimentSql,
    "q_events_holt" -> holtForecastSql,
    "q_events_holt_daily" -> holtDailySql,
    "q_events_cusum" -> cusumDailySql,
    "q_events_cuped" -> abCupedSql,
    "q_events_ab_mwu" -> abMannWhitneySql,
    "q_events_funnel_steps" -> funnelStepsSql,
    "q_events_ewma" -> ewmaDailySql,
    "q_events_ltv" -> cohortLtvSql,
    "q_events_attribution" -> attributionSql,
    "q_events_feature_at" -> featuresAtPurchaseSql,
    "q_events_scd2" -> scd2StatesSql,
    "q_events_gapfill" -> gapFillSql,
    "q_events_markov" -> markovTransitionsSql,
    "q_events_anomaly" -> anomalyWindowsSql,
    "q_events_retention" -> retentionSql,
    "q_events_window_topk" -> topKPerWindowSql,
    "q_asof_forward" -> forwardClickPurchaseSql,
    "q_events_funnel" -> funnelSql,
    "q_interval_join" -> intervalPurchaseClickSql,
    "q_interval_join_left" -> intervalPurchaseClickLeftSql,
    "q_asof_join" -> asOfPurchaseClickSql,
    "q_asof_join_native" -> asOfPurchaseClickSql,
    "q_events_tumbling" -> tumblingSql,
    "q_events_sliding" -> slidingSql,
    "q_events_session" -> sessionsSql,
    "q_events_pivot" -> pivotDailySql,
    "q_events_json" -> jsonExtractSql,
    "q_events_variant" -> variantExtractSql)
}
