package graft.ops

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface over the testdata star schema: scans,
  * projection, filter, the full join family, aggregation (incl.
  * distinct, rollup/cube, having, conditional), window functions,
  * sort/limit/top-k, set operations, scalar function coverage.
  *
  * Every query here is pure DataFrame API — Catalyst sees the whole
  * plan, so predicate pushdown / column pruning / join selection /
  * partial aggregation come free, and AQE re-plans at runtime
  * (coalesce, skew-split, broadcast demotion) when real data sizes
  * diverge from estimates — the property that matters at 100 TB.
  *
  * Scale conventions applied throughout:
  *   - dimension tables (region, nation, supplier, part, customer) are
  *     explicitly `broadcast()` — replicated hash joins, no shuffle of
  *     the fact side;
  *   - fact-fact joins (orders x lineitem) shuffle on the join key
  *     once, and grouping afterwards reuses that partitioning;
  *   - aggregates are all algebraic (sum/count/avg/min/max) -> map-side
  *     partial aggregation; no collect_list on unbounded groups.
  *
  * Determinism conventions (the DuckDB-oracle hash compare):
  *   - money arithmetic is exact scaled-integer end-to-end (cents /
  *     basis points, integer DIV for averages) — see q1Pricing's doc;
  *     round() only on genuinely irrational outputs (sqrt, stddev);
  *   - computed integers are cast to bigint (DuckDB length() etc.
  *     return BIGINT, Spark returns int);
  *   - timestamps/dates leave the plan as formatted strings;
  *   - every top-k has a total-order tie-break.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def fmtD(c: Column): Column = date_format(c, "yyyy-MM-dd")

  // ---------------------------------------------------------------- //

  /** TPC-H Q1-style pricing summary: filter + group + algebraic aggs.
    *
    * Money math convention (all pricing queries): prices/discounts are
    * exact 2-decimal rationals, so every money output is computed in
    * scaled integers (cents / basis points / "micros" = cents x 1e4)
    * and integer division — `round()` of a float sum lands on exact
    * `.xx5` midpoints in this data, where Spark's and DuckDB's rounding
    * implementations disagree (observed at sf0.1). Integer arithmetic
    * is bit-stable across engines, aggregation orders, and scale.
    */
  def q1Pricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        round(col("l_extendedprice") * 100, 0).cast("bigint").as("cents"),
        round(col("l_discount") * 100, 0).cast("bigint").as("disc_bp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("cents").as("sum_base_cents"),
        sum(col("cents") * (lit(100) - col("disc_bp"))).as("sum_disc_micros"),
        expr("CAST(CAST(sum(l_quantity) AS BIGINT) * 10000 DIV count(*) AS BIGINT)")
          .as("avg_qty_x10000"),
        expr("CAST(sum(disc_bp) * 100 DIV count(*) AS BIGINT)")
          .as("avg_disc_x10000"),
        count(lit(1)).as("count_order"))

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(cents) AS BIGINT) AS sum_base_cents,
      |  CAST(sum(cents * (100 - disc_bp)) AS BIGINT) AS sum_disc_micros,
      |  CAST(CAST(sum(l_quantity) AS BIGINT) * 10000 // count(*) AS BIGINT)
      |    AS avg_qty_x10000,
      |  CAST(sum(disc_bp) * 100 // count(*) AS BIGINT) AS avg_disc_x10000,
      |  count(*) AS count_order
      |FROM (SELECT l_returnflag, l_linestatus, l_quantity,
      |        CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
      |        CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_bp
      |      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01')
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue-concentration panel: what share of total order revenue
    * the top 1% / 5% / 10% of customers hold — the whale-risk /
    * Pareto diagnostic. The top-p% cut is VALUE-based via a revenue
    * HISTOGRAM (dollar-quantized, cumulative from the richest): the
    * boundary is the highest dollar value where the cumulative user
    * count reaches ceil(p·n/100), and every customer tied at the
    * boundary is included ("at least k users" semantics — tie
    * membership by row identity would be partition-dependent).
    * Reported revenue stays exact cents.
    *
    * Scale: the RFM-histogram discipline — one customer-level
    * aggregate, then cumulation over DISTINCT dollar values, never
    * over customers (a global rank over customers single-reduces the
    * table at 100 TB); and the dollar-value cumsum itself is
    * two-level (octave-partitioned windows + a triangular join over
    * <= 40 octave totals) so not even the histogram pays a global
    * window; totals ride a 1-row broadcast; output is 3 rows.
    */
  def qRevenueConcentration(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("bigint"))
        .as("cents"))
      .select(col("o_custkey"), col("cents"),
        expr("cents DIV 100").as("dollars"))
    // two-level cumulative: a single Window.orderBy(desc) over the
    // histogram would be a GLOBAL window (the banned single-reducer
    // shape) — instead cum = suffix-sum over HIGHER log2-octaves
    // (triangular join over <= 40 octave totals, the skew_diag
    // device) + an octave-PARTITIONED intra window
    val hist = perCust.groupBy("dollars")
      .agg(count(lit(1)).as("n_users"), sum("cents").as("sum_cents"))
      .withColumn("bkt", expr("length(bin(greatest(dollars, 1)))"))
    val wIn = Window.partitionBy("bkt").orderBy(col("dollars").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = hist
      .withColumn("cu_in", sum("n_users").over(wIn))
      .withColumn("cc_in", sum("sum_cents").over(wIn))
    // bkt = length(bin(dollars)) has ≤ 64 values for an int64 by
    // construction; the limit never binds but makes the bound
    // STRUCTURAL so the plan audit can prove the triangular
    // non-equi self-join's broadcast side tiny
    val bktTot = hist.groupBy("bkt")
      .agg(sum("n_users").as("bu"), sum("sum_cents").as("bc"))
      .orderBy("bkt").limit(64)
    val above = bktTot.as("a")
      .join(bktTot.as("b"), col("b.bkt") > col("a.bkt"))
      .groupBy(col("a.bkt").as("bkt"))
      .agg(sum(col("b.bu")).as("au"), sum(col("b.bc")).as("ac"))
    val cum = intra.join(above, Seq("bkt"), "left")
      .select(col("dollars"),
        (coalesce(col("au"), lit(0L)) + col("cu_in")).as("cum_users"),
        (coalesce(col("ac"), lit(0L)) + col("cc_in")).as("cum_cents"))
    val totals = perCust.agg(count(lit(1)).as("n"),
      sum("cents").as("total_cents"))
    cum.crossJoin(broadcast(totals))
      .select(col("dollars"), col("cum_users"), col("cum_cents"),
        col("n"), col("total_cents"),
        explode(array(lit(1L), lit(5L), lit(10L))).as("p_pct"))
      .filter(col("cum_users") >= expr("(p_pct * n + 99) DIV 100"))
      .groupBy("p_pct")
      .agg(max(struct(col("dollars"), col("cum_users"), col("cum_cents"),
        col("total_cents"))).as("top"))
      .select(col("p_pct"),
        col("top.dollars").as("boundary_dollars"),
        col("top.cum_users").as("n_top"),
        col("top.cum_cents").as("top_cents"),
        expr("1000 * top.cum_cents DIV top.total_cents")
          .as("share_permille"))
  }

  val qRevenueConcentrationSql: String =
    """WITH pc AS (
      |  SELECT o_custkey,
      |    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1),
      |hist AS (
      |  SELECT cents // 100 AS dollars, count(*) AS n_users,
      |    sum(cents) AS sum_cents,
      |    length(bin(greatest(cents // 100, 1))) AS bkt
      |  FROM pc GROUP BY 1),
      |intra AS (
      |  SELECT dollars, bkt,
      |    sum(n_users) OVER (PARTITION BY bkt ORDER BY dollars DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu_in,
      |    sum(sum_cents) OVER (PARTITION BY bkt ORDER BY dollars DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc_in
      |  FROM hist),
      |bt AS (
      |  SELECT bkt, sum(n_users) AS bu, sum(sum_cents) AS bc
      |  FROM hist GROUP BY 1),
      |abv AS (
      |  SELECT a.bkt, sum(b.bu) AS au, sum(b.bc) AS ac
      |  FROM bt a JOIN bt b ON b.bkt > a.bkt GROUP BY 1),
      |cum AS (
      |  SELECT i.dollars,
      |    coalesce(v.au, 0) + i.cu_in AS cum_users,
      |    coalesce(v.ac, 0) + i.cc_in AS cum_cents
      |  FROM intra i LEFT JOIN abv v ON i.bkt = v.bkt),
      |tot AS (SELECT count(*) AS n, sum(cents) AS total_cents FROM pc),
      |hit AS (
      |  SELECT p.p_pct, c.dollars, c.cum_users, c.cum_cents, t.total_cents
      |  FROM cum c CROSS JOIN tot t,
      |    (SELECT unnest([1, 5, 10]) AS p_pct) p
      |  WHERE c.cum_users >= (p.p_pct * t.n + 99) // 100)
      |SELECT CAST(p_pct AS BIGINT) AS p_pct,
      |  CAST(max(dollars) AS BIGINT) AS boundary_dollars,
      |  CAST(max_by(cum_users, dollars) AS BIGINT) AS n_top,
      |  CAST(max_by(cum_cents, dollars) AS BIGINT) AS top_cents,
      |  CAST(1000 * max_by(cum_cents, dollars) // max(total_cents)
      |    AS BIGINT) AS share_permille
      |FROM hit GROUP BY 1""".stripMargin

  /** TPC-H Q4-style order-priority check through the correlated-EXISTS
    * SQL surface: orders counted per priority when at least one of
    * their lines shipped more than 100 days after the order date.
    * Catalyst rewrites the EXISTS into a left-semi join on the order
    * key (RewritePredicateSubquery) — the convenience spelling
    * compiles to the one-shuffle semi-join plan, never a per-row
    * subquery execution.
    */
  def q4Priority(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_q4")
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q4")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders_q4 o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem_q4 l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAYS)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q8-style market share: revenue of STANDARD-type parts per
    * (order year, supplier nation) with each nation's permille share
    * within its year — the deep multi-join shape (fact-fact on the
    * order key, three dimension joins) that exercises Catalyst's join
    * reorder + broadcast election across 5 tables. Dimension filters
    * (p_type prefix) land BEFORE the fact join via pushdown; revenue
    * in exact cents-x-basis-points micros; the share window runs over
    * the answer-sized (year, nation) aggregate only.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      (round(col("l_extendedprice") * 100, 0).cast("bigint") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("bigint")))
        .as("rev"))
    val p = t(s, dir, "part").filter(col("p_type").startsWith("STANDARD"))
      .select("p_partkey")
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("bigint")
        .as("o_year"))
    val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n = t(s, dir, "nation").select("n_nationkey", "n_name")
    val agg = li
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy("o_year", "n_name")
      .agg(sum("rev").as("revenue_micros"), count(lit(1)).as("n_items"))
    val w = Window.partitionBy("o_year")
    agg.withColumn("year_total", sum("revenue_micros").over(w))
      .select(col("o_year"), col("n_name"), col("revenue_micros"),
        col("n_items"),
        expr("1000 * revenue_micros DIV year_total").as("share_permille"))
  }

  val q8MarketShareSql: String =
    """WITH agg AS (
      |  SELECT year(o.o_orderdate) AS o_year, n.n_name,
      |    sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |      * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
      |      AS revenue_micros,
      |    count(*) AS n_items
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  WHERE p.p_type LIKE 'STANDARD%'
      |  GROUP BY 1, 2)
      |SELECT CAST(o_year AS BIGINT) AS o_year, n_name,
      |  CAST(revenue_micros AS BIGINT) AS revenue_micros,
      |  CAST(n_items AS BIGINT) AS n_items,
      |  CAST(1000 * revenue_micros //
      |    sum(revenue_micros) OVER (PARTITION BY o_year) AS BIGINT)
      |    AS share_permille
      |FROM agg""".stripMargin

  /** Incremental aggregate maintenance — the materialized-rollup
    * refresh shape: yesterday's partition pre-aggregates once, today's
    * delta aggregates alone, and the published rollup is the MERGE of
    * the two partial-state tables (sums add, counts add, mins/maxes
    * combine) — never a re-scan of the base. This is the relational
    * face of what [[graft.ops.Hll]] register-max gives sketches: at
    * 100 TB the daily refresh touches |delta| + |groups| rows, not the
    * table. The driver oracle is the FULL single-pass aggregate, so
    * the hash compare IS the proof that merged partial states equal a
    * from-scratch computation.
    */
  def qIncrementalRollup(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100, 0).cast("bigint").as("cents"),
        pmod(col("o_orderkey"), lit(10)).as("slice"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("status").agg(
        count(lit(1)).as("n_orders"), sum("cents").as("sum_cents"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
    val base = partial(o.filter(col("slice") =!= 0))
    val delta = partial(o.filter(col("slice") === 0))
    base.unionByName(delta)
      .groupBy("status")
      .agg(sum("n_orders").as("n_orders"), sum("sum_cents").as("sum_cents"),
        min("min_cents").as("min_cents"), max("max_cents").as("max_cents"))
  }

  /** Oracle: the from-scratch aggregate the merge must equal. */
  val qIncrementalRollupSql: String =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  CAST(min(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS min_cents,
      |  CAST(max(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS max_cents
      |FROM orders GROUP BY 1""".stripMargin

  /** Data-quality audit — the contract-check pass (dbt-test shape) a
    * pipeline runs before promoting a snapshot: referential integrity
    * per foreign key (orphan counts via anti-joins), primary-key
    * uniqueness (dup-key counts), null-key counts, and domain checks,
    * one row per named check with its violation count and pass flag.
    * The synthetic tables are CLEAN, so every row reads 0/pass — the
    * operator's value is that it turns "we assume the keys are fine"
    * into a continuously evaluated table, and a real deployment points
    * it at data that isn't.
    *
    * Scale: each FK check is one co-partitioned left_anti join (never
    * a broadcast of the parent when the parent is fact-sized); PK and
    * domain checks are single-pass aggregates; the union is
    * answer-sized (one row per check).
    */
  /** Benford first-digit audit over order totals — the classic
    * financial-forensics panel: the observed first-significant-digit
    * distribution vs Benford's law (expected permille =
    * round(log₁₀(1+1/d)·1000), a 9-row literal — no runtime floats),
    * with the absolute deviation per digit. Fabricated or
    * threshold-gamed amounts bend this curve long before totals look
    * wrong. Exact integers end to end.
    *
    * Scale: map-side digit extraction into a 9-row aggregate + a
    * 1-row total broadcast + a 9-row literal join. Nothing global.
    */
  def qBenfordAudit(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val expected = Seq(1L -> 301L, 2L -> 176L, 3L -> 125L, 4L -> 97L,
      5L -> 79L, 6L -> 67L, 7L -> 58L, 8L -> 51L, 9L -> 46L)
      .toDF("digit", "expected_permille")
    val digits = t(s, dir, "orders")
      .select(expr(
        "CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)" +
          " AS STRING), 1, 1) AS BIGINT)").as("digit"))
      .filter(col("digit").between(1L, 9L))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("total"))
    digits.crossJoin(broadcast(total))
      .join(broadcast(expected), Seq("digit"))
      .select(col("digit"), col("n"),
        expr("1000 * n DIV total").as("share_permille"),
        col("expected_permille"),
        expr("abs(1000 * n DIV total - expected_permille)")
          .as("dev_permille"))
  }

  val qBenfordAuditSql: String =
    """WITH digits AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS BIGINT) AS digit, count(*) AS n
      |  FROM orders
      |  WHERE CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS BIGINT) BETWEEN 1 AND 9
      |  GROUP BY 1),
      |tot AS (SELECT sum(n) AS total FROM digits),
      |expected(digit, expected_permille) AS (VALUES
      |  (1, 301), (2, 176), (3, 125), (4, 97), (5, 79),
      |  (6, 67), (7, 58), (8, 51), (9, 46))
      |SELECT d.digit, CAST(d.n AS BIGINT) AS n,
      |  CAST(1000 * d.n // total AS BIGINT) AS share_permille,
      |  CAST(e.expected_permille AS BIGINT) AS expected_permille,
      |  CAST(abs(1000 * d.n // total - e.expected_permille) AS BIGINT)
      |    AS dev_permille
      |FROM digits d CROSS JOIN tot
      |JOIN expected e ON d.digit = e.digit""".stripMargin

  def qDataAudit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val p = t(s, dir, "part")
    val ev = Tables.load(s, dir, "events")
    def check(name: String, cnt: DataFrame): DataFrame =
      cnt.select(lit(name).as("check_name"), col("n").cast("bigint")
        .as("n_violations"))
    val checks = Seq(
      check("lineitem_orphan_order",
        li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n"))),
      check("lineitem_orphan_part",
        li.join(p, col("l_partkey") === col("p_partkey"), "left_anti")
          .agg(count(lit(1)).as("n"))),
      check("order_orphan_customer",
        o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n"))),
      check("customer_orphan_nation",
        c.join(n, col("c_nationkey") === col("n_nationkey"), "left_anti")
          .agg(count(lit(1)).as("n"))),
      check("order_pk_dup",
        o.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(count(lit(1)).as("n"))),
      check("customer_pk_dup",
        c.groupBy("c_custkey").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(count(lit(1)).as("n"))),
      check("lineitem_null_keys",
        li.filter(col("l_orderkey").isNull || col("l_partkey").isNull)
          .agg(count(lit(1)).as("n"))),
      check("part_nonpositive_price",
        p.filter(col("p_retailprice") <= 0).agg(count(lit(1)).as("n"))),
      check("order_date_out_of_range",
        o.filter(col("o_orderdate") < lit("1990-01-01") ||
          col("o_orderdate") > lit("2030-01-01")).agg(count(lit(1)).as("n"))),
      check("event_negative_value",
        ev.filter(col("value") < 0).agg(count(lit(1)).as("n"))),
      // sequence continuity: ingestion dropped rows show up as id gaps
      check("event_id_gaps",
        ev.agg((max("event_id") - min("event_id") + 1 -
          countDistinct("event_id")).as("n"))))
    checks.reduce(_ unionByName _)
      .select(col("check_name"), col("n_violations"),
        when(col("n_violations") === 0, 1L).otherwise(0L).as("pass"))
  }

  val qDataAuditSql: String =
    """SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
      |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS pass
      |FROM (
      |  SELECT 'lineitem_orphan_order' AS check_name, count(*) AS n_violations
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'lineitem_orphan_part', count(*)
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      |  UNION ALL
      |  SELECT 'order_orphan_customer', count(*)
      |  FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'customer_orphan_nation', count(*)
      |  FROM customer c WHERE NOT EXISTS
      |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
      |  UNION ALL
      |  SELECT 'order_pk_dup', count(*) FROM (
      |    SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'customer_pk_dup', count(*) FROM (
      |    SELECT c_custkey FROM customer GROUP BY 1 HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'lineitem_null_keys', count(*) FROM lineitem
      |  WHERE l_orderkey IS NULL OR l_partkey IS NULL
      |  UNION ALL
      |  SELECT 'part_nonpositive_price', count(*) FROM part
      |  WHERE p_retailprice <= 0
      |  UNION ALL
      |  SELECT 'order_date_out_of_range', count(*) FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1990-01-01'
      |     OR o_orderdate > TIMESTAMP '2030-01-01'
      |  UNION ALL
      |  SELECT 'event_negative_value', count(*) FROM events
      |  WHERE value < 0
      |  UNION ALL
      |  SELECT 'event_id_gaps',
      |    max(event_id) - min(event_id) + 1 - count(DISTINCT event_id)
      |  FROM events)""".stripMargin

  /** TPC-H Q6-style forecast-revenue-change: the pure scan-filter-agg
    * query — no joins, one pass, one row out. Its whole value at
    * 100 TB is PUSHDOWN: the three predicates and the two needed
    * columns must reach the parquet reader (PlanSpec asserts
    * PushedFilters + a 4-column ReadSchema), so the scan reads a
    * fraction of the table and the aggregate is map-side-total.
    * Revenue in exact integer micros (cents x discount basis points).
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .select(
        (round(col("l_extendedprice") * 100, 0).cast("bigint") *
          round(col("l_discount") * 100, 0).cast("bigint"))
          .as("rev_micros"))
      .agg(sum("rev_micros").as("revenue_micros"),
        count(lit(1)).as("n_rows"))

  val q6ForecastSql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |    * CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS revenue_micros,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10-style returned-item report: which customers returned
    * the most revenue in a quarter — fact-fact join on the order key,
    * two dimension joins (customer broadcastable at any scale that
    * fits one executor; nation always broadcast), exact-cents revenue,
    * deterministic top-20 via TakeOrderedAndProject (never a global
    * sort).
    */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100, 0).cast("bigint") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("bigint")))
          .as("rev"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .select("o_orderkey", "o_custkey")
    val c = t(s, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    val n = t(s, dir, "nation").select("n_nationkey", "n_name")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("rev").as("revenue_micros"), count(lit(1)).as("n_items"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("revenue_micros"), col("n_items"))
      .orderBy(col("revenue_micros").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnsSql: String =
    """SELECT c.c_custkey, c.c_name, n.n_name,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
      |    AS BIGINT) AS revenue_micros,
      |  count(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue_micros DESC, c.c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q7-style (volume shipping): bidirectional nation-pair
    * revenue by year — two broadcast nation dims aliased onto the
    * supplier and customer sides of one fact join, the OR'd pair
    * condition evaluated post-join. Exact integer micros.
    */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("year(l_shipdate)").cast("bigint").as("l_year"),
        (round(col("l_extendedprice") * 100, 0).cast("bigint") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("bigint")))
          .as("rev"))
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_10") ||
          (col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_12"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("rev").as("revenue_micros"))
  }

  val q7VolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
      |    AS BIGINT) AS revenue_micros
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
      |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
      |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q14-style (promotion effect): promo share of one month's
    * revenue as integer permille — the conditional-aggregate-over-
    * ratio shape, float-free.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01") &&
        col("l_shipdate") < lit("1996-10-01"))
      .select(col("l_partkey"),
        (round(col("l_extendedprice") * 100, 0).cast("bigint") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("bigint")))
          .as("rev"))
    li.join(broadcast(t(s, dir, "part").select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0L)))
          .as("promo_micros"),
        sum("rev").as("total_micros"))
      .select(col("promo_micros"), col("total_micros"),
        expr("1000 * promo_micros DIV nullif(total_micros, 0)")
          .as("promo_permille"))
  }

  val q14PromoSql: String =
    """SELECT
      |  CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN
      |    CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
      |    ELSE 0 END) AS BIGINT) AS promo_micros,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
      |    AS BIGINT) AS total_micros,
      |  CAST(1000 * sum(CASE WHEN p.p_type = 'PROMO' THEN
      |    CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
      |    ELSE 0 END)
      |    // nullif(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))), 0)
      |    AS BIGINT) AS promo_permille
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l.l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  /** TPC-H Q15-style (top supplier): quarter revenue per supplier,
    * emit the one(s) equal to the max — the scalar-subquery-on-an-
    * aggregate shape (the max rides a 1-row broadcast, never a global
    * sort).
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("bigint") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("bigint")))
        .as("total_micros"))
    val mx = rev.agg(max("total_micros").as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_micros") === col("mx"))
      .join(t(s, dir, "supplier").select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_micros"))
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
      |      AS BIGINT) AS total_micros
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s.s_suppkey, s.s_name, r.total_micros
      |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
      |WHERE r.total_micros = (SELECT max(total_micros) FROM rev)""".stripMargin

  /** TPC-H Q18-style (large-volume orders): orders whose total
    * quantity clears a threshold, via a semi-join against the
    * HAVING'd per-order aggregate — the classic "aggregate subquery
    * in the IN list".
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("bigint").as("qty"))
    val big = li.groupBy("l_orderkey").agg(sum("qty").as("sum_qty"))
      .filter(col("sum_qty") > 300L)
    big.join(t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("bigint")
          .as("o_totalprice_cents"),
        col("sum_qty"))
      .orderBy(col("o_totalprice_cents").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18LargeOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
      |    AS sum_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
      |SELECT c.c_name, c.c_custkey, o.o_orderkey,
      |  CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS o_totalprice_cents,
      |  b.sum_qty
      |FROM big b
      |JOIN orders o ON b.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY o_totalprice_cents DESC, o.o_orderkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q19-style (discounted revenue, disjunctive predicates):
    * three OR'd brand/size/quantity windows — the query planners trip
    * on; the brand/size side prunes into the broadcast dim, the
    * quantity conjuncts evaluate post-join. One exact-integer row.
    */
  def q19Disjuncts(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("bigint").as("qty"),
        (round(col("l_extendedprice") * 100, 0).cast("bigint") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("bigint")))
          .as("rev"))
    val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
          col("qty").between(1, 15)) ||
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 25) &&
            col("qty").between(10, 25)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 50) &&
            col("qty").between(20, 35)))
      .agg(count(lit(1)).as("n_items"), sum("rev").as("revenue_micros"))
  }

  val q19DisjunctsSql: String =
    """SELECT count(*) AS n_items,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
      |    AS BIGINT) AS revenue_micros
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE
      |  (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
      |    AND CAST(l.l_quantity AS BIGINT) BETWEEN 1 AND 15)
      |  OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 25
      |    AND CAST(l.l_quantity AS BIGINT) BETWEEN 10 AND 25)
      |  OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 50
      |    AND CAST(l.l_quantity AS BIGINT) BETWEEN 20 AND 35)""".stripMargin

  /** TPC-H Q22-style (dormant big-balance customers): customers above
    * the positive-balance average (exact integer cents, 1-row
    * broadcast) with NO order in the trailing window (anti-join),
    * rolled up by market segment.
    */
  def q22Dormant(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100, 0).cast("bigint").as("bal_cents"))
    val avgBal = cust.filter(col("bal_cents") > 0L)
      .agg(expr("sum(bal_cents) DIV count(*)").as("avg_cents"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select(col("o_custkey")).distinct()
    cust.crossJoin(broadcast(avgBal))
      .filter(col("bal_cents") > col("avg_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_custs"), sum("bal_cents").as("total_cents"))
  }

  val q22DormantSql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      |  FROM customer),
      |avg_bal AS (
      |  SELECT sum(bal_cents) // count(*) AS avg_cents
      |  FROM cust WHERE bal_cents > 0),
      |recent AS (
      |  SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '2000-01-01')
      |SELECT c.c_mktsegment, count(*) AS n_custs,
      |  CAST(sum(c.bal_cents) AS BIGINT) AS total_cents
      |FROM cust c CROSS JOIN avg_bal
      |WHERE c.bal_cents > avg_cents
      |  AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
      |GROUP BY 1""".stripMargin

  /** TPC-H Q3-style: dim filter -> broadcast join -> fact-fact join ->
    * agg -> deterministic top-10.
    */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("2000-01-01"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1996-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("bigint") *
        (lit(100) - round(col("l_discount") * 100, 0).cast("bigint")))
        .as("revenue_micros"))
      .orderBy(col("revenue_micros").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
      |    (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
      |    AS revenue_micros
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '2000-01-01'
      |  AND l_shipdate > TIMESTAMP '1996-01-01'
      |GROUP BY l_orderkey
      |ORDER BY revenue_micros DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style 6-way join: every dim broadcast, one fact shuffle. */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").filter(col("r_name").isin("ASIA", "EUROPE"))
    val nation = t(s, dir, "nation")
    val supp = t(s, dir, "supplier")
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("bigint") *
        (lit(100) - round(col("l_discount") * 100, 0).cast("bigint")))
        .as("revenue_micros"))

  }

  val q5LocalSupplierSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
      |    (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
      |    AS revenue_micros
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |GROUP BY n_name""".stripMargin

  /** Projection + filter + row-level arithmetic (pushdown showcase:
    * both the shipdate predicate and the 4-column ReadSchema reach the
    * parquet scan).
    */
  def qFilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(
        col("l_shipdate").between(lit("1997-01-01"), lit("1997-12-31")) &&
          col("l_discount").between(0.03, 0.08) && col("l_quantity") < 25)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("l_linenumber"),
        (round(col("l_extendedprice") * 100, 0).cast("bigint") *
          (lit(100) - round(col("l_discount") * 100, 0).cast("bigint")) *
          (lit(100) + round(col("l_tax") * 100, 0).cast("bigint")))
          .as("charge_x1e6"))

  val qFilterProjectSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
      |    (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) *
      |    (100 + CAST(round(l_tax * 100, 0) AS BIGINT)) AS charge_x1e6
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
      |  AND l_discount BETWEEN 0.03 AND 0.08 AND l_quantity < 25""".stripMargin

  /** Left outer join + agg on the nullable side. */
  def qJoinLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_mktsegment")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(round(col("o_totalprice") * 100, 0).cast("bigint")),
          lit(0L)).as("total_spent_cents"))

  val qJoinLeftSql: String =
    """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
      |  CAST(coalesce(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)), 0)
      |    AS BIGINT) AS total_spent_cents
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment""".stripMargin

  /** Left-semi join (EXISTS). */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")

  val qSemiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin

  /** Left-anti join (NOT EXISTS). */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_acctbal")

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin

  /** Non-equi (range) join: equi key + band predicate. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(
        broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey") &&
          col("l_quantity").between(col("p_size") - 5, col("p_size") + 5))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum("l_quantity").as("sum_qty"))

  val qRangeJoinSql: String =
    """SELECT p_brand, count(*) AS n_lines, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |  AND l_quantity BETWEEN p_size - 5 AND p_size + 5
      |GROUP BY p_brand""".stripMargin

  /** Distinct aggregation: count(DISTINCT) alongside plain aggregates. */
  def qDistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100, 0).cast("bigint"))
          .as("total_cents"))

  val qDistinctAggSql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Window ranking: top-3 orders per customer, total-order tie-break. */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  val qWindowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) WHERE rn <= 3""".stripMargin

  /** Window running aggregate: per-customer cumulative spend. */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        fmtD(col("o_orderdate")).as("order_date"),
        sum(round(col("o_totalprice") * 100, 0).cast("bigint")).over(w)
          .as("running_spend_cents"))
  }

  val qWindowRunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS order_date,
      |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
      |    OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS running_spend_cents
      |FROM orders""".stripMargin

  /** Window lag: days since the customer's previous order. */
  def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(
          col("o_orderdate").cast("date"),
          lag(col("o_orderdate").cast("date"), 1).over(w))
          .cast("bigint").as("days_since_prev"))
  }

  val qWindowLagSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(date_diff('day',
      |    lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey),
      |    CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
      |FROM orders""".stripMargin

  /** Global top-k with deterministic tie-break (TopK = sort + limit;
    * physical plan is TakeOrderedAndProject — no global sort).
    */
  def qTopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val qTopKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Set ops: customers present in orders (INTERSECT). */
  def qIntersect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey").as("custkey"))
      .intersect(t(s, dir, "orders").select(col("o_custkey").as("custkey")))

  val qIntersectSql: String =
    "SELECT c_custkey AS custkey FROM customer INTERSECT " +
      "SELECT o_custkey AS custkey FROM orders"

  /** Set ops: customers who never placed a >300k order (EXCEPT). */
  def qExcept(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey").as("custkey"))
      .except(t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("custkey")))

  val qExceptSql: String =
    "SELECT c_custkey AS custkey FROM customer EXCEPT " +
      "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0"

  /** Set ops: UNION (distinct) across two different key domains. */
  def qUnionDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()

  val qUnionDistinctSql: String =
    "SELECT c_nationkey AS nationkey FROM customer UNION " +
      "SELECT s_nationkey AS nationkey FROM supplier"

  /** Set ops: UNION ALL of two projections + re-aggregation. */
  def qUnionAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice").as("amount"))
      .unionAll(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("custkey"),
          col("l_extendedprice").as("amount")))
      .groupBy("custkey")
      .agg(count(lit(1)).as("n"),
        sum(round(col("amount") * 100, 0).cast("bigint")).as("total_cents"))

  val qUnionAllSql: String =
    """SELECT custkey, count(*) AS n,
      |  CAST(sum(CAST(round(amount * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM (
      |  SELECT o_custkey AS custkey, o_totalprice AS amount FROM orders
      |  UNION ALL
      |  SELECT l_orderkey AS custkey, l_extendedprice AS amount FROM lineitem)
      |GROUP BY custkey""".stripMargin

  /** ROLLUP with grouping() disambiguation. */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))

  val qRollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over order status x priority. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) " +
          "DIV count(*) AS BIGINT)").as("avg_price_cents"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("avg_price_cents"))

  val qCubeSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) // count(*)
      |    AS BIGINT) AS avg_price_cents
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin

  /** HAVING: post-aggregation filter. Prices are 1-decimal; the avg
    * comparison is exact integer (`sum_deci > 9050 * n` ⟺ avg > 905.0).
    */
  def qHaving(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(round(col("p_retailprice") * 10, 0).cast("bigint"))
          .as("sum_deci"))
      .filter(col("n_parts") >= 3 && col("sum_deci") > lit(9050L) * col("n_parts"))
      .select(col("p_brand"), col("n_parts"),
        expr("CAST(sum_deci * 10 DIV n_parts AS BIGINT)").as("avg_price_centis"))

  val qHavingSql: String =
    """SELECT p_brand, count(*) AS n_parts,
      |  CAST(sum(CAST(round(p_retailprice * 10, 0) AS BIGINT)) * 10
      |    // count(*) AS BIGINT) AS avg_price_centis
      |FROM part GROUP BY p_brand
      |HAVING count(*) >= 3
      |  AND sum(CAST(round(p_retailprice * 10, 0) AS BIGINT)) > 9050 * count(*)""".stripMargin

  /** Conditional aggregation (CASE WHEN inside agg). */
  def qCaseWhen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("l_discount") > 0.05, col("l_quantity")).otherwise(0.0))
          .as("qty_high_disc"),
        sum(when(col("l_tax") === 0.0, lit(1)).otherwise(lit(0)))
          .cast("bigint").as("n_taxfree"),
        sum(when(col("l_quantity") >= 25,
          round(col("l_extendedprice") * 100, 0).cast("bigint")))
          .as("bulk_cents"),
        count(when(col("l_quantity") >= 25, lit(1))).as("n_bulk"))

  val qCaseWhenSql: String =
    """SELECT l_returnflag,
      |  sum(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE 0.0 END)
      |    AS qty_high_disc,
      |  CAST(sum(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_taxfree,
      |  CAST(sum(CASE WHEN l_quantity >= 25
      |    THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END) AS BIGINT)
      |    AS bulk_cents,
      |  count(CASE WHEN l_quantity >= 25 THEN 1 END) AS n_bulk
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Scalar string functions. */
  def qScalarString(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("bigint").as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        replace(col("p_type"), lit("STANDARD"), lit("STD")).as("type_short"),
        when(col("p_name").like("%part%"), lit(1)).otherwise(lit(0))
          .cast("bigint").as("has_part"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        reverse(col("p_brand")).as("brand_rev"),
        trim(lit("  x  ")).as("trimmed"))

  val qScalarStringSql: String =
    """SELECT p_partkey, upper(p_name) AS name_upper,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  substring(p_name, 1, 8) AS name_prefix,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  replace(p_type, 'STANDARD', 'STD') AS type_short,
      |  CAST(CASE WHEN p_name LIKE '%part%' THEN 1 ELSE 0 END AS BIGINT)
      |    AS has_part,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
      |  reverse(p_brand) AS brand_rev,
      |  trim('  x  ') AS trimmed
      |FROM part""".stripMargin

  /** Scalar date/time functions (all outputs string/bigint). */
  def qScalarDate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("yr"),
        month(col("o_orderdate")).cast("bigint").as("mo"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
        quarter(col("o_orderdate")).cast("bigint").as("qtr"),
        fmtD(last_day(col("o_orderdate"))).as("month_end"),
        fmtD(date_add(col("o_orderdate").cast("date"), 30)).as("plus30"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).cast("bigint").as("days_to_2002"))

  val qScalarDateSql: String =
    """SELECT o_orderkey,
      |  CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
      |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
      |  CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom,
      |  CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
      |  strftime(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP),
      |    '%Y-%m-%d') AS month_end,
      |  strftime(CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP),
      |    '%Y-%m-%d') AS plus30,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
      |    AS BIGINT) AS days_to_2002
      |FROM orders""".stripMargin

  /** Scalar math functions (row-level IEEE arithmetic: bit-identical
    * across engines).
    */
  def qScalarMath(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("bigint").as("ln"),
        abs(col("l_quantity") - 25.0).as("abs_dev"),
        ceil(col("l_extendedprice") / 1000.0).cast("bigint").as("price_k_ceil"),
        floor(col("l_discount") * 100.0).cast("bigint").as("disc_pct"),
        pmod(col("l_orderkey"), lit(7)).cast("bigint").as("key_mod7"),
        pow(col("l_quantity"), 2.0).as("qty_sq"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"))

  val qScalarMathSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
      |  abs(l_quantity - 25.0) AS abs_dev,
      |  CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
      |  CAST(floor(l_discount * 100.0) AS BIGINT) AS disc_pct,
      |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
      |  pow(l_quantity, 2.0) AS qty_sq,
      |  round(sqrt(l_extendedprice), 4) AS price_sqrt,
      |  greatest(l_discount, l_tax) AS max_rate,
      |  least(l_discount, l_tax) AS min_rate
      |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin

  /** Statistical aggregates. */
  def qStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("qty_stddev"),
        round(var_samp(col("l_quantity")), 4).as("qty_var"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          .as("qty_price_cov"),
        // median of an even count = midpoint of two cents values; x2
        // keeps it integral and engine-exact
        expr("CAST(round(median(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) * 2, 0) AS BIGINT)")
          .as("price_median_cents_x2"),
        min("l_quantity").as("qty_min"),
        max("l_quantity").as("qty_max"))

  val qStatsSql: String =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS qty_stddev,
      |  round(var_samp(l_quantity), 4) AS qty_var,
      |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov,
      |  CAST(round(median(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) * 2,
      |    0) AS BIGINT) AS price_median_cents_x2,
      |  min(l_quantity) AS qty_min, max(l_quantity) AS qty_max
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Correlated scalar subquery (decorrelated by Catalyst into a join):
    * customers above their nation's average balance.
    *
    * Computed in exact integer cents — `bal > avg(bal)` is evaluated as
    * `bal_cents * n > sum_cents`, so no float division exists anywhere
    * and the result is bit-stable across engines and partitionings
    * (a float avg of 2-decimal money lands exactly on rounding
    * boundaries often enough to flake a hash compare).
    */
  def qSubquery(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .withColumn("cents", round(col("c_acctbal") * 100, 0).cast("bigint"))
    val natSum = c.groupBy("c_nationkey")
      .agg(sum("cents").as("sum_cents"), count(lit(1)).as("n"))
    c.join(broadcast(natSum), Seq("c_nationkey"))
      .filter(col("cents") * col("n") > col("sum_cents"))
      .select(col("c_custkey"), col("c_nationkey"),
        (col("cents") * col("n") - col("sum_cents")).as("above_by_cents_x_n"))
  }

  val qSubquerySql: String =
    """SELECT c_custkey, c_nationkey,
      |  CAST(cents * n - sum_cents AS BIGINT) AS above_by_cents_x_n
      |FROM (SELECT c_custkey, c_nationkey,
      |        CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
      |      FROM customer) c
      |JOIN (
      |  SELECT c_nationkey AS nk,
      |    sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS sum_cents,
      |    count(*) AS n
      |  FROM customer GROUP BY c_nationkey) na ON c_nationkey = na.nk
      |WHERE cents * n > sum_cents""".stripMargin

  /** Unpivot (melt): wide rate columns -> long (rate_type, rate) rows —
    * the inverse of pivot. Values pass through unchanged (no
    * arithmetic), so raw doubles are hash-safe.
    */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("ln"),
        col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("ln")),
        Array(col("l_discount"), col("l_tax")),
        "rate_type", "rate")

  val qUnpivotSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
      |  'l_discount' AS rate_type, l_discount AS rate
      |FROM lineitem WHERE l_orderkey % 50 = 0
      |UNION ALL
      |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
      |  'l_tax' AS rate_type, l_tax AS rate
      |FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin

  /** GROUPING SETS via the SQL surface (the DataFrame API covers
    * rollup/cube above; arbitrary set lists go through spark.sql over
    * the registered views).
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** LATERAL correlated join through the SQL surface: each automobile-
    * segment customer joined to its two most expensive orders — the
    * per-row-parameterized-subquery shape (top-N lookup per driving
    * row) that plain joins can't spell without a post-join window.
    * Catalyst DECORRELATES the lateral subquery into exactly that
    * window-over-join plan (DomainJoin rewrite), so the 100 TB cost is
    * one c_custkey-partitioned rank over the co-partitioned join — the
    * convenience surface compiles to the scalable plan rather than a
    * per-row re-execution. Deterministic: total order on (price desc,
    * orderkey) before the LIMIT.
    */
  def qLateralTopOrders(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer_lat")
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders_lat")
    s.sql(
      """SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        |FROM customer_lat c
        |JOIN LATERAL (
        |  SELECT o.o_orderkey, o.o_totalprice
        |  FROM orders_lat o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o.o_totalprice DESC, o.o_orderkey
        |  LIMIT 2) t
        |WHERE c.c_mktsegment = 'AUTOMOBILE'""".stripMargin)
  }

  val qLateralTopOrdersSql: String =
    """SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
      |FROM customer c
      |JOIN LATERAL (
      |  SELECT o.o_orderkey, o.o_totalprice
      |  FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o.o_totalprice DESC, o.o_orderkey
      |  LIMIT 2) t ON true
      |WHERE c.c_mktsegment = 'AUTOMOBILE'""".stripMargin

  /** Analytic window functions: ntile bucketing + frame first/last
    * values over a totally-ordered per-customer window.
    */
  def qWindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        fmtD(first(col("o_orderdate")).over(wFull)).as("first_order"),
        fmtD(last(col("o_orderdate")).over(wFull)).as("last_order"),
        count(lit(1)).over(wFull).as("n_orders"))
  }

  val qWindowAnalyticsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  strftime(CAST(first_value(o_orderdate) OVER wf AS TIMESTAMP),
      |    '%Y-%m-%d') AS first_order,
      |  strftime(CAST(last_value(o_orderdate) OVER wf AS TIMESTAMP),
      |    '%Y-%m-%d') AS last_order,
      |  count(*) OVER wf AS n_orders
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  /** Regex scalar functions: extract + replace + full-match test. */
  def qScalarRegex(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("name_devoweled"),
        when(col("p_type").rlike("^(STANDARD|PROMO)"), lit(1)).otherwise(lit(0))
          .cast("bigint").as("is_std_or_promo"))

  val qScalarRegexSql: String =
    """SELECT p_partkey,
      |  regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
      |  CAST(CASE WHEN regexp_matches(p_type, '^(STANDARD|PROMO)')
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_std_or_promo
      |FROM part""".stripMargin

  /** Sketch-based approximate aggregates with the SAME mergeable,
    * constant-size state shape as HyperLogLog / quantile summaries —
    * the only viable shape for distinct/quantile at 100 TB — but built
    * from an md5-family hash both engines share, so the result is
    * bit-replayable ANSI SQL (full driver oracle) instead of an
    * engine-specific estimate:
    *
    *  - HLL distinct (m=256 registers): h = 60-bit md5 prefix;
    *    register = h mod 256, rho = leading-zero rank of h>>8 within
    *    its 52-bit window (via length(bin(w)) — integer-exact in both
    *    engines), capped at 50. The harmonic denominator is kept as
    *    the INTEGER sum(2^(50-M_j)) so the whole sketch is exact
    *    arithmetic; the single float op is the final alpha*m^2*2^50/S
    *    division (both engines: one IEEE division of exact integers,
    *    then round(.,3)), plus the linear-counting small-range
    *    correction (m*ln(m/V) when n < 2.5m with empty registers —
    *    also deterministic). The spec bounds the error vs exact
    *    counts.
    *  - approximate median by deterministic hash-sampling: rows whose
    *    md5-derived 60-bit row hash ≡ 0 (mod 4) form a 25% Bernoulli
    *    sample; the lower median over the sample is picked exactly
    *    (rank = ceil(n/2) in price order). Sampling error shrinks as
    *    1/sqrt(n) — at real scale the sample is millions of rows.
    *
    * At 100 TB both aggregates are a single map-side-combining
    * groupBy: per-register max and a 25%-sample rank — no full sort,
    * no per-group state beyond 256 longs.
    */
  def qApproxAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // hash ONCE per tracked column per row (md5+conv is the per-row
    // cost; deriving bucket and rho from the same h column keeps it to
    // one evaluation instead of one per derived expression — measured
    // 3.7 s -> ~2.0 s at sf0.1), then explode to register updates
    val ex = li
      .select(col("l_returnflag"), Hll.h60(col("l_partkey")).as("hp"),
        Hll.h60(col("l_orderkey")).as("ho"))
      .select(col("l_returnflag"),
        explode(array(
          struct(lit("parts").as("which"), col("hp").as("h")),
          struct(lit("orders").as("which"), col("ho").as("h")))).as("e"))
      .select(col("l_returnflag"), col("e.which"),
        Hll.bucket(col("e.h")).as("bucket"), Hll.rho(col("e.h")).as("rho"))
    val regs = ex.groupBy("l_returnflag", "which", "bucket")
      .agg(max("rho").as("m"))
    val sums = regs.groupBy("l_returnflag", "which")
      .agg(Hll.sUsed, count(lit(1)).as("n_used"))
      .withColumn("s", Hll.sTotal(col("s_used"), col("n_used")))
      .withColumn("est", Hll.estimate(col("s_used"), col("n_used")))
    val hll = sums.groupBy("l_returnflag").agg(
      max(when(col("which") === "parts", col("est"))).as("hll_parts"),
      max(when(col("which") === "parts", col("s"))).as("s_parts"),
      max(when(col("which") === "orders", col("est"))).as("hll_orders"),
      max(when(col("which") === "orders", col("s"))).as("s_orders"))
    // 25% deterministic sample keyed by the unique row identity
    val rowKey = concat_ws("-", col("l_orderkey"), col("l_linenumber"))
    val sample = li.filter(pmod(Hll.h60(rowKey), lit(4)) === 0)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val med = sample
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("l_returnflag")))
      .filter(col("rn") === ceil(col("n").cast("double") / 2.0))
      .select(col("l_returnflag"),
        col("l_extendedprice").as("sample_median_price"))
    // LEFT join: a return-flag group whose 25% deterministic sample is
    // empty keeps its sketch row with a NULL sample_median_price
    // instead of silently vanishing (the oracle mirrors the same
    // outer join) — matters for small groups, where an empty sample
    // is likely
    hll.join(med, Seq("l_returnflag"), "left")
      .select("l_returnflag", "hll_parts", "hll_orders",
        "s_parts", "s_orders", "sample_median_price")
  }

  val qApproxAggSql: String = {
    s"""WITH vals AS (
       |  SELECT l_returnflag, 'parts' AS which,
       |    CAST(l_partkey AS VARCHAR) AS v FROM lineitem
       |  UNION ALL
       |  SELECT l_returnflag, 'orders', CAST(l_orderkey AS VARCHAR)
       |  FROM lineitem),
       |h AS (
       |  SELECT l_returnflag, which,
       |    ${Hll.h60Sql("v")} AS h60
       |  FROM vals),
       |r AS (
       |  SELECT l_returnflag, which, h60 % 256 AS bucket,
       |    ${Hll.rhoSql} AS rho
       |  FROM h),
       |regs AS (
       |  SELECT l_returnflag, which, bucket, max(rho) AS m
       |  FROM r GROUP BY 1, 2, 3),
       |sums AS (
       |  SELECT l_returnflag, which,
       |    sum(1::BIGINT << (50 - m)) AS s_used, count(*) AS n_used
       |  FROM regs GROUP BY 1, 2),
       |est AS (
       |  SELECT l_returnflag, which,
       |    ${Hll.sTotalSql("s_used", "n_used")} AS s,
       |    ${Hll.estimateSql("s_used", "n_used")} AS est
       |  FROM sums),
       |hll AS (
       |  SELECT l_returnflag,
       |    max(CASE WHEN which = 'parts' THEN est END) AS hll_parts,
       |    max(CASE WHEN which = 'parts' THEN s END) AS s_parts,
       |    max(CASE WHEN which = 'orders' THEN est END) AS hll_orders,
       |    max(CASE WHEN which = 'orders' THEN s END) AS s_orders
       |  FROM est GROUP BY 1),
       |sample AS (
       |  SELECT l_returnflag, l_extendedprice FROM (
       |    SELECT l_returnflag, l_extendedprice,
       |      ${Hll.h60Sql(
             "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)")}
       |        AS rh
       |    FROM lineitem)
       |  WHERE rh % 4 = 0),
       |med AS (
       |  SELECT l_returnflag, l_extendedprice AS sample_median_price FROM (
       |    SELECT l_returnflag, l_extendedprice,
       |      row_number() OVER (PARTITION BY l_returnflag
       |        ORDER BY l_extendedprice) AS rn,
       |      count(*) OVER (PARTITION BY l_returnflag) AS n
       |    FROM sample)
       |  WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0) AS BIGINT))
       |SELECT hll.l_returnflag, hll_parts, hll_orders, s_parts, s_orders,
       |  sample_median_price
       |FROM hll LEFT JOIN med ON hll.l_returnflag = med.l_returnflag""".stripMargin
  }

  /** Skew-safe two-phase aggregation ([[Skew.saltedSumCount]]); the
    * oracle is the plain single-phase GROUP BY — salting must be
    * invisible in the result.
    */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    Skew.saltedSumCount(
      t(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"), "l_quantity")

  val qSaltedAggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_l_quantity, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Mode (most frequent value) per group via count + deterministic
    * argmax window — the engine-portable spelling of `mode()` (whose
    * native tie-breaks differ across engines).
    */
  def qMode(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("n").desc, col("o_orderpriority"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"),
        col("o_orderpriority").as("mode_priority"), col("n"))
  }

  val qModeSql: String =
    """SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
      |  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |      ORDER BY count(*) DESC, o_orderpriority) AS rn
      |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
      |WHERE rn = 1""".stripMargin

  /** Exact discrete quantiles (p25/p50/p75) per group via rank — picks
    * an actual element (the ceil(p*n)-th in (cents, key) order), so the
    * result is integer-exact across engines, unlike interpolating
    * percentile functions. The quantile fractions are binary-exact
    * doubles, so ceil(p*n) is deterministic.
    */
  def qQuantileExact(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      col("o_orderstatus"),
      round(col("o_totalprice") * 100, 0).cast("bigint").as("cents"),
      col("o_orderkey"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("cents"), col("o_orderkey"))
    val wAll = Window.partitionBy("o_orderstatus")
    base
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy("o_orderstatus")
      .agg(
        max(when(col("rn") === expr("CAST(ceil(0.25 * cnt) AS BIGINT)"),
          col("cents"))).as("p25_cents"),
        max(when(col("rn") === expr("CAST(ceil(0.5 * cnt) AS BIGINT)"),
          col("cents"))).as("p50_cents"),
        max(when(col("rn") === expr("CAST(ceil(0.75 * cnt) AS BIGINT)"),
          col("cents"))).as("p75_cents"),
        max("cents").as("max_cents"))
  }

  val qQuantileExactSql: String =
    """SELECT o_orderstatus,
      |  max(CASE WHEN rn = CAST(ceil(0.25 * cnt) AS BIGINT)
      |    THEN cents END) AS p25_cents,
      |  max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
      |    THEN cents END) AS p50_cents,
      |  max(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT)
      |    THEN cents END) AS p75_cents,
      |  max(cents) AS max_cents
      |FROM (
      |  SELECT o_orderstatus, cents,
      |    CAST(row_number() OVER (PARTITION BY o_orderstatus
      |      ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
      |    count(*) OVER (PARTITION BY o_orderstatus) AS cnt
      |  FROM (SELECT o_orderstatus,
      |          CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |          o_orderkey
      |        FROM orders))
      |GROUP BY o_orderstatus""".stripMargin

  /** Bitwise aggregate + scalar surface: bit_and/bit_or/bit_xor over
    * the keys of each group, plus shift/mask scalars.
    */
  def qScalarBit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        bit_and(col("o_orderkey")).as("keys_and"),
        bit_or(col("o_orderkey")).as("keys_or"),
        bit_xor(col("o_orderkey")).as("keys_xor"),
        bit_count(bit_or(col("o_orderkey"))).cast("bigint").as("or_bits"),
        max(shiftleft(col("o_orderkey").bitwiseAND(lit(0xffL)), 8))
          .as("max_shifted"))

  val qScalarBitSql: String =
    """SELECT o_orderstatus,
      |  bit_and(o_orderkey) AS keys_and,
      |  bit_or(o_orderkey) AS keys_or,
      |  bit_xor(o_orderkey) AS keys_xor,
      |  CAST(bit_count(bit_or(o_orderkey)) AS BIGINT) AS or_bits,
      |  max((o_orderkey & 255) * 256) AS max_shifted
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Null-handling scalar surface: nullif / coalesce / nvl2-style
    * three-way / null-safe equality, with nulls DERIVED in-query (the
    * testdata has none) so every branch is exercised.
    */
  def qScalarNull(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 40 === 0)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("ln"),
        // tax of exactly 0 -> NULL, then handled
        nullif(col("l_tax"), lit(0.0)).as("tax_or_null"),
        coalesce(nullif(col("l_tax"), lit(0.0)), lit(-1.0)).as("tax_coalesced"),
        when(nullif(col("l_tax"), lit(0.0)).isNotNull, lit("taxed"))
          .otherwise(lit("taxfree")).as("nvl2_style"),
        (nullif(col("l_discount"), lit(0.0)) <=> nullif(col("l_tax"), lit(0.0)))
          .cast("bigint").as("null_safe_eq"))

  val qScalarNullSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
      |  nullif(l_tax, 0.0) AS tax_or_null,
      |  coalesce(nullif(l_tax, 0.0), -1.0) AS tax_coalesced,
      |  CASE WHEN nullif(l_tax, 0.0) IS NOT NULL THEN 'taxed'
      |    ELSE 'taxfree' END AS nvl2_style,
      |  CAST(nullif(l_discount, 0.0) IS NOT DISTINCT FROM nullif(l_tax, 0.0)
      |    AS BIGINT) AS null_safe_eq
      |FROM lineitem WHERE l_orderkey % 40 = 0""".stripMargin

  /** RANGE-frame window (value-based, not row-based): for each order,
    * aggregate over all of the customer's orders whose price is within
    * 50000 cents BELOW this one — frames defined by VALUE distance
    * include a variable number of rows, which rowsBetween cannot
    * express.
    */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      round(col("o_totalprice") * 100, 0).cast("bigint").as("cents"))
    val w = Window.partitionBy("o_custkey").orderBy(col("cents"))
      .rangeBetween(-5000000L, Window.currentRow)
    base.select(col("o_custkey"), col("o_orderkey"), col("cents"),
      count(lit(1)).over(w).as("n_in_band"),
      sum("cents").over(w).as("band_cents"))
  }

  val qWindowRangeSql: String =
    """SELECT o_custkey, o_orderkey, cents,
      |  count(*) OVER w AS n_in_band,
      |  CAST(sum(cents) OVER w AS BIGINT) AS band_cents
      |FROM (SELECT o_custkey, o_orderkey,
      |        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |      FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY cents
      |  RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** MERGE / upsert as a relational plan (CDC apply on plain columnar
    * storage — what table formats run under the hood): base FULL OUTER
    * JOIN updates on the key; matched rows take the update's values,
    * unmatched-left keep the base, unmatched-right insert. The update
    * set here is derived deterministically from the base (every 10th
    * customer re-priced, plus brand-new keys), so the oracle reproduces
    * it exactly.
    *
    * Scale: one hash-partitioned full-outer join — the snapshot-merge
    * cost is O(base + updates), and writing the result partitioned by
    * the join key makes the next merge co-partitioned.
    */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100, 0).cast("bigint").as("bal_cents"))
    val updates = t(s, dir, "customer")
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("k"), lit("REPRICED").as("seg"),
        (round(col("c_acctbal") * 100, 0).cast("bigint") + 5000L)
          .as("bal_cents"))
      .unionAll(t(s, dir, "customer")
        .filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 1000000L).as("k"), lit("NEW").as("seg"),
          lit(0L).as("bal_cents")))
    base.as("b").join(updates.as("u"), col("b.k") === col("u.k"), "full_outer")
      .select(
        coalesce(col("b.k"), col("u.k")).as("k"),
        coalesce(col("u.seg"), col("b.seg")).as("seg"),
        coalesce(col("u.bal_cents"), col("b.bal_cents")).as("bal_cents"),
        when(col("b.k").isNull, "insert")
          .when(col("u.k").isNull, "keep").otherwise("update").as("action"))
  }

  val qMergeUpsertSql: String =
    """WITH base AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      |  FROM customer),
      |updates AS (
      |  SELECT c_custkey AS k, 'REPRICED' AS seg,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT) + 5000 AS bal_cents
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000 AS k, 'NEW' AS seg, 0 AS bal_cents
      |  FROM customer WHERE c_custkey % 7 = 0)
      |SELECT coalesce(b.k, u.k) AS k,
      |  coalesce(u.seg, b.seg) AS seg,
      |  CAST(coalesce(u.bal_cents, b.bal_cents) AS BIGINT) AS bal_cents,
      |  CASE WHEN b.k IS NULL THEN 'insert'
      |    WHEN u.k IS NULL THEN 'keep' ELSE 'update' END AS action
      |FROM base b FULL OUTER JOIN updates u ON b.k = u.k""".stripMargin

  /** Distribution window functions: percent_rank / cume_dist /
    * dense_rank over a totally ordered per-group window (both engines
    * compute the same IEEE divisions of the same integers, so doubles
    * compare exactly).
    */
  def qWindowDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 20 === 0)
      .select(
        col("o_orderstatus"), col("o_orderkey"),
        dense_rank().over(w).cast("bigint").as("drank"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
  }

  val qWindowDistSql: String =
    """SELECT o_orderstatus, o_orderkey,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist
      |FROM orders
      |WHERE o_orderkey % 20 = 0
      |WINDOW w AS (PARTITION BY o_orderstatus
      |  ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** ANSI-safe arithmetic: with spark.sql.ansi.enabled (the default in
    * Spark 4) plain division by zero or overflow THROWS; the `try_`
    * family yields NULL instead — the contract batch pipelines want for
    * dirty data. The oracle spells the same semantics with CASE.
    */
  def qScalarTry(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 60 === 0)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("ln"),
        try_divide(col("l_extendedprice"),
          round(col("l_tax") * 100, 0)).as("price_per_taxpoint"),
        try_add(col("l_orderkey") + lit(1L), lit(Long.MaxValue)).as("overflowed"),
        try_to_number(lit("not a number"), lit("999")).as("bad_parse"))

  val qScalarTrySql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
      |  CASE WHEN round(l_tax * 100, 0) = 0 THEN NULL
      |    ELSE l_extendedprice / round(l_tax * 100, 0) END
      |    AS price_per_taxpoint,
      |  CAST(NULL AS BIGINT) AS overflowed,
      |  CAST(NULL AS DECIMAL(3,0)) AS bad_parse
      |FROM lineitem WHERE l_orderkey % 60 = 0""".stripMargin

  /** Date/time truncation family: week/month/quarter/year bucket
    * starts (the time-dimension rollup keys of every calendar report),
    * emitted as formatted strings for engine-exact compare.
    */
  def qScalarDateTrunc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 25 === 0)
      .select(
        col("o_orderkey"),
        fmtD(date_trunc("week", col("o_orderdate"))).as("wk"),
        fmtD(date_trunc("month", col("o_orderdate"))).as("mo"),
        fmtD(date_trunc("quarter", col("o_orderdate"))).as("qt"),
        fmtD(date_trunc("year", col("o_orderdate"))).as("yr"),
        dayofweek(col("o_orderdate")).cast("bigint").as("dow_1sun"),
        weekofyear(col("o_orderdate")).cast("bigint").as("iso_week"))

  val qScalarDateTruncSql: String =
    """SELECT o_orderkey,
      |  strftime(CAST(date_trunc('week', ts) AS TIMESTAMP), '%Y-%m-%d') AS wk,
      |  strftime(CAST(date_trunc('month', ts) AS TIMESTAMP), '%Y-%m-%d') AS mo,
      |  strftime(CAST(date_trunc('quarter', ts) AS TIMESTAMP), '%Y-%m-%d') AS qt,
      |  strftime(CAST(date_trunc('year', ts) AS TIMESTAMP), '%Y-%m-%d') AS yr,
      |  CAST(dayofweek(ts) + 1 AS BIGINT) AS dow_1sun,
      |  CAST(weekofyear(ts) AS BIGINT) AS iso_week
      |FROM (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts
      |      FROM orders WHERE o_orderkey % 25 = 0)""".stripMargin

  /** Second string-function family: split_part / translate / repeat /
    * left / right / position — each with a direct DuckDB equivalent.
    */
  def qScalarString2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        split(col("p_type"), " ").getItem(0).as("type_first"),
        element_at(split(col("p_type"), " "), -1).as("type_last"),
        translate(col("p_brand"), "Brand#", "marke.").as("brand_xlat"),
        repeat(lit("ab"), 3).as("repeated"),
        substring(col("p_name"), 1, 4).as("left4"),
        col("p_name").substr(length(col("p_name")) - 3, lit(4)).as("right4"),
        instr(col("p_type"), "ED").cast("bigint").as("pos_ed"))

  val qScalarString2Sql: String =
    """SELECT p_partkey,
      |  split_part(p_type, ' ', 1) AS type_first,
      |  split_part(p_type, ' ', -1) AS type_last,
      |  translate(p_brand, 'Brand#', 'marke.') AS brand_xlat,
      |  repeat('ab', 3) AS repeated,
      |  left(p_name, 4) AS left4,
      |  right(p_name, 4) AS right4,
      |  CAST(CASE WHEN position('ED' IN p_type) IS NULL THEN 0
      |    ELSE position('ED' IN p_type) END AS BIGINT) AS pos_ed
      |FROM part""".stripMargin

  /** Numeric histogram: fixed-width binning of order totals (integer
    * cents DIV width — the distributed histogram shape: one map-side
    * bin assignment, one tiny aggregation).
    */
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select((round(col("o_totalprice") * 100, 0).cast("bigint") / 5000000L)
        .cast("bigint").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .select((col("bin") * 50000L).as("bin_floor_dollars_x100"), col("n"))

  val qHistogramSql: String =
    """SELECT CAST(bin * 50000 AS BIGINT) AS bin_floor_dollars_x100,
      |  count(*) AS n
      |FROM (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) // 5000000
      |        AS bin
      |      FROM orders)
      |GROUP BY bin""".stripMargin

  /** Ratio-to-report: each nation's share of total revenue in basis
    * points. The grand total is a RE-AGGREGATION of the tiny per-nation
    * result broadcast-cross-joined back — not `sum(...) OVER ()`, whose
    * unpartitioned window plans a single-partition exchange (the
    * "WindowExec: No Partition Defined" single-reducer shape PlanSpec
    * bans). The per-nation aggregate subplan appears in both branches
    * and its exchange is reused (ReusedExchange/AQE stage reuse), so
    * the fact table is scanned and partially aggregated ONCE; the
    * second branch only adds a 25-row global aggregate and a broadcast.
    */
  def qPercentOfTotal(s: SparkSession, dir: String): DataFrame = {
    val perNation = t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(sum(round(col("c_acctbal") * 100, 0).cast("bigint")).as("cents"))
    // EXACT floor division in wide-integer arithmetic: n - pmod(n, total)
    // is exactly divisible by total, so truncating `div` equals floor
    // regardless of sign (Spark DIV truncates toward zero, DuckDB //
    // floors — on an exact multiple they agree). DECIMAL(38,0) keeps the
    // numerator exact far past the 2^53 bound where the previous
    // floor(double-division) spelling could be off by 1 bp (per-nation
    // cents*10000 exceeds 2^53 somewhere around petabyte scale). The
    // DuckDB oracle spells the identical algebra in HUGEINT.
    val total = perNation
      .agg(sum(col("cents").cast("decimal(38,0)")).as("total"))
    perNation
      .withColumn("n", col("cents").cast("decimal(38,0)") * lit(10000))
      .crossJoin(broadcast(total))
      .select(col("c_nationkey"), col("cents"),
        expr("CAST((n - pmod(n, total)) div total AS BIGINT)").as("share_bp"))
  }

  val qPercentOfTotalSql: String =
    """SELECT c_nationkey, cents,
      |  CAST((n - ((n % total) + total) % total) // total AS BIGINT)
      |    AS share_bp
      |FROM (
      |  SELECT c_nationkey, cents,
      |    CAST(cents AS HUGEINT) * 10000 AS n,
      |    sum(CAST(cents AS HUGEINT)) OVER () AS total
      |  FROM (
      |    SELECT c_nationkey,
      |      CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
      |        AS cents
      |    FROM customer GROUP BY c_nationkey))""".stripMargin

  /** Equal-frequency feature discretization (quantile binning): ntile
    * buckets of l_extendedprice within each return flag, with exact
    * per-bucket stats — the feature-engineering step that turns a
    * continuous column into categorical training features. The ntile
    * ORDER BY carries a unique tiebreak (orderkey, linenumber) so tied
    * prices land in a deterministic bucket in every engine; sums are
    * kept in exact integer cents.
    *
    * Scale: ntile needs a per-group sort — one shuffle on the group
    * key, in-partition sort (no global order). Groups here are the 3
    * return flags; a real pipeline bins per (feature, shard) so no
    * single reducer sees more than a shard. The output is
    * groups x buckets rows — answer-sized.
    */
  def qFeatureBinning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("bucket", ntile(10).over(w).cast("bigint"))
      .groupBy("l_returnflag", "bucket")
      .agg(count(lit(1)).as("n"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
          .as("sum_cents"))
  }

  val qFeatureBinningSql: String =
    """SELECT l_returnflag, bucket, count(*) AS n,
      |  min(l_extendedprice) AS min_price,
      |  max(l_extendedprice) AS max_price,
      |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS sum_cents
      |FROM (
      |  SELECT l_returnflag, l_extendedprice,
      |    CAST(ntile(10) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT)
      |      AS bucket
      |  FROM lineitem)
      |GROUP BY 1, 2""".stripMargin

  /** Join-key skew diagnostics: the top-20 heaviest l_suppkey values
    * with rank, share and cumulative share of all rows — the panel an
    * operator reads before deciding which keys need salting ([[Skew]])
    * or an AQE skew-join hint. At 100 TB this is run BEFORE the big
    * join, on the cheap count aggregate, not after the join blows up.
    *
    * Scale: the per-key count is map-side combined; the top-20 is
    * TakeOrdered (no global sort); rank/cumulative are computed by a
    * triangular self-join over the 20-row answer — deliberately NOT a
    * global window, which would single-reduce and which PlanSpec
    * forbids across the whole query surface. The totals ride in on a
    * 1-row broadcast cross join.
    */
  def qSkewDiag(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(20)
    val tot = counts.agg(sum("n").as("total"),
      count(lit(1)).cast("bigint").as("n_keys"))
    top.as("a")
      .join(broadcast(top.select(col("key").as("bk"), col("n").as("bn"))),
        col("bn") > col("n") ||
          (col("bn") === col("n") && col("bk") <= col("key")))
      .groupBy("key", "n")
      .agg(count(lit(1)).as("rank"), sum("bn").as("cum_n"))
      .crossJoin(broadcast(tot))
      .select(col("key"), col("n"), col("rank"),
        round(col("n").cast("double") / col("total"), 6).as("share"),
        round(col("cum_n").cast("double") / col("total"), 6).as("cum_share"),
        col("total"), col("n_keys"))
  }

  val qSkewDiagSql: String =
    """WITH counts AS (
      |  SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS total,
      |    CAST(count(*) AS BIGINT) AS n_keys
      |  FROM counts),
      |top AS (
      |  SELECT key, n FROM counts ORDER BY n DESC, key LIMIT 20),
      |ranked AS (
      |  SELECT key, n,
      |    row_number() OVER (ORDER BY n DESC, key) AS rank,
      |    sum(n) OVER (ORDER BY n DESC, key
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
      |  FROM top)
      |SELECT r.key, r.n, r.rank,
      |  round(CAST(r.n AS DOUBLE) / t.total, 6) AS share,
      |  round(CAST(r.cum_n AS DOUBLE) / t.total, 6) AS cum_share,
      |  t.total, t.n_keys
      |FROM ranked r CROSS JOIN tot t""".stripMargin

  /** TPC-H Q2-style (min-cost regional supplier): for each part, the
    * EUROPE-region supplier(s) whose historical line price hits the
    * part's regional minimum — the correlated-min-subquery shape as a
    * groupBy-min + join-back on the part key. The synthetic schema has
    * no `partsupp`, so supply cost is read off lineitem history
    * (min extended price in cents), which preserves the query shape
    * (region-filtered dim, per-group min, equality join-back, ordered
    * top-20) with exact integers.
    */
  def q2MinCost(s: SparkSession, dir: String): DataFrame = {
    val eurNations = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val eurSup = t(s, dir, "supplier")
      .join(broadcast(eurNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        round(col("s_acctbal") * 100, 0).cast("bigint").as("s_bal_cents"))
    val reg = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100, 0).cast("bigint").as("price_cents"))
      .join(broadcast(eurSup.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"))
      .drop("s_suppkey")
    val minc = reg.groupBy(col("l_partkey").as("mk"))
      .agg(min("price_cents").as("min_cents"))
    reg.join(minc,
        col("l_partkey") === col("mk") &&
          col("price_cents") === col("min_cents"))
      .select(col("l_partkey").as("p_partkey"), col("l_suppkey"),
        col("min_cents"))
      .distinct()
      .join(broadcast(eurSup), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "part").select("p_partkey", "p_name"), Seq("p_partkey"))
      .select(col("s_bal_cents"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("min_cents"))
      .orderBy(col("s_bal_cents").desc, col("s_name"), col("p_partkey"))
      .limit(20)
  }

  val q2MinCostSql: String =
    """WITH eur_sup AS (
      |  SELECT s_suppkey, s_name, n_name,
      |    CAST(round(s_acctbal * 100, 0) AS BIGINT) AS s_bal_cents
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |reg AS (
      |  SELECT l.l_partkey, l.l_suppkey,
      |    CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS price_cents
      |  FROM lineitem l JOIN eur_sup e ON l.l_suppkey = e.s_suppkey),
      |minc AS (
      |  SELECT l_partkey, min(price_cents) AS min_cents FROM reg GROUP BY 1),
      |hit AS (
      |  SELECT DISTINCT r.l_partkey AS p_partkey, r.l_suppkey, m.min_cents
      |  FROM reg r JOIN minc m
      |    ON r.l_partkey = m.l_partkey AND r.price_cents = m.min_cents)
      |SELECT e.s_bal_cents, e.s_name, e.n_name, h.p_partkey, p.p_name,
      |  h.min_cents
      |FROM hit h
      |JOIN eur_sup e ON h.l_suppkey = e.s_suppkey
      |JOIN part p ON h.p_partkey = p.p_partkey
      |ORDER BY e.s_bal_cents DESC, e.s_name, h.p_partkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q9-style (product-type profit): per supplier-nation,
    * per ship year, profit on widget-family parts. No `partsupp`
    * here, so supply cost is modeled as 60% of the part's retail
    * price per unit — amount = rev_micros - qty * retail_cents * 60 —
    * which keeps Q9's fact-through-three-dims + signed-amount-agg
    * shape with exact integers.
    */
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val widget = t(s, dir, "part")
      .filter(col("p_name").like("%widget%"))
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("bigint").as("retail_cents"))
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("year(l_shipdate)").cast("bigint").as("o_year"),
        col("l_quantity").cast("bigint").as("qty"),
        (round(col("l_extendedprice") * 100, 0).cast("bigint") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("bigint")))
          .as("rev"))
      .join(broadcast(widget), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(col("rev") - col("qty") * col("retail_cents") * lit(60L))
        .as("profit_micros"))
      .select("nation", "o_year", "profit_micros")
  }

  val q9ProfitSql: String =
    """SELECT n.n_name AS nation,
      |  CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
      |  CAST(sum(
      |    CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |      * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
      |    - CAST(l.l_quantity AS BIGINT)
      |      * CAST(round(p.p_retailprice * 100, 0) AS BIGINT) * 60)
      |    AS BIGINT) AS profit_micros
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE p.p_name LIKE '%widget%'
      |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q11-style (important stock): per supplier-nation, the
    * parts whose shipped value exceeds 0.2% of the nation's total —
    * the HAVING-vs-scalar-subquery-per-group shape. Nation totals are
    * a nation-count-sized aggregate broadcast back onto the per-part
    * rows; the 0.2% threshold is the exact-integer predicate
    * `500 * value > total`.
    */
  def q11Important(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
    val perPart = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100, 0).cast("bigint") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("bigint")))
          .as("rev"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("l_partkey").as("p_partkey"))
      .agg(sum("rev").as("value_micros"))
    val perNation = perPart.groupBy("n_name")
      .agg(sum("value_micros").as("nation_total_micros"))
    perPart.join(broadcast(perNation), Seq("n_name"))
      .filter(col("value_micros") * 500L > col("nation_total_micros"))
      .select("n_name", "p_partkey", "value_micros", "nation_total_micros")
  }

  val q11ImportantSql: String =
    """WITH per_part AS (
      |  SELECT n.n_name, l.l_partkey AS p_partkey,
      |    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      |      * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
      |      AS BIGINT) AS value_micros
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |per_nation AS (
      |  SELECT n_name, CAST(sum(value_micros) AS BIGINT)
      |    AS nation_total_micros
      |  FROM per_part GROUP BY 1)
      |SELECT p.n_name, p.p_partkey, p.value_micros, t.nation_total_micros
      |FROM per_part p JOIN per_nation t ON p.n_name = t.n_name
      |WHERE p.value_micros * 500 > t.nation_total_micros""".stripMargin

  /** TPC-H Q12-style (late lines by priority): lines shipped more
    * than 60 days after their order date, split into high-priority
    * (1-URGENT / 2-HIGH) vs low-priority counts per ship year. The
    * synthetic schema has no ship mode or commit/receipt dates, so
    * "late" is ship-lag > 60 days — preserving Q12's fact-fact join
    * + conditional-count shape on the columns that exist.
    */
  def q12LateLines(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("2001-01-01"))
      .select(col("l_orderkey"),
        expr("year(l_shipdate)").cast("bigint").as("ship_year"),
        col("l_shipdate"))
    val ord = t(s, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 60)
      .groupBy("ship_year")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
  }

  val q12LateLinesSql: String =
    """SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '2001-01-01'
      |  AND date_diff('day', o.o_orderdate, l.l_shipdate) > 60
      |GROUP BY 1""".stripMargin

  /** TPC-H Q13-style (customer order-count distribution): LEFT join
    * customers to their non-'5-LOW' orders (join-condition filter, so
    * zero-order customers survive with count 0), count per customer,
    * then the distribution of those counts — the two-level-aggregate
    * + outer-join-with-predicate-in-the-ON-clause shape.
    */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select("c_custkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustDistSql: String =
    """WITH per_cust AS (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |    AND o.o_orderpriority <> '5-LOW'
      |  GROUP BY 1)
      |SELECT c_count, count(*) AS custdist
      |FROM per_cust GROUP BY 1
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q16-style (supplier count by part attributes): distinct
    * suppliers that shipped each (brand, type, size) combo, excluding
    * negative-balance suppliers (the customer-complaint analog) via
    * NOT IN, over a brand/type/size exclusion filter. `partsupp` is
    * absent, so the part-supplier relation is read off lineitem.
    */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSup = t(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSup), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16SupplierCntSql: String =
    """SELECT p.p_brand, p.p_type, p.p_size,
      |  count(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      |  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25)
      |  AND l.l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q17-style (small-quantity revenue): revenue from Brand#11
    * lines whose quantity is below 20% of the part's average — the
    * correlated-average-subquery shape as a per-part aggregate joined
    * back onto the fact. The 0.2*avg threshold is the exact-integer
    * cross-multiplication `5 * qty * cnt < sum_qty`.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val brand = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#11").select("p_partkey")
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("bigint").as("qty"),
        round(col("l_extendedprice") * 100, 0).cast("bigint").as("price_cents"))
      .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
      .drop("p_partkey")
    val perPart = li.groupBy("l_partkey")
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(perPart, Seq("l_partkey"))
      .filter(col("qty") * col("cnt") * 5L < col("sum_qty"))
      .agg(count(lit(1)).as("n_small_lines"),
        sum("price_cents").as("small_qty_cents"))
  }

  val q17SmallQtySql: String =
    """WITH li AS (
      |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
      |    CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS price_cents
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_brand = 'Brand#11'),
      |per_part AS (
      |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM li GROUP BY 1)
      |SELECT count(*) AS n_small_lines,
      |  CAST(sum(l.price_cents) AS BIGINT) AS small_qty_cents
      |FROM li l JOIN per_part p ON l.l_partkey = p.l_partkey
      |WHERE l.qty * p.cnt * 5 < p.sum_qty""".stripMargin

  /** TPC-H Q20-style (dominant suppliers): suppliers who shipped more
    * than 25% of a red part's 1996 volume — per-(part,supplier)
    * aggregate vs per-part total (`4 * supp_qty > total_qty`), then
    * the distinct suppliers rolled up with how many parts they
    * dominate. Preserves Q20's agg-vs-half-of-agg semi-join chain
    * without `partsupp` availqty.
    */
  def q20Dominant(s: SparkSession, dir: String): DataFrame = {
    val red = t(s, dir, "part")
      .filter(col("p_name").like("red%")).select("p_partkey")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("bigint").as("qty"))
      .join(broadcast(red), col("l_partkey") === col("p_partkey"))
      .drop("p_partkey")
    val perSupp = li.groupBy("l_partkey", "l_suppkey")
      .agg(sum("qty").as("supp_qty"))
    val perPart = li.groupBy("l_partkey").agg(sum("qty").as("total_qty"))
    perSupp.join(perPart, Seq("l_partkey"))
      .filter(col("supp_qty") * 4L > col("total_qty"))
      .join(t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name", "n_name")
      .agg(count(lit(1)).as("n_parts_dominated"))
      .orderBy("s_name")
  }

  val q20DominantSql: String =
    """WITH li AS (
      |  SELECT l.l_partkey, l.l_suppkey, CAST(l.l_quantity AS BIGINT) AS qty
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_name LIKE 'red%'
      |    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l.l_shipdate < TIMESTAMP '1997-01-01'),
      |per_supp AS (
      |  SELECT l_partkey, l_suppkey, CAST(sum(qty) AS BIGINT) AS supp_qty
      |  FROM li GROUP BY 1, 2),
      |per_part AS (
      |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty
      |  FROM li GROUP BY 1)
      |SELECT s.s_name, n.n_name, count(*) AS n_parts_dominated
      |FROM per_supp ps
      |JOIN per_part pp ON ps.l_partkey = pp.l_partkey
      |JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE ps.supp_qty * 4 > pp.total_qty
      |GROUP BY 1, 2
      |ORDER BY s.s_name""".stripMargin

  /** Robust outlier panel (median / MAD): per order status, the exact
    * median of order totals, the exact median absolute deviation, and
    * how many orders sit beyond 3 MADs — the outlier rule that, unlike
    * mean/stddev z-scores (q_events_anomaly), is not itself dragged by
    * the outliers it hunts. Both medians use the rank-position
    * discipline of [[qQuantileExact]] (row_number to ceil(n/2), exact
    * integers end-to-end). Group-partitioned windows: groups here are
    * the 3 statuses, so at 100 TB you'd pre-aggregate per (status,
    * cents) first or reach for the mergeable sketch
    * (q_sketch_quantile); the exact discipline is for bounded groups.
    */
  def qOutlierMad(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      col("o_orderstatus"),
      round(col("o_totalprice") * 100, 0).cast("bigint").as("cents"),
      col("o_orderkey"))
    val w1 = Window.partitionBy("o_orderstatus")
      .orderBy(col("cents"), col("o_orderkey"))
    val wAll = Window.partitionBy("o_orderstatus")
    val med = base
      .withColumn("rn", row_number().over(w1).cast("bigint"))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy("o_orderstatus")
      .agg(max(when(col("rn") === expr("CAST(ceil(0.5 * cnt) AS BIGINT)"),
        col("cents"))).as("med_cents"))
    val dev = base.join(broadcast(med), Seq("o_orderstatus"))
      .withColumn("adev", abs(col("cents") - col("med_cents")))
    val w2 = Window.partitionBy("o_orderstatus")
      .orderBy(col("adev"), col("o_orderkey"))
    val mad = dev
      .withColumn("rn", row_number().over(w2).cast("bigint"))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy(col("o_orderstatus").as("st"))
      .agg(max(when(col("rn") === expr("CAST(ceil(0.5 * cnt) AS BIGINT)"),
        col("adev"))).as("mad_cents"))
    dev.join(broadcast(mad), col("o_orderstatus") === col("st"))
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        max("med_cents").as("med_cents"),
        max("mad_cents").as("mad_cents"),
        sum(when(col("adev") > lit(3L) * col("mad_cents"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max("adev").as("max_adev_cents"))
  }

  val qOutlierMadSql: String =
    """WITH base AS (
      |  SELECT o_orderstatus,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |    o_orderkey
      |  FROM orders),
      |med AS (
      |  SELECT o_orderstatus,
      |    max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
      |      THEN cents END) AS med_cents
      |  FROM (SELECT o_orderstatus, cents,
      |          row_number() OVER (PARTITION BY o_orderstatus
      |            ORDER BY cents, o_orderkey) AS rn,
      |          count(*) OVER (PARTITION BY o_orderstatus) AS cnt
      |        FROM base)
      |  GROUP BY 1),
      |dev AS (
      |  SELECT b.o_orderstatus, b.o_orderkey, m.med_cents,
      |    abs(b.cents - m.med_cents) AS adev
      |  FROM base b JOIN med m ON b.o_orderstatus = m.o_orderstatus),
      |mad AS (
      |  SELECT o_orderstatus,
      |    max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
      |      THEN adev END) AS mad_cents
      |  FROM (SELECT o_orderstatus, adev,
      |          row_number() OVER (PARTITION BY o_orderstatus
      |            ORDER BY adev, o_orderkey) AS rn,
      |          count(*) OVER (PARTITION BY o_orderstatus) AS cnt
      |        FROM dev)
      |  GROUP BY 1)
      |SELECT d.o_orderstatus,
      |  count(*) AS n_orders,
      |  max(d.med_cents) AS med_cents,
      |  max(a.mad_cents) AS mad_cents,
      |  CAST(sum(CASE WHEN d.adev > 3 * a.mad_cents THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  max(d.adev) AS max_adev_cents
      |FROM dev d JOIN mad a ON d.o_orderstatus = a.o_orderstatus
      |GROUP BY 1""".stripMargin

  /** TPC-H Q21-style (suppliers who kept orders waiting): for 'F'
    * orders with >=2 distinct suppliers where exactly ONE supplier
    * shipped late (>60 days after the order date), count waits per
    * that sole-late supplier. The classic EXISTS + NOT-EXISTS pair is
    * re-expressed as one aggregate per order (distinct-supplier count,
    * distinct-late-supplier count, min late supplier) — semantically
    * identical and one orderkey shuffle instead of three self-joins,
    * which is the plan you want at 100 TB. No commit/receipt dates in
    * this schema, so "late" is ship-lag > 60 days as in the Q12 analog.
    */
  def q21Waiting(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 60).as("late"))
    val perOrder = li.groupBy("l_orderkey")
      .agg(
        countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"),
        min(when(col("late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2L && col("n_late") === 1L)
    perOrder
      .join(t(s, dir, "supplier").select("s_suppkey", "s_name"),
        col("late_supp") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21WaitingSql: String =
    """WITH li AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |    date_diff('day', o.o_orderdate, l.l_shipdate) > 60 AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F'),
      |per_order AS (
      |  SELECT l_orderkey,
      |    count(DISTINCT l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
      |    min(CASE WHEN late THEN l_suppkey END) AS late_supp
      |  FROM li GROUP BY 1)
      |SELECT s.s_name, count(*) AS numwait
      |FROM per_order p JOIN supplier s ON p.late_supp = s.s_suppkey
      |WHERE p.n_supp >= 2 AND p.n_late = 1
      |GROUP BY 1
      |ORDER BY numwait DESC, s.s_name
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- //

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_waiting" -> (q21Waiting _),
    "q_outlier_mad" -> (qOutlierMad _),
    "q2_min_cost" -> (q2MinCost _),
    "q9_profit" -> (q9Profit _),
    "q11_important" -> (q11Important _),
    "q12_late_lines" -> (q12LateLines _),
    "q13_custdist" -> (q13CustDist _),
    "q16_supplier_cnt" -> (q16SupplierCnt _),
    "q17_small_qty" -> (q17SmallQty _),
    "q20_dominant" -> (q20Dominant _),
    "q_skew_diag" -> (qSkewDiag _),
    "q_feature_binning" -> (qFeatureBinning _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_approx_agg" -> (qApproxAgg _),
    "q_window_analytics" -> (qWindowAnalytics _),
    "q_scalar_regex" -> (qScalarRegex _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_lateral_topk" -> (qLateralTopOrders _),
    "q_unpivot" -> (qUnpivot _),
    "q1_pricing" -> (q1Pricing _),
    "q6_forecast" -> (q6Forecast _),
    "q_data_audit" -> (qDataAudit _),
    "q_incremental_rollup" -> (qIncrementalRollup _),
    "q8_market_share" -> (q8MarketShare _),
    "q4_priority" -> (q4Priority _),
    "q_revenue_concentration" -> (qRevenueConcentration _),
    "q10_returns" -> (q10Returns _),
    "q_audit_benford" -> (qBenfordAudit _),
    "q7_volume" -> (q7Volume _),
    "q14_promo" -> (q14Promo _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q19_disjuncts" -> (q19Disjuncts _),
    "q22_dormant" -> (q22Dormant _),
    "q3_shipping" -> (q3Shipping _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q_filter_project" -> (qFilterProject _),
    "q_join_left" -> (qJoinLeft _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_running" -> (qWindowRunning _),
    "q_window_lag" -> (qWindowLag _),
    "q_topk" -> (qTopK _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _),
    "q_union_all" -> (qUnionAll _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_having" -> (qHaving _),
    "q_case_when" -> (qCaseWhen _),
    "q_scalar_string" -> (qScalarString _),
    "q_scalar_date" -> (qScalarDate _),
    "q_scalar_math" -> (qScalarMath _),
    "q_stats" -> (qStats _),
    "q_subquery" -> (qSubquery _),
    "q_mode" -> (qMode _),
    "q_quantile_exact" -> (qQuantileExact _),
    "q_scalar_bit" -> (qScalarBit _),
    "q_scalar_null" -> (qScalarNull _),
    "q_merge_upsert" -> (qMergeUpsert _),
    "q_window_range" -> (qWindowRange _),
    "q_window_dist" -> (qWindowDist _),
    "q_scalar_try" -> (qScalarTry _),
    "q_scalar_datetrunc" -> (qScalarDateTrunc _),
    "q_scalar_string2" -> (qScalarString2 _),
    "q_histogram" -> (qHistogram _),
    "q_pct_of_total" -> (qPercentOfTotal _),
    "q_union_distinct" -> (qUnionDistinct _))

  val oracleSql: Map[String, String] = Map(
    "q21_waiting" -> q21WaitingSql,
    "q_outlier_mad" -> qOutlierMadSql,
    "q2_min_cost" -> q2MinCostSql,
    "q9_profit" -> q9ProfitSql,
    "q11_important" -> q11ImportantSql,
    "q12_late_lines" -> q12LateLinesSql,
    "q13_custdist" -> q13CustDistSql,
    "q16_supplier_cnt" -> q16SupplierCntSql,
    "q17_small_qty" -> q17SmallQtySql,
    "q20_dominant" -> q20DominantSql,
    "q_salted_agg" -> qSaltedAggSql,
    "q_approx_agg" -> qApproxAggSql,
    "q_feature_binning" -> qFeatureBinningSql,
    "q_skew_diag" -> qSkewDiagSql,
    "q_window_analytics" -> qWindowAnalyticsSql,
    "q_scalar_regex" -> qScalarRegexSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_lateral_topk" -> qLateralTopOrdersSql,
    "q_unpivot" -> qUnpivotSql,
    "q1_pricing" -> q1PricingSql,
    "q6_forecast" -> q6ForecastSql,
    "q_data_audit" -> qDataAuditSql,
    "q_incremental_rollup" -> qIncrementalRollupSql,
    "q8_market_share" -> q8MarketShareSql,
    "q4_priority" -> q4PrioritySql,
    "q_revenue_concentration" -> qRevenueConcentrationSql,
    "q10_returns" -> q10ReturnsSql,
    "q_audit_benford" -> qBenfordAuditSql,
    "q7_volume" -> q7VolumeSql,
    "q14_promo" -> q14PromoSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "q19_disjuncts" -> q19DisjunctsSql,
    "q22_dormant" -> q22DormantSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_local_supplier" -> q5LocalSupplierSql,
    "q_filter_project" -> qFilterProjectSql,
    "q_join_left" -> qJoinLeftSql,
    "q_semi_join" -> qSemiJoinSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_range_join" -> qRangeJoinSql,
    "q_distinct_agg" -> qDistinctAggSql,
    "q_window_rank" -> qWindowRankSql,
    "q_window_running" -> qWindowRunningSql,
    "q_window_lag" -> qWindowLagSql,
    "q_topk" -> qTopKSql,
    "q_intersect" -> qIntersectSql,
    "q_except" -> qExceptSql,
    "q_union_all" -> qUnionAllSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_having" -> qHavingSql,
    "q_case_when" -> qCaseWhenSql,
    "q_scalar_string" -> qScalarStringSql,
    "q_scalar_date" -> qScalarDateSql,
    "q_scalar_math" -> qScalarMathSql,
    "q_stats" -> qStatsSql,
    "q_subquery" -> qSubquerySql,
    "q_mode" -> qModeSql,
    "q_quantile_exact" -> qQuantileExactSql,
    "q_scalar_bit" -> qScalarBitSql,
    "q_scalar_null" -> qScalarNullSql,
    "q_merge_upsert" -> qMergeUpsertSql,
    "q_window_range" -> qWindowRangeSql,
    "q_window_dist" -> qWindowDistSql,
    "q_scalar_try" -> qScalarTrySql,
    "q_scalar_datetrunc" -> qScalarDateTruncSql,
    "q_scalar_string2" -> qScalarString2Sql,
    "q_histogram" -> qHistogramSql,
    "q_pct_of_total" -> qPercentOfTotalSql,
    "q_union_distinct" -> qUnionDistinctSql)
}
