package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic-HLL machinery (m = 256 registers), used by
  * [[Relational.qApproxAgg]] and [[graft.llm.CorpusOps.hllMergeBySource]].
  *
  * Everything is built from the md5-family 60-bit hash both Spark and
  * DuckDB evaluate identically, and the harmonic denominator is kept
  * as an exact integer (sum of 2^(50-M_j)), so the sketch is
  * bit-replayable ANSI SQL — the one library-float op is the final
  * estimate (a division, or m*ln(m/V) in the linear-counting range),
  * identically parenthesized in both engines and rounded to 3 places.
  *
  * The register table is the SKETCH: constant-size (256 longs) per
  * group, mergeable by per-bucket max — the property that lets
  * per-shard / per-day sketches combine without re-scanning, which is
  * what makes HLL the distinct-count shape at 100 TB.
  */
object Hll {
  val M = 256
  val TwoP50: Long = 1L << 50
  /** alpha_256 * m^2 * 2^50 — computed ONCE here and interpolated into
    * the oracle SQL as a double literal, so neither engine re-derives
    * alpha with its own intermediate rounding.
    */
  val Num: Double = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * TwoP50.toDouble

  /** 60-bit integer from the md5 prefix of the value's string form. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  def bucket(h: Column): Column = pmod(h, lit(M))

  /** Leading-zero rank of h>>8 within its 52-bit window, capped at 50
    * so 2^(50-rho) stays an exact long. Integer-exact in both engines
    * via length(bin(w)).
    */
  def rho(h: Column): Column = {
    val w = shiftright(h, 8)
    when(w === 0, lit(50))
      .otherwise(least(lit(50), lit(53) - length(bin(w))))
  }

  /** Exact scaled harmonic sum over a register group: aggregate
    * expressions (s_used, n_used) for `.agg(...)` over max-rho rows
    * named `m`.
    */
  def sUsed: Column =
    sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(50 - m AS INT))")).as("s_used")

  /** Estimate column from (s_used, n_used): raw HLL with the
    * linear-counting small-range correction.
    */
  def estimate(sUsedCol: Column, nUsedCol: Column): Column = {
    val s = sUsedCol + (lit(M.toLong) - nUsedCol) * lit(TwoP50)
    val raw = lit(Num) / s.cast("double")
    round(
      when(nUsedCol < M && raw < 2.5 * M,
        lit(M.toDouble) * log(lit(M.toDouble) / (lit(M.toLong) - nUsedCol)))
        .otherwise(raw), 3)
  }

  /** Exact integer denominator column (the mergeable audit value). */
  def sTotal(sUsedCol: Column, nUsedCol: Column): Column =
    sUsedCol + (lit(M.toLong) - nUsedCol) * lit(TwoP50)

  /** Scala-side estimate from a 256-int register array (0 = empty) —
    * the SAME arithmetic as [[estimate]]/[[sTotal]], used by the
    * streaming state operator ([[graft.streaming.DocStreams
    * .hllBySource]]) whose per-key state is the register array itself.
    * Returns (estimate rounded to 3, exact integer denominator).
    */
  def estimateScala(regs: Array[Int]): (Double, Long) = {
    var sUsed = 0L
    var nUsed = 0
    var i = 0
    while (i < M) {
      if (regs(i) > 0) { nUsed += 1; sUsed += 1L << (50 - regs(i)) }
      i += 1
    }
    val v = M - nUsed
    val s = sUsed + v.toLong * TwoP50
    val raw = Num / s.toDouble
    val est =
      if (nUsed < M && raw < 2.5 * M) M.toDouble * math.log(M.toDouble / v)
      else raw
    // BigDecimal.valueOf + HALF_UP is what Spark's round(double, 3)
    // does — the stream==batch equality spec depends on matching it
    val rounded = java.math.BigDecimal.valueOf(est)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
    (rounded, s)
  }

  // ---- DuckDB oracle fragments (same math, spelled in its SQL) ----

  /** 60-bit md5 hash of a VARCHAR expression. */
  def h60Sql(v: String): String =
    s"""list_reduce(list_transform(range(15), i ->
       |      CAST(strpos('0123456789abcdef', substr(md5($v), i + 1, 1)) - 1
       |        AS BIGINT)), (a, b) -> a * 16 + b)""".stripMargin

  /** rho from a column named h60 (SQL fragment). */
  val rhoSql: String =
    """CASE WHEN h60 // 256 = 0 THEN 50
      |         ELSE least(50, 53 - length(bin(h60 // 256))) END""".stripMargin

  /** Estimate from columns (s_used, n_used). */
  def estimateSql(sUsed: String, nUsed: String): String =
    s"""round(CASE WHEN $nUsed < 256 AND
       |        $Num /
       |          CAST($sUsed + (256 - $nUsed) * $TwoP50 AS DOUBLE) < 640.0
       |      THEN 256.0 * ln(256.0 / (256 - $nUsed))
       |      ELSE $Num /
       |        CAST($sUsed + (256 - $nUsed) * $TwoP50 AS DOUBLE)
       |      END, 3)""".stripMargin

  def sTotalSql(sUsed: String, nUsed: String): String =
    s"CAST($sUsed + (256 - $nUsed) * $TwoP50 AS BIGINT)"
}
