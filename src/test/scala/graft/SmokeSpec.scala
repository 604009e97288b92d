package graft

/** Mirrors the driver's smoke gates: entry() returns rows; every
  * declared query has either an oracle or a documented rows-only
  * rationale; oracle keys ⊆ query keys.
  */
class SmokeSpec extends SparkSpec {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("EVERY query carries a DuckDB oracle (no rows-only rows left)") {
    // Through r13 the binary-codec trio was rows-only (DuckDB cannot
    // decode BMP/WAV/Y4M); r14's materialized partial oracle closed
    // that: the pairing stage is hash-checked from the decoded-hash
    // table, so the full-oracle invariant now holds suite-wide and
    // must never regress.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without a DuckDB oracle: $rowsOnly")
  }

  test("every query runs and returns a non-empty, non-degenerate result") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sfDir).limit(1).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
