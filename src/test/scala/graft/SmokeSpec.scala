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

  test("rows-only queries are exactly the documented non-ANSI ops") {
    // binary-codec perceptual ops — ground truth requires BMP/WAV/Y4M
    // decode, which DuckDB cannot do; each is asserted against
    // brute-force ScalaTest oracles instead (LlmSpec)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set(
      "q_multimodal_phash",
      "q_multimodal_audio_dup", "q_multimodal_video_dup"),
      s"every other query must carry a DuckDB oracle, got: $rowsOnly")
  }

  test("every query runs and returns a non-empty, non-degenerate result") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sfDir).limit(1).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
