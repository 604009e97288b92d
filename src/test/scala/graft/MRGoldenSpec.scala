package graft

import graft.apps.NativeApps
import graft.mr._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden/differential tier (SURVEY §5 tier 1): distributed output must
  * equal the sequential oracle's after canonicalization (global sort,
  * drop blanks) — the port of `main/test-mr.sh`'s wc / indexer / crash
  * gates, with the oracle recomputed in-process instead of checked-in
  * goldens.
  */
class MRGoldenSpec extends SparkSpec {

  private val corpusDir = Paths.get("/root/reference/main")
  private lazy val pgPaths: Seq[String] =
    Files.list(corpusDir).iterator.asScala
      .map(_.toString).filter(p => p.matches(".*pg-.*\\.txt")).toSeq.sorted

  private lazy val localFiles: Seq[(String, String)] = pgPaths.map { p =>
    val name = Paths.get(p).getFileName.toString
    name -> new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
  }

  private def goldenCheck(appName: String): Unit = {
    val app = MRApps.byName(appName)
    val expected = SequentialOracle.run(localFiles, app).sorted
    val actual = MRJob.canonical(MRJob.run(spark, app, pgPaths))
    assert(actual.size === expected.size, s"$appName row count")
    assert(actual === expected, s"$appName golden mismatch")
  }

  test("wc distributed == sequential oracle (pg corpus)") {
    goldenCheck("wc")
  }

  test("indexer distributed == sequential oracle (pg corpus)") {
    goldenCheck("indexer")
  }

  test("crash payload distributed == sequential oracle (pg corpus)") {
    goldenCheck("crashpayload")
  }

  test("native wordCount == MRApp wordCount (pg corpus)") {
    val files = MRJob.read(spark, pgPaths)
    val native = NativeApps.wordCount(files).collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}").sorted.toSeq
    val expected = SequentialOracle.run(localFiles, WordCountApp).sorted
    assert(native === expected)
  }

  test("native invertedIndex == MRApp indexer (pg corpus)") {
    val files = MRJob.read(spark, pgPaths)
    val native = NativeApps.invertedIndex(files).collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}").sorted.toSeq
    val expected = SequentialOracle.run(localFiles, InvertedIndexApp).sorted
    assert(native === expected)
  }

  test("native crashPayload == MRApp crashPayload (pg corpus)") {
    val files = MRJob.read(spark, pgPaths)
    val native = NativeApps.crashPayload(files).collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}").sorted.toSeq
    val expected = SequentialOracle.run(localFiles, CrashPayloadApp).sorted
    assert(native === expected)
  }

  test("filenames with spaces/non-ASCII decode; byte lengths match Go len()") {
    // input_file_name() returns a URL-encoded URI; MRJob.read must hand
    // apps the verbatim basename, and crashpayload's lengths must be
    // UTF-8 bytes (Go len()) — "¡hölá!" is 6 code points / 9 bytes.
    val dir = Files.createTempDirectory("graft-names")
    val contents = "¡hölá! plus ascii\n"
    // (non-ASCII *names* are untestable here — the container JVM's
    // sun.jnu.encoding is ASCII — but %XX-decoding is byte-generic, so
    // space covers the escape path; '+' covers the literal-plus path)
    val names = Seq("pg weird name.txt", "pg-plus+x.txt")
    val paths = names.map { n =>
      val p = dir.resolve(n)
      Files.write(p, contents.getBytes("UTF-8"))
      p.toString
    }
    val files = MRJob.read(spark, paths)
    val gotNames = files.select("filename").collect().map(_.getString(0)).sorted
    assert(gotNames.toSeq === names.sorted)
    val local = names.map(_ -> contents)
    val expected = SequentialOracle.run(local, CrashPayloadApp).sorted
    val native = NativeApps.crashPayload(files).collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}").sorted.toSeq
    val mr = MRJob.canonical(MRJob.run(spark, CrashPayloadApp, paths))
    assert(native === expected)
    assert(mr === expected)
    // Go len("¡hölá! plus ascii\n") = 21 bytes (3 two-byte chars), not 18
    assert(expected.exists(_.startsWith("c 21 21")), expected.mkString(";"))
  }

  test("tokenizer edge cases: empty, separators-only, unicode letters") {
    assert(GoTokens.split("").toSeq === Seq.empty)
    assert(GoTokens.split("  12 --- \n\t 99 ").toSeq === Seq.empty)
    // accented + CJK are Unicode letters (category L) for both Go's
    // unicode.IsLetter and Java's \p{L}; digits/underscores are not
    assert(GoTokens.split("café _niño_ 中文123日本語").toSeq ===
      Seq("café", "niño", "中文", "日本語"))
    // the oracle and the engine agree on an edge corpus
    val files = Seq(("f0", ""), ("f1", " -- 12 "), ("f2", "café 中文 café"))
    val out = SequentialOracle.run(files, WordCountApp)
    assert(out === Seq("café 2", "中文 1"))
  }

  test("tokenizer parity: Go FieldsFunc(!IsLetter) vs split regex on corpus") {
    // Character-level parity check across the whole corpus: the Scala
    // splitter (used by the oracle) and Spark's split() (used by the
    // native apps) must agree on total token count and distinct words.
    val scalaTokens = localFiles.iterator.flatMap(f => GoTokens.split(f._2)).toArray
    val files = MRJob.read(spark, pgPaths)
    import org.apache.spark.sql.functions._
    val sparkCount = files
      .select(explode(NativeApps.tokens(col("contents"))).as("t"))
      .count()
    assert(sparkCount === scalaTokens.length.toLong)
  }
}
