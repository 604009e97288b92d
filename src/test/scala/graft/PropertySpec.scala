package graft

import graft.mr._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tier (SURVEY §5 port plan tier 3). Pure-Scala properties of
  * the app semantics run on generated corpora through the sequential
  * oracle (scalacheck generators, fixed seeds — scalatestplus isn't on
  * the offline classpath, so sampling is driven manually); one
  * Spark-backed case asserts associative fast path ≡ holistic path.
  */
class PropertySpec extends SparkSpec {

  private val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
  private val doc = Gen.listOf(Gen.oneOf(word, Gen.const("  "), Gen.const("42")))
    .map(_.mkString(" "))
  private val corpus: Gen[Seq[(String, String)]] =
    Gen.chooseNum(1, 6).flatMap { n =>
      Gen.listOfN(n, doc).map(_.zipWithIndex.map { case (c, i) => (s"f$i", c) })
    }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("wordcount counts sum to total token count (30 random corpora)") {
    samples(corpus, 30).foreach { files =>
      val out = SequentialOracle.run(files, WordCountApp)
      val totalCounted = out.map(_.split(" ").last.toLong).sum
      val totalTokens = files.map(f => GoTokens.split(f._2).length.toLong).sum
      assert(totalCounted === totalTokens, s"corpus: $files")
    }
  }

  test("inverted index round-trip: (word, doc) listed iff doc contains word") {
    samples(corpus, 30).foreach { files =>
      val out = SequentialOracle.run(files, InvertedIndexApp)
      val listed = out.flatMap { line =>
        val Array(word, rest) = line.split(" ", 2)
        rest.split(" ", 2)(1).split(",").map(d => (word, d))
      }.toSet
      val truth = files.flatMap { case (f, c) =>
        GoTokens.split(c).distinct.map(w => (w, f))
      }.toSet
      assert(listed === truth, s"corpus: $files")
    }
  }

  test("crash-payload reduce is order-insensitive (sorts values)") {
    val rnd = new scala.util.Random(7)
    samples(Gen.nonEmptyListOf(word), 30).foreach { values =>
      val a = CrashPayloadApp.reduce("k", values.iterator)
      val b = CrashPayloadApp.reduce("k", rnd.shuffle(values).iterator)
      assert(a === b)
    }
  }

  test("associative fast path == holistic path (wc + indexer, pg sample)") {
    val pg = Seq(
      "/root/reference/main/pg-being_ernest.txt",
      "/root/reference/main/pg-metamorphosis.txt")
    def canon(ds: org.apache.spark.sql.Dataset[KeyValue]): Seq[String] =
      MRJob.canonical(ds)
    assert(
      canon(AssociativeMRJob.run(spark, WordCountFast, pg)) ===
        canon(MRJob.run(spark, WordCountApp, pg)))
    assert(
      canon(AssociativeMRJob.run(spark, InvertedIndexFast, pg)) ===
        canon(MRJob.run(spark, InvertedIndexApp, pg)))
  }
}
