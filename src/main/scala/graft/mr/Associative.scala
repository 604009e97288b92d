package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The associative fast path (SURVEY §7.3): when an app's reduce is a
  * fold over values with an associative+commutative merge, it can run
  * as a Spark `Aggregator` — map-side partial aggregation, so only one
  * small buffer per (key, partition) crosses the shuffle instead of
  * every value. The reference has no equivalent (it ships complete
  * value lists, `mr/worker.go:82-86`); at 100 TB this is the difference
  * between shuffling O(tokens) and O(distinct words x partitions).
  *
  * `MRGoldenSpec`/`PropertySpec` assert fast path ≡ holistic path.
  */
trait AssociativeMRApp[B] extends Serializable {
  def map(filename: String, contents: String): IterableOnce[KeyValue]
  def zero: B
  def lift(value: String): B
  def merge(a: B, b: B): B
  def finish(b: B): String
  def bufferEncoder: Encoder[B]
}

/** Word count with a Long count buffer. */
object WordCountFast extends AssociativeMRApp[Long] {
  def map(filename: String, contents: String): IterableOnce[KeyValue] =
    WordCountApp.map(filename, contents)
  def zero: Long = 0L
  def lift(value: String): Long = 1L
  def merge(a: Long, b: Long): Long = a + b
  def finish(b: Long): String = b.toString
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Inverted index with a Set[String] buffer (bounded by docs-per-word,
  * the same bound the holistic version has).
  */
object InvertedIndexFast extends AssociativeMRApp[Set[String]] {
  def map(filename: String, contents: String): IterableOnce[KeyValue] =
    InvertedIndexApp.map(filename, contents)
  def zero: Set[String] = Set.empty
  def lift(value: String): Set[String] = Set(value)
  def merge(a: Set[String], b: Set[String]): Set[String] = a ++ b
  def finish(b: Set[String]): String = {
    val docs = b.toArray.sorted
    s"${docs.length} ${docs.mkString(",")}"
  }
  def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
}

object AssociativeMRJob {

  private class AppAggregator[B](app: AssociativeMRApp[B])
      extends Aggregator[KeyValue, B, String] {
    def zero: B = app.zero
    def reduce(b: B, kv: KeyValue): B = app.merge(b, app.lift(kv.value))
    def merge(a: B, b: B): B = app.merge(a, b)
    def finish(b: B): String = app.finish(b)
    def bufferEncoder: Encoder[B] = app.bufferEncoder
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** scan -> flatMap(map) -> partial-aggregated reduce. */
  def run[B](
      spark: SparkSession,
      app: AssociativeMRApp[B],
      paths: Seq[String]): Dataset[KeyValue] = {
    import spark.implicits._
    val files = MRJob.read(spark, paths).as[(String, String)]
    val mapped = files.flatMap { case (f, c) => app.map(f, c) }
    mapped
      .groupByKey(_.key)
      .agg(new AppAggregator(app).toColumn.name("value"))
      .map { case (k, v) => KeyValue(k, v) }
  }
}
