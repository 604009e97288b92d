package graft.mr

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Runs an [[MRApp]] as an idiomatic Spark job.
  *
  * The whole reference engine (coordinator, RPC, task queues, `mr-i-*`
  * intermediate files, the standalone sort phase, the 10 s straggler
  * requeue — `mr/coordinator.go`, `mr/worker.go`) collapses to:
  *
  * {{{
  *   wholetext scan -> flatMap(app.map) -> groupByKey -> mapGroups(app.reduce)
  * }}}
  *
  * Spark's scheduler replaces the pull-based FIFO coordinator, the
  * sort-based shuffle replaces the JSON-lines intermediate files plus
  * the explicit "sort" task type, task retry + the file-commit protocol
  * replace the 10 s requeue loop, and — unlike the reference's
  * at-least-once `O_APPEND` shuffle (`mr/worker.go:95`, the README's
  * admitted flake) — output is exactly-once.
  *
  * Scale notes:
  *   - one whole file = one map record (reference semantics,
  *     `mr/coordinator.go:344-346`); works at any file count, but a
  *     single multi-GB file will not split. That limitation is inherent
  *     to the (filename, contents) UDTF contract; the relational /
  *     LLM operators in `graft.ops` / `graft.llm` use splittable
  *     parquet instead.
  *   - `groupByKey.mapGroups` is sort-based: values stream through the
  *     reduce iterator without materializing per-key lists, and Spark
  *     spills to disk when a partition exceeds memory.
  */
object MRJob {

  /** Whole-file source: one row per file, schema
    * (filename string, contents string). `filename` is the decoded
    * basename, so results don't depend on where the corpus is mounted
    * and names with spaces / non-ASCII come back verbatim
    * (`input_file_name()` returns a URL-encoded URI; `%XX` escapes are
    * undone here, with `+` protected first since in a URI path it is a
    * literal plus, not form-encoded space).
    *
    * Contract: basenames must be unique across `paths` — the reference
    * worker keys records by filename alone (`mr/worker.go:62-66`), so
    * two inputs sharing a basename in different directories would merge
    * into one map record, same as copying both into the reference's
    * flat working directory would.
    */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    spark.read
      .option("wholetext", "true")
      .text(paths: _*)
      .select(
        url_decode(regexp_replace(
          regexp_extract(input_file_name(), "([^/]+)$", 1),
          "\\+", "%2B")).as("filename"),
        col("value").as("contents"))
  }

  /** Run the full map → shuffle → reduce pipeline; result is one
    * KeyValue row per distinct key, hash-partitioned by key into
    * `nReduce` partitions (the reference's `NReduce` bucket count,
    * `main/mrcoordinator.go:23` — so `writeText` emits one part file
    * per bucket like `mr-out-<b>`; Spark uses Murmur3 where the
    * reference used FNV-1a, so bucket *assignment* differs but
    * grouping semantics are identical).
    */
  def run(
      spark: SparkSession,
      app: MRApp,
      paths: Seq[String],
      nReduce: Int = 10): Dataset[KeyValue] = {
    import spark.implicits._
    val files = read(spark, paths).as[(String, String)]
    val mapped = files.flatMap { case (f, c) => app.map(f, c) }
    // One shuffle total: hash-partition by key into nReduce buckets,
    // sort within each (sort-based shuffle spills when needed), then
    // run-length group — exactly the reference's partition/sort/reduce
    // phases (mr/worker.go:77-86,134-180,215-236) as a single Spark
    // stage. groupByKey on the lambda key would re-shuffle on top of
    // the repartition; this shape doesn't.
    mapped
      .repartition(nReduce, col("key"))
      .sortWithinPartitions("key")
      .mapPartitions(it => reduceRuns(app, it))
  }

  /** Streams a key-sorted iterator, applying `reduce` once per key run.
    * Values are handed to the app as a lazy iterator; any unconsumed
    * remainder is drained before moving to the next key.
    */
  private def reduceRuns(
      app: MRApp, it: Iterator[KeyValue]): Iterator[KeyValue] =
    new Iterator[KeyValue] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): KeyValue = {
        val key = buf.head.key
        val values = new Iterator[String] {
          def hasNext: Boolean = buf.hasNext && buf.head.key == key
          def next(): String = buf.next().value
        }
        val out = KeyValue(key, app.reduce(key, values))
        while (values.hasNext) values.next() // drain unconsumed tail
        out
      }
    }

  /** Reference sink format: `"key value"` lines (`mr/worker.go:233`),
    * one part file per shuffle partition (≈ the reference's
    * `mr-out-<bucket>` files).
    */
  def writeText(result: Dataset[KeyValue], outDir: String): Unit =
    result
      .select(concat_ws(" ", col("key"), col("value")))
      .write.mode("overwrite").text(outDir)

  /** Canonicalized output for golden comparison, mirroring the
    * reference harness's `sort | grep . | cmp` (`main/test-mr.sh:103`):
    * all lines, globally sorted, blanks dropped.
    */
  def canonical(result: Dataset[KeyValue]): Seq[String] =
    result
      .collect()
      .iterator
      .map(kv => s"${kv.key} ${kv.value}")
      .filter(_.nonEmpty)
      .toSeq
      .sorted
}

/** In-process reimplementation of the sequential oracle
  * (`main/mrsequential.go:28-90`): map everything, one global sort by
  * key, run-length group, reduce. Used by the golden/differential test
  * tier as ground truth — never by the engine itself.
  */
object SequentialOracle {
  def run(files: Seq[(String, String)], app: MRApp): Seq[String] = {
    val kvs = files.iterator
      .flatMap { case (f, c) => app.map(f, c) }
      .toArray
      .sortBy(_.key)
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < kvs.length) {
      var j = i
      while (j < kvs.length && kvs(j).key == kvs(i).key) j += 1
      val values = kvs.slice(i, j).iterator.map(_.value)
      out += s"${kvs(i).key} ${app.reduce(kvs(i).key, values)}"
      i = j
    }
    out.result()
  }
}
