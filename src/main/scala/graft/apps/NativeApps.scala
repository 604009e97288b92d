package graft.apps

import graft.mr.GoTokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canned reference apps re-expressed as native DataFrame ops —
  * fully Catalyst-visible (predicate pushdown, partial aggregation,
  * whole-stage codegen), unlike the opaque lambda path in
  * [[graft.mr.MRJob]]. The golden test tier asserts both paths produce
  * byte-identical output.
  *
  * Scale: `split`+`explode`+`groupBy.count` gets map-side partial
  * aggregation for free (HashAggregate partial/final), which the
  * reference explicitly lacks (full value lists cross its shuffle,
  * `mr/worker.go:82-86`). At 100 TB of text this is the difference
  * between shipping one long per (word, partition) and shipping every
  * token.
  */
object NativeApps {

  /** Tokenize a text column with the reference's splitter semantics:
    * split on runs of non-letters, drop empties.
    */
  def tokens(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(text, GoTokens.sepRegex), t => length(t) > 0)

  /** Word count over (filename, contents) rows → (key, value) strings,
    * matching `mrapps/wc.go` output exactly.
    */
  def wordCount(files: DataFrame): DataFrame =
    files
      .select(explode(tokens(col("contents"))).as("key"))
      .groupBy("key")
      .agg(count(lit(1)).cast("string").as("value"))

  /** Inverted index over (filename, contents) rows, matching
    * `mrapps/indexer.go`: value = "<ndocs> <doc1,doc2,...>" with docs
    * sorted lexicographically.
    */
  def invertedIndex(files: DataFrame): DataFrame =
    files
      .select(col("filename"), explode(tokens(col("contents"))).as("key"))
      .distinct()
      .groupBy("key")
      .agg(sort_array(collect_set(col("filename"))).as("docs"))
      .select(
        col("key"),
        concat_ws(" ",
          size(col("docs")).cast("string"),
          array_join(col("docs"), ",")).as("value"))

  /** Crash-test payload (`mrapps/crash.go:34-55`): 4 fixed keys per
    * file; reduce = ordered string-join — implemented as
    * sort_array(collect_list(...)), the one genuinely order-sensitive
    * aggregate in the reference surface.
    */
  def crashPayload(files: DataFrame): DataFrame =
    files
      .select(explode(array(
        struct(lit("a").as("key"), col("filename").as("v")),
        // octet_length = UTF-8 bytes, matching Go len() in crash.go and
        // CrashPayloadApp.utf8Len (length() would count code points)
        struct(lit("b").as("key"), octet_length(col("filename")).cast("string").as("v")),
        struct(lit("c").as("key"), octet_length(col("contents")).cast("string").as("v")),
        struct(lit("d").as("key"), lit("xyzzy").as("v")))).as("kv"))
      .select(col("kv.key").as("key"), col("kv.v").as("v"))
      .groupBy("key")
      .agg(array_join(sort_array(collect_list(col("v"))), " ").as("value"))
}
