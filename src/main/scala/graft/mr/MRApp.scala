package graft.mr

/** The universal record type of the reference engine: both key and
  * value are strings (reference: `mr/worker.go:17-20`). Numeric results
  * are stringified by the apps themselves.
  */
case class KeyValue(key: String, value: String)

/** The reference's entire "query language" is a (Map, Reduce) function
  * pair loaded as a Go plugin (`mr/worker.go:48-49`,
  * `main/mrworker.go:32-49`). This trait is the JVM analog: `map` is a
  * UDTF (one whole file in, many KV pairs out) and `reduce` is a
  * holistic per-key aggregate.
  *
  * Scale deviation (deliberate): the reference materializes the full
  * value list per key (`mr/worker.go:225-230`) — fine at 3 MB, fatal at
  * 100 TB. Our contract hands `reduce` an Iterator so Spark's
  * sort-based `mapGroups` can stream values; apps that genuinely need
  * the whole list (e.g. sorted join) call `.toSeq` themselves and pay
  * only for their own keys.
  *
  * Value ordering is unspecified, exactly as in the reference (Go's
  * `sort.Sort` is unstable, so intra-key value order was never
  * deterministic there either); order-sensitive apps must sort, as
  * `crash.go:45-55` does.
  */
trait MRApp extends Serializable {
  def map(filename: String, contents: String): IterableOnce[KeyValue]
  def reduce(key: String, values: Iterator[String]): String
}

/** Word splitter with the reference's exact semantics: split on runs of
  * any non-letter rune, drop empty tokens (`mrapps/wc.go:19-32`,
  * `strings.FieldsFunc` + `unicode.IsLetter`). Java's `\p{L}` and Go's
  * `unicode.IsLetter` both track the Unicode Letter category.
  */
object GoTokens {
  private val sep = "[^\\p{L}]+"
  def split(contents: String): Array[String] =
    contents.split(sep).filter(_.nonEmpty)
  /** The same separator for use in SQL/DataFrame `split()` calls. */
  val sepRegex: String = sep
}

/** Word count (`mrapps/wc.go`): tokenize, emit (word, "1"), count. */
object WordCountApp extends MRApp {
  def map(filename: String, contents: String): IterableOnce[KeyValue] =
    GoTokens.split(contents).iterator.map(KeyValue(_, "1"))
  def reduce(key: String, values: Iterator[String]): String =
    values.size.toString
}

/** Inverted index (`mrapps/indexer.go`): per-document distinct words →
  * (word, doc); reduce emits "<count> <doc1,doc2,...>" with docs
  * sorted.
  */
object InvertedIndexApp extends MRApp {
  def map(filename: String, contents: String): IterableOnce[KeyValue] =
    GoTokens.split(contents).distinct.iterator.map(KeyValue(_, filename))
  def reduce(key: String, values: Iterator[String]): String = {
    val docs = values.toArray.sorted
    s"${docs.length} ${docs.mkString(",")}"
  }
}

/** The crash-test payload (`mrapps/crash.go:34-55` /
  * `mrapps/nocrash.go:29-47`, minus the fault injection): map emits 4
  * fixed keys per file; reduce is an ordered string-join — the
  * reference's one genuinely order-sensitive aggregate.
  */
object CrashPayloadApp extends MRApp {
  // Go's len() counts BYTES (`mrapps/crash.go:40,43`); UTF-8 octet
  // length reproduces that for non-ASCII text where String.length
  // (UTF-16 units) and code-point counts both diverge. NativeApps
  // mirrors this with octet_length().
  private def utf8Len(s: String): Int =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
  def map(filename: String, contents: String): IterableOnce[KeyValue] =
    Seq(
      KeyValue("a", filename),
      KeyValue("b", utf8Len(filename).toString),
      KeyValue("c", utf8Len(contents).toString),
      KeyValue("d", "xyzzy"))
  def reduce(key: String, values: Iterator[String]): String =
    values.toArray.sorted.mkString(" ")
}

/** App registry by name — the JVM analog of the reference's
  * `plugin.Open` + `Lookup("Map")/Lookup("Reduce")` dynamic loading
  * (`main/mrworker.go:32-49`).
  */
object MRApps {
  val registry: Map[String, MRApp] = Map(
    "wc" -> WordCountApp,
    "indexer" -> InvertedIndexApp,
    "crashpayload" -> CrashPayloadApp)
  def byName(name: String): MRApp =
    registry.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown MR app '$name'; known: ${registry.keys.mkString(",")}"))
}
