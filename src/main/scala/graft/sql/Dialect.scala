package graft.sql

/** SQL spelling helper for the SHARED-TEXT-BUILDER statements: one
  * builder function generates BOTH the Spark-SQL statement and its
  * DuckDB oracle from a single template, with this object supplying
  * the per-engine spellings of the constructs where the dialects
  * split (array HOF names, 1-based slicing, regex literal escaping,
  * table functions). q_sql_graph_pagerank proved the pattern
  * (statement and oracle from one text builder → drift impossible);
  * the round-18 faces (minhash candidates, BM25, communities, int8
  * quantize, phash near-dup) generalize it from one `div` knob to the
  * handful of spellings those statements need.
  *
  * Everything here is TEXT generation — the facade statements still
  * go through plain `spark.sql`/DuckDB parsing, so each face is
  * spec-pinned bit-equal to its DataFrame twin and oracle-checked by
  * the driver like any other query.
  */
final case class Dialect(spark: Boolean) {

  /** Regex string literal: Spark SQL string literals process
    * backslash escapes (one regex backslash must be written `\\`);
    * DuckDB's standard-SQL literals pass backslashes through.
    */
  def regexLit(re: String): String =
    if (spark) "'" + re.replace("\\", "\\\\") + "'"
    else "'" + re + "'"

  /** Tokenize on a regex, dropping empty tokens. */
  def tokens(col: String, re: String): String =
    if (spark) s"filter(split($col, ${regexLit(re)}), t -> t <> '')"
    else s"list_filter(regexp_split_to_array($col, ${regexLit(re)}), t -> t <> '')"

  def len(x: String): String = if (spark) s"size($x)" else s"len($x)"

  def transform(l: String, f: String): String =
    if (spark) s"transform($l, $f)" else s"list_transform($l, $f)"

  def arrayMin(x: String): String =
    if (spark) s"array_min($x)" else s"list_min($x)"

  def arrayMax(x: String): String =
    if (spark) s"array_max($x)" else s"list_max($x)"

  def filter(l: String, f: String): String =
    if (spark) s"filter($l, $f)" else s"list_filter($l, $f)"

  /** Join array elements as a string (Spark's array_join wants
    * ARRAY<STRING>; DuckDB's array_to_string stringifies any list —
    * the cast keeps non-string arrays, e.g. signature bands, equal).
    */
  def arrayJoin(arr: String, sep: String): String =
    if (spark) s"array_join(CAST($arr AS ARRAY<STRING>), '$sep')"
    else s"array_to_string($arr, '$sep')"

  /** 1-based, length-bounded array slice. */
  def slice1(arr: String, start1: String, n: Int): String =
    if (spark) s"slice($arr, $start1, $n)"
    else s"$arr[$start1 : ($start1) + ${n - 1}]"

  /** 1-based element access (Spark's `arr[i]` is 0-based — the trap
    * this helper exists to make unrepresentable).
    */
  def elemAt(arr: String, idx1: String): String =
    if (spark) s"element_at($arr, $idx1)" else s"$arr[$idx1]"

  /** Left fold of `+` over a DOUBLE list (identical fold order in both
    * engines — the float-discipline requirement).
    */
  def sumFoldDouble(l: String): String =
    if (spark) s"aggregate($l, CAST(0 AS DOUBLE), (a, b) -> a + b)"
    else s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $l), (a, b) -> a + b)"

  /** Derived table of one BIGINT column `alias` = 0..n-1. */
  def range0(n: Int, alias: String): String =
    if (spark) s"(SELECT explode(sequence(0, ${n - 1})) AS $alias)"
    else s"(SELECT CAST(unnest(range($n)) AS BIGINT) AS $alias)"

  /** 0..len(arr)-1 index list for per-element transforms. */
  def indices(arr: String): String =
    if (spark) s"sequence(0, ${len(arr)} - 1)"
    else s"range(${len(arr)})"

  /** Explode a list column to one row per element. */
  def explode(l: String, alias: String): String =
    if (spark) s"explode($l) AS $alias" else s"unnest($l) AS $alias"

  def xor(a: String, b: String): String =
    if (spark) s"($a ^ $b)" else s"xor($a, $b)"

  def shiftRight(x: String, n: String): String =
    if (spark) s"shiftright($x, $n)" else s"($x >> ($n))"

  /** 1..to inclusive as a list (DuckDB's range excludes its stop). */
  def seq1(to: String): String =
    if (spark) s"sequence(1, $to)" else s"range(1, ($to) + 1)"

  /** 0..n-1 as a list. */
  def range0List(n: Int): String =
    if (spark) s"sequence(0, ${n - 1})" else s"range($n)"

  /** Single-element array literal. */
  def array1(x: String): String = if (spark) s"array($x)" else s"[$x]"

  /** Multi-element array literal, one element per line. */
  def arrayOf(items: Seq[String], indent: String): String =
    if (spark) items.mkString(s"array(\n$indent", s",\n$indent", ")")
    else items.mkString(s"[\n$indent", s",\n$indent", "]")

  /** First 8 hex chars of md5($s) parsed as a BIGINT — the one hash
    * both engines evaluate identically (the ANSI-replayable MinHash
    * family's base hash). Spark parses the hex via conv(); DuckDB
    * (conv-less) folds the hex digits positionally.
    */
  def md5Head8(s: String): String =
    if (spark)
      s"CAST(conv(substring(md5(CAST($s AS BINARY)), 1, 8), 16, 10) AS BIGINT)"
    else
      s"""list_reduce(list_transform(range(8), i ->
         |        CAST(strpos('0123456789abcdef', substr(md5($s), i + 1, 1)) - 1
         |          AS BIGINT)),
         |        (a, b) -> a * 16 + b)""".stripMargin

  def intDiv: String = if (spark) "DIV" else "//"

  /** Read a parquet directory as a relation. */
  def parquet(path: String): String =
    if (spark) s"parquet.`$path`" else s"read_parquet('$path/*.parquet')"
}

object Dialect {
  val spark: Dialect = Dialect(spark = true)
  val duck: Dialect = Dialect(spark = false)
}
