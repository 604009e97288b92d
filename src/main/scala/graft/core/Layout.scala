package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Physical-layout helpers. */
object Layout {

  /** Hash-spread `df` across the session's shuffle parallelism before
    * compute-heavy per-row or per-pair work (signature kernels, pair
    * joins, n-gram explodes).
    *
    * Why: a parquet file is only as parallel as its row groups — a
    * single-row-group file scans as ONE task, and everything up to the
    * first exchange (the whole map stage: kernels, explodes, broadcast
    * join probes) inherits that parallelism. One narrow O(corpus)
    * shuffle here buys full-width execution for the O(pairs)/O(tokens)
    * work that follows. On a large cluster where the scan already has
    * thousands of splits the exchange is redundant but harmless by the
    * same ratio: it costs one pass over the rows it feeds, while the
    * downstream work it spreads is quadratic (pairs) or fan-out
    * (explode) in those rows.
    *
    * EXPLICIT partition count (r18): `repartition(col)` alone emits a
    * REPARTITION_BY_COL exchange, which AQE's byte-based coalescing is
    * allowed to collapse — and at bench scale it did, folding every
    * sub-1 MB corpus back to 1-2 partitions and running the kernels it
    * exists to parallelize on ONE task (r18 JobProf: the minhash-calib
    * scoring chain as a single 5 s task on a 32-core box). Passing the
    * session's shuffle-partition count pins a REPARTITION_BY_NUM
    * exchange, which coalescing must respect. The count is the same
    * one the plain form would start from — the deployment-scaled conf,
    * not a local constant; AQE keeps every other right to re-plan
    * (joins, skew) downstream. Bytes are a bad proxy for the kernel /
    * pair work above this exchange — that is the one fact AQE cannot
    * see and this helper encodes.
    */
  def spread(df: DataFrame, key: String): DataFrame =
    spread(df, col(key))

  def spread(df: DataFrame, key: Column): DataFrame =
    df.repartition(shufflePartitions(df.sparkSession), key)

  /** The session's shuffle-partition count: the string conf when it
    * parses, else the typed SQLConf value — platforms that set the
    * string conf non-numeric (e.g. "auto") would otherwise turn every
    * call site into a NumberFormatException.
    */
  def shufflePartitions(spark: org.apache.spark.sql.SparkSession): Int =
    scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(
        org.apache.spark.sql.graftbridge.Bridge.numShufflePartitions(spark))

  /** Default shard count shared by `Sampling.shardShuffle`,
    * [[writeShards]], `Pipeline.curateFull` and their oracles.
    */
  val DefaultShards = 8

  /** The multiplier in the two-hex-char mix below — one constant so
    * [[contentShard]] and [[contentShardSql]] cannot drift.
    */
  private val ShardMult = 131

  /** The shared content-hash shard bucket: a pure function of the text
    * used identically by [[graft.llm.Sampling.shardShuffle]] (the
    * assignment operator), [[writeShards]] (its materialization), and
    * [[graft.llm.Pipeline.curateFull]] (the rollup) — one definition so
    * the three can never desynchronize.
    */
  def contentShard(textCol: Column, nShards: Int): Column = {
    import org.apache.spark.sql.functions.{ascii, lit, md5, pmod, substring}
    val h = md5(textCol.cast("binary"))
    pmod(ascii(substring(h, 1, 1)) * ShardMult + ascii(substring(h, 2, 1)),
      lit(nShards))
  }

  /** DuckDB-side spelling of [[contentShard]], generated from the same
    * constants — every oracle that mentions the shard interpolates
    * this fragment instead of re-spelling the formula, so changing
    * `nShards` or the mix cannot desync operator from oracle. (All
    * operands nonnegative, so DuckDB `%` == Spark `pmod`.)
    */
  def contentShardSql(
      textExpr: String, nShards: Int = DefaultShards): String =
    s"(ascii(substr(md5($textExpr), 1, 1)) * $ShardMult + " +
      s"ascii(substr(md5($textExpr), 2, 1))) % $nShards"

  def writeShards(
      df: DataFrame, path: String, textCol: String = "text",
      nShards: Int = DefaultShards): Unit = {
    import org.apache.spark.sql.functions.md5
    // RANGE partition on the shard value: a hash repartition would
    // murmur the values 0..n-1 mod n, colliding several shards into
    // one task and leaving others empty (skewed writes); ranges map
    // the n values 1:1 onto n tasks.
    //
    // sort prefix = the partition column: the dynamic-partition writer
    // requires child ordering on it and would otherwise inject its own
    // (unstable) sort, destroying the in-shard hash order. sort_key
    // stays in the output so readers (and the spec) can verify order.
    df.withColumn("sort_key", md5(col(textCol).cast("binary")))
      .withColumn("shard", contentShard(col(textCol), nShards))
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "sort_key")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Z-order (Morton) clustering for multi-dimensional data skipping:
    * interleave the low `bits` of each (non-negative integral) column
    * into one key, range-partition and sort by it, so every output
    * file's min/max footer stats are TIGHT on every dimension — a scan
    * filtering on ANY of the columns can skip most files. Plain
    * single-column sort gives that for one dimension only; at 100 TB
    * the difference is reading one file vs the whole table for the
    * second predicate column.
    *
    * Columns are clamped into [0, 2^bits); callers with other domains
    * pre-normalize (e.g. rank or scale). The `_z` key is dropped from
    * the result.
    */
  def zorder(
      df: DataFrame, cols: Seq[String], bits: Int = 16,
      partitions: Int = 0): DataFrame = {
    require(cols.nonEmpty && bits * cols.length <= 62,
      s"need cols and bits*n <= 62, got $bits x ${cols.length}")
    val max = (1L << bits) - 1
    val clamped = cols.map(c =>
      org.apache.spark.sql.functions.least(
        org.apache.spark.sql.functions.greatest(col(c).cast("long"),
          org.apache.spark.sql.functions.lit(0L)),
        org.apache.spark.sql.functions.lit(max)))
    val z = (0 until bits).flatMap { b =>
      clamped.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.functions.shiftleft(
          org.apache.spark.sql.functions.shiftright(c, b)
            .bitwiseAND(org.apache.spark.sql.functions.lit(1L)),
          b * cols.length + i)
      }
    }.reduce(_.bitwiseOR(_))
    val keyed = df.withColumn("_z", z)
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("_z"))
      else keyed.repartitionByRange(col("_z"))
    ranged.sortWithinPartitions("_z").drop("_z")
  }

  /** Write-audit-publish: stage a snapshot, run the caller's audit
    * over the STAGED files, and only then expose it to readers by
    * publishing a NEW `current-<seq>` pointer file — the governance
    * pattern (Iceberg WAP without a table format) that makes "a bad
    * snapshot was never visible" a property of the layout instead of
    * a hope. On violations the staging dir is removed and the
    * previous pointer is untouched; readers resolving through
    * [[readCurrent]] never see a partial or failed snapshot. Each
    * publish gets a fresh version directory, so a reader holding the
    * old version keeps a consistent view (no in-place overwrite).
    *
    * Pointer-swap atomicity (the crash-window argument): the pointer
    * is a monotonically-versioned file `current-<seq>` and readers
    * resolve the max seq. Publishing is create(`_current_tmp_<seq>`)
    * then rename to the NEW name `current-<seq>` — both steps only
    * ever ADD a resolvable pointer; there is no delete of the live
    * pointer anywhere on the publish path, hence no window where a
    * reader finds the table pointer-less. A crash before the rename
    * leaves the old pointer set (old view); after it, old + new (new
    * view). Both renames' return values are checked; a false
    * (e.g. a stale `v_<version>` left by a previous crashed publish)
    * aborts with Left and the previous pointer still serves. Writers
    * are assumed not to race on the SAME version string (Iceberg-style
    * single-committer discipline); concurrent distinct versions each
    * publish a complete pointer and the max wins.
    *
    * Superseded pointers are RETAINED by default — they are the
    * snapshot log that [[readAt]]/[[snapshots]] time-travel through
    * (one tiny file per publish; Iceberg keeps its metadata history
    * the same way). Passing `retainSnapshots = n` expires history on
    * the way out: after the new pointer is visible, all but the
    * newest n pointers AND their version directories are deleted
    * (newest-first, so the live pointer is never in the prune set;
    * losing the cleanup to a crash is benign — readers take the max,
    * and the next retained publish re-prunes). Expiry only narrows
    * the time-travel window; it never touches the current view.
    *
    * Returns Right(publishedPath) or Left(violations).
    */
  def writeAuditPublish(
      df: DataFrame, root: String, version: String,
      audit: DataFrame => Seq[String],
      retainSnapshots: Int = Int.MaxValue): Either[Seq[String], String] = {
    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val staging = s"$root/_staging_$version"
    val finalDir = s"$root/v_$version"
    df.write.mode("overwrite").parquet(staging)
    val violations = audit(spark.read.parquet(staging))
    if (violations.nonEmpty) {
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      Left(violations)
    } else if (!fs.rename(new org.apache.hadoop.fs.Path(staging),
        new org.apache.hadoop.fs.Path(finalDir))) {
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      Left(Seq(s"publish_rename_failed: $staging -> $finalDir " +
        "(stale version dir from a crashed publish?)"))
    } else {
      val seq = 1L + currentPointers(fs, root).map(_._1).foldLeft(0L)(math.max)
      val tmp = new org.apache.hadoop.fs.Path(s"$root/_current_tmp_$seq")
      val out = fs.create(tmp, true)
      out.write(s"v_$version".getBytes("UTF-8"))
      out.close()
      val ptr = new org.apache.hadoop.fs.Path(s"$root/current-$seq")
      if (!fs.rename(tmp, ptr)) {
        fs.delete(tmp, false)
        Left(Seq(s"pointer_rename_failed: current-$seq"))
      } else {
        // expire history only now that the new pointer resolves, and
        // only when the caller opted into a bounded snapshot window
        if (retainSnapshots != Int.MaxValue) {
          val expired = currentPointers(fs, root).sortBy(-_._1)
            .drop(math.max(1, retainSnapshots))
          expired.foreach { case (_, ptr) =>
            val in = fs.open(ptr)
            val v = new String(
              org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
              "UTF-8").trim
            in.close()
            fs.delete(ptr, false)
            fs.delete(new org.apache.hadoop.fs.Path(s"$root/$v"), true)
          }
        }
        Right(finalDir)
      }
    }
  }

  /** List (seq, path) for every `current-<seq>` pointer under root. */
  private def currentPointers(
      fs: org.apache.hadoop.fs.FileSystem,
      root: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("current-"))
      .flatMap { s =>
        val tail = s.getPath.getName.stripPrefix("current-")
        scala.util.Try(tail.toLong).toOption.map(n => (n, s.getPath))
      }
  }

  /** The snapshot log: (seq, version-dir name) for every retained
    * pointer under root, ascending — the table's queryable history.
    * Each entry is readable via [[readAt]] until expired by a
    * `retainSnapshots` publish.
    */
  def snapshots(
      spark: org.apache.spark.sql.SparkSession,
      root: String): Seq[(Long, String)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    currentPointers(fs, root).sortBy(_._1).map { case (seq, ptr) =>
      val in = fs.open(ptr)
      val v = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      in.close()
      (seq, v)
    }
  }

  /** TIME-TRAVEL read: resolve pointer seq exactly — the view a reader
    * at publish `seq` saw, unchanged by any number of later publishes
    * (later publishes only ADD pointers; version dirs are immutable).
    * Fails if `seq` was never published or has been expired by a
    * `retainSnapshots` publish.
    */
  def readAt(
      spark: org.apache.spark.sql.SparkSession, root: String,
      seq: Long): DataFrame = {
    val snaps = snapshots(spark, root)
    val v = snaps.collectFirst { case (s, ver) if s == seq => ver }
    require(v.nonEmpty,
      s"snapshot seq=$seq not found under $root " +
        s"(retained: ${snaps.map(_._1).mkString(",")})")
    spark.read.parquet(s"$root/${v.get}")
  }

  /** Resolve the newest `current-<seq>` pointer written by
    * [[writeAuditPublish]] (max seq wins; see the atomicity note there).
    */
  def readCurrent(
      spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    val snaps = snapshots(spark, root)
    require(snaps.nonEmpty, s"no current-<seq> pointer under $root")
    spark.read.parquet(s"$root/${snaps.last._2}")
  }

  /** Small-file compaction (the OPTIMIZE-style table-maintenance pass):
    * rewrite a parquet directory into ceil(totalBytes / targetBytes)
    * files. Streaming sinks and fine-grained incremental writes leave
    * thousands of KB-sized files; at 100 TB that's metadata pressure on
    * the driver (one FileStatus + footer per file at planning time) and
    * a scan whose task count is file-bound, not data-bound. Sizing from
    * the ACTUAL on-disk byte total (not a row-count guess) keeps output
    * files near the target regardless of row width or compression.
    *
    * `round_robin` (repartition(n) without keys) spreads rows evenly
    * across output files with NO meaningful shuffle key — correct for
    * pure compaction, where layout (partitioning/order) is re-imposed
    * by [[zorder]]/[[writeShards]] afterwards if wanted.
    *
    * Returns (filesBefore, filesAfter, totalBytes).
    */
  def compactDir(
      spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetBytes: Long = 128L << 20): (Int, Int, Long) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    def parquetFiles(dir: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val in = parquetFiles(inDir)
    val totalBytes = in.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    (in.length, parquetFiles(outDir).length, totalBytes)
  }
}
