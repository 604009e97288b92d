package graft.llm

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque `binary`
  * columns with typed metadata, decoded / feature-extracted /
  * frame-sampled in distributed batch passes.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * STUB (deterministic fake pixels derived from the bytes) — but the
  * Spark-side plumbing is real and tested: binary column handling,
  * schema of the decoded batch, mapPartitions batch shape (one codec
  * init per partition, streamed rows), and the explode-to-frames
  * layout a video pipeline uses.
  *
  * The testdata has no binary table, so `documents.text` bytes stand in
  * for the media payload (`encode(text, 'utf-8')`).
  *
  * Scale: decode via `mapPartitions` keeps codec initialization
  * per-partition (not per-row); frame explosion multiplies rows before
  * a narrow projection, so it stays pipelined inside the same stage —
  * no shuffle anywhere. `mapPartitions` here is the JVM analog of the
  * `mapInPandas` contract (one stream of batches per partition,
  * schema-typed output): a PySpark deployment swaps the stub for a
  * Pandas decode function with the identical schema and batch shape,
  * and nothing else in the plan changes.
  */
object Multimodal {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** documents -> media table: (doc_id, media blob, n_bytes). */
  def asMedia(d: DataFrame): DataFrame =
    d.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      octet_length(encode(col("text"), "utf-8")).cast("bigint").as("n_bytes"))

  /** Deterministic metadata "extraction" from the payload (stands in
    * for a header parse — width/height/frames derived arithmetically
    * from the byte length so the DuckDB oracle can mirror it).
    */
  def mediaMeta(d: DataFrame): DataFrame =
    asMedia(d).select(
      col("doc_id"),
      col("n_bytes"),
      (col("n_bytes") % 640 + 16).cast("bigint").as("width"),
      (col("n_bytes") * 7 % 480 + 16).cast("bigint").as("height"),
      (col("n_bytes") % 30 + 1).cast("bigint").as("n_frames"))

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 + 16 AS BIGINT) AS width,
      |  CAST(octet_length(encode(text)) * 7 % 480 + 16 AS BIGINT) AS height,
      |  CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS n_frames
      |FROM documents""".stripMargin

  /** Frame sampling: one row per sampled frame with a deterministic
    * per-frame feature (stands in for a decoded-frame statistic).
    */
  def frameSample(d: DataFrame): DataFrame =
    mediaMeta(d)
      .select(col("doc_id"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        (col("n_bytes") * (col("frame_idx") + 3) % 255).cast("bigint")
          .as("frame_feature"))

  val frameSampleSql: String =
    """SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(n_bytes * (frame_idx + 3) % 255 AS BIGINT) AS frame_feature
      |FROM (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    unnest(generate_series(0,
      |      octet_length(encode(text)) % 30)) AS frame_idx
      |  FROM documents)""".stripMargin

  /** Inference batching: assign media to contiguous byte-budget batches
    * (doc_id order, 64 KB per batch) and report per-batch stats — the
    * serving-side sibling of Curation.packSequences: GPU inference
    * wants fixed-size payload batches, and the assignment must be a
    * pure function of the data (reproducible across runs).
    *
    * Scale note: the cumulative sum here is a GLOBAL ordered window —
    * fine for a demo corpus, a single-reducer bottleneck at 100 TB. A
    * production batcher partitions the window by shard (as
    * packSequences does by lang): batches stay contiguous within each
    * shard and the shards pack independently.
    */
  def inferenceBatches(d: DataFrame, budget: Long = 65536L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    asMedia(d)
      .withColumn("cum_before", coalesce(sum("n_bytes").over(w), lit(0L)))
      .select(col("doc_id"), col("n_bytes"),
        expr(s"CAST(cum_before DIV $budget AS BIGINT)").as("batch_id"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_items"), sum("n_bytes").as("batch_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  val inferenceBatchesSql: String =
    """SELECT batch_id, count(*) AS n_items,
      |  CAST(sum(n_bytes) AS BIGINT) AS batch_bytes,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM (
      |  SELECT doc_id, n_bytes,
      |    CAST(coalesce(sum(n_bytes) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      // 65536 AS BIGINT) AS batch_id
      |  FROM (SELECT doc_id,
      |          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |        FROM documents))
      |GROUP BY batch_id""".stripMargin

  /** Decoded-image batch record (the schema a real decoder would emit). */
  case class DecodedImage(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      pixels: Array[Byte])

  /** STUB decode kernel: a real implementation would initialize a codec
    * (libjpeg/ffmpeg) once per partition here and decode each blob.
    * The stub emits deterministic fake pixels (payload bytes cycled to
    * width*height*channels) so the plumbing — partition-wise batching,
    * binary in / struct out, schema — is fully exercised and testable.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[DecodedImage] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec init" happens here (stubbed)
        rows.map { case (id, bytes) =>
          val w = (bytes.length % 64) + 8
          val h = ((bytes.length * 7) % 48) + 8
          val c = 3
          val px = new Array[Byte](w * h * c)
          var i = 0
          while (i < px.length) {
            px(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length)
            i += 1
          }
          DecodedImage(id, w, h, c, px)
        }
      }
  }

  /** Nearest-neighbor resize over decoded pixel buffers — the
    * feature-extraction-adjacent transform a vision pipeline runs after
    * decode. Pure per-row array math (no codec needed), so unlike the
    * decode kernel this is NOT a stub.
    */
  def resize(
      spark: SparkSession,
      images: Dataset[DecodedImage],
      outW: Int,
      outH: Int): Dataset[DecodedImage] = {
    import spark.implicits._
    images.map { img =>
      val px = new Array[Byte](outW * outH * img.channels)
      var y = 0
      while (y < outH) {
        val sy = y * img.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * img.width / outW
          var c = 0
          while (c < img.channels) {
            px((y * outW + x) * img.channels + c) =
              img.pixels((sy * img.width + sx) * img.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      DecodedImage(img.doc_id, outW, outH, img.channels, px)
    }
  }

  /** Aggregate feature over decoded images (mean pixel value) — shows
    * decoded batches flowing back into relational ops.
    */
  def decodedStats(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    decodeImages(spark, asMedia(d))
      .map(img => (img.doc_id, img.width, img.height,
        img.pixels.foldLeft(0L)((a, b) => a + (b & 0xff)) / img.pixels.length))
      .toDF("doc_id", "width", "height", "mean_pixel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_batches" -> ((s, d) => inferenceBatches(docs(s, d))),
    "q_multimodal_meta" -> ((s, d) => mediaMeta(docs(s, d))),
    "q_multimodal_frames" -> ((s, d) => frameSample(docs(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_batches" -> inferenceBatchesSql,
    "q_multimodal_meta" -> mediaMetaSql,
    "q_multimodal_frames" -> frameSampleSql)
}
