package graft.llm

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque `binary`
  * columns with typed metadata, decoded / feature-extracted /
  * frame-sampled in distributed batch passes.
  *
  * The decode kernel is REAL: [[BmpCodec]] parses uncompressed 24-bit
  * BMP (the one raster format needing no native codec) inside
  * `mapPartitions` — binary in, typed struct out, one potential codec
  * init per partition. Richer formats (JPEG/audio/video) slot into the
  * same kernel signature; only the per-blob parse changes.
  *
  * The testdata has no binary table, so blobs are synthesized:
  * `documents.text` bytes stand in for opaque payloads in the
  * meta/frames/batches queries (`encode(text, 'utf-8')`), and
  * [[bmpFixtures]] builds real BMPs with closed-form pixel arithmetic
  * so the decode path is DuckDB-oracle-checkable end to end.
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
    * (doc_id order within a shard, 64 KB per batch) and report
    * per-batch stats — the serving-side sibling of
    * Curation.packSequences: GPU inference wants fixed-size payload
    * batches, and the assignment must be a pure function of the data
    * (reproducible across runs).
    *
    * Scale shape: the cumulative sum is windowed PER SHARD
    * (deterministic `doc_id mod nShards`), exactly as packSequences
    * partitions by lang — shards pack independently in parallel and no
    * single reducer ever sees the whole table. Batch identity is the
    * (shard, batch_id) pair; batches stay contiguous in doc_id order
    * within their shard. Size `nShards` to the cluster (O(cores)); a
    * shard's data must fit one task, which is the same contract every
    * partitioned window in the engine already carries.
    */
  def inferenceBatches(
      d: DataFrame, budget: Long = 65536L, nShards: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    asMedia(d)
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("cum_before", coalesce(sum("n_bytes").over(w), lit(0L)))
      .select(col("shard"), col("doc_id"), col("n_bytes"),
        expr(s"CAST(cum_before DIV $budget AS BIGINT)").as("batch_id"))
      .groupBy("shard", "batch_id")
      .agg(count(lit(1)).as("n_items"), sum("n_bytes").as("batch_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  val inferenceBatchesSql: String =
    """SELECT shard, batch_id, count(*) AS n_items,
      |  CAST(sum(n_bytes) AS BIGINT) AS batch_bytes,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM (
      |  SELECT shard, doc_id, n_bytes,
      |    CAST(coalesce(sum(n_bytes) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      // 65536 AS BIGINT) AS batch_id
      |  FROM (SELECT doc_id % 32 AS shard, doc_id,
      |          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |        FROM documents))
      |GROUP BY shard, batch_id""".stripMargin

  /** Decoded-image batch record (the schema the decoder emits). */
  case class DecodedImage(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      pixels: Array[Byte])

  /** Synthesized BMP fixture blobs: one real 24-bit BMP per document
    * with arithmetic dims/pixels (w = doc_id%13+5 exercises every row
    * stride padding 0..3; pixel = (3x+7y+11c+doc_id) mod 256), so the
    * DuckDB oracle can compute the decoded statistics in closed form
    * WITHOUT a decoder — any decode defect (padding, bottom-up flip,
    * BGR order) breaks the compare.
    */
  def bmpFixtures(d: DataFrame): DataFrame = {
    val enc = udf { id: Long =>
      BmpCodec.encode((id % 13).toInt + 5, (id % 7).toInt + 3,
        (x, y, c) => ((x * 3 + y * 7 + c * 11 + id) % 256).toInt)
    }
    d.select(col("doc_id"), enc(col("doc_id")).as("media"))
  }

  /** REAL decode kernel: parses each blob as an uncompressed 24-bit BMP
    * ([[BmpCodec.decode]] — header validation, row-stride padding,
    * bottom-up/top-down order, BGR->RGB). `mapPartitions` keeps any
    * per-partition codec initialization (buffers, native contexts for
    * richer formats) out of the per-row path; a corrupt blob throws
    * with its content rather than emitting silent garbage.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[DecodedImage] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here (BmpCodec is stateless)
        rows.map { case (id, bytes) =>
          val r =
            try BmpCodec.decode(bytes)
            catch {
              case e: IllegalArgumentException => throw new IllegalArgumentException(
                s"doc_id=$id: ${e.getMessage}", e)
            }
          DecodedImage(id, r.width, r.height, 3, r.pixels)
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

  /** Aggregate features over decoded images, flowing back into
    * relational ops: total pixel mass, a position-weighted checksum
    * (catches any pixel landing at the wrong (x, y, c) — transposition,
    * missed bottom-up flip, stride/padding errors), and the packed
    * top-left RGB (catches a missed vertical flip even when sums
    * accidentally agree).
    */
  def decodedStats(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    decodeImages(spark, bmpFixtures(d))
      .map { img =>
        val (w, h) = (img.width, img.height)
        var psum = 0L
        var possum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < 3) {
              val v = (img.pixels((y * w + x) * 3 + c) & 0xff).toLong
              psum += v
              possum += (x + 7L * y + 13L * c) * v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val topLeft = (img.pixels(0) & 0xff).toLong * 65536 +
          (img.pixels(1) & 0xff).toLong * 256 + (img.pixels(2) & 0xff)
        (img.doc_id, w.toLong, h.toLong, psum, possum, topLeft)
      }
      .toDF("doc_id", "width", "height", "pixel_sum", "pos_sum", "top_left")
  }

  /** The oracle recomputes the fixture arithmetic directly — it never
    * sees a BMP, so agreement proves the Spark side's encode->decode
    * round-trip places every byte correctly.
    */
  val decodedStatsSql: String =
    """WITH dims AS (
      |  SELECT doc_id, doc_id % 13 + 5 AS w, doc_id % 7 + 3 AS h
      |  FROM documents),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, gx.x, gy.y, gc.c,
      |    (gx.x * 3 + gy.y * 7 + gc.c * 11 + d.doc_id) % 256 AS v
      |  FROM dims d,
      |    LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) gx,
      |    LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) gy,
      |    (SELECT unnest(generate_series(0, 2)) AS c) gc)
      |SELECT doc_id, CAST(max(w) AS BIGINT) AS width,
      |  CAST(max(h) AS BIGINT) AS height,
      |  CAST(sum(v) AS BIGINT) AS pixel_sum,
      |  CAST(sum((x + 7 * y + 13 * c) * v) AS BIGINT) AS pos_sum,
      |  CAST(max(CASE WHEN x = 0 AND y = 0 AND c = 0 THEN v END) * 65536 +
      |       max(CASE WHEN x = 0 AND y = 0 AND c = 1 THEN v END) * 256 +
      |       max(CASE WHEN x = 0 AND y = 0 AND c = 2 THEN v END) AS BIGINT)
      |    AS top_left
      |FROM px GROUP BY doc_id""".stripMargin

  /** decode -> nearest-neighbor resize -> aggregate, end to end: the
    * fixture arithmetic composes exactly through the resampling
    * (sx = x*w/outW is integer floor division on both sides), so the
    * oracle can verify every resampled byte without decoding anything.
    */
  def resizedStats(
      spark: SparkSession, d: DataFrame,
      outW: Int = 8, outH: Int = 6): DataFrame = {
    import spark.implicits._
    resize(spark, decodeImages(spark, bmpFixtures(d)), outW, outH)
      .map { img =>
        var psum = 0L
        var possum = 0L
        var y = 0
        while (y < img.height) {
          var x = 0
          while (x < img.width) {
            var c = 0
            while (c < 3) {
              val v = (img.pixels((y * img.width + x) * 3 + c) & 0xff).toLong
              psum += v
              possum += (x + 7L * y + 13L * c) * v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        (img.doc_id, img.width.toLong, img.height.toLong, psum, possum)
      }
      .toDF("doc_id", "width", "height", "pixel_sum", "pos_sum")
  }

  val resizedStatsSql: String =
    """WITH dims AS (
      |  SELECT doc_id, doc_id % 13 + 5 AS w, doc_id % 7 + 3 AS h
      |  FROM documents),
      |px AS (
      |  SELECT d.doc_id, gx.x, gy.y, gc.c,
      |    ((gx.x * d.w) // 8 * 3 + (gy.y * d.h) // 6 * 7 +
      |      gc.c * 11 + d.doc_id) % 256 AS v
      |  FROM dims d,
      |    (SELECT unnest(generate_series(0, 7)) AS x) gx,
      |    (SELECT unnest(generate_series(0, 5)) AS y) gy,
      |    (SELECT unnest(generate_series(0, 2)) AS c) gc)
      |SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
      |  CAST(sum(v) AS BIGINT) AS pixel_sum,
      |  CAST(sum((x + 7 * y + 13 * c) * v) AS BIGINT) AS pos_sum
      |FROM px GROUP BY doc_id""".stripMargin

  /** Decoded-audio batch record (the schema the audio decoder emits). */
  case class DecodedAudio(
      doc_id: Long,
      sample_rate: Int,
      samples: Array[Short])

  /** Synthesized WAV fixture blobs: one real 16-bit PCM mono WAV per
    * document with arithmetic rate/samples (rate = 8000 + (doc_id%4) *
    * 4000, n = doc_id%50 + 20, sample[i] = (doc_id*31 + i*17) % 2003 -
    * 1001), so the DuckDB oracle computes the decoded statistics in
    * closed form WITHOUT a decoder — any decode defect (chunk walk,
    * endianness, sign) breaks the compare.
    */
  def wavFixtures(d: DataFrame): DataFrame = {
    val enc = udf { id: Long =>
      val n = (id % 50).toInt + 20
      WavCodec.encode(
        8000 + (id % 4).toInt * 4000,
        Array.tabulate[Short](n)(i => ((id * 31 + i * 17) % 2003 - 1001).toShort))
    }
    d.select(col("doc_id"), enc(col("doc_id")).as("media"))
  }

  /** REAL audio decode kernel: parses each blob as canonical PCM WAV
    * ([[WavCodec.decode]] — RIFF chunk walk, strict validation) inside
    * `mapPartitions`, same contract as [[decodeImages]]: corrupt blobs
    * throw IllegalArgumentException for quarantine routing.
    */
  def decodeAudio(
      spark: SparkSession, media: DataFrame): Dataset[DecodedAudio] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val w =
            try WavCodec.decode(bytes)
            catch {
              case e: IllegalArgumentException => throw new IllegalArgumentException(
                s"doc_id=$id: ${e.getMessage}", e)
            }
          DecodedAudio(id, w.sampleRate, w.samples)
        }
      }
  }

  /** Aggregate features over decoded audio — duration, peak amplitude,
    * RMS energy, silence ratio (the framing/VAD precursors an audio
    * pipeline computes after decode). Integer sums keep everything the
    * closed-form oracle can reproduce exactly.
    */
  def audioStats(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    decodeAudio(spark, wavFixtures(d))
      .map { a =>
        val n = a.samples.length
        var sum2 = 0L
        var peak = 0L
        var silent = 0L
        var i = 0
        while (i < n) {
          val v = a.samples(i).toLong
          sum2 += v * v
          val av = math.abs(v)
          if (av > peak) peak = av
          if (av < 100) silent += 1
          i += 1
        }
        (a.doc_id, a.sample_rate.toLong, n.toLong,
          n.toLong * 1000 / a.sample_rate, peak,
          BigDecimal(math.sqrt(sum2.toDouble / n))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(silent.toDouble / n)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("doc_id", "sample_rate", "n_samples", "duration_ms",
        "peak_abs", "rms_r", "silence_ratio_r")
  }

  /** Frame-energy voice-activity detection over decoded audio: the
    * waveform split into fixed 10-sample frames (last frame partial),
    * one row per frame with its total squared energy and a speech
    * flag where the energy clears the threshold — the segmentation
    * step an audio curation pipeline runs before transcription
    * (transcribe speech frames, drop silence), and the audio sibling
    * of [[sceneCuts]]' per-transition video rows. Integer-exact:
    * energy is a sum of v^2 longs, the flag one comparison.
    *
    * Scale: decode + the frame fold are map-only inside the scan
    * (the [[audioStats]] shape) — blobs never shuffle; output is
    * frames-sized. The oracle replays the fixture waveform closed-form
    * per (frame, sample), so agreement proves chunk-walk and sample
    * alignment frame by frame.
    */
  def audioVad(
      spark: SparkSession, d: DataFrame, frameLen: Int = 10,
      thresh: Long = 3000000L): DataFrame = {
    import spark.implicits._
    decodeAudio(spark, wavFixtures(d)).flatMap { a =>
      a.samples.grouped(frameLen).zipWithIndex.map { case (fr, fi) =>
        var e = 0L
        fr.foreach(v => e += v.toLong * v)
        (a.doc_id, fi.toLong, fr.length.toLong, e,
          if (e >= thresh) 1L else 0L)
      }
    }.toDF("doc_id", "frame", "frame_len", "energy", "is_speech")
  }

  val audioVadSql: String =
    """WITH base AS (
      |  SELECT doc_id, doc_id % 50 + 20 AS n FROM documents),
      |s AS (
      |  SELECT b.doc_id, g.i // 10 AS f,
      |    (b.doc_id * 31 + g.i * 17) % 2003 - 1001 AS v
      |  FROM base b,
      |    LATERAL (SELECT unnest(generate_series(0, b.n - 1)) AS i) g),
      |agg AS (
      |  SELECT doc_id, f, count(*) AS frame_len, sum(v * v) AS energy
      |  FROM s GROUP BY 1, 2)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame,
      |  CAST(frame_len AS BIGINT) AS frame_len,
      |  CAST(energy AS BIGINT) AS energy,
      |  CAST(CASE WHEN energy >= 3000000 THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_speech
      |FROM agg""".stripMargin

  /** Closed-form oracle: recomputes the fixture waveform arithmetic
    * directly, never parsing a WAV — agreement proves the encode ->
    * chunk-walk -> sample decode round trip bit-exact.
    */
  val audioStatsSql: String =
    """WITH base AS (
      |  SELECT doc_id, doc_id % 50 + 20 AS n,
      |    8000 + (doc_id % 4) * 4000 AS rate
      |  FROM documents),
      |s AS (
      |  SELECT b.doc_id, b.n, b.rate,
      |    (b.doc_id * 31 + g.i * 17) % 2003 - 1001 AS v
      |  FROM base b,
      |    LATERAL (SELECT unnest(generate_series(0, b.n - 1)) AS i) g)
      |SELECT doc_id,
      |  CAST(min(rate) AS BIGINT) AS sample_rate,
      |  CAST(min(n) AS BIGINT) AS n_samples,
      |  CAST(min(n) * 1000 // min(rate) AS BIGINT) AS duration_ms,
      |  CAST(max(abs(v)) AS BIGINT) AS peak_abs,
      |  round(sqrt(sum(v * v)::DOUBLE / min(n)), 4) AS rms_r,
      |  round(sum(CASE WHEN abs(v) < 100 THEN 1 ELSE 0 END)::DOUBLE
      |    / min(n), 4) AS silence_ratio_r
      |FROM s GROUP BY doc_id""".stripMargin

  /** Per-image luma quality panel — the brightness/contrast filter an
    * image-caption curation pipeline runs right after decode (drop
    * near-black thumbnails, blown-out scans, flat solid-color fills
    * before paying for embedding/captioning). Integer BT.601 luma
    * `(299r + 587g + 114b) DIV 1000` per pixel; per image the mean
    * (floor), min, max, and the exact variance NUMERATOR
    * `n*Σl² − (Σl)²` (variance = that over n², kept integral so the
    * oracle is bit-exact), plus the three filter flags
    * (mean < 64 dark, mean > 192 bright, max−min < 32 flat).
    *
    * Scale: decode + fold are map-only inside the scan ([[audioStats]]
    * shape); blobs never shuffle; output is one row per image. The
    * closed-form oracle recomputes fixture pixels, so agreement proves
    * the luma math AND pixel placement survive decode.
    */
  def lumaStats(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    decodeImages(spark, bmpFixtures(d)).map { img =>
      val n = (img.width * img.height).toLong
      var sum = 0L
      var sum2 = 0L
      var mn = 255L
      var mx = 0L
      var i = 0
      while (i < n) {
        val r = (img.pixels(i * 3) & 0xff).toLong
        val g = (img.pixels(i * 3 + 1) & 0xff).toLong
        val b = (img.pixels(i * 3 + 2) & 0xff).toLong
        val l = (299 * r + 587 * g + 114 * b) / 1000
        sum += l
        sum2 += l * l
        if (l < mn) mn = l
        if (l > mx) mx = l
        i += 1
      }
      val mean = sum / n
      (img.doc_id, n, mean, mn, mx, n * sum2 - sum * sum,
        if (mean < 64) 1L else 0L, if (mean > 192) 1L else 0L,
        if (mx - mn < 32) 1L else 0L)
    }.toDF("doc_id", "n_px", "mean_luma", "min_luma", "max_luma",
      "var_num", "too_dark", "too_bright", "low_contrast")
  }

  val lumaStatsSql: String =
    """WITH dims AS (
      |  SELECT doc_id, doc_id % 13 + 5 AS w, doc_id % 7 + 3 AS h
      |  FROM documents),
      |lum AS (
      |  SELECT d.doc_id, d.w * d.h AS n,
      |    (299 * ((gx.x * 3 + gy.y * 7 + 0 + d.doc_id) % 256)
      |     + 587 * ((gx.x * 3 + gy.y * 7 + 11 + d.doc_id) % 256)
      |     + 114 * ((gx.x * 3 + gy.y * 7 + 22 + d.doc_id) % 256)) // 1000
      |      AS l
      |  FROM dims d,
      |    LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) gx,
      |    LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) gy),
      |agg AS (
      |  SELECT doc_id, min(n) AS n, sum(l) AS s, sum(l * l) AS s2,
      |    min(l) AS mn, max(l) AS mx
      |  FROM lum GROUP BY 1)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_px,
      |  CAST(s // n AS BIGINT) AS mean_luma,
      |  CAST(mn AS BIGINT) AS min_luma, CAST(mx AS BIGINT) AS max_luma,
      |  CAST(n * s2 - s * s AS BIGINT) AS var_num,
      |  CAST(CASE WHEN s // n < 64 THEN 1 ELSE 0 END AS BIGINT)
      |    AS too_dark,
      |  CAST(CASE WHEN s // n > 192 THEN 1 ELSE 0 END AS BIGINT)
      |    AS too_bright,
      |  CAST(CASE WHEN mx - mn < 32 THEN 1 ELSE 0 END AS BIGINT)
      |    AS low_contrast
      |FROM agg""".stripMargin

  /** 2:1 box-filter audio downsample — the sample-rate normalization
    * step before a speech model with a fixed input rate. Each output
    * sample is the UNDIVIDED pair sum v[2i] + v[2i+1] (odd tail keeps
    * its lone sample): division-free on purpose, because Spark's DIV
    * truncates toward zero while DuckDB's // floors, and audio samples
    * go negative — the one engine-semantics mismatch a bit-exact panel
    * must not contain. Reported per doc: halved rate, output length,
    * pair-sum extrema, and a position-weighted checksum that catches
    * any off-by-one in the pairing.
    *
    * Scale: map-only inside the scan, blobs never shuffle; the full
    * resampled signal exists only transiently per row.
    */
  def audioDownsample(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    decodeAudio(spark, wavFixtures(d)).map { a =>
      val n = a.samples.length
      val nOut = (n + 1) / 2
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var chk = 0L
      var i = 0
      while (i < nOut) {
        val v = a.samples(2 * i).toLong +
          (if (2 * i + 1 < n) a.samples(2 * i + 1).toLong else 0L)
        if (v < mn) mn = v
        if (v > mx) mx = v
        chk += (i + 13L) * v
        i += 1
      }
      (a.doc_id, a.sample_rate.toLong / 2, nOut.toLong, mn, mx, chk)
    }.toDF("doc_id", "out_rate", "n_out", "min_pair", "max_pair",
      "checksum")
  }

  val audioDownsampleSql: String =
    """WITH base AS (
      |  SELECT doc_id, doc_id % 50 + 20 AS n,
      |    8000 + (doc_id % 4) * 4000 AS rate
      |  FROM documents),
      |pairs AS (
      |  SELECT b.doc_id, b.rate, g.i,
      |    ((b.doc_id * 31 + (2 * g.i) * 17) % 2003 - 1001)
      |    + (CASE WHEN 2 * g.i + 1 < b.n
      |        THEN (b.doc_id * 31 + (2 * g.i + 1) * 17) % 2003 - 1001
      |        ELSE 0 END) AS v
      |  FROM base b,
      |    LATERAL (SELECT unnest(generate_series(0, (b.n + 1) // 2 - 1))
      |      AS i) g)
      |SELECT doc_id, CAST(min(rate) // 2 AS BIGINT) AS out_rate,
      |  CAST(count(*) AS BIGINT) AS n_out,
      |  CAST(min(v) AS BIGINT) AS min_pair,
      |  CAST(max(v) AS BIGINT) AS max_pair,
      |  CAST(sum((i + 13) * v) AS BIGINT) AS checksum
      |FROM pairs GROUP BY doc_id""".stripMargin

  /** Synthesized Y4M fixture blobs: one real YUV4MPEG2 clip per
    * document — w in {4,6,8}, h in {2,4}, frames = doc_id%5+1,
    * luma(f, x, y) = (doc_id + f*37 + x*5 + y*11) % 256 — so the
    * DuckDB oracle computes decoded statistics in closed form WITHOUT
    * a parser; any chunk-walk defect (chroma-plane misalignment shifts
    * every following FRAME marker) breaks the compare.
    */
  /** Shared video decode-and-tag (the quarantine error contract of
    * [[decodeImages]]/[[decodeAudio]] for the third modality) — one
    * definition for [[videoStats]] and [[videoHashes]].
    */
  private def decodeY4mTagged(id: Long, blob: Array[Byte]): Y4mCodec.Y4m =
    try Y4mCodec.decode(blob)
    catch {
      case e: IllegalArgumentException => throw new IllegalArgumentException(
        s"doc_id=$id: ${e.getMessage}", e)
    }

  def y4mFixtures(d: DataFrame): DataFrame = {
    val enc = udf { id: Long =>
      Y4mCodec.encode(
        ((id % 3).toInt + 2) * 2, ((id % 2).toInt + 1) * 2,
        (id % 5).toInt + 1,
        (f, x, y) => ((id + f * 37 + x * 5 + y * 11) % 256).toInt)
    }
    d.select(col("doc_id"), enc(col("doc_id")).as("media"))
  }

  /** Aggregate features over decoded video: frame count, dims, total
    * luma mass, and MOTION ENERGY (sum of |luma delta| between
    * consecutive frames — the scene-change / static-clip signal a
    * video curation pipeline filters on). The fixture luma ramps by
    * f*37 per frame, so per-pixel deltas are closed-form mirrorable.
    */
  def videoStats(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    y4mFixtures(d).select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // map-only: fixture synthesis, decode, and the stats fold all
        // ride one partition-local pass; blobs never shuffle
        rows.map { case (id, blob) =>
          val v = decodeY4mTagged(id, blob)
          var lumaSum = 0L
          v.lumaFrames.foreach(fr => fr.foreach(b => lumaSum += b & 0xff))
          var motion = 0L
          var f = 1
          while (f < v.lumaFrames.length) {
            val a = v.lumaFrames(f - 1); val b = v.lumaFrames(f)
            var i = 0
            while (i < a.length) {
              motion += math.abs((b(i) & 0xff) - (a(i) & 0xff)); i += 1
            }
            f += 1
          }
          (id, v.width.toLong, v.height.toLong,
            v.lumaFrames.length.toLong, lumaSum, motion)
        }
      }
      .toDF("doc_id", "width", "height", "n_frames", "luma_sum", "motion")
  }

  /** Closed-form oracle: recomputes the fixture luma arithmetic per
    * (frame, x, y), never parsing a byte — agreement proves header
    * parse, plane stride, and frame alignment are all exact.
    */
  val videoStatsSql: String =
    """WITH dims AS (
      |  SELECT doc_id, (doc_id % 3 + 2) * 2 AS w, (doc_id % 2 + 1) * 2 AS h,
      |    doc_id % 5 + 1 AS nf
      |  FROM documents),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, d.nf, gf.f, gx.x, gy.y,
      |    (d.doc_id + gf.f * 37 + gx.x * 5 + gy.y * 11) % 256 AS v
      |  FROM dims d,
      |    LATERAL (SELECT unnest(generate_series(0, d.nf - 1)) AS f) gf,
      |    LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) gx,
      |    LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) gy),
      |deltas AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN f > 0 THEN abs(
      |      v - (doc_id + (f - 1) * 37 + x * 5 + y * 11) % 256)
      |      ELSE 0 END) AS motion,
      |    sum(v) AS luma_sum
      |  FROM px GROUP BY doc_id)
      |SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
      |  CAST(d.h AS BIGINT) AS height, CAST(d.nf AS BIGINT) AS n_frames,
      |  CAST(x.luma_sum AS BIGINT) AS luma_sum,
      |  CAST(x.motion AS BIGINT) AS motion
      |FROM dims d JOIN deltas x USING (doc_id)""".stripMargin

  /** Scene-cut detection over decoded video: one row per consecutive
    * frame PAIR with the total |luma delta| and a cut flag where the
    * delta clears 64 x pixels (mean per-pixel change >= 64 — a
    * hard-cut threshold, integer-exact). The shot-boundary step of a
    * video curation pipeline: sampling one frame per SHOT beats one
    * per N frames when clips alternate static and action, and the
    * per-transition deltas are what the sampler consumes. Single-frame
    * clips emit no rows.
    *
    * Scale: decode and the per-transition fold are map-only inside the
    * scan (the [[videoStats]] shape) — blobs never shuffle, only
    * (doc_id, f, delta, flag) rows leave the stage. The oracle replays
    * the fixture's closed-form luma per (f, x, y), so agreement proves
    * frame alignment and stride handling FRAME BY FRAME — strictly
    * finer than [[videoStats]]'s whole-clip motion sum.
    */
  def sceneCuts(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    y4mFixtures(d).select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        val v = decodeY4mTagged(id, blob)
        val npx = v.width.toLong * v.height
        (1 until v.lumaFrames.length).map { f =>
          val a = v.lumaFrames(f - 1); val b = v.lumaFrames(f)
          var delta = 0L
          var i = 0
          while (i < a.length) {
            delta += math.abs((b(i) & 0xff) - (a(i) & 0xff)); i += 1
          }
          (id, f.toLong, delta, if (delta >= 64L * npx) 1L else 0L)
        }
      }
      .toDF("doc_id", "f", "luma_delta", "is_cut")
  }

  val sceneCutsSql: String =
    """WITH dims AS (
      |  SELECT doc_id, (doc_id % 3 + 2) * 2 AS w, (doc_id % 2 + 1) * 2 AS h,
      |    doc_id % 5 + 1 AS nf
      |  FROM documents),
      |tr AS (
      |  SELECT d.doc_id, d.w, d.h, gf.f, gx.x, gy.y,
      |    abs((d.doc_id + gf.f * 37 + gx.x * 5 + gy.y * 11) % 256
      |      - (d.doc_id + (gf.f - 1) * 37 + gx.x * 5 + gy.y * 11) % 256)
      |      AS dv
      |  FROM dims d,
      |    LATERAL (SELECT unnest(generate_series(1, d.nf - 1)) AS f) gf,
      |    LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) gx,
      |    LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) gy),
      |agg AS (
      |  SELECT doc_id, f, CAST(sum(dv) AS BIGINT) AS luma_delta,
      |    max(w * h) AS npx
      |  FROM tr GROUP BY 1, 2)
      |SELECT doc_id, CAST(f AS BIGINT) AS f, luma_delta,
      |  CAST(CASE WHEN luma_delta >= 64 * npx THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_cut
      |FROM agg""".stripMargin

  /** Decode with QUARANTINE ROUTING — the operator face of the codec
    * contract: every malformed blob becomes a `quarantined` row
    * instead of failing the job or emitting silent garbage. One row
    * per blob, decoded fields zeroed for quarantined ones; corrupt
    * inputs never abort the scan (the mapPartitions catch is the
    * per-row `try` a 100 TB ingest needs — one bad blob in a billion
    * must not kill the stage).
    */
  def decodeAudioSafe(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            val w = WavCodec.decode(bytes)
            (id, "ok", w.sampleRate.toLong, w.samples.length.toLong)
          } catch {
            case _: IllegalArgumentException => (id, "quarantined", 0L, 0L)
          }
        }
      }
      .toDF("doc_id", "status", "sample_rate", "n_samples")
  }

  /** q_multimodal_quarantine: WAV fixtures with a deterministic 1-in-97
    * slice truncated to 10 bytes (unparseable), decoded with routing,
    * aggregated by status. The oracle derives both partitions in closed
    * form — the Spark side must actually decode-or-quarantine every
    * blob to agree.
    */
  def quarantineStats(spark: SparkSession, d: DataFrame): DataFrame = {
    val media = wavFixtures(d).select(
      col("doc_id"),
      when(col("doc_id") % 97 === 0, expr("substring(media, 1, 10)"))
        .otherwise(col("media")).as("media"))
    decodeAudioSafe(spark, media)
      .groupBy("status")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_samples").cast("bigint").as("total_samples"))
  }

  val quarantineStatsSql: String =
    """SELECT CASE WHEN doc_id % 97 = 0 THEN 'quarantined' ELSE 'ok' END
      |    AS status,
      |  count(*) AS n_docs,
      |  CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 0
      |       ELSE doc_id % 50 + 20 END) AS BIGINT) AS total_samples
      |FROM documents GROUP BY 1""".stripMargin

  /** Per-image 64-bit AVERAGE HASH (aHash): decode, resize to 8x8,
    * bit i set iff pixel i's luma exceeds the image mean (compared as
    * luma*64 > total — integer-exact, no float threshold). The
    * perceptual fingerprint step of an image-dedup pipeline; decode +
    * hash run map-only inside the scan stage, so only (doc_id, 8-byte
    * hash) ever crosses the network.
    */
  def imageHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    resize(spark, decodeImages(spark, media), 8, 8).map { img =>
      val lum = new Array[Long](64)
      var total = 0L
      var i = 0
      while (i < 64) {
        val o = i * 3
        val l = (img.pixels(o) & 0xff).toLong +
          (img.pixels(o + 1) & 0xff) + (img.pixels(o + 2) & 0xff)
        lum(i) = l; total += l; i += 1
      }
      var h = 0L
      i = 0
      while (i < 64) { if (lum(i) * 64L > total) h |= (1L << i); i += 1 }
      (img.doc_id, h)
    }.toDF("doc_id", "phash")
  }

  /** NEAR-DUPLICATE IMAGE pairs by banded hamming join over the aHash
    * — the multimodal sibling of [[Dedup.simhashPairsBanded]], same
    * pigeonhole completeness: any pair with hamming <= maxHamming <
    * nBands agrees on at least one 16-bit band, so the (band, key)
    * self-join misses nothing while staying bucketed sub-quadratic.
    * The driver query plants exact blob copies of a 1-in-25 slice
    * under offset ids (the fixture corpus has no natural image dups at
    * small SF), the same observability device as q_dedup_semantic.
    *
    * Scale: hashing is map-only; the join shuffles (doc_id, hash,
    * band key) rows — 4 x 8-byte-keyed rows per image, nothing else;
    * verification (bit_count of xor) happens inside the join stage.
    */
  def imageNearDups(
      spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3, nBands: Int = 4): DataFrame =
    bandedHammingPairs(imageHashes(spark, media), maxHamming, nBands)

  /** Banded hamming self-join over any (doc_id, phash: long) table —
    * the shared candidate engine behind [[imageNearDups]] and
    * [[audioNearDups]] (and conceptually [[Dedup.simhashPairsBanded]]):
    * any pair with hamming <= maxHamming < nBands agrees on at least
    * one band (pigeonhole), so the bucketed join is COMPLETE while
    * sub-quadratic; verification is a bit_count inside the join stage.
    *
    * Adaptive HOT-BUCKET SALTING, same discipline as
    * [[Dedup.prefixRankJoin]]: a duplicate-heavy corpus (the realistic
    * near-dup regime — one viral image re-posted n times) puts n
    * identical hashes in one (band, key) bucket, whose self-join emits
    * n^2/2 pairs from ONE task. AQE's skew split cannot help: it
    * detects byte-skew of join INPUTS, and these inputs are tiny while
    * the OUTPUT explodes. Buckets whose membership exceeds
    * `saltTarget` are split deterministically — the probe side picks
    * pmod(xxhash64(doc_id), nsalt), the build side replicates across
    * all nsalt sub-buckets — so every pair still meets exactly once
    * and the per-task pair count drops to ~n * saltTarget. Bucket
    * sizes come from a count-over-window on the banded rows (NOT a
    * broadcast-joined aggregate: the window's exchange is shared by
    * both join sides, so the upstream hash computation — a full media
    * DECODE for the image path — still runs once). Cold buckets pay
    * nothing (nsalt = 1, probe salt 0, build explodes a 1-element
    * range). saltTarget < 0 disables the window entirely and restores
    * the symmetric self-join (one exchange, reused).
    */
  private[graft] def bandedHammingPairs(
      hashes: DataFrame, maxHamming: Int, nBands: Int,
      saltTarget: Int = 1024): DataFrame = {
    require(maxHamming < nBands, "pigeonhole completeness needs h < bands")
    require(saltTarget != 0, "saltTarget must be nonzero (negative disables)")
    val width = 64 / nBands
    val mask = (1L << width) - 1
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("phash"), b * width).bitwiseAND(lit(mask)).as("key"))
    }
    val banded = hashes
      .select(col("doc_id"), col("phash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    // shared salting carrier (round 14): same machinery this operator
    // pioneered, now in one place — and it additionally re-spreads the
    // salted probe side by (band, key, salt), closing the
    // broadcast-join hole the entity probe exposed (the count window
    // alone leaves a hot bucket concentrated in one probe partition)
    val (probe, build) = graft.ops.Salting.saltedSides(
      banded, Seq("band", "key"), col("doc_id"), saltTarget)
    probe.as("a")
      .join(build.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.salt") === col("b.salt") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Per-clip 64-bit ENERGY-ENVELOPE hash: decode, split the samples
    * into 64 equal windows, bit i set iff window i's total absolute
    * amplitude (scaled by 64) exceeds the clip total — the same
    * integer-exact mean threshold as [[imageHashes]], over time
    * instead of space. A crude but deterministic acoustic fingerprint:
    * amplitude-scaled or re-encoded copies keep their envelope shape.
    */
  def audioHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    decodeAudio(spark, media).map { a =>
      val n = a.samples.length
      val win = new Array[Long](64)
      var total = 0L
      var i = 0
      while (i < n) {
        val v = math.abs(a.samples(i).toLong)
        // long arithmetic: i*64 overflows Int past ~33.5M samples
        // (a 35-minute 16 kHz clip), which would negate the index
        win((i.toLong * 64 / n).toInt) += v; total += v; i += 1
      }
      var h = 0L
      i = 0
      while (i < 64) { if (win(i) * 64L > total) h |= (1L << i); i += 1 }
      (a.doc_id, h)
    }.toDF("doc_id", "phash")
  }

  /** NEAR-DUPLICATE AUDIO pairs: envelope hash + the shared banded
    * hamming join. Same scale shape as the image path — hashing
    * map-only in the scan stage, only (doc_id, 8 bytes) shuffled.
    */
  def audioNearDups(
      spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3, nBands: Int = 4): DataFrame =
    bandedHammingPairs(audioHashes(spark, media), maxHamming, nBands)

  /** Per-clip 64-bit SPACE-TIME luma hash for video: decode, stream
    * every luma sample (all frames, scan order) into 64 equal windows,
    * mean-threshold bits as in [[imageHashes]] — robust to any clip
    * length, sensitive to both spatial layout and temporal ramp.
    */
  def videoHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, blob) =>
          val v = decodeY4mTagged(id, blob)
          val n = v.lumaFrames.iterator.map(_.length.toLong).sum
          val win = new Array[Long](64)
          var total = 0L
          var i = 0L
          v.lumaFrames.foreach(_.foreach { b =>
            val l = (b & 0xff).toLong
            win((i * 64 / n).toInt) += l; total += l; i += 1
          })
          var h = 0L
          var j = 0
          while (j < 64) { if (win(j) * 64L > total) h |= (1L << j); j += 1 }
          (id, h)
        }
      }.toDF("doc_id", "phash")
  }

  /** NEAR-DUPLICATE VIDEO pairs — completing the modality trio on the
    * shared [[bandedHammingPairs]] engine.
    */
  def videoNearDups(
      spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3, nBands: Int = 4): DataFrame =
    bandedHammingPairs(videoHashes(spark, media), maxHamming, nBands)

  /** Absolute root the trio's PARTIAL ORACLE reads from. Computed from
    * the runtime cwd (the driver launches sbt from the repo root), so
    * the parquet Spark writes and the path embedded in the generated
    * oracle SQL agree by construction — the oracle's DuckDB process
    * does not share this JVM's cwd, hence absolute.
    */
  private val mmOracleRoot =
    new java.io.File("target/mm_oracle").getAbsolutePath

  /** Partial-oracle device for the binary-codec trio (the suite's only
    * rows-only rows through r13): DuckDB cannot decode BMP/WAV/Y4M,
    * but it CAN replay the banded-hamming pairing — so each trio query
    * materializes its decoded (doc_id, phash) table to a deterministic
    * repo-local path and reads it BACK as the pairing input. The
    * driver's oracle then read_parquet()s the same table and replays
    * the pairing in SQL: everything past the codec step is hash-
    * checked; the codec step itself stays ScalaTest-checked (byte-
    * exact decode specs + brute-force/planted-copy near-dup specs).
    * The path is keyed by the sf dir's basename so the correctness run
    * (sf0.01) and bench runs (sf0.1) never clobber each other. The
    * generated oracle SQL reads the SAME basename: the trio queries
    * record it here when they materialize (both Verify and VerifyOne
    * run every query BEFORE dumping oracle_sql.json, so the manifest
    * always points at the table this run just wrote — a hardcoded
    * sf0.01 would read a stale previous run's table whenever the
    * driver verified a differently-named dir, r14 advice). Falls back
    * to sf0.01, the driver's correctness scale, for tooling that dumps
    * SQL without executing.
    */
  @volatile private var oracleSfTag: String = "sf0.01"

  // (tag, name) pairs this JVM has already materialized: the decode +
  // hash is DETERMINISTIC in (sf dir, name), so a repeat call (the SQL
  // face and its DataFrame twin share image_hashes) re-reads instead
  // of overwriting — an overwrite would delete the files a previously
  // returned lazy frame still references mid-comparison. First call in
  // each JVM still overwrites, so cross-run staleness can't survive.
  private val materialized =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  private def oracleHashes(
      hashes: DataFrame, sfDir: String, name: String): DataFrame = {
    oracleSfTag = new java.io.File(sfDir).getName
    val path = s"$mmOracleRoot/$oracleSfTag/$name"
    if (materialized.add((oracleSfTag, name)))
      hashes.write.mode("overwrite").parquet(path)
    hashes.sparkSession.read.parquet(path)
  }

  /** DuckDB replay of [[bandedHammingPairs]] (unsalted semantics —
    * salting only re-buckets, never changes the distinct pair set)
    * over a materialized hash table: any pair with hamming <= 3 agrees
    * on >= 1 of the 4 16-bit bands (pigeonhole), DISTINCT collapses
    * multi-band meetings. The band key masks to the low 16 bits of the
    * shifted hash, so arithmetic-vs-logical shift fill differences
    * between engines cannot leak in.
    */
  private def bandedHammingSql(name: String): String =
    bandedHammingSqlText(graft.sql.Dialect.duck, name)

  /** SHARED TEXT BUILDER for the banded-hamming near-dup SQL over a
    * materialized (doc_id, phash) table: the DuckDB oracle and the
    * Spark facade statement (q_sql_multimodal_phash) are generated
    * from this one template — band count/width, the low-16-bit mask
    * (which neutralizes arithmetic-vs-logical shift fill), and the
    * hamming cutoff are spelled once. The codec step (decode + aHash)
    * is a Scala kernel SQL cannot express; the hash TABLE is the
    * user-shaped boundary, exactly as for the oracle.
    */
  private[graft] def bandedHammingSqlText(
      d: graft.sql.Dialect, name: String): String =
    s"""WITH h AS (
       |  SELECT doc_id, phash
       |  FROM ${d.parquet(s"$mmOracleRoot/$oracleSfTag/$name")}),
       |b AS (
       |  SELECT doc_id, phash, r.band AS band,
       |    ${d.shiftRight("phash", "CAST(r.band AS INTEGER) * 16")} & 65535
       |      AS key
       |  FROM h CROSS JOIN ${d.range0(4, "band")} r)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  bit_count(${d.xor("x.phash", "y.phash")}) AS hamming
       |FROM b x JOIN b y
       |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
       |WHERE bit_count(${d.xor("x.phash", "y.phash")}) <= 3""".stripMargin

  /** The SQL facade's phash statement for `sfDir`: materialize the
    * image-hash table (planted copies included — the SAME input the
    * programmatic q_multimodal_phash pairs over), then render the
    * banded-hamming statement against it in the Spark dialect. Called
    * by [[graft.sql.GraftSql]] at statement-resolution time, so the
    * text always points at the table just written for THIS sf dir.
    */
  def phashSqlFace(spark: SparkSession, sfDir: String): String = {
    oracleHashes(
      imageHashes(spark, withPlantedCopies(bmpFixtures(docs(spark, sfDir)))),
      sfDir, "image_hashes")
    bandedHammingSqlText(graft.sql.Dialect.spark, "image_hashes")
  }

  private def withPlantedCopies(media: DataFrame): DataFrame =
    media.unionByName(
      media.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("media")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_phash" -> ((s, d) =>
      bandedHammingPairs(
        oracleHashes(imageHashes(s, withPlantedCopies(bmpFixtures(docs(s, d)))),
          d, "image_hashes"), maxHamming = 3, nBands = 4)),
    "q_multimodal_audio_dup" -> ((s, d) =>
      bandedHammingPairs(
        oracleHashes(audioHashes(s, withPlantedCopies(wavFixtures(docs(s, d)))),
          d, "audio_hashes"), maxHamming = 3, nBands = 4)),
    "q_multimodal_video_dup" -> ((s, d) =>
      bandedHammingPairs(
        oracleHashes(videoHashes(s, withPlantedCopies(y4mFixtures(docs(s, d)))),
          d, "video_hashes"), maxHamming = 3, nBands = 4)),
    "q_multimodal_luma" -> ((s, d) => lumaStats(s, docs(s, d))),
    "q_multimodal_downsample" -> ((s, d) => audioDownsample(s, docs(s, d))),
    "q_multimodal_quarantine" -> ((s, d) => quarantineStats(s, docs(s, d))),
    "q_multimodal_video" -> ((s, d) => videoStats(s, docs(s, d))),
    "q_multimodal_scenes" -> ((s, d) => sceneCuts(s, docs(s, d))),
    "q_multimodal_vad" -> ((s, d) => audioVad(s, docs(s, d))),
    "q_multimodal_audio" -> ((s, d) => audioStats(s, docs(s, d))),
    "q_multimodal_batches" -> ((s, d) => inferenceBatches(docs(s, d))),
    "q_multimodal_meta" -> ((s, d) => mediaMeta(docs(s, d))),
    "q_multimodal_frames" -> ((s, d) => frameSample(docs(s, d))),
    "q_multimodal_decode" -> ((s, d) => decodedStats(s, docs(s, d))),
    "q_multimodal_resize" -> ((s, d) => resizedStats(s, docs(s, d))))

  // `def`, not `val`: the three bandedHammingSql entries embed
  // oracleSfTag, which the trio queries set at materialization time —
  // a val would freeze the fallback tag at object init, before any
  // query ran.
  def oracleSql: Map[String, String] = Map(
    "q_multimodal_phash" -> bandedHammingSql("image_hashes"),
    "q_multimodal_audio_dup" -> bandedHammingSql("audio_hashes"),
    "q_multimodal_video_dup" -> bandedHammingSql("video_hashes"),
    "q_multimodal_luma" -> lumaStatsSql,
    "q_multimodal_downsample" -> audioDownsampleSql,
    "q_multimodal_quarantine" -> quarantineStatsSql,
    "q_multimodal_video" -> videoStatsSql,
    "q_multimodal_scenes" -> sceneCutsSql,
    "q_multimodal_vad" -> audioVadSql,
    "q_multimodal_audio" -> audioStatsSql,
    "q_multimodal_batches" -> inferenceBatchesSql,
    "q_multimodal_meta" -> mediaMetaSql,
    "q_multimodal_frames" -> frameSampleSql,
    "q_multimodal_decode" -> decodedStatsSql,
    "q_multimodal_resize" -> resizedStatsSql)
}
