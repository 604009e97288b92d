package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codec for canonical 16-bit PCM mono WAV (RIFF/WAVE with a
  * 16-byte "fmt " chunk, format tag 1) — the audio analog of
  * [[BmpCodec]]: the one mainstream audio container decodable
  * deterministically with no native codec library. The decoder is the
  * real thing — little-endian RIFF chunk walk, even-byte chunk
  * padding, strict header validation with loud errors (overflow-safe:
  * declared chunk sizes are range-checked in Long arithmetic, the
  * lesson of the BmpCodec width-overflow defect). The encoder exists
  * to synthesize fixtures and round-trip the decoder in tests.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, samples: Array[Short])

  /** Encode canonical mono 16-bit PCM: 12-byte RIFF header, 24-byte
    * fmt chunk, 8-byte data header + samples.
    */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                    // PCM
      .putShort(1)                    // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)         // byte rate
      .putShort(2)                    // block align
      .putShort(16)                   // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"not a canonical PCM WAV: $msg")

  /** Decode, validating every header field; any malformed input raises
    * IllegalArgumentException (the quarantine contract — callers route
    * IAE blobs aside instead of crashing the job or emitting garbage).
    */
  def decode(bytes: Array[Byte]): Wav = {
    if (bytes == null || bytes.length < 12) fail(s"too short (${
      if (bytes == null) "null" else bytes.length.toString} bytes)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (fourCC() != "RIFF") fail("missing RIFF magic")
    buf.getInt // declared RIFF size: informational, not trusted
    if (fourCC() != "WAVE") fail("missing WAVE form type")

    var sampleRate = -1
    var fmtSeen = false
    var samples: Array[Short] = null
    var off = 12L
    while (off + 8 <= bytes.length && samples == null) {
      buf.position(off.toInt)
      val id = fourCC()
      val size = buf.getInt.toLong & 0xffffffffL // u32, overflow-safe
      val body = off + 8
      if (body + size > bytes.length)
        fail(s"chunk $id declares $size bytes past end of input")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too small ($size)")
          val tag = buf.getShort
          if (tag != 1) fail(s"unsupported format tag $tag (want PCM=1)")
          val channels = buf.getShort
          if (channels != 1) fail(s"unsupported channel count $channels")
          sampleRate = buf.getInt
          if (sampleRate <= 0) fail(s"bad sample rate $sampleRate")
          buf.getInt // byte rate: not trusted
          buf.getShort // block align: not trusted
          val bits = buf.getShort
          if (bits != 16) fail(s"unsupported bit depth $bits")
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) fail("data chunk before fmt chunk")
          if (size % 2 != 0) fail(s"odd data size $size for 16-bit PCM")
          val n = (size / 2).toInt
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ => () // skip unknown chunk (LIST, cue, ...)
      }
      off = body + size + (size & 1) // RIFF pads chunks to even offsets
    }
    if (!fmtSeen) fail("no fmt chunk")
    if (samples == null) fail("no data chunk")
    Wav(sampleRate, samples)
  }
}
