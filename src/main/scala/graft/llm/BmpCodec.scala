package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codec for uncompressed 24-bit BMP (BITMAPINFOHEADER,
  * BI_RGB) — the one raster format decodable deterministically with no
  * native codec library, which is what this container has. The decoder
  * is the real thing: little-endian header parse, 4-byte row stride
  * padding, bottom-up (positive height) AND top-down (negative height)
  * row order, BGR -> RGB channel swap, strict validation with loud
  * errors. The encoder exists to synthesize fixtures and to round-trip
  * the decoder in tests.
  *
  * Output pixel layout (both directions): row-major top-down RGB,
  * index (y * width + x) * 3 + c.
  */
object BmpCodec {

  private val FileHeaderSize = 14
  private val InfoHeaderSize = 40

  /** Encode a 24bpp bottom-up BI_RGB BMP. `pixel(x, y, c)` returns the
    * channel value (c = 0 R, 1 G, 2 B) for IMAGE coordinates (origin
    * top-left); only the low 8 bits are used.
    */
  def encode(width: Int, height: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowBytes = width * 3
    val stride = (rowBytes + 3) & ~3
    val dataSize = stride * height
    val fileSize = FileHeaderSize + InfoHeaderSize + dataSize
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(fileSize)
      .putShort(0).putShort(0)
      .putInt(FileHeaderSize + InfoHeaderSize) // pixel data offset
    buf.putInt(InfoHeaderSize)
      .putInt(width).putInt(height)            // positive height = bottom-up
      .putShort(1)                             // planes
      .putShort(24)                            // bpp
      .putInt(0)                               // BI_RGB
      .putInt(dataSize)
      .putInt(2835).putInt(2835)               // 72 DPI
      .putInt(0).putInt(0)
    var stored = 0
    while (stored < height) {
      val y = height - 1 - stored // bottom-up: first stored row = bottom
      var x = 0
      while (x < width) {
        buf.put(pixel(x, y, 2).toByte) // B
        buf.put(pixel(x, y, 1).toByte) // G
        buf.put(pixel(x, y, 0).toByte) // R
        x += 1
      }
      var p = rowBytes
      while (p < stride) { buf.put(0.toByte); p += 1 }
      stored += 1
    }
    buf.array()
  }

  /** Decoded raster: top-down row-major RGB. */
  final case class Raster(width: Int, height: Int, pixels: Array[Byte])

  /** Decode a 24bpp BI_RGB BMP (either row order). Throws
    * IllegalArgumentException on anything else — a corrupt blob in a
    * 100 TB corpus should surface as a per-record error the caller can
    * route to a quarantine sink, not as silent garbage pixels.
    */
  def decode(bytes: Array[Byte]): Raster = {
    // null check FIRST (matching WavCodec/Y4mCodec): a NULL blob from
    // a nullable ingest column must surface as the contractual
    // IllegalArgumentException quarantine routing catches, not an
    // untagged NPE from bytes.length
    require(bytes != null, "null BMP blob")
    require(bytes.length >= FileHeaderSize + InfoHeaderSize,
      s"truncated BMP: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte,
      "not a BMP (missing BM magic)")
    val dataOffset = buf.getInt(10)
    val infoSize = buf.getInt(14)
    require(infoSize >= InfoHeaderSize, s"unsupported header size $infoSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(planes == 1, s"bad plane count $planes")
    require(bpp == 24, s"unsupported bpp $bpp (only 24-bit BI_RGB)")
    require(compression == 0, s"unsupported compression $compression")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dims ${width}x$rawHeight")
    // All size arithmetic in Long first: an adversarial header with
    // width > ~715M makes `width * 3` overflow Int (negative stride that
    // slips past the bounds require and dies as ArrayIndexOutOfBounds,
    // bypassing the quarantine contract above).
    // width*height ≤ 2^62 cannot overflow Long; bounding IT first makes
    // every later product (x3 for bytes, stride*height) overflow-free —
    // totalL computed directly would itself wrap for Int.MaxValue² dims.
    val whL = width.toLong * height.toLong
    require(whL <= (Int.MaxValue.toLong - 8L) / 3L,
      s"image too large: ${width}x$height (${whL} pixels)")
    val rowBytesL = width.toLong * 3L
    val strideL = (rowBytesL + 3L) & ~3L
    require(dataOffset >= FileHeaderSize + InfoHeaderSize &&
      bytes.length.toLong >= dataOffset.toLong + strideL * height,
      s"pixel data out of bounds: offset=$dataOffset stride=$strideL h=$height " +
        s"len=${bytes.length}")
    val stride = strideL.toInt
    val out = new Array[Byte](width * height * 3)
    var stored = 0
    while (stored < height) {
      val y = if (topDown) stored else height - 1 - stored
      val src = dataOffset + stored * stride
      var x = 0
      while (x < width) {
        val dst = (y * width + x) * 3
        out(dst) = bytes(src + x * 3 + 2)     // R
        out(dst + 1) = bytes(src + x * 3 + 1) // G
        out(dst + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      stored += 1
    }
    Raster(width, height, out)
  }
}
