package graft.llm

/** Pure-JVM codec for uncompressed YUV4MPEG2 (.y4m) video with 4:2:0
  * chroma — the video analog of [[BmpCodec]]/[[WavCodec]]: a real
  * container (mplayer/ffmpeg lingua franca for raw video) parseable
  * deterministically with no native library. ASCII stream header
  * (`YUV4MPEG2 W<w> H<h> F<num>:<den> ...`), then per frame a `FRAME`
  * line followed by raw planes: Y (w*h), U (w/2*h/2), V (w/2*h/2).
  * Strict validation with loud IllegalArgumentException on malformed
  * input (quarantine contract); plane sizes are range-checked in Long
  * arithmetic so adversarial W/H headers cannot overflow.
  */
object Y4mCodec {

  final case class Y4m(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      /** One Y (luma) plane per frame, row-major, w*h bytes. */
      lumaFrames: Vector[Array[Byte]])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"not a YUV4MPEG2 stream: $msg")

  /** Encode C420 with a per-frame luma function `luma(frame, x, y)`
    * (low 8 bits used); chroma planes are filled with the neutral 128.
    */
  def encode(
      width: Int, height: Int, frames: Int,
      luma: (Int, Int, Int) => Int,
      fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"C420 needs positive even dims, got ${width}x$height")
    require(frames >= 0 && fpsNum > 0 && fpsDen > 0, "bad frames/fps")
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420\n"
        .getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val ySize = width * height
    val cSize = (width / 2) * (height / 2)
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames * (frameHdr.length + ySize + 2 * cSize))
    out.put(header)
    var f = 0
    while (f < frames) {
      out.put(frameHdr)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out.put(luma(f, x, y).toByte); x += 1 }
        y += 1
      }
      var c = 0
      while (c < 2 * cSize) { out.put(128.toByte); c += 1 }
      f += 1
    }
    out.array()
  }

  def decode(bytes: Array[Byte]): Y4m = {
    if (bytes == null || bytes.length < 10) fail(s"too short (${
      if (bytes == null) "null" else bytes.length.toString} bytes)")
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      if (i >= bytes.length) fail("unterminated header line")
      i
    }
    val hEnd = lineEnd(0)
    val header = new String(bytes, 0, hEnd, "US-ASCII")
    val parts = header.split(" ")
    if (parts.head != "YUV4MPEG2") fail(s"bad magic '${parts.head.take(16)}'")
    var w = -1; var h = -1; var fn = 25; var fd = 1
    parts.tail.foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.drop(1).toIntOption.getOrElse(fail(s"bad W '$p'"))
        case 'H' => h = p.drop(1).toIntOption.getOrElse(fail(s"bad H '$p'"))
        case 'F' =>
          val Array(a, b) = {
            val s = p.drop(1).split(":", 2)
            if (s.length != 2) fail(s"bad F '$p'") else s
          }
          fn = a.toIntOption.getOrElse(fail(s"bad F '$p'"))
          fd = b.toIntOption.getOrElse(fail(s"bad F '$p'"))
        case 'C' =>
          if (p != "C420" && p != "C420jpeg" && p != "C420mpeg2")
            fail(s"unsupported chroma '$p' (want C420)")
        case _ => () // Ip/A/X params: informational
      }
    }
    if (w <= 0 || h <= 0 || w % 2 != 0 || h % 2 != 0)
      fail(s"bad C420 dims ${w}x$h")
    if (fn <= 0 || fd <= 0) fail(s"bad frame rate $fn:$fd")
    // Long math: adversarial W/H up to Int.MaxValue must not overflow
    val ySize = w.toLong * h
    val frameSize = ySize + 2 * ((w / 2).toLong * (h / 2))
    if (frameSize > Int.MaxValue) fail(s"frame size $frameSize too large")
    val frames = Vector.newBuilder[Array[Byte]]
    var off = hEnd + 1
    while (off < bytes.length) {
      val fe = lineEnd(off)
      val fLine = new String(bytes, off, fe - off, "US-ASCII")
      if (fLine != "FRAME" && !fLine.startsWith("FRAME "))
        fail(s"bad frame marker '${fLine.take(16)}'")
      val body = fe + 1L
      if (body + frameSize > bytes.length)
        fail(s"frame declares $frameSize bytes past end of input")
      frames += java.util.Arrays.copyOfRange(
        bytes, body.toInt, (body + ySize).toInt)
      off = (body + frameSize).toInt
    }
    Y4m(w, h, fn, fd, frames.result())
  }
}
