package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM decoders for two public container formats — the bodies
  * that replace [[Multimodal.decodeFeaturesStub]]'s `???` slot. Both are
  * plain `java.nio` header parses (no external codec library), strict by
  * design: a malformed payload throws `IllegalArgumentException` with the
  * failing precondition rather than producing silent garbage features —
  * the caller decides whether to quarantine (filter upstream) or fail the
  * job. Pure functions of the byte array: deterministic across runs,
  * partitionings, and engines.
  *
  * Reference analog: the reference treats media as opaque LOB bytes
  * (dump_table.py:52-53); decoding is a north-star extension.
  */
object Codecs {

  /** Decoded WAV audio: PCM samples mixed down to mono, in [-1, 1]. */
  final case class WavData(sampleRate: Int, channels: Int, mono: Array[Double])

  /** Decoded BMP image: per-pixel luminance in [0, 1], row-major from the
    * TOP row (the bottom-up storage order is unwound here).
    */
  final case class BmpData(width: Int, height: Int, luminance: Array[Double])

  private def fail(cond: Boolean, msg: => String): Unit =
    if (!cond) throw new IllegalArgumentException(msg)

  /** Parse a RIFF/WAVE container with 16-bit integer PCM samples (the
    * canonical `.wav` layout): `RIFF<size>WAVE`, then chunks, of which
    * `fmt ` (format tag 1 = PCM, 16 bits/sample) and `data` (interleaved
    * little-endian samples) are consumed; unknown chunks are skipped by
    * their declared size, odd-sized chunks padded per the RIFF spec.
    */
  def parseWav(bytes: Array[Byte]): WavData = {
    fail(bytes.length >= 44, s"WAV too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    fail(fourcc() == "RIFF", "missing RIFF magic")
    buf.getInt() // declared riff payload size; tolerate truncated writers
    fail(fourcc() == "WAVE", "missing WAVE form type")
    var sampleRate = -1
    var channels = -1
    var data: Array[Byte] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || data == null)) {
      val id = fourcc()
      val size = buf.getInt()
      fail(size >= 0 && size <= buf.remaining(), s"chunk '$id' overruns payload: $size")
      id match {
        case "fmt " =>
          fail(size >= 16, s"fmt chunk too short: $size")
          // the RIFF pad byte after an odd-sized chunk may be omitted by
          // the writer when the chunk is the file's last — clamp, like
          // the data branch's hasRemaining guard
          val fmtEnd = math.min(buf.position() + size + (size & 1), buf.limit())
          val audioFormat = buf.getShort()
          fail(audioFormat == 1, s"not integer PCM: format tag $audioFormat")
          channels = buf.getShort().toInt
          fail(channels >= 1, s"bad channel count $channels")
          sampleRate = buf.getInt()
          fail(sampleRate > 0, s"bad sample rate $sampleRate")
          buf.getInt() // byte rate
          buf.getShort() // block align
          val bits = buf.getShort()
          fail(bits == 16, s"only 16-bit PCM supported, got $bits")
          buf.position(fmtEnd)
        case "data" =>
          data = new Array[Byte](size)
          buf.get(data)
          if ((size & 1) == 1 && buf.hasRemaining) buf.get()
        case _ =>
          buf.position(math.min(buf.position() + size + (size & 1), buf.limit()))
      }
    }
    fail(sampleRate > 0, "no fmt chunk")
    fail(data != null, "no data chunk")
    fail(data.length % (2 * channels) == 0, s"data size ${data.length} not frame-aligned")
    val d = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val nFrames = data.length / (2 * channels)
    val mono = new Array[Double](nFrames)
    var i = 0
    while (i < nFrames) {
      var acc = 0.0
      var c = 0
      while (c < channels) { acc += d.getShort().toDouble; c += 1 }
      mono(i) = acc / channels / 32768.0
      i += 1
    }
    WavData(sampleRate, channels, mono)
  }

  /** Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER): `BM`, pixel
    * offset at byte 10, header size 40, BI_RGB, rows stored bottom-up and
    * padded to 4-byte boundaries, pixels as BGR triples. Top-down files
    * (negative height) are honored. Luminance = ITU-R 601 integer weights
    * (299r + 587g + 114b) / 1000 / 255.
    */
  def parseBmp(bytes: Array[Byte]): BmpData = {
    fail(bytes.length >= 54, s"BMP too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    fail(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "missing BM magic")
    buf.getInt() // file size as declared
    buf.getInt() // reserved
    val pixelOffset = buf.getInt()
    val dibSize = buf.getInt()
    fail(dibSize == 40, s"only BITMAPINFOHEADER (40) supported, got $dibSize")
    val width = buf.getInt()
    val heightRaw = buf.getInt()
    val height = math.abs(heightRaw)
    val bottomUp = heightRaw > 0
    fail(width > 0 && height > 0, s"bad dimensions ${width}x$heightRaw")
    buf.getShort() // planes
    val bpp = buf.getShort()
    fail(bpp == 24, s"only 24bpp supported, got $bpp")
    val compression = buf.getInt()
    fail(compression == 0, s"only BI_RGB (0) supported, got $compression")
    val rowSize = ((24 * width + 31) / 32) * 4
    fail(
      pixelOffset >= 54 && pixelOffset.toLong + rowSize.toLong * height <= bytes.length,
      s"pixel array overruns payload (offset $pixelOffset, ${rowSize}x$height rows)"
    )
    val lum = new Array[Double](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      var base = pixelOffset + srcRow * rowSize
      var x = 0
      while (x < width) {
        val b = bytes(base) & 0xff
        val g = bytes(base + 1) & 0xff
        val r = bytes(base + 2) & 0xff
        lum(y * width + x) = (299 * r + 587 * g + 114 * b) / 1000.0 / 255.0
        base += 3
        x += 1
      }
      y += 1
    }
    BmpData(width, height, lum)
  }

  /** `dim` equal-width bin means over a signal — the shared
    * fixed-dimension featurization both decoders feed (empty bins from
    * short signals are 0). Values stay in the decoders' normalized
    * ranges.
    */
  def binMeans(signal: Array[Double], dim: Int): Array[Float] = {
    require(dim > 0, s"need dim > 0, got $dim")
    val out = new Array[Float](dim)
    val n = signal.length
    if (n == 0) return out
    var b = 0
    while (b < dim) {
      val lo = (b.toLong * n / dim).toInt
      val hi = ((b + 1).toLong * n / dim).toInt
      if (hi > lo) {
        var acc = 0.0
        var i = lo
        while (i < hi) { acc += signal(i); i += 1 }
        out(b) = (acc / (hi - lo)).toFloat
      }
      b += 1
    }
    out
  }

  /** WAV payload → `dim` mean-absolute-amplitude bins in [0, 1]. */
  def wavFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
    binMeans(parseWav(bytes).mono.map(math.abs), dim)

  /** BMP payload → `dim` mean-luminance bins in [0, 1]. */
  def bmpFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
    binMeans(parseBmp(bytes).luminance, dim)
}
