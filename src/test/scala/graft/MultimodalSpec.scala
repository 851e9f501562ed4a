package graft

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.attachPayload(Tables.load(spark, Sf0001, "documents"))

  test("payload metadata: n_bytes matches payload length, checksum matches poly_hash") {
    val bad = media.filter(
      col("meta.n_bytes") =!= length(col("payload")) ||
        col("meta.checksum") =!= graft.functions.GraftExpressions.poly_hash(
          decode(col("payload"), "UTF-8")
        )
    )
    assert(bad.count() == 0)
  }

  test("frameSample: frame count follows ceil(n_bytes/stride), frames bounded by frameLen") {
    val stride = 64; val frameLen = 16
    val frames = Multimodal.frameSample(media, stride, frameLen)
    val counts = frames.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    val expected = media.select(
      col("doc_id"),
      (floor((col("meta.n_bytes") - lit(1)) / lit(stride)) + lit(1)).as("exp_frames")
    )
    val joined = counts.join(expected, "doc_id")
    assert(joined.filter(col("n_frames") =!= col("exp_frames")).count() == 0)
    assert(frames.filter(length(col("frame")) > frameLen).count() == 0)
  }

  test("resizePayload truncates long payloads and pads short ones to exactly nBytes") {
    val n = 64
    val resized = Multimodal.resizePayload(media, n)
    assert(resized.filter(octet_length(col("payload_resized")) =!= n).count() == 0)
    // truncation preserves the prefix; padding appends 0x20 bytes
    val short = Multimodal.attachPayload(Seq((1L, "tiny")).toDF("doc_id", "text"))
    val row = Multimodal.resizePayload(short, 8).select("payload_resized").head().getAs[Array[Byte]](0)
    assert(row.toSeq == ("tiny" + "    ").getBytes("UTF-8").toSeq)
  }

  test("q41 pipeline: payload -> decode -> top-k is deterministic with full shape") {
    def run() = SparkEntry.queries("q41_multimodal_ann")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    val a = run(); val b = run()
    assert(a == b, "pipeline deterministic across runs")
    assert(a.length == 3 * 5, "3 queries x k=5")
  }

  // --- real codecs: synthesize genuine WAV/BMP bytes, decode them back ---

  /** A real RIFF/WAVE file: 16-bit PCM, one `fmt ` + one `data` chunk. */
  private def wavBytes(samples: Array[Short], sampleRate: Int, channels: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** A real 24bpp bottom-up BMP with the given top-down luminance rows
    * (each pixel r=g=b so luminance == the byte value / 255).
    */
  private def bmpBytes(rows: Array[Array[Int]]): Array[Byte] = {
    val h = rows.length; val w = rows.head.length
    val rowSize = ((24 * w + 31) / 32) * 4
    val buf = java.nio.ByteBuffer
      .allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
    buf.putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) { // bottom-up storage
      rows(y).foreach { v => buf.put(v.toByte).put(v.toByte).put(v.toByte) }
      buf.position(buf.position() + (rowSize - 3 * w)) // row padding
    }
    buf.array()
  }

  test("WAV codec: real RIFF/PCM bytes decode to the expected amplitude bins") {
    // mono: 4 constant-amplitude segments -> 4 bins recover them exactly
    val amps = Array(0, 8192, 16384, 32767)
    val mono = amps.flatMap(a => Array.fill(100)(a.toShort))
    val parsed = graft.operators.Codecs.parseWav(wavBytes(mono, 8000, 1))
    assert(parsed.sampleRate == 8000 && parsed.channels == 1 && parsed.mono.length == 400)
    val feats = graft.operators.Codecs.wavFeatures(wavBytes(mono, 8000, 1), 4)
    amps.zip(feats).foreach { case (a, f) => assert(math.abs(f - a / 32768.0) < 1e-6) }
    // stereo mixdown: L=v, R=-v averages to 0
    val stereo = mono.flatMap(s => Array(s, (-s).toShort))
    assert(graft.operators.Codecs.wavFeatures(wavBytes(stereo, 8000, 2), 4).forall(_ == 0f))
    // through the DataFrame contract
    val df = Seq((1L, wavBytes(mono, 8000, 1))).toDF("doc_id", "payload")
    val row = Multimodal.decodeFeaturesWav(df, dim = 4).collect().head
    assert(row.doc_id == 1L && row.features.sameElements(feats))
  }

  test("BMP codec: real 24bpp bytes decode to the expected luminance bins") {
    // 2 rows x 4 px, distinct values; bottom-up storage must be unwound to
    // top-down reading order
    val rows = Array(Array(0, 51, 102, 153), Array(204, 255, 204, 255))
    val bytes = bmpBytes(rows)
    val parsed = graft.operators.Codecs.parseBmp(bytes)
    assert(parsed.width == 4 && parsed.height == 2)
    val expected = rows.flatten.map(_ / 255.0)
    parsed.luminance.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9) }
    // 2 bins = mean of each row
    val feats = graft.operators.Codecs.bmpFeatures(bytes, 2)
    assert(math.abs(feats(0) - expected.take(4).sum / 4) < 1e-6)
    assert(math.abs(feats(1) - expected.drop(4).sum / 4) < 1e-6)
    // through the DataFrame contract
    val df = Seq((7L, bytes)).toDF("doc_id", "payload")
    val row = Multimodal.decodeFeaturesBmp(df, dim = 2).collect().head
    assert(row.doc_id == 7L && row.features.sameElements(feats))
  }

  test("WAV codec: trailing odd-sized chunk without its RIFF pad byte still parses") {
    // writers may omit the pad byte after a final odd-sized chunk; the
    // skip must clamp to the buffer instead of overrunning it
    val base = wavBytes(Array.fill[Short](8)(1000), 8000, 1)
    val extra = java.nio.ByteBuffer
      .allocate(base.length + 8 + 3) // 'LIST' + size 3 + 3 bytes, NO pad
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(base)
    extra.put("LIST".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3))
    val parsed = graft.operators.Codecs.parseWav(extra.array())
    assert(parsed.sampleRate == 8000 && parsed.mono.length == 8)
  }

  test("codecs fail loudly on malformed payloads") {
    val junk = Array.tabulate[Byte](100)(_.toByte)
    intercept[IllegalArgumentException](graft.operators.Codecs.parseWav(junk))
    intercept[IllegalArgumentException](graft.operators.Codecs.parseBmp(junk))
    intercept[IllegalArgumentException](graft.operators.Codecs.parseWav(Array[Byte](1, 2, 3)))
    // valid container, unsupported encoding (8-bit PCM) is rejected, not
    // silently misread
    val w = wavBytes(Array.fill(10)(0.toShort), 8000, 1)
    w(34) = 8 // bits-per-sample field
    intercept[IllegalArgumentException](graft.operators.Codecs.parseWav(w))
  }

  test("decode stub: deterministic, fixed dim, values in [0,1)") {
    val a = Multimodal.decodeFeaturesStub(media, dim = 8).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeaturesStub(media, dim = 8).collect().sortBy(_.doc_id)
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.doc_id == y.doc_id && x.features.sameElements(y.features))
      assert(x.features.length == 8)
      assert(x.features.forall(f => f >= 0f && f < 1f))
    }
  }
}
