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
