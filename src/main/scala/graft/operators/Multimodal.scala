package graft.operators

import graft.functions.GraftExpressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, plus decode / feature-extract / frame-sample
  * stages. The reference's closest analog is its BLOB→bytes type handler
  * (`dump_table.py:52-53`); everything else is north-star extension.
  *
  * No image/audio codecs ship in this environment, so the DECODE step is a
  * clearly-marked deterministic stub — but the Spark-side plumbing is real:
  * schema (binary + struct metadata), partition-parallel batch iteration
  * (`mapPartitions`, the JVM analog of `mapInPandas`: one iterator per
  * partition, batch-shaped, no per-row task overhead), and column-level
  * byte ops that stay in codegen.
  */
object Multimodal {

  /** Wrap a text column as a binary payload with metadata — the ingest shape
    * a real pipeline would give images/audio: (payload, mime, meta{n_bytes,
    * checksum}).
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        GraftExpressions.poly_hash(col("text")).as("checksum")
      ).as("meta")
    )

  /** Frame/chunk sampling on the raw bytes: take `frameLen` bytes every
    * `stride` — the byte-level skeleton of video frame-sampling. Pure
    * column ops (substr on binary), no UDF.
    */
  def frameSample(media: DataFrame, stride: Int = 64, frameLen: Int = 16): DataFrame =
    media.select(
      col("doc_id"),
      posexplode(
        // an empty payload has ZERO frames (ceil(0/stride)); without the
        // guard the sequence(0,0) path would emit one phantom empty frame
        when(col("meta.n_bytes") === 0, array().cast("array<binary>"))
          .otherwise(
            transform(
              // integer division: `/` on columns is DOUBLE division, which
              // sequence() rejects (and would mis-count frames if cast blindly)
              sequence(
                lit(0),
                greatest(floor((col("meta.n_bytes") - lit(1)) / lit(stride)).cast("int"), lit(0))
              ),
              i => substring(col("payload"), (i * lit(stride) + lit(1)).cast("int"), lit(frameLen))
            )
          )
      ).as(Seq("frame_idx", "frame"))
    )

  /** Resize stage on the raw bytes: truncate-or-pad every payload to
    * exactly `nBytes` (pad byte 0x20) — the byte-level skeleton of an
    * image resize-to-fixed-shape step, and the normalization a
    * fixed-input-size feature extractor needs before batching. Pure
    * binary column ops (substring + rpad on BINARY), codegen'd, no UDF.
    */
  def resizePayload(media: DataFrame, nBytes: Int): DataFrame =
    media.select(
      col("doc_id"),
      expr(s"rpad(substring(payload, 1, $nBytes), $nBytes, x'20')").as("payload_resized")
    )

  final case class MediaFeature(doc_id: Long, dim: Int, features: Array[Float])

  /** DECODE STUB — deterministic fake feature extractor.
    *
    * ??? real codec goes here: in production this body is the only thing
    * that changes (JNI/ImageIO decode → resize → embed). The surrounding
    * machinery — partition-parallel batched iteration, fixed-dim float
    * output schema, no driver involvement — is the real, tested contract.
    */
  def decodeFeaturesStub(media: DataFrame, dim: Int = 8): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val feats = Array.tabulate(dim) { j =>
            // deterministic fake: byte-sum folded per lane, NOT a real codec
            var acc = 0L
            var i = j
            while (i < bytes.length) { acc += (bytes(i) & 0xff); i += dim }
            (acc % 1000L).toFloat / 1000.0f
          }
          MediaFeature(id, dim, feats)
        }
      }
  }
}
