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

  /** The decode contract shared by every codec: partition-parallel batched
    * iteration (`mapPartitions` — one iterator per partition, the JVM
    * analog of `mapInPandas`), fixed-dim float output schema, no driver
    * involvement. Only `decode` differs between the stub and the real
    * codecs below.
    */
  private def decodeWith(media: DataFrame, dim: Int)(
      decode: Array[Byte] => Array[Float]
  ): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) => MediaFeature(id, dim, decode(bytes)) }
      }
  }

  /** DECODE STUB — deterministic fake feature extractor for payloads with
    * no parseable container (the fixture's synthetic bytes): byte-sum
    * folded per lane. Kept because the q41 gate needs a decode the DuckDB
    * oracle can mirror per-codepoint; real formats go through
    * [[decodeFeaturesWav]] / [[decodeFeaturesBmp]].
    */
  def decodeFeaturesStub(media: DataFrame, dim: Int = 8): Dataset[MediaFeature] =
    decodeWith(media, dim) { bytes =>
      Array.tabulate(dim) { j =>
        var acc = 0L
        var i = j
        while (i < bytes.length) { acc += (bytes(i) & 0xff); i += dim }
        (acc % 1000L).toFloat / 1000.0f
      }
    }

  /** REAL WAV decode ([[Codecs.parseWav]]: RIFF/PCM via `java.nio`) →
    * `dim` mean-absolute-amplitude bins per document. Same contract as
    * the stub; malformed payloads fail loudly inside the task.
    */
  def decodeFeaturesWav(media: DataFrame, dim: Int = 8): Dataset[MediaFeature] =
    decodeWith(media, dim)(Codecs.wavFeatures(_, dim))

  /** REAL BMP decode ([[Codecs.parseBmp]]: 24bpp BI_RGB via `java.nio`) →
    * `dim` mean-luminance bins per document. Same contract as the stub.
    */
  def decodeFeaturesBmp(media: DataFrame, dim: Int = 8): Dataset[MediaFeature] =
    decodeWith(media, dim)(Codecs.bmpFeatures(_, dim))
}
