package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T3 multimodal-column plumbing (BASELINE.json north star): image/audio/
  * video payloads as opaque BINARY columns with typed metadata, decoded
  * partition-wise.
  *
  * The container has no codec libraries, so the decode kernel is a
  * deterministic STUB (clearly marked below); everything Spark-side —
  * the binary column, metadata schema, partition-wise batch iteration,
  * and the typed decode signature — is real and tested. At scale the
  * same shape holds: blobs stay columnar in parquet, metadata prunes
  * before any byte is decoded, and decode runs once per partition batch.
  */
object Multimodal {

  /** Synthetic payload: 16 md5 bytes of the text — a stand-in for real
    * image/audio bytes, deterministic for the oracle. */
  private def media(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "documents")
      .withColumn("md5_hex", md5(col("text").cast("binary")))
      .withColumn("payload", unhex(col("md5_hex")))
      .withColumn("modality", expr(
        """CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
             WHEN 1 THEN 'audio' ELSE 'video' END"""))

  /** Typed metadata extraction (q_multimodal_meta): width/height/frames
    * derived from header bytes — the "parse metadata without decoding"
    * pass that lets 100 TB scans prune by shape before touching pixels. */
  val qMultimodalMeta = Q(
    "q_multimodal_meta",
    (s, d) =>
      media(s, d)
        .select(
          col("doc_id"), col("modality"),
          length(col("payload")).cast("long").as("byte_len"),
          (lit(16) + (ascii(substring(col("md5_hex"), 1, 1)) % 8) * 16)
            .cast("long").as("width"),
          (lit(16) + (ascii(substring(col("md5_hex"), 2, 1)) % 8) * 16)
            .cast("long").as("height"),
          (lit(1) + ascii(substring(col("md5_hex"), 3, 1)) % 7)
            .cast("long").as("n_frames"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
              CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                   WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
              CAST(octet_length(unhex(md5(text))) AS BIGINT) AS byte_len,
              CAST(16 + (ascii(substr(md5(text), 1, 1)) % 8) * 16
                   AS BIGINT) AS width,
              CAST(16 + (ascii(substr(md5(text), 2, 1)) % 8) * 16
                   AS BIGINT) AS height,
              CAST(1 + ascii(substr(md5(text), 3, 1)) % 7
                   AS BIGINT) AS n_frames
            FROM documents
            ORDER BY doc_id NULLS FIRST"""))

  /** Decoded-frame record produced by the (stubbed) codec. */
  final case class DecodedMedia(
      doc_id: Long, modality: String, n_bytes: Int,
      mean_byte: Double, max_byte: Int)

  /** STUB decode kernel. A real build links an image/audio codec here
    * (e.g. JNI decode of the blob → pixel/sample tensors); the container
    * ships none, so this extracts deterministic byte statistics with the
    * exact same partition-batch shape a real decoder would use. */
  private def decodeStub(
      doc_id: Long, modality: String, bytes: Array[Byte]): DecodedMedia = {
    // real codec goes here: decode(bytes) → frames → features
    val unsigned = bytes.map(b => b & 0xff)
    DecodedMedia(doc_id, modality, bytes.length,
      unsigned.sum.toDouble / math.max(unsigned.length, 1),
      if (unsigned.isEmpty) 0 else unsigned.max)
  }

  /** Partition-wise batch decode (q_multimodal_decode): mapPartitions over
    * (id, modality, payload) — one iterator per partition so a real codec
    * amortizes init across the batch. No oracle (the decode kernel is
    * engine-side by design); rows-only check + ScalaTest. */
  val qMultimodalDecode = Q(
    "q_multimodal_decode",
    (s, d) => {
      import s.implicits._
      media(s, d)
        .select(col("doc_id"), col("modality"), col("payload"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions { batch =>
          // codec init would happen once here, per partition
          batch.map { case (id, mod, bytes) => decodeStub(id, mod, bytes) }
        }
        .toDF()
        .withColumn("mean_byte", round(col("mean_byte"), 6))
        .orderBy(col("doc_id"))
    },
    None)

  /** Frame sampling + resize (q_multimodal_frames): explode each video
    * payload into its frame indices, keep every 2nd frame, attach the
    * resize-target dims (half resolution, floor-to-even) and a per-frame
    * feature derived from the payload header — all metadata arithmetic,
    * so the scan prunes to video rows before any frame is materialized.
    * The pixel-level resize kernel itself lives behind the decode stub
    * (q_multimodal_decode); this is the planning/shape layer a 100 TB
    * video pipeline runs first. */
  val qMultimodalFrames = Q(
    "q_multimodal_frames",
    (s, d) =>
      media(s, d)
        .filter(col("modality") === "video")
        .withColumn("n_frames",
          (lit(1) + ascii(substring(col("md5_hex"), 3, 1)) % 7)
            .cast("long"))
        .withColumn("width",
          (lit(16) + (ascii(substring(col("md5_hex"), 1, 1)) % 8) * 16)
            .cast("long"))
        .withColumn("frame_idx",
          explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1)")))
        .filter(col("frame_idx") % 2 === 0) // sample every 2nd frame
        .select(
          col("doc_id"), col("frame_idx"), col("n_frames"),
          (col("width") / 2).cast("long").as("resized_w"),
          ((ascii(substring(col("md5_hex"), 4, 1)) +
            col("frame_idx") * 7) % 256).cast("long").as("frame_feature"))
        .orderBy(col("doc_id"), col("frame_idx")),
    Some("""SELECT doc_id, frame_idx, n_frames,
              CAST(width // 2 AS BIGINT) AS resized_w,
              CAST((ascii(substr(md5(text), 4, 1)) + frame_idx * 7) % 256
                   AS BIGINT) AS frame_feature
            FROM (
              SELECT doc_id, text,
                CAST(1 + ascii(substr(md5(text), 3, 1)) % 7 AS BIGINT)
                  AS n_frames,
                CAST(16 + (ascii(substr(md5(text), 1, 1)) % 8) * 16
                     AS BIGINT) AS width,
                unnest(generate_series(0,
                  CAST(ascii(substr(md5(text), 3, 1)) % 7 AS BIGINT)))
                  AS frame_idx
              FROM documents
              WHERE CAST(doc_id % 3 AS INT) = 2)
            WHERE frame_idx % 2 = 0
            ORDER BY doc_id NULLS FIRST, frame_idx NULLS FIRST"""))

  val all: Seq[Q] = Seq(qMultimodalMeta, qMultimodalDecode, qMultimodalFrames)
}
