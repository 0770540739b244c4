package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Decoded media metadata — the typed result of the decode stage. */
final case class MediaMeta(
    media_id: Long,
    n_bytes: Int,
    width: Int,
    height: Int,
    format: String)

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (see [[MultimodalOps.decodeStub]]) —
  * but everything Spark-side is real and tested: the binary column
  * derivation, the `mapPartitions` batch shape (one decoder instance per
  * partition, streamed rows, typed `Dataset[MediaMeta]` out — exactly how
  * a JNI/FFI decoder would be mounted), and the downstream metadata
  * queries. Swapping the stub for a real decoder changes no plumbing.
  *
  * The stub derives metadata deterministically from the bytes (length +
  * md5), so a DuckDB oracle verifies the whole pipeline end-to-end.
  */
object MultimodalOps {

  /** STUB decode: a real implementation would parse the image header.
    * width  = 64 + n %  449, height = 64 + 7n % 449,
    * format = md5 first hex digit mod 3 → jpeg|png|webp. */
  def decodeStub(digest: MessageDigest, bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    digest.reset()
    val hex0 = "0123456789abcdef".indexOf(
      String.format("%02x", Byte.box(digest.digest(bytes)(0))).charAt(0))
    val fmt = (hex0 % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    (64 + n % 449, 64 + (n * 7) % 449, fmt)
  }

  /** media table = documents' text re-materialized as a binary payload
    * (the stand-in for an image/audio blob column). */
  private def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Decode/feature-extract over binary columns via mapPartitions: one
    // decoder (here: MessageDigest) per partition, rows streamed through.
    "m01_media_decode" -> ((s, d) => {
      import s.implicits._
      media(s, d)
        .select(col("media_id").as[Long], col("content").as[Array[Byte]])
        .mapPartitions { rows =>
          val digest = MessageDigest.getInstance("MD5") // per-partition decoder
          rows.map { case (id, bytes) =>
            val (w, h, fmt) = decodeStub(digest, bytes)
            MediaMeta(id, bytes.length, w, h, fmt)
          }
        }
        .toDF()
        .orderBy("media_id").limit(200)
    }),

    // Frame sampling plan for "video" payloads: frame count derived from
    // payload size, every-10th sampling — a distributed explode, the same
    // shape real frame extraction fans out to.
    "m02_frame_sample" -> ((s, d) =>
      media(s, d)
        .withColumn("n_frames", octet_length(col("content")).cast("int") % 240 + 30)
        .withColumn("frame_idx",
          explode(sequence(lit(0), col("n_frames") - 1, lit(10))))
        .groupBy("media_id", "n_frames")
        .agg(count(lit(1)).as("n_sampled"), max("frame_idx").as("last_idx"))
        .orderBy("media_id").limit(200)),

    // Resize planning: pure-metadata transform (fit into 256x256,
    // aspect-preserving) over the decoded dimensions.
    "m03_resize_plan" -> ((s, d) => {
      import s.implicits._
      media(s, d)
        .select(col("media_id").as[Long], col("content").as[Array[Byte]])
        .mapPartitions { rows =>
          val digest = MessageDigest.getInstance("MD5")
          rows.map { case (id, bytes) =>
            val (w, h, fmt) = decodeStub(digest, bytes)
            MediaMeta(id, bytes.length, w, h, fmt)
          }
        }
        .toDF()
        .withColumn("scale", lit(256.0) / greatest(col("width"), col("height")))
        .withColumn("out_w", floor(col("width") * least(col("scale"), lit(1.0))).cast("int"))
        .withColumn("out_h", floor(col("height") * least(col("scale"), lit(1.0))).cast("int"))
        .select("media_id", "width", "height", "out_w", "out_h")
        .orderBy("media_id").limit(200)
    })
  )

  private val metaSql =
    """meta AS (
      |  SELECT doc_id AS media_id,
      |         octet_length(encode(text)) AS n_bytes,
      |         64 + octet_length(encode(text)) % 449 AS width,
      |         64 + (octet_length(encode(text)) * 7) % 449 AS height,
      |         CASE (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) % 3
      |           WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "m01_media_decode" ->
      s"WITH $metaSql SELECT media_id, n_bytes, width, height, format FROM meta ORDER BY media_id LIMIT 200",
    "m02_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |         octet_length(encode(text)) % 240 + 30 AS n_frames,
        |         unnest(generate_series(0, octet_length(encode(text)) % 240 + 29, 10)) AS frame_idx
        |  FROM documents)
        |SELECT media_id, n_frames, COUNT(*) AS n_sampled, MAX(frame_idx) AS last_idx
        |FROM f GROUP BY media_id, n_frames ORDER BY media_id LIMIT 200""".stripMargin,
    "m03_resize_plan" ->
      s"""WITH $metaSql
         |SELECT media_id, width, height,
         |  CAST(FLOOR(width * least(256.0 / greatest(width, height), 1.0)) AS INT) AS out_w,
         |  CAST(FLOOR(height * least(256.0 / greatest(width, height), 1.0)) AS INT) AS out_h
         |FROM meta ORDER BY media_id LIMIT 200""".stripMargin
  )
}
