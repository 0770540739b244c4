package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Decoded media metadata — the typed result of the decode stage. */
final case class MediaMeta(
    media_id: Long,
    width: Int,
    height: Int,
    format: String,
    n_pixels: Int)

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches.
  *
  * The codec path is REAL as of this round: payloads are genuine PNG
  * bytes (encoded per-partition with `javax.imageio` — in the JDK, no
  * external codec needed) and the decode stage recovers dimensions and
  * format by actually parsing them (`ImageIO.read` + reader format
  * probe). Image dimensions derive deterministically from each
  * document's character count, so a DuckDB oracle predicts exactly what
  * a correct decoder must recover — the decode is verified end-to-end,
  * not trusted.
  *
  * Batch shape is the one a JNI/FFI decoder mounts into: `mapPartitions`
  * with one decoder instance per partition and rows streamed through —
  * never a per-row UDF re-initializing codec state. At 100 TB the
  * payloads live in parquet binary columns; the same plan applies with
  * `spark.sql.files.maxPartitionBytes` sizing the decode batches.
  */
object MultimodalOps {

  /** m05 hot-band guard (the d09 rule for Hamming-LSH over aHashes): a
    * 16-bit band key shared by more than this many images is dropped
    * before the self-join — mass-identical content whose pairs belong to
    * exact-dup groupBy handling, and the key that otherwise turns the
    * band join quadratic (observed: the 100× replication probe OOMed the
    * unguarded join). */
  private[graft] val MediaMaxBandWidth = 20

  /** Deterministic image dimensions for a doc of `n` chars (32..287 px —
    * big enough that resize-to-fit has both shrink and no-op cases). */
  def dimsOf(n: Int): (Int, Int) = (32 + n % 256, 32 + (n * 7) % 256)

  /** Encode one REAL PNG: dims from the char count, pixel gradient from
    * the media id (content is irrelevant to the metadata contract but
    * keeps payloads distinct and non-trivial). */
  def encodePng(id: Long, nChars: Int): Array[Byte] = {
    val (w, h) = dimsOf(nChars)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (id.toInt * 2654435761L.toInt) ^ (x * 31 + y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream(w * h / 4)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Parse real image bytes: format via reader probe, dims via full
    * decode. This is the seam a JPEG/WebP/AV1 FFI decoder replaces. */
  def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"media $id: no registered decoder for payload")
      val reader = readers.next()
      reader.setInput(iis)
      val fmt = reader.getFormatName.toLowerCase
      val img = reader.read(0)
      MediaMeta(id, img.getWidth, img.getHeight, fmt, img.getWidth * img.getHeight)
    } finally iis.close()
  }

  /** The media table: one real PNG payload per document, encoded
    * distributed (per-partition, streamed). ImageIO's disk cache is off —
    * executor-local temp IO per image would dominate the codec cost. */
  private def pngMedia(s: SparkSession, d: String): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as[Long], length(col("text")).as[Int])
      // the codec stage is CPU-bound: spread it over every core even when
      // the source collapses to few input splits (the rows entering the
      // shuffle are two scalars each — repartition cost is nil next to
      // per-image encode cost)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, n) => (id, encodePng(id, n)) }
      }
  }

  /** Opaque "video" payloads for the frame-sampling plan (binary column
    * stand-in; frame extraction itself would mount like [[decode]]). */
  private def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Decode/feature-extract over binary columns via mapPartitions: one
    // decoder per partition, rows streamed through. The bytes are real
    // PNGs and the dims/format come out of the actual decoder.
    "m01_media_decode" -> ((s, d) => {
      import s.implicits._
      pngMedia(s, d)
        .mapPartitions { rows =>
          ImageIO.setUseCache(false)
          rows.map { case (id, bytes) => decode(id, bytes) }
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

    // Real resize: decode, scale to fit 128x128 (aspect-preserving, never
    // upscale), and report the dimensions MEASURED off the resized
    // raster — the oracle's floor(w*scale) formula only matches if the
    // resample actually happened at the right size.
    "m03_resize_plan" -> ((s, d) => {
      import s.implicits._
      pngMedia(s, d)
        .mapPartitions { rows =>
          ImageIO.setUseCache(false)
          rows.map { case (id, bytes) =>
            val img = ImageIO.read(new ByteArrayInputStream(bytes)) // one decode
            val (w, h) = (img.getWidth, img.getHeight)
            val scale = math.min(128.0 / math.max(w, h), 1.0)
            val (ow, oh) = (math.floor(w * scale).toInt, math.floor(h * scale).toInt)
            val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try g.drawImage(img, 0, 0, ow, oh, null)
            finally g.dispose()
            (id, w, h, out.getWidth, out.getHeight)
          }
        }
        .toDF("media_id", "width", "height", "out_w", "out_h")
        .orderBy("media_id").limit(200)
    }),

    // Perceptual hash (aHash): decode the PNG, sample an 8×8 luminance
    // grid off the REAL raster, threshold each cell against the grid
    // mean — the image near-dup fingerprint a 100 TB multimodal dedup
    // runs before a d07-style Hamming bucket join (64-bit sketches
    // instead of megapixel payloads). Published as a 64-char bit string
    // (no 64-bit sign-overflow games in either engine). The test
    // pattern's pixels are deterministic arithmetic in (id, x, y), so
    // the oracle predicts every bit without decoding — i.e. the decode +
    // sampling path is verified bit-for-bit, not trusted. Integer-only
    // threshold (64*lum >= total) keeps the compare engine-exact.
    // m04 IS the ingest-cost probe: it builds (or reads) the persisted
    // sketch artifact the rest of the image-dedup funnel rides.
    "m04_ahash" -> ((s, d) =>
      mediaSketches(s, d)
        .orderBy("media_id").limit(200)),

    // Image NEAR-dup candidates — the d07-for-pixels join the m04 sketch
    // exists to feed: band the 64-bit aHash into four 16-bit keys
    // (Hamming ≤ r pairs with r < 4·16 spread over bands must agree on
    // at least one — the standard pigeonhole LSH over Hamming space),
    // self-equi-join per band — HOT-BAND GUARDED like d09: a band key
    // shared by more than MediaMaxBandWidth images is mass-duplicated
    // content (the 100×-replication probe found exactly this: identical
    // rasters make one key quadratic while every other key stays flat),
    // and its members belong to exact-dup groupBy handling, not pairwise
    // LSH; the guard drops those keys before the self-join, mirrored in
    // the oracle, same recall trade d09 documents. Then dedupe
    // candidates and verify the exact Hamming distance on candidates
    // only (4× conv/xor/bit_count — a codegen'd scalar, never a 64-way
    // explode). At 100 TB the join carries 64-bit sketches, not
    // megapixel payloads, and surviving band keys are bounded at
    // MediaMaxBandWidth members. Output: verified near-dup pairs at
    // Hamming ≤ 8.
    "m05_ahash_neardup" -> ((s, d) => {
      val ah = mediaSketches(s, d).select("media_id", "ahash")
      val bands = ah.select(col("media_id"), col("ahash"),
        explode(expr(
          "transform(sequence(0, 3), b -> struct(b AS b, substring(ahash, b*16+1, 16) AS key))"))
          .as("bk"))
        .select(col("media_id"), col("bk.b"), col("bk.key"))
      val narrow = bands.join(
        bands.groupBy("b", "key").agg(count(lit(1)).as("width"))
          .filter(col("width") <= MediaMaxBandWidth).select("b", "key"),
        Seq("b", "key"), "left_semi")
      val cand = narrow.as("x").join(narrow.as("y"),
          col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
            col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"))
        .distinct()
      val hd = (0 to 3).map(i =>
        expr(s"bit_count(CAST(conv(substring(ah_a, ${i * 16 + 1}, 16), 2, 10) AS BIGINT)" +
          s" ^ CAST(conv(substring(ah_b, ${i * 16 + 1}, 16), 2, 10) AS BIGINT))"))
        .reduce(_ + _)
      cand
        .join(ah.select(col("media_id").as("media_a"), col("ahash").as("ah_a")), "media_a")
        .join(ah.select(col("media_id").as("media_b"), col("ahash").as("ah_b")), "media_b")
        .withColumn("hamming", hd.cast("long"))
        .filter(col("hamming") <= 8)
        .select("media_a", "media_b", "hamming")
        .orderBy("media_a", "media_b").limit(200)
    }),

    // Exact perceptual-dup groups — the branch the m05 hot-band guard
    // DEFERS to: images sharing a full 64-bit aHash are mass-duplicate
    // content, and their handling is a linear grouped rollup (one
    // shuffle keyed by the 64-bit sketch), never the pairwise join that
    // goes quadratic on them. Output per duplicated hash: member count,
    // canonical keeper (min media_id), source spread — the books a
    // multimodal prune reviews before dropping non-canonical copies
    // (d18's apply pattern in image space). Together m04→m06→m05 is the
    // complete image-dedup funnel: sketch → exact groups → near-dup
    // pairs on what's left.
    "m06_phash_dup_groups" -> ((s, d) => {
      val src = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), col("source"))
      mediaSketches(s, d).select("media_id", "ahash")
        .join(src, "media_id")
        .groupBy("ahash")
        .agg(count(lit(1)).as("n_media"),
          min("media_id").as("canonical"),
          countDistinct("source").as("n_sources"))
        .filter(col("n_media") >= 2)
        .orderBy(col("n_media").desc, col("ahash").asc)
        .limit(100)
    }),

    // Decode-failure quarantine — the media twin of e2e_jsonl_ingest's
    // corrupt-record branch, fault-injected so the gate PROVES the seam:
    // every 37th payload has its PNG signature zeroed before the decode
    // stage, which must route it to quarantine (no registered reader /
    // reader throws) without failing the task — at 100 TB a crawler drop
    // always contains truncated and mislabeled payloads, and one bad
    // byte must never kill a 10k-file decode stage. Per source: totals,
    // decoded, quarantined, and the quarantined id-sum (which SPECIFIC
    // payloads need a re-fetch — an id checksum the oracle can predict;
    // payload byte sizes are compression-dependent and can't be). The
    // corruption rule is deterministic arithmetic on media_id, so the
    // oracle predicts every census cell without decoding anything.
    "m07_decode_quarantine" -> ((s, d) => {
      import s.implicits._
      val outcome = pngMedia(s, d)
        .mapPartitions { rows =>
          ImageIO.setUseCache(false)
          rows.map { case (id, bytes) =>
            val payload =
              if (id % 37 == 0) {
                val c = bytes.clone()
                java.util.Arrays.fill(c, 0, math.min(8, c.length), 0.toByte)
                c
              } else bytes
            val ok =
              try { decode(id, payload); true }
              catch { case scala.util.control.NonFatal(_) => false }
            (id, ok)
          }
        }
        .toDF("media_id", "ok")
      outcome
        .join(Tables.documents(s, d)
          .select(col("doc_id").as("media_id"), col("source")), "media_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_media"),
          sum(col("ok").cast("long")).as("n_decoded"),
          sum((!col("ok")).cast("long")).as("n_quarantined"),
          sum(when(!col("ok"), col("media_id")).otherwise(lit(0L))).as("quarantined_id_sum"))
        .orderBy("source")
    })
  )

  /** Shared m04/m05 kernel: decode the PNG, sample an 8×8 luminance grid
    * off the REAL raster, threshold each cell against the grid mean —
    * the image near-dup fingerprint a 100 TB multimodal dedup runs
    * before a Hamming bucket join (64-bit sketches instead of megapixel
    * payloads). Published as a 64-char bit string (no 64-bit
    * sign-overflow games in either engine). The test pattern's pixels
    * are deterministic arithmetic in (id, x, y), so the oracle predicts
    * every bit without decoding — the decode + sampling path is verified
    * bit-for-bit, not trusted. Integer-only threshold (64*lum >= total)
    * keeps the compare engine-exact. */
  /** The PERSISTED media-sketch artifact (VERDICT r8 #6; promoted to
    * the content-addressed store r14 alongside the window census): aHash
    * is computed ONCE per corpus snapshot at ingest — the s03
    * prebuilt-centroid pattern applied to pixels — written as parquet in
    * [[graft.ArtifactStore]] keyed by the documents table's file
    * manifest, and every downstream funnel stage (m05's Hamming-LSH
    * near-dup join, m06's exact-dup groups) mounts the 64-bit sketches
    * as a lazy scan, never re-decoding rasters and never pinning
    * executor blocks. m04 remains the ingest-cost probe: its FIRST
    * touch per corpus snapshot prices the decode pass the artifact
    * costs to build; later touches (and later sessions) price the
    * mounted read, which is the steady-state 100 TB shape. */
  private def mediaSketches(s: SparkSession, d: String): DataFrame =
    graft.ArtifactStore.getOrBuild(s, "media_sketches", s"$d/documents.parquet")(
      ahashed(s, d))

  private def ahashed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngMedia(s, d)
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          val lum = new Array[Int](64)
          var total = 0
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) {
              val v = img.getRGB(i * w / 8, j * h / 8) & 0xFFFFFF
              val l = (v >> 16) + ((v >> 8) & 255) + (v & 255)
              lum(j * 8 + i) = l
              total += l
              i += 1
            }
            j += 1
          }
          val bits = lum.map(l => if (l * 64 >= total) '1' else '0').mkString
          (id, w, h, bits, bits.count(_ == '1').toLong)
        }
      }
      .toDF("media_id", "width", "height", "ahash", "n_ones")
  }

  private val metaSql =
    """meta AS (
      |  SELECT doc_id AS media_id,
      |         32 + length(text) % 256 AS width,
      |         32 + (length(text) * 7) % 256 AS height
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "m01_media_decode" ->
      s"""WITH $metaSql
         |SELECT media_id, width, height, 'png' AS format,
         |       width * height AS n_pixels
         |FROM meta ORDER BY media_id LIMIT 200""".stripMargin,
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
         |  CAST(FLOOR(width * least(128.0 / greatest(width, height), 1.0)) AS INT) AS out_w,
         |  CAST(FLOOR(height * least(128.0 / greatest(width, height), 1.0)) AS INT) AS out_h
         |FROM meta ORDER BY media_id LIMIT 200""".stripMargin,
    // the encoder writes pixel (x,y) = (id32 * 2654435761_32) XOR
    // (x*31+y) into TYPE_INT_RGB; only the low 24 bits survive, and the
    // low 24 bits of the 32-bit wrap product depend only on the low 24
    // bits of each factor — so p24 = (id % 2^24) * (2654435761 % 2^24)
    // % 2^24 restates the pattern without 32-bit ints
    "m04_ahash" ->
      s"""WITH $metaSql,
         |$ahashBitsSql
         |SELECT m.media_id, m.width, m.height, b.ahash,
         |  CAST(length(replace(b.ahash, '0', '')) AS BIGINT) AS n_ones
         |FROM meta m JOIN bits b USING (media_id)
         |ORDER BY media_id LIMIT 200""".stripMargin,
    // same analytic bit prediction; Hamming via position compare over
    // candidate pairs only (the oracle's diagnostic rendering of the
    // banded join + conv/xor/bit_count verify)
    "m05_ahash_neardup" ->
      s"""WITH $metaSql,
         |$ahashBitsSql,
         |bands AS (
         |  SELECT media_id, b, substr(ahash, b*16+1, 16) AS key
         |  FROM bits, (SELECT unnest(generate_series(0, 3)) AS b)),
         |narrow AS (
         |  SELECT bands.* FROM bands
         |  JOIN (SELECT b, key FROM bands GROUP BY b, key
         |        HAVING COUNT(*) <= $MediaMaxBandWidth) w USING (b, key)),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
         |  FROM narrow a JOIN narrow b
         |    ON a.b = b.b AND a.key = b.key AND a.media_id < b.media_id),
         |ham AS (
         |  SELECT media_a, media_b,
         |    (SELECT CAST(COUNT(*) AS BIGINT)
         |     FROM unnest(generate_series(1, 64)) AS t(p)
         |     WHERE substr(x.ahash, p, 1) <> substr(y.ahash, p, 1)) AS hamming
         |  FROM cand
         |  JOIN bits x ON x.media_id = media_a
         |  JOIN bits y ON y.media_id = media_b)
         |SELECT media_a, media_b, hamming FROM ham
         |WHERE hamming <= 8
         |ORDER BY media_a, media_b LIMIT 200""".stripMargin,
    "m06_phash_dup_groups" ->
      s"""WITH $metaSql,
         |$ahashBitsSql,
         |j AS (
         |  SELECT b.media_id, b.ahash, d.source
         |  FROM bits b JOIN documents d ON d.doc_id = b.media_id)
         |SELECT ahash, CAST(COUNT(*) AS BIGINT) AS n_media,
         |  MIN(media_id) AS canonical,
         |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
         |FROM j GROUP BY ahash HAVING COUNT(*) >= 2
         |ORDER BY n_media DESC, ahash ASC LIMIT 100""".stripMargin,

    "m07_decode_quarantine" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_media,
        |  CAST(SUM(CASE WHEN doc_id % 37 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_decoded,
        |  CAST(SUM(CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
        |  CAST(SUM(CASE WHEN doc_id % 37 = 0 THEN doc_id ELSE 0 END) AS BIGINT) AS quarantined_id_sum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )

  /** Analytic aHash-bit CTE chain shared by the m04/m05 oracles (expects
    * `meta` in scope; lazy — declared after `oracles`, which references
    * it during its own initializer). */
  private lazy val ahashBitsSql =
    """grid AS (
      |  SELECT media_id, width, height, j, i,
      |    xor((media_id % 16777216) * 3635633 % 16777216,
      |        (i * width // 8) * 31 + (j * height // 8)) AS v24
      |  FROM meta,
      |       (SELECT unnest(generate_series(0, 7)) AS i),
      |       (SELECT unnest(generate_series(0, 7)) AS j)),
      |lum AS (
      |  SELECT media_id, width, height, j, i,
      |    (v24 // 65536) + ((v24 // 256) % 256) + (v24 % 256) AS l
      |  FROM grid),
      |tot AS (SELECT media_id, SUM(l) AS total FROM lum GROUP BY media_id),
      |bits AS (
      |  SELECT l.media_id,
      |    string_agg(CASE WHEN l.l * 64 >= t.total THEN '1' ELSE '0' END, ''
      |               ORDER BY l.j, l.i) AS ahash
      |  FROM lum l JOIN tot t USING (media_id) GROUP BY l.media_id)""".stripMargin
}
