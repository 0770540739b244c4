package graft

import graft.operators.MultimodalOps

/** The decode kernel is a REAL codec (javax.imageio): these tests prove
  * the payloads are genuine PNG containers and that decode recovers
  * exactly the dimensions the encoder drew — the property the m01/m03
  * DuckDB oracles then check end-to-end through the Spark plans. */
class MultimodalCodecSpec extends SparkSpec {

  test("PNG encode then decode round-trips dimensions and format") {
    for (n <- Seq(0, 1, 7, 255, 256, 1000, 4096)) {
      val (w, h) = MultimodalOps.dimsOf(n)
      val bytes = MultimodalOps.encodePng(n.toLong, n)
      // PNG magic: the payload is a real PNG container, not a fake
      assert((bytes(1) & 0xff) == 'P' && (bytes(2) & 0xff) == 'N' && (bytes(3) & 0xff) == 'G')
      val m = MultimodalOps.decode(n.toLong, bytes)
      assert(m.width == w && m.height == h)
      assert(m.format == "png")
      assert(m.n_pixels == w * h)
    }
  }

  test("decoder rejects a payload no registered reader understands") {
    intercept[IllegalArgumentException] {
      MultimodalOps.decode(1L, "definitely not an image".getBytes("UTF-8"))
    }
  }

  test("aHash off the decoded raster equals the hash of the drawn pattern") {
    // m04's contract: PNG round-trip is lossless for TYPE_INT_RGB, so
    // the 8×8 luminance grid sampled from DECODED pixels must equal the
    // grid computed straight from the encoder's arithmetic pattern —
    // the same prediction the DuckDB oracle makes in SQL.
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    for (id <- Seq(0L, 1L, 42L, 977L); n <- Seq(13, 300, 2048)) {
      val (w, h) = MultimodalOps.dimsOf(n)
      val img = ImageIO.read(new ByteArrayInputStream(MultimodalOps.encodePng(id, n)))
      def lumGrid(v: (Int, Int) => Int): Seq[Int] =
        for (j <- 0 until 8; i <- 0 until 8) yield {
          val p = v(i * w / 8, j * h / 8) & 0xFFFFFF
          (p >> 16) + ((p >> 8) & 255) + (p & 255)
        }
      val decoded = lumGrid((x, y) => img.getRGB(x, y))
      val drawn = lumGrid((x, y) => (id.toInt * 2654435761L.toInt) ^ (x * 31 + y))
      assert(decoded == drawn, s"id=$id n=$n: decoded raster must match the pattern")
      val total = decoded.sum
      val bits = decoded.map(l => if (l * 64 >= total) '1' else '0').mkString
      assert(bits.length == 64)
    }
  }

  test("m05 near-dup pairs equal a local brute-force over predicted hashes") {
    // Recompute every aHash from the encoder arithmetic (no Spark, no
    // decode), run the banded-candidate + Hamming-verify semantics
    // locally, and require the operator's output to match exactly —
    // including the pigeonhole property that candidate generation only
    // loses pairs with >= 1 differing bit in EVERY band (hd >= 4).
    val sf = "/root/testdata/sf0.001"
    def ahashOf(id: Long, n: Int): String = {
      val (w, h) = MultimodalOps.dimsOf(n)
      val lum = for (j <- 0 until 8; i <- 0 until 8) yield {
        val p = ((id.toInt * 2654435761L.toInt) ^ ((i * w / 8) * 31 + (j * h / 8))) & 0xFFFFFF
        (p >> 16) + ((p >> 8) & 255) + (p & 255)
      }
      val total = lum.sum
      lum.map(l => if (l * 64 >= total) '1' else '0').mkString
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "length(text) AS n").collect()
      .map(r => r.getLong(0) -> ahashOf(r.getLong(0), r.getInt(1)))
    def bandKey(h: String, k: Int): String = h.substring(k * 16, k * 16 + 16)
    // the operator's hot-band guard, restated: a (band, key) group wider
    // than MediaMaxBandWidth generates no candidates
    val widths = (for ((_, h) <- docs.toSeq; k <- 0 until 4) yield (k, bandKey(h, k)))
      .groupBy(identity).map { case (kk, v) => kk -> v.size }
    def sharesBand(a: String, b: String): Boolean =
      (0 until 4).exists(k => bandKey(a, k) == bandKey(b, k) &&
        widths((k, bandKey(a, k))) <= MultimodalOps.MediaMaxBandWidth)
    def hd(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val expected = (for {
      (ia, ha) <- docs; (ib, hb) <- docs
      if ia < ib && sharesBand(ha, hb) && hd(ha, hb) <= 8
    } yield (ia, ib, hd(ha, hb).toLong)).sortBy(p => (p._1, p._2)).take(200)
    val got = operators.MultimodalOps.queries("m05_ahash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq,
      s"operator returned ${got.length} pairs, brute force ${expected.length}")
    // sanity: the fixture actually exercises both keep and reject paths
    assert(expected.nonEmpty, "fixture must produce at least one near-dup pair")
  }
}
