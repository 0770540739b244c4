package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

/** The decode kernel is a REAL codec (javax.imageio): these tests prove
  * the payloads are genuine PNG containers and that decode recovers
  * exactly the dimensions the encoder drew — the property the m01/m03
  * DuckDB oracles then check end-to-end through the Spark plans. */
class MultimodalCodecSpec extends AnyFunSuite {

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
}
