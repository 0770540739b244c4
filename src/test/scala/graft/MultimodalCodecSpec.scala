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
}
