package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The shared LSH→verify kernel against a plain-Scala reference: every
  * pair verifiedPairs emits must carry the exact shingle-set Jaccard of
  * the two documents, and nothing below the 0.2 threshold may survive —
  * the invariant all four consumers (d10/d13/d14/p01) now inherit from
  * one implementation. */
class DedupKernelSpec extends SparkSpec {
  import spark.implicits._

  // the operator shingles via substr(g, 8) over 1..max(len-7, 1): for
  // short docs that is one truncated shingle — mirror that exactly
  private def refShingles(text: String): Set[String] = {
    val n = math.max(text.length - 7, 1)
    (1 to n).map(g => text.substring(g - 1, math.min(g - 1 + 8, text.length))).toSet
  }

  private def jac(a: Set[String], b: Set[String]): Double = {
    val i = (a & b).size.toDouble
    BigDecimal(i / (a.size + b.size - i)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("verifiedPairs emits the exact reference Jaccard for every pair") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val other = "completely different content about spark shuffles and joins " * 4
    val texts = Seq(
      base,
      base + "tail",                  // near-dup of 0
      base.replace("quick", "rapid"), // near-dup of 0
      other,
      other + "x",                    // near-dup of 3
      "unrelated third topic entirely, short and lonely document")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    val got = DedupOps.verifiedPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty, "the seeded near-dups must surface as pairs")
    got.foreach { case ((d1, d2), j) =>
      assert(d1 < d2, "pairs are ordered")
      val expected = jac(refShingles(texts(d1.toInt)), refShingles(texts(d2.toInt)))
      assert(math.abs(j - expected) < 1e-9,
        s"pair ($d1,$d2): kernel=$j reference=$expected")
      assert(j >= 0.2, "nothing below the verify threshold may survive")
    }
    // the two seeded near-dup pairs must be among the survivors
    assert(got.contains((0L, 1L)) && got.contains((3L, 4L)))
  }
}
