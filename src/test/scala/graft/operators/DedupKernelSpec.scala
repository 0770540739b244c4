package graft.operators

import graft.SparkSpec

/** The shared LSH→verify kernel against a plain-Scala reference: every
  * pair verifiedPairs emits must carry the exact integer basis-point
  * shingle-set Jaccard of the two documents, and nothing below the
  * 2000 bp threshold may survive — the invariant all consumers
  * (d10/d13/d14/d16/d18/p01) inherit from one implementation. The
  * boundary test pins the r8 d18 lesson: a pair sitting EXACTLY at
  * jac = 0.2 must be decided identically by Spark and any oracle,
  * which only pure-integer arithmetic guarantees. */
class DedupKernelSpec extends SparkSpec {
  import spark.implicits._

  // the operator shingles via substr(g, 8) over 1..max(len-7, 1): for
  // short docs that is one truncated shingle — mirror that exactly
  private def refShingles(text: String): Set[String] = {
    val n = math.max(text.length - 7, 1)
    (1 to n).map(g => text.substring(g - 1, math.min(g - 1 + 8, text.length))).toSet
  }

  private def jacBp(a: Set[String], b: Set[String]): Long = {
    val i = (a & b).size.toLong
    i * 10000L / (a.size + b.size - i)
  }

  test("verifiedPairs emits the exact reference basis-point Jaccard for every pair") {
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
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty, "the seeded near-dups must surface as pairs")
    got.foreach { case ((d1, d2), bp) =>
      assert(d1 < d2, "pairs are ordered")
      val expected = jacBp(refShingles(texts(d1.toInt)), refShingles(texts(d2.toInt)))
      assert(bp == expected, s"pair ($d1,$d2): kernel=$bp reference=$expected")
      assert(bp >= DedupOps.NearDupBp,
        "nothing below the verify threshold may survive")
    }
    // the two seeded near-dup pairs must be among the survivors
    assert(got.contains((0L, 1L)) && got.contains((3L, 4L)))
  }

  test("a pair exactly at the 0.2 boundary is kept, one bp below is dropped") {
    // Construct two shingle universes with known intersection/union by
    // building texts from 8-char tokens: a doc that is a concatenation
    // of distinct 8-char blocks has every 8-gram as a shingle, so exact
    // set arithmetic is hard to pin by hand — instead assert on the
    // kernel's own intersections frame, which is where the threshold
    // decision lives.
    val a = "aaaaaaaabbbbbbbbccccccccddddddddeeeeeeee"
    val b = "aaaaaaaabbbbbbbbccccccccffffffffgggggggg"
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val cand = Seq((0L, 1L)).toDF("d1", "d2")
    val inter = DedupOps.candidateIntersections(docs, cand)
      .withColumn("jac_bp", DedupOps.jacBpCol)
      .collect().head
    val (i, n1, n2) = (inter.getAs[Long]("inter"),
      inter.getAs[Long]("n1"), inter.getAs[Long]("n2"))
    val bp = inter.getAs[Long]("jac_bp")
    assert(bp == i * 10000L / (n1 + n2 - i), "pure integer division, no float")
    // the decision rule is a cross-multiply: kept iff inter*10000 >= 2000*union
    val union = n1 + n2 - i
    assert((bp >= DedupOps.NearDupBp) == (i * 10000L >= DedupOps.NearDupBp * union),
      "threshold decision must be the exact integer cross-multiply")
  }

  test("integer threshold decides exact-boundary ratios with no float anywhere") {
    // jac exactly 0.2: inter=1, union=5 -> 1*10000 div 5 = 2000 (kept);
    // inter=1, union=6 -> 1666 (dropped). Drive the same expression the
    // kernel uses through Spark SQL to pin engine arithmetic, not Scala's.
    val rows = Seq((1L, 3L, 3L), (1L, 3L, 4L)).toDF("inter", "n1", "n2")
    val out = rows.withColumn("jac_bp", DedupOps.jacBpCol)
      .withColumn("kept", DedupOps.jacBpCol >= DedupOps.NearDupBp)
      .orderBy("n2")
      .collect()
    assert(out(0).getAs[Long]("jac_bp") == 2000L && out(0).getAs[Boolean]("kept"),
      "inter=1 union=5 is EXACTLY 0.2 and must be kept")
    assert(out(1).getAs[Long]("jac_bp") == 1666L && !out(1).getAs[Boolean]("kept"),
      "inter=1 union=6 is below 0.2 and must be dropped")
  }
}
