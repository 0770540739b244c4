package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EntropyFunctionsSpec extends SparkSpec {
  import EntropyFunctions.char_entropy

  private def entropyOf(s: String): Double = {
    import spark.implicits._
    Seq(s).toDF("t").select(char_entropy(col("t"))).head.getDouble(0)
  }

  test("known distributions: uniform, constant, empty") {
    assert(entropyOf("") == 0.0)
    assert(entropyOf("aaaa") == 0.0)
    assert(math.abs(entropyOf("ab") - 1.0) < 1e-12)
    assert(math.abs(entropyOf("abcd") - 2.0) < 1e-12)
    // 2×a, 1×b, 1×c: H = 1.5 bits exactly
    assert(math.abs(entropyOf("aabc") - 1.5) < 1e-12)
  }

  test("matches a reference computation on corpus docs (codegen path)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val got = docs.select(col("doc_id"), char_entropy(col("text")).as("e"),
      col("text")).collect()
    got.foreach { r =>
      val s = r.getString(2)
      val counts = s.codePoints().toArray.groupBy(identity).values.map(_.length)
      val n = s.codePointCount(0, s.length).toDouble
      val want =
        if (n == 0) 0.0
        else (math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n) /
          math.log(2.0)
      assert(math.abs(r.getDouble(1) - want) < 1e-9, s"doc ${r.getLong(0)}")
    }
  }

  test("non-ASCII and supplementary code points count by code point") {
    // "héhé" → h:2 é:2 → 1 bit; surrogate pair (𝄞) counted once
    assert(math.abs(entropyOf("héhé") - 1.0) < 1e-12)
    val clef = new String(Character.toChars(0x1D11E))
    assert(math.abs(entropyOf(clef + "a" + clef + "a") - 1.0) < 1e-12)
  }

  test("property: permutation-invariant, bounded by log2(distinct), scale-invariant") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val s = Array.fill(n)((32 + rnd.nextInt(95)).toChar).mkString
      val h = entropyOf(s)
      val hShuffled = entropyOf(rnd.shuffle(s.toSeq).mkString)
      assert(math.abs(h - hShuffled) < 1e-9, "order cannot matter")
      val distinct = s.distinct.length
      assert(h >= -1e-12 && h <= math.log(distinct.toDouble) / math.log(2.0) + 1e-9,
        "0 <= H <= log2(|alphabet|)")
      // doubling the string doubles every count: H is unchanged
      assert(math.abs(entropyOf(s + s) - h) < 1e-9, "count-scale invariant")
    }
  }

  test("null input yields null") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("t")
      .select(char_entropy(col("t"))).head
    assert(r.isNullAt(0))
  }
}
