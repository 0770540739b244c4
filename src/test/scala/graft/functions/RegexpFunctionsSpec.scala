package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import graft.functions.RegexpFunctions.regexp_count_fast

/** The fast counters must count EXACTLY like java.util.regex — they
  * replace it in every text operator, and the DuckDB oracles assume
  * regex semantics. Checked three ways: the engine's real patterns over
  * the real corpus via Spark, adversarial hand cases (unicode,
  * surrogates, boundaries), and property tests over random strings. */
class RegexpFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** Every pattern the engine counts with. */
  private val enginePatterns = Seq(
    "\\S+",
    "[^a-zA-Z0-9\\s]",
    "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]",
    "\\b(the|and|of|to|in|is|a)\\b",
    "\\b(der|die|das|und|ist|ein)\\b",
    "\\b(el|la|los|de|que|es|un)\\b",
    "\\b(le|la|les|des|est|une|et)\\b",
    // not in the fast subset — exercises the matcher fallback
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")

  private def regexCount(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  test("fast subset compiles where expected") {
    assert(FastCount.compile("\\S+") != null)
    assert(FastCount.compile("[^a-zA-Z0-9\\s]") != null)
    assert(FastCount.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]") != null)
    assert(FastCount.compile("\\b(the|and|of|to|in|is|a)\\b") != null)
    // out-of-subset shapes must fall back, not miscompile
    assert(FastCount.compile("a|b+") == null)
    assert(FastCount.compile("[a-zA-Z]{2,}") == null)
    assert(FastCount.compile("\\b[0-9]{3}\\b") == null)
    assert(FastCount.compile("x(y)z") == null)
  }

  test("engine patterns count identically to java.util.regex on the corpus") {
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect()
    for (p <- enginePatterns) {
      val compiled = Pattern.compile(p)
      val expr = RegexpCountFast(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), p)
      for (t <- texts) {
        val expected = regexCount(compiled, t)
        val got = expr.countMatches(org.apache.spark.unsafe.types.UTF8String.fromString(t))
        assert(got == expected, s"pattern $p text ${t.take(40)}...")
      }
      // lowered too (the lang patterns run on lower(text))
      for (t <- texts.take(50)) {
        val tl = t.toLowerCase
        assert(expr.countMatches(
          org.apache.spark.unsafe.types.UTF8String.fromString(tl)) ==
          regexCount(compiled, tl))
      }
    }
  }

  test("adversarial cases: unicode, surrogates, boundaries, empties") {
    val cases = Seq(
      "", " ", "\t\n\f\r", "a", "_", "the", "_the", "the_", "the the",
      "a-b_c d.e", "héllo wörld", "🦆 duck 🦆🦆 po🦆nd", "日本語 text 123",
      "the🦆and", "a1b2c3", "...!!!", "abcd", "x" * 300,
      "the-and.of to,in", "víá la nbsp", "mixed🦆_under🦆score")
    for (p <- enginePatterns; t <- cases) {
      val expected = regexCount(Pattern.compile(p), t)
      val expr = RegexpCountFast(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), p)
      val got = expr.countMatches(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(got == expected, s"pattern <$p> on <$t>: got $got expected $expected")
    }
  }

  test("random-string property: fast counters equal java.util.regex") {
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar,
      4 -> Gen.const(' '),
      2 -> Gen.oneOf(".,!?-_@#%&*()".toSeq),
      1 -> Gen.oneOf('é', 'ß', '中', '\t', '\n', ''),
      1 -> Gen.const("🦆").map(_.charAt(0))) // lone high surrogate on purpose
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val fastPatterns = enginePatterns.filter(FastCount.compile(_) != null)
    val prop = Prop.forAll(strGen, Gen.oneOf(fastPatterns)) { (s: String, p: String) =>
      val expr = RegexpCountFast(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), p)
      expr.countMatches(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) ==
        regexCount(Pattern.compile(p), s)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(result.passed, result.status.toString)
  }

  test("replace-runs equals java replaceAll on corpus and adversarial cases") {
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect().toSeq ++ Seq(
      "", " ", "ABC def!", "héllo wörld", "🦆du_ck🦆🦆", "a1 b2-c3...", "日本語123")
    for ((pat, rep) <- Seq(("[^a-z0-9 ]+", ""), ("[^a-z0-9 ]+", "_"), ("\\s+", " "))) {
      val expr = RegexpReplaceRunsFast(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), pat, rep)
      val compiled = java.util.regex.Pattern.compile(pat)
      for (t <- texts; tl <- Seq(t, t.toLowerCase)) {
        val expected = compiled.matcher(tl).replaceAll(rep)
        val got = expr.replaceRuns(
          org.apache.spark.unsafe.types.UTF8String.fromString(tl)).toString
        assert(got == expected, s"pattern <$pat> on <${tl.take(40)}>")
      }
    }
    // property trial over random strings
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar, 4 -> Gen.const(' '),
      2 -> Gen.oneOf(".,!?-_@#%&*()".toSeq),
      1 -> Gen.oneOf('é', '中', '\t'), 1 -> Gen.const('\ud83e'))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val prop = Prop.forAll(strGen) { (s: String) =>
      val expr = RegexpReplaceRunsFast(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "[^a-z0-9 ]+", "")
      expr.replaceRuns(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString ==
        java.util.regex.Pattern.compile("[^a-z0-9 ]+").matcher(s).replaceAll("")
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  test("counts match the composable size(regexp_extract_all(...)) in a plan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val joined = docs.select(
      col("doc_id"),
      regexp_count_fast(col("text"), "[^a-zA-Z0-9\\s]").as("fastc"),
      size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0))).as("refc"),
      regexp_count_fast(col("text"), "\\S+").as("fastt"),
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("reft"))
    assert(joined.filter(col("fastc") =!= col("refc") ||
      col("fastt") =!= col("reft")).count() == 0)
  }
}
