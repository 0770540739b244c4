package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.MinHashFunctions.minhash_md5

class MinHashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native minhash equals the explode→md5→min composable form") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val composable = docs
      .withColumn("g", explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)))))
      .withColumn("sh", col("text").substr(col("g"), lit(8)))
      .groupBy("doc_id")
      .agg(min(md5(concat(lit("1"), col("sh")))).as("h_ref"))
    val native = docs.select(col("doc_id"), minhash_md5(col("text"), "1", 8).as("h_nat"))
    val joined = composable.join(native, "doc_id")
    assert(joined.count() == docs.count())
    assert(joined.filter(col("h_ref") =!= col("h_nat")).count() == 0)
  }

  test("non-ASCII and supplementary codepoints match the composable form") {
    // é = 2 UTF-8 bytes, 🦆 = 4 bytes (surrogate pair in UTF-16): shingle
    // windows count CODEPOINTS, exactly like substr()
    val docs = Seq(
      (1L, "héllo wörld, ça va? déjà vu encore une fois"),
      (2L, "duck 🦆 pond 🦆🦆 with many ducks swimming"),
      (3L, "日本語のテキストです。これは短い文章。"),
      (4L, ""),
      (5L, "éé")
    ).toDF("doc_id", "text")
    val composable = docs
      .withColumn("g", explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)))))
      .withColumn("sh", col("text").substr(col("g"), lit(8)))
      .groupBy("doc_id")
      .agg(min(md5(concat(lit("2"), col("sh")))).as("h_ref"))
    val native = docs.select(col("doc_id"), minhash_md5(col("text"), "2", 8).as("h_nat"))
    val joined = composable.join(native, "doc_id")
    assert(joined.count() == 5) // empty text still yields one (empty) shingle
    assert(joined.filter(col("h_ref") =!= col("h_nat")).count() == 0)
    // empty text: md5(salt) by both the spec'd semantics and the native path
    val md = java.security.MessageDigest.getInstance("MD5")
    val emptyRef = md.digest("2".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val emptyNat = native.filter(col("doc_id") === 4L).collect()(0).getString(1)
    assert(emptyNat == emptyRef)
  }

  test("short and empty-ish texts produce the whole-text shingle") {
    val df = Seq((1L, "abc"), (2L, "exactly8!")).toDF("doc_id", "text")
    val r = df.select(col("doc_id"), minhash_md5(col("text"), "1", 8).as("h")).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def ref(s: String) = md.digest(("1" + s).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(r.find(_.getLong(0) == 1L).get.getString(1) == ref("abc"))
    // "exactly8!" has 9 chars → shingles "exactly8" and "xactly8!"
    val expected = Seq(ref("exactly8"), ref("xactly8!")).min
    assert(r.find(_.getLong(0) == 2L).get.getString(1) == expected)
  }
}
