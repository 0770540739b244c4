package graft

import org.apache.spark.sql.functions._

/** The SQL surface of the native expressions: every function injected by
  * [[GraftExtensions]] must be callable from `spark.sql` (the shared test
  * session is built with spark.sql.extensions=graft.GraftExtensions) and
  * agree with its DataFrame-API wrapper. */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot / rhp_sig / rhp_hamming callable from SQL, equal to the API") {
    val sf = "/root/testdata/sf0.001"
    Tables.embeddings(spark, sf).limit(20).createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      """SELECT vec_id, vec_dot(embedding, embedding) AS d,
        |       rhp_hamming(rhp_sig(embedding), rhp_sig(embedding)) AS h
        |FROM ext_emb ORDER BY vec_id""".stripMargin).collect()
    val viaApi = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"),
        functions.VectorFunctions.vec_dot(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id").collect()
    viaSql.zip(viaApi).foreach { case (s, a) =>
      assert(s.getLong(0) == a.getLong(0))
      assert(s.getDouble(1) == a.getDouble(1))
      assert(s.getInt(2) == 0, "hamming of a signature with itself is 0")
    }
  }

  test("char_entropy and minhash_md5 callable from SQL") {
    val r = spark.sql(
      "SELECT char_entropy('abcd') AS e, minhash_md5('abcdefghij', '1', 8) AS m")
      .head()
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-12)
    assert(r.getString(1).length == 32, "md5 hex signature")
  }

  test("regexp_count_fast requires a literal pattern; counts match builtin") {
    val n = spark.sql(
      """SELECT regexp_count_fast('a b  c', '\\S+') AS n""").head().getInt(0)
    assert(n == 3)
    val err = intercept[Exception] {
      spark.sql("SELECT regexp_count_fast('x', concat('a', 'b'))").collect()
    }
    assert(err.getMessage.contains("literal") ||
      err.getMessage.contains("regexp_count_fast"))
  }

  test("sorted_intersect_size callable from SQL") {
    val n = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 3L, 5L), array(3L, 4L, 5L))")
      .head().getInt(0)
    assert(n == 2)
  }

  test("registerAll is idempotent over an extensions-built session") {
    // newSession inherits the extensions; registerAll must coexist
    // (createOrReplaceTempFunction) rather than fail on the duplicate
    val s2 = spark.newSession()
    GraftExtensions.registerAll(s2)
    assert(s2.sql("SELECT char_entropy('ab')").head().getDouble(0) == 1.0)
  }
}
