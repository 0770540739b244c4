package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -0.5f, 0.0f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("vec_dot equals the composable aggregate/zip_with form exactly") {
    val composable = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = vecs.select(vec_dot(col("a"), col("b")).as("native"),
      composable.as("composed")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.head.getDouble(0) == 32.0)
  }

  test("vec_cosine of a vector with itself is 1") {
    val c = vecs.select(vec_cosine(col("a"), col("a"))).as[Double].collect()
    c.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("null and mismatched-length inputs behave safely") {
    val withNull = Seq((Array(1.0f), null: Array[Float])).toDF("a", "b")
    assert(withNull.select(vec_dot(col("a"), col("b"))).collect().head.isNullAt(0))
    val mismatch = Seq((Array(1.0f, 2.0f), Array(3.0f))).toDF("a", "b")
    assert(mismatch.select(vec_dot(col("a"), col("b"))).as[Double].head() == 3.0)
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vec_dot(a, b) FROM vecs WHERE id = 1").as[Double].head()
    assert(r == 32.0)
  }

  test("expression stays inside whole-stage codegen") {
    // A local Seq collapses to LocalTableScan before codegen; use a real
    // parquet scan like production plans do.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = emb.select(vec_dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vec_dot"), plan)
    // and the result is sane on real data (unit-ish norms)
    val d = emb.limit(5).select(vec_dot(col("embedding"), col("embedding")))
      .as[Double].collect()
    d.foreach(v => assert(v > 0.5 && v < 2.0))
  }
}
