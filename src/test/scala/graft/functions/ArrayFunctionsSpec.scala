package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ArrayFunctions.sorted_intersect_size

class ArrayFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_intersect_size equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(3L, 4L, 5L, 10L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array(1L)),
      (Array(7L), Array(7L))
    ).toDF("a", "b")
    val r = df.select(
      sorted_intersect_size(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    r.foreach(row => assert(row.getInt(0) == row.getInt(1)))
    assert(r.map(_.getInt(0)).toSeq == Seq(2, 0, 0, 1))
  }

  test("null input yields null") {
    val df = Seq((Array(1L), null: Array[Long])).toDF("a", "b")
    assert(df.select(sorted_intersect_size(col("a"), col("b"))).collect().head.isNullAt(0))
  }
}
