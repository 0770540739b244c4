package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Bloom membership probe's two load-bearing properties: NO false
  * negatives ever (the exactness-preserving guarantee d17 rests on),
  * and a false-positive rate near the configured budget (the artifact's
  * size/selectivity contract). Codegen and interpreted paths agree. */
class BloomFunctionsSpec extends SparkSpec {

  test("bloom_might_contain: zero false negatives, fpp near budget") {
    import spark.implicits._
    val members = (0L until 10000L).map(_ * 2654435761L).toDF("k")
    val bf = members.stat.bloomFilter("k", 10000L, 0.01)
    val bytes = BloomFunctions.serialize(bf)

    val hits = members
      .filter(BloomFunctions.bloom_might_contain(col("k"), bytes)).count()
    assert(hits == 10000L, "a Bloom filter can never miss a member")

    val nonMembers = (0L until 100000L).map(_ * 2654435761L + 1L).toDF("k")
    val fp = nonMembers
      .filter(BloomFunctions.bloom_might_contain(col("k"), bytes)).count()
    assert(fp < 100000L * 0.03,
      s"false-positive count $fp must sit near the 1% budget")
  }

  test("interpreted eval agrees with the codegen path") {
    import spark.implicits._
    val members = (1L to 500L).toDF("k")
    val bytes = BloomFunctions.serialize(members.stat.bloomFilter("k", 500L, 0.01))
    val probe = (1L to 2000L).toDF("k")
    val viaPlan = probe
      .filter(BloomFunctions.bloom_might_contain(col("k"), bytes))
      .collect().map(_.getLong(0)).toSet
    val expr = BloomMightContain(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("k")), bytes)
    val viaEval = (1L to 2000L).filter(k =>
      expr.nullSafeEval(k).asInstanceOf[Boolean]).toSet
    assert(viaPlan == viaEval)
    assert((1L to 500L).toSet.subsetOf(viaPlan), "all members present")
  }
}
