package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Stage-level scaling diagnostics for the p01 funnel's filter terms
  * (kept alongside `QuickProbe __stages=`): times the lang/quality
  * predicates and the exact-dedup window at a given corpus dir with the
  * SAME formulas the operators use. Root-cause artifact for the r8
  * regex-concurrency finding (see FastCount scaladoc). */
object P01Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.RegexpFunctions.regexp_count_fast
    val docs = Tables.documents(spark, dir)
    val langPatterns = Seq(
      "en" -> "\\b(the|and|of|to|in|is|a)\\b",
      "de" -> "\\b(der|die|das|und|ist|ein)\\b",
      "es" -> "\\b(el|la|los|de|que|es|un)\\b",
      "fr" -> "\\b(le|la|les|des|est|une|et)\\b")
    def scoreCol(pat: String): Column = regexp_count_fast(lower(col("text")), pat)
    val best = greatest(langPatterns.map(lp => scoreCol(lp._2)): _*)
    val isEnglish = best > 0 && scoreCol(langPatterns.head._2) === best
    val nTok = regexp_count_fast(col("text"), "\\S+").cast("double")
    val nPunct = regexp_count_fast(col("text"), "[^a-zA-Z0-9\\s]").cast("double")
    val nStop = scoreCol(langPatterns.head._2).cast("double")
    val qualityBp = floor(
      (least(col("n_chars") / 500.0, lit(1.0)) * 0.4
        + (lit(1.0) - least(nPunct / greatest(nTok, lit(1.0)), lit(1.0))) * 0.3
        + least(nStop / greatest(nTok, lit(1.0)) * 5.0, lit(1.0)) * 0.3) * 10000)
      .cast("long")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"P01PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    (1 to 2).foreach { pass =>
      t(s"pass$pass s1_count")(docs.filter(isEnglish).count())
      t(s"pass$pass s2_count")(docs.filter(isEnglish).filter(qualityBp >= 6000L).count())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(regexp_replace(lower(col("text")), "\\s+", " ")))
        .orderBy(col("doc_id").asc)
      var s3cp: org.apache.spark.sql.DataFrame = null
      t(s"pass$pass s3_checkpoint") {
        s3cp = docs.filter(isEnglish).filter(qualityBp >= 6000L)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .localCheckpoint(true)
      }
      t(s"pass$pass s3_count")(s3cp.count())
      s3cp.unpersist(true)
    }
    spark.stop()
  }
}
