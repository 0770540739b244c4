package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: mimics the driver's t1 check — a fresh default-config
  * session (no graft-specific confs) calling SparkEntry.entry, expecting
  * rows > 0. Exercises the runtime conf path in Tables.table.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
