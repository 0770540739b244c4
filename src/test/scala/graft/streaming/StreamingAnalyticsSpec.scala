package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.model.CompletionEvent

class StreamingAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(jid: String, state: String, atSec: Long, execMs: Long = 10) =
    CompletionEvent(jid, 0, None, "q1", state, wasRetried = false, None, execMs,
      1700000000000L + atSec * 1000)

  test("watermarked completion rates close windows after lateness passes") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[CompletionEvent]
    val q = StreamingAnalytics
      .completionRates(input.toDS(), windowLen = "1 minute", lateness = "2 minutes")
      .writeStream.format("memory").queryName("rates").outputMode("append").start()
    try {
      // minute 0: two successes, one failure
      input.addData(ev("a", "success", 10), ev("b", "success", 20), ev("c", "dead", 30))
      q.processAllAvailable()
      // nothing appended yet: watermark hasn't passed window end + lateness
      assert(spark.sql("SELECT * FROM rates").count() == 0)

      // events far enough ahead to advance the watermark past minute 0
      input.addData(ev("d", "success", 400))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT terminalState, n FROM rates ORDER BY terminalState").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("dead", 1L), ("success", 2L)))
    } finally q.stop()
  }

  test("streaming dedup drops watermark-window duplicates by normalized content") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val docs = input.toDS().toDF("ts", "text")
    val q = StreamingAnalytics.streamingDedup(docs, lateness = "1 minute")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      def t(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
      input.addData(
        (t(1), "Hello  world"),
        (t(2), "hello world"), // normalized duplicate — dropped
        (t(3), "something else"))
      q.processAllAvailable()
      assert(spark.sql("SELECT DISTINCT text FROM dedup").count() == 2)
      input.addData((t(10), "HELLO   world")) // still inside the horizon
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM dedup").count() == 2)
    } finally q.stop()
  }

  test("failure ratio per window") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[CompletionEvent]
    val q = StreamingAnalytics
      .failureRates(input.toDS(), windowLen = "1 minute", lateness = "1 minute")
      .writeStream.format("memory").queryName("failrates").outputMode("append").start()
    try {
      // minute windows are epoch-aligned (a boundary falls at +40s here),
      // so keep all four events inside the [40s, 100s) window
      input.addData(ev("a", "success", 45), ev("b", "retrying", 55),
        ev("c", "dead", 65), ev("d", "success", 75))
      input.addData(ev("e", "success", 300))
      q.processAllAvailable()
      val r = spark.sql("SELECT n, n_failed, failure_ratio FROM failrates").collect()
      assert(r.length == 1)
      assert((r.head.getLong(0), r.head.getLong(1), r.head.getDouble(2)) == (4L, 2L, 0.5))
    } finally q.stop()
  }
}
