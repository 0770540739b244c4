package graft

import org.apache.spark.sql.types.TimestampNTZType

/** Drift defense (r7 verdict #2): the driver regenerates /root/testdata
  * between rounds and may flip a table's physical encoding (r7: events.ts
  * went int64 TIMESTAMP(NANOS) → timestamp[us], silently erroring 47
  * gates). This suite loads every `Tables.*` loader at sf0.001 and
  * asserts load + normalize succeeds, so drift fails in seconds with a
  * named table instead of as dozens of opaque gate errors — and
  * unit-tests the events-ts normalization against BOTH encodings via
  * locally written fixtures, independent of what the driver currently
  * generates.
  */
class SchemaDriftSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private val loaders: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
    "events"     -> Tables.events _,
    "orders"     -> Tables.orders _,
    "lineitem"   -> Tables.lineitem _,
    "customer"   -> Tables.customer _,
    "supplier"   -> Tables.supplier _,
    "part"       -> Tables.part _,
    "nation"     -> Tables.nation _,
    "region"     -> Tables.region _,
    "documents"  -> Tables.documents _,
    "embeddings" -> Tables.embeddings _
  )

  loaders.foreach { case (name, load) =>
    test(s"drift probe: Tables.$name loads and normalizes at sf0.001") {
      val df = load(spark, sfDir)
      // Force full analysis + one row of execution so lazy errors surface here.
      assert(df.limit(1).count() >= 0)
    }
  }

  test("events.ts normalizes to TIMESTAMP_NTZ whatever the generator produced") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampNTZType,
      s"events.ts normalized to ${df.schema("ts").dataType}, expected TIMESTAMP_NTZ")
  }

  test("events loader handles both int64-nanos and timestamp[us] encodings") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("drift-events")
    // 2024-01-02T03:04:05.123456789 as epoch nanos; µs truncation drops the 789.
    val ns = 1704164645123456789L

    val nsDir = s"$dir/ns"
    spark.range(1).select(lit(ns).as("ts"), lit("q").as("queue")).write.parquet(nsDir)
    val usDir = s"$dir/us"
    spark.range(1)
      .select(timestamp_micros(lit(ns / 1000)).cast("timestamp_ntz").as("ts"), lit("q").as("queue"))
      .write.parquet(usDir)

    def normalized(sub: String) = {
      val d = Tables.events(spark, s"$dir/$sub-root")
      // NTZ → TIMESTAMP under the UTC session keeps the same instant.
      (d.schema("ts").dataType,
        d.select(unix_micros(col("ts").cast("timestamp"))).head().getLong(0))
    }
    // Tables.events reads "$sfDir/events.parquet" — lay each fixture out that way.
    val fs = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(fs.resolve("ns-root"))
    java.nio.file.Files.createDirectories(fs.resolve("us-root"))
    java.nio.file.Files.move(fs.resolve("ns"), fs.resolve("ns-root/events.parquet"))
    java.nio.file.Files.move(fs.resolve("us"), fs.resolve("us-root/events.parquet"))

    val (nsType, nsMicros) = normalized("ns")
    val (usType, usMicros) = normalized("us")
    assert(nsType == TimestampNTZType && usType == TimestampNTZType)
    assert(nsMicros == ns / 1000L && usMicros == ns / 1000L,
      s"µs mismatch: ns=$nsMicros us=$usMicros expected ${ns / 1000L}")
  }

  test("events loader rejects an unsupported ts encoding loudly") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("drift-bad")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/root"))
    spark.range(1).select(lit("2024-01-01").as("ts")).write.parquet(s"$dir/root/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, s"$dir/root"))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
