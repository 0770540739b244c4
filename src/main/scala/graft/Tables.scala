package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every declared query receives `sfDir` (e.g. /root/testdata/sf0.01) and
  * reads one parquet per table. Reads are plain `spark.read.parquet` so
  * Catalyst keeps predicate pushdown / column pruning / row-group skipping
  * — at 100 TB these same loaders would point at a partitioned table root
  * and partition pruning composes for free.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Deterministic oracle parity (set per-read so a driver-owned session
    // works too): UTC session, and read the driver's TIMESTAMP(NANOS)
    // events.ts as a long — Spark has no nanosecond timestamp type.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with ts normalized to TIMESTAMP_NTZ at microsecond precision,
    * adaptively over the physical schema the generator produced:
    *   - int64 TIMESTAMP(NANOS) (read as long via nanosAsLong) →
    *     floor(ns/1000), the same truncation DuckDB applies reading nanos
    *     parquet, so oracle values align exactly;
    *   - timestamp[us]/[ms] (TimestampType or TimestampNTZType) → plain
    *     cast, already microsecond-exact.
    * NTZ (not LTZ) so round-tripped parquet reads back as naive TIMESTAMP.
    * Branching on the read dtype keeps the loader green across driver
    * testdata regenerations that flip the physical encoding.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, sfDir, "events")
    val norm = raw.schema("ts").dataType match {
      case LongType                          => timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case TimestampType | TimestampNTZType  => col("ts").cast("timestamp_ntz")
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — extend Tables.events normalization")
    }
    raw.withColumn("ts", norm)
  }
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** documents, spread to the configured shuffle parallelism when the
    * scan arrives under-split. The driver writes the corpus as ONE
    * parquet row group, so every per-doc CPU kernel downstream (MinHash
    * signatures, shingling, lang-ID regexes) would otherwise run as a
    * single task on one core; the one tiny shuffle of raw docs is noise
    * next to the per-doc work it parallelizes. A real 100 TB corpus
    * arrives in thousands of splits and takes the no-op branch. */
  def documents(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "documents")
    val target = spark.sessionState.conf.numShufflePartitions
    // Estimate the scan's split count from the file bytes (a driver-side
    // listing, ~ms) instead of `raw.rdd.getNumPartitions`: the .rdd
    // conversion planned + codegen'd a row deserializer on EVERY call
    // (~40 ms warm, ~1 s cold — visible as the `rdd` action in the
    // __stages probes of every documents query; ~130 of the declared
    // queries pay it, three bench passes each). Split math mirrors
    // FilePartition packing: bytes / maxPartitionBytes, each file
    // additionally charged openCostInBytes.
    val conf = spark.sessionState.conf
    val maxSplit = math.max(1L, conf.filesMaxPartitionBytes)
    val openCost = conf.filesOpenCostInBytes
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = fs.listStatus(p) // a plain file lists as itself
    val packed = statuses.iterator.map(s => s.getLen + openCost).sum
    val splits = math.max(1L, (packed + maxSplit - 1) / maxSplit)
    if (splits * 2 < target) raw.repartition(target) else raw
  }
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
