package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.CompletionEvent

/** Streaming analytics over engine event flows — the windowed/watermarked
  * aggregations goose cannot express (SURVEY.md §2.6) but a queue at
  * 100 TB needs: per-window throughput, failure rates, and per-queue
  * execution-time percentiles, all as late-data-tolerant streaming plans.
  *
  * Inputs are completion-event streams (e.g. the completions log read
  * with `spark.readStream`, or any Dataset[CompletionEvent] source);
  * outputs append one row per closed window once the watermark passes.
  */
object StreamingAnalytics {

  /** Completed-jobs throughput per (window, queue, terminal state).
    * Watermark bounds state: windows close `lateness` after their end. */
  def completionRates(
      events: Dataset[CompletionEvent],
      windowLen: String = "1 minute",
      lateness: String = "5 minutes"): DataFrame =
    events
      .withColumn("finished_ts", timestamp_millis(col("finishedAt")))
      .withWatermark("finished_ts", lateness)
      .groupBy(window(col("finished_ts"), windowLen),
        col("queue"), col("terminalState"))
      .agg(count(lit(1)).as("n"),
        avg("executionTimeMs").as("avg_exec_ms"),
        max("executionTimeMs").as("max_exec_ms"))

  /** Streaming exact dedup — the streaming twin of the batch d01/d03
    * operators, for ingest-time dedup of a document firehose: drop rows
    * whose normalized-content fingerprint was already seen within the
    * watermark horizon. State is bounded by the watermark (expired keys
    * are evicted), so the query runs indefinitely at firehose rates; the
    * batch dedup passes catch anything beyond the horizon. Input needs an
    * event-time column `ts` and a text column named by `textCol`. */
  def streamingDedup(
      docs: DataFrame,
      textCol: String = "text",
      lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", md5(regexp_replace(lower(col(textCol)), "\\s+", " ")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup dedup — the ingest-time twin of the batch
    * MinHash-LSH pass (d05/d09/d10): each doc gets the same salted-min
    * signature the batch operators compute (via the native
    * [[graft.functions.MinHashMd5]] expression — stateless, codegen,
    * streaming-safe), and is dropped if an earlier doc within the
    * watermark horizon shares its leading `bandWidth`-hash band. A pair
    * with shingle-Jaccard J collides with probability J^bandWidth — the
    * approximate high-precision ingest filter; the batch d10
    * verify-over-candidates pass is the backstop for band misses and
    * cross-horizon dups.
    *
    * State shape: ONE row per distinct band key within the horizon
    * (`dropDuplicatesWithinWatermark` evicts keys once the watermark
    * passes their event time), so state is bounded by ingest rate ×
    * horizon, never by stream history — the only dedup shape that runs
    * forever at firehose rates. Input needs an event-time column `ts`
    * (already watermark-castable) and a text column named by `textCol`. */
  def streamingNearDedup(
      docs: DataFrame,
      textCol: String = "text",
      lateness: String = "10 minutes",
      bandWidth: Int = 2): DataFrame = {
    import graft.operators.DedupOps.ShingleLen
    val banded = (1 to bandWidth).foldLeft(docs) { (df, i) =>
      df.withColumn(s"h$i",
        graft.functions.MinHashFunctions.minhash_md5(col(textCol), i.toString, ShingleLen))
    }
    banded
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("h1", (2 to bandWidth).map(i => s"h$i"): _*)
  }

  /** Failure ratio per window+queue (conditional aggregation — the
    * streaming twin of the console's gauges). */
  def failureRates(
      events: Dataset[CompletionEvent],
      windowLen: String = "1 minute",
      lateness: String = "5 minutes"): DataFrame =
    events
      .withColumn("finished_ts", timestamp_millis(col("finishedAt")))
      .withWatermark("finished_ts", lateness)
      .groupBy(window(col("finished_ts"), windowLen), col("queue"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("terminalState") =!= "success", 1).otherwise(0)).as("n_failed"))
      .withColumn("failure_ratio", round(col("n_failed") / col("n"), 4))
}
