package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.QueueQueries.queries, operators.QueueQueries.oracles),
      (operators.EngineE2E.queries, operators.EngineE2E.oracles),
      (operators.DedupOps.queries, operators.DedupOps.oracles),
      (operators.SimilarityOps.queries, operators.SimilarityOps.oracles),
      (operators.TextOps.queries, operators.TextOps.oracles),
      (operators.MultimodalOps.queries, operators.MultimodalOps.oracles),
      (operators.PipelineOps.queries, operators.PipelineOps.oracles),
      (operators.SqlSurfaceOps.queries, operators.SqlSurfaceOps.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed corpus-cleaning pipeline — lang-ID → quality → exact
    * dedup → LSH near-dup removal → decontamination — exercising the
    * dedup/text kernels, the native expressions and the funnel shape a
    * 100 TB pretraining ingest runs. */
  def entry(spark: SparkSession): DataFrame =
    queries("p01_clean_corpus")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
