package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.json.
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * training-data-pipeline operator) expressed Spark-first over the
  * driver's testdata tables; `oracleSql` holds the DuckDB-equivalent
  * ANSI SQL for the hash-compare correctness gate. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_j1_dim_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CrawlRelational.queries ++
      graft.queries.PipelineOps.queries

  def oracleSql: Map[String, String] =
    graft.queries.CrawlRelational.oracle ++
      graft.queries.PipelineOps.oracle
}
