package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.json.
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * training-data-pipeline operator) expressed Spark-first over the
  * driver's testdata tables; `oracleSql` holds the DuckDB-equivalent
  * ANSI SQL for the hash-compare correctness gate. */
object SparkEntry {

  /** Flagship: a full crawl (frontier→verify→robots→politeness→fetch)
    * on the sf0.001-scale synthetic world; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_crawl_results")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CrawlRelational.queries ++
      graft.queries.PipelineOps.queries ++
      graft.queries.CrawlQueries.queries

  /** DuckDB-equivalent SQL per query. The q_crawl / q_image entries
    * read oracle-expected parquet (dumped by Verify from the
    * independent single-threaded CrawlOracle) — `{OUT}` is substituted
    * with the Verify output dir at dump time. */
  def oracleSql: Map[String, String] =
    graft.queries.CrawlRelational.oracle ++
      graft.queries.PipelineOps.oracle ++
      graft.queries.CrawlExpected.oracle
}
