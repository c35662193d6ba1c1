package graft.queries

import graft.crawl.{CrawlEngine, CrawlOracle}
import graft.core.{functions => gf}
import graft.ops.{ImageKernels, ImageOps}
import graft.synth.Synth
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hard correctness oracle for the crawl-engine queries: runs the
  * single-threaded reference-rules [[CrawlOracle]] (an independent
  * dataflow implementation) and materializes its expectations as
  * parquet tables. `Verify` dumps these next to the Spark outputs and
  * points the DuckDB oracle SQL at them via read_parquet, turning the
  * formerly rows-only q_crawl / q_image checks into full
  * rows+schema+hash gates. */
object CrawlExpected {

  /** Oracle fetches → the expected results table rows. */
  private def resultsDfOf(spark: SparkSession, cfg: Synth.Config,
                          o: CrawlOracle.Outcome): DataFrame = {
    import spark.implicits._
    o.fetches.map { f =>
      if (CrawlEngine.OkStatuses.contains(f.status)) {
        val id = Synth.idOf(f.normUrl).get
        val img = Synth.imageFor(cfg)(id)
        val decoded = ImageKernels.decode(img.bytes)
        val hash = java.security.MessageDigest.getInstance("SHA-256")
          .digest(img.bytes).map("%02x".format(_)).mkString
        (f.wave, f.host, f.rank, f.normUrl, f.status, img.image_id, img.fmt,
          decoded.getWidth, decoded.getHeight, img.caption,
          ImageKernels.phash64(decoded), hash)
      } else
        (f.wave, f.host, f.rank, f.normUrl, f.status, "", "", 0, 0, "", 0L, "")
    }.toDF("wave", "host", "rank", "norm_url", "status",
      "image_id", "fmt", "w", "h", "caption", "phash", "content_hash")
  }

  private def politenessDfOf(spark: SparkSession, o: CrawlOracle.Outcome): DataFrame = {
    import spark.implicits._
    o.politeness.values.toSeq
      .map(p => (p.host, p.bot_sensitivity, p.tokens_per_wave,
        p.consecutive_failures, p.bot_encounters, p.forbidden_count))
      .toDF("host", "bot_sensitivity", "tokens_per_wave",
        "consecutive_failures", "bot_encounters", "forbidden_count")
  }

  private def sourceStateDfOf(spark: SparkSession, o: CrawlOracle.Outcome): DataFrame = {
    import spark.implicits._
    o.sourceStates.values.toSeq
      .map(s => (s.source_id, s.last_wave, s.rss_consecutive_failures,
        s.rss_failure_waves.sorted.mkString(","), s.rss_missing_wave,
        s.no_effective_consecutive, s.paused_auto, s.last_successful_method,
        s.discovered_sections.mkString(","),
        s.rss_attempts, s.rss_successes, s.homepage_attempts, s.homepage_successes))
      .toDF("source_id", "last_wave", "rss_consecutive_failures",
        "rss_failure_waves", "rss_missing_wave", "no_effective_consecutive",
        "paused_auto", "last_successful_method", "discovered_sections",
        "rss_attempts", "rss_successes", "homepage_attempts", "homepage_successes")
  }

  /** Expected-table name → builder. Keys align with `q_<name>` query
    * names: oracle SQL reads `{OUT}/expected_<name>` parquet. */
  def tables(spark: SparkSession, cfg: Synth.Config): Map[String, DataFrame] = {
    import spark.implicits._
    val o = CrawlOracle.run(cfg)
    // independent scoped run: the same world restricted to one dataset
    // label — backs the q_crawl_scoped_* gates
    val oScoped = CrawlOracle.run(
      cfg.copy(datasetScope = CrawlQueries.ScopedDataset))

    val resultsDf = resultsDfOf(spark, cfg, o)

    val okImages = o.fetches.filter(f => CrawlEngine.OkStatuses.contains(f.status))
      .map { f =>
        val id = Synth.idOf(f.normUrl).get
        Synth.imageFor(cfg)(id)
      }
    val decode = okImages
      .flatMap(i => ImageOps.decodeOne(i.image_id, i.bytes, i.fmt))
      .toDF("image_id", "w", "h", "fmt", "mean_luma", "phash")
    val thumbs = okImages
      .flatMap(i => ImageOps.thumbOne(i.image_id, i.bytes, 8, 8))
      .map(t => (t.image_id, t.thumb_w, t.thumb_h, t.thumb_phash))
      .toDF("image_id", "thumb_w", "thumb_h", "thumb_phash")

    Map(
      "crawl_results" -> resultsDf,
      "crawl_status_counts" -> o.statusCounts.toSeq.toDF("status", "n"),
      "crawl_seen_by_bucket" -> o.frontier
        .groupBy(r => gf.hostBucketJvm(r.host, cfg.nBuckets))
        .map { case (b, rs) => (b, rs.size.toLong) }.toSeq
        .toDF("host_bucket", "n_seen"),
      "crawl_politeness" -> politenessDfOf(spark, o),
      "crawl_source_state" -> sourceStateDfOf(spark, o),
      // merged frontier end state — backs the M1/M2 maintenance gates
      // (the engine side recomputes from frontierCurrent; the oracle SQL
      // filters/aggregates this independently-built dump)
      "crawl_frontier" -> o.frontier
        .map(r => (r.normUrl, r.sourceId, r.status, r.discoveredWave,
          r.processedWave, r.httpStatus))
        .toDF("norm_url", "source_id", "status", "discovered_wave",
          "processed_wave", "http_status"),
      "crawl_scoped_results" -> resultsDfOf(spark, cfg, oScoped),
      "crawl_scoped_politeness" -> politenessDfOf(spark, oScoped),
      "crawl_scoped_source_state" -> sourceStateDfOf(spark, oScoped),
      "image_decode" -> decode,
      "image_thumbs" -> thumbs)
  }

  /** DuckDB oracle SQL for the crawl queries — `{OUT}` is substituted
    * with the Verify output dir at dump time. The expectation dumps
    * themselves (`expected_*`) deliberately carry NO oracle SQL: an
    * identity read of the same parquet would be a tautological gate, so
    * the driver records them as informational rows-only checks; the
    * REAL gates are the q_crawl_* / q_image_* rows, which hash-compare
    * the engine's output against these independently-computed dumps. */
  /** q_x4_content_type oracle: DuckDB re-derives the classification
    * from the expected results' captions with the same pattern seed —
    * an independent SQL implementation of the tiered detector, not a
    * file identity. */
  private val x4OracleSql: String = {
    def anyMatch(ptype: String): String =
      Synth.ContentPatterns.collect {
        case (t, kind, p) if t == ptype =>
          if (kind == "prefix") s"starts_with(lower(caption), '$p')"
          else s"contains(lower(caption), '$p')"
      }.mkString("(", " OR ", ")")
    s"""SELECT norm_url,
          CASE WHEN ${anyMatch("wire")} THEN 'wire'
               WHEN ${anyMatch("obituary")} THEN 'obituary'
               WHEN ${anyMatch("opinion")} THEN 'opinion'
               ELSE 'extracted' END AS content_type
        FROM read_parquet('{OUT}/expected_crawl_results/*.parquet')
        WHERE status IN ('extracted', 'obituary', 'opinion', 'wire')
        ORDER BY norm_url"""
  }

  /** q_telemetry_http oracle: DuckDB re-derives the per-(wave, host,
    * http_status) histogram from the expected results' status column
    * (the status → HTTP code mapping of the synthetic server). */
  private val httpTelemetryOracleSql: String =
    """SELECT wave, host,
         CASE WHEN status IN ('extracted', 'obituary', 'opinion', 'wire') THEN 200
              WHEN status = '404' THEN 404
              WHEN status = '403' THEN 403
              WHEN status = '429' THEN 429
              WHEN status = 'captcha' THEN 403
              ELSE 0 END AS http_status,
         COUNT(*) AS n
       FROM read_parquet('{OUT}/expected_crawl_results/*.parquet')
       GROUP BY 1, 2, 3
       ORDER BY 1, 2, 3"""

  /** q_t3_processing oracle: after C cycles of B-bounded oldest-first
    * stage batches, a row at processing rank r is labeled iff
    * r < (C-1)·B, cleaned iff r < C·B, else still extracted — the
    * closed form of the iterative chain, derived independently here. */
  private val t3OracleSql: String = {
    val b = CrawlQueries.T3BatchSize
    val c = CrawlQueries.T3Cycles
    s"""WITH ok AS (SELECT norm_url,
            row_number() OVER (ORDER BY wave, host, rank) - 1 AS ord
          FROM read_parquet('{OUT}/expected_crawl_results/*.parquet')
          WHERE status IN ('extracted', 'obituary', 'opinion', 'wire'))
        SELECT norm_url,
          CASE WHEN ord < ${(c - 1) * b} THEN 'labeled'
               WHEN ord < ${c * b} THEN 'cleaned'
               ELSE 'extracted' END AS article_status
        FROM ok ORDER BY norm_url"""
  }

  /** q_t3_payload oracle: the closed-form stage chain (t3OracleSql)
    * joined with a full DuckDB recompute of the X3 byline-clean rule
    * chain (PipelineOps.bylineChainCtes — the same builder the
    * q_x3_byline_clean oracle uses) over the byline synthesized from
    * caption words 1/3 + the processing order, and the X4 label from
    * the independently-computed expected status. */
  private val t3PayloadSql: String = {
    val b = CrawlQueries.T3BatchSize
    val c = CrawlQueries.T3Cycles
    s"""WITH ok AS (SELECT norm_url, caption, status,
            row_number() OVER (ORDER BY wave, host, rank) - 1 AS ord
          FROM read_parquet('{OUT}/expected_crawl_results/*.parquet')
          WHERE status IN ('extracted', 'obituary', 'opinion', 'wire')),
        st AS (SELECT norm_url, status, ord,
          CASE WHEN ord < ${(c - 1) * b} THEN 'labeled'
               WHEN ord < ${c * b} THEN 'cleaned'
               ELSE 'extracted' END AS article_status FROM ok),
        nm AS (SELECT norm_url, array_to_string(list_transform(
            [w[1], w[3]], x -> upper(x[1]) || substring(x, 2)), ' ') AS n1
          FROM (SELECT norm_url, str_split(caption, ' ') AS w FROM ok)),
        syn AS (SELECT s.norm_url, CASE CAST(s.ord % 4 AS INT)
            WHEN 0 THEN 'By ' || n1
            WHEN 1 THEN n1 || ', Staff Writer'
            WHEN 2 THEN 'Associated Press'
            ELSE n1 || ' USA TODAY' END AS byline
          FROM st s JOIN nm USING (norm_url)),
        ${PipelineOps.bylineChainCtes("norm_url")}
        SELECT s.norm_url, s.article_status,
          CASE WHEN s.article_status IN ('cleaned', 'labeled')
               THEN ${PipelineOps.bylineAuthorsCsvSql} ELSE '' END AS authors_csv,
          CASE WHEN s.article_status = 'labeled' THEN s.status ELSE '' END AS label
        FROM st s JOIN dd ON dd.norm_url = s.norm_url
        ORDER BY s.norm_url"""
  }

  /** M1/M2 oracles: DuckDB recomputes the maintenance filter+agg from
    * the independently-built expected frontier dump. The current wave
    * is derived from the data (max discovered_wave + 1 == nWaves: the
    * last wave always discovers), keeping the SQL scale-independent.
    * Engine-side parameters: M1 maxAgeWaves = 1, M2 stallWaves = 2. */
  private val m1OracleSql: String =
    """WITH f AS (SELECT * FROM read_parquet('{OUT}/expected_crawl_frontier/*.parquet')),
       cur AS (SELECT MAX(discovered_wave) AS maxw FROM f)
       SELECT source_id, COUNT(*) AS n_stale, MIN(discovered_wave) AS oldest_wave
       FROM f, cur WHERE status = 'article' AND discovered_wave < maxw
       GROUP BY source_id ORDER BY source_id"""

  /** M3 oracle: the frontier after null-payload repair, recomputed in
    * SQL — the deterministic corruption rule (extracted rows with
    * phash % 7 == 0 lose their payload) applied to the independent
    * expected results dump decides which frontier rows flip back to
    * `article`. */
  private val m3OracleSql: String =
    """WITH f AS (SELECT * FROM read_parquet('{OUT}/expected_crawl_frontier/*.parquet')),
       bad AS (SELECT DISTINCT norm_url
               FROM read_parquet('{OUT}/expected_crawl_results/*.parquet')
               WHERE status = 'extracted' AND phash % 7 = 0)
       SELECT f.norm_url,
         CASE WHEN b.norm_url IS NOT NULL AND f.status = 'extracted'
              THEN 'article' ELSE f.status END AS status
       FROM f LEFT JOIN bad b ON b.norm_url = f.norm_url
       ORDER BY f.norm_url"""

  private val m2OracleSql: String =
    """WITH f AS (SELECT * FROM read_parquet('{OUT}/expected_crawl_frontier/*.parquet')),
       cur AS (SELECT MAX(discovered_wave) AS maxw FROM f)
       SELECT status, COUNT(*) AS n_stuck, MIN(discovered_wave) AS oldest_wave
       FROM f, cur WHERE status IN ('discovered', 'article') AND discovered_wave <= maxw - 1
       GROUP BY status ORDER BY status"""

  val oracle: Map[String, String] = Map(
    "q_m1_stale_breakdown" -> m1OracleSql,
    "q_m2_stuck_states" -> m2OracleSql,
    "q_m3_null_repair" -> m3OracleSql,
    "q_crawl_scoped_results" ->
      "SELECT * FROM read_parquet('{OUT}/expected_crawl_scoped_results/*.parquet')",
    "q_crawl_scoped_politeness" ->
      "SELECT * FROM read_parquet('{OUT}/expected_crawl_scoped_politeness/*.parquet')",
    "q_crawl_scoped_source_state" ->
      "SELECT * FROM read_parquet('{OUT}/expected_crawl_scoped_source_state/*.parquet')",
    "q_x4_content_type" -> x4OracleSql,
    "q_telemetry_http" -> httpTelemetryOracleSql,
    "q_t3_processing" -> t3OracleSql,
    "q_t3_payload" -> t3PayloadSql,
    "q_crawl_results" ->
      "SELECT * FROM read_parquet('{OUT}/expected_crawl_results/*.parquet')",
    "q_crawl_status_counts" ->
      "SELECT * FROM read_parquet('{OUT}/expected_crawl_status_counts/*.parquet')",
    "q_crawl_seen_by_bucket" ->
      "SELECT * FROM read_parquet('{OUT}/expected_crawl_seen_by_bucket/*.parquet')",
    "q_crawl_politeness" ->
      "SELECT * FROM read_parquet('{OUT}/expected_crawl_politeness/*.parquet')",
    "q_crawl_source_state" ->
      "SELECT * FROM read_parquet('{OUT}/expected_crawl_source_state/*.parquet')",
    "q_image_decode" ->
      "SELECT * FROM read_parquet('{OUT}/expected_image_decode/*.parquet')",
    "q_image_thumbs" ->
      "SELECT * FROM read_parquet('{OUT}/expected_image_thumbs/*.parquet')")
}
