package graft.queries

import graft.core.{functions => gf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2 operator inventory, expressed over the driver's testdata
  * tables with DuckDB-checkable oracles. Mapping (testdata → crawl):
  * customer≙sources, orders≙frontier attempts, events≙fetch/telemetry
  * stream, documents≙discovered URL corpus.
  *
  * Output discipline for oracle-hash parity:
  *  - timestamps exported as epoch microseconds (unix_micros/epoch_us);
  *  - double aggregates routed through DECIMAL(18,2) so partial-agg
  *    ordering can't change low bits;
  *  - every result fully ordered by a unique key.
  */
object CrawlRelational {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  /** NTZ parquet timestamp → epoch microseconds (session TZ is UTC, so
    * this equals DuckDB's epoch_us on the same naive timestamps). */
  private def tsUs(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  /** Deterministic sum of a 2-dp double column. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  // S1+J3+O1: due-source scan — EXISTS flag, never-tried first, name tiebreak
  // (reference: discovery.py:2057-2307, SQL :2156-2207)
  val qS1SourceScan: Q = (s, dir) => {
    val c = t(s, dir, "customer").select("c_custkey", "c_name")
    val att = t(s, dir, "orders").select(col("o_custkey")).distinct()
    c.join(att, c("c_custkey") === att("o_custkey"), "left")
      .select(c("c_custkey"), c("c_name"),
        att("o_custkey").isNotNull.as("attempted"))
      .orderBy(asc("attempted"), asc("c_name"), asc("c_custkey"))
      .limit(50)
  }
  val sS1 =
    """SELECT c.c_custkey, c.c_name,
       EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS attempted
       FROM customer c
       ORDER BY attempted ASC, c_name ASC, c_custkey ASC LIMIT 50"""

  // S2+O2: FIFO verification drain (url_verification.py:185-199)
  val qS2FifoScan: Q = (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_type") === "signup")
      .select(col("event_id"), tsUs(col("ts")).as("ts_us"))
      .orderBy("ts_us", "event_id")
      .limit(100)
  val sS2 =
    """SELECT event_id, epoch_us(ts) AS ts_us FROM events
       WHERE event_type = 'signup' ORDER BY ts_us, event_id LIMIT 100"""

  // S3+O3: eligible scan with deterministic seeded mixing replacing
  // ORDER BY RANDOM() (extraction.py:876-945); overfetch ×3 of batch 30
  val qS3MixedScan: Q = (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"),
        gf.mix_key(42L, col("o_orderkey")).as("mix"))
      .orderBy("mix", "o_orderkey")
      .limit(90)
  val sS3 =
    """SELECT o_orderkey, md5('42|' || CAST(o_orderkey AS VARCHAR)) AS mix
       FROM orders WHERE o_orderstatus = 'O'
       ORDER BY mix, o_orderkey LIMIT 90"""

  // J2+U3: anti-join — frontier rows with no fetched article yet
  // (extraction.py:883-887)
  val qJ2Antijoin: Q = (s, dir) => {
    val c = t(s, dir, "customer").select("c_custkey", "c_name")
    val o = t(s, dir, "orders").select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .orderBy("c_custkey")
  }
  val sJ2 =
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey"""

  // J1+J4: star join through broadcast dimensions (discovery.py:2127-2134)
  val qJ1DimJoin: Q = (s, dir) => {
    val li = t(s, dir, "lineitem").select("l_suppkey", "l_extendedprice")
    val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val na = t(s, dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    val re = t(s, dir, "region").select("r_regionkey", "r_name")
    li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
      .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("r_name", "n_name")
  }
  val sJ1 =
    """SELECT r_name, n_name, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name ORDER BY r_name, n_name"""

  // J5+A4: fetched-article count per source (discovery.py:1965-1989)
  val qJ5CountPerSource: Q = (s, dir) => {
    val o = t(s, dir, "orders").select("o_custkey")
    val c = t(s, dir, "customer").select("c_custkey", "c_name")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("c_name").agg(count(lit(1)).as("n_fetched"))
      .orderBy("c_name")
  }
  val sJ5 =
    """SELECT c_name, COUNT(*) AS n_fetched FROM orders
       JOIN customer ON o_custkey = c_custkey
       GROUP BY c_name ORDER BY c_name"""

  // A1+O4: available work per domain, richest first (work_queue.py:177-206)
  val qA1AvailableWork: Q = (s, dir) =>
    t(s, dir, "orders").groupBy(col("o_custkey").as("source_key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 0)
      .orderBy(desc("cnt"), asc("source_key"))
  val sA1 =
    """SELECT o_custkey AS source_key, COUNT(*) AS cnt FROM orders
       GROUP BY o_custkey HAVING COUNT(*) > 0
       ORDER BY cnt DESC, source_key ASC"""

  // A2: status histogram (extraction.py:300-338)
  val qA2StatusCounts: Q = (s, dir) =>
    t(s, dir, "orders").groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n")).orderBy("status")
  val sA2 =
    """SELECT o_orderstatus AS status, COUNT(*) AS n FROM orders
       GROUP BY o_orderstatus ORDER BY status"""

  // A3: last-processed per source — the reference's N+1 loop collapsed to
  // one hash aggregate (scheduling.py:65-98)
  val qA3LastProcessed: Q = (s, dir) =>
    t(s, dir, "orders").groupBy("o_custkey")
      .agg(max(tsUs(col("o_orderdate"))).as("last_processed_us"))
      .orderBy("o_custkey")
  val sA3 =
    """SELECT o_custkey, MAX(epoch_us(o_orderdate)) AS last_processed_us
       FROM orders GROUP BY o_custkey ORDER BY o_custkey"""

  // A5: discovery-method effectiveness (telemetry.py:1777-1910)
  val qA5MethodEffectiveness: Q = (s, dir) =>
    t(s, dir, "events").groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("attempts"),
        (sum(col("value").cast(DecimalType(18, 2))) * 100).cast("long").as("sum_cents"))
      .withColumn("avg_value", col("sum_cents").cast("double") / col("attempts") / 100.0)
      .orderBy("user_id", "event_type")
  val sA5 =
    """SELECT user_id, event_type, attempts, sum_cents,
       CAST(sum_cents AS DOUBLE) / attempts / 100.0 AS avg_value FROM (
         SELECT user_id, event_type, COUNT(*) AS attempts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_cents
         FROM events GROUP BY user_id, event_type)
       ORDER BY user_id, event_type"""

  // A8: distinct active domains (work_queue.py:462-472)
  val qA8DistinctDomains: Q = (s, dir) =>
    t(s, dir, "events").agg(countDistinct(col("user_id")).as("n_domains"))
  val sA8 = "SELECT COUNT(DISTINCT user_id) AS n_domains FROM events"

  // A9: section inference — explode prefixes, count, top-15
  // (discovery.py:803-863)
  val qA9TopSections: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 5)
      .orderBy(desc("n"), asc("token"))
      .limit(15)
  val sA9 =
    """SELECT token, COUNT(*) AS n FROM (
         SELECT unnest(string_split(text, ' ')) AS token FROM documents)
       WHERE token <> '' GROUP BY token HAVING COUNT(*) >= 5
       ORDER BY n DESC, token LIMIT 15"""

  // A10: sliding-window transient-failure count, threshold 5
  // (discovery.py:1158-1316, constants :92-93)
  val qA10FailureWindow: Q = (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_type") === "error" &&
        col("ts") >= lit("2024-01-20 00:00:00").cast("timestamp"))
      .groupBy("user_id").agg(count(lit(1)).as("failures"))
      .withColumn("rss_missing", col("failures") >= 5)
      .orderBy("user_id")
  val sA10 =
    """SELECT user_id, COUNT(*) AS failures, (COUNT(*) >= 5) AS rss_missing
       FROM events WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-20 00:00:00'
       GROUP BY user_id ORDER BY user_id"""

  // A11+M1: stale-candidate breakdown (cleanup_candidates.py:82-98)
  val qA11StaleBreakdown: Q = (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_stale"),
        min(tsUs(col("o_orderdate"))).as("oldest_us"))
      .orderBy("o_custkey")
  val sA11 =
    """SELECT o_custkey, COUNT(*) AS n_stale, MIN(epoch_us(o_orderdate)) AS oldest_us
       FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY o_custkey ORDER BY o_custkey"""

  // W1: per-domain inter-request gap via lag (crawler/__init__.py:835-855)
  val qW1RateGap: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), tsUs(col("ts")).as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .select("user_id", "event_id", "gap_us")
      .orderBy("user_id", "event_id")
  }
  val sW1 =
    """SELECT user_id, event_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
       FROM events ORDER BY user_id, event_id"""

  // W2: first-occurrence dedup (source_processing.py:1271-1283)
  val qW2FirstDedup: Q = (s, dir) => {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id")
      .orderBy("user_id", "event_type")
  }
  val sW2 =
    """SELECT user_id, event_type, event_id FROM (
         SELECT user_id, event_type, event_id,
                row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
         FROM events) WHERE rn = 1 ORDER BY user_id, event_type"""

  // W3+W4: per-source top-k — the politeness token semantics
  // (work_queue.py:49-51: ≤3/domain/request)
  val qW3TopkPerSource: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
  }
  val sW3 =
    """SELECT o_custkey, o_orderkey, rn FROM (
         SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"""

  // W5: same-domain-consecutive counter (extraction.py:1021-1028)
  val qW5ConsecutiveSame: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, dir, "events")
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("event_type") === col("prev"))
      .groupBy("user_id").agg(count(lit(1)).as("consecutive_same"))
      .orderBy("user_id")
  }
  val sW5 =
    """SELECT user_id, COUNT(*) AS consecutive_same FROM (
         SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM events) WHERE event_type = prev GROUP BY user_id ORDER BY user_id"""

  // U1+U2+W2: order-preserving union of discovery methods with
  // first-method-wins dedup (source_processing.py:624-677)
  val qU1UnionDedup: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val rss = d.filter(col("lang") === "en")
      .select(col("doc_id"), lit("a_rss").as("method"))
    val homepage = d.filter(col("source").isin("src1", "src2"))
      .select(col("doc_id"), lit("b_homepage").as("method"))
    rss.unionByName(homepage)
      .groupBy("doc_id").agg(min(col("method")).as("method"))
      .orderBy("doc_id")
  }
  val sU1 =
    """SELECT doc_id, MIN(method) AS method FROM (
         SELECT doc_id, 'a_rss' AS method FROM documents WHERE lang = 'en'
         UNION ALL
         SELECT doc_id, 'b_homepage' AS method FROM documents WHERE source IN ('src1','src2'))
       GROUP BY doc_id ORDER BY doc_id"""

  // C4: SHA-256 content hash (database.py:792-794)
  val qC4ContentHash: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
      .orderBy("doc_id").limit(200)
  val sC4 =
    """SELECT doc_id, sha256(text) AS content_hash FROM documents
       ORDER BY doc_id LIMIT 200"""

  // C5+F14: publish-date extraction from URL path
  // (crawler/__init__.py:122-139)
  val qC5UrlDate: Q = (s, dir) => {
    val d = t(s, dir, "documents").select("doc_id")
    val url = concat(lit("https://h.example/"),
      (lit(2015) + col("doc_id") % 10).cast("string"), lit("/"),
      lpad((lit(1) + col("doc_id") % 12).cast("string"), 2, "0"), lit("/"),
      lpad((lit(1) + col("doc_id") % 28).cast("string"), 2, "0"),
      lit("/title-"), col("doc_id").cast("string"))
    d.withColumn("url", url)
      .select(col("doc_id"), col("url"),
        regexp_extract(col("url"), "/(\\d{4})/(\\d{1,2})/(\\d{1,2})/", 1).cast("int").as("yyyy"),
        regexp_extract(col("url"), "/(\\d{4})/(\\d{1,2})/(\\d{1,2})/", 2).cast("int").as("mm"),
        regexp_extract(col("url"), "/(\\d{4})/(\\d{1,2})/(\\d{1,2})/", 3).cast("int").as("dd"))
      .orderBy("doc_id")
  }
  val sC5 =
    """SELECT doc_id, url,
       CAST(regexp_extract(url, '/(\d{4})/(\d{1,2})/(\d{1,2})/', 1) AS INT) AS yyyy,
       CAST(regexp_extract(url, '/(\d{4})/(\d{1,2})/(\d{1,2})/', 2) AS INT) AS mm,
       CAST(regexp_extract(url, '/(\d{4})/(\d{1,2})/(\d{1,2})/', 3) AS INT) AS dd
       FROM (SELECT doc_id,
         'https://h.example/' || CAST(2015 + doc_id % 10 AS VARCHAR) || '/' ||
         lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '/' ||
         lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || '/title-' || CAST(doc_id AS VARCHAR) AS url
         FROM documents) ORDER BY doc_id"""

  // F2+C1: normalize_url — the dedup key, exercised through the native
  // Catalyst expression (url_utils.py:9-56)
  private def syntheticUrl = {
    val base = concat(lit("https://www."), col("source"),
      lit(".example/story/"), col("doc_id").cast("string"))
    when(col("doc_id") % 4 === 0, base)
      .when(col("doc_id") % 4 === 1, concat(base, lit("?utm_source=feed&x=1")))
      .when(col("doc_id") % 4 === 2, concat(base, lit("#section-2")))
      .otherwise(concat(base, lit("/")))
  }
  private val syntheticUrlSql =
    """CASE CAST(doc_id % 4 AS INT)
         WHEN 0 THEN base WHEN 1 THEN base || '?utm_source=feed&x=1'
         WHEN 2 THEN base || '#section-2' ELSE base || '/' END"""
  private val baseSql =
    """'https://www.' || source || '.example/story/' || CAST(doc_id AS VARCHAR)"""

  val qF2NormalizeUrl: Q = (s, dir) =>
    t(s, dir, "documents").select(col("doc_id"), col("source"))
      .withColumn("url", syntheticUrl)
      .select(col("doc_id"), col("url"), gf.normalize_url(col("url")).as("norm_url"))
      .orderBy("doc_id")
  val sF2 =
    s"""SELECT doc_id, url, rtrim(regexp_replace(url, '[?#].*$$', ''), '/') AS norm_url
       FROM (SELECT doc_id, $syntheticUrlSql AS url
             FROM (SELECT doc_id, $baseSql AS base, source FROM documents))
       ORDER BY doc_id"""

  // F3+C2: canonical_host — the bucket key (discovery.py:436-457)
  val qF3CanonicalHost: Q = (s, dir) => {
    val d = t(s, dir, "documents").select("doc_id", "source")
    val h = when(col("doc_id") % 4 === 0, concat(lit("www."), col("source"), lit(".Example")))
      .when(col("doc_id") % 4 === 1, concat(upper(col("source")), lit(".example:8080")))
      .when(col("doc_id") % 4 === 2, concat(lit("user:pw@"), col("source"), lit(".example")))
      .otherwise(concat(lit("https://www."), col("source"), lit(".example:443/path")))
    d.withColumn("host", h)
      .select(col("doc_id"), col("host"), gf.canonical_host(col("host")).as("canon"))
      .orderBy("doc_id")
  }
  val sF3 =
    """SELECT doc_id, host,
       CASE WHEN starts_with(x, 'www.') THEN substr(x, 5) ELSE x END AS canon
       FROM (SELECT doc_id, host,
         lower(split_part(regexp_replace(
           CASE WHEN contains(host, '//') AND NOT starts_with(host, '//')
                THEN coalesce(nullif(regexp_extract(host, '//([^/?#]*)', 1), ''), host)
                ELSE host END,
           '^.*@', ''), ':', 1)) AS x
         FROM (SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 'www.' || source || '.Example'
             WHEN 1 THEN upper(source) || '.example:8080'
             WHEN 2 THEN 'user:pw@' || source || '.example'
             ELSE 'https://www.' || source || '.example:443/path' END AS host
           FROM documents))
       ORDER BY doc_id"""

  // F4: skip-pattern substring blacklist (crawler/__init__.py:300-322)
  private val f4Paths = Seq("/news/local-story", "/category/sports", "/tag/breaking",
    "/classifieds/cars", "/stories/abc", "/about", "/2024/05/07/title")
  private def pathCase(paths: Seq[String]) = {
    val m = col("doc_id") % paths.length
    paths.zipWithIndex.tail.foldLeft(when(m === 0, lit(paths.head))) {
      case (acc, (p, i)) => acc.when(m === i, lit(p))
    }.otherwise(lit(paths.head))
  }
  private def pathCaseSql(paths: Seq[String]) =
    s"CASE CAST(doc_id % ${paths.length} AS INT) " +
      paths.zipWithIndex.map { case (p, i) => s"WHEN $i THEN '$p'" }.mkString(" ") +
      s" ELSE '${paths.head}' END"

  val qF4SkipPatterns: Q = (s, dir) =>
    t(s, dir, "documents").select("doc_id", "source")
      .withColumn("url", concat(lit("https://"), col("source"), lit(".example"), pathCase(f4Paths)))
      .filter(gf.passes_skip_patterns(col("url")))
      .select("doc_id", "url")
      .orderBy("doc_id")
  val sF4 = {
    val notContains = graft.core.UrlKernels.SkipPatterns
      .map(p => s"NOT contains(lower(url), '$p')").mkString(" AND ")
    s"""SELECT doc_id, url FROM (
         SELECT doc_id, 'https://' || source || '.example' || ${pathCaseSql(f4Paths)} AS url
         FROM documents)
       WHERE $notContains ORDER BY doc_id"""
  }

  // F5: non-article regex classifier over the path (url_classifier.py:7-95)
  private val f5Paths = Seq("/news/story-1", "/video-gallery/x", "/photos/123",
    "/archive", "/news/2024-roundup", "/doc.pdf", "/api/v1/x", "/local/heroes")
  val qF5RegexClassifier: Q = (s, dir) =>
    t(s, dir, "documents").select("doc_id")
      .withColumn("path", pathCase(f5Paths))
      .filter(gf.is_likely_article_path(col("path")))
      .select("doc_id", "path")
      .orderBy("doc_id")
  val sF5 = {
    val rx = graft.core.UrlKernels.NonArticlePathRegex
    s"""SELECT doc_id, path FROM (
         SELECT doc_id, ${pathCaseSql(f5Paths)} AS path FROM documents)
       WHERE NOT regexp_matches(lower(path), '$rx') ORDER BY doc_id"""
  }

  // F6+X1: conservative positive article check (url_filters.py:6-80)
  private val f6Paths = Seq("/stories/a-title", "/2024/05/07/x", "/news/local",
    "/tag/x", "/video/x", "/plain", "/posts/99", "/id/12345")
  val qF6ArticleCheck: Q = (s, dir) =>
    t(s, dir, "documents").select("doc_id", "source")
      .withColumn("url", concat(lit("https://"), col("source"), lit(".example"), pathCase(f6Paths)))
      .filter(gf.check_is_article(col("url")))
      .select("doc_id", "url")
      .orderBy("doc_id")
  val sF6 = {
    val negs = Seq("/search", "/tag", "/category", "/author", "/rss", "/feed",
      "/sitemap", "/page/", "/contact", "/about", "/privacy", "/advertise",
      "/sections/", ".jpg", ".png", ".gif", ".pdf", ".css", ".js", ".xml",
      "/video", "/watch/", "/videos/")
      .map(p => s"NOT contains(lower(url), '$p')").mkString(" AND ")
    raw"""SELECT doc_id, url FROM (
         SELECT doc_id, 'https://' || source || '.example' || ${pathCaseSql(f6Paths)} AS url
         FROM documents)
       WHERE $negs AND (
         regexp_matches(lower(url), '/stories?/[^/]+') OR
         regexp_matches(lower(url), '/\d{4}/\d{1,2}/\d{1,2}/') OR
         regexp_matches(lower(url), '/\d{4}-\d{1,2}-\d{1,2}/') OR
         regexp_matches(lower(url), '/news/[^/]+') OR
         regexp_matches(lower(url), '/articles?/[^/]+') OR
         regexp_matches(lower(url), '/content/[^/]+') OR
         regexp_matches(lower(url), '/posts?/[^/]+') OR
         regexp_matches(lower(url), '/blog/[^/]+') OR
         regexp_matches(lower(url), '/\d{3,}'))
       ORDER BY doc_id"""
  }

  // F8+T4: recency watermark — nulls pass (discovery.py:1937-1942)
  val qF8Recency: Q = (s, dir) => {
    val d = t(s, dir, "documents").select("doc_id")
    val pd = when(col("doc_id") % 10 === 0, lit(null).cast("timestamp"))
      .otherwise(to_timestamp(date_add(to_date(lit("2024-01-01")),
        (col("doc_id") % 400).cast("int"))))
    d.withColumn("publish_date", pd)
      .filter(col("publish_date").isNull ||
        col("publish_date") >= lit("2024-07-01 00:00:00").cast("timestamp"))
      .select(col("doc_id"), tsUs(col("publish_date")).as("pd_us"))
      .orderBy("doc_id")
  }
  val sF8 =
    """SELECT doc_id, epoch_us(publish_date) AS pd_us FROM (
         SELECT doc_id,
           CASE WHEN doc_id % 10 = 0 THEN NULL
                ELSE TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 400) DAY END AS publish_date
         FROM documents)
       WHERE publish_date IS NULL OR publish_date >= TIMESTAMP '2024-07-01 00:00:00'
       ORDER BY doc_id"""

  // F11+C3+A3: source-due predicate from frequency cadence
  // (scheduling.py:101-162 over parse_frequency_to_days :30-62)
  val qF11DueFilter: Q = (s, dir) => {
    val c = t(s, dir, "customer").select("c_custkey")
    val freq = when(col("c_custkey") % 6 === 0, lit("daily"))
      .when(col("c_custkey") % 6 === 1, lit("weekly"))
      .when(col("c_custkey") % 6 === 2, lit("bi-weekly"))
      .when(col("c_custkey") % 6 === 3, lit("monthly"))
      .when(col("c_custkey") % 6 === 4, lit("broadcast"))
      .otherwise(lit(null).cast("string"))
    val last = t(s, dir, "orders").groupBy("o_custkey")
      .agg(max(col("o_orderdate")).as("last_processed"))
    c.withColumn("frequency", freq)
      .withColumn("cadence_days", gf.frequency_days(col("frequency")))
      .join(last, c("c_custkey") === last("o_custkey"), "left")
      .withColumn("due",
        col("last_processed").isNull ||
          datediff(lit("1999-01-01").cast("date"), col("last_processed").cast("date"))
            .cast("double") >= col("cadence_days"))
      .select("c_custkey", "frequency", "cadence_days", "due")
      .orderBy("c_custkey")
  }
  val sF11 =
    """SELECT c_custkey, frequency, cadence_days,
       (last_processed IS NULL OR
        CAST(date_diff('day', CAST(last_processed AS DATE), DATE '1999-01-01') AS DOUBLE) >= cadence_days) AS due
       FROM (
         SELECT c.c_custkey,
           CASE CAST(c.c_custkey % 6 AS INT)
             WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly' WHEN 2 THEN 'bi-weekly'
             WHEN 3 THEN 'monthly' WHEN 4 THEN 'broadcast' ELSE NULL END AS frequency,
           CASE CAST(c.c_custkey % 6 AS INT)
             WHEN 0 THEN 0.25 WHEN 1 THEN 7.0 WHEN 2 THEN 14.0
             WHEN 3 THEN 30.0 WHEN 4 THEN 0.25 ELSE 7.0 END AS cadence_days,
           (SELECT MAX(o_orderdate) FROM orders o WHERE o.o_custkey = c.c_custkey) AS last_processed
         FROM customer c)
       ORDER BY c_custkey"""

  // F9: wire-pattern short-circuit (url_verification.py:372-393)
  private val f9Paths = Seq("/wire/ap-story", "/stories/local", "/national/wire/x", "/stories/metro")
  val qF9WireFilter: Q = (s, dir) =>
    t(s, dir, "documents").select("doc_id", "source")
      .withColumn("url", concat(lit("https://"), col("source"), lit(".example"), pathCase(f9Paths)))
      .withColumn("is_wire", lower(col("url")).rlike("/wire/"))
      .select("doc_id", "url", "is_wire")
      .orderBy("doc_id")
  val sF9 =
    s"""SELECT doc_id, url, regexp_matches(lower(url), '/wire/') AS is_wire
       FROM (SELECT doc_id, 'https://' || source || '.example' || ${pathCaseSql(f9Paths)} AS url
             FROM documents)
       ORDER BY doc_id"""

  // C6: multi-format date parsing with try-fallback cascade
  // (discovery.py:63-158 _parse_date)
  private val monthAbbr = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  val qC6DateParse: Q = (s, dir) => {
    val d = t(s, dir, "documents").select("doc_id")
      .withColumn("y", (lit(2020) + col("doc_id") % 5).cast("int"))
      .withColumn("m", (lit(1) + col("doc_id") % 12).cast("int"))
      .withColumn("dd", (lit(1) + col("doc_id") % 28).cast("int"))
      .withColumn("mon", element_at(
        array(monthAbbr.map(lit): _*), (col("doc_id") % 12 + 1).cast("int")))
    val str = when(col("doc_id") % 3 === 0,
        format_string("%04d-%02d-%02d", col("y"), col("m"), col("dd")))
      .when(col("doc_id") % 3 === 1,
        format_string("%02d/%02d/%04d", col("m"), col("dd"), col("y")))
      .otherwise(concat(format_string("%02d ", col("dd")), col("mon"),
        format_string(" %04d", col("y"))))
    d.withColumn("date_str", str)
      .withColumn("parsed_us", unix_micros(coalesce(
        expr("try_to_timestamp(date_str, 'yyyy-MM-dd')"),
        expr("try_to_timestamp(date_str, 'MM/dd/yyyy')"),
        expr("try_to_timestamp(date_str, 'dd MMM yyyy')")).cast("timestamp")))
      .select("doc_id", "date_str", "parsed_us")
      .orderBy("doc_id")
  }
  val sC6 = {
    val mons = monthAbbr.map(m => s"'$m'").mkString(", ")
    s"""SELECT doc_id, date_str, epoch_us(coalesce(
           try_strptime(date_str, '%Y-%m-%d'),
           try_strptime(date_str, '%m/%d/%Y'),
           try_strptime(date_str, '%d %b %Y'))) AS parsed_us
       FROM (SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN format('{:04d}-{:02d}-{:02d}', y, m, dd)
           WHEN 1 THEN format('{:02d}/{:02d}/{:04d}', m, dd, y)
           ELSE format('{:02d} ', dd) || [$mons][CAST(doc_id % 12 + 1 AS INT)] || format(' {:04d}', y) END AS date_str
         FROM (SELECT doc_id, CAST(2020 + doc_id % 5 AS INT) AS y,
                 CAST(1 + doc_id % 12 AS INT) AS m, CAST(1 + doc_id % 28 AS INT) AS dd
               FROM documents))
       ORDER BY doc_id"""
  }

  // S13+M4: per-source section inference — derive a section label per
  // doc, count per (source, section), keep sections with enough
  // evidence, top-2 per source (discovery.py:647-863 inference shape)
  private val s13Sections = Seq("news", "sports", "opinion", "life", "weather")
  val qS13SectionInfer: Q = (s, dir) => {
    val sec = s13Sections.zipWithIndex.tail.foldLeft(
      when(col("doc_id") % s13Sections.length === 0, lit(s13Sections.head))) {
      case (acc, (p, i)) => acc.when(col("doc_id") % s13Sections.length === i, lit(p))
    }.otherwise(lit(s13Sections.head))
    val counts = t(s, dir, "documents")
      .select(col("source"), sec.as("section"))
      .groupBy("source", "section").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 4)
    counts.withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(desc("n"), asc("section"))))
      .filter(col("rk") <= 2)
      .select("source", "section", "n", "rk")
      .orderBy("source", "rk")
  }
  val sS13 = {
    val cases = s13Sections.zipWithIndex
      .map { case (p, i) => s"WHEN $i THEN '$p'" }.mkString(" ")
    s"""SELECT source, section, n, rk FROM (
         SELECT source, section, n,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, section) AS rk
         FROM (
           SELECT source, CASE CAST(doc_id % ${s13Sections.length} AS INT) $cases END AS section,
                  COUNT(*) AS n
           FROM documents GROUP BY 1, 2 HAVING COUNT(*) >= 4))
       WHERE rk <= 2 ORDER BY source, rk"""
  }

  // S14: legacy depth-1 BFS internal/external link split — discovered
  // links partition by whether their canonical host matches the source
  // (crawler legacy BFS: internal links queued, external recorded)
  val qS14IntExtSplit: Q = (s, dir) => {
    val url = when(col("doc_id") % 3 === 0,
      concat(lit("https://partner-"), col("source"), lit(".example/out/"),
        col("doc_id").cast("string")))
      .otherwise(concat(lit("https://www."), col("source"), lit(".example/story/"),
        col("doc_id").cast("string")))
    t(s, dir, "documents").select(col("doc_id"), col("source"))
      .withColumn("host", gf.canonical_host(url))
      .withColumn("internal", col("host") === concat(col("source"), lit(".example")))
      .groupBy("source")
      .agg(count(when(col("internal"), 1)).as("n_internal"),
        count(when(!col("internal"), 1)).as("n_external"))
      .orderBy("source")
  }
  val sS14 =
    """SELECT source,
         COUNT(*) FILTER (WHERE doc_id % 3 <> 0) AS n_internal,
         COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS n_external
       FROM documents GROUP BY source ORDER BY source"""

  // F10: dead-URL TTL re-admission — error rows become retryable once
  // the 7-day TTL since last attempt has elapsed
  // (crawler/__init__.py:509-513, 1566-1572)
  val qF10DeadUrlTtl: Q = (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
        (col("ts").cast("timestamp") <=
          lit("2024-01-15 00:00:00").cast("timestamp")).as("retryable"))
      .orderBy("event_id")
  val sF10 =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         (ts <= TIMESTAMP '2024-01-15 00:00:00') AS retryable
       FROM events WHERE event_type = 'error' ORDER BY event_id"""

  // F13: RSS transient-failure ledger — consecutive-failure streak
  // (reset by any success) + failures inside a sliding 7-day window;
  // the feed is "missing" at 3-consecutive OR 5-in-window
  // (discovery.py:1158-1515)
  val qF13RssLedger: Q = (s, dir) => {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        tsUs(col("ts")).as("ts_us"),
        // integer DIV, not double division: exact at any epoch magnitude
        expr("unix_micros(cast(ts as timestamp)) div 1000000").as("ts_s"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("fail"))
    val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val win = Window.partitionBy("user_id").orderBy("ts_s")
      .rangeBetween(-604800L, 0L)
    ev.withColumn("grp",
        sum(when(col("fail") === 0L, 1L).otherwise(0L)).over(wOrd))
      .withColumn("streak", sum(col("fail")).over(
        Window.partitionBy("user_id", "grp").orderBy("ts_us", "event_id")))
      .withColumn("win_fails", sum(col("fail")).over(win))
      .filter(col("fail") === 1L)
      .select(col("event_id"), col("user_id"), col("streak"), col("win_fails"),
        (col("streak") >= 3 || col("win_fails") >= 5).as("feed_missing"))
      .orderBy("event_id")
  }
  // window SUMs are CAST to BIGINT: DuckDB types SUM(int) as HUGEINT,
  // which the driver's hash path reads as float64 while Spark emits
  // int64 — the values are identical but the dtype trips the gate
  val sF13 =
    """SELECT event_id, user_id, streak, win_fails,
         (streak >= 3 OR win_fails >= 5) AS feed_missing
       FROM (
         SELECT event_id, user_id, fail,
           CAST(SUM(fail) OVER (PARTITION BY user_id, grp ORDER BY ts_us, event_id) AS BIGINT) AS streak,
           CAST(SUM(fail) OVER (PARTITION BY user_id ORDER BY ts_s
                           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_fails
         FROM (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, epoch(ts)::BIGINT AS ts_s,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS fail,
             SUM(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS grp
           FROM events))
       WHERE fail = 1 ORDER BY event_id"""

  val queries: Map[String, Q] = Map(
    "q_s14_int_ext_split" -> qS14IntExtSplit,
    "q_s13_section_infer" -> qS13SectionInfer,
    "q_f10_dead_url_ttl" -> qF10DeadUrlTtl,
    "q_f13_rss_ledger" -> qF13RssLedger,
    "q_f9_wire_filter" -> qF9WireFilter,
    "q_c6_date_parse" -> qC6DateParse,
    "q_s1_source_scan" -> qS1SourceScan,
    "q_s2_fifo_scan" -> qS2FifoScan,
    "q_s3_mixed_scan" -> qS3MixedScan,
    "q_j2_antijoin" -> qJ2Antijoin,
    "q_j1_dim_join" -> qJ1DimJoin,
    "q_j5_count_per_source" -> qJ5CountPerSource,
    "q_a1_available_work" -> qA1AvailableWork,
    "q_a2_status_counts" -> qA2StatusCounts,
    "q_a3_last_processed" -> qA3LastProcessed,
    "q_a5_method_effectiveness" -> qA5MethodEffectiveness,
    "q_a8_distinct_domains" -> qA8DistinctDomains,
    "q_a9_top_sections" -> qA9TopSections,
    "q_a10_failure_window" -> qA10FailureWindow,
    "q_a11_stale_breakdown" -> qA11StaleBreakdown,
    "q_w1_rate_gap" -> qW1RateGap,
    "q_w2_first_dedup" -> qW2FirstDedup,
    "q_w3_topk_per_source" -> qW3TopkPerSource,
    "q_w5_consecutive_same" -> qW5ConsecutiveSame,
    "q_u1_union_dedup" -> qU1UnionDedup,
    "q_c4_content_hash" -> qC4ContentHash,
    "q_c5_url_date" -> qC5UrlDate,
    "q_f2_normalize_url" -> qF2NormalizeUrl,
    "q_f3_canonical_host" -> qF3CanonicalHost,
    "q_f4_skip_patterns" -> qF4SkipPatterns,
    "q_f5_regex_classifier" -> qF5RegexClassifier,
    "q_f6_article_check" -> qF6ArticleCheck,
    "q_f8_recency" -> qF8Recency,
    "q_f11_due_filter" -> qF11DueFilter)

  val oracle: Map[String, String] = Map(
    "q_s14_int_ext_split" -> sS14,
    "q_s13_section_infer" -> sS13,
    "q_f10_dead_url_ttl" -> sF10,
    "q_f13_rss_ledger" -> sF13,
    "q_f9_wire_filter" -> sF9,
    "q_c6_date_parse" -> sC6,
    "q_s1_source_scan" -> sS1,
    "q_s2_fifo_scan" -> sS2,
    "q_s3_mixed_scan" -> sS3,
    "q_j2_antijoin" -> sJ2,
    "q_j1_dim_join" -> sJ1,
    "q_j5_count_per_source" -> sJ5,
    "q_a1_available_work" -> sA1,
    "q_a2_status_counts" -> sA2,
    "q_a3_last_processed" -> sA3,
    "q_a5_method_effectiveness" -> sA5,
    "q_a8_distinct_domains" -> sA8,
    "q_a9_top_sections" -> sA9,
    "q_a10_failure_window" -> sA10,
    "q_a11_stale_breakdown" -> sA11,
    "q_w1_rate_gap" -> sW1,
    "q_w2_first_dedup" -> sW2,
    "q_w3_topk_per_source" -> sW3,
    "q_w5_consecutive_same" -> sW5,
    "q_u1_union_dedup" -> sU1,
    "q_c4_content_hash" -> sC4,
    "q_c5_url_date" -> sC5,
    "q_f2_normalize_url" -> sF2,
    "q_f3_canonical_host" -> sF3,
    "q_f4_skip_patterns" -> sF4,
    "q_f5_regex_classifier" -> sF5,
    "q_f6_article_check" -> sF6,
    "q_f8_recency" -> sF8,
    "q_f11_due_filter" -> sF11)
}
