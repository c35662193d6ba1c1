package graft

import graft.crawl.Maintenance
import graft.sources.SourceCsv
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** M1/M2/M3 maintenance rewrites + S12 CSV seed ingestion. */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def frontier = Seq(
    // norm_url, source_id, status, discovered_wave
    ("u1", "s1", "article", 0),
    ("u2", "s1", "article", 9),
    ("u3", "s2", "discovered", 0),
    ("u4", "s2", "extracted", 1),
    ("u5", "s2", "404", 0)
  ).toDF("norm_url", "source_id", "status", "discovered_wave")

  test("M1 expireStale pauses only old article rows") {
    val out = Maintenance.expireStale(frontier, currentWave = 10, maxAgeWaves = 5)
      .select("norm_url", "status").as[(String, String)].collect().toMap
    assert(out("u1") == "paused") // old article
    assert(out("u2") == "article") // recent article
    assert(out("u3") == "discovered") // not article → untouched
    assert(out("u4") == "extracted")
    assert(out("u5") == "404")
  }

  test("A11 staleBreakdown counts per source") {
    val rows = Maintenance.staleBreakdown(frontier, 10, 5).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "s1" && rows(0).getLong(1) == 1L)
  }

  test("M2 stuckStates reports non-terminal laggards") {
    val rows = Maintenance.stuckStates(frontier, 10, 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("article" -> 1L, "discovered" -> 1L))
  }

  test("M3 repairNullPayloads resets empty-payload fetches") {
    val results = Seq(
      ("u4", "extracted", Array.empty[Byte]),
      ("u1", "extracted", Array[Byte](1, 2, 3))
    ).toDF("norm_url", "status", "bytes")
    val out = Maintenance.repairNullPayloads(frontier, results)
      .select("norm_url", "status").as[(String, String)].collect().toMap
    assert(out("u4") == "article") // empty payload → re-fetch
    assert(out("u1") == "article") // was article anyway
  }

  test("S12 CSV seed load normalizes hosts and drops unparseable rows") {
    val csv = Files.createTempDirectory("seeds").resolve("pubs.csv")
    Files.writeString(csv,
      """host,name,frequency,bot_sensitivity
        |www.Example.com,Example Paper,weekly,7
        |news.site.org:8080,Site News,daily,
        |,,daily,3
        |""".stripMargin)
    val srcs = SourceCsv.load(spark, csv.toString).collect()
    assert(srcs.length == 2)
    val byHost = srcs.map(s => s.host_norm -> s).toMap
    assert(byHost.contains("example.com"))
    assert(byHost("example.com").bot_sensitivity == 7)
    assert(byHost("news.site.org").bot_sensitivity == 5) // default
    assert(byHost("news.site.org").frequency == "daily")
    assert(srcs.forall(_.source_id.startsWith("src-")))
  }

  test("T3: processing cycles advance extracted → cleaned → labeled, one stage per cycle") {
    import graft.crawl.Processing
    // 7 fetched rows in crawl order; B=2, C=3 → ranks 0-3 labeled,
    // 4-5 cleaned, 6 still extracted (closed form (C-1)B / CB)
    val results = (0 until 7).map(i => (s"u$i", 0, "h", i + 1, 200))
      .toDF("norm_url", "wave", "host", "rank", "http_status")
    val out = Processing.runCycles(results, batchSize = 2, cycles = 3)
      .select("norm_url", "article_status").as[(String, String)].collect().toMap
    (0 until 4).foreach(i => assert(out(s"u$i") == "labeled", s"u$i: $out"))
    (4 until 6).foreach(i => assert(out(s"u$i") == "cleaned", s"u$i: $out"))
    assert(out("u6") == "extracted")
    // one stage per cycle: a single cycle can never produce `labeled`
    val one = Processing.runCycles(results, batchSize = 7, cycles = 1)
      .select("article_status").as[String].collect()
    assert(one.toSet == Set("cleaned"))
    // non-200 rows never enter the chain
    val mixed = results.unionByName(Seq(("u7", 0, "h", 8, 404))
      .toDF("norm_url", "wave", "host", "rank", "http_status"))
    assert(!Processing.runCycles(mixed, 2, 3).select("norm_url")
      .as[String].collect().contains("u7"))
  }

  test("T3 sharded: per-shard FIFO advances with the budget split across shards") {
    import graft.crawl.Processing
    // shard = host_bucket mod 2: bucket 0/2 → shard 0 (5 rows),
    // bucket 1 → shard 1 (3 rows); batch 4 over 2 shards = 2 per shard
    val rows =
      (0 until 5).map(i => (s"a$i", 0, "h0", i + 1, if (i % 2 == 0) 0 else 2, 200)) ++
        (0 until 3).map(i => (s"b$i", 0, "h1", i + 1, 1, 200))
    val results = rows.toDF("norm_url", "wave", "host", "rank", "host_bucket", "http_status")
    val out = Processing.runCyclesSharded(results, batchSize = 4, cycles = 3, nShards = 2)
      .select("norm_url", "article_status").as[(String, String)].collect().toMap
    // shard 0: per-shard closed form (C-1)·B/s = 4 labeled, 1 cleaned
    (0 until 4).foreach(i => assert(out(s"a$i") == "labeled", s"a$i: $out"))
    assert(out("a4") == "cleaned")
    // shard 1 drains fully: 3 rows < (C-1)·B/s
    (0 until 3).foreach(i => assert(out(s"b$i") == "labeled", s"b$i: $out"))
    // degenerate nShards=1 must equal the strict-global form
    val global = Processing.runCycles(results, batchSize = 4, cycles = 3)
      .select("norm_url", "article_status").as[(String, String)].collect().toMap
    val sharded1 = Processing.runCyclesSharded(results, batchSize = 4, cycles = 3, nShards = 1)
      .select("norm_url", "article_status").as[(String, String)].collect().toMap
    assert(sharded1 == global)
    // budget must split evenly
    intercept[IllegalArgumentException](
      Processing.runCyclesSharded(results, batchSize = 5, cycles = 1, nShards = 2))
  }

  test("M2 over the processing chain: stuckProcessing flags drained-rank laggards") {
    import graft.crawl.Processing
    val results = (0 until 7).map(i => (s"u$i", 0, "h", i + 1, 200))
      .toDF("norm_url", "wave", "host", "rank", "http_status")
    val processed = Processing.runCycles(results, batchSize = 2, cycles = 3)
    // healthy chain: every rank below (C-1)B reached `labeled` → no rows
    assert(Processing.stuckProcessing(processed, 2, 3).count() == 0)
    // corrupt one drained-rank row back to `cleaned` → flagged
    val corrupted = processed.withColumn("article_status",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("ord") === 1,
        "cleaned").otherwise(org.apache.spark.sql.functions.col("article_status")))
    val stuck = Processing.stuckProcessing(corrupted, 2, 3).collect()
    assert(stuck.length == 1 && stuck(0).getString(0) == "cleaned" &&
      stuck(0).getLong(1) == 1L)
  }
}
