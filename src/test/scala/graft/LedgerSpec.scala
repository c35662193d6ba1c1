package graft

import graft.crawl.{CrawlEngine, CrawlOracle}
import graft.model.{FetchResult, SourceState}
import graft.store.SnapshotStore
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Long-horizon (10-wave) engine↔oracle equality exercising the slow
  * feedback rules that a 5-wave run cannot reach:
  *  - F13 window rule: host 4 (broadcast cadence, due every wave) fails
  *    RSS except when wave%3==2 — never 3 consecutive, but ≥5 failures
  *    inside the 7-wave window → feed declared missing, skipped for the
  *    retry window, re-armed on the failed retry
  *    (tests/test_rss_transient_failure_tracking.py analogue);
  *  - F12 + C8: host 6 yields zero new URLs from every method after
  *    wave 0 → the no-effective-methods counter reaches the daily
  *    adaptive threshold (7) → source auto-pauses and stops being due
  *    (tests/test_pause_after_failures.py analogue);
  *  - two mid-run log compactions (waves 3 and 7). */
class LedgerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ledger-e2e")
    .config("spark.sql.shuffle.partitions", "5")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val cfg = Synth.Config(nHosts = 8, urlsPerHostPerWave = 12, nWaves = 10,
    deadUrlTtlWaves = 3, compactEvery = 4)

  lazy val oracle: CrawlOracle.Outcome = CrawlOracle.run(cfg)

  lazy val engineStore: SnapshotStore = {
    val store = new SnapshotStore(Files.createTempDirectory("ledger-e2e").toString)
    new CrawlEngine(spark, cfg, store).run()
    store
  }

  test("crawl order equals oracle across 10 waves (2 compactions)") {
    import spark.implicits._
    val got = engineStore.readAll(spark, "results").as[FetchResult]
      .collect()
      .map(r => CrawlOracle.OracleFetch(r.wave, r.host, r.rank, r.norm_url, r.status))
      .sortBy(f => (f.wave, f.host, f.rank))
    assert(got.toSeq == oracle.fetches.sortBy(f => (f.wave, f.host, f.rank)))
  }

  test("status histogram equals oracle after compactions") {
    val got = CrawlEngine.frontierCurrent(spark, engineStore)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == oracle.statusCounts)
  }

  test("F13 window rule lifecycle: missing → skip → successful retry → cleared") {
    // host 4 fails waves {0,1,3,4,6,…}: the 7-wave window holds 5
    // failures at wave 6 (never 3 consecutive) → missing=6 → wave 7
    // skipped (no ledger event) → retry at wave 8 succeeds → missing
    // cleared, streak reset, window pruned → wave 9 fails again.
    val st = oracle.sourceStates("src-0004")
    assert(st.rss_failure_waves.sorted == Seq(3, 4, 6, 9), s"ledger: $st")
    assert(!st.rss_failure_waves.contains(7), "skipped wave must log no failure")
    assert(st.rss_missing_wave == -1, "successful retry must clear missing")
    assert(st.rss_consecutive_failures == 1)
    assert(st.rss_consecutive_failures < Synth.RssConsecThreshold) // window path, not streak
    // engine agrees (full state equality)
    import spark.implicits._
    val got = engineStore.read(spark, "source_state").as[SourceState]
      .collect().map(s => s.source_id -> s).toMap
    assert(got("src-0004").rss_missing_wave == st.rss_missing_wave)
    assert(got("src-0004").rss_failure_waves.sorted == st.rss_failure_waves.sorted)
    assert(got("src-0004").rss_consecutive_failures == st.rss_consecutive_failures)
  }

  test("F12 + C8: the zero-new host auto-pauses at the adaptive threshold") {
    val st = oracle.sourceStates("src-0006")
    assert(st.paused_auto, s"zero-new host never paused: $st")
    assert(st.no_effective_consecutive >=
      graft.core.UrlKernels.adaptivePauseThreshold("daily"))
    import spark.implicits._
    val got = engineStore.read(spark, "source_state").as[SourceState]
      .collect().map(s => s.source_id -> s).toMap
    assert(got("src-0006").paused_auto)
    assert(got("src-0006").no_effective_consecutive == st.no_effective_consecutive)
    // once paused, the source stops being due: its last_wave freezes
    assert(got("src-0006").last_wave == st.last_wave)
    assert(st.last_wave < cfg.nWaves - 1)
    // and the wave metrics saw it
    assert(oracle.waveMetrics.last("paused_sources") > 0)
    // this host's feed also stays missing at the end (the persistent-
    // missing branch, complementing host 4's recovered branch)
    assert(st.rss_missing_wave >= 0)
  }
}
