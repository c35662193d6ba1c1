package graft

import graft.crawl.{CrawlEngine, CrawlOracle}
import graft.model.FetchResult
import graft.ops.ImageKernels
import graft.store.SnapshotStore
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** E2E: the parallel engine must reproduce the single-threaded
  * reference-rules oracle exactly — URL-seen set, per-host crawl order,
  * status histogram, per-wave metrics — plus payload fidelity and
  * checkpoint/resume (SURVEY.md §5 / north rule). */
class CrawlEngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("crawl-e2e")
    .config("spark.sql.shuffle.partitions", "7") // deliberately odd
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val cfg = Synth.Config(nHosts = 20, urlsPerHostPerWave = 30, nWaves = 3)

  def freshStore(): SnapshotStore =
    new SnapshotStore(Files.createTempDirectory("crawl-e2e").toString)

  lazy val oracle: CrawlOracle.Outcome = CrawlOracle.run(cfg)

  lazy val engineStore: SnapshotStore = {
    val store = freshStore()
    new CrawlEngine(spark, cfg, store).run()
    store
  }

  test("URL-seen set equals oracle") {
    val seen = engineStore.read(spark, "frontier")
      .select("norm_url").collect().map(_.getString(0)).toSet
    assert(seen == oracle.seen)
    assert(seen.nonEmpty)
  }

  test("final status histogram equals oracle") {
    val got = engineStore.read(spark, "frontier")
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == oracle.statusCounts)
    // the state machine actually exercised its branches:
    assert(got.keySet.contains("extracted"))
    assert(got.keySet.contains("404"))
    assert(got.keySet.contains("403"))
    assert(got.keySet.contains("not_article"))
    assert(got.keySet.contains("robots_blocked"))
  }

  test("crawl order (wave, host, rank, url, status) equals oracle") {
    import spark.implicits._
    val got = engineStore.readAll(spark, "results").as[FetchResult]
      .collect()
      .map(r => CrawlOracle.OracleFetch(r.wave, r.host, r.rank, r.norm_url, r.status))
      .sortBy(f => (f.wave, f.host, f.rank))
    val want = oracle.fetches.sortBy(f => (f.wave, f.host, f.rank))
    assert(got.length == want.length)
    assert(got.toSeq == want)
  }

  test("per-wave metrics equal oracle") {
    (0 until cfg.nWaves).foreach { w =>
      val txt = Files.readString(
        java.nio.file.Paths.get(engineStore.root, "_commits", f"wave-$w%05d.json"))
      oracle.waveMetrics(w).foreach { case (k, v) =>
        assert(txt.contains(s""""$k":$v"""), s"wave $w metric $k=$v; got $txt")
      }
    }
  }

  test("politeness is honored: ≤ tokens ≤ 3 fetches per host per wave") {
    import spark.implicits._
    val perHostWave = engineStore.readAll(spark, "results").as[FetchResult]
      .groupByKey(r => (r.wave, r.host)).count().collect()
    assert(perHostWave.nonEmpty)
    perHostWave.foreach { case ((w, h), n) =>
      assert(n <= 3, s"host $h wave $w fetched $n > 3")
    }
  }

  test("payload fidelity: caption exact, phash exact, PSNR ≥ 40 dB for jpeg") {
    import spark.implicits._
    val fetched = engineStore.readAll(spark, "results").as[FetchResult]
      .filter(_.status == "extracted").collect()
    assert(fetched.nonEmpty)
    fetched.foreach { r =>
      val id = Synth.idOf(r.norm_url).get
      val truth = Synth.imageFor(cfg)(id)
      assert(r.caption == truth.caption, s"caption mismatch for $id")
      assert(r.image_id == truth.image_id)
      val decoded = ImageKernels.decode(r.bytes)
      val ground = ImageKernels.synthPixels(cfg.seed ^ id, cfg.imageSize, cfg.imageSize)
      val p = ImageKernels.psnr(ground, decoded)
      if (r.fmt == "png") {
        assert(p.isPosInfinity, s"png not lossless for $id")
        assert(r.phash == truth.phash, s"png phash mismatch for $id")
      } else {
        assert(p >= 40.0, s"jpeg PSNR $p < 40 for $id")
        // perceptual hash is robust, not bit-exact, under lossy re-encode
        val hamming = java.lang.Long.bitCount(r.phash ^ truth.phash)
        assert(hamming <= 6, s"jpeg phash hamming $hamming > 6 for $id")
      }
    }
  }

  test("resume from checkpoint reproduces the uninterrupted run") {
    // run only wave 0+1, then resume a fresh engine to completion
    val store2 = freshStore()
    val e1 = new CrawlEngine(spark, cfg, store2)
    e1.init()
    e1.runWave(0); e1.runWave(1)
    assert(store2.lastCommittedWave() == 1)
    new CrawlEngine(spark, cfg, store2).run() // resumes at wave 2
    val a = engineStore.readAll(spark, "results")
      .select("wave", "host", "rank", "norm_url", "status")
      .collect().map(_.toString).sorted
    val b = store2.readAll(spark, "results")
      .select("wave", "host", "rank", "norm_url", "status")
      .collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("partitioning invariance: different shuffle partitioning, same crawl") {
    val sparkB = spark.newSession()
    sparkB.conf.set("spark.sql.shuffle.partitions", "23")
    val store3 = freshStore()
    new CrawlEngine(sparkB, cfg, store3).run()
    val a = engineStore.read(spark, "frontier")
      .select("norm_url", "status").collect().map(_.toString).sorted
    val b = store3.read(spark, "frontier")
      .select("norm_url", "status").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("time travel: wave-0 frontier snapshot is readable and smaller") {
    val pins0 = engineStore.wavePins(0)
    val f0 = engineStore.readSnapshot(spark, "frontier", pins0("frontier")).count()
    val fN = engineStore.read(spark, "frontier").count()
    assert(f0 > 0 && f0 < fN)
  }
}
