package graft

import graft.crawl.CrawlEngine
import graft.store.SnapshotStore
import graft.synth.Synth
import org.apache.spark.sql.SparkSession

/** North-rule scaling evidence: the identical crawl at two parallelism
  * levels (local[N] and local[4N] standing in for N vs 4N executors —
  * no real cluster exists in this sandbox; see BASELINE.md). Prints one
  * JSON line with throughput at both levels and the scaling efficiency
  * thr(4N) / (4 · thr(N)).
  *
  *   graft.ScalingBench [nHosts] [urlsPerHostPerWave] [nWaves] [nLow] [nHigh]
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession = {
    val localDir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "spark-local")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.local.dir", localDir.toString) // tmpfs shuffle
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Run one full crawl; returns (seconds, urlsDiscovered, fetched). */
  private def runOnce(spark: SparkSession, cfg: Synth.Config): (Double, Long, Long) = {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "graft-scale")
    val store = new SnapshotStore(dir.toString)
    val t0 = System.nanoTime()
    val metrics = new CrawlEngine(spark, cfg, store).run()
    val sec = (System.nanoTime() - t0) / 1e9
    deleteRecursively(dir)
    (sec, metrics.map(_.discovered).sum, metrics.map(_.fetched).sum)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  def main(args: Array[String]): Unit = {
    val nHosts = args.lift(0).map(_.toInt).getOrElse(2000)
    val perWave = args.lift(1).map(_.toInt).getOrElse(150)
    val nWaves = args.lift(2).map(_.toInt).getOrElse(3)
    val nLow = args.lift(3).map(_.toInt).getOrElse(8)
    val nHigh = args.lift(4).map(_.toInt).getOrElse(32)
    val cfg = Synth.Config(nHosts = nHosts, urlsPerHostPerWave = perWave, nWaves = nWaves)
    // warm-up proportional to the real world so the JIT reaches steady
    // state before measurement — a token warm-up biases whichever
    // parallelism level happens to run second
    val warmCfg = cfg.copy(nHosts = math.max(500, nHosts / 8),
      urlsPerHostPerWave = math.max(10, perWave / 4),
      nWaves = math.min(2, nWaves))

    def measure(cpus: Int): (Double, Long, Long) = {
      val spark = session(cpus)
      runOnce(spark, warmCfg) // JIT/codegen warm-up, untimed
      // best-of-2: this sandbox is a shared VM with ±40% run-to-run
      // noise; the minimum is the machine's actual capability at each
      // level, measured identically for both
      val a = runOnce(spark, cfg)
      val b = runOnce(spark, cfg)
      spark.stop()
      if (a._1 <= b._1) a else b
    }

    val (sLow, dLow, fLow) = measure(nLow)
    val (sHigh, dHigh, fHigh) = measure(nHigh)
    require(dLow == dHigh && fLow == fHigh,
      s"non-deterministic crawl across parallelism: $dLow/$fLow vs $dHigh/$fHigh")
    val thrLow = dLow / sLow
    val thrHigh = dHigh / sHigh
    val eff = (thrHigh / thrLow) / (nHigh.toDouble / nLow)
    println(
      s"""{"metric":"crawl_scaling_efficiency","value":$eff,"unit":"ratio",""" +
        s""""n_low":$nLow,"n_high":$nHigh,""" +
        s""""thr_low_urls_per_sec":$thrLow,"thr_high_urls_per_sec":$thrHigh,""" +
        s""""sec_low":$sLow,"sec_high":$sHigh,""" +
        s""""discovered":$dLow,"fetched":$fLow,""" +
        s""""config":{"nHosts":$nHosts,"urlsPerHostPerWave":$perWave,"nWaves":$nWaves}}""")
  }
}
