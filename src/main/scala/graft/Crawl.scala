package graft

import graft.crawl.CrawlEngine
import graft.store.SnapshotStore
import graft.synth.Synth
import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the crawl itself:
  *
  *   graft.Crawl <storeDir> [nHosts] [urlsPerHostPerWave] [nWaves]
  *
  * Resumable: re-running with the same storeDir continues from the last
  * committed wave. Prints one JSON line with wave metrics + throughput
  * (URLs/sec frontier drained — the BASELINE.json headline metric). */
object Crawl {
  def main(args: Array[String]): Unit = {
    val storeDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-crawl").toString)
    val nHosts = args.lift(1).map(_.toInt).getOrElse(200)
    val perWave = args.lift(2).map(_.toInt).getOrElse(50)
    val nWaves = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("GRAFT_TRACE").contains("1")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        private val run = new java.util.concurrent.atomic.AtomicLong()
        private val cpu = new java.util.concurrent.atomic.AtomicLong()
        private val gc = new java.util.concurrent.atomic.AtomicLong()
        private val deser = new java.util.concurrent.atomic.AtomicLong()
        private val shw = new java.util.concurrent.atomic.AtomicLong()
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          t0.put(j.jobId, System.nanoTime())
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val dt = (System.nanoTime() - t0.getOrDefault(j.jobId, System.nanoTime())) / 1e9
          if (dt > 0.2) System.err.println(f"[job] id=${j.jobId}%4d ${dt}%7.3fs")
        }
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            run.addAndGet(m.executorRunTime)
            cpu.addAndGet(m.executorCpuTime / 1000000L)
            gc.addAndGet(m.jvmGCTime)
            deser.addAndGet(m.executorDeserializeTime)
            shw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
        override def onApplicationEnd(e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          System.err.println(s"[exec] runMs=${run.get} cpuMs=${cpu.get} " +
            s"gcMs=${gc.get} deserMs=${deser.get} shuffleWriteMB=${shw.get / 1048576}")
      })
    }

    val cfg = Synth.Config(nHosts = nHosts, urlsPerHostPerWave = perWave, nWaves = nWaves)
    val store = new SnapshotStore(storeDir)
    val t0 = System.nanoTime()
    val metrics = new CrawlEngine(spark, cfg, store).run()
    val sec = (System.nanoTime() - t0) / 1e9
    val discovered = metrics.map(_.discovered).sum
    val planned = metrics.map(_.planned).sum
    val waves = metrics.map(m =>
      s"""{"wave":${m.wave},"discovered":${m.discovered},"planned":${m.planned},""" +
        s""""fetched":${m.fetched},"failed":${m.failed},"robots_blocked":${m.robots_blocked}}""")
      .mkString("[", ",", "]")
    println(
      s"""{"metric":"crawl_urls_per_sec","value":${discovered / math.max(sec, 1e-9)},""" +
        s""""unit":"urls/sec","seconds":$sec,"discovered":$discovered,"planned":$planned,""" +
        s""""cpus":"$cpus","waves":$waves}""")
    spark.stop()
  }
}
