import graft.crawl.{CrawlEngine, CrawlOracle}
import graft.synth.Synth
import org.apache.spark.sql.SparkSession

object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "7")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = Synth.Config(nHosts = 20, urlsPerHostPerWave = 20, nWaves = 2,
      deadUrlTtlWaves = 2, compactEvery = 3, datasetScope = "ds-regional")
    val o = CrawlOracle.run(cfg)
    println(s"oracle fetches=${o.fetches.size} seen=${o.seen.size} metrics=${o.waveMetrics}")
    val store = new graft.store.SnapshotStore(
      java.nio.file.Files.createTempDirectory("dbg").toString)
    val m = new CrawlEngine(spark, cfg, store).run()
    println(s"engine metrics=$m")
    println(s"engine results=${store.readAll(spark, "results").count()}")
    spark.stop()
  }
}
