package graft.sources

import graft.core.UrlKernels
import graft.model.Source
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S12: publisher CSV seed ingestion (reference:
  * src/cli/commands/load_sources.py — `load-sources` CLI). Reads a
  * header CSV of publishers, normalizes hosts with the same kernel the
  * frontier uses, assigns deterministic ids, drops rows whose host
  * won't normalize. */
object SourceCsv {

  /** Expected columns: host, name, frequency, bot_sensitivity
    * (missing politeness fields default per the reference: sensitivity
    * 5 = moderate). */
  def load(spark: SparkSession, path: String): Dataset[Source] = {
    import spark.implicits._
    spark.read.option("header", "true").csv(path)
      .select(
        col("host"),
        coalesce(col("name"), col("host")).as("canonical_name"),
        col("frequency"),
        coalesce(col("bot_sensitivity").cast("int"), lit(5)).as("bot_sensitivity"))
      .as[(String, String, String, Int)]
      .flatMap { case (host, name, freq, sens) =>
        Option(UrlKernels.canonicalHost(host)).map { norm =>
          Source(
            source_id = f"src-${UrlKernels.urlHash64(norm) & 0x7fffffff}%010d",
            host = host,
            host_norm = norm,
            canonical_name = name,
            frequency = freq,
            bot_sensitivity = math.max(1, math.min(10, sens)),
            status = "active",
            base_url = s"https://$norm")
        }
      }
  }
}
