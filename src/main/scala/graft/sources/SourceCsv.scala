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

  /** An operator-supplied source_id is reusable only in the engine's
    * canonical form `src-<int>` with the int fitting a nonnegative
    * Int32 — anything else would throw in the due scan's
    * `stripPrefix("src-").toInt`. */
  private[sources] def conformingId(sid: String): Boolean =
    sid != null && sid.startsWith("src-") && {
      val d = sid.stripPrefix("src-")
      d.nonEmpty && d.length <= 10 && d.forall(_.isDigit) && d.toLong <= Int.MaxValue
    }

  /** Expected columns: host, name, frequency, bot_sensitivity
    * (missing politeness fields default per the reference: sensitivity
    * 5 = moderate). Optional columns an operator's export may carry:
    * source_id (stable id reuse on re-import), status, http_precheck —
    * defaulted like the reference loader when absent. */
  def load(spark: SparkSession, path: String): Dataset[Source] = {
    import spark.implicits._
    val raw = spark.read.option("header", "true").csv(path)
    def opt(name: String, default: org.apache.spark.sql.Column) =
      if (raw.columns.contains(name)) col(name) else default
    raw
      .select(
        col("host"),
        coalesce(col("name"), col("host")).as("canonical_name"),
        col("frequency"),
        coalesce(col("bot_sensitivity").cast("int"), lit(5)).as("bot_sensitivity"),
        opt("source_id", lit(null).cast("string")).as("source_id"),
        coalesce(opt("status", lit("active")), lit("active")).as("status"),
        coalesce(opt("http_precheck", lit(false)).cast("boolean"), lit(false))
          .as("http_precheck"))
      .as[(String, String, String, Int, String, String, Boolean)]
      .flatMap { case (host, name, freq, sens, sid, status, precheck) =>
        Option(UrlKernels.canonicalHost(host)).map { norm =>
          Source(
            // the engine requires ids of the exact form src-<int>
            // (host_idx parses out of the id in the due scan and fetch
            // resolver); a non-conforming operator-supplied id is
            // re-derived from the normalized host — still stable across
            // re-imports, and it can never throw at runtime
            source_id = Option(sid).filter(conformingId).getOrElse(
              f"src-${UrlKernels.urlHash64(norm) & 0x7fffffff}%010d"),
            host = host,
            host_norm = norm,
            canonical_name = name,
            frequency = freq,
            bot_sensitivity = math.max(1, math.min(10, sens)),
            status = status,
            base_url = s"https://$norm",
            http_precheck = precheck)
        }
      }
  }
}
