package graft.streaming

import graft.crawl.Politeness
import graft.model.PolitenessState
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming form of the crawl's stateful semantics
  * (SURVEY.md §2.9). The batch engine runs these as per-wave table
  * rewrites; this module is the streaming-mode equivalent for
  * continuous ingestion:
  *
  *  - T5/T6: per-host politeness state via flatMapGroupsWithState,
  *    driven by the SAME pure kernel (Politeness.update) as the batch
  *    engine and the oracle — one rule set, three executors.
  *  - T4/A10: event-time windowed failure counts with a watermark
  *    (the reference's sliding 7-day transient-RSS window,
  *    discovery.py:1158-1316).
  */
object PolitenessStream {

  /** One fetch outcome arriving on the stream. */
  case class FetchEvent(host: String, wave: Int, status: String,
                        sensitivity: Int, crawlDelayS: Double)

  case class HostUpdate(host: String, wave: Int, bot_sensitivity: Int,
                        tokens_per_wave: Int, cooldown_until_s: Double,
                        paused_until_s: Double, consecutive_failures: Int)

  /** Per-host rolling politeness state. Events within one micro-batch
    * group by (host); each group folds its outcomes through
    * Politeness.update exactly as a batch wave would. */
  def politenessUpdates(events: Dataset[FetchEvent],
                        waveSeconds: Double): Dataset[HostUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (host: String, it: Iterator[FetchEvent], state: GroupState[PolitenessState]) => {
          val evs = it.toSeq
          if (evs.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(
              Politeness.initial(host, evs.head.sensitivity,
                evs.head.crawlDelayS, waveSeconds))
            val out = evs.groupBy(_.wave).toSeq.sortBy(_._1).map { case (w, ws) =>
              // ok = every X4 content type (extracted|obituary|opinion|
              // wire), exactly as the batch kernel fold counts them
              val o = Politeness.HostOutcome(
                ok = ws.count(e => graft.crawl.CrawlEngine.OkStatuses.contains(e.status)),
                notFound = ws.count(_.status == "404"),
                forbidden = ws.count(_.status == "403"),
                rateLimited = ws.count(_.status == "429"),
                timeout = ws.count(_.status == "timeout"),
                captcha = ws.count(_.status == "captcha"))
              st = Politeness.update(st, o, w, waveSeconds, ws.head.crawlDelayS)
              HostUpdate(host, w, st.bot_sensitivity, st.tokens_per_wave,
                st.cooldown_until_s, st.paused_until_s, st.consecutive_failures)
            }
            state.update(st)
            out.iterator
          }
        })
  }

  /** T4/A10: failures per (host, event-time window) with a watermark —
    * the streaming form of the transient-failure ledger. `threshold`
    * mirrors RSS_TRANSIENT_THRESHOLD=5 (discovery.py:92). */
  def failureWindows(events: org.apache.spark.sql.DataFrame,
                     windowDur: String = "10 minutes",
                     threshold: Int = 5): org.apache.spark.sql.DataFrame =
    events
      .withWatermark("event_ts", "5 minutes")
      .filter(col("status").isin("403", "429", "timeout", "captcha"))
      .groupBy(window(col("event_ts"), windowDur), col("host"))
      .agg(count(lit(1)).as("failures"))
      .withColumn("trips_threshold", col("failures") >= threshold)
}
