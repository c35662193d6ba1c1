package graft.crawl

import graft.core.UrlKernels
import graft.model.SourceState
import graft.synth.Synth

/** Pure per-source discovery-state kernels shared by the Spark engine
  * and the single-threaded test oracle (same pattern as [[Politeness]]).
  * Logical time: 1 wave ≙ 1 day, so the reference's day-based ledger
  * thresholds apply to wave numbers directly.
  *
  * Reference rules:
  *  - F13 RSS transient-failure ledger: record each feed failure; the
  *    feed is declared missing after 3 consecutive failures OR ≥5
  *    failures inside a 7-day window; while missing, RSS is skipped
  *    until the retry window (rssRetryWindowDays, cadence-scaled)
  *    elapses; a success clears the ledger
  *    (discovery.py:1158-1515, 1920-1935).
  *  - F12 no-effective-methods counter: a due wave in which no method
  *    yields any NEW url increments the counter; at the cadence-adaptive
  *    threshold (C8) the source auto-pauses
  *    (source_processing.py:301-380).
  *  - M4 discovered sections accumulate monotonically
  *    (source_processing.py:461-619).
  */
object SourceRules {

  /** What one wave's discovery did for one due source. */
  final case class DiscoveryOutcome(
      rssAttempted: Boolean,
      rssFailed: Boolean,
      newByMethod: Map[Int, Long], // method_rank (0=rss,1=homepage,2=section) → new urls
      sectionsFound: Seq[String])

  val MethodNames: Map[Int, String] = Map(0 -> "rss", 1 -> "homepage", 2 -> "section_crawl")

  def initial(sourceId: String, host: String): SourceState =
    SourceState(sourceId, host, last_wave = -1,
      rss_consecutive_failures = 0, rss_failure_waves = Seq.empty,
      rss_missing_wave = -1, no_effective_consecutive = 0,
      paused_auto = false, last_successful_method = "",
      discovered_sections = Seq.empty)

  /** Is the source due at `wave` (F11 predicate + F12 pause gate)? */
  def due(st: SourceState, sourceStatus: String, frequency: String, wave: Int): Boolean =
    sourceStatus == "active" && !st.paused_auto && {
      st.last_wave < 0 ||
        (wave - st.last_wave).toDouble >= UrlKernels.parseFrequencyToDays(frequency)
    }

  /** Is RSS skipped at `wave` because the feed is marked missing and the
    * cadence-scaled retry window has not elapsed (F13 skip + C7)? */
  def rssSkipped(st: SourceState, frequency: String, wave: Int): Boolean =
    st.rss_missing_wave >= 0 &&
      wave < st.rss_missing_wave + UrlKernels.rssRetryWindowDays(frequency)

  /** State transition after a due wave's discovery. */
  def update(st: SourceState, frequency: String, o: DiscoveryOutcome,
             wave: Int): SourceState = {
    // F13 ledger
    var consec = st.rss_consecutive_failures
    var failures = st.rss_failure_waves
    var missing = st.rss_missing_wave
    if (o.rssAttempted) {
      if (o.rssFailed) {
        consec += 1
        failures = (failures :+ wave).filter(_ > wave - Synth.RssWindowWaves)
        if (consec >= Synth.RssConsecThreshold ||
          failures.length >= Synth.RssWindowThreshold) missing = wave
      } else {
        consec = 0
        missing = -1
        failures = failures.filter(_ > wave - Synth.RssWindowWaves)
      }
    }
    // F12 counter + C8 adaptive threshold
    val totalNew = o.newByMethod.values.sum
    val noEff = if (totalNew == 0) st.no_effective_consecutive + 1 else 0
    val paused = st.paused_auto ||
      noEff >= UrlKernels.adaptivePauseThreshold(frequency)
    // telemetry: first method (in cascade order) that yielded new urls
    val lastOk = o.newByMethod.filter(_._2 > 0).keys.toSeq.sorted.headOption
      .map(MethodNames).getOrElse(st.last_successful_method)
    st.copy(
      last_wave = wave,
      rss_consecutive_failures = consec,
      rss_failure_waves = failures,
      rss_missing_wave = missing,
      no_effective_consecutive = noEff,
      paused_auto = paused,
      last_successful_method = lastOk,
      discovered_sections =
        (st.discovered_sections ++ o.sectionsFound).distinct.sorted)
  }
}
