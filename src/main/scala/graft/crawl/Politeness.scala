package graft.crawl

import graft.core.UrlKernels
import graft.model.PolitenessState

/** Pure politeness kernels shared by the Spark engine and the
  * single-threaded test oracle — one implementation, two executors, so
  * crawl-order equivalence is by construction.
  *
  * Constants from the reference:
  *  - sensitivity ladder: src/utils/bot_sensitivity_manager.py:21-112
  *  - 60 s domain cooldown, 3-failure→30-min pause, ≤3/domain/wave:
  *    src/services/work_queue.py:40-51
  *  - 403×2 → host auto-pause: src/cli/commands/extraction.py:1419-1450
  *  - escalation rules (+2 on 403 cap 10, +3 on captcha cap 10,
  *    +1 on 429 cap 8): SENSITIVITY_ADJUSTMENT_RULES
  */
object Politeness {

  val CooldownBaseS = 60.0
  val PauseAfterFailures = 3
  val PauseSeconds = 1800.0
  val MaxPerDomainPerWave = 3

  // index = sensitivity-1 (1..10)
  val InterRequestMinS: Array[Double] =
    Array(0.5, 1.0, 2.0, 3.0, 5.0, 8.0, 12.0, 20.0, 30.0, 45.0)
  val MaxBackoffS: Array[Double] =
    Array(120, 180, 240, 300, 300, 600, 900, 1200, 1800, 3600)
  val CaptchaBackoffBaseS: Array[Double] =
    Array(300, 450, 600, 900, 1200, 1800, 2400, 3600, 5400, 7200)
  val CaptchaBackoffMaxS: Array[Double] =
    Array(1800, 2400, 3600, 4200, 5400, 7200, 9000, 10800, 14400, 21600)

  def clampSensitivity(s: Int): Int = math.max(1, math.min(10, s))

  /** Per-wave token budget: the reference's ≤3/domain/request cap,
    * shrunk by the inter-request floor and the robots crawl-delay. */
  def tokensPerWave(sensitivity: Int, crawlDelayS: Double, waveSeconds: Double): Int = {
    val floor = math.max(InterRequestMinS(clampSensitivity(sensitivity) - 1), crawlDelayS)
    math.min(MaxPerDomainPerWave, math.max(1, math.floor(waveSeconds / floor).toInt))
  }

  def initial(host: String, sensitivity: Int, crawlDelayS: Double,
              waveSeconds: Double): PolitenessState =
    PolitenessState(host, clampSensitivity(sensitivity),
      tokensPerWave(sensitivity, crawlDelayS, waveSeconds),
      cooldown_until_s = 0.0, consecutive_failures = 0,
      paused_until_s = 0.0, bot_encounters = 0, forbidden_count = 0)

  /** Outcome counts for one host in one wave. */
  final case class HostOutcome(ok: Int, notFound: Int, forbidden: Int,
                               rateLimited: Int, timeout: Int, captcha: Int) {
    def failures: Int = forbidden + rateLimited + timeout + captcha
  }

  /** Deterministic state transition after a wave (the reference's
    * dict-increment + sleep logic, made a pure function of
    * (state, outcome, wave)). */
  def update(st: PolitenessState, out: HostOutcome, wave: Int,
             waveSeconds: Double, crawlDelayS: Double): PolitenessState = {
    val nowS = (wave + 1) * waveSeconds // wave end
    val failures = out.failures
    val consecutive =
      if (failures > 0) st.consecutive_failures + 1
      else if (out.ok > 0) 0
      else st.consecutive_failures
    // sensitivity escalation ladder
    var sens = st.bot_sensitivity
    if (out.forbidden > 0) sens = math.min(10, sens + 2)
    if (out.captcha > 0) sens = math.min(10, sens + 3)
    if (out.rateLimited > 0 && sens < 8) sens += 1 // +1 cap 8, never downgrades
    if (out.timeout > 0 && sens < 7) sens += 1 // connection_timeout +1 cap 7
    sens = clampSensitivity(sens)
    // cooldown: exponential backoff with seeded jitter (C9)
    val cooldown =
      if (out.captcha > 0) {
        val base = CaptchaBackoffBaseS(sens - 1)
        val capped = math.min(base * math.pow(2.0, math.max(0, consecutive - 1)),
          CaptchaBackoffMaxS(sens - 1))
        nowS + capped
      } else if (failures > 0) {
        nowS + UrlKernels.backoffSeconds(CooldownBaseS, consecutive,
          MaxBackoffS(sens - 1), st.host, wave.toLong)
      } else st.cooldown_until_s
    val forbiddenCount = st.forbidden_count + out.forbidden
    val paused =
      if (forbiddenCount >= 2) Double.MaxValue // host auto-pause
      else if (consecutive >= PauseAfterFailures) nowS + PauseSeconds
      else st.paused_until_s
    PolitenessState(st.host, sens,
      tokensPerWave(sens, crawlDelayS, waveSeconds),
      cooldown, consecutive, paused,
      st.bot_encounters + out.forbidden + out.captcha, forbiddenCount)
  }

  /** A host may be scheduled in `wave` iff neither cooling nor paused at
    * wave start. */
  def available(st: PolitenessState, wave: Int, waveSeconds: Double): Boolean = {
    val startS = wave * waveSeconds
    st.cooldown_until_s <= startS && st.paused_until_s <= startS
  }
}
