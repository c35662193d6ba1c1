package graft.synth

import graft.model._
import graft.ops.ImageKernels
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic crawl world (FIXTURES.md): seed hosts, a
  * link graph whose URL shapes cover every reference filter branch, an
  * RFC 9309-ish robots rule set (graft-added), and a fault schedule
  * driving the status state machine. Everything is a pure function of
  * (seed, ids) — no RNG state, no wall clock — so any two runs (and any
  * two parallelism levels) see the identical world.
  *
  * Reference branch coverage (SURVEY.md §2 / FIXTURES.md §4):
  * dup variants (?utm / #frag / trailing slash) collapsing under
  * normalize_url; cross-host out-of-scope links; skip-pattern and
  * regex-non-article paths; expired and null publish dates; 404/403/
  * 429/timeout/captcha faults (extraction.py:1287-1450 branches).
  */
object Synth {

  final case class Config(
      nHosts: Int = 20,
      urlsPerHostPerWave: Int = 30,
      nWaves: Int = 3,
      seed: Long = 42L,
      waveSeconds: Double = 60.0, // logical seconds per wave
      recencyDays: Int = 7, // F8 watermark
      nowDay: Int = 20000, // logical "today" as day ordinal
      nBuckets: Int = 32, // frontier host-hash buckets
      imageSize: Int = 24)

  def hostName(i: Int): String = f"host-$i%04d.example"

  private def mix(parts: Long*): Long = {
    var h = 0xcbf29ce484222325L
    parts.foreach { p =>
      var x = p
      var i = 0
      while (i < 8) { h ^= (x & 0xff); h *= 0x100000001b3L; x >>>= 8; i += 1 }
    }
    h
  }

  /** Seed registry (reference sources synthesis per FIXTURES.md §2). */
  def sources(spark: SparkSession, cfg: Config): Dataset[Source] = {
    import spark.implicits._
    val freqs = Seq("daily", "weekly", "bi-weekly", "monthly", "broadcast", null)
    spark.range(cfg.nHosts).map { i =>
      val idx = i.toInt
      val h = hostName(idx)
      Source(
        source_id = f"src-$idx%04d",
        host = s"www.$h",
        host_norm = h,
        canonical_name = f"Publisher $idx%04d",
        frequency = freqs(idx % freqs.length),
        bot_sensitivity = 1 + idx % 10,
        status = if (idx % 19 == 18) "paused" else "active",
        base_url = s"https://www.$h")
    }
  }

  /** Article id for (host, wave, slot). */
  def articleId(cfg: Config)(hostIdx: Int, wave: Int, slot: Int): Long =
    (hostIdx.toLong * cfg.nWaves + wave) * cfg.urlsPerHostPerWave + slot

  /** Raw discovered links for one source in one wave — the synthetic
    * stand-in for RSS/homepage expansion (S5/S6). URL shapes by slot:
    * clean story, utm-dup, frag-dup, trailing-slash-dup, date path,
    * skip-pattern, regex-non-article, out-of-scope host, robots-blocked
    * path. Publish day ages with the article id (some expired, some
    * null). */
  def rawLinks(cfg: Config)(hostIdx: Int, wave: Int): Seq[(String, Int)] = {
    val h = hostName(hostIdx)
    (0 until cfg.urlsPerHostPerWave).map { slot =>
      val id = articleId(cfg)(hostIdx, wave, slot)
      val base = f"https://www.$h/stories/a-$id%08d"
      val url = slot % 10 match {
        case 0 | 1 | 2 => base
        case 3 => f"https://www.$h/photo-gallery/g-$id%08d" // F5 → not_article
        case 4 => base + "?utm_source=rss&ref=feed"
        case 5 => base + "#comments"
        case 6 =>
          val d = math.abs(publishDay(cfg)(id))
          val y = 2020 + (d % 5); val m = 1 + (d % 12); val dd = 1 + (d % 28)
          f"https://www.$h/$y%04d/$m%02d/$dd%02d/title-$id%08d"
        case 7 => s"https://www.$h/category/section-$id" // F4 skip
        case 8 => f"https://other-${hostIdx % 5}%02d.example/stories/x-$id%08d" // F7 scope
        case _ => f"https://www.$h/private/stories/a-$id%08d" // robots-blocked (article-like path so it survives verification and is dropped by the robots join)
      }
      (url, slot)
    }
  }

  /** Synthetic publish day ordinal; -1 ≙ null (nulls pass the recency
    * filter, discovery.py:1937-1942). Slot-keyed: ~1/11 null, ~1/7 old. */
  def publishDay(cfg: Config)(id: Long): Int = {
    val m = mix(cfg.seed, 0x9e37L, id)
    if (java.lang.Long.remainderUnsigned(m, 11) == 0) -1
    else if (java.lang.Long.remainderUnsigned(m, 7) == 0)
      cfg.nowDay - cfg.recencyDays - 1 - (java.lang.Long.remainderUnsigned(m >>> 8, 30)).toInt
    else cfg.nowDay - (java.lang.Long.remainderUnsigned(m >>> 8, cfg.recencyDays.toLong)).toInt
  }

  /** Robots rules (graft-added per north rule; RFC 9309 longest-match).
    * Every 13th host disallows /stories/ entirely; all hosts disallow
    * /private/; crawl_delay scales with hostIdx. */
  def robots(spark: SparkSession, cfg: Config): Dataset[RobotsRule] = {
    import spark.implicits._
    spark.range(cfg.nHosts).flatMap { i =>
      val idx = i.toInt
      val h = hostName(idx)
      val base = Seq(
        RobotsRule(h, 0, allow = false, "/private/", (idx % 4) * 2.0),
        RobotsRule(h, 1, allow = true, "/", (idx % 4) * 2.0))
      if (idx % 13 == 12)
        RobotsRule(h, 0, allow = false, "/stories/", (idx % 4) * 2.0) +: base
      else base
    }
  }

  // ---- the deterministic "server" (fetch resolver) ----

  sealed trait Fault
  case object Ok extends Fault
  case object NotFound extends Fault
  case object Forbidden extends Fault
  case object RateLimited extends Fault
  case object Timeout extends Fault
  case object Captcha extends Fault

  /** Fault schedule: pure function of (seed, url-id). 403 clusters on
    * every 17th host (exercising the ×2-forbidden auto-pause,
    * extraction.py:1419-1450); 429/captcha cluster lightly elsewhere. */
  def fault(cfg: Config)(hostIdx: Int, id: Long): Fault = {
    if (hostIdx % 17 == 16 && id % 3 != 0) Forbidden
    else {
      val m = java.lang.Long.remainderUnsigned(mix(cfg.seed, 0xfa17L, id), 100)
      if (m < 4) NotFound
      else if (m < 6) RateLimited
      else if (m < 8) Timeout
      else if (m < 9) Captcha
      else Ok
    }
  }

  def httpStatus(f: Fault): Int = f match {
    case Ok => 200
    case NotFound => 404
    case Forbidden => 403
    case RateLimited => 429
    case Timeout => 0
    case Captcha => 403
  }

  /** Ground-truth payload for an article id: seeded pixels encoded png
    * (4 of 5) or jpeg (1 of 5), deterministic caption, integer phash. */
  def imageFor(cfg: Config)(id: Long): ImageRow = {
    val img = ImageKernels.synthPixels(cfg.seed ^ id, cfg.imageSize, cfg.imageSize)
    val fmt = if (id % 5 == 4) "jpeg" else "png"
    val bytes = ImageKernels.encode(img, fmt)
    ImageRow(
      image_id = f"img-$id%08d",
      bytes = bytes,
      w = cfg.imageSize,
      h = cfg.imageSize,
      fmt = fmt,
      caption = captionFor(cfg, id),
      phash = ImageKernels.phash64(img))
  }

  def captionFor(cfg: Config, id: Long): String = {
    val vocab = Array("river", "bridge", "council", "school", "harvest",
      "storm", "festival", "election", "market", "wildfire")
    val m = mix(cfg.seed, 0xca9L, id)
    val a = vocab((java.lang.Long.remainderUnsigned(m, 10)).toInt)
    val b = vocab((java.lang.Long.remainderUnsigned(m >>> 16, 10)).toInt)
    f"$a and $b story $id%08d"
  }

  /** Parse the article id back out of a normalized synthetic URL. */
  def idOf(normUrl: String): Option[Long] = {
    val i = normUrl.lastIndexOf('-')
    if (i < 0) None
    else {
      val tail = normUrl.substring(i + 1)
      if (tail.length == 8 && tail.forall(_.isDigit)) Some(tail.toLong) else None
    }
  }
}
