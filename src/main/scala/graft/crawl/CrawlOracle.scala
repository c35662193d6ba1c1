package graft.crawl

import graft.core.UrlKernels
import graft.model.PolitenessState
import graft.synth.Synth
import scala.collection.mutable

/** Single-threaded reference-rules oracle: the same wave semantics as
  * [[CrawlEngine]], executed with plain collections. It shares every
  * kernel (UrlKernels, Politeness, Synth, the md5 mix key), so any
  * engine/oracle divergence is a dataflow bug, not a rules drift.
  * Used by the e2e suite to assert crawl-order + URL-seen + status
  * equality under parallel execution (SURVEY.md §5 rebuild mapping). */
object CrawlOracle {

  final case class OracleFetch(wave: Int, host: String, rank: Int,
                               normUrl: String, status: String)
  final case class Outcome(
      seen: Set[String], // all norm_urls ever admitted to the frontier
      statusCounts: Map[String, Long], // final frontier histogram
      fetches: Vector[OracleFetch],
      waveMetrics: Vector[Map[String, Long]])

  private final case class Row(normUrl: String, host: String, sourceId: String,
                               var status: String, priority: Int,
                               discoveredWave: Int)

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def run(cfg: Synth.Config): Outcome = {
    val frontier = mutable.LinkedHashMap.empty[String, Row]
    val politeness = mutable.Map.empty[String, PolitenessState]
    val discState = mutable.Map.empty[String, Int]
    val fetches = Vector.newBuilder[OracleFetch]
    val allMetrics = Vector.newBuilder[Map[String, Long]]

    // init (mirrors CrawlEngine.init)
    val freqs = Seq("daily", "weekly", "bi-weekly", "monthly", "broadcast", null)
    val srcs = (0 until cfg.nHosts).map { idx =>
      val h = Synth.hostName(idx)
      (f"src-$idx%04d", h, freqs(idx % freqs.length), 1 + idx % 10,
        if (idx % 19 == 18) "paused" else "active")
    }
    val crawlDelay = (0 until cfg.nHosts)
      .map(i => Synth.hostName(i) -> (i % 4) * 2.0).toMap
    val robots: Map[String, Seq[(String, Boolean)]] = (0 until cfg.nHosts).map { idx =>
      val h = Synth.hostName(idx)
      val base = Seq(("/private/", false), ("/", true))
      val rs = if (idx % 13 == 12) ("/stories/", false) +: base else base
      h -> rs.sortBy { case (p, _) => -p.length }
    }.toMap
    srcs.foreach { case (_, h, _, sens, _) =>
      politeness(h) = Politeness.initial(h, sens, crawlDelay(h), cfg.waveSeconds)
    }

    for (wave <- 0 until cfg.nWaves) {
      var discovered, duplicates, outOfScope, filtered, expired = 0L
      // 1. discovery
      val due = srcs.filter { case (sid, _, freq, _, status) =>
        status == "active" && (discState.get(sid) match {
          case None => true
          case Some(last) => (wave - last).toDouble >= UrlKernels.parseFrequencyToDays(freq)
        })
      }
      val batch = mutable.LinkedHashMap.empty[String, (String, Row)] // norm -> (rawUrl, row)
      due.foreach { case (sid, hostNorm, _, _, _) =>
        val hostIdx = sid.stripPrefix("src-").toInt
        Synth.rawLinks(cfg)(hostIdx, wave).foreach { case (url, _) =>
          val norm = UrlKernels.normalizeUrl(url)
          val host = UrlKernels.canonicalHost(url)
          val valid = UrlKernels.isValidUrl(url)
          val inScope = host == hostNorm
          val passesSkip = UrlKernels.passesSkipPatterns(url)
          val pubDay = Synth.idOf(norm).map(Synth.publishDay(cfg)).getOrElse(-1)
          val recent = pubDay == -1 || pubDay >= cfg.nowDay - cfg.recencyDays
          if (!valid) ()
          else if (!inScope) outOfScope += 1
          else if (!passesSkip) filtered += 1
          else if (!recent) expired += 1
          else batch.get(norm) match {
            case Some((prevUrl, _)) => // W2: keep min(url)
              duplicates += 1
              if (url < prevUrl) batch(norm) = (url, Row(norm, host, sid, "discovered", 1, wave))
            case None =>
              if (frontier.contains(norm)) duplicates += 1
              else batch(norm) = (url, Row(norm, host, sid, "discovered", 1, wave))
          }
        }
      }
      batch.values.foreach { case (_, row) => frontier(row.normUrl) = row }
      discovered = batch.size.toLong
      discState ++= due.map(d => d._1 -> wave)

      // 2. verification
      frontier.values.filter(_.status == "discovered").foreach { r =>
        r.status =
          if (r.normUrl.toLowerCase.contains("/wire/")) "wire"
          else if (!UrlKernels.isLikelyArticleUrl(r.normUrl)) "not_article"
          else if (UrlKernels.checkIsArticle(r.normUrl)) "article"
          else "not_article"
      }

      // 3. robots gate
      var robotsBlocked = 0L
      frontier.values.filter(_.status == "article").foreach { r =>
        val path = graft.core.PyUrl.urlsplit(r.normUrl).path
        val allowed = robots.get(r.host)
          .flatMap(_.find { case (p, _) => path.startsWith(p) }.map(_._2))
          .getOrElse(true)
        if (!allowed) { r.status = "robots_blocked"; robotsBlocked += 1 }
      }

      // 4. plan: per-host token ranking over available hosts
      val planned = frontier.values
        .filter(r => r.status == "article" &&
          politeness.get(r.host).exists(Politeness.available(_, wave, cfg.waveSeconds)))
        .toSeq
        .groupBy(_.host)
        .flatMap { case (host, rows) =>
          val tokens = politeness(host).tokens_per_wave
          rows.sortBy(r => (-r.priority, r.discoveredWave,
              md5Hex(s"${cfg.seed + wave}|${r.normUrl}")))
            .take(tokens).zipWithIndex
            .map { case (r, i) => (r, i + 1) }
        }

      // 5. fetch + 6. state updates
      val outcomes = mutable.Map.empty[String, Array[Int]] // ok nf fb rl to cp
      var fetched, failed = 0L
      planned.toSeq.sortBy { case (r, rank) => (r.host, rank) }.foreach { case (r, rank) =>
        val id = Synth.idOf(r.normUrl).getOrElse(-1L)
        val hostIdx = r.sourceId.stripPrefix("src-").toInt
        val f = if (id < 0) Synth.NotFound else Synth.fault(cfg)(hostIdx, id)
        val status = f match {
          case Synth.Ok => "extracted"
          case Synth.NotFound => "404"
          case Synth.Forbidden => "403"
          case Synth.RateLimited => "429"
          case Synth.Timeout => "timeout"
          case Synth.Captcha => "captcha"
        }
        fetches += OracleFetch(wave, r.host, rank, r.normUrl, status)
        if (status == "extracted") fetched += 1 else failed += 1
        val o = outcomes.getOrElseUpdate(r.host, Array.fill(6)(0))
        status match {
          case "extracted" => o(0) += 1; r.status = "extracted"
          case "404" => o(1) += 1; r.status = "404"
          case "403" => o(2) += 1; r.status = "403"
          case "429" => o(3) += 1
          case "timeout" => o(4) += 1
          case "captcha" => o(5) += 1
        }
      }
      outcomes.foreach { case (host, o) =>
        politeness(host) = Politeness.update(politeness(host),
          Politeness.HostOutcome(o(0), o(1), o(2), o(3), o(4), o(5)),
          wave, cfg.waveSeconds, crawlDelay(host))
      }
      allMetrics += Map(
        "discovered" -> discovered, "duplicates" -> duplicates,
        "out_of_scope" -> outOfScope, "filtered" -> filtered,
        "expired" -> expired, "planned" -> planned.size.toLong,
        "fetched" -> fetched, "failed" -> failed,
        "robots_blocked" -> robotsBlocked)
    }

    Outcome(
      seen = frontier.keySet.toSet,
      statusCounts = frontier.values.groupBy(_.status)
        .map { case (s, rs) => s -> rs.size.toLong },
      fetches = fetches.result(),
      waveMetrics = allMetrics.result())
  }
}
