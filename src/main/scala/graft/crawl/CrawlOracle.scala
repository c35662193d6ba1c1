package graft.crawl

import graft.core.{UrlKernels, functions => gf}
import graft.model.{PolitenessState, SourceState}
import graft.synth.Synth
import scala.collection.mutable

/** Single-threaded reference-rules oracle: the same wave semantics as
  * [[CrawlEngine]], executed with plain collections. It shares every
  * pure kernel (UrlKernels, Politeness, SourceRules, Synth, the xxhash64
  * mix key, robotsAllows), so any engine/oracle divergence is a dataflow
  * bug, not a rules drift. Used by the e2e suite to assert crawl-order +
  * URL-seen + status + discovery-state equality under parallel
  * execution, and by Verify to dump hard expectations for the driver's
  * DuckDB gate (SURVEY.md §5 rebuild mapping). */
object CrawlOracle {

  final case class OracleFetch(wave: Int, host: String, rank: Int,
                               normUrl: String, status: String)
  final case class Outcome(
      seen: Set[String], // all norm_urls ever admitted to the frontier
      statusCounts: Map[String, Long], // final frontier histogram (merged view)
      fetches: Vector[OracleFetch],
      waveMetrics: Vector[Map[String, Long]],
      sourceStates: Map[String, SourceState], // final discovery state
      politeness: Map[String, PolitenessState], // final per-host state
      frontier: Vector[FrontRow]) // final merged frontier rows

  final case class FrontRow(normUrl: String, host: String, sourceId: String,
                            var status: String, priority: Int,
                            discoveredWave: Int, var processedWave: Int,
                            var httpStatus: Int, discoveredBy: String,
                            publishDay: Int)

  def run(cfg: Synth.Config): Outcome = {
    val frontier = mutable.LinkedHashMap.empty[String, FrontRow]
    val politeness = mutable.Map.empty[String, PolitenessState]
    val state = mutable.Map.empty[String, SourceState]
    val fetches = Vector.newBuilder[OracleFetch]
    val allMetrics = Vector.newBuilder[Map[String, Long]]

    // init (mirrors CrawlEngine.init): EVERY source gets state +
    // politeness rows — like the engine, whose state rewrites keep all
    // rows. The dataset scope narrows only the DUE scan below, so
    // out-of-scope rows stay frozen at their initial values.
    val allSrcs = (0 until cfg.nHosts).map { idx =>
      (f"src-$idx%04d", Synth.hostName(idx), Synth.frequencyOf(idx),
        Synth.statusOf(idx), idx)
    }
    allSrcs.foreach { case (sid, h, _, _, idx) =>
      politeness(h) = Politeness.initial(h, Synth.sensitivityOf(idx),
        Synth.crawlDelayOf(idx), cfg.waveSeconds)
      state(sid) = SourceRules.initial(sid, h)
    }
    val srcs = allSrcs.filter { case (_, _, _, _, idx) =>
      cfg.datasetScope == null || Synth.datasetsOf(idx).contains(cfg.datasetScope)
    }

    for (wave <- 0 until cfg.nWaves) {
      var duplicates, outOfScope, filtered, expired = 0L
      var robotsBlocked, sectionLinks, rssFailures = 0L

      // 1. due sources (F11 + F12 gates)
      val due = srcs.filter { case (sid, _, freq, status, _) =>
        SourceRules.due(state(sid), status, freq, wave)
      }

      // 2. discovery: the SHARED SourceRules.cascade kernel (A5-gated
      // attempt order, RSS short-circuit, supplemental sections), then
      // the order-preserving union dedup (keep min (attempt, url) per
      // norm_url within the batch — this wave's attempt order)
      val batch = mutable.LinkedHashMap.empty[String, (Int, Int, String, FrontRow)]
      val outcomes = mutable.Map.empty[String, SourceRules.DiscoveryOutcome]
      due.foreach { case (sid, hostNorm, freq, _, idx) =>
        val st = state(sid)
        val rssSkip = SourceRules.rssSkipped(st, freq, wave)
        val order = SourceRules.effectiveMethods(st)
        val run = SourceRules.cascade(cfg)(idx, wave, order, rssSkip,
          st.discovered_sections)
        if (run.rssFailed) rssFailures += 1
        sectionLinks += run.rawSection
        run.links.foreach { l =>
          val lineage = l.methodRank match {
            case 0 => s"rss[$hostNorm/w$wave#${l.slot}]"
            case 1 => s"homepage[$hostNorm/w$wave#${l.slot}]"
            case _ => s"section_crawl[$hostNorm/${l.section}/w$wave#${l.slot}]"
          }
          val url = l.url
          val norm = UrlKernels.normalizeUrl(url)
          val host = UrlKernels.canonicalHost(url)
          val pubDay = Synth.idOf(norm).map(Synth.publishDay(cfg)).getOrElse(-1)
          def row = FrontRow(norm, host, sid, "discovered",
            Synth.priorityOf(l.methodRank), wave, -1, 0, lineage, pubDay)
          if (!UrlKernels.isValidUrl(url)) ()
          else if (host != hostNorm) outOfScope += 1
          else if (!UrlKernels.passesSkipPatterns(url)) filtered += 1
          else if (pubDay != -1 && pubDay < cfg.nowDay - cfg.recencyDays) expired += 1
          else batch.get(norm) match {
            case Some((prevAttempt, _, prevUrl, _)) => // W2/U1: keep min(attempt, url)
              duplicates += 1
              if (l.attempt < prevAttempt || (l.attempt == prevAttempt && url < prevUrl))
                batch(norm) = (l.attempt, l.methodRank, url, row)
            case None =>
              if (frontier.contains(norm)) duplicates += 1
              else batch(norm) = (l.attempt, l.methodRank, url, row)
          }
        }
        outcomes(sid) = SourceRules.DiscoveryOutcome(run.ranRss, run.rssFailed,
          run.ranHomepage, Map.empty, run.navSections) // method news + url-sections filled below
      }

      // admit batch; verification + robots gate on the new rows only
      batch.foreach { case (norm, (_, _, _, row)) =>
        val srcIdx = row.sourceId.stripPrefix("src-").toInt
        row.status =
          if (Synth.WirePatterns.exists(norm.toLowerCase.contains)) "wire"
          else if (!UrlKernels.isLikelyArticleUrl(norm)) "not_article"
          else if (Synth.precheckError(cfg)(norm)) {
            // HTTP precheck stage: terminal failure iff the source opted
            // into prechecks (url_verification.py:542-559)
            if (Synth.precheckOf(srcIdx)) "verification_failed"
            else "verification_uncertain"
          }
          else if (UrlKernels.checkIsArticle(norm)) "article"
          else "not_article"
        if (row.status == "article") {
          val idx = row.sourceId.stripPrefix("src-").toInt
          val path = graft.core.PyUrl.urlsplit(norm).path
          if (!CrawlEngine.robotsAllows(Synth.robotsRulesOf(idx), path)) {
            row.status = "robots_blocked"; robotsBlocked += 1
          }
        }
        frontier(norm) = row
      }
      val discovered = batch.size.toLong

      // per-(source, method) new counts + sections found (M4) — keyed by
      // the KEPT occurrence's method, as the engine's gatedDelta agg is
      val newByMethodPerSource = mutable.Map.empty[String, mutable.Map[Int, Long]]
      val sectionsPerSource = mutable.Map.empty[String, mutable.Set[String]]
      batch.foreach { case (norm, (_, methodRank, _, row)) =>
        val m = newByMethodPerSource.getOrElseUpdate(row.sourceId,
          mutable.Map(0 -> 0L, 1 -> 0L, 2 -> 0L))
        m(methodRank) = m(methodRank) + 1
        val sec = "/sections/([a-z]+)$".r.findFirstMatchIn(norm).map(_.group(1))
        sec.foreach(s => sectionsPerSource.getOrElseUpdate(row.sourceId,
          mutable.Set.empty) += s)
      }

      // 3. plan: eligible = article backlog + TTL-expired 404s (F10),
      // per available host top-`tokens` by (-priority, wave, mix, url)
      val planned = frontier.values
        .filter(r => (r.status == "article" ||
          (r.status == "404" && wave - r.processedWave >= cfg.deadUrlTtlWaves)) &&
          politeness.get(r.host).exists(Politeness.available(_, wave, cfg.waveSeconds)))
        .toSeq
        .groupBy(_.host)
        .flatMap { case (host, rows) =>
          val tokens = politeness(host).tokens_per_wave
          rows.sortBy(r => (-r.priority, r.discoveredWave,
              gf.mixKey64(cfg.seed + wave, r.normUrl), r.normUrl))
            .take(tokens).zipWithIndex
            .map { case (r, i) => (r, i + 1) }
        }

      // 4. fetch (fault schedule + X4 content typing) + state updates
      val hostOutcomes = mutable.Map.empty[String, Array[Int]] // ok nf fb rl to cp
      var fetched = 0L
      planned.toSeq.sortBy { case (r, rank) => (r.host, rank) }.foreach { case (r, rank) =>
        val id = Synth.idOf(r.normUrl).getOrElse(-1L)
        val hostIdx = r.sourceId.stripPrefix("src-").toInt
        val f = if (id < 0) Synth.NotFound else Synth.fault(cfg)(hostIdx, id, wave)
        val status = f match {
          case Synth.Ok => // X4: classify the payload via the shared detector
            ContentType.detect(Synth.captionFor(cfg, id), Synth.ContentPatterns)
          case Synth.NotFound => "404"
          case Synth.Forbidden => "403"
          case Synth.RateLimited => "429"
          case Synth.Timeout => "timeout"
          case Synth.Captcha => "captcha"
        }
        fetches += OracleFetch(wave, r.host, rank, r.normUrl, status)
        val o = hostOutcomes.getOrElseUpdate(r.host, Array.fill(6)(0))
        status match {
          case "404" => o(1) += 1; r.status = "404"; r.processedWave = wave; r.httpStatus = 404
          case "403" => o(2) += 1; r.status = "403"; r.processedWave = wave; r.httpStatus = 403
          case "429" => o(3) += 1; r.httpStatus = 429
          case "timeout" => o(4) += 1; r.httpStatus = 0
          case "captcha" => o(5) += 1; r.httpStatus = 403
          case ok => // extracted | obituary | opinion | wire
            o(0) += 1; fetched += 1
            r.status = ok; r.processedWave = wave; r.httpStatus = 200
        }
      }
      hostOutcomes.foreach { case (host, o) =>
        val hostIdx = host.stripPrefix("host-").takeWhile(_.isDigit).toInt
        politeness(host) = Politeness.update(politeness(host),
          Politeness.HostOutcome(o(0), o(1), o(2), o(3), o(4), o(5)),
          wave, cfg.waveSeconds, Synth.crawlDelayOf(hostIdx))
      }

      // 5. source-state transitions (F12/F13/M4 via the shared kernel)
      due.foreach { case (sid, _, freq, _, _) =>
        val base = outcomes(sid)
        val o = base.copy(
          newByMethod = newByMethodPerSource.get(sid)
            .map(_.toMap).getOrElse(Map(0 -> 0L, 1 -> 0L, 2 -> 0L)),
          // M4: URL-inferred (Strategy 2) ∪ nav-parsed (Strategy 1,
          // carried on base from the cascade run)
          sectionsFound = sectionsPerSource.get(sid)
            .map(_.toSeq.sorted).getOrElse(Seq.empty) ++ base.sectionsFound)
        state(sid) = SourceRules.update(state(sid), freq, o, wave)
      }
      val pausedSources = state.values.count(_.paused_auto).toLong

      allMetrics += Map(
        "discovered" -> discovered, "duplicates" -> duplicates,
        "out_of_scope" -> outOfScope, "filtered" -> filtered,
        "expired" -> expired, "planned" -> planned.size.toLong,
        "fetched" -> fetched, "failed" -> (planned.size.toLong - fetched),
        "robots_blocked" -> robotsBlocked, "rss_failures" -> rssFailures,
        "section_links" -> sectionLinks, "paused_sources" -> pausedSources)
    }

    Outcome(
      seen = frontier.keySet.toSet,
      statusCounts = frontier.values.groupBy(_.status)
        .map { case (s, rs) => s -> rs.size.toLong },
      fetches = fetches.result(),
      waveMetrics = allMetrics.result(),
      sourceStates = state.toMap,
      politeness = politeness.toMap,
      frontier = frontier.values.toVector)
  }
}
