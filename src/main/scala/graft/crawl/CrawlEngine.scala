package graft.crawl

import graft.core.{UrlKernels, functions => gf}
import graft.model._
import graft.ops.ImageKernels
import graft.store.SnapshotStore
import graft.synth.Synth
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.util.sketch.BloomFilter

/** The Spark-native URL-frontier + fetch scheduler (BASELINE.json
  * north rule). One wave =
  *
  *   sources(due) → flatMap(expand) → normalize → scope/skip/recency
  *     → batch-dedup (W2) → Bloom-prefiltered exact anti-join vs seen
  *     → append `discovered`
  *   → verification status rewrite (wire/regex/article rules)
  *   → robots longest-match gate (broadcast join)
  *   → per-host politeness token ranking (W1/W4) over available hosts
  *   → repartition(host_bucket) → mapPartitions(resolve) → results
  *   → frontier/politeness/seen/metrics snapshot commit (resumable)
  *
  * Scale design (10^10-URL frontier): the frontier and seen tables are
  * hash-bucketed by canonical host (`host_bucket`), written
  * `partitionBy(host_bucket)` so bucket joins prune at the scan; the
  * Bloom bank (one spark.util.sketch.BloomFilter per bucket) screens
  * definitely-new URLs out of the exact anti-join, so the shuffled
  * anti-join input is |dups + false-positives|, not |batch|; the
  * politeness/robots tables are host-cardinality and broadcast; hot
  * hosts cannot skew fetch partitions because the token cap (≤3/wave)
  * bounds per-host fanout before the shuffle. All "time" is logical
  * (wave number × waveSeconds), which makes runs bit-identical at any
  * parallelism — the two-cluster-size equivalence the north rule
  * demands.
  */
final class CrawlEngine(spark: SparkSession, cfg: Synth.Config, store: SnapshotStore) {
  import spark.implicits._

  private val SeenFpp = 0.01
  private val bloomCapacityPerBucket =
    math.max(1000L, cfg.nHosts.toLong * cfg.urlsPerHostPerWave * cfg.nWaves / cfg.nBuckets * 2)

  // host → robots crawl_delay (host-cardinality; broadcast)
  private lazy val crawlDelayByHost: Map[String, Double] =
    Synth.robots(spark, cfg).collect()
      .groupBy(_.host).map { case (h, rs) => h -> rs.head.crawl_delay_s }

  // host → (ordered robots rules) for longest-match gating
  private lazy val robotsRules: Map[String, Seq[(String, Boolean)]] =
    Synth.robots(spark, cfg).collect()
      .groupBy(_.host)
      .map { case (h, rs) =>
        h -> rs.sortBy(r => -r.path_prefix.length).map(r => (r.path_prefix, r.allow)).toSeq
      }

  def init(): Unit = {
    if (store.lastCommittedWave() >= 0) return // resume — keep state
    val sources = Synth.sources(spark, cfg)
    store.write(sources.toDF().coalesce(1), "sources", wave = -1, lineage = "synth seed registry")
    store.write(Synth.robots(spark, cfg).toDF().coalesce(1), "robots", wave = -1, lineage = "synth robots")
    val cd = crawlDelayByHost
    val ws = cfg.waveSeconds
    val pol = sources.map { s =>
      Politeness.initial(s.host_norm, s.bot_sensitivity,
        cd.getOrElse(s.host_norm, 0.0), ws)
    }
    store.write(pol.toDF().coalesce(1), "politeness", wave = -1, lineage = "sensitivity ladder init")
    store.write(spark.emptyDataset[FrontierRow].toDF(), "frontier", wave = -1)
    store.write(spark.emptyDataset[FetchResult].toDF(), "results", wave = -1)
    store.write(spark.emptyDataset[(String, Int)].toDF("source_id", "last_wave"),
      "discovery_state", wave = -1)
    store.write(spark.emptyDataset[(Int, Array[Byte])].toDF("bucket", "bloom"),
      "seen_bloom", wave = -1)
  }

  // ---------------------------------------------------------------- waves

  // driver-resident seen-filter bank (rebuilt from the snapshot on resume)
  @volatile private var bankCache: Option[Map[Int, Array[Byte]]] = None

  private val trace = sys.env.get("GRAFT_TRACE").contains("1")
  private def timed[T](label: String, wave: Int)(f: => T): T = {
    if (!trace) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[trace] wave=$wave $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }
  }

  def runWave(wave: Int): WaveMetrics = {
    val frontier = store.read(spark, "frontier").cache()
    val politeness = store.read(spark, "politeness").as[PolitenessState]

    // ---- 1. discovery (S1/S5/S6 → F-chain → J6/S9) ----
    val sources = store.read(spark, "sources").as[Source]
    val discState = store.read(spark, "discovery_state")
      .as[(String, Int)].collect().toMap // source-cardinality
    val due = sources.filter { s =>
      s.status == "active" && {
        val cadence = UrlKernels.parseFrequencyToDays(s.frequency)
        discState.get(s.source_id) match {
          case None => true
          case Some(last) => (wave - last).toDouble >= cadence
        }
      }
    }

    val cfgB = spark.sparkContext.broadcast(cfg)
    // sources snapshot is a single file (host-cardinality); spread the
    // expansion across all cores — without this, the whole
    // expand+normalize chain runs in ONE task regardless of cluster size
    val raw = due.repartition(spark.sparkContext.defaultParallelism).flatMap { s =>
      val hostIdx = s.source_id.stripPrefix("src-").toInt
      Synth.rawLinks(cfgB.value)(hostIdx, wave).map { case (url, slot) =>
        (s.source_id, s.host_norm, url,
          s"discovery.synth_feed[${s.host_norm}/w$wave#$slot]") // M5 lineage
      }
    }.toDF("source_id", "src_host", "url", "discovered_by")

    // F-chain with a single outcome tag; metrics ride the dedup action
    // via observe() — no separate counting job (A7: "one pass, outcome
    // enum column" — the reference's per-counter dict increments
    // collapsed into observed aggregates)
    val discObs = org.apache.spark.sql.Observation()
    val normalized = raw
      .withColumn("norm_url", gf.normalize_url(col("url")))
      .withColumn("host", gf.canonical_host(col("url")))
      .withColumn("pub_day", publishDayUdf(col("norm_url")))
      .withColumn("outcome",
        when(!gf.is_valid_url(col("url")), lit("invalid"))
          .when(col("host") =!= col("src_host"), lit("out_of_scope")) // F7
          .when(!gf.passes_skip_patterns(col("url")), lit("filtered")) // F4
          .when(col("pub_day") =!= -1 &&
            col("pub_day") < lit(cfg.nowDay - cfg.recencyDays), lit("expired")) // F8
          .otherwise(lit("ok")))
      .observe(discObs,
        count(when(col("outcome") === "out_of_scope", 1)).as("out_of_scope"),
        count(when(col("outcome") === "filtered", 1)).as("filtered"),
        count(when(col("outcome") === "expired", 1)).as("expired"),
        count(when(col("outcome") === "ok", 1)).as("ok"))

    // W2: first-occurrence within the batch, deterministic keep =
    // min(url). min(struct(url, …)) instead of a row_number window:
    // hash-aggregates partial-combine map-side, so the shuffle carries
    // one row per norm_url, not the whole batch.
    val candidates = normalized
      .filter(col("outcome") === "ok")
      .groupBy("norm_url")
      .agg(min(struct(col("url"), col("source_id"), col("src_host"),
        col("host"), col("pub_day"), col("discovered_by"))).as("r"))
      .select(col("norm_url"), col("r.url"), col("r.source_id"),
        col("r.src_host"), col("r.host"), col("r.pub_day"), col("r.discovered_by"))

    // J6: Bloom-prefiltered exact seen check (filters broadcast
    // pre-deserialized — one object per executor, not per row). The
    // bank stays resident on the driver between waves; the snapshot
    // table is the durable copy for resume.
    val bloomBank = bankCache.getOrElse(loadBloomBank())
    val bankB = spark.sparkContext.broadcast(bloomBank.map { case (b, bytes) =>
      b -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    })
    val nb = cfg.nBuckets
    val withBucket = candidates
      .withColumn("host_bucket", pmod(xxhash64(col("host")), lit(nb.toLong)).cast("int"))
      .withColumn("maybe_seen", // evaluated once, reused by both branches
        mightContainUdf(bankB)(col("host_bucket"), col("norm_url")))
    val maybeSeen = withBucket.filter(col("maybe_seen")).drop("maybe_seen")
    val definitelyNew = withBucket.filter(!col("maybe_seen")).drop("maybe_seen")
    val confirmedNew = maybeSeen.join(
      frontier.select(col("norm_url").as("seen_url")),
      maybeSeen("norm_url") === col("seen_url"), "left_anti")
    val newLinks = definitelyNew.unionByName(confirmedNew)

    val dedupObs = org.apache.spark.sql.Observation()
    val discovered = newLinks.select(
      col("url"), col("norm_url"), col("host"), col("host_bucket"),
      col("source_id"), lit("discovered").as("status"),
      lit(1).as("priority"), lit(0).as("crawl_depth"),
      col("discovered_by"), lit(wave).as("discovered_wave"),
      lit(-1).as("processed_wave"), lit(0).as("http_status"),
      col("pub_day").as("publish_day"), lit("").as("content_hash"),
      lit("").as("error_message"))
      .observe(dedupObs, count(lit(1)).as("n")) // rides the first action
      .cache()

    // ---- 2. verification (F5/F6/F9 rule cascade → status rewrite) ----
    val afterDiscovery = frontier.unionByName(discovered)
    val verified = afterDiscovery.withColumn("status",
      when(col("status") === "discovered",
        when(lower(col("norm_url")).rlike("/wire/"), lit("wire")) // F9
          .when(!gf.is_likely_article_path(pathOf(col("norm_url"))), lit("not_article")) // F5
          .when(gf.check_is_article(col("norm_url")), lit("article")) // F6/X1
          .otherwise(lit("not_article")))
        .otherwise(col("status")))

    // ---- 3. robots gate (graft-added; broadcast longest-match) ----
    val rulesB = spark.sparkContext.broadcast(robotsRules)
    val robotsAllowsUdf = udf { (host: String, norm: String) =>
      CrawlEngine.robotsAllows(rulesB.value, host, graft.core.PyUrl.urlsplit(norm).path)
    }
    val gated = verified.withColumn("status",
      when(col("status") === "article" && !robotsAllowsUdf(col("host"), col("norm_url")),
        lit("robots_blocked")).otherwise(col("status")))
      .cache()

    // ---- 4. wave plan (W1/W4 token ranking over available hosts) ----
    val waveSec = cfg.waveSeconds
    val availHosts = politeness.filter(st => Politeness.available(st, wave, waveSec))
      .map(st => (st.host, st.tokens_per_wave))
      .toDF("p_host", "tokens")
    val mixSeed = cfg.seed + wave
    val eligible = gated.filter(col("status") === "article")
      .join(broadcast(availHosts), col("host") === col("p_host"), "inner")
      .withColumn("mix", gf.mix_key(mixSeed, col("norm_url")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("host")
          .orderBy(desc("priority"), asc("discovered_wave"), asc("mix"))))
      .filter(col("rn") <= col("tokens"))

    val planned = eligible.select("norm_url", "host", "host_bucket", "source_id", "rn", "mix")

    // ---- 5. fetch (mapPartitions resolver keyed by host bucket) ----
    val results = planned
      .repartition(math.max(spark.sparkContext.defaultParallelism, cfg.nBuckets),
        col("host_bucket"))
      .sortWithinPartitions("host", "rn")
      .as[(String, String, Int, String, Int, String)]
      .mapPartitions { it =>
        val c = cfgB.value
        it.map { case (norm, host, bucket, srcId, rn, mix) =>
          CrawlEngine.resolve(c, norm, host, bucket, srcId, wave, rn)
        }
      }.cache()

    // fetch metrics observed on the results write — no counting job
    val resultsObs = org.apache.spark.sql.Observation()
    val resultsToWrite = results.toDF().observe(resultsObs,
      count(lit(1)).as("planned"),
      count(when(col("status") === "extracted", 1)).as("fetched"))

    // ---- 6. state rewrites + commit ----
    // frontier: fold fetch outcomes in (status transitions §1.4)
    val out = results.toDF()
      .select(col("norm_url").as("r_url"), col("status").as("r_status"),
        col("http_status").as("r_http"), col("wave").as("r_wave"))
    val frontierNext = gated
      .join(out, col("norm_url") === col("r_url"), "left")
      .withColumn("status", when(col("r_status").isNotNull,
        when(col("r_status") === "extracted", lit("extracted"))
          .when(col("r_status") === "404", lit("404"))
          .when(col("r_status") === "403", lit("403"))
          .otherwise(col("status"))) // 429/timeout/captcha stay retryable
        .otherwise(col("status")))
      .withColumn("http_status", when(col("r_http").isNotNull, col("r_http")).otherwise(col("http_status")))
      .withColumn("processed_wave", when(col("r_status").isin("extracted", "404", "403"), col("r_wave"))
        .otherwise(col("processed_wave")))
      .withColumn("error_message", when(col("r_status").isNotNull && col("r_status") =!= "extracted",
        col("r_status")).otherwise(col("error_message")))
      .drop("r_url", "r_status", "r_http", "r_wave")
    // robots metric rides the frontier-write action — no separate job
    val robotsObs = org.apache.spark.sql.Observation()
    val frontierToWrite = frontierNext.observe(robotsObs,
      count(when(col("status") === "robots_blocked" &&
        col("processed_wave") === -1 && col("discovered_wave") === wave, 1))
        .as("robots_blocked"))

    // politeness: per-host outcome aggregation → pure kernel update
    val outcomes = results.groupByKey(_.host).mapGroups { (h, it) =>
      var ok, nf, fb, rl, to, cp = 0
      it.foreach { r =>
        r.status match {
          case "extracted" => ok += 1
          case "404" => nf += 1
          case "403" => fb += 1
          case "429" => rl += 1
          case "timeout" => to += 1
          case "captcha" => cp += 1
          case _ =>
        }
      }
      (h, ok, nf, fb, rl, to, cp)
    }.toDF("o_host", "ok", "nf", "fb", "rl", "to", "cp")
    val cdB = spark.sparkContext.broadcast(crawlDelayByHost)
    val politenessNext = politeness.toDF()
      .join(outcomes, col("host") === col("o_host"), "left")
      .as[(String, Int, Int, Double, Int, Double, Int, Int,
        Option[String], Option[Int], Option[Int], Option[Int], Option[Int], Option[Int], Option[Int])]
      .map { case (host, sens, tok, cool, fails, paused, enc, forb,
        oHost, ok, nf, fb, rl, to, cp) =>
        val st = PolitenessState(host, sens, tok, cool, fails, paused, enc, forb)
        if (oHost.isEmpty) st
        else Politeness.update(st,
          Politeness.HostOutcome(ok.getOrElse(0), nf.getOrElse(0), fb.getOrElse(0),
            rl.getOrElse(0), to.getOrElse(0), cp.getOrElse(0)),
          wave, waveSec, cdB.value.getOrElse(host, 0.0))
      }

    // the results write runs FIRST and alone: it materializes the whole
    // discovery→plan→fetch chain (and its caches), so every observation
    // (disc/dedup/results) completes in exactly one action — observing
    // on racing cache-splitting actions would shear the counters. The
    // remaining four state writes only read caches / driver state and
    // run as concurrent Spark jobs: serial section = results write +
    // max(other writes), not a sum.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // results is append-only: each wave writes only its delta
    // (readAll() is the log view) — no O(history) rewrite per wave
    val resultsPin = timed("write_results", wave) {
      store.write(resultsToWrite, "results", wave, lineage = s"wave $wave delta")
    }
    val fResults = Future(resultsPin)
    val fFrontier = Future(timed("write_frontier", wave) {
      store.write(frontierToWrite, "frontier", wave, lineage = s"wave $wave rewrite")
    })
    // host-cardinality tables: one file per snapshot, not one per task
    val fPoliteness = Future(timed("write_politeness", wave) {
      store.write(politenessNext.toDF().coalesce(1), "politeness", wave)
    })
    val fBloom = Future(timed("bloom_merge", wave) {
      val bankNext = mergeBloomBank(bloomBank,
        discovered.select("host_bucket", "norm_url").as[(Int, String)])
      bankCache = Some(bankNext)
      store.write(bankNext.toSeq.toDF("bucket", "bloom").coalesce(1), "seen_bloom", wave)
    })
    val fDiscState = Future {
      val dueSet = dueIds(due)
      val kept = store.read(spark, "discovery_state").as[(String, Int)]
        .filter(r => !dueSet.contains(r._1)).toDF("source_id", "last_wave")
      val fresh = due.map(s => (s.source_id, wave)).toDF("source_id", "last_wave")
      store.write(kept.unionByName(fresh).coalesce(1), "discovery_state", wave)
    }
    val pins = Map(
      "frontier" -> Await.result(fFrontier, Duration.Inf),
      "results" -> Await.result(fResults, Duration.Inf),
      "politeness" -> Await.result(fPoliteness, Duration.Inf),
      "seen_bloom" -> Await.result(fBloom, Duration.Inf),
      "discovery_state" -> Await.result(fDiscState, Duration.Inf))

    // all counters come from observations riding the write actions
    val discMetrics = discObs.get
    val nOutOfScope = discMetrics("out_of_scope").asInstanceOf[Long]
    val nFiltered = discMetrics("filtered").asInstanceOf[Long]
    val nExpired = discMetrics("expired").asInstanceOf[Long]
    val nOk = discMetrics("ok").asInstanceOf[Long]
    val nDiscovered = dedupObs.get("n").asInstanceOf[Long]
    val nDuplicates = nOk - nDiscovered // batch dups + already-seen
    val nPlanned = resultsObs.get("planned").asInstanceOf[Long]
    val nFetched = resultsObs.get("fetched").asInstanceOf[Long]
    val nFailed = nPlanned - nFetched
    val metrics = WaveMetrics(wave, nDiscovered, math.max(0, nDuplicates),
      nOutOfScope, nFiltered, nExpired, nPlanned, nFetched, nFailed,
      robotsObs.get("robots_blocked").asInstanceOf[Long])
    store.commitWave(wave, pins, Map(
      "discovered" -> metrics.discovered, "duplicates" -> metrics.duplicates,
      "out_of_scope" -> metrics.out_of_scope, "filtered" -> metrics.filtered,
      "expired" -> metrics.expired, "planned" -> metrics.planned,
      "fetched" -> metrics.fetched, "failed" -> metrics.failed,
      "robots_blocked" -> metrics.robots_blocked))
    frontier.unpersist(); results.unpersist()
    gated.unpersist(); discovered.unpersist()
    metrics
  }

  private def dueIds(due: Dataset[Source]): Set[String] =
    due.map(_.source_id).collect().toSet

  /** Run (or resume) the crawl to `nWaves`. Already-committed waves are
    * skipped — the store's last commit is the checkpoint. */
  def run(): Seq[WaveMetrics] = {
    init()
    val start = store.lastCommittedWave() + 1
    (start until cfg.nWaves).map(runWave)
  }

  // ------------------------------------------------------------- helpers

  private def pathOf(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "^[a-z]+://[^/]*", "")

  private val publishDayUdf = {
    val c = cfg
    udf { norm: String =>
      Synth.idOf(norm).map(id => Synth.publishDay(c)(id)).getOrElse(-1)
    }
  }

  private def mightContainUdf(bank: org.apache.spark.broadcast.Broadcast[Map[Int, BloomFilter]]) =
    udf { (bucket: Int, url: String) =>
      bank.value.get(bucket).exists(_.mightContainString(url))
    }

  private def loadBloomBank(): Map[Int, Array[Byte]] =
    store.read(spark, "seen_bloom").as[(Int, Array[Byte])].collect().toMap

  private def mergeBloomBank(old: Map[Int, Array[Byte]],
                             fresh: Dataset[(Int, String)]): Map[Int, Array[Byte]] = {
    val cap = bloomCapacityPerBucket
    val fpp = SeenFpp
    val newFilters = fresh.groupByKey(_._1).mapGroups { (bucket, it) =>
      val bf = BloomFilter.create(cap, fpp)
      it.foreach { case (_, u) => bf.putString(u) }
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      (bucket, bos.toByteArray)
    }.collect().toMap
    (old.keySet ++ newFilters.keySet).map { b =>
      (old.get(b), newFilters.get(b)) match {
        case (Some(o), Some(n)) =>
          val bo = BloomFilter.readFrom(new java.io.ByteArrayInputStream(o))
          val bn = BloomFilter.readFrom(new java.io.ByteArrayInputStream(n))
          bo.mergeInPlace(bn)
          val bos = new java.io.ByteArrayOutputStream(); bo.writeTo(bos)
          b -> bos.toByteArray
        case (Some(o), None) => b -> o
        case (None, Some(n)) => b -> n
        case _ => b -> Array.empty[Byte]
      }
    }.toMap
  }

}

object CrawlEngine {
  /** RFC 9309 longest-match allow decision (pure; shared with oracle). */
  def robotsAllows(rules: Map[String, Seq[(String, Boolean)]], host: String, path: String): Boolean =
    rules.get(host) match {
      case None => true
      case Some(rs) => rs.find { case (p, _) => path.startsWith(p) }.map(_._2).getOrElse(true)
    }

  /** Deterministic fetch resolver — the synthetic server. Computes the
    * ground-truth payload, applies the fault schedule, and verifies the
    * decode round-trip (phash + PSNR fidelity invariant). Lives on the
    * companion so the fetch closure ships no engine state. */
  private[crawl] def resolve(c: Synth.Config, norm: String, host: String, bucket: Int,
                             srcId: String, wave: Int, rank: Int): FetchResult = {
    val id = Synth.idOf(norm).getOrElse(-1L)
    val hostIdx = srcId.stripPrefix("src-").toInt
    val f = if (id < 0) Synth.NotFound else Synth.fault(c)(hostIdx, id)
    f match {
      case Synth.Ok =>
        val img = Synth.imageFor(c)(id)
        val decoded = ImageKernels.decode(img.bytes)
        val hash = java.security.MessageDigest.getInstance("SHA-256")
          .digest(img.bytes).map("%02x".format(_)).mkString
        FetchResult(norm, host, bucket, srcId, wave, rank, 200, "extracted",
          img.image_id, img.bytes, decoded.getWidth, decoded.getHeight,
          img.fmt, img.caption, ImageKernels.phash64(decoded), hash)
      case other =>
        val status = other match {
          case Synth.NotFound => "404"
          case Synth.Forbidden => "403"
          case Synth.RateLimited => "429"
          case Synth.Timeout => "timeout"
          case Synth.Captcha => "captcha"
          case Synth.Ok => "extracted"
        }
        FetchResult(norm, host, bucket, srcId, wave, rank, Synth.httpStatus(other),
          status, "", Array.empty, 0, 0, "", "", 0L, "")
    }
  }
}
