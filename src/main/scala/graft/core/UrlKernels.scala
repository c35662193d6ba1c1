package graft.core

import java.util.Locale
import java.util.regex.Pattern

/** Pure, null-safe scalar kernels with exact behavioral parity to the
  * reference crawler's hot-path functions. These are the single source of
  * truth: the Catalyst expressions / UDFs in [[graft.core.functions]] and
  * the single-threaded oracle in tests both call these.
  *
  * Parity targets (reference file:line):
  *  - normalizeUrl      ← src/utils/url_utils.py:9-56      (dedup key)
  *  - canonicalHost     ← src/crawler/discovery.py:436-457 (bucket key)
  *  - skip patterns     ← src/crawler/__init__.py:297-345
  *  - non-article regex ← src/utils/url_classifier.py:7-95
  *  - checkIsArticle    ← src/pipeline/url_filters.py:6-80
  *  - parseFrequencyToDays ← src/crawler/scheduling.py:30-62
  *  - rssRetryWindowDays   ← src/crawler/discovery.py:1920-1935
  *  - adaptivePauseThreshold ← src/crawler/source_processing.py:301-335
  *  - backoffSeconds    ← src/crawler/__init__.py:857-902 (seeded jitter)
  */
object UrlKernels {

  /** Dedup key. Strips query + fragment, keeps params, lowercases scheme
    * (urlparse side effect), trims trailing '/' unless path is root.
    * Whitespace-only and unparseable inputs return the original string,
    * as in the reference. */
  def normalizeUrl(url: String): String = {
    if (url == null) return null
    val stripped = url.trim
    if (stripped.isEmpty) return url
    val p = PyUrl.urlsplit(stripped)
    var normalized = PyUrl.unsplitNoQuery(p.scheme, p.netloc, p.path)
    if (normalized.endsWith("/") && normalized.length > 1 &&
      p.path.nonEmpty && p.path != "/") {
      var end = normalized.length
      while (end > 0 && normalized.charAt(end - 1) == '/') end -= 1
      normalized = normalized.substring(0, end)
    }
    normalized
  }

  /** Bucket key. Drops scheme/credentials/port, lowercases, strips
    * leading "www.". Returns null for empty results (reference returns
    * None). */
  def canonicalHost(host: String): String = {
    if (host == null) return null
    var value = host.trim
    if (value.isEmpty) return null
    if (value.contains("//") && !value.startsWith("//")) {
      val netloc = PyUrl.urlsplit(value).netloc
      if (netloc.nonEmpty) value = netloc
    }
    val at = value.lastIndexOf('@')
    if (at >= 0) value = value.substring(at + 1)
    val colon = value.indexOf(':')
    if (colon >= 0) value = value.substring(0, colon)
    value = value.toLowerCase(Locale.ROOT)
    if (value.startsWith("www.")) value = value.substring(4)
    if (value.isEmpty) null else value
  }

  /** URL validity gate (reference: src/crawler/__init__.py:185-194):
    * scheme ∈ {http, https} ∧ netloc nonempty. */
  def isValidUrl(url: String): Boolean = {
    if (url == null) return false
    val p = PyUrl.urlsplit(url.trim)
    (p.scheme == "http" || p.scheme == "https") && p.netloc.nonEmpty
  }

  /** Substring blacklist (reference: src/crawler/__init__.py:300-322).
    * Checked against the lowercased FULL url. */
  val SkipPatterns: Array[String] = Array(
    "/show", "/podcast", "/category", "/tag", "/author", "/page/",
    "/search", "/login", "/register", "/contact", "/about", "/privacy",
    "/terms", "/sitemap", "/posterboard-ads/", "/classifieds/",
    "/marketplace/", "/deals/", "/coupons/", "/promotions/", "/sponsored/")

  def passesSkipPatterns(url: String): Boolean = {
    if (url == null) return false
    val lower = url.toLowerCase(Locale.ROOT)
    !SkipPatterns.exists(lower.contains)
  }

  /** Non-article URL-path regexes (reference: src/utils/url_classifier.py:7-58).
    * Applied to the lowercased path component. */
  val NonArticlePathPatterns: Array[String] = Array(
    "/video-gallery/", "/photo-gallery/", "/photos/", "/videos/",
    "/galleries/", "/gallery/", "/slideshow", "/image[_-][0-9a-f\\-]+",
    "/category/", "/tag/", "/topics?/", "/section/", "/archive",
    "/search", "/about", "/contact", "/staff", "/advertise", "/subscribe",
    "/newsletter", "/privacy", "/terms", "/sitemap", "/rss", "/feed",
    "/posterboard-ads/", "/classifieds/", "/marketplace/", "/deals/",
    "/coupons/", "/promotions/", "/sponsored/", "/shopping",
    "\\.pdf$", "\\.xml$", "\\.json$", "/api/", "/wp-admin", "/wp-content",
    "/wp-includes")

  private val nonArticleCompiled: Array[Pattern] =
    NonArticlePathPatterns.map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))

  /** One alternation regex over the path — usable in `rlike` so the whole
    * classifier stays inside codegen (SURVEY.md F5). */
  val NonArticlePathRegex: String = NonArticlePathPatterns.mkString("(", ")|(", ")")

  def isLikelyArticleUrl(url: String): Boolean = {
    if (url == null) return true // reference: parse failure → allow
    val path = PyUrl.urlsplit(url).path.toLowerCase(Locale.ROOT)
    !nonArticleCompiled.exists(_.matcher(path).find())
  }

  // --- conservative positive article check (src/pipeline/url_filters.py:6-80)

  private val negSubstrings = Array(
    "/search", "/tag", "/category", "/author", "/rss", "/feed", "/sitemap",
    "/page/", "/contact", "/about", "/privacy", "/advertise", "/sections/",
    ".jpg", ".png", ".gif", ".pdf", ".css", ".js", ".xml")
  private val storyRe = Pattern.compile("/stories?/[^/]+")
  private val dateRes = Array(
    Pattern.compile("/\\d{4}/\\d{1,2}/\\d{1,2}/"),
    Pattern.compile("/\\d{4}-\\d{1,2}-\\d{1,2}/"))
  private val sectionRes = Array(
    "/news/[^/]+", "/articles?/[^/]+", "/content/[^/]+", "/posts?/[^/]+",
    "/blog/[^/]+").map(Pattern.compile(_))
  private val numericIdRe = Pattern.compile("/\\d{3,}")

  /** Deterministic subset of check_is_article (the reference's final
    * StorySniffer fallback is replaced by `false`, matching its own
    * exception path — sniffer-free deterministic rebuild). */
  def checkIsArticle(url: String, discoveryMethod: String = "unknown"): Boolean = {
    val lower = if (url == null) "" else url.toLowerCase(Locale.ROOT)
    if (negSubstrings.exists(lower.contains)) return false
    if (lower.contains("/category/") || lower.contains("/tag/") ||
      lower.contains("/topics/")) return false
    if (lower.contains("/video") || lower.contains("/watch/") ||
      lower.contains("/videos/")) return false
    if (storyRe.matcher(lower).find()) return true
    if (dateRes.exists(_.matcher(lower).find())) return true
    if (sectionRes.exists(_.matcher(lower).find())) return true
    if (numericIdRe.matcher(lower).find()) return true
    if (discoveryMethod == "newspaper4k") {
      val path = lower.split("://").last.split("\\?").head
      val segs = ("/" + path.split("/").drop(1).mkString("/"))
        .split("/").filter(_.nonEmpty)
      return segs.length >= 2 || segs.exists(_.contains("-"))
    }
    false
  }

  // --- scheduling / politeness scalar rules

  /** Frequency string → cadence days (src/crawler/scheduling.py:30-62). */
  def parseFrequencyToDays(freq: String): Double = {
    if (freq == null) return 7.0
    val f = freq.toLowerCase(Locale.ROOT)
    if (f.contains("daily") || f == "day") 0.25
    else if (f.contains("broadcast")) 0.25
    else if (f.contains("bi-week") || f.contains("biweekly") || f.contains("every 2")) 14.0
    else if (f.contains("tri-week") || f.contains("triweekly")) 7.0
    else if (f.contains("weekly") || f.contains("week")) 7.0
    else if (f.contains("monthly") || f.contains("month")) 30.0
    else if (f.contains("hour") || f.contains("hourly")) 1.0
    else 7.0
  }

  /** RSS retry window days = clamp(round(cadence*2), 2, 7)
    * (src/crawler/discovery.py:1920-1935). */
  def rssRetryWindowDays(freq: String): Int = {
    val days = parseFrequencyToDays(freq)
    math.max(2, math.min(7, math.round(days * 2).toInt))
  }

  /** Adaptive no-effective-methods pause threshold
    * (src/crawler/source_processing.py:301-335). */
  def adaptivePauseThreshold(freq: String): Int = {
    val cadence = parseFrequencyToDays(freq)
    if (cadence <= 1) 7
    else if (cadence <= 7) 5
    else if (cadence <= 14) 5
    else if (cadence <= 30) 3
    else 3
  }

  /** Exponential backoff with deterministic seeded jitter, replacing the
    * reference's random.uniform(0.8, 1.2) (src/crawler/__init__.py:857-902)
    * so runs reproduce. seed mixes (host, wave). */
  def backoffSeconds(base: Double, failures: Int, cap: Double,
                     host: String, wave: Long): Double = {
    val raw = math.min(base * math.pow(2.0, math.max(0, failures - 1)), cap)
    val h = scala.util.hashing.MurmurHash3.stringHash(
      s"$host|$wave", 0x9747b28c)
    val u = ((h & 0x7fffffffL).toDouble / Int.MaxValue.toDouble) // [0,1)
    raw * (0.8 + 0.4 * u)
  }

  /** 64-bit FNV-1a over the normalized URL — the rebuild's stable URL id
    * (reference uses the raw string with a DB unique index,
    * src/models/__init__.py:125). */
  def urlHash64(normUrl: String): Long = {
    if (normUrl == null) return 0L
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < normUrl.length) {
      h ^= normUrl.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
