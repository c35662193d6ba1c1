package graft.crawl

import java.util.Locale
import java.util.regex.Pattern

/** M4 Strategy-1 navigation-based section discovery — a port of the
  * reference's nav-block parse + fuzzy keyword match
  * (src/crawler/discovery.py:647-801):
  *
  *  - parse `<nav>/<menu>/<header>` blocks (fallback: the first 50 KB
  *    of the page when no nav block exists);
  *  - extract `<a href>` links with their text;
  *  - skip mailto/tel/javascript/fragment links, cross-domain links,
  *    feed/rss/xml/sitemap/search paths, and the homepage root;
  *  - keep only SHALLOW paths (≤ 2 segments — section fronts);
  *  - fuzzy-match path + link text against the section keyword list;
  *  - cap at 20 per nav block / 10 total.
  *
  * The rebuild's section registry stores section NAMES (the last path
  * segment of an accepted section-front URL), which feed the S13
  * supplemental crawl; Strategy 2 (inference from article URL
  * patterns, `_extract_sections_from_article_urls`) is the existing
  * `/sections/<name>` aggregation in the discovery delta. Shared by
  * the engine's cascade facts and the oracle. */
object NavDiscovery {

  /** The reference's section keyword list (discovery.py:690-709);
    * "investigat" is a deliberate stem. */
  val SectionKeywords: Seq[String] = Seq(
    "news", "local", "sports", "weather", "politics", "business",
    "entertainment", "opinion", "lifestyle", "community", "education",
    "crime", "county", "state", "region", "investigat", "city")

  private val navRe = Pattern.compile(
    "(?is)<(?:nav|menu|header)[^>]*>(.*?)</(?:nav|menu|header)>")
  private val linkRe = Pattern.compile(
    "(?i)<a[^>]*href=[\"']([^\"']+)[\"'][^>]*>([^<]*)</a>")
  private val skipPathTokens = Seq("/feed", "/rss", ".xml", "/sitemap", "/search")

  /** Section names discovered from `html`'s navigation for a page on
    * `baseHost` (netloc, e.g. "www.host-0001.example"). */
  def sectionNames(baseHost: String, html: String): Seq[String] = {
    if (html == null || html.isEmpty) return Seq.empty
    val navBlocks = {
      val m = navRe.matcher(html)
      val bs = Seq.newBuilder[String]
      while (m.find()) bs += m.group(1)
      val found = bs.result()
      if (found.nonEmpty) found
      else Seq(html.substring(0, math.min(html.length, 50000)))
    }
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    val base = baseHost.toLowerCase(Locale.ROOT)
    navBlocks.foreach { nav =>
      var perNav = 0
      val lm = linkRe.matcher(nav)
      while (lm.find() && perNav < 20 && seen.size < 10) {
        val href = lm.group(1).trim
        val text = lm.group(2).trim.toLowerCase(Locale.ROOT)
        val skip = href.isEmpty ||
          href.startsWith("mailto:") || href.startsWith("tel:") ||
          href.startsWith("javascript:") || href.startsWith("#")
        if (!skip) {
          // absolutize relative hrefs against the base host
          val (host, rawPath) =
            if (href.startsWith("/")) (base, href)
            else if (href.contains("//")) {
              val p = graft.core.PyUrl.urlsplit(href)
              (p.netloc.toLowerCase(Locale.ROOT), p.path)
            } else (base, "/" + href)
          val path = rawPath.toLowerCase(Locale.ROOT).stripPrefix("/").stripSuffix("/")
          val sameDomain = host == base
          val feedish = skipPathTokens.exists(("/" + path).contains)
          val segments = path.split("/").filter(_.nonEmpty)
          val rootish = path.isEmpty || path == "index.html"
          if (sameDomain && !feedish && !rootish && segments.length <= 2) {
            val combined = s"$path $text"
            if (SectionKeywords.exists(combined.contains)) {
              val name = segments.last
              if (!seen.contains(name)) { seen += name; perNav += 1 }
            }
          }
        }
      }
    }
    seen.toSeq
  }
}
