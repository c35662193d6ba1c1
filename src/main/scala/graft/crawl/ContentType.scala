package graft.crawl

/** X4 content-based type detection, shared by the Spark engine's fetch
  * resolver and the single-threaded oracle. The reference classifies
  * every successful fetch from the article CONTENT via DB-driven
  * pattern tables (src/utils/content_type_detector.py:25-1134 —
  * wire tier checked first at :948, then obituary :1071, then opinion
  * :1134; statuses applied in src/cli/commands/extraction.py:1085-1105;
  * patterns loaded from the wire_services / keyword tables at
  * :237-260). The rebuild mirrors that shape: patterns are rows in the
  * `content_patterns` table, broadcast into the fetch stage, and the
  * classification is a tiered any-match over the caption payload. */
object ContentType {

  /** Classify a caption. `patterns` rows are (ptype, kind, pattern)
    * with kind ∈ {contains, prefix}; tier order wire → obituary →
    * opinion, anything unmatched is plain `extracted`. */
  def detect(caption: String, patterns: Seq[(String, String, String)]): String = {
    val lower = if (caption == null) "" else caption.toLowerCase(java.util.Locale.ROOT)
    def hit(ptype: String): Boolean = patterns.exists { case (t, kind, p) =>
      t == ptype &&
        (if (kind == "prefix") lower.startsWith(p) else lower.contains(p))
    }
    if (hit("wire")) "wire"
    else if (hit("obituary")) "obituary"
    else if (hit("opinion")) "opinion"
    else "extracted"
  }
}
