package graft.core

/** Minimal RFC-1808-style URL split/unsplit with the exact semantics of
  * CPython's `urllib.parse.urlsplit`/`urlunsplit` (the subset the
  * reference relies on). The reference's dedup key is
  * `normalize_url` (reference: src/utils/url_utils.py:9-56), which is
  * urlparse → urlunparse(query="", fragment="") → trailing-slash trim;
  * byte-for-byte parity here is what makes the rebuilt URL-seen set
  * equal to the reference's.
  */
object PyUrl {

  /** Schemes that imply a `//netloc` on reassembly (CPython uses_netloc). */
  private val UsesNetloc: Set[String] = Set(
    "", "ftp", "http", "gopher", "nntp", "telnet", "imap", "wais",
    "file", "mms", "https", "shttp", "snews", "prospero", "rtsp",
    "rtspu", "rsync", "svn", "svn+ssh", "sftp", "nfs", "git", "git+ssh",
    "ws", "wss")

  final case class Split(scheme: String, netloc: String, path: String,
                         query: String, fragment: String)

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  /** CPython urlsplit (params left inside path, as urlunparse rejoins them).
    * Tab/CR/LF are removed anywhere in the input first
    * (CPython's _UNSAFE_URL_BYTES_TO_REMOVE, bpo-43882). */
  def urlsplit(url: String): Split = {
    var rest =
      if (url.indexOf('\t') < 0 && url.indexOf('\r') < 0 && url.indexOf('\n') < 0) url
      else url.filterNot(c => c == '\t' || c == '\r' || c == '\n')
    var scheme = ""
    val colon = rest.indexOf(':')
    if (colon > 0) {
      val head = rest.substring(0, colon)
      if ((head.charAt(0).isLetter) && head.forall(isSchemeChar)) {
        scheme = head.toLowerCase(java.util.Locale.ROOT)
        rest = rest.substring(colon + 1)
      }
    }
    var netloc = ""
    if (rest.startsWith("//")) {
      var i = 2
      while (i < rest.length && rest.charAt(i) != '/' &&
        rest.charAt(i) != '?' && rest.charAt(i) != '#') i += 1
      netloc = rest.substring(2, i)
      rest = rest.substring(i)
    }
    var fragment = ""
    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = rest.substring(hash + 1); rest = rest.substring(0, hash) }
    var query = ""
    val qm = rest.indexOf('?')
    if (qm >= 0) { query = rest.substring(qm + 1); rest = rest.substring(0, qm) }
    Split(scheme, netloc, rest, query, fragment)
  }

  /** CPython urlunsplit for (scheme, netloc, path, "", ""). */
  def unsplitNoQuery(scheme: String, netloc: String, path: String): String = {
    var url = path
    if (netloc.nonEmpty ||
      (scheme.nonEmpty && UsesNetloc.contains(scheme) && !url.startsWith("//"))) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + netloc + url
    }
    if (scheme.nonEmpty) url = scheme + ":" + url
    url
  }
}
