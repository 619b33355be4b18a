package graft.taggers

import graft.core.{CodePoints, Span}

/** URL blocklist tagger family
  * (/root/reference/python/dolma/taggers/url.py:69-148): match a
  * document's URL (metadata) against a blocklist of hosts, with optional
  * subdomain matching (url.py:101-116 walks the domain suffix chain).
  * The blocklist set is broadcast by the caller — one shared immutable
  * Set per executor, the broadcast-hash-semi-join shape.
  * ABP/adblock rule syntax is out of scope for the code payload
  * (SURVEY §2.3).
  */
final class UrlBlocklistTagger(name0: String, blocklist: Set[String],
    matchSubdomains: Boolean = true) extends Tagger {
  val name: String = name0

  /** Normalize like the reference: strip scheme, creds, port, path;
    * lowercase (url.py:84-120). */
  def hostOf(url: String): String = {
    var s = url.trim.toLowerCase
    val scheme = s.indexOf("://")
    if (scheme >= 0) s = s.substring(scheme + 3)
    val at = s.indexOf('@')
    if (at >= 0 && at < math.max(s.indexOf('/'), s.length)) s = s.substring(at + 1)
    val slash = s.indexOf('/')
    if (slash >= 0) s = s.substring(0, slash)
    val colon = s.indexOf(':')
    if (colon >= 0) s = s.substring(0, colon)
    s
  }

  def isBlocked(url: String): Boolean = {
    val host = hostOf(url)
    if (host.isEmpty) return false
    if (blocklist.contains(host)) return true
    if (!matchSubdomains) return false
    // suffix chain: a.b.example.com → b.example.com → example.com
    var h = host
    var dot = h.indexOf('.')
    while (dot >= 0) {
      h = h.substring(dot + 1)
      if (blocklist.contains(h)) return true
      dot = h.indexOf('.')
    }
    false
  }

  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val url = meta.getOrElse("url", "")
    val n = CodePoints.length(text)
    if (url.nonEmpty && isBlocked(url)) Vector(Span(0, n, "blocked", 1.0))
    else Vector.empty
  }
}

object UrlBlocklistTagger {
  def registerAll(): Unit = {
    // a tiny built-in demo list; production lists are caller-provided
    TaggerRegistry.register("url_blocklist_demo_v1")(
      new UrlBlocklistTagger("url_blocklist_demo_v1",
        Set("blocked.example.com", "ads.example.net")))
  }
}
