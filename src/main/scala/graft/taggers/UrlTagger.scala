package graft.taggers

import graft.core.{CodePoints, Span}

import scala.collection.mutable

/** URL blocklist machinery
  * (/root/reference/python/dolma/taggers/url.py:56-148,
  * /root/reference/python/dolma/core/url_blocker.py): parse hosts-format /
  * URL-list / AdBlock-Plus blocklists into broadcastable immutable
  * structures and match document URLs (metadata `url`) against them.
  *
  * Reference semantics mirrored exactly (vectors in `UrlSpec` transcribed
  * from the reference's tests/python/test_urls.py):
  *  - line grammar (url.py:86-112): comments `#`/`;`/`!`; hosts format
  *    `IP domain` with strict inet_pton-style IP validation and localhost
  *    IPs (`127.0.0.1|0.0.0.0|::1`) suppressed; bare-URL lines; ADP lines
  *    `||domain^`.
  *  - link cleaning (url.py:114-121): `host[:port]path` with query and
  *    fragment dropped, trailing `/` stripped, lowercased.
  *  - domain cleaning (url.py:139-147) INCLUDING the reference's Python
  *    `str.lstrip("www.")` quirk — it strips the leading CHAR SET
  *    {'w','.'}, so `web.com` becomes `eb.com`. Self-consistent because
  *    both blocklist lines and document URLs pass through the same
  *    cleaner; kept for parity.
  */
object UrlRules {

  final case class ParsedUrl(host: String, port: Option[Int], path: String)

  /** Minimal urllib3.util.parse_url equivalent for the fields the
    * reference uses (host, port, path). */
  def parseUrl(url0: String): Option[ParsedUrl] = {
    var s = url0.trim
    if (s.isEmpty) return None
    val schemeIdx = s.indexOf("://")
    if (schemeIdx > 0 && s.substring(0, schemeIdx).forall(c =>
        Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.'))
      s = s.substring(schemeIdx + 3)
    val pathStart = {
      val i = s.indexWhere(c => c == '/' || c == '?' || c == '#')
      if (i < 0) s.length else i
    }
    val authority0 = s.substring(0, pathStart)
    val authority = {
      val at = authority0.lastIndexOf('@')
      if (at >= 0) authority0.substring(at + 1) else authority0
    }
    val colon = authority.indexOf(':')
    val (host, port) =
      if (colon >= 0)
        (authority.substring(0, colon),
          authority.substring(colon + 1).toIntOption)
      else (authority, None)
    val path = {
      if (pathStart >= s.length) ""
      else {
        val rest = s.substring(pathStart)
        if (rest.startsWith("/")) {
          val cut = rest.indexWhere(c => c == '?' || c == '#')
          if (cut < 0) rest else rest.substring(0, cut)
        } else "" // query/fragment with no path
      }
    }
    if (host.isEmpty) None else Some(ParsedUrl(host, port, path))
  }

  /** BaseUrlTagger.clean_url (url.py:114-121):
    * `{host}{:port}{path}`.rstrip("/").lower() */
  def linkCleanUrl(url: String): Option[String] =
    parseUrl(url).map { p =>
      val portPart = p.port.map(n => s":$n").getOrElse("")
      (p.host + portPart + p.path).reverse.dropWhile(_ == '/').reverse.toLowerCase(java.util.Locale.ROOT)
    }.filter(_.nonEmpty)

  /** Python `s.lstrip("www.")`: strips the leading char SET {'w','.'}. */
  def lstripWwwChars(s: String): String = s.dropWhile(c => c == 'w' || c == '.')

  /** BaseDomainTagger.clean_url (url.py:139-147): hostname with the
    * lstrip quirk, plus its `www.`-prefixed twin. */
  def domainCleanUrl(url: String): Seq[String] =
    linkCleanUrl(url).flatMap(parseUrl).map(_.host) match {
      case Some(h) if h.nonEmpty =>
        val stripped = lstripWwwChars(h)
        Seq(stripped, s"www.$stripped")
      case _ => Seq.empty
    }

  /** Strict dotted-quad IPv4 (inet_pton semantics: 4 decimal octets,
    * 0-255, no leading zeros). */
  def isIpv4(s: String): Boolean = {
    val parts = s.split("\\.", -1)
    parts.length == 4 && parts.forall { p =>
      p.nonEmpty && p.length <= 3 && p.forall(_.isDigit) &&
        (p == "0" || !p.startsWith("0")) && p.toInt <= 255
    }
  }

  /** Structural IPv6 check (inet_pton semantics: hex groups, one `::`,
    * optional embedded IPv4 tail). */
  def isIpv6(s: String): Boolean = {
    if (!s.contains(':')) return false
    val dbl = s.indexOf("::")
    if (dbl >= 0 && s.indexOf("::", dbl + 1) >= 0) return false // one :: max
    def groupsOf(part: String): Option[Seq[String]] = {
      if (part.isEmpty) return Some(Seq.empty)
      val gs = part.split(":", -1).toSeq
      if (gs.exists(_.isEmpty)) None else Some(gs)
    }
    val (headPart, tailPart) =
      if (dbl >= 0) (s.substring(0, dbl), s.substring(dbl + 2)) else (s, "")
    (groupsOf(headPart), groupsOf(tailPart)) match {
      case (Some(head), Some(tail)) =>
        val all = head ++ tail
        val (hexGroups, v4Tail) = all.lastOption match {
          case Some(last) if last.contains('.') => (all.dropRight(1), Some(last))
          case _ => (all, None)
        }
        if (v4Tail.exists(!isIpv4(_))) return false
        if (v4Tail.isDefined && dbl < 0 && hexGroups.length != 6) return false
        if (v4Tail.isDefined && dbl >= 0 && hexGroups.length > 5) return false
        if (v4Tail.isEmpty && dbl < 0 && hexGroups.length != 8) return false
        if (v4Tail.isEmpty && dbl >= 0 && hexGroups.length > 7) return false
        hexGroups.forall(g => g.nonEmpty && g.length <= 4 &&
          g.forall(c => Character.digit(c, 16) >= 0))
      case _ => false
    }
  }

  private val MaybeIpAndUrl =
    """([0-9a-f.:]+)\s+(([a-z0-9\-_]+\.?){2,}|localhost|localdomain).*""".r
  private val OnlyUrl = """(([a-z0-9\-_]+\.?){2,}|localhost|localdomain).*""".r
  private val AdpFormat = """\|+(([a-z0-9\-_]+\.?){2,}|localhost|localdomain)\^.*""".r
  private val IgnoredIpStart = """(127\.0\.0\.1|0\.0\.0\.0|::1).*""".r

  /** BaseUrlTagger.parse_line (url.py:86-112). `domainMode` selects which
    * clean_url the yielded URLs pass through. Unparseable lines are
    * dropped (the reference logs and skips them). */
  def parseLine(line: String, domainMode: Boolean): Seq[String] =
    parseLine(line,
      u => if (domainMode) domainCleanUrl(u) else linkCleanUrl(u).toSeq)

  /** parse_line with an explicit clean_url (Python dispatches
    * `self.clean_url` dynamically — the wikidata subclass routes the
    * grammar's matches through its own expanded cleaner). */
  def parseLine(line: String, clean: String => Seq[String]): Seq[String] = {
    val ln = line.trim.toLowerCase(java.util.Locale.ROOT)
    if (ln.isEmpty || ln.startsWith("#") || ln.startsWith(";") || ln.startsWith("!"))
      return Seq.empty
    ln match {
      case MaybeIpAndUrl(ip, url, _) =>
        // an IP+URL-shaped line with an invalid IP raises
        // UrlNotParsedError in the reference (url.py:95-97) — it does NOT
        // fall through to the URL-only branch; the line is dropped
        if (!isIpv6(ip) && !isIpv4(ip)) Seq.empty
        else {
          // reference quirk: the localhost-IP suppression regex is a
          // non-f-string (url.py:62 — the literal "^{IGNORE_IP_REGEX
          // .pattern}" never matches), so at reference RUNTIME the IP is
          // ALWAYS yielded — 127.0.0.1/0.0.0.0 land in the blocklist.
          // Mirror the observable behavior, not the intent.
          val ipPart = Seq(ip)
          val urlPart =
            if (url == "localhost" || url == "localdomain") Seq.empty
            else clean(url)
          ipPart ++ urlPart
        }
      case OnlyUrl(_, _) => clean(ln)
      case AdpFormat(url, _) => Seq(url)
      case _ => Seq.empty
    }
  }

  /** LinkBlocklistPhishingTagger.parse_line (url.py:161-166): raw lines,
    * `#` comments only. */
  def parseRawLine(line: String): Seq[String] = {
    val ln = line.trim.toLowerCase(java.util.Locale.ROOT)
    if (ln.isEmpty || ln.startsWith("#")) Seq.empty else Seq(ln)
  }

  def buildBlocklist(lines: IterableOnce[String], domainMode: Boolean): Set[String] =
    lines.iterator.flatMap(parseLine(_, domainMode)).toSet
}

/** Link-level blocklist tagger (BaseUrlTagger, url.py:56-133): the
  * document's cleaned URL (`host[:port]path`) must appear verbatim in the
  * blocklist. The set is immutable — broadcast once per executor. */
final class LinkBlocklistTagger(name0: String, blocklist: Set[String]) extends Tagger {
  val name: String = name0
  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val url = meta.getOrElse("url", "")
    val hit = url.nonEmpty && UrlRules.linkCleanUrl(url).exists(blocklist.contains)
    if (hit) Vector(Span(0, CodePoints.length(text), "url", 1.0)) else Vector.empty
  }
}

/** Domain-level blocklist tagger (BaseDomainTagger, url.py:136-148): the
  * document hostname (lstrip-www quirk applied) or its `www.` twin must
  * appear in the blocklist. */
final class DomainBlocklistTagger(name0: String, blocklist: Set[String]) extends Tagger {
  val name: String = name0
  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val url = meta.getOrElse("url", "")
    val hit = url.nonEmpty && UrlRules.domainCleanUrl(url).exists(blocklist.contains)
    if (hit) Vector(Span(0, CodePoints.length(text), "url", 1.0)) else Vector.empty
  }
}

/** AdBlock-Plus-lite rule engine (the reference binds the Rust `adblock`
  * crate, core/url_blocker.py:10-92; this is an original re-implementation
  * of the documented filter grammar subset its taggers rely on):
  *
  *  - `!` comments and `[Adblock...]` headers; element-hiding rules
  *    (`##`/`#@#`/`#?#`) skipped (network-request taggers never hit them).
  *  - `@@` exception rules override blocks.
  *  - `||host^` host-anchor, `|` start / trailing `|` end anchors, `*`
  *    wildcard, `^` separator class (any char not alphanumeric `_ - . %`,
  *    or the end of the URL).
  *  - `$type,~type` request-type options; a rule with no type options
  *    applies to every request type EXCEPT `document` (main-frame loads
  *    are exempt unless `$document` is explicit — adblock convention, and
  *    what the reference's own test vectors assert).
  *
  * Scale shape: pure-host rules (`||domain^`, the overwhelming majority of
  * the curated lists the reference ships — oisd, brave) are indexed in a
  * hash map probed along the URL's domain-suffix chain, O(labels) per URL;
  * only pattern rules fall back to a linear scan. The whole engine is an
  * immutable broadcastable value.
  */
final class AbpBlocker(ruleLines: Seq[String]) extends Serializable {
  import AbpBlocker._

  private val (hostIndex, patternRules, hostExceptions, patternExceptions) = {
    val hosts = mutable.HashMap.empty[String, List[Rule]]
    val hostsEx = mutable.HashMap.empty[String, List[Rule]]
    val pats = List.newBuilder[Rule]
    val patsEx = List.newBuilder[Rule]
    ruleLines.foreach { raw =>
      parseRule(raw).foreach { r =>
        val pureHost = r.hostAnchor && isPureHostPattern(r.pattern)
        if (pureHost) {
          val key = r.pattern.stripSuffix("^")
          val m = if (r.exception) hostsEx else hosts
          m.update(key, r :: m.getOrElse(key, Nil))
        } else if (r.exception) patsEx += r
        else pats += r
      }
    }
    (hosts.toMap, pats.result(), hostsEx.toMap, patsEx.result())
  }

  /** check_network_urls (url_blocker.py:60-92): scheme-less URLs are
    * assumed http; `requestType` "" = generic network request. */
  def checkNetworkUrls(url0: String, requestType: String = ""): Boolean = {
    val url = {
      val u = url0.trim.toLowerCase(java.util.Locale.ROOT)
      if (u.contains("://")) u else s"http://$u"
    }
    val host = UrlRules.parseUrl(url).map(_.host).getOrElse("")
    def hostHits(index: Map[String, List[Rule]]): Iterator[Rule] =
      suffixChain(host).flatMap(index.getOrElse(_, Nil))
    val blocked =
      hostHits(hostIndex).exists(r => typeApplies(r, requestType)) ||
        patternRules.exists(r => typeApplies(r, requestType) && matches(r, url))
    if (!blocked) return false
    val excepted =
      hostHits(hostExceptions).exists(r => typeApplies(r, requestType)) ||
        patternExceptions.exists(r => typeApplies(r, requestType) && matches(r, url))
    !excepted
  }
}

object AbpBlocker {

  final case class Rule(
      pattern: String,
      hostAnchor: Boolean,
      startAnchor: Boolean,
      endAnchor: Boolean,
      includeTypes: Set[String],
      excludeTypes: Set[String],
      exception: Boolean)

  private val RequestTypes = Set(
    "script", "image", "stylesheet", "object", "xmlhttprequest", "subdocument",
    "ping", "websocket", "webrtc", "document", "elemhide", "generichide",
    "genericblock", "popup", "font", "media", "other")

  def parseRule(raw: String): Option[Rule] = {
    var ln = raw.trim
    if (ln.isEmpty || ln.startsWith("!") || ln.startsWith("[")) return None
    if (ln.contains("##") || ln.contains("#@#") || ln.contains("#?#")) return None
    val exception = ln.startsWith("@@")
    if (exception) ln = ln.substring(2)
    // options: the last '$' followed by an option-looking tail
    var includeTypes = Set.empty[String]
    var excludeTypes = Set.empty[String]
    val dollar = ln.lastIndexOf('$')
    if (dollar > 0 && dollar < ln.length - 1 &&
        ln.substring(dollar + 1).matches("[a-z0-9~_=,|.*/:-]+")) {
      ln.substring(dollar + 1).split(',').foreach { opt =>
        val neg = opt.startsWith("~")
        val o = if (neg) opt.substring(1) else opt
        if (RequestTypes.contains(o)) {
          if (neg) excludeTypes += o else includeTypes += o
        }
        // other options (domain=, third-party, ...) ignored in the lite
        // engine — may overblock relative to a full engine, never a parse
        // failure
      }
      ln = ln.substring(0, dollar)
    }
    var hostAnchor = false
    var startAnchor = false
    var endAnchor = false
    if (ln.startsWith("||")) { hostAnchor = true; ln = ln.substring(2) }
    else if (ln.startsWith("|")) { startAnchor = true; ln = ln.substring(1) }
    if (ln.endsWith("|")) { endAnchor = true; ln = ln.substring(0, ln.length - 1) }
    if (ln.isEmpty) None
    else Some(Rule(ln.toLowerCase(java.util.Locale.ROOT), hostAnchor, startAnchor, endAnchor,
      includeTypes, excludeTypes, exception))
  }

  /** `domain` or `domain^` with no other metacharacters — the map-indexable
    * shape. */
  def isPureHostPattern(p: String): Boolean = {
    val core = p.stripSuffix("^")
    core.nonEmpty && !core.exists(c => c == '*' || c == '^' || c == '/' || c == '|')
  }

  def suffixChain(host: String): Iterator[String] =
    Iterator.iterate(host) { h =>
      val dot = h.indexOf('.')
      if (dot < 0) "" else h.substring(dot + 1)
    }.takeWhile(_.nonEmpty)

  def typeApplies(r: Rule, requestType: String): Boolean = {
    if (requestType == "document")
      r.includeTypes.contains("document")
    else if (r.includeTypes.nonEmpty)
      requestType.nonEmpty && r.includeTypes.contains(requestType)
    else
      !(requestType.nonEmpty && r.excludeTypes.contains(requestType))
  }

  @inline private def isSeparator(c: Char): Boolean =
    !(Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.' || c == '%')

  /** Match one wildcard-free segment at url[pos]; returns the position
    * after the segment, or -1. `^` consumes one separator char, or zero
    * chars at end-of-url. */
  private def matchSegment(url: String, pos0: Int, seg: String): Int = {
    var pos = pos0
    var i = 0
    while (i < seg.length) {
      val pc = seg.charAt(i)
      if (pc == '^') {
        if (pos == url.length) { i += 1 } // end-of-url counts as separator
        else if (isSeparator(url.charAt(pos))) { pos += 1; i += 1 }
        else return -1
      } else {
        if (pos < url.length && url.charAt(pos) == pc) { pos += 1; i += 1 }
        else return -1
      }
    }
    pos
  }

  /** Full pattern match with `*` wildcards starting at url[pos]. */
  private def matchFrom(url: String, pos: Int, segs: Array[String],
      endAnchor: Boolean): Boolean = {
    var p = matchSegment(url, pos, segs(0))
    if (p < 0) return false
    var i = 1
    while (i < segs.length) {
      val seg = segs(i)
      var found = -1
      var j = p
      while (found < 0 && j <= url.length) {
        found = matchSegment(url, j, seg)
        j += 1
      }
      if (found < 0) return false
      p = found
      i += 1
    }
    !endAnchor || p == url.length
  }

  def matches(r: Rule, url: String): Boolean = {
    val segs = r.pattern.split("\\*", -1).filter(_ != null)
    if (segs.isEmpty) return false
    if (r.startAnchor) matchFrom(url, 0, segs, r.endAnchor)
    else if (r.hostAnchor) {
      // positions where a host label starts: after "://" and after each
      // '.' inside the authority
      val schemeEnd = {
        val i = url.indexOf("://")
        if (i < 0) 0 else i + 3
      }
      val authEnd = {
        val i = url.indexWhere(c => c == '/' || c == '?' || c == '#', schemeEnd)
        if (i < 0) url.length else i
      }
      var pos = schemeEnd
      while (pos < authEnd) {
        if (pos == schemeEnd || url.charAt(pos - 1) == '.') {
          if (matchFrom(url, pos, segs, r.endAnchor)) return true
        }
        pos += 1
      }
      false
    } else {
      var pos = 0
      while (pos <= url.length) {
        if (matchFrom(url, pos, segs, r.endAnchor)) return true
        pos += 1
      }
      false
    }
  }
}

/** ABP-backed URL tagger (AdbUrlTagger, url.py:174-181). The engine sees
  * the CLEANED url — AdbUrlTagger inherits BaseUrlTagger.predict, which
  * routes metadata urls through clean_url (host[:port]path, scheme and
  * query stripped, url.py:113-133) before check_url; feeding the raw url
  * would let query-string pattern rules fire that the reference never
  * evaluates. */
final class AbpUrlTagger(name0: String, blocker: AbpBlocker) extends Tagger {
  val name: String = name0
  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val url = meta.getOrElse("url", "")
    val hit = url.nonEmpty &&
      UrlRules.linkCleanUrl(url).exists(c => blocker.checkNetworkUrls(c))
    if (hit) Vector(Span(0, CodePoints.length(text), "url", 1.0))
    else Vector.empty
  }
}

/** AllowlistWikidataTagger (url.py:381-489): the list is JSON lines —
  * each line an array of `{url, description}` rows. clean_url extends the
  * domain cleaner with the BASE DOMAIN (last two labels when the host has
  * more than two dots, url.py:392-397), and check_url re-cleans the
  * already-cleaned probe (predict hands it clean_url output,
  * url.py:125-133 + 420-423), so the probe set is clean(clean(url)).
  *
  * Quirk mirrored: the "cleaned" variant (url.py:424-489) defines
  * is_valid_row NSFW/incomplete-description filters that the reference
  * NEVER CALLS — both registry names are observably identical, so both
  * bind to this class. */
final class WikidataAllowlistTagger(name0: String, jsonLines: Seq[String]) extends Tagger {
  val name: String = name0

  private def baseDomain(url: String): String =
    if (url.count(_ == '.') > 2) url.split('.').takeRight(2).mkString(".")
    else url

  private def cleanUrl(url: String): Seq[String] =
    UrlRules.domainCleanUrl(url).flatMap(c => Seq(c, baseDomain(c)))

  private val allowSet: Set[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val b = Set.newBuilder[String]
    jsonLines.iterator.map(_.trim).filter(_.nonEmpty).foreach { ln =>
      val arr = mapper.readTree(ln)
      arr.forEach { row =>
        Option(row.get("url")).map(_.asText()).filter(_.nonEmpty).foreach { u =>
          // parse_line(url.py:407-414): each cleaned url re-enters the
          // base grammar, whose matches clean through THIS cleaner again
          cleanUrl(u).foreach(c => b ++= UrlRules.parseLine(c, cleanUrl _))
        }
      }
    }
    b.result()
  }

  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val url = meta.getOrElse("url", "")
    val hit = url.nonEmpty &&
      cleanUrl(url).exists(c1 => cleanUrl(c1).exists(allowSet.contains))
    if (hit) Vector(Span(0, CodePoints.length(text), "url", 1.0)) else Vector.empty
  }
}

object UrlTaggers {

  /** Build the named tagger families from local blocklist files (the
    * reference fetches its curated lists from its artifact host at tagger
    * init, url.py:74-84; in this engine list data is caller-provided —
    * point `dir` at a directory of `<name>.txt` files). */
  def domainTaggerFromLines(name: String, lines: IterableOnce[String]): DomainBlocklistTagger =
    new DomainBlocklistTagger(name, UrlRules.buildBlocklist(lines, domainMode = true))

  def linkTaggerFromLines(name: String, lines: IterableOnce[String]): LinkBlocklistTagger =
    new LinkBlocklistTagger(name, UrlRules.buildBlocklist(lines, domainMode = false))

  def abpTaggerFromLines(name: String, lines: Seq[String]): AbpUrlTagger =
    new AbpUrlTagger(name, new AbpBlocker(lines))

  /** List-data convention: each registry name resolves its list from
    * `$GRAFT_URL_LIST_DIR/<name>.txt` when that file exists (production
    * data — the reference's curated multi-GB downloads, pre-concatenated
    * per name), else from the bundled excerpt fixture
    * `resources/graft/data/url/<name>.txt` (real list FORMATS with a few
    * representative entries, so every name resolves and matches out of
    * the box). */
  def listLines(name: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    sys.env.get("GRAFT_URL_LIST_DIR")
      .map(d => java.nio.file.Paths.get(d, s"$name.txt"))
      .filter(p => java.nio.file.Files.isReadable(p)) match {
      case Some(p) => java.nio.file.Files.readAllLines(p).asScala.toVector
      case None => RefData.lines(s"url/$name.txt")
    }
  }

  /** Registry-name parity with the reference (url.py:150-489): all 27
    * names. List CONTENT is caller-provided data (see [[listLines]]); the
    * parsing/matching machinery is the deliverable. */
  val DomainNames: Seq[String] = Seq(
    "domain_blocklist_utp_v1",
    "domain_blocklist_phishing_v1",
    "blocklist_project_nsfw_v1",
    "blocklist_project_social_v1",
    "blocklist_project_crime_v1",
    "blocklist_project_vice_v1",
    "blocklist_project_ads_v1",
    "blocklist_firebog_ads_v1",
    "blocklist_firebog_crypto_v1",
    "blocklist_firebog_malicious_v1",
    "blocklist_firebog_nsfw_v1",
    "blocklist_firebog_social_v1",
    "blocklist_firebog_suspicious_v1",
    "blocklist_firebog_trackers_v1",
    "blocklist_hosts_adware_malware_v1",
    "blocklist_hosts_fakenews_v1",
    "blocklist_hosts_gambling_v1",
    "blocklist_hosts_porn_v1",
    "blocklist_hosts_social_v1")
  val AbpNames: Seq[String] = Seq(
    "oisd_small_abp_v1", "oisd_big_abp_v1", "oisd_nsfw_abp_v1",
    "brave_core_abp_v1", "brave_nsfw_abp_v1")
  val LinkNames: Seq[String] = Seq("link_blocklist_phishing_v1")
  val AllowlistNames: Seq[String] =
    Seq("allowlist_wikidata_v1", "allowlist_wikidata_cleaned_v1")
  val AllNames: Seq[String] =
    DomainNames ++ AbpNames ++ LinkNames ++ AllowlistNames

  def registerAll(): Unit = {
    // memoize each built tagger per JVM: the registry stores by-name
    // thunks and TagRunner resolves inside every task, so an unmemoized
    // factory would re-read and re-parse the (production: multi-GB) list
    // file once per task — N concurrent in-heap copies per wave instead
    // of one shared instance per executor
    def memo(n: String)(build: => Tagger): Unit = {
      lazy val built = build
      TaggerRegistry.register(n)(built)
    }
    DomainNames.foreach(n => memo(n)(domainTaggerFromLines(n, listLines(n))))
    AbpNames.foreach(n => memo(n)(abpTaggerFromLines(n, listLines(n))))
    LinkNames.foreach(n => memo(n)(new LinkBlocklistTagger(n,
      listLines(n).flatMap(UrlRules.parseRawLine).toSet)))
    AllowlistNames.foreach(n => memo(n)(new WikidataAllowlistTagger(n, listLines(n))))
  }
}
