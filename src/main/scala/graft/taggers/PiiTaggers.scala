package graft.taggers

import graft.core.{CodePoints, Span, TextSplit}

import java.util.regex.Pattern

/** PII taggers (/root/reference/python/dolma/taggers/pii.py).
  *
  * `pii_regex_with_counts_fast_v2` (pii.py:184-280) is the canonical fast
  * variant: paragraph-sliced matching with cheap pre-guards (`"@" in text`,
  * digit search, `\.\S` search), email addressee/domain rules, IP-not-URL
  * check, and doc_count / doc_frac rollups. Regex patterns are the
  * reference's own (pii.py:55-66), compiled once per tagger instance.
  */
object PiiTaggers {

  val EmailRegex = "[.\\s@,?!;:)(]*([^\\s@]+@[^\\s@,?!;:)(]+?)[.\\s@,?!;:)(]?[\\s\\n\\r]"
  val PhoneRegex = "\\s+\\(?(\\d{3})\\)?[-\\. ]*(\\d{3})[-. ]?(\\d{4})"
  val IpRegex =
    "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
  // The reference's URL_REGEX has a literal \b[backspace] typo from Python
  // "\b" in a non-raw string (pii.py:60); we keep the working part.
  val UrlRegex =
    "(?i)((?:https?://|www\\d{0,3}[.]|[a-z0-9.\\-]+[.][a-z]{2,4}/)(?:[^\\s()<>]+|\\(([^\\s()<>]+|(\\([^\\s()<>]+\\)))*\\))+(?:\\(([^\\s()<>]+|(\\([^\\s()<>]+\\)))*\\)|[^\\s`!()\\[\\]{};:'\".,<>?«»“”‘’]))"

  // Python `re` on str is Unicode-aware: \s matches NBSP, \d matches
  // Unicode digits. Java defaults to ASCII classes, silently missing PII
  // adjacent to Unicode whitespace ("foo@bar.com\u00a0next").
  private val U = Pattern.UNICODE_CHARACTER_CLASS

  final class FastPiiRegex extends Tagger {
    val name = "pii_regex_with_counts_fast_v2"
    private val email = Pattern.compile(EmailRegex, U)
    private val phone = Pattern.compile(PhoneRegex, U)
    private val ip = Pattern.compile(IpRegex, U)
    private val url = Pattern.compile(UrlRegex, U)
    private val preIp = Pattern.compile("\\.[^\\s]", U)
    private val prePhone = Pattern.compile("\\d", U)

    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val docLen = CodePoints.length(text)
      val spans = Vector.newBuilder[Span]

      // >10k question marks bail-out (pii.py:259-261)
      val tooManyQs = text.count(_ == '?') > 10000
      val paragraphs =
        if (tooManyQs) Vector.empty else TextSplit.splitParagraphs(text)

      var count = 0
      var spanCpLen = 0L
      paragraphs.foreach { p =>
        val ptext = p.text
        val bmp = CodePoints.isBmpOnly(ptext)
        def cpIdx(i: Int): Long =
          (if (bmp) i else CodePoints.charToCodePointIndex(ptext, i)) + p.start.toLong

        if (ptext.contains("@")) {
          val m = email.matcher(ptext)
          while (m.find()) {
            val captured = m.group(1)
            val at = captured.indexOf('@')
            val addressee = captured.substring(0, at)
            val domain = captured.substring(at + 1)
            if (!(addressee.trim == "(") && domain.contains(".")) {
              spans += Span(cpIdx(m.start), cpIdx(m.end), "EMAIL_ADDRESS", 1.0)
              count += 1; spanCpLen += cpIdx(m.end) - cpIdx(m.start)
            }
          }
        }
        if (prePhone.matcher(ptext).find()) {
          val m = phone.matcher(ptext)
          while (m.find()) {
            spans += Span(cpIdx(m.start), cpIdx(m.end), "PHONE_NUMBER", 1.0)
            count += 1; spanCpLen += cpIdx(m.end) - cpIdx(m.start)
          }
        }
        if (preIp.matcher(ptext).find()) {
          val m = ip.matcher(ptext)
          while (m.find()) {
            if (!url.matcher(m.group(0)).find()) {
              spans += Span(cpIdx(m.start), cpIdx(m.end), "IP_ADDRESS", 1.0)
              count += 1; spanCpLen += cpIdx(m.end) - cpIdx(m.start)
            }
          }
        }
      }

      spans += Span(0, docLen, "doc_count", count.toDouble)
      // doc_frac = sum of span lengths (incl. the doc_count span, whose
      // length is the whole doc — reference quirk pii.py:271-274: `spans`
      // already contains doc_count when doc_frac is computed)
      val frac =
        if (docLen == 0) -1.0
        else (spanCpLen + docLen).toDouble / docLen
      spans += Span(0, docLen, "doc_frac", frac)
      spans.result()
    }
  }

  /** Postprocessed regex variant `pii_regex_v2` (pii.py:78-159,177-182):
    * whole-doc regexes, context-window suppression near isbn/doi/#, phone
    * suppressed when the doc contains a URL. */
  class PiiRegexV2 extends Tagger {
    val name = "pii_regex_v2"
    private val email = Pattern.compile(EmailRegex, U)
    private val phone = Pattern.compile(PhoneRegex, U)
    private val ip = Pattern.compile(IpRegex, U)
    private val url = Pattern.compile(UrlRegex, U)
    private val Window = 100

    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val docLen = CodePoints.length(text)
      val bmp = CodePoints.isBmpOnly(text)
      def cpIdx(i: Int): Long =
        if (bmp) i.toLong else CodePoints.charToCodePointIndex(text, i).toLong

      val raw = Vector.newBuilder[Span]
      for ((pat, typ) <- Seq((email, "EMAIL_ADDRESS"), (phone, "PHONE_NUMBER"), (ip, "IP_ADDRESS"))) {
        val m = pat.matcher(text)
        while (m.find()) raw += Span(cpIdx(m.start), cpIdx(m.end), typ, 1.0)
      }
      val containsUrl = url.matcher(text).find()
      val kept = raw.result().filter { s =>
        s.typ match {
          case "EMAIL_ADDRESS" =>
            val mention = CodePoints.slice(text, s.start.toInt, s.end.toInt)
            // reference quirk (pii.py:155-156): mention.split("@")[1] is
            // the segment between the FIRST and SECOND '@' — the match's
            // junk prefix class includes '@', so "@user@mail.com" must
            // test "user" (no dot -> dropped), not "mail.com"
            val parts = mention.split("@", -1)
            parts.length >= 2 && parts(0).trim != "(" && parts(1).contains(".")
          case _ =>
            val ctx = CodePoints.slice(text,
              math.max(0, s.start.toInt - Window), math.min(docLen, s.end.toInt + Window))
            if (ctx.contains("isbn") || ctx.contains("doi") || ctx.contains("#")) false
            else if (s.typ == "IP_ADDRESS") true
            else !containsUrl
        }
      }
      val words = TextSplit.pythonSplit(text).length
      val score = if (words == 0) -1.0 else kept.length.toDouble / words
      // pii_regex_v2 emits ONLY the PII spans + "doc" (pii.py:74-92);
      // doc_count belongs to the separate pii_regex_with_counts_v2
      kept :+ Span(0, docLen, "doc", score)
    }
  }

  /** pii_regex_with_counts_v2 (pii.py:283-291): the V2 surface plus a
    * doc_count span counting the non-"doc" spans. */
  final class PiiRegexWithCountsV2 extends PiiRegexV2 {
    override val name = "pii_regex_with_counts_v2"
    override def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val base = super.predict(text, meta)
      val count = base.count(_.typ != "doc")
      base :+ Span(0, CodePoints.length(text), "doc_count", count.toDouble)
    }
  }

  def registerAll(): Unit = {
    TaggerRegistry.register("pii_regex_with_counts_fast_v2")(new FastPiiRegex)
    TaggerRegistry.register("pii_regex_v2")(new PiiRegexV2)
    TaggerRegistry.register("pii_regex_with_counts_v2")(new PiiRegexWithCountsV2)
  }
}
