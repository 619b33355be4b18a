package graft.taggers

import graft.core.{CodePoints, Span}

import java.util.regex.Pattern

/** Creative-Commons license extraction from page HTML
  * (/root/reference/python/dolma/taggers/licenses.py:18-88, itself adapted
  * from dkpro-c4corpus' LicenseDetectorBasic): scan `metadata["html"]` for
  * creativecommons.org license/publicdomain link attributes, emit one span
  * per match typed `cc_<type>[_<version>][_<lang>]` with confidence
  * 0.5 + 0.5/(i+1) decaying over successive matches.
  *
  * Java regex forbids the reference's duplicate `(?P<type>)` group name, so
  * the alternation uses `type1`/`type2` coalesced — same captures.
  *
  * Class-semantics parity: the Python `regex` module's `\p{Punct}` is the
  * Unicode P* categories ONLY — ASCII `<` `>` `=` `+` are Sm SYMBOLS and do
  * NOT match (that's why the reference's class lists `=` explicitly). So
  * the attribute-soup class `[\w\p{Punct}\s=]*` can never cross a tag
  * boundary. Java's default `\p{Punct}` is POSIX punct (all ASCII
  * punctuation INCLUDING `<>`), which lets one match gobble across tags
  * and swallow later license links (observed on the reference's
  * sample-0001 fixture: the `by/3.0/deed.en` match vanished). Translate as
  * `\p{P}` + UNICODE_CHARACTER_CLASS (Unicode `\w`/`\s`, like Python). */
abstract class CcLicenseTagger extends Tagger {
  protected def pattern: Pattern
  protected def typeGroups: Seq[String]
  protected def versionGroup: Option[String]
  protected def langGroup: Option[String]

  /** Cheap substring gate before the expensive regex (licenses.py:23,50). */
  private val preSearch = Seq(
    "creativecommons.org/licenses", "creativecommons.org/publicdomain")

  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val html = meta.getOrElse("html", "")
    if (html.isEmpty || !preSearch.exists(html.contains)) return Vector.empty
    val docLen = CodePoints.length(text)
    val out = Vector.newBuilder[Span]
    val m = pattern.matcher(html)
    var i = 0
    while (m.find()) {
      val licenseType = typeGroups.iterator
        .map(g => Option(m.group(g))).collectFirst { case Some(t) => t }
        .getOrElse("")
      val withVersion = versionGroup.flatMap(g => Option(m.group(g))) match {
        case Some(v) => s"${licenseType}_${v.replaceAll("^/+|/+$", "")}"
        case None => licenseType
      }
      val full = langGroup.flatMap(g => Option(m.group(g))) match {
        case Some(l) => s"${withVersion}_$l"
        case None => withVersion
      }
      val score = 0.5 + 0.5 / (i + 1.0)
      out += Span(0, docLen, s"cc_$full", score)
      i += 1
    }
    out.result()
  }
}

object LicenseTaggers {

  private val LicenseType = "by(-nc)?(-nd)?(-sa)?"
  private val Version = "\\d+\\.\\d+"
  private val LangPrefix = "\\w{2}"

  /** cc_re (licenses.py:26-33). */
  final class CcRe extends CcLicenseTagger {
    val name = "cc_re"
    protected val pattern: Pattern = Pattern.compile(
      "<(a|A|meta)\\s[\\w\\p{P}\\s=]*\n*(href|HREF|content)" +
        "=('|\"|&quot;)?http(s*)://creativecommons\\.org/" +
        s"((licenses/(?<type1>$LicenseType))|(?<type2>publicdomain/(zero|certification|mark)))" +
        s"(?<version>/$Version)?" +
        s"((/$LangPrefix)?/((deed|legalcode)\\.)?(?<lang>$LangPrefix))?.*?('|\"|&quot;).*?>",
      Pattern.UNICODE_CHARACTER_CLASS)
    protected val typeGroups = Seq("type1", "type2")
    protected val versionGroup = Some("version")
    protected val langGroup = Some("lang")
  }

  /** cc_re_fast (licenses.py:71-88). */
  final class CcReFast extends CcLicenseTagger {
    val name = "cc_re_fast"
    protected val pattern: Pattern = Pattern.compile(
      "http[s]?://creativecommons\\.org/licenses/" +
        "(?<type1>by|by-sa|by-nd|by-nc|by-nc-sa|by-nc-nd|publicdomain)[\"/ >]")
    protected val typeGroups = Seq("type1")
    protected val versionGroup = None
    protected val langGroup = None
  }

  def registerAll(): Unit = {
    TaggerRegistry.register("cc_re")(new CcRe)
    TaggerRegistry.register("cc_re_fast")(new CcReFast)
  }
}
