package graft.taggers

import graft.core.{CodePoints, Span, TextSplit}

import java.util.regex.Pattern

/** Code-payload taggers
  * (/root/reference/python/dolma/taggers/code/code_taggers.py).
  */
object CodeTaggers {

  /** Python str.isalnum per code point: letters plus Nd/Nl/No — Java's
    * isLetterOrDigit excludes Nl/No, so superscripts and fractions would
    * depress alnum_prop vs the reference. */
  @inline def pyIsAlnum(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  /** RedPajama line stats (code_taggers.py:147-186): max/avg line length,
    * alnum char proportion, alpha chars per word-token. */
  final class RedPajamaTagger extends Tagger {
    val name = "code_redpajama_taggers_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val docLength = CodePoints.length(text)
      val lines = TextSplit.splitLines(text)
      val lineLengths = lines.map(CodePoints.length)
      val maxLineLength = if (lineLengths.isEmpty) 0.0 else lineLengths.max.toDouble
      val avgLineLength =
        if (lineLengths.isEmpty) 0.0 else lineLengths.map(_.toDouble).sum / lineLengths.length

      var alnum = 0; var alpha = 0
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        if (pyIsAlnum(cp)) alnum += 1
        if (Character.isLetter(cp)) alpha += 1
        i += Character.charCount(cp)
      }
      val alnumProp = if (docLength > 0) alnum.toDouble / docLength else 0.0
      // num_tokens = len(regex.split(text)) — segment count incl. empties
      val numTokens = TextSplit.regexSplitCount(text)
      val alphaTokenProp = if (numTokens > 0) alpha.toDouble / numTokens else 0.0

      Vector(
        Span(0, docLength, "max_line_length_doc", maxLineLength),
        Span(0, docLength, "avg_line_length_doc", avgLineLength),
        Span(0, docLength, "alnum_prop_doc", alnumProp),
        Span(0, docLength, "alpha_token_prop_doc", alphaTokenProp))
    }
  }

  /** Copyright / leading-comment-block detector (code_taggers.py:82-144):
    * first C-style block comment containing "copyright", else the greedy
    * leading `//` / `#` / `--` / empty-line header run. */
  final class CopyrightTagger extends Tagger {
    val name = "code_copyright_comments_v1"
    private val blockComment = Pattern.compile("/\\*[^*]*\\*+(?:[^/*][^*]*\\*+)*/")
    private val copyright = Pattern.compile("copyright", Pattern.CASE_INSENSITIVE)

    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val docLen = CodePoints.length(text)
      val spans = Vector.newBuilder[Span]
      val m = blockComment.matcher(text)
      if (m.find()) {
        val sub = text.substring(m.start(), m.end())
        if (copyright.matcher(sub).find()) {
          val s = CodePoints.charToCodePointIndex(text, m.start())
          val e = CodePoints.charToCodePointIndex(text, m.end())
          spans += Span(s, e, "copyright_notice", 1.0)
        }
      } else {
        // greedy leading comment-block scan (code_taggers.py:106-123);
        // note the reference's `end` counts chars of comment lines plus one
        // per empty line (a quirk we mirror exactly).
        val lines = TextSplit.splitNewline(text)
        var skip = 0
        var end = 0L
        var i = 0
        var stop = false
        while (i < lines.length && !stop) {
          val line = lines(i)
          if (line.startsWith("//") || line.startsWith("#") || line.startsWith("--") || line.isEmpty) {
            skip += 1
            if (line.isEmpty) end += 1 else end += CodePoints.length(line)
            i += 1
          } else stop = true
        }
        if (skip > 0) spans += Span(0, end, "comment_block", 1.0)
      }
      val found = spans.result()
      val score =
        if (found.isEmpty) 0.0
        else if (docLen == 0) -1.0
        else (found.head.end - found.head.start + 1).toDouble / docLen
      found :+ Span(0, docLen, "doc", score)
    }
  }

  /** Secrets scanner re-scoped to compiled regex patterns (the reference
    * wraps Yelp detect-secrets, code_taggers.py:40-79; plugin parity is not
    * required — these regexes cover the common key shapes). */
  final class SecretsTagger extends Tagger {
    val name = "code_secrets_v1"
    private val patterns: Seq[(String, Pattern)] = Seq(
      "SECRET_AWS_Access_Key" -> Pattern.compile("\\b(?:AKIA|ABIA|ACCA|ASIA)[0-9A-Z]{16}\\b"),
      "SECRET_Private_Key" -> Pattern.compile("-----BEGIN (?:RSA |EC |DSA |OPENSSH )?PRIVATE KEY-----"),
      "SECRET_GitHub_Token" -> Pattern.compile("\\bgh[pousr]_[A-Za-z0-9]{36,}\\b"),
      "SECRET_Slack_Token" -> Pattern.compile("\\bxox[baprs]-[0-9A-Za-z-]{10,}\\b"),
      "SECRET_Basic_Auth" -> Pattern.compile("://[^\\s:@/]+:([^\\s:@/]+)@"),
      "SECRET_Hex_High_Entropy" -> Pattern.compile("\\b[0-9a-f]{40,64}\\b"),
      "SECRET_Keyword_Assignment" ->
        Pattern.compile("(?i)\\b(?:password|passwd|secret|api_key|apikey|token)\\b\\s*[=:]\\s*[\"']([^\"'\\s]{8,})[\"']"))

    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val docLen = CodePoints.length(text)
      val bmp = CodePoints.isBmpOnly(text)
      def cp(idx: Int): Long =
        if (bmp) idx.toLong else CodePoints.charToCodePointIndex(text, idx).toLong
      val spans = Vector.newBuilder[Span]
      patterns.foreach { case (typ, pat) =>
        val m = pat.matcher(text)
        while (m.find()) {
          val g = if (m.groupCount() >= 1 && m.group(1) != null) 1 else 0
          spans += Span(cp(m.start(g)), cp(m.end(g)), typ, 1.0)
        }
      }
      val found = spans.result()
      val words = TextSplit.pythonSplit(text).length
      val score = if (words == 0) -1.0 else found.length.toDouble / words
      found :+ Span(0, docLen, "doc", score)
    }
  }

  /** Language routing for the StarCoder taggers: `metadata.ext` resolved
    * through the reference's own ext_to_lang_mapping.json (vendored;
    * code_taggers.py:204-208 / 247-250 — unknown or missing ext →
    * "-no-lang"). When the row carries no `ext` but has a `lang` column
    * (our Iceberg input shape), the language is taken directly — an
    * addition for table inputs, not a reference behavior change. */
  private def routeLang(meta: Map[String, String]): String =
    meta.get("ext") match {
      case Some(e) => RefData.extToLang.getOrElse(e, "-no-lang")
      case None    => meta.getOrElse("lang", "-no-lang")
    }

  /** StarCoder-style doc features (code_taggers.py:232-271): XML template
    * sniff, star count from metadata, comment-to-code ratio via a per-
    * language comment lexer (full-AST parity not required by the north
    * rule), HTML code-to-text ratio via tag stripping. */
  final class StarCoderTagger extends Tagger {
    val name = "code_starcoder_taggers_v2"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val docLen = CodePoints.length(text)
      val head = CodePoints.slice(text, 0, 100)
      val hasXml = if (head.contains("<?xml version=")) 1.0 else 0.0
      val stars = meta.get("max_stars_count").flatMap(s => s.toDoubleOption).getOrElse(0.0)
      val lang = routeLang(meta)

      val nlRatio =
        if (lang == "python" || lang == "java" || lang == "javascript")
          CommentLexer.commentRatio(text, lang)
        else 0.5 // reference's neutral middle value (code_taggers.py:252-255)

      val codeToText =
        if (lang == "html") {
          val stripped = CommentLexer.stripHtml(text)
          val ratio = if (text.nonEmpty) CodePoints.length(stripped).toDouble / docLen else 0.0
          if (CodePoints.length(stripped) > 100) ratio else 0.0
        } else 1.0

      Vector(
        Span(0, docLen, "has_xml_template_doc", hasXml),
        Span(0, docLen, "num_github_stars_doc", stars),
        Span(0, docLen, "code_to_comment_ratio_doc", nlRatio),
        Span(0, docLen, "code_to_text_ratio_html_doc", codeToText))
    }
  }

  /** v1 (code_taggers.py:189-226): nl_ratio for EVERY known language
    * (-1.0 when the language is unknown, together with code_to_text
    * -1.0 — the reference's bare-except), html code-to-text otherwise
    * 1.0. */
  final class StarCoderV1Tagger extends Tagger {
    val name = "code_starcoder_taggers_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val docLen = CodePoints.length(text)
      val head = CodePoints.slice(text, 0, 100)
      val hasXml = if (head.contains("<?xml version=")) 1.0 else 0.0
      val stars = meta.get("max_stars_count").flatMap(_.toDoubleOption).getOrElse(0.0)
      val lang = routeLang(meta)
      val known = CommentLexer.knowsLanguage(lang) || lang == "html"
      val (nlRatio, codeToText) =
        // empty text: the reference's get_nl_ratio / filter_html hit
        // ZeroDivisionError and the bare except yields the (-1,-1)
        // unknown sentinel (code_taggers.py:207-218) — empty __init__.py
        // files are ubiquitous in code corpora
        if (!known || text.isEmpty) (-1.0, -1.0)
        else {
          val nl = CommentLexer.commentRatio(text, lang)
          val ctt =
            if (lang == "html") {
              val stripped = CommentLexer.stripHtml(text)
              val ratio = if (text.nonEmpty)
                CodePoints.length(stripped).toDouble / docLen else 0.0
              if (CodePoints.length(stripped) > 100) ratio else 0.0
            } else 1.0
          (nl, ctt)
        }
      Vector(
        Span(0, docLen, "has_xml_template_doc", hasXml),
        Span(0, docLen, "num_github_stars_doc", stars),
        Span(0, docLen, "nl_ratio_doc", nlRatio),
        Span(0, docLen, "code_to_text_ratio_html_doc", codeToText))
    }
  }

  def registerAll(): Unit = {
    TaggerRegistry.register("code_redpajama_taggers_v1")(new RedPajamaTagger)
    TaggerRegistry.register("code_copyright_comments_v1")(new CopyrightTagger)
    TaggerRegistry.register("code_secrets_v1")(new SecretsTagger)
    TaggerRegistry.register("code_starcoder_taggers_v1")(new StarCoderV1Tagger)
    TaggerRegistry.register("code_starcoder_taggers_v2")(new StarCoderTagger)
  }
}

/** Line/block comment grammar per language; computes the fraction of
  * characters inside comments (the reference's `get_nl_ratio` via Python
  * tokenize/pygments — starcoder.py:30-129 — approximated by lexing comment
  * syntax directly). */
object CommentLexer {
  private case class Grammar(line: Seq[String], blockOpen: String, blockClose: String,
      stringQuotes: Seq[String])

  private val grammars: Map[String, Grammar] = Map(
    "python" -> Grammar(Seq("#"), "\"\"\"", "\"\"\"", Seq("\"", "'")),
    "java" -> Grammar(Seq("//"), "/*", "*/", Seq("\"")),
    "javascript" -> Grammar(Seq("//"), "/*", "*/", Seq("\"", "'", "`")),
    "scala" -> Grammar(Seq("//"), "/*", "*/", Seq("\"")),
    "c" -> Grammar(Seq("//"), "/*", "*/", Seq("\"")),
    "go" -> Grammar(Seq("//"), "/*", "*/", Seq("\"", "`")),
    "rust" -> Grammar(Seq("//"), "/*", "*/", Seq("\"")),
    "sql" -> Grammar(Seq("--"), "/*", "*/", Seq("'")),
    "ruby" -> Grammar(Seq("#"), "=begin", "=end", Seq("\"", "'")))

  def knowsLanguage(lang: String): Boolean = grammars.contains(lang)

  /** Fraction of code-point characters inside comments (0.0 if no grammar). */
  def commentRatio(text: String, lang: String): Double = {
    val g = grammars.getOrElse(lang, return 0.0)
    if (text.isEmpty) return 0.0
    var commentChars = 0L
    var i = 0
    val n = text.length
    var inString: String = null
    var inBlock = false
    var inLine = false
    while (i < n) {
      val c = text.charAt(i)
      if (inLine) {
        if (c == '\n') inLine = false else commentChars += 1
        i += 1
      } else if (inBlock) {
        if (text.startsWith(g.blockClose, i)) {
          commentChars += g.blockClose.length
          i += g.blockClose.length
          inBlock = false
        } else { commentChars += 1; i += 1 }
      } else if (inString != null) {
        if (c == '\\') i += 2
        else if (text.startsWith(inString, i)) { i += inString.length; inString = null }
        else i += 1
      } else {
        if (text.startsWith(g.blockOpen, i)) {
          inBlock = true; commentChars += g.blockOpen.length; i += g.blockOpen.length
        } else if (g.line.exists(text.startsWith(_, i))) {
          inLine = true
          val pfx = g.line.find(text.startsWith(_, i)).get
          commentChars += pfx.length; i += pfx.length
        } else {
          val q = g.stringQuotes.find(text.startsWith(_, i))
          if (q.isDefined) { inString = q.get; i += q.get.length }
          else i += 1
        }
      }
    }
    // normalize by code-point length to stay consistent with other ratios
    math.min(1.0, commentChars.toDouble / CodePoints.length(text))
  }

  /** Tag-strip heuristic standing in for BeautifulSoup text extraction
    * (code/utils.py:57-72): drop script/style elements and all tags. */
  private val scriptStyle = Pattern.compile("(?is)<(script|style)[^>]*>.*?</\\1>")
  private val tags = Pattern.compile("(?s)<[^>]*>")
  def stripHtml(html: String): String =
    tags.matcher(scriptStyle.matcher(html).replaceAll(" ")).replaceAll(" ")
}
