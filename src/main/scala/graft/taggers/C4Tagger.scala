package graft.taggers

import graft.core.{CodePoints, Span, TextSplit}

/** C4 quality heuristics (/root/reference/python/dolma/taggers/c4.py).
  *
  * `c4_v1` (c4.py:44-84): per-line spans with offset bookkeeping — a line's
  * span covers its trailing newline except for the last line.
  * `c4_v2` (c4.py:87-127): the faster variant with doc-level booleans over
  * the lowercased text. The naughty-word list is the reference's own
  * data/naughty_words_en.txt, vendored and loaded the same way
  * (c4.py:10-13): word-level lookup for single words, substring for
  * multi-word phrases.
  */
final class C4Tagger(fast: Boolean, naughtyWords: Set[String], naughtyPhrases: Seq[String])
    extends Tagger {
  val name: String = if (fast) "c4_v2" else "c4_v1"
  private val MinWordsPerLine = 3

  private def endsWithEolPunct(s: String): Boolean =
    s.endsWith(".") || s.endsWith("?") || s.endsWith("!") || s.endsWith("\"")

  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    if (fast) predictFast(text) else predictV1(text)
  }

  private def predictFast(text: String): Vector[Span] = {
    val spans = Vector.newBuilder[Span]
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val docLen = CodePoints.length(text)

    if (lower.contains("{")) spans += Span(0, docLen, "has_curly_brace", 1.0)
    if (lower.contains("lorem ipsum")) spans += Span(0, docLen, "has_lorem_ipsum", 1.0)
    if (lower.contains("javascript")) spans += Span(0, docLen, "has_javascript", 1.0)
    val words = TextSplit.pythonSplit(lower)
    if (words.exists(naughtyWords.contains) || naughtyPhrases.exists(lower.contains))
      spans += Span(0, docLen, "has_naughty_word", 1.0)

    // per-line spans over the lowercased text (c4.py:108-124)
    var start = 0L
    var count = 0
    val lines = TextSplit.splitNewline(lower)
    val total = CodePoints.length(lower)
    var li = 0
    while (li < lines.length) {
      val sent0 = lines(li)
      var end = start + CodePoints.length(sent0)
      if (end != total) end += 1 // account for the newline
      val sent = TextSplit.pyStrip(sent0) // c4.py:115 Python strip()
      if (!endsWithEolPunct(sent))
        spans += Span(start, end, "lines_with_no_ending_punctuation", 1.0)
      if (TextSplit.pythonSplit(sent).length < MinWordsPerLine)
        spans += Span(start, end, "lines_with_too_few_words", 1.0)
      count += 1
      start = end
      li += 1
    }
    spans += Span(0, docLen, "line_count", count.toDouble)
    spans.result()
  }

  private def predictV1(text: String): Vector[Span] = {
    val docLen = CodePoints.length(text)
    val lines = TextSplit.splitNewline(text)
    val noPunct = Vector.newBuilder[Span]
    val tooFew = Vector.newBuilder[Span]
    var hasNaughty = false; var hasJs = false; var hasLorem = false; var hasCurly = false
    var offset = 0L
    var i = 0
    while (i < lines.length) {
      val original = lines(i)
      var end = offset + CodePoints.length(original)
      if (i < lines.length - 1) end += 1
      val line = TextSplit.pyStrip(original.toLowerCase(java.util.Locale.ROOT))
      if (!endsWithEolPunct(line)) noPunct += Span(offset, end, "lines_with_no_ending_punctuation", 1.0)
      val words = TextSplit.pythonSplit(line)
      if (words.length < MinWordsPerLine) tooFew += Span(offset, end, "lines_with_too_few_words", 1.0)
      if (words.exists(naughtyWords.contains) || naughtyPhrases.exists(line.contains)) hasNaughty = true
      if (words.contains("javascript")) hasJs = true
      if (line.contains("lorem ipsum")) hasLorem = true
      if (line.contains("{")) hasCurly = true
      offset = end
      i += 1
    }
    val spans = Vector.newBuilder[Span]
    spans ++= noPunct.result()
    spans ++= tooFew.result()
    if (hasNaughty) spans += Span(0, docLen, "has_naughty_word", 1.0)
    if (hasJs) spans += Span(0, docLen, "has_javascript", 1.0)
    if (hasLorem) spans += Span(0, docLen, "has_lorem_ipsum", 1.0)
    if (hasCurly) spans += Span(0, docLen, "has_curly_brace", 1.0)
    spans += Span(0, docLen, "line_count", lines.length.toDouble)
    spans.result()
  }
}

object C4Tagger {
  /** The reference's own blocklist (data/naughty_words_en.txt, vendored —
    * see [[RefData]]): 279 single words matched at word level, 124
    * multi-word phrases matched as substrings. */
  def DefaultNaughtyWords: Set[String] = RefData.naughtyWords
  def DefaultNaughtyPhrases: Seq[String] = RefData.naughtyPhrases

  def registerAll(): Unit = {
    TaggerRegistry.register("c4_v1")(
      new C4Tagger(fast = false, DefaultNaughtyWords, DefaultNaughtyPhrases))
    TaggerRegistry.register("c4_v2")(
      new C4Tagger(fast = true, DefaultNaughtyWords, DefaultNaughtyPhrases))
  }
}
