package graft.core

import scala.collection.mutable.ArrayBuffer

/** A zero-copy slice of a document (reference `TextSlice`,
  * /root/reference/python/dolma/core/data_types.py:303-318).
  * Offsets are Unicode code points into the parent string.
  */
final case class TextSlice(doc: String, start: Int, end: Int) {
  def text: String = CodePoints.slice(doc, start, end)
}

/** Text splitters replicating the reference's Python semantics exactly.
  *
  * - paragraphs: regex `([^\n]*\n|[^\n]+$)`
  *   (/root/reference/python/dolma/core/utils.py:92-98)
  * - pythonSplit: Python `str.split()` — runs of Unicode whitespace,
  *   empties dropped.
  * - splitLines: Python `str.splitlines()` terminator set.
  *
  * All offsets are code points (see [[CodePoints]]).
  */
object TextSplit {

  private val ParagraphRe = "([^\\n]*\\n|[^\\n]+$)".r

  /** Reference `split_paragraphs` (utils.py:92-98). Offsets in code points. */
  def splitParagraphs(text: String, removeEmpty: Boolean = true): Vector[TextSlice] = {
    if (text.isEmpty) return Vector.empty
    val out = ArrayBuffer.empty[TextSlice]
    // The regex tiles the string: each paragraph is [^\n]*\n or a final
    // [^\n]+$. Walk manually (cheaper than regex and code-point exact).
    val n = text.length
    var i = 0          // utf-16 index
    var cp = 0         // code-point index
    var segStartCp = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\n') {
        out += TextSlice(text, segStartCp, cp + 1)
        segStartCp = cp + 1
        i += 1; cp += 1
      } else {
        // advance 2 only over a REAL surrogate pair: a lone high surrogate
        // (malformed UTF-16 from crawl JSON) must not swallow the next
        // char — Python len() counts lone surrogates one each
        i += (if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(text.charAt(i + 1))) 2 else 1)
        cp += 1
      }
    }
    if (cp > segStartCp) out += TextSlice(text, segStartCp, cp)
    val v = out.toVector
    // Python str.strip() whitespace, not String.trim (<= U+0020): an
    // NBSP-only paragraph is EMPTY to the reference and must drop
    if (removeEmpty) v.filter(s => s.text.exists(c => !isPyWhitespace(c))) else v
  }

  /** Python `str.split()` — splits on runs of whitespace, drops empties. */
  def pythonSplit(text: String): Array[String] = {
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    var start = -1
    while (i < n) {
      if (isPyWhitespace(text.charAt(i))) {
        if (start >= 0) { out += text.substring(start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out += text.substring(start, n)
    out.toArray
  }

  /** Python `str.strip()` — strips Unicode whitespace from both ends
    * (String.trim only strips chars <= U+0020, keeping NBSP etc.). */
  def pyStrip(text: String): String = {
    var a = 0
    var b = text.length
    while (a < b && isPyWhitespace(text.charAt(a))) a += 1
    while (b > a && isPyWhitespace(text.charAt(b - 1))) b -= 1
    text.substring(a, b)
  }

  /** Python `str.isspace()`-compatible whitespace test (covers the chars
    * `str.split()` splits on). */
  @inline def isPyWhitespace(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r') ||
      (c >= '\u001c' && c <= '\u001f') ||
      c == '\u0085' || Character.isSpaceChar(c)

  /** Python `str.splitlines()` (no trailing empty; rich terminator set).
    * Used by the redpajama line stats (code_taggers.py:166). */
  def splitLines(text: String): Array[String] = {
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    var start = 0
    while (i < n) {
      val c = text.charAt(i)
      if (isLineTerminator(c)) {
        out += text.substring(start, i)
        if (c == '\r' && i + 1 < n && text.charAt(i + 1) == '\n') i += 1
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += text.substring(start, n)
    out.toArray
  }

  @inline private def isLineTerminator(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u000b' || c == '\u000c' ||
      (c >= '\u001c' && c <= '\u001e') || c == '\u0085' ||
      c == '\u2028' || c == '\u2029'

  /** `text.split("\n")` with Python semantics (keeps empties, including a
    * trailing empty after a final newline). */
  def splitNewline(text: String): Array[String] = text.split("\n", -1)

  /** Reference word tokenizer `\w+|[^\w\s]+`
    * (/root/reference/python/dolma/taggers/code/utils.py:75-76 and
    * src/wimbd/tokens.rs:11-20). Returns slices with code-point offsets. */
  // (?U) = UNICODE_CHARACTER_CLASS: the reference's `regex` module and
  // the Rust regex crate are Unicode-aware, so \w must cover accented
  // letters/CJK — ASCII \w split "héllo" into 3 tokens instead of 1
  private val WordTokenRe = "(?U)[\\w]+|[^\\w\\s]+".r
  def wordTokens(text: String): Vector[TextSlice] = {
    // regex over UTF-16; convert offsets to code points only if needed
    val bmp = CodePoints.isBmpOnly(text)
    WordTokenRe.findAllMatchIn(text).map { m =>
      if (bmp) TextSlice(text, m.start, m.end)
      else TextSlice(text,
        CodePoints.charToCodePointIndex(text, m.start),
        CodePoints.charToCodePointIndex(text, m.end))
    }.toVector
  }

  /** Python `re.split(pattern, text)` semantics for the whitespace tokenizer
    * family: `len(regex.split(text))` counts segments BETWEEN matches,
    * including leading/trailing empties (length.py:58-64). */
  def regexSplitCount(text: String): Int = {
    // split by the token regex: number of fragments = number of matches + 1
    WordTokenRe.findAllMatchIn(text).length + 1
  }

  /** UAX-29 word segmentation via ICU (the same BreakIterator
    * UnisegLengthV1 uses — uniseg, the reference library, implements the
    * same annex), counting only segments with a non-whitespace char:
    * uniseg_length_paragraphs_v1 (length.py:94-96). A hand-rolled
    * letters/digits splitter breaks "don't" into 4 segments and "3.14"
    * into 3 where UAX-29 keeps ALetter×MidNumLetQ×ALetter and
    * Numeric×MidNumLetQ×Numeric together. */
  def unisegWordCount(text: String): Int = {
    if (text.isEmpty) return 0
    val bi = com.ibm.icu.text.BreakIterator.getWordInstance(java.util.Locale.ROOT)
    bi.setText(text)
    var count = 0
    var start = bi.first()
    var end = bi.next()
    while (end != com.ibm.icu.text.BreakIterator.DONE) {
      var i = start
      var nonWs = false
      while (i < end && !nonWs) {
        if (!isPyWhitespace(text.charAt(i))) nonWs = true
        i += 1
      }
      if (nonWs) count += 1
      start = end
      end = bi.next()
    }
    count
  }
}
