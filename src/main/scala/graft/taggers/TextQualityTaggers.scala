package graft.taggers

import graft.core.{CodePoints, Span, TextSplit}

import java.util.regex.Pattern

/** Training-data-pipeline text analysis taggers: heuristic language ID,
  * composite quality score, token counting, document fingerprinting,
  * punctuation-only paragraphs (taggers/punctuation.py:9-39) and the
  * deterministic sampling tagger (the reference's random_number_v1 seeds by
  * PID — taggers/sampling.py:14-16 — which is non-reproducible; we use a
  * hash of the text instead and record the deviation).
  */
object TextQualityTaggers {

  /** Stopword-profile language ID over {en,de,fr,es,zh}-style function
    * words. This is the cheap n-gram/stopword heuristic stage; the real
    * fastText-style classifier lives in [[graft.ml.FastTextClassifier]]. */
  final class HeuristicLangIdTagger extends Tagger {
    val name = "langid_heuristic_v1"
    private val profiles: Map[String, Set[String]] = Map(
      "en" -> Set("the", "and", "of", "to", "in", "is", "that", "with", "for", "it"),
      "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
      "fr" -> Set("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des"),
      "es" -> Set("el", "la", "los", "y", "es", "una", "que", "por", "con", "para"),
      "zh" -> Set("的", "是", "了", "在", "我", "有", "和", "不", "这", "人"))

    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val n = CodePoints.length(text)
      val words = TextSplit.pythonSplit(text.toLowerCase(java.util.Locale.ROOT))
      if (words.isEmpty) return Vector(Span(0, n, "en", 0.0))
      val hits = profiles.map { case (lang, stops) =>
        lang -> words.count(stops.contains).toDouble
      }
      val total = hits.values.sum
      val (bestLang, bestHits) = hits.maxBy { case (l, h) => (h, l) }
      val score = if (total > 0) bestHits / total else 0.0
      Vector(Span(0, n, bestLang, score))
    }
  }

  /** Composite quality heuristics: length, punctuation density, stopword
    * ratio, mean word length — the cheap scorer stage of a quality filter. */
  final class QualityScoreTagger extends Tagger {
    val name = "quality_score_v1"
    private val stopwords =
      Set("the", "be", "to", "of", "and", "a", "in", "that", "have", "with", "is", "it")

    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val n = CodePoints.length(text)
      if (n == 0)
        return Vector(Span(0, 0, "quality", 0.0), Span(0, 0, "stopword_ratio", 0.0),
          Span(0, 0, "punct_ratio", 0.0), Span(0, 0, "mean_word_length", 0.0))
      val words = TextSplit.pythonSplit(text)
      val wc = math.max(words.length, 1)
      val stopRatio = words.count(w => stopwords.contains(w.toLowerCase(java.util.Locale.ROOT))).toDouble / wc
      var punct = 0
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        if (!Character.isLetterOrDigit(cp) && !Character.isWhitespace(cp)) punct += 1
        i += Character.charCount(cp)
      }
      val punctRatio = punct.toDouble / n
      val meanWordLen = words.map(CodePoints.length).sum.toDouble / wc
      val lengthScore = math.min(1.0, n / 1000.0)
      val quality =
        0.4 * stopRatio + 0.3 * (1.0 - math.min(1.0, punctRatio * 4)) +
          0.2 * math.min(1.0, meanWordLen / 8.0) + 0.1 * lengthScore
      Vector(
        Span(0, n, "quality", quality),
        Span(0, n, "stopword_ratio", stopRatio),
        Span(0, n, "punct_ratio", punctRatio),
        Span(0, n, "mean_word_length", meanWordLen))
    }
  }

  /** Token counting: whitespace tokens and a BPE-ish subword estimate
    * (word-piece split on 4-char chunks + punctuation isolation). */
  final class TokenCountTagger extends Tagger {
    val name = "token_count_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val n = CodePoints.length(text)
      val ws = TextSplit.pythonSplit(text).length
      val pieces = TextSplit.wordTokens(text).iterator.map { t =>
        val len = t.end - t.start
        // a word of length L costs ceil(L/4) subword tokens (BPE-ish)
        (len + 3) / 4
      }.sum
      Vector(
        Span(0, n, "whitespace_tokens", ws.toDouble),
        Span(0, n, "bpe_tokens_estimate", pieces.toDouble))
    }
  }

  /** Rolling-hash document fingerprint over normalized words (64-bit FNV-1a
    * over the word stream) — cheap near-identity signature for lineage. */
  final class FingerprintTagger extends Tagger {
    val name = "doc_fingerprint_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val n = CodePoints.length(text)
      // top 53 hash bits as an EXACT integer double: reinterpreting raw
      // bits (longBitsToDouble) made ~1/2048 of documents NaN (exponent
      // all-ones), and Spark normalizes all NaNs equal — unrelated docs
      // collided into one fingerprint bucket
      Vector(Span(0, n, "fingerprint", (fnv64Words(text) >>> 11).toDouble))
    }
  }

  /** FNV-1a over lowercase words, separator-byte framed. */
  def fnv64Words(text: String): Long = {
    var h = 0xcbf29ce484222325L
    val words = TextSplit.pythonSplit(text.toLowerCase(java.util.Locale.ROOT))
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var j = 0
      while (j < w.length) {
        h ^= w.charAt(j).toLong & 0xffff
        h *= 0x100000001b3L
        j += 1
      }
      h ^= 0x1e
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Paragraphs that contain no alphanumeric characters
    * (punctuation.py:9-39 `not_alphanum_paragraph_v1`). */
  final class NotAlphanumParagraphTagger extends Tagger {
    val name = "not_alphanum_paragraph_v1"
    private val allPunct = Pattern.compile("^[\\p{P}\\p{S}\\p{Z}\\s]*$")
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val spans = TextSplit.splitParagraphs(text).iterator.flatMap { p =>
        if (allPunct.matcher(p.text).matches())
          Some(Span(p.start, p.end, "all_punct", 1.0))
        else None
      }.toVector
      // punctuation.py:36-38: a mandatory score-0 doc span when nothing
      // matched, so the attribute is PRESENT on every document
      if (spans.isEmpty)
        Vector(Span(0, CodePoints.length(text), "all_punct", 0.0))
      else spans
    }
  }

  /** Deterministic per-doc uniform score: xxhash-style mix of the text
    * replaces the reference's PID-seeded RNG (sampling.py:14-16) so runs
    * are reproducible. */
  final class RandomNumberTagger extends Tagger {
    val name = "random_number_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val n = CodePoints.length(text)
      val h = fnv64Words(text)
      val unit = (h >>> 11).toDouble / (1L << 53).toDouble
      Vector(Span(0, n, "random", unit))
    }
  }

  def registerAll(): Unit = {
    TaggerRegistry.register("langid_heuristic_v1")(new HeuristicLangIdTagger)
    TaggerRegistry.register("quality_score_v1")(new QualityScoreTagger)
    TaggerRegistry.register("token_count_v1")(new TokenCountTagger)
    TaggerRegistry.register("doc_fingerprint_v1")(new FingerprintTagger)
    TaggerRegistry.register("not_alphanum_paragraph_v1")(new NotAlphanumParagraphTagger)
    TaggerRegistry.register("random_number_v1")(new RandomNumberTagger)
  }
}
