package graft.taggers

import graft.core.{CodePoints, Span, TextSplit}

import java.nio.charset.StandardCharsets

/** Length/count taggers
  * (/root/reference/python/dolma/taggers/length.py:21-121).
  * All offsets/lengths are Unicode code points except `bytes_length_v1`
  * (UTF-8 bytes, length.py:21-25).
  */
object LengthTaggers {

  final class CharLengthV1 extends Tagger {
    val name = "char_length_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val n = CodePoints.length(text)
      Vector(Span(0, n, "length", n.toDouble))
    }
  }

  final class CharLengthStripWsV1 extends Tagger {
    val name = "char_length_strip_ws_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val n = CodePoints.length(text)
      // Python strip(): NBSP and friends are whitespace; trim keeps them
      Vector(Span(0, n, "length_no_ws",
        CodePoints.length(TextSplit.pyStrip(text)).toDouble))
    }
  }

  final class BytesLengthV1 extends Tagger {
    val name = "bytes_length_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val n = CodePoints.length(text)
      Vector(Span(0, n, "bytes", text.getBytes(StandardCharsets.UTF_8).length.toDouble))
    }
  }

  final class DocCountV1 extends Tagger {
    val name = "doc_count_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] =
      Vector(Span(0, CodePoints.length(text), "docs", 1.0))
  }

  /** `len(re.split(r"\w+|[^\w\s]+", text))` — segment count including
    * empties (length.py:58-64). */
  final class WhitespaceTokenizerV1 extends Tagger {
    val name = "whitespace_tokenizer_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] =
      Vector(Span(0, CodePoints.length(text), "length",
        TextSplit.regexSplitCount(text).toDouble))
  }

  /** Unicode-segmentation segment count over the stripped doc
    * (length.py:78-82 `uniseg_length_v1`; Python uniseg.wordbreak.words
    * yields EVERY UAX-29 segment including whitespace runs). */
  final class UnisegLengthV1 extends Tagger {
    val name = "uniseg_length_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val stripped = TextSplit.pyStrip(text)
      val score = if (stripped.isEmpty) 0 else {
        val bi = com.ibm.icu.text.BreakIterator.getWordInstance(java.util.Locale.ROOT)
        bi.setText(stripped)
        var count = 0
        bi.first()
        while (bi.next() != com.ibm.icu.text.BreakIterator.DONE) count += 1
        count
      }
      Vector(Span(0, CodePoints.length(text), "length", score.toDouble))
    }
  }

  /** Per-paragraph char lengths + doc length (length.py:48-55). */
  final class CharLengthWithParagraphsV1 extends Tagger {
    val name = "char_length_with_paragraphs_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val paras = TextSplit.splitParagraphs(text)
      val spans = paras.map(p => Span(p.start, p.end, "paragraph", (p.end - p.start).toDouble))
      spans :+ Span(0, CodePoints.length(text), "document", CodePoints.length(text).toDouble)
    }
  }

  /** Per-paragraph regex-split token counts + a document rollup that sums
    * the paragraph scores (length.py:67-75). */
  final class WhitespaceTokenizerWithParagraphsV1 extends Tagger {
    val name = "whitespace_tokenizer_with_paragraphs_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val paras = TextSplit.splitParagraphs(text)
      val spans = paras.map(p =>
        Span(p.start, p.end, "paragraph", TextSplit.regexSplitCount(p.text).toDouble))
      spans :+ Span(0, CodePoints.length(text), "document", spans.map(_.score).sum)
    }
  }

  /** Uniseg-style word counts per paragraph, with the reference's
    * negative-length quirk kept (length.py:85-103: mixer can only do
    * greater-than, so negated lengths enable "shorter-than" filters). */
  final class UnisegLengthParagraphsV1(withEmpty: Boolean = false, withDocLength: Boolean = false)
      extends Tagger {
    val name =
      if (withDocLength) "uniseg_length_paragraphs_with_doc_length_v1"
      else if (withEmpty) "uniseg_length_paragraphs_with_empty_v1"
      else "uniseg_length_paragraphs_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val paras = TextSplit.splitParagraphs(text, removeEmpty = !withEmpty)
      val spans = paras.flatMap { p =>
        val len = TextSplit.unisegWordCount(TextSplit.pyStrip(p.text))
        Vector(
          Span(p.start, p.end, "paragraph", len.toDouble),
          Span(p.start, p.end, "negative_paragraph", -len.toDouble))
      }
      if (withDocLength) {
        val pos = spans.filter(_.typ == "paragraph").map(_.score).sum
        val neg = spans.filter(_.typ == "negative_paragraph").map(_.score).sum
        val n = CodePoints.length(text)
        spans ++ Vector(Span(0, n, "document", pos), Span(0, n, "negative_document", neg))
      } else spans
    }
  }

  /** OLMo pre-tokenizer piece count (length.py:124-160). Needs NO
    * vocabulary — only the deterministic pre-tokenization pipeline:
    * (1) isolate ` ?[[:punct:]]` matches as standalone pieces,
    * (2) isolate ` ?\d` matches within every piece,
    * (3) the GPT-2 ByteLevel regex
    *     `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`
    *     tiles each piece; the count is the number of final pieces (the
    *     byte remapping doesn't change it).
    * Re-derived from the HF `tokenizers` Split(behavior=isolated) +
    * ByteLevel(use_regex) semantics — the crate itself is unavailable
    * offline; `[[:punct:]]` and `\d` are ASCII classes here as in the
    * Rust regex engine. The full-BPE `dolma_v1/v2_tokenizer` counts are
    * covered by [[HfVocabTokenizerTagger]] with a caller-provided
    * vocab file. */
  object OlmoPreTokenizer {
    private val punct = java.util.regex.Pattern.compile(" ?\\p{Punct}")
    private val digit = java.util.regex.Pattern.compile(" ?[0-9]")
    private val gpt2 = java.util.regex.Pattern.compile(
      "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")

    private def isolate(piece: String, p: java.util.regex.Pattern): Vector[String] = {
      val out = Vector.newBuilder[String]
      val m = p.matcher(piece)
      var last = 0
      while (m.find()) {
        if (m.start() > last) out += piece.substring(last, m.start())
        out += piece.substring(m.start(), m.end())
        last = m.end()
      }
      if (last < piece.length) out += piece.substring(last)
      out.result()
    }

    def count(text: String): Int = {
      if (text.isEmpty) return 0
      val ps = isolate(text, punct).flatMap(isolate(_, digit))
      var n = 0
      ps.foreach { pc =>
        val m = gpt2.matcher(pc)
        while (m.find()) n += 1
      }
      n
    }

    /** The final pre-token pieces themselves (exhaustive tiling of the
      * input) — the unit the BPE merge loop runs within when this
      * pipeline fronts a full tokenizer ([[graft.ml.HfTokenizer]]). */
    def pieces(text: String): Vector[String] = {
      if (text.isEmpty) return Vector.empty
      val out = Vector.newBuilder[String]
      isolate(text, punct).flatMap(isolate(_, digit)).foreach { pc =>
        val m = gpt2.matcher(pc)
        while (m.find()) out += pc.substring(m.start(), m.end())
      }
      out.result()
    }

    /** GPT-2 ByteLevel(use_regex) pre-tokenization alone (no Split
      * steps): the regex tiles the raw text. */
    def gpt2Pieces(text: String): Vector[String] = {
      if (text.isEmpty) return Vector.empty
      val out = Vector.newBuilder[String]
      val m = gpt2.matcher(text)
      while (m.find()) out += text.substring(m.start(), m.end())
      out.result()
    }
  }

  final class OlmoPreTokenizerV1 extends Tagger {
    val name = "olmo_pretokenizer_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] =
      Vector(Span(0, CodePoints.length(text), "length",
        OlmoPreTokenizer.count(text).toDouble))
  }

  final class OlmoPreTokenizerWithParagraphsV1 extends Tagger {
    val name = "olmo_pretokenizer_with_paragraphs_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val paras = TextSplit.splitParagraphs(text)
      val spans = paras.map(p =>
        Span(p.start, p.end, "paragraph", OlmoPreTokenizer.count(p.text).toDouble))
      spans :+ Span(0, CodePoints.length(text), "document", spans.map(_.score).sum)
    }
  }

  /** Full-BPE token count with a caller-provided pretrained vocab
    * (reference length.py:163-178: `dolma_v1_tokenizer` loads
    * allenai/gpt-neox-olmo-dolma-v1_5, `dolma_v2_tokenizer`
    * allenai/dolma2-tokenizer — both the public HF tokenizer.json format,
    * unreachable offline, so the file arrives via `$GRAFT_VOCAB_DIR/
    * <name>.json` or `$GRAFT_VOCAB_FILE`). Score = token count of the
    * stripped text (0 when blank), span over the whole doc — exactly the
    * reference's predict. */
  final class HfVocabTokenizerTagger(val name: String) extends Tagger {
    // resolved lazily per executor; the parsed model is JVM-cached
    @transient private lazy val tok = graft.ml.HfTokenizer.forTaggerName(name)
    def predict(text: String, meta: Map[String, String]): Vector[Span] = {
      val stripped = TextSplit.pyStrip(text) // Java strip() keeps \u00a0/\u2007/\u202f
      val score = if (stripped.isEmpty) 0 else tok.encode(stripped).length
      Vector(Span(0, CodePoints.length(text), "length", score.toDouble))
    }
  }

  def registerAll(): Unit = {
    TaggerRegistry.register("dolma_v1_tokenizer")(
      new HfVocabTokenizerTagger("dolma_v1_tokenizer"))
    TaggerRegistry.register("dolma_v2_tokenizer")(
      new HfVocabTokenizerTagger("dolma_v2_tokenizer"))
    TaggerRegistry.register("olmo_pretokenizer_v1")(new OlmoPreTokenizerV1)
    TaggerRegistry.register("olmo_pretokenizer_with_paragraphs_v1")(
      new OlmoPreTokenizerWithParagraphsV1)
    TaggerRegistry.register("char_length_v1")(new CharLengthV1)
    TaggerRegistry.register("char_length_strip_ws_v1")(new CharLengthStripWsV1)
    TaggerRegistry.register("bytes_length_v1")(new BytesLengthV1)
    TaggerRegistry.register("doc_count_v1")(new DocCountV1)
    TaggerRegistry.register("whitespace_tokenizer_v1")(new WhitespaceTokenizerV1)
    TaggerRegistry.register("whitespace_tokenizer_with_paragraphs_v1")(
      new WhitespaceTokenizerWithParagraphsV1)
    TaggerRegistry.register("char_length_with_paragraphs_v1")(new CharLengthWithParagraphsV1)
    TaggerRegistry.register("uniseg_length_v1")(new UnisegLengthV1)
    TaggerRegistry.register("uniseg_length_paragraphs_v1")(new UnisegLengthParagraphsV1())
    TaggerRegistry.register("uniseg_length_paragraphs_with_empty_v1")(
      new UnisegLengthParagraphsV1(withEmpty = true))
    TaggerRegistry.register("uniseg_length_paragraphs_with_doc_length_v1")(
      new UnisegLengthParagraphsV1(withDocLength = true))
  }
}
