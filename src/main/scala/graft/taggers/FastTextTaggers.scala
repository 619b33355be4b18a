package graft.taggers

import graft.core.{CodePoints, Span, TextSplit}
import graft.ml.FastTextClassifier

/** Model-backed taggers: the reference's fastText tagger families re-hosted
  * on the in-repo classifier (/root/reference/python/dolma/taggers/
  * language.py:149-196, jigsaw.py:16-45, quality.py:18-68).
  *
  * - doc mode: one span over the whole doc with P(label).
  * - paragraph mode: one span per paragraph; plus the doc-score rollup
  *   Σ(para_len × score) / len(text) (language.py:301-317), emitted as
  *   `doc_<label>` like the `*_with_doc_score_v2` variants.
  * - binary classifiers (toxicity/quality) emit both label scores.
  *
  * The classifier instance is immutable and shared; in Spark it arrives
  * per-executor via broadcast (or lazily via the registry closure).
  */
final class FastTextTagger(
    val name: String,
    model: => FastTextClassifier,
    positiveLabel: String,
    paragraphLevel: Boolean,
    sentenceLevel: Boolean = false) extends Tagger {

  private lazy val m = model
  private lazy val posIdx = m.labelIndex(positiveLabel)

  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val docLen = CodePoints.length(text)
    if (paragraphLevel || sentenceLevel) {
      val paras =
        if (sentenceLevel) graft.core.Sentences.split(text)
        else TextSplit.splitParagraphs(text)
      val spans = Vector.newBuilder[Span]
      var weighted = 0.0
      paras.foreach { p =>
        // allocation-free per-paragraph scoring (thread-local probs)
        val score = if (posIdx < 0) 0.0 else m.predictProbaInto(p.text)(posIdx)
        spans += Span(p.start, p.end, positiveLabel, score)
        weighted += (p.end - p.start) * score
      }
      // doc rollup (language.py:301-317): Σ(len×score)/len(text)
      val docScore = if (docLen > 0) weighted / docLen else 0.0
      spans += Span(0, docLen, s"doc_$positiveLabel", docScore)
      spans.result()
    } else {
      // one forward pass: both the argmax and P(positive) come from the
      // same distribution
      val probs = m.predictProbaInto(text)
      var best = 0
      var l = 1
      while (l < probs.length) { if (probs(l) > probs(best)) best = l; l += 1 }
      val pPos = if (posIdx < 0) 0.0 else probs(posIdx)
      Vector(
        Span(0, docLen, positiveLabel, pPos),
        Span(0, docLen, s"best_${m.labels(best)}", probs(best)))
    }
  }
}

/** Code/prose composition classifier (ref
  * /root/reference/python/dolma/taggers/code_composition.py:25-98): each
  * non-empty stripped line is classified code|prose (lines of ≤3 chars are
  * "other" with an empty distribution); emits the code↔prose boundary
  * count, and per observed label its line count, share of lines (Python
  * round(x, 2)), and mean Shannon entropy (log2) of the label's predicted
  * distributions. */
final class CodeCompositionTagger(model: => FastTextClassifier) extends Tagger {
  val name = "code_composition"
  private lazy val m = model

  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val docLen = CodePoints.length(text)
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val entropySums = scala.collection.mutable.HashMap.empty[String, Double]
    var active: String = null
    var boundaries = 0
    TextSplit.splitLines(text).foreach { raw =>
      val line = TextSplit.pyStrip(raw) // code_composition.py:85 strip()
      if (line.nonEmpty) {
        var label = "other"
        var entropy = 0.0
        // len(line) in Python is CODE POINTS (code_composition.py:51)
        if (CodePoints.length(line) > 3) {
          val probs = m.predictProbaInto(line)
          var best = 0
          var i = 1
          while (i < probs.length) { if (probs(i) > probs(best)) best = i; i += 1 }
          label = m.labels(best)
          i = 0
          while (i < probs.length) {
            val p = probs(i)
            if (p > 0) entropy -= p * (math.log(p) / math.log(2.0))
            i += 1
          }
        }
        counts.update(label, counts.getOrElse(label, 0) + 1)
        entropySums.update(label, entropySums.getOrElse(label, 0.0) + entropy)
        if ((active == "code" || active == "prose") &&
            (label == "code" || label == "prose") && label != active) boundaries += 1
        active = label
      }
    }
    val total = counts.valuesIterator.sum
    val out = Vector.newBuilder[Span]
    out += Span(0, docLen, "boundaries", boundaries.toDouble)
    counts.foreach { case (label, c) =>
      out += Span(0, docLen, s"${label}_pct",
        graft.core.Attributes.roundScore(c.toDouble / total, 2))
      out += Span(0, docLen, label, c.toDouble)
      out += Span(0, docLen, s"${label}_entropy", entropySums(label) / c)
    }
    out.result()
  }
}

/** Faithful BaseLanguageTagger semantics (language.py:37-71,149-197,
  * 300-345) over the in-repo classifier: all-language distributions per
  * unit (doc or paragraph, fastText k=-1 descending order), optional
  * `not_<lang>` negatives (1-score), the en-only filter with its
  * `("en", 0.0)` fallback, the 1e2 min-score/round-2 variant, and the
  * Σ(len×score)/len doc_en / doc_not_en rollup. */
final class LanguageTagger(
    val name: String,
    model: => FastTextClassifier,
    paragraphs: Boolean,
    includeNegative: Boolean,
    enFilter: Boolean = false,
    minScore: Double = 0.0, // 1e2 variant: filter raw, then round to 2dp
    docScoreRollup: Boolean = false) extends Tagger {

  private lazy val m = model

  private def predictText(text: String): Seq[(String, Double)] = {
    val probs = m.predictProbaInto(text)
    val ordered = m.labels.indices
      .sortBy(i => -probs(i))
      .map(i => (m.labels(i), probs(i)))
    val filtered =
      if (enFilter) {
        val en = ordered.filter(_._1 == "en")
        if (en.nonEmpty) en else Seq(("en", 0.0))
      } else if (minScore > 0.0)
        ordered.filter(_._2 > minScore)
          .map { case (l, s) => (l, graft.core.Attributes.roundScore(s, 2)) }
      else ordered
    filtered
  }

  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val docLen = CodePoints.length(text)
    val base: Vector[Span] =
      if (paragraphs)
        TextSplit.splitParagraphs(text).toVector.flatMap { p =>
          predictText(p.text).map { case (l, s) => Span(p.start, p.end, l, s) }
        }
      else
        predictText(text).toVector.map { case (l, s) => Span(0, docLen, l, s) }
    val withNeg =
      if (includeNegative)
        base ++ base.map(s => Span(s.start, s.end, s"not_${s.typ}", 1.0 - s.score))
      else base
    if (docScoreRollup) {
      // ZeroDivisionError branch: BOTH scores 0.0 on empty docs
      // (language.py:303-309)
      val (docEn, docNotEn) =
        if (docLen == 0) (0.0, 0.0)
        else {
          val en = withNeg.iterator.filter(_.typ == "en")
            .map(s => (s.end - s.start) * s.score).sum / docLen
          (en, 1.0 - en)
        }
      withNeg ++ Vector(
        Span(0, docLen, "doc_en", docEn),
        Span(0, docLen, "doc_not_en", docNotEn))
    } else withNeg
  }
}

/** dclm-oh-eli5 (quality.py:18-42): pre-norm joins the stripped document's
  * lines with spaces; single top prediction; when the argmax is the
  * negative (cc/low-quality) label the probability flips to 1-p; emitted
  * under the flattened type "score". */
final class DclmQualityTagger(
    val name: String, model: => FastTextClassifier, negativeLabel: String) extends Tagger {
  private lazy val m = model
  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val joined = TextSplit.splitLines(TextSplit.pyStrip(text)).mkString(" ") // quality.py:29 strip()
    val (label, prob) = m.predict(joined)
    val score = if (label == negativeLabel) 1.0 - prob else prob
    Vector(Span(0, CodePoints.length(text), "score", score))
  }
}

/** dolma17-quality (quality.py:45-68): HF Strip + WhitespaceSplit
  * pre-norm, full k=-1 distribution sorted descending, one span per
  * label. */
final class Dolma17QualityTagger(
    val name: String, model: => FastTextClassifier) extends Tagger {
  private lazy val m = model
  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val pre = TextSplit.pythonSplit(TextSplit.pyStrip(text)).mkString(" ") // HF Strip = Unicode ws
    val probs = m.predictProbaInto(pre)
    val docLen = CodePoints.length(text)
    m.labels.indices.sortBy(i => -probs(i))
      .map(i => Span(0, docLen, m.labels(i), probs(i))).toVector
  }
}

object FastTextTaggers {

  /** Tiny deterministic toxicity model: synthetic "toxic" vs "clean"
    * vocabularies (stand-in for jigsaw weights, trained in-repo —
    * FIXTURES.md §5). */
  lazy val toxicity: FastTextClassifier = {
    val rng = new scala.util.Random(13L)
    val toxic = Vector("hate", "stupid", "idiot", "trash", "garbage", "awful",
      "ugly", "loser", "shut", "dumb")
    val clean = Vector("data", "value", "stream", "merge", "kind", "helpful",
      "great", "thanks", "please", "nice")
    val ex = (for (_ <- 1 to 60) yield {
      Seq(
        "toxic" -> (1 to 12).map(_ => toxic(rng.nextInt(toxic.length))).mkString(" "),
        "clean" -> (1 to 12).map(_ => clean(rng.nextInt(clean.length))).mkString(" "))
    }).flatten
    FastTextClassifier.train(ex, dim = 12, epochs = 6, seed = 13L)
  }

  /** Tiny code-vs-prose line classifier (stand-in for the reference's
    * code-comment-prose composition model, trained in-repo on synthetic
    * code lines vs English prose — FIXTURES.md §5). */
  lazy val codeProse: FastTextClassifier = {
    val rng = new scala.util.Random(29L)
    val codeLines = Vector(
      "def compute(x):", "return x + 1", "for i in range(10):",
      "if value == None:", "import os", "x = y * 2", "} else {",
      "public static void main(String[] args) {", "let v = arr.map(f);",
      "print(result)", "while (i < n) { i += 1; }", "val out = seq.filter(p)",
      "def foo():", "x = 1 + 1", "return x", "def bar():", "x = 1.1 * 2.2",
      "def baz():", "x = 1 / 2")
    val proseWords = Vector("the", "history", "of", "science", "shows", "that",
      "careful", "analysis", "reveals", "deep", "structure", "with", "evidence",
      "following", "function", "numbers", "result", "we", "demonstrate",
      "returns", "together", "finally", "how", "divide", "two")
    val ex = (for (_ <- 1 to 80) yield Seq(
      "code" -> codeLines(rng.nextInt(codeLines.length)),
      "prose" -> ((1 to 8).map(_ => proseWords(rng.nextInt(proseWords.length))).mkString(" ") + "."))).flatten
    FastTextClassifier.train(ex, dim = 12, epochs = 8, seed = 29L)
  }

  /** Tiny NSFW stand-in model (same engine as toxicity, distinct
    * vocabulary — jigsaw.py:39-45's nsfw weights are not
    * redistributable). */
  lazy val nsfw: FastTextClassifier = {
    val rng = new scala.util.Random(31L)
    val nsfwWords = Vector("explicit", "adult", "nude", "xxx", "porn", "lewd",
      "racy", "obscene")
    val cleanWords = Vector("data", "value", "stream", "report", "garden",
      "music", "travel", "recipe", "science", "school")
    val ex = (for (_ <- 1 to 60) yield Seq(
      "nsfw" -> (1 to 8).map(_ => nsfwWords(rng.nextInt(nsfwWords.length))).mkString(" "),
      "clean" -> (1 to 8).map(_ => cleanWords(rng.nextInt(cleanWords.length))).mkString(" "))).flatten
    FastTextClassifier.train(ex, dim = 12, epochs = 6, seed = 31L)
  }

  /** Tiny quality model: "wiki-like" prose vs keyboard-mash noise. */
  lazy val quality: FastTextClassifier = {
    val rng = new scala.util.Random(17L)
    val good = Vector("the", "history", "of", "science", "shows", "that",
      "careful", "analysis", "reveals", "structure", "with", "evidence")
    val ex = (for (i <- 1 to 60) yield {
      val noise = (1 to 10).map(_ =>
        (1 to 6).map(_ => ('a' + rng.nextInt(26)).toChar).mkString).mkString(" ")
      Seq(
        "hq" -> (1 to 12).map(_ => good(rng.nextInt(good.length))).mkString(" "),
        "lq" -> noise)
    }).flatten
    FastTextClassifier.train(ex, dim = 12, epochs = 6, seed = 17L)
  }

  def registerAll(): Unit = {
    // BaseLanguageTagger family (language.py:149-197,336-345) — the
    // fastText-engine variants; cld2/cld3/langdetect/lingua are redundant
    // third-party engines (scoped out per SURVEY)
    TaggerRegistry.register("ft_lang_id_1e2")(
      new LanguageTagger("ft_lang_id_1e2", graft.Models.langId,
        paragraphs = false, includeNegative = false, minScore = 0.01))
    TaggerRegistry.register("ft_lang_id_paragraph_v1")(
      new LanguageTagger("ft_lang_id_paragraph_v1", graft.Models.langId,
        paragraphs = true, includeNegative = false))
    TaggerRegistry.register("ft_lang_id_en_doc_v2")(
      new LanguageTagger("ft_lang_id_en_doc_v2", graft.Models.langId,
        paragraphs = false, includeNegative = true, enFilter = true))
    TaggerRegistry.register("ft_lang_id_en_only_v2")(
      new LanguageTagger("ft_lang_id_en_only_v2", graft.Models.langId,
        paragraphs = false, includeNegative = false, enFilter = true))
    TaggerRegistry.register("ft_lang_id_en_paragraph_v2")(
      new LanguageTagger("ft_lang_id_en_paragraph_v2", graft.Models.langId,
        paragraphs = true, includeNegative = true, enFilter = true))
    TaggerRegistry.register("ft_lang_id_doc_v1")(
      new LanguageTagger("ft_lang_id_doc_v1", graft.Models.langId,
        paragraphs = false, includeNegative = false))
    TaggerRegistry.register("ft_lang_id_en_paragraph_with_doc_score_v2")(
      new LanguageTagger("ft_lang_id_en_paragraph_with_doc_score_v2",
        graft.Models.langId, paragraphs = true, includeNegative = true,
        enFilter = true, docScoreRollup = true))
    TaggerRegistry.register("jigsaw_toxicity_document_v1")(
      new FastTextTagger("jigsaw_toxicity_document_v1", toxicity, "toxic",
        paragraphLevel = false))
    TaggerRegistry.register("jigsaw_toxicity_paragraph_v1")(
      new FastTextTagger("jigsaw_toxicity_paragraph_v1", toxicity, "toxic",
        paragraphLevel = true))
    TaggerRegistry.register("jigsaw_toxicity_sentence_v1")(
      new FastTextTagger("jigsaw_toxicity_sentence_v1", toxicity, "toxic",
        paragraphLevel = false, sentenceLevel = true))
    TaggerRegistry.register("ft_quality_document_v1")(
      new FastTextTagger("ft_quality_document_v1", quality, "hq",
        paragraphLevel = false))
    // quality.py registry names (in-repo stand-in weights; "lq" plays the
    // reference's negative "cc" label)
    TaggerRegistry.register("dclm-oh-eli5")(
      new DclmQualityTagger("dclm-oh-eli5", quality, negativeLabel = "lq"))
    TaggerRegistry.register("dolma17-quality")(
      new Dolma17QualityTagger("dolma17-quality", quality))
    // registry-name parity with jigsaw.py:16-45 (hatespeech/nsfw doc +
    // sentence variants; same engine, in-repo nsfw stand-in vocabulary;
    // "sencence" typo is the reference's registered name)
    TaggerRegistry.register("jigsaw_hatespeech_document_v2")(
      new FastTextTagger("jigsaw_hatespeech_document_v2", toxicity, "toxic",
        paragraphLevel = false))
    TaggerRegistry.register("jigsaw_hatespeech_sentence_v2")(
      new FastTextTagger("jigsaw_hatespeech_sentence_v2", toxicity, "toxic",
        paragraphLevel = false, sentenceLevel = true))
    TaggerRegistry.register("jigsaw_nsfw_document_v1")(
      new FastTextTagger("jigsaw_nsfw_document_v1", nsfw, "nsfw",
        paragraphLevel = false))
    TaggerRegistry.register("jigsaw_nsfw_sencence_v2")(
      new FastTextTagger("jigsaw_nsfw_sencence_v2", nsfw, "nsfw",
        paragraphLevel = false, sentenceLevel = true))
    TaggerRegistry.register("code_composition")(
      new CodeCompositionTagger(codeProse))
  }
}
