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

  def predict(text: String, meta: Map[String, String]): Vector[Span] = {
    val docLen = CodePoints.length(text)
    if (paragraphLevel || sentenceLevel) {
      val paras =
        if (sentenceLevel) graft.core.Sentences.split(text)
        else TextSplit.splitParagraphs(text)
      val spans = Vector.newBuilder[Span]
      var weighted = 0.0
      paras.foreach { p =>
        val score = m.scoreLabel(p.text, positiveLabel)
        spans += Span(p.start, p.end, positiveLabel, score)
        weighted += (p.end - p.start) * score
      }
      // doc rollup (language.py:301-317): Σ(len×score)/len(text)
      val docScore = if (docLen > 0) weighted / docLen else 0.0
      spans += Span(0, docLen, s"doc_$positiveLabel", docScore)
      spans.result()
    } else {
      val (label, prob) = m.predict(text)
      val pPos = m.scoreLabel(text, positiveLabel)
      Vector(
        Span(0, docLen, positiveLabel, pPos),
        Span(0, docLen, s"best_$label", prob))
    }
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
    TaggerRegistry.register("ft_lang_id_doc_v1")(
      new FastTextTagger("ft_lang_id_doc_v1", graft.Models.langId, "en",
        paragraphLevel = false))
    TaggerRegistry.register("ft_lang_id_en_paragraph_with_doc_score_v2")(
      new FastTextTagger("ft_lang_id_en_paragraph_with_doc_score_v2",
        graft.Models.langId, "en", paragraphLevel = true))
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
  }
}
