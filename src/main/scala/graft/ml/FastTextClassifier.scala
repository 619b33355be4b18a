package graft.ml

import graft.core.TextSplit

import scala.collection.mutable

/** fastText-style linear text classifier, re-implemented from the public
  * fastText model description (Joulin et al. 2016, "Bag of Tricks for
  * Efficient Text Classification"): character n-gram + word features hashed
  * into a fixed bucket table, averaged into a hidden vector, linear softmax
  * over labels. This is the inference engine standing in for the
  * reference's fastText taggers (language ID `ft_lang_id_*`,
  * /root/reference/python/dolma/taggers/language.py:149-196; jigsaw
  * toxicity jigsaw.py:16-45; dclm/dolma17 quality quality.py:18-68) — the
  * pretrained .bin files are not redistributable, so models are trained
  * in-repo on synthesized corpora (training surface mirrors
  * core/ft_tagger.py:39-120).
  *
  * The model is immutable after training: broadcast it and run inference
  * inside `mapPartitions` (weights shared per executor, zero per-row
  * allocation beyond the feature buffer).
  */
final class FastTextClassifier(
    val labels: Array[String],
    val dim: Int,
    val buckets: Int,
    val input: Array[Float],   // buckets x dim (hashed feature embeddings)
    val output: Array[Float],  // labels x dim (softmax layer)
    val minn: Int,
    val maxn: Int) extends Serializable {

  /** Reference preprocessing: `text.lower().replace("\n", " ")`
    * (language.py:159). */
  def normalize(text: String): String = text.toLowerCase.replace('\n', ' ')

  def features(text: String): Array[Int] = {
    val buf = mutable.ArrayBuffer.empty[Int]
    val words = TextSplit.pythonSplit(normalize(text))
    words.foreach { w =>
      buf += FastTextClassifier.hash(w, buckets)
      // char n-grams over "<w>" like fastText's subword features
      val padded = "<" + w + ">"
      var n = minn
      while (n <= maxn) {
        var i = 0
        while (i + n <= padded.length) {
          buf += FastTextClassifier.hash(padded.substring(i, i + n), buckets)
          i += 1
        }
        n += 1
      }
    }
    buf.toArray
  }

  /** Full label distribution (reference uses k=-1, language.py:164). */
  def predictProba(text: String): Array[(String, Double)] = {
    val feats = features(text)
    val hidden = new Array[Double](dim)
    if (feats.nonEmpty) {
      feats.foreach { f =>
        val off = f * dim
        var d = 0
        while (d < dim) { hidden(d) += input(off + d); d += 1 }
      }
      var d = 0
      while (d < dim) { hidden(d) /= feats.length; d += 1 }
    }
    val logits = new Array[Double](labels.length)
    var l = 0
    while (l < labels.length) {
      val off = l * dim
      var s = 0.0
      var d = 0
      while (d < dim) { s += hidden(d) * output(off + d); d += 1 }
      logits(l) = s
      l += 1
    }
    val mx = logits.max
    val exps = logits.map(x => math.exp(x - mx))
    val z = exps.sum
    labels.zip(exps.map(_ / z))
  }

  def predict(text: String): (String, Double) = {
    val p = predictProba(text)
    p.maxBy(_._2)
  }

  /** P(label) for one specific label (the en-only variants,
    * language.py:176-196). */
  def scoreLabel(text: String, label: String): Double =
    predictProba(text).collectFirst { case (l, p) if l == label => p }.getOrElse(0.0)
}

object FastTextClassifier {

  /** FNV-1a over UTF-8-ish chars, mod buckets (fastText's hashing trick). */
  def hash(s: String, buckets: Int): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x01000193
      i += 1
    }
    (h & 0x7fffffff) % buckets
  }

  /** Deterministic single-threaded SGD training (fixed seed, fixed example
    * order): enough to separate synthetic language/quality distributions in
    * tests; the architecture — not pretrained weights — is the deliverable.
    */
  def train(
      examples: Seq[(String, String)], // (label, text)
      dim: Int = 16,
      buckets: Int = 1 << 15,
      epochs: Int = 5,
      lr: Double = 0.5,
      minn: Int = 2,
      maxn: Int = 4,
      seed: Long = 42L): FastTextClassifier = {
    val labels = examples.map(_._1).distinct.sorted.toArray
    val labelIdx = labels.zipWithIndex.toMap
    val rng = new scala.util.Random(seed)
    val input = Array.fill(buckets * dim)(((rng.nextDouble() * 2 - 1) / dim).toFloat)
    val output = Array.fill(labels.length * dim)(0.0f)
    val model = new FastTextClassifier(labels, dim, buckets, input, output, minn, maxn)

    val feats = examples.map { case (label, text) => (labelIdx(label), model.features(text)) }
    var epoch = 0
    var step = 0
    val total = epochs * feats.size
    while (epoch < epochs) {
      feats.foreach { case (y, fs) =>
        if (fs.nonEmpty) {
          val rate = lr * (1.0 - step.toDouble / total)
          // forward
          val hidden = new Array[Double](dim)
          fs.foreach { f =>
            val off = f * dim
            var d = 0
            while (d < dim) { hidden(d) += input(off + d); d += 1 }
          }
          var d = 0
          while (d < dim) { hidden(d) /= fs.length; d += 1 }
          val logits = new Array[Double](labels.length)
          var l = 0
          while (l < labels.length) {
            var s = 0.0
            d = 0
            while (d < dim) { s += hidden(d) * output(l * dim + d); d += 1 }
            logits(l) = s
            l += 1
          }
          val mx = logits.max
          val exps = logits.map(x => math.exp(x - mx))
          val z = exps.sum
          // backward: grad wrt hidden accumulates over labels
          val gradHidden = new Array[Double](dim)
          l = 0
          while (l < labels.length) {
            val p = exps(l) / z
            val g = rate * ((if (l == y) 1.0 else 0.0) - p)
            d = 0
            while (d < dim) {
              gradHidden(d) += g * output(l * dim + d)
              output(l * dim + d) = (output(l * dim + d) + g * hidden(d)).toFloat
              d += 1
            }
            l += 1
          }
          val scale = 1.0 / fs.length
          fs.foreach { f =>
            val off = f * dim
            d = 0
            while (d < dim) {
              input(off + d) = (input(off + d) + gradHidden(d) * scale).toFloat
              d += 1
            }
          }
        }
        step += 1
      }
      epoch += 1
    }
    model
  }
}
