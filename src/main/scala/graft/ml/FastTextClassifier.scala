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
  def normalize(text: String): String = text.toLowerCase(java.util.Locale.ROOT).replace('\n', ' ')

  /** Per-thread scratch: feature buffer + hidden/probability arrays. The
    * model is broadcast and shared by every task thread in an executor, so
    * reusable state must be thread-local, not instance fields. */
  private final class Scratch {
    var feats = new Array[Int](512)
    var nFeats = 0
    val hidden = new Array[Double](dim)
    val probs = new Array[Double](labels.length)
    def add(f: Int): Unit = {
      if (nFeats == feats.length) feats = java.util.Arrays.copyOf(feats, feats.length * 2)
      feats(nFeats) = f
      nFeats += 1
    }
  }
  @transient private lazy val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** FNV-1a over the virtual padded word `<w>` window [from, from+n) where
    * index 0 is '<', 1..len are the word chars of s[ws, we), len+1 is '>'.
    * Equivalent to `hash(("<"+w+">").substring(from, from+n))` with zero
    * allocation — the n-gram substrings dominated tagger GC pressure. */
  @inline private def hashPaddedWindow(
      s: String, ws: Int, we: Int, from: Int, n: Int): Int = {
    val len = we - ws
    var h = 0x811c9dc5
    var i = from
    val end = from + n
    while (i < end) {
      val c = if (i == 0) '<' else if (i == len + 1) '>' else s.charAt(ws + i - 1)
      h ^= c
      h *= 0x01000193
      i += 1
    }
    (h & 0x7fffffff) % buckets
  }

  /** FNV-1a over s[from, to) without substring allocation. */
  @inline private def hashRange(s: String, from: Int, to: Int): Int = {
    var h = 0x811c9dc5
    var i = from
    while (i < to) {
      h ^= s.charAt(i)
      h *= 0x01000193
      i += 1
    }
    (h & 0x7fffffff) % buckets
  }

  /** Scan the normalized text word by word (pythonSplit boundaries) and
    * emit word + char-n-gram feature hashes into the scratch buffer.
    * Bit-identical feature sequence to the materializing [[features]]. */
  private def featuresInto(text: String, sc: Scratch): Unit = {
    sc.nFeats = 0
    val norm = normalize(text)
    val n0 = norm.length
    var i = 0
    var start = -1
    while (i <= n0) {
      val atWs = i == n0 || TextSplit.isPyWhitespace(norm.charAt(i))
      if (atWs) {
        if (start >= 0) {
          val ws = start; val we = i
          sc.add(hashRange(norm, ws, we))
          val paddedLen = (we - ws) + 2
          var n = minn
          while (n <= maxn) {
            var j = 0
            while (j + n <= paddedLen) {
              sc.add(hashPaddedWindow(norm, ws, we, j, n))
              j += 1
            }
            n += 1
          }
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
  }

  def features(text: String): Array[Int] = {
    val sc = scratch.get()
    featuresInto(text, sc)
    java.util.Arrays.copyOf(sc.feats, sc.nFeats)
  }

  /** Softmax distribution into the thread-local probs array, aligned with
    * [[labels]]. Returns the array (VALID UNTIL THE NEXT CALL on this
    * thread — copy if retained). */
  def predictProbaInto(text: String): Array[Double] = {
    val sc = scratch.get()
    featuresInto(text, sc)
    val hidden = sc.hidden
    java.util.Arrays.fill(hidden, 0.0)
    if (sc.nFeats > 0) {
      var k = 0
      while (k < sc.nFeats) {
        val off = sc.feats(k) * dim
        var d = 0
        while (d < dim) { hidden(d) += input(off + d); d += 1 }
        k += 1
      }
      var d = 0
      while (d < dim) { hidden(d) /= sc.nFeats; d += 1 }
    }
    val logits = sc.probs
    var l = 0
    while (l < labels.length) {
      val off = l * dim
      var s = 0.0
      var d = 0
      while (d < dim) { s += hidden(d) * output(off + d); d += 1 }
      logits(l) = s
      l += 1
    }
    var mx = logits(0)
    l = 1
    while (l < labels.length) { if (logits(l) > mx) mx = logits(l); l += 1 }
    var z = 0.0
    l = 0
    while (l < labels.length) { logits(l) = math.exp(logits(l) - mx); z += logits(l); l += 1 }
    l = 0
    while (l < labels.length) { logits(l) /= z; l += 1 }
    logits
  }

  /** Full label distribution (reference uses k=-1, language.py:164). */
  def predictProba(text: String): Array[(String, Double)] = {
    val p = predictProbaInto(text)
    Array.tabulate(labels.length)(i => (labels(i), p(i)))
  }

  def predict(text: String): (String, Double) = {
    val p = predictProbaInto(text)
    var best = 0
    var l = 1
    while (l < labels.length) { if (p(l) > p(best)) best = l; l += 1 }
    (labels(best), p(best))
  }

  /** Index of `label` in [[labels]] (-1 if absent) — pair with
    * [[predictProbaInto]] for allocation-free scoring. */
  def labelIndex(label: String): Int = labels.indexOf(label)

  /** P(label) for one specific label (the en-only variants,
    * language.py:176-196). */
  def scoreLabel(text: String, label: String): Double = {
    val i = labelIndex(label)
    if (i < 0) 0.0 else predictProbaInto(text)(i)
  }
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
