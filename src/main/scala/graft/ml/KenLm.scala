package graft.ml

import graft.core.TextSplit

import scala.collection.mutable

/** KenLM-style interpolated n-gram language model (re-specified from
  * Heafield 2011, "KenLM: Faster and Smaller Language Model Queries";
  * smoothing is interpolated absolute discounting after Chen & Goodman
  * 1998). Used as a perplexity quality scorer (CCNet-style): low perplexity
  * under an LM trained on clean text ⇒ in-distribution document. The
  * reference repo has no in-repo LM (its quality taggers call fastText);
  * the north rule asks for this scorer explicitly.
  *
  * Storage is hash-keyed (ngram → (log10 p, log10 backoff)) like KenLM's
  * probing hash table. The trained model is immutable — broadcast it and
  * score inside `mapPartitions`.
  */
final class KenLm(
    val order: Int,
    // index n = n-gram level (1-based); each maps ngram key → (logP, logBackoff)
    val tables: Array[Map[Long, (Float, Float)]],
    val unkLogProb: Float) extends Serializable {

  import KenLm.ngramKey

  /** log10 P(word | context) with standard back-off recursion:
    * P(w|c) = p(c·w) if known, else backoff(c) · P(w|shorter c). */
  def logProb(context: Seq[String], word: String): Double = {
    var ctx = context.takeRight(order - 1)
    var acc = 0.0
    while (true) {
      val n = ctx.length + 1
      tables(n).get(ngramKey(ctx :+ word)) match {
        case Some((lp, _)) => return acc + lp
        case None =>
          if (ctx.isEmpty) return acc + unkLogProb
          acc += tables(ctx.length).get(ngramKey(ctx)).map(_._2.toDouble).getOrElse(0.0)
          ctx = ctx.drop(1)
      }
    }
    acc + unkLogProb // unreachable
  }

  /** Average per-token log10 probability. */
  def scoreTokens(tokens: Seq[String]): Double = {
    if (tokens.isEmpty) return 0.0
    var ctx = List.empty[String]
    var total = 0.0
    tokens.foreach { t =>
      total += logProb(ctx, t)
      ctx = (ctx :+ t).takeRight(order - 1)
    }
    total / tokens.length
  }

  /** Perplexity = 10^(−avg log10 p). */
  def perplexity(text: String): Double = {
    val tokens = KenLm.tokenize(text)
    if (tokens.isEmpty) return Double.PositiveInfinity
    math.pow(10.0, -scoreTokens(tokens))
  }
}

object KenLm {

  def tokenize(text: String): Seq[String] =
    TextSplit.pythonSplit(text.toLowerCase(java.util.Locale.ROOT)).toSeq

  /** Stable 64-bit ngram key (FNV-1a over words, separator-framed). */
  def ngramKey(ngram: Seq[String]): Long = {
    var h = 0xcbf29ce484222325L
    ngram.foreach { w =>
      var i = 0
      while (i < w.length) { h ^= w.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      h ^= 0x1fL
      h *= 0x100000001b3L
    }
    h
  }

  /** Deterministic single-pass training with interpolated absolute
    * discounting: p(w|c) = max(c(cw)−D,0)/c(c) + λ(c)·p(w|c′), backoff
    * weight of an unseen extension = λ(c) = D·N1+(c)/c(c). */
  def train(corpus: Seq[String], order: Int = 3, discount: Double = 0.75): KenLm = {
    require(order >= 1)
    val counts = Array.fill(order + 1)(mutable.HashMap.empty[Long, Long])
    val ctxTotals = Array.fill(order + 1)(mutable.HashMap.empty[Long, Long])
    val ctxDistinct = Array.fill(order + 1)(mutable.HashMap.empty[Long, Long])
    // remember one witness decomposition per ngram key: (context key,
    // suffix key) so probabilities chain without storing strings
    val witness = Array.fill(order + 1)(mutable.HashMap.empty[Long, (Long, Long)])

    corpus.foreach { doc =>
      val tokens = tokenize(doc)
      var n = 1
      while (n <= order) {
        var i = 0
        while (i + n <= tokens.length) {
          val ngram = tokens.slice(i, i + n)
          val key = ngramKey(ngram)
          val c0 = counts(n).getOrElse(key, 0L)
          counts(n).update(key, c0 + 1)
          val ctxKey = ngramKey(ngram.dropRight(1))
          ctxTotals(n).update(ctxKey, ctxTotals(n).getOrElse(ctxKey, 0L) + 1)
          if (c0 == 0L) {
            ctxDistinct(n).update(ctxKey, ctxDistinct(n).getOrElse(ctxKey, 0L) + 1)
            witness(n).update(key, (ctxKey, ngramKey(ngram.drop(1))))
          }
          i += 1
        }
        n += 1
      }
    }

    val vocab = counts(1).size.toDouble.max(1.0)
    val uniTotal = ctxTotals(1).getOrElse(ngramKey(Nil), 1L).toDouble
    val ln10 = math.log(10)

    def backoffOf(n: Int, key: Long): Double =
      if (n >= order) 1.0
      else {
        val tot = ctxTotals(n + 1).getOrElse(key, 0L).toDouble
        val dis = ctxDistinct(n + 1).getOrElse(key, 0L).toDouble
        if (tot > 0) discount * dis / tot else 1.0
      }

    val probs = Array.fill(order + 1)(mutable.HashMap.empty[Long, (Float, Float)])
    // unigrams: add-one smoothing reserves unk mass
    counts(1).foreach { case (key, c) =>
      val p = (c + 1.0) / (uniTotal + vocab + 1.0)
      probs(1).update(key,
        ((math.log(p) / ln10).toFloat, (math.log(math.max(backoffOf(1, key), 1e-12)) / ln10).toFloat))
    }
    var n = 2
    while (n <= order) {
      counts(n).foreach { case (key, c) =>
        val (ctxKey, sufKey) = witness(n)(key)
        val tot = ctxTotals(n)(ctxKey).toDouble
        val pDisc = math.max(c - discount, 0.0) / tot
        val lambda = discount * ctxDistinct(n)(ctxKey).toDouble / tot
        val lower = probs(n - 1).get(sufKey)
          .map(t => math.pow(10.0, t._1.toDouble))
          .getOrElse(1.0 / (uniTotal + vocab + 1.0))
        val p = pDisc + lambda * lower
        probs(n).update(key,
          ((math.log(p) / ln10).toFloat, (math.log(math.max(backoffOf(n, key), 1e-12)) / ln10).toFloat))
      }
      n += 1
    }

    val unk = (math.log(1.0 / (uniTotal + vocab + 1.0)) / ln10).toFloat
    new KenLm(order, probs.map(_.toMap), unk)
  }
}
