package graft

import graft.ml.{FastTextClassifier, KenLm}

import org.scalatest.funsuite.AnyFunSuite

class MlSpec extends AnyFunSuite {

  test("fastText: separates synthetic languages; deterministic; probs clamp") {
    val model = Models.langId
    assert(model.predict("the data stream with that value")._1 == "en")
    assert(model.predict("der wert und die daten nicht mit")._1 == "de")
    assert(model.predict("le flux et la valeur pour des")._1 == "fr")
    assert(model.predict("el valor los datos por con para")._1 == "es")
    val p = model.predictProba("the and with that")
    assert(math.abs(p.map(_._2).sum - 1.0) < 1e-9)
    assert(p.forall { case (_, prob) => prob >= 0.0 && prob <= 1.0 })
    // determinism: retraining with same seed gives identical weights
    val again = Models.langId
    assert(again.predict("the data stream with that value") ==
      model.predict("the data stream with that value"))
  }

  test("fastText: scoreLabel returns the distribution entry") {
    val model = Models.langId
    val full = model.predictProba("the and with").toMap
    assert(model.scoreLabel("the and with", "en") == full("en"))
  }

  test("fastText taggers: toxicity paragraph spans + doc rollup") {
    val t = graft.taggers.TaggerRegistry.resolve("jigsaw_toxicity_paragraph_v1")
    val text = "data value stream merge kind helpful\nhate stupid idiot trash garbage awful\n"
    val spans = t.predict(text)
    val paras = spans.filter(_.typ == "toxic")
    assert(paras.length == 2)
    assert(paras(1).score > 0.9) // toxic paragraph
    assert(paras(0).score < 0.5) // clean paragraph
    val doc = spans.find(_.typ == "doc_toxic").get
    assert(doc.score > 0.0 && doc.score < 1.0)
  }

  test("KenLM: in-distribution code scores lower perplexity than shuffled") {
    val lm = Models.codeLm
    val clean = graft.sources.CodeDocs.makeDoc(300L, 1234L, 400L).content
    val tokens = KenLm.tokenize(clean)
    val rng = new scala.util.Random(9L)
    val shuffled = rng.shuffle(tokens).mkString(" ")
    val pClean = lm.perplexity(clean)
    val pShuffled = lm.perplexity(shuffled)
    assert(pClean < pShuffled, s"clean=$pClean shuffled=$pShuffled")
    // garbage out-of-vocab text is much worse
    val garbage = (1 to 50).map(i => s"zzqx$i").mkString(" ")
    assert(lm.perplexity(garbage) > pClean * 10)
  }

  test("KenLM: probabilities are normalized-ish (sum over seen vocab < 1)") {
    val lm = KenLm.train(Seq("a b c a b c a b d"), order = 2)
    val pb = math.pow(10.0, lm.logProb(Seq("a"), "b"))
    val pc = math.pow(10.0, lm.logProb(Seq("a"), "c"))
    val pd = math.pow(10.0, lm.logProb(Seq("a"), "d"))
    assert(pb > pd) // a→b seen twice, a→d never
    assert(pb + pc + pd < 1.0 + 1e-9)
    assert(lm.perplexity("") == Double.PositiveInfinity)
  }
}
