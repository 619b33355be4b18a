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

  test("BaseLanguageTagger semantics: all-langs, negatives, en-filter, rollup (language.py:37-71)") {
    val reg = graft.taggers.TaggerRegistry
    val en = "the data stream with that value from this"
    // doc_v1: one span per language, descending probability, no negatives
    val allSpans = reg.resolve("ft_lang_id_doc_v1").predict(en)
    assert(allSpans.length == 5)
    assert(allSpans.map(_.score) == allSpans.map(_.score).sortBy(-_))
    assert(allSpans.head.typ == "en")
    assert(!allSpans.exists(_.typ.startsWith("not_")))
    // 1e2: raw scores <= 0.01 dropped FIRST, survivors then rounded to 2
    // decimals (language.py:163-168 — a survivor may round down to 0.01)
    val min = reg.resolve("ft_lang_id_1e2").predict(en)
    assert(min.nonEmpty && min.length < 5)
    assert(min.head.typ == "en" && min.head.score > 0.9)
    assert(min.forall(s => s.score == graft.core.Attributes.roundScore(s.score, 2)))
    // en_doc_v2: en + not_en pair
    val enDoc = reg.resolve("ft_lang_id_en_doc_v2").predict(en)
    assert(enDoc.map(_.typ).sorted == Vector("en", "not_en"))
    assert(math.abs(enDoc.map(_.score).sum - 1.0) < 1e-9)
    // en filter fallback: non-matching text still yields ("en", score)
    val zh = reg.resolve("ft_lang_id_en_only_v2").predict("\u7684 \u662f \u4e86 \u5728")
    assert(zh.map(_.typ) == Vector("en"))
    // with_doc_score: paragraph spans + doc_en/doc_not_en rollup
    val two = "the data stream with that value\n\nder wert und die daten nicht"
    val rolled = reg.resolve("ft_lang_id_en_paragraph_with_doc_score_v2").predict(two)
    val docEn = rolled.find(_.typ == "doc_en").get.score
    val docNotEn = rolled.find(_.typ == "doc_not_en").get.score
    assert(docEn > 0.0 && docEn < 1.0 && math.abs(docEn + docNotEn - 1.0) < 1e-9)
    assert(rolled.count(_.typ == "en") == 2) // one per paragraph
    // empty doc: ZeroDivisionError branch -> both rollups 0.0
    val empty = reg.resolve("ft_lang_id_en_paragraph_with_doc_score_v2").predict("")
    assert(empty.filter(_.typ.startsWith("doc_")).forall(_.score == 0.0))
  }

  test("dclm/dolma17 quality taggers: pre-norm + label flattening (quality.py:18-68)") {
    val reg = graft.taggers.TaggerRegistry
    val hqText = "the history of science\nshows that careful analysis\nreveals structure"
    val lqText = "zxqv qwpvk jzxmw pqynd kkwfj zzzyx"
    val d1 = reg.resolve("dclm-oh-eli5").predict(hqText)
    assert(d1.map(_.typ) == Vector("score"))
    val hqScore = d1.head.score
    val lqScore = reg.resolve("dclm-oh-eli5").predict(lqText).head.score
    // "score" is always P(high-quality): flipped when argmax is negative
    assert(hqScore > 0.5 && lqScore < 0.5)
    val d17 = reg.resolve("dolma17-quality").predict(hqText)
    assert(d17.map(_.typ).sorted == Vector("hq", "lq"))
    assert(d17.map(_.score) == d17.map(_.score).sortBy(-_))
  }

  test("BPE: byte-level roundtrip is the identity on arbitrary strings") {
    val bpe = graft.ml.Bpe.train(Seq(
      "the quick brown fox jumps over the lazy dog",
      "the lazy dog sleeps while the quick fox runs",
      "pack my box with five dozen liquor jugs"), numMerges = 64)
    val cases = Seq(
      "", "the quick fox", "UNSEEN tokens!! 123",
      "unicode: héllo wörld — ok",
      "emoji 😀 and surrogates 🎉",
      "line\nbreaks\r\nand\ttabs", "   leading spaces", "trailing   ")
    cases.foreach { s =>
      assert(bpe.decode(bpe.encode(s).toSeq) == s, s"roundtrip failed for '$s'")
    }
  }

  test("BPE: deterministic training, real compression on frequent words") {
    val corpus = Seq.fill(20)("the quick brown fox the quick brown fox")
    val a = graft.ml.Bpe.train(corpus, numMerges = 32)
    val b = graft.ml.Bpe.train(corpus, numMerges = 32)
    assert(a.merges == b.merges)
    assert(a.vocabSize > 256) // merges actually learned
    // a frequent training word encodes to far fewer tokens than bytes
    val ids = a.encode(" quick")
    assert(ids.length < " quick".getBytes("UTF-8").length)
    // every vocab entry decodes to the bytes it was built from
    assert(new String(a.vocabBytes(97), "UTF-8") == "a")
    // pretokenize is exhaustive (pieces concatenate back)
    val t = "  a bb   ccc "
    assert(graft.ml.Bpe.pretokenize(t).mkString == t)
  }

  test("BPE: merge loop honors rank order (earliest merge wins)") {
    // corpus where "ab" merges before "bc": "ab" appears more often
    val bpe = graft.ml.Bpe.train(Seq("ababab abc abc"), numMerges = 8)
    val abId = bpe.merges.get(('a'.toInt, 'b'.toInt))
    assert(abId.isDefined)
    // "abc": the ab merge (lower id) applies before any bc merge could
    val ids = bpe.encode("abc")
    assert(ids.head == abId.get)
  }

  test("BPE: distributed trainer learns the exact merges of the driver trainer") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val corpus = Seq(
      "def load(path): return open(path).read()",
      "for i in range(10): print(i, i * 2)",
      "def save(path, data): open(path, 'w').write(data)",
      "the quick brown fox jumps over the lazy dog")
    val local = graft.ml.Bpe.train(corpus, numMerges = 24)
    val dist = graft.ml.Bpe.trainDistributed(corpus.toDS(), numMerges = 24,
      checkpointEvery = 8)
    assert(dist.merges == local.merges)
    assert(dist.vocabSize == local.vocabSize)
    (0 until local.vocabSize).foreach(i =>
      assert(dist.vocabBytes(i).toSeq == local.vocabBytes(i).toSeq))
    val s = "def f(path): return path"
    assert(dist.encode(s).toSeq == local.encode(s).toSeq)
  }

  test("HfTokenizer: export->load reproduces the exact id sequences") {
    val bpe = graft.ml.Bpe.train(Seq(
      "def load(path): return open(path).read()",
      "for i in range(10): print(i, i * 2)",
      "the quick brown fox jumps over the lazy dog"), numMerges = 96)
    val loaded = graft.ml.HfTokenizer.parse(graft.ml.HfTokenizer.fromBpe(bpe))
    val cases = Seq(
      "", "def f(x): return x", "UNSEEN!! 123 tokens",
      "unicode: héllo wörld — ok", "emoji 😀 ok",
      "line\nbreaks\tand   spaces ")
    cases.foreach { s =>
      assert(loaded.encode(s).toSeq == bpe.encode(s).toSeq,
        s"id sequences diverge for '$s'")
      assert(loaded.decode(loaded.encode(s).toIndexedSeq) == s)
    }
    assert(loaded.vocabSize == bpe.vocabSize)
  }

  test("HfTokenizer: merges accepted as pair-arrays too; ranks honored") {
    // hand-written tiny vocab over bytes a,b,c + merges ab, then ab+c
    val ab = graft.ml.HfTokenizer.parse(
      """{"model":{"type":"BPE",
        |  "vocab":{"a":0,"b":1,"c":2,"ab":3,"abc":4},
        |  "merges":[["a","b"],["ab","c"]]}}""".stripMargin)
    assert(ab.encode("abc").toSeq == Seq(4))
    assert(ab.encode("ab").toSeq == Seq(3))
    assert(ab.encode("acb").toSeq == Seq(0, 2, 1))
    assert(ab.decode(Seq(4, 3, 0)) == "abcaba")
    // same vocab, string merges, REVERSED rank order: "ab" learned second
    // means "abc" still resolves via ab+c only if ab applies first; with
    // ranks flipped the (ab,c) merge can never fire before (a,b)
    val ba = graft.ml.HfTokenizer.parse(
      """{"model":{"type":"BPE",
        |  "vocab":{"a":0,"b":1,"c":2,"ab":3,"abc":4},
        |  "merges":["ab c","a b"]}}""".stripMargin)
    assert(ba.encode("abc").toSeq == Seq(4)) // a b -> ab (rank 1), ab c -> abc (rank 0)
  }

  test("HfTokenizer: ByteLevel add_prefix_space=true is actually applied") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(graft.ml.HfTokenizer.trivialByteVocabJson(identity))
    node.get("pre_tokenizer")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("add_prefix_space", true)
    val tok = graft.ml.HfTokenizer.parse(node.toString)
    // trivial byte vocab: one token per byte, so the prefix space adds one
    assert(tok.encode("ab").length == 3)
    assert(tok.encode("ab").head == ' '.toInt)
    assert(tok.encode(" ab").length == 3) // already prefixed: not doubled
    // segmented equality must survive the prefix (the sacrificial-space
    // merge trick in encodeSegmented)
    val text = "alpha\nbeta\n\ngamma"
    assert(tok.encodeSegmented(text).toSeq == tok.encode(text).toSeq)
    // without the flag, no phantom space
    val plain = graft.ml.HfTokenizer.parse(
      graft.ml.HfTokenizer.trivialByteVocabJson(identity))
    assert(plain.encode("ab").length == 2)
  }

  test("HfTokenizer: unsupported pre_tokenizer types are rejected loudly") {
    val ex = intercept[IllegalArgumentException] {
      graft.ml.HfTokenizer.parse(
        """{"pre_tokenizer":{"type":"Metaspace"},
          |"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""".stripMargin)
    }
    assert(ex.getMessage.contains("Metaspace"))
  }

  test("HfTokenizer: 100k-char single-piece documents encode without O(n^2) stall") {
    // doubling-chain merges: 'a'*2^k tokens up to 2^17, so a long letter
    // run exercises real merge depth inside ONE GPT-2 piece — the shape
    // (ASCII art, separators, gibberish) that stalled the rescan loop
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(graft.ml.HfTokenizer.trivialByteVocabJson(identity))
    val model = node.get("model")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val vocab = model.get("vocab")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val merges = model.putArray("merges")
    var tokLen = 1
    var id = 256
    while (tokLen < (1 << 15)) { // Jackson caps JSON names at 50k chars
      val t = "a" * tokLen
      merges.add(s"$t $t")
      vocab.put(t * 2, id)
      id += 1; tokLen *= 2
    }
    val tok = graft.ml.HfTokenizer.parse(node.toString)
    val t0 = System.nanoTime()
    val n = 100000
    val ids = tok.encode("a" * n)
    val secs = (System.nanoTime() - t0) / 1e9
    // greedy doubling leaves one leftover per set bit below the max token
    // size, plus the full 2^15 blocks (no merge rule above them)
    assert(ids.length == (n >> 15) + Integer.bitCount(n & 32767))
    assert(secs < 20.0, s"merge loop took ${secs}s — quadratic regression")
  }

  test("HfTokenizer: merge-less shuffled byte vocab counts bytes; ids permuted") {
    val json = graft.ml.HfTokenizer.trivialByteVocabJson(b => (167 * b + 13) % 256)
    val tok = graft.ml.HfTokenizer.parse(json)
    val s = "hi there 😀"
    assert(tok.countTokens(s) == s.getBytes("UTF-8").length)
    assert(tok.decode(tok.encode(s).toIndexedSeq) == s)
    // 'h' = 0x68 -> id (167*0x68+13) mod 256
    assert(tok.encode("h").head == (167 * 0x68 + 13) % 256)
  }

  test("dolma_v1/v2_tokenizer taggers bind to $GRAFT_VOCAB_DIR vocab files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vocab-spec")
    val bpe = graft.ml.Bpe.train(
      Seq("count these tokens count these tokens"), numMerges = 16)
    val json = graft.ml.HfTokenizer.fromBpe(bpe)
    Seq("dolma_v1_tokenizer", "dolma_v2_tokenizer").foreach { n =>
      java.nio.file.Files.write(dir.resolve(s"$n.json"), json.getBytes("UTF-8"))
    }
    val prev = sys.props.get("GRAFT_VOCAB_DIR")
    sys.props("GRAFT_VOCAB_DIR") = dir.toString
    try {
      Seq("dolma_v1_tokenizer", "dolma_v2_tokenizer").foreach { n =>
        val t = graft.taggers.TaggerRegistry.resolve(n)
        // reference semantics (length.py:172-175): strip first, 0 if blank
        val spans = t.predict("  count these tokens  ")
        assert(spans.length == 1 && spans.head.typ == "length")
        assert(spans.head.score ==
          bpe.encode("count these tokens").length.toDouble)
        assert(t.predict("   ").head.score == 0.0)
        assert(t.predict("").head.score == 0.0)
      }
    } finally {
      prev match {
        case Some(v) => sys.props("GRAFT_VOCAB_DIR") = v
        case None => sys.props.remove("GRAFT_VOCAB_DIR")
      }
    }
  }

  test("dolma tokenizer taggers fail with the vocab convention when unconfigured") {
    val prevD = sys.props.get("GRAFT_VOCAB_DIR")
    val prevF = sys.props.get("GRAFT_VOCAB_FILE")
    sys.props.remove("GRAFT_VOCAB_DIR"); sys.props.remove("GRAFT_VOCAB_FILE")
    try {
      if (!sys.env.contains("GRAFT_VOCAB_DIR") && !sys.env.contains("GRAFT_VOCAB_FILE")) {
        val e = intercept[IllegalStateException] {
          graft.taggers.TaggerRegistry.resolve("dolma_v1_tokenizer")
            .predict("some text")
        }
        assert(e.getMessage.contains("GRAFT_VOCAB_DIR"))
        assert(e.getMessage.contains("tokenizer.json"))
      }
    } finally {
      prevD.foreach(sys.props("GRAFT_VOCAB_DIR") = _)
      prevF.foreach(sys.props("GRAFT_VOCAB_FILE") = _)
    }
  }
}
