package graft

import graft.ml.HfTokenizer
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Golden parity with the reference's own tokenizer fixtures
  * (tests/python/test_tokenizer.py:22-66): the pinned llama and gpt-neo id
  * sequences for three probe strings, produced by the real HF
  * `tokenizer.json` files shipped in tests/data/tokenizer/. The reference
  * wrapper encodes with add_special_tokens=False and then applies its own
  * bos/eos insertion (tokenizer.py:248-261) — mirrored by
  * [[HfTokenizer.addSpecialTokens]].
  *
  * llama exercises the SentencePiece-style path end-to-end: Prepend/Replace
  * U+2581 normalizers, NO pre-tokenizer (whole-document char-level merge
  * arena), byte fallback (<0x0A> for newlines), bos+eos. gpt-neo exercises
  * NFC + ByteLevel GPT-2 regex pieces + eos-only.
  */
class HfTokenizerGoldenSpec extends AnyFunSuite {

  private val fixtureDir = "/root/reference/tests/data/tokenizer"
  private def fixture(name: String): Option[HfTokenizer] = {
    val p = Paths.get(fixtureDir, name)
    if (Files.exists(p)) Some(HfTokenizer.load(p.toString)) else None
  }

  // test_tokenizer.py:48-66
  private val noNewlines = "This is a document with no newlines."
  private val withNewlines = "A doc with\nnewlines.\n\nToks be the same!\n"
  private val newlineStart = "\nSimple doc with leading newline."

  test("llama fixture reproduces the reference's pinned id sequences") {
    val tok = fixture("llama-test-tokenizer.json")
    assume(tok.isDefined)
    def enc(s: String): Seq[Int] =
      tok.get.addSpecialTokens(tok.get.encode(s), bosId = Some(1), eosId = Some(2)).toSeq
    assert(enc(noNewlines) ==
      Seq(1, 910, 338, 263, 1842, 411, 694, 716, 9012, 29889, 2))
    assert(enc(withNewlines) ==
      Seq(1, 319, 1574, 411, 13, 1482, 9012, 29889, 13, 13, 29911, 12117, 367, 278, 1021, 29991, 13, 2))
    assert(enc(newlineStart) ==
      Seq(1, 29871, 13, 15427, 1574, 411, 8236, 25899, 29889, 2))
  }

  test("gpt-neo fixture reproduces the reference's pinned id sequences") {
    val tok = fixture("gpt-neo-test-tokenizer.json")
    assume(tok.isDefined)
    def enc(s: String): Seq[Int] =
      tok.get.addSpecialTokens(tok.get.encode(s), bosId = None, eosId = Some(50279)).toSeq
    assert(enc(noNewlines) ==
      Seq(1552, 310, 247, 3389, 342, 642, 747, 8737, 15, 50279))
    assert(enc(withNewlines) ==
      Seq(34, 5474, 342, 187, 1826, 8737, 15, 187, 187, 53, 24560, 320, 253, 1072, 2, 187, 50279))
    assert(enc(newlineStart) ==
      Seq(187, 21595, 5474, 342, 4283, 747, 1282, 15, 50279))
  }

  test("added tokens encode as single ids (PII masks)") {
    val tok = fixture("llama-test-tokenizer.json")
    assume(tok.isDefined)
    val ids = tok.get.encode("contact |||EMAIL_ADDRESS||| now")
    assert(ids.contains(32000))
    assert(ids.count(_ == 32000) == 1)
  }

  test("llama decode round-trips the encoded probe text") {
    val tok = fixture("llama-test-tokenizer.json")
    assume(tok.isDefined)
    assert(tok.get.decode(tok.get.encode(noNewlines).toSeq) == noNewlines)
    assert(tok.get.decode(tok.get.encode(withNewlines).toSeq) == withNewlines)
  }

  test("segment_before_tokenization == plain encoding (test_tokenizer.py:76-123)") {
    // the reference pins split == no-split on every fixture/probe pair;
    // llama exercises the prefix-space compensation (tokenizer_has_prefix
    // via its Prepend normalizer), gpt-neo the no-prefix path
    for (f <- Seq("llama-test-tokenizer.json", "gpt-neo-test-tokenizer.json");
         tok <- fixture(f); s <- Seq(noNewlines, withNewlines, newlineStart)) {
      assert(tok.encodeSegmented(s).toSeq == tok.encode(s).toSeq, s"$f on ${s.take(20)}")
    }
    assert(fixture("llama-test-tokenizer.json").forall(_.hasPrefix))
    assert(fixture("gpt-neo-test-tokenizer.json").forall(!_.hasPrefix))
  }

  test("bos/eos insertion is idempotent (tokenizer.py:255-259)") {
    val tok = fixture("gpt-neo-test-tokenizer.json")
    assume(tok.isDefined)
    val base = tok.get.encode(noNewlines)
    val once = tok.get.addSpecialTokens(base, None, Some(50279))
    val twice = tok.get.addSpecialTokens(once, None, Some(50279))
    assert(once.toSeq == twice.toSeq)
  }
}
