package graft

import graft.taggers.C4Tagger

import org.scalatest.funsuite.AnyFunSuite

/** Vectors transcribed from /root/reference/tests/python/test_c4.py
  * (naughty words swapped for this engine's built-in stand-in list — the
  * reference loads a wordlist file we don't vendor). */
class C4Spec extends AnyFunSuite {

  private def tagger(fast: Boolean) =
    new C4Tagger(fast, Set("viagra"), Seq("strap on"))

  for ((label, fast) <- Seq(("c4_v1", false), ("c4_v2", true))) {

    test(s"$label: curly brace doc span (test_c4.py:20-30)") {
      assert(!tagger(fast).predict("This is a test.").exists(_.typ == "has_curly_brace"))
      val spans = tagger(fast).predict("This is a test {").filter(_.typ == "has_curly_brace")
      assert(spans.map(s => (s.start, s.end)) == Vector((0L, 16L)))
    }

    test(s"$label: lorem ipsum at doc level (test_c4.py:44-56)") {
      val spans = tagger(fast).predict("This is a lorem ipsum test\nmore test.")
        .filter(_.typ == "has_lorem_ipsum")
      assert(spans.map(s => (s.start, s.end)) == Vector((0L, 37L)))
    }

    test(s"$label: lines with no ending punctuation (test_c4.py:58-74)") {
      val text = "This is a test.\nIt has more;\nA trailing space! \nShould be good on this one.\nThis one is bad\n"
      val spans = tagger(fast).predict(text).filter(_.typ == "lines_with_no_ending_punctuation")
      assert(spans.map(s => (s.start, s.end)) ==
        Vector((16L, 29L), (76L, 92L), (92L, 92L)))
    }

    test(s"$label: lines with too few words (test_c4.py:76-90)") {
      val text = "Short!\nThis short.\nBarely above the limit!\nthis is last frontier."
      val spans = tagger(fast).predict(text).filter(_.typ == "lines_with_too_few_words")
      assert(spans.map(s => (s.start, s.end)) == Vector((0L, 7L), (7L, 19L)))
    }

    test(s"$label: naughty word/phrase semantics (test_c4.py:92-118)") {
      val t = tagger(fast)
      assert(!t.predict("This sentence has no bad words.").exists(_.typ == "has_naughty_word"))
      assert(t.predict("This sentence mentions viagra as a bad word.")
        .exists(_.typ == "has_naughty_word"))
      // word-level: trailing comma means no word match
      assert(!t.predict("This sentence has viagra, but not a bad word because of comma.")
        .exists(_.typ == "has_naughty_word"))
      // phrase-level: substring match
      assert(t.predict("If I say strap on because we are on a plane, it's still a bad word.")
        .exists(_.typ == "has_naughty_word"))
    }
  }

  test("line_count counts newline-split lines") {
    val spans = tagger(fast = true).predict("a\nb\nc")
    assert(spans.find(_.typ == "line_count").get.score == 3.0)
  }

  test("default blocklist IS the reference's naughty_words_en.txt") {
    // 403 entries: 279 single words (word-level) + 124 phrases (substring)
    assert(C4Tagger.DefaultNaughtyWords.size == 279)
    assert(C4Tagger.DefaultNaughtyPhrases.size == 124)
    assert(C4Tagger.DefaultNaughtyWords.contains("anus"))
    assert(C4Tagger.DefaultNaughtyPhrases.contains("2 girls 1 cup"))

    for (fast <- Seq(true, false)) {
      val t = new C4Tagger(fast,
        C4Tagger.DefaultNaughtyWords, C4Tagger.DefaultNaughtyPhrases)
      def hit(s: String) = t.predict(s).exists(_.typ == "has_naughty_word")
      assert(!hit("Nothing objectionable in this sentence at all."))
      // real multi-word phrase, substring + case-insensitive
      assert(hit("They referenced an Alabama Hot Pocket on the show."))
      // real single word at word level
      assert(hit("discussing the anus in a clinical context"))
      // word-level means trailing punctuation blocks a single-word match
      assert(!hit("discussing the anus, in a clinical context"))
      // a phrase fragment alone is not a hit ("hot" / "pocket" aren't words
      // in the list, and no full phrase is present)
      assert(!hit("a hot pocket snack is fine"))
    }
  }
}
