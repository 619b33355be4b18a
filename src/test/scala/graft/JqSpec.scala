package graft

import graft.mixer.Jq
import graft.mixer.Jq._

import org.scalatest.funsuite.AnyFunSuite

/** jq-fallback vectors transcribed from the reference's own inline tests
  * (/root/reference/src/filters.rs:483-682), including the real dolma-1.7
  * predicates. */
class JqSpec extends AnyFunSuite {

  private def filterOf(inc: Seq[String], exc: Seq[String]) =
    new Jq.DocFilter(inc, exc)

  test("should_keep / should_remove: string equality + bare-path truthiness (filters.rs:489-520)") {
    val doc = parseJson("""{"attributes": {"foo": "bar", "baz": "qux"}}""")
    assert(filterOf(Seq(".attributes.foo"), Seq(""".attributes.baz == "quac"""")).shouldKeep(doc))
    assert(!filterOf(Seq(".attributes.foo"), Seq(""".attributes.baz == "qux"""")).shouldKeep(doc))
  }

  test("aggregate filters: length / add pipes (filters.rs:522-538, 592-617)") {
    val doc = parseJson("""{"attributes": {"foo": [1.0, 2.0, 3.0], "baz": [4.0, 5.0]}}""")
    assert(filterOf(Seq(".attributes.foo | length >= 3"), Nil).shouldKeep(doc))
    assert(filterOf(Seq(".attributes.foo | add >= 6"), Nil).shouldKeep(doc))
    assert(!filterOf(Seq(".attributes.foo | add >= 7"), Nil).shouldKeep(doc))
  }

  test("allow-all: empty config keeps everything (filters.rs:540-550)") {
    val doc = parseJson("""{"attributes": {"foo": [1.0]}}""")
    assert(filterOf(Nil, Nil).shouldKeep(doc))
  }

  test("unknown function is a compile error (filters.rs:618-628)") {
    intercept[Jq.JqError](Jq.compile(".x | sum"))
  }

  test("the real dolma-1.7 multi-condition predicates (filters.rs:631-663)") {
    val f = filterOf(
      Seq("(.attributes.dedupe_para_ngrams_13_1 | length == 0) or " +
        "((.attributes.dedupe_para_ngrams_13_1 | map(.[2] * (.[1] - .[0])) | add) / (.text | length) <= 0.3)"),
      Seq(
        ".attributes.paloma_documents != null",
        "(.attributes.paloma_paragraphs | length) > 0",
        "(.tokenizer_repetitions_v2r2__tokenizer_repetitions_v2r2__doc_max_score_repetition != null) and " +
          "(.tokenizer_repetitions_v2r2__tokenizer_repetitions_v2r2__doc_max_score_repetition[0][-1] > 10)",
        ".attributes.cc_multi_bin__cc_multi_bin__hq[0][-1] <= 0.01",
        ".attributes.pii_regex_with_counts_fast_v2__pii_regex_with_counts_fast_v2__doc_count[0][-1] > 5"))
    val doc = parseJson(
      """{"text": "x", "attributes": {
        |  "cc_multi_bin__cc_multi_bin__lq": [[0, 1533, 0.99438]],
        |  "cc_multi_bin__cc_multi_bin__hq": [[0, 1533, 0.00564]],
        |  "dedupe_para_ngrams_13_1": [],
        |  "paloma_paragraphs": [],
        |  "pii_regex_with_counts_fast_v2__pii_regex_with_counts_fast_v2__doc_count": [[0, 1533, 0.0]],
        |  "tokenizer_repetitions_v2r2__tokenizer_repetitions_v2r2__doc_max_score_repetition": [[0, 1533, 10.0]]
        |}}""".stripMargin)
    // dropped: the hq filter fires (0.00564 <= 0.01)
    assert(!f.shouldKeep(doc))
    // flip hq above the threshold: every exclude goes quiet and the
    // include's empty-dedupe branch keeps the doc
    val doc2 = parseJson(
      """{"text": "x", "attributes": {
        |  "cc_multi_bin__cc_multi_bin__hq": [[0, 1533, 0.5]],
        |  "dedupe_para_ngrams_13_1": [],
        |  "paloma_paragraphs": [],
        |  "pii_regex_with_counts_fast_v2__pii_regex_with_counts_fast_v2__doc_count": [[0, 1533, 0.0]],
        |  "tokenizer_repetitions_v2r2__tokenizer_repetitions_v2r2__doc_max_score_repetition": [[0, 1533, 10.0]]
        |}}""".stripMargin)
    assert(f.shouldKeep(doc2))
    // the dedupe-fraction arithmetic branch of the include
    val doc3 = parseJson(
      """{"text": "0123456789", "attributes": {
        |  "dedupe_para_ngrams_13_1": [[0, 8, 1.0]],
        |  "paloma_paragraphs": [],
        |  "cc_multi_bin__cc_multi_bin__hq": [[0, 10, 0.5]],
        |  "pii_regex_with_counts_fast_v2__pii_regex_with_counts_fast_v2__doc_count": [[0, 10, 0.0]]
        |}}""".stripMargin)
    // (1.0 * 8) / 10 = 0.8 > 0.3 -> include false -> dropped
    assert(!f.shouldKeep(doc3))
  }

  test("missing-attribute path errors like jaq (filters.rs:666-682)") {
    val f = filterOf(Seq(".attributes.b.b != null"), Nil)
    val doc = parseJson(
      """{"text": "test", "id": "0", "attributes": {"a": [[0, 3, 1]]}, "source": "test"}""")
    intercept[Jq.JqError](f.shouldKeep(doc))
  }

  test("number literals: signed exponents parse; malformed numbers are JqError") {
    val doc = parseJson("""{"attributes": {"q": [[0, 3, 0.5]]}}""")
    // 1e-4 / 2.5E+1 previously threw raw NumberFormatException mid-scan
    assert(filterOf(Seq(".attributes.q[0][2] > 1e-4"), Nil).shouldKeep(doc))
    assert(!filterOf(Seq(".attributes.q[0][2] > 2.5E+1"), Nil).shouldKeep(doc))
    intercept[Jq.JqError](Jq.compile(".x > 1e"))
  }

  test("string literals decode standard JSON escapes") {
    val doc = parseJson("""{"text": "a\nb", "attributes": {}}""")
    // "a\nb" must compile to a literal containing a REAL newline
    assert(filterOf(Seq(""".text == "a\nb""""), Nil).shouldKeep(doc))
    val tab = parseJson("""{"text": "x\ty", "attributes": {}}""")
    assert(filterOf(Seq(""".text == "x\ty""""), Nil).shouldKeep(tab))
    val uni = parseJson("""{"text": "café", "attributes": {}}""")
    assert(filterOf(Seq(""".text == "café""""), Nil).shouldKeep(uni))
  }

  test("output truthiness table (filters.rs:299-317)") {
    assert(!outputTruth(JNull))
    assert(!outputTruth(JBool(false)) && outputTruth(JBool(true)))
    assert(!outputTruth(JNum(0)) && outputTruth(JNum(0.5)))
    assert(!outputTruth(JStr("")) && outputTruth(JStr("x")))
    assert(!outputTruth(JArr(Vector())) && outputTruth(JArr(Vector(JNull))))
    assert(!outputTruth(JObj(Map())) && outputTruth(JObj(Map("a" -> JNull))))
  }

  test("selector: optional paths yield empty on missing attrs (filters.rs:9-76)") {
    val sel = new Jq.Selector(".attributes?.pii?.email?")
    val hit = parseJson("""{"attributes": {"pii": {"email": [[0, 5, 0.7], [9, 12, 0.4]]}}}""")
    assert(sel.selectSpans(hit) == Vector((0L, 5L, 0.7), (9L, 12L, 0.4)))
    val miss = parseJson("""{"attributes": {"pii": {}}}""")
    assert(sel.selectSpans(miss).isEmpty)
    val noPii = parseJson("""{"attributes": {}}""")
    assert(sel.selectSpans(noPii).isEmpty)
    val noAttrs = parseJson("""{"id": "x"}""")
    assert(sel.selectSpans(noAttrs).isEmpty)
  }
}
