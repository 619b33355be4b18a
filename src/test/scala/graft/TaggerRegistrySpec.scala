package graft

import graft.taggers.TaggerRegistry

import org.scalatest.funsuite.AnyFunSuite

class TaggerRegistrySpec extends AnyFunSuite {

  // every reference registry name deliberately scoped out
  // (taggers/language.py:73-298 third-party langid engines;
  // pii.py:162-165 presidio)
  private val scopedOut = Seq(
    "cld2_doc_v2", "cld2_paragraph_v2", "cld2_en_doc_v2",
    "cld2_en_paragraph_v2", "cld2_en_paragraph_with_doc_score_v2",
    "cld3_en_doc_v2", "cld3_en_paragraph_v2",
    "cld3_en_paragraph_with_doc_score_v2",
    "langdetect_doc_v1", "langdetect_doc_en_v1",
    "langdetect_paragraph_v1", "langdetect_en_paragraph_v1",
    "lingua_doc_v1", "lingua_1e2", "lingua_doc_en_v1",
    "lingua_en_only_v1", "lingua_par_v1", "lingua_en_par_v1",
    "pii_presidio_v1")

  test("scoped-out reference names fail with an alias hint, not a bare miss") {
    assert(TaggerRegistry.scopedOutAliases.keySet == scopedOut.toSet)
    scopedOut.foreach { name =>
      val e = intercept[NoSuchElementException](TaggerRegistry.resolve(name))
      val (equivalent, _) = TaggerRegistry.scopedOutAliases(name)
      assert(e.getMessage.contains("scopes out"), s"$name: ${e.getMessage}")
      assert(e.getMessage.contains(s"Use '$equivalent' instead"),
        s"$name: ${e.getMessage}")
      // and the suggested equivalent must actually resolve
      assert(TaggerRegistry.resolve(equivalent) != null)
    }
  }

  test("genuinely unknown names still list the known registry") {
    val e = intercept[NoSuchElementException](
      TaggerRegistry.resolve("no_such_tagger_v999"))
    assert(e.getMessage.contains("Unknown tagger"))
    assert(e.getMessage.contains("gopher_v2"))
  }
}
