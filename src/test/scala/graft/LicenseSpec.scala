package graft

import graft.taggers.TaggerRegistry

import org.scalatest.funsuite.AnyFunSuite

/** CC license extraction — vectors transcribed from the reference's
  * tests/python/test_license.py LICENSES table. */
class LicenseSpec extends AnyFunSuite {

  private val vectors: Seq[(String, String, String, String)] = Seq(
    ("""<a href="https://creativecommons.org/licenses/by/4.0/">CC BY 4.0</a>""",
      "by", "4.0", "null"),
    ("""<a href="https://creativecommons.org/publicdomain/zero/1.0/?ref=chooser-v1" target="_blank" rel="license noopener noreferrer" style="display:inline-block;">CC0 1.0</a>""",
      "publicdomain/zero", "1.0", "null"),
    ("""<a href="http://creativecommons.org/licenses/by/4.0/?ref=chooser-v1" target="_blank" rel="license noopener noreferrer" style="display:inline-block">CC BY 4.0</a>""",
      "by", "4.0", "null"),
    ("""<a href="https://creativecommons.org/licenses/by-nc-sa/4.0/?ref=chooser-v1" target="_blank" rel="license noopener noreferrer" style="display:inline-block;">CC BY-NC-SA 4.0</a>""",
      "by-nc-sa", "4.0", "null"),
    ("""<a href="https://creativecommons.org/licenses/by/3.0/">CC BY 3.0</a>""",
      "by", "3.0", "null"),
    ("""This page, by <a href="http://lessig.org/">Lawrence Lessig</a>, is licensed under a <a rel="license" href="https://creativecommons.org/licenses/by/3.0/"> Creative Commons Attribution License</a>.""",
      "by", "3.0", "null"),
    ("""<div>License: <a href="https://creativecommons.org/licenses/by-nc/4.0/">Creative Commons Attribution-NonCommercial 4.0 International</a></div>""",
      "by-nc", "4.0", "null"),
    ("""<a href="https://creativecommons.org/licenses/by/4.0/deed.es" hreflang="es">Licencia CC BY 4.0</a>""",
      "by", "4.0", "es"),
    ("""<a href="https://creativecommons.org/licenses/by-nd/3.0/hr/legalcode.hr" hreflang="hr">Licencija CC BY-ND 3.0 HR</a>""",
      "by-nd", "3.0", "hr"),
    ("""<a href="https://creativecommons.org/licenses/by-nc-sa/2.5/ca/legalcode.en" hreflang="en">CC BY-NC-SA 2.5 Canada License</a>""",
      "by-nc-sa", "2.5", "en"))

  test("cc_re: license extraction vectors (test_license.py:6-89)") {
    val t = TaggerRegistry.resolve("cc_re")
    vectors.foreach { case (html, goldType, goldVersion, goldLang) =>
      val spans = t.predict("", Map("html" -> html))
      assert(spans.length == 1, s"html=$html -> ${spans.map(_.typ)}")
      // span type = cc_<type>[_<version>][_<lang>]
      val parts = spans.head.typ.stripPrefix("cc_")
      val afterType = {
        assert(parts.startsWith(goldType), s"$parts vs $goldType")
        parts.drop(goldType.length).stripPrefix("_")
      }
      if (goldVersion != "null") assert(afterType.startsWith(goldVersion))
      if (goldLang != "null") assert(afterType.endsWith(s"_$goldLang") ||
        afterType == goldLang)
      assert(spans.head.score == 1.0)
    }
  }

  test("cc_re: no license -> no spans; pre-search gate short-circuits") {
    val t = TaggerRegistry.resolve("cc_re")
    assert(t.predict("", Map("html" -> "<a href=\"http://example.com\">x</a>")).isEmpty)
    assert(t.predict("", Map.empty).isEmpty)
  }

  test("multiple matches decay confidence 1.0, 0.75, ... (licenses.py:62-66)") {
    // cc_re's greedy attribute class merges adjacent <a> tags into one
    // match (reference behaves identically — its own vectors are all
    // single-license); the decay path is exercised via cc_re_fast
    val html = """x https://creativecommons.org/licenses/by/4.0/ y
                 |z https://creativecommons.org/licenses/by-sa/3.0/ w""".stripMargin
    val spans = TaggerRegistry.resolve("cc_re_fast").predict("", Map("html" -> html))
    assert(spans.map(_.typ) == Vector("cc_by", "cc_by-sa"))
    assert(spans.map(_.score) == Vector(1.0, 0.75))
  }

  test("cc_re_fast: coarse type-only matching (licenses.py:71-88)") {
    val t = TaggerRegistry.resolve("cc_re_fast")
    val spans = t.predict("",
      Map("html" -> """see https://creativecommons.org/licenses/by-nc-sa/4.0/ for terms"""))
    assert(spans.map(_.typ) == Vector("cc_by-nc-sa"))
  }
}
