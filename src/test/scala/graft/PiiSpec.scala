package graft

import graft.taggers.PiiTaggers

import org.scalatest.funsuite.AnyFunSuite

/** PII fast-regex semantics
  * (/root/reference/python/dolma/taggers/pii.py:184-280). */
class PiiSpec extends AnyFunSuite {

  private val fast = new PiiTaggers.FastPiiRegex

  private def types(text: String): Seq[String] =
    fast.predict(text).map(_.typ).filterNot(t => t == "doc_count" || t == "doc_frac")

  test("email detected with trailing whitespace requirement") {
    assert(types("write to alice@example.com today") == Seq("EMAIL_ADDRESS"))
    // email at EOF has no trailing whitespace — reference regex misses it
    assert(types("write to alice@example.com").isEmpty)
  }

  test("email guards: domain needs a dot (pii.py:203-207)") {
    assert(types("ping bob@localhost now").isEmpty)
  }

  test("phone with leading whitespace and separators") {
    assert(types("call (555) 123-4567 now") == Seq("PHONE_NUMBER"))
    assert(types("call 555 123 4567 now") == Seq("PHONE_NUMBER"))
  }

  test("ip detected; url-looking match suppressed (pii.py:239-249)") {
    assert(types("server at 192.168.0.1 responded") == Seq("IP_ADDRESS"))
    assert(types("nothing here").isEmpty)
  }

  test("doc_count and doc_frac rollups (pii.py:255-279)") {
    val text = "mail a@b.com and call (555) 123-4567 ok"
    val spans = fast.predict(text)
    assert(spans.find(_.typ == "doc_count").get.score == 2.0)
    val frac = spans.find(_.typ == "doc_frac").get.score
    assert(frac > 1.0) // reference quirk: doc_count span length included
  }

  test("span offsets are exact") {
    val text = "hi a@b.co x"
    val s = fast.predict(text).find(_.typ == "EMAIL_ADDRESS").get
    // match includes leading space and trailing whitespace char
    val m = graft.core.CodePoints.slice(text, s.start.toInt, s.end.toInt)
    assert(m.contains("a@b.co"))
  }

  test(">10k question marks bail-out (pii.py:259-261)") {
    val text = "a@b.com " + ("?" * 10001)
    assert(types(text).isEmpty)
  }

  test("empty doc: doc_frac = -1 (pii.py:271-274)") {
    assert(fast.predict("").find(_.typ == "doc_frac").get.score == -1.0)
  }
}
