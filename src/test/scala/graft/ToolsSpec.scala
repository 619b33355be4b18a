package graft

import graft.functions.Binning.Summary
import graft.tools.{AnalyzerReport, ListTaggers}

import org.scalatest.funsuite.AnyFunSuite

/** Console report renderer over analyzer summaries (the reference's
  * visualize_summaries / round_values_for_visual shape). */
class ToolsSpec extends AnyFunSuite {

  test("rounding ladder: fewest decimals keeping values distinct, then sci") {
    assert(AnalyzerReport.roundValuesForVisual(Seq(0.0, 1.0, 2.0)) ==
      Seq("0", "1", "2"))
    assert(AnalyzerReport.roundValuesForVisual(Seq(0.31, 0.42)) ==
      Seq("0.3", "0.4"))
    assert(AnalyzerReport.roundValuesForVisual(Seq(0.123, 0.125)) ==
      Seq("0.123", "0.125"))
    // indistinguishable at max decimals: scientific when allowed
    assert(AnalyzerReport.roundValuesForVisual(Seq(1.0, 1.0), optSci = true) ==
      Seq("1.0e+00", "1.0e+00"))
    assert(AnalyzerReport.roundValuesForVisual(Seq(1.00001, 1.00002)) ==
      Seq("1.0000", "1.0000"))
  }

  test("list taggers: sorted registry with classes, modules imported first") {
    val rows = ListTaggers.listing(Seq("graft.CountingTaggerModule"))
    val names = rows.map(_._1)
    assert(names == names.sorted)
    // builtins present with their implementing class
    assert(rows.exists { case (n, c) =>
      n == "gopher_v2" && c.contains("Gopher") })
    // the imported module's tagger is listed too (dolma list's
    // tagger_modules semantics, cli/tagger.py:159-161)
    assert(names.contains("counting_v1"))
    val table = ListTaggers.render(rows)
    assert(table.exists(_.contains("| name")))
    assert(table.exists(_.contains("gopher_v2")))
  }

  test("sum footer: sci past 10 digits, comma-grouped integers, else 2dp") {
    assert(AnalyzerReport.formatSum(13.0) == "13")
    assert(AnalyzerReport.formatSum(1234567.0) == "1,234,567")
    assert(AnalyzerReport.formatSum(2.5) == "2.50")
    assert(AnalyzerReport.formatSum(1.23456e12) == "1.23e+12")
  }

  test("renderSummary: fixed fixture renders the exact report lines") {
    val s = Summary(Seq(0.0, 1.0, 2.0, 5.0), Seq(3L, 4L, 2L, 1L), 10L, 13.0)
    val lines = AnalyzerReport.renderSummary("doc_len", s, showTotal = true)
    assert(lines == Seq(
      "doc_len",
      "value  dist           count",
      "0      0.3            3",
      "1      0.4            4",
      "2      0.2            2",
      "5      0.1            1",
      "13     ← sum/total →  10"))
  }

  test("re-binning: wide summaries compress to numVizBins display rows") {
    val bins = (0 until 40).map(_.toDouble)
    val counts = Seq.fill(40)(5L)
    val s = Summary(bins, counts, 200L, bins.sum * 5)
    val lines = AnalyzerReport.renderSummary("wide", s, numVizBins = 10)
    // title + header + <= 10 data rows; mass preserved across re-binning
    assert(lines.length <= 12)
    val total = lines.drop(2).map(_.split("\\s+").last.replace(",", "").toLong).sum
    assert(total == 200L)
  }

  test("render: multiple attributes sorted by name with blank separators") {
    val s = Summary(Seq(1.0), Seq(1L), 1L, 1.0)
    val out = AnalyzerReport.render(Map("b_attr" -> s, "a_attr" -> s))
    assert(out.indexOf("a_attr") < out.indexOf("b_attr"))
    assert(out.count(_ == "") == 2)
  }
}
