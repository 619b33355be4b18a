package graft

import graft.ml.FtDataset

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `FtDataset` vs the reference's ft_dataset.py semantics
  * (core/ft_dataset.py:47-59,85-95,133-152). */
class FtDatasetSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("segments: document / paragraph / sentence modes") {
    val text = "One sentence. Two sentence.\nSecond para here.\n"
    assert(FtDataset.segments(text, FtDataset.DocumentLevel, "keep") == Seq(text))
    // paragraph slices INCLUDE the trailing newline (utils.py:92-98)
    assert(FtDataset.segments(text, FtDataset.ParagraphLevel, "keep") ==
      Seq("One sentence. Two sentence.\n", "Second para here.\n"))
    val sents = FtDataset.segments(text, FtDataset.SentenceLevel, "keep")
    assert(sents.length >= 3 && sents.head.startsWith("One sentence."))
    assert(FtDataset.segments("", FtDataset.DocumentLevel, "keep").isEmpty)
    intercept[IllegalArgumentException] {
      FtDataset.segments("x", "word", "keep")
    }
    intercept[IllegalArgumentException] {
      FtDataset.segments("x", FtDataset.DocumentLevel, "drop")
    }
  }

  test("newlines policy; paragraph+skip quirk keeps only a final unterminated paragraph") {
    val text = "first para\nsecond para\ntail without newline"
    // skip: every terminated paragraph carries '\n' -> dropped (the
    // reference CLI default reproduces this)
    assert(FtDataset.segments(text, FtDataset.ParagraphLevel, "skip") ==
      Seq("tail without newline"))
    assert(FtDataset.segments(text, FtDataset.ParagraphLevel, "replace") ==
      Seq("first para ", "second para ", "tail without newline"))
    // whitespace-only paragraphs are removed before the policy applies
    assert(FtDataset.segments("a\n \nb", FtDataset.ParagraphLevel, "replace") ==
      Seq("a ", "b"))
  }

  test("build: labels, line format, multi-sample union, empty docs skipped") {
    val target = Seq("good text one", "good text two", "").toDF("t")
    val s1 = Seq("bad text one").toDF("t")
    val s2 = Seq("bad text two", "bad text three").toDF("t")
    val out = FtDataset.build(target, Seq(s1, s2), col("t")).collect()
    val pos = out.filter(_.getString(0) == "pos").map(_.getString(1)).sorted
    val neg = out.filter(_.getString(0) == "neg").map(_.getString(1)).sorted
    assert(pos.toSeq == Seq("__label__pos good text one", "__label__pos good text two"))
    assert(neg.toSeq == Seq("__label__neg bad text one", "__label__neg bad text three",
      "__label__neg bad text two"))
  }

  test("build: per-class cap is deterministic (n smallest by md5) and per phase") {
    val target = (1 to 20).map(i => s"pos doc $i").toDF("t")
    val sample = (1 to 20).map(i => s"neg doc $i").toDF("t")
    val a = FtDataset.build(target, Seq(sample), col("t"),
      nSegmentsPerClass = Some(5L)).collect()
    val b = FtDataset.build(target, Seq(sample), col("t"),
      nSegmentsPerClass = Some(5L)).collect()
    assert(a.count(_.getString(0) == "pos") == 5)
    assert(a.count(_.getString(0) == "neg") == 5)
    assert(a.map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      b.map(r => (r.getString(0), r.getString(1))).sorted.toSeq)
    // the cap selects the md5-smallest lines, so it is a subset of the
    // uncapped output and stable under input order
    val full = FtDataset.build(target, Seq(sample), col("t")).collect()
      .map(_.getString(1)).toSet
    assert(a.map(_.getString(1)).forall(full))
  }

  test("end-to-end: built dataset trains a classifier that separates the corpora") {
    // two synthetic "languages" (disjoint vocabularies), the reference's
    // intended use: target corpus vs sample corpus -> quality filter
    val rng = new scala.util.Random(7)
    def doc(words: Seq[String]) =
      (1 to 12).map(_ => words(rng.nextInt(words.size))).mkString(" ")
    val enWords = Seq("the", "data", "stream", "value", "with", "that", "have")
    val deWords = Seq("der", "wert", "daten", "strom", "nicht", "eine", "und")
    val target = (1 to 40).map(_ => doc(enWords)).toDF("t")
    val sample = (1 to 40).map(_ => doc(deWords)).toDF("t")
    val ds = graft.ml.FtDataset.build(target, Seq(sample), col("t"))
    val model = graft.ml.FastTextClassifier.train(
      graft.ml.FtDataset.trainingExamples(ds))
    assert(model.predict("the data value with that stream")._1 == "pos")
    assert(model.predict("der wert und daten nicht strom")._1 == "neg")
  }

  test("writeText emits the fastText supervised line format") {
    val target = Seq("alpha").toDF("t")
    val sample = Seq("beta").toDF("t")
    val dir = java.nio.file.Files.createTempDirectory("ftds").toString + "/out"
    FtDataset.writeText(FtDataset.build(target, Seq(sample), col("t")), dir)
    val lines = spark.read.text(dir).as[String].collect().sorted
    assert(lines.toSeq == Seq("__label__neg beta", "__label__pos alpha"))
  }
}
