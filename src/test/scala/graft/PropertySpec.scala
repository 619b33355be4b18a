package graft

import graft.core.{Attributes, CodePoints}
import graft.functions.SpanScrubber
import graft.functions.SpanScrubber.Replacement

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants (FIXTURES.md §4): randomized with a fixed seed
  * (plain loops — the scalatestplus bridge isn't in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def randomText(rng: scala.util.Random): String = {
    val pieces = Seq("a", "b", "Zx", "1", " ", "\n", "€", "😀", "ß", "word ")
    (0 until rng.nextInt(60)).map(_ => pieces(rng.nextInt(pieces.length))).mkString
  }

  test("scrub with empty replacement removes exactly the span text") {
    val rng = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val text = randomText(rng)
      val n = CodePoints.length(text)
      if (n > 1) {
        val a = rng.nextInt(n); val b = rng.nextInt(n)
        val (s, e) = (math.min(a, b), math.max(a, b) + 1)
        val out = SpanScrubber.scrub(text, Seq(Replacement(s, e, "")))
        assert(out == CodePoints.slice(text, 0, s) + CodePoints.slice(text, e, n),
          s"text=${text.take(40)} s=$s e=$e")
      }
    }
  }

  test("scrub: no spans = identity; {} template = identity; disjoint spans compose") {
    val rng = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val text = randomText(rng)
      val n = CodePoints.length(text)
      assert(SpanScrubber.scrub(text, Seq.empty) == text)
      if (n > 2) {
        assert(SpanScrubber.scrub(text, Seq(Replacement(0, n, "{}"))) == text)
        // two disjoint deletions == sequential single deletions
        val m1 = n / 3; val m2 = 2 * n / 3
        if (m1 > 0 && m2 > m1) {
          val both = SpanScrubber.scrub(text,
            Seq(Replacement(0, m1, ""), Replacement(m2, n, "")))
          val seq1 = SpanScrubber.scrub(text, Seq(Replacement(m2, n, "")))
          val seq2 = SpanScrubber.scrub(seq1, Seq(Replacement(0, m1, "")))
          assert(both == seq2)
        }
      }
    }
  }

  test("attribute-name mangling: idempotent, alnum-safe") {
    val rng = new scala.util.Random(13)
    (1 to 300).foreach { _ =>
      val raw = (0 until rng.nextInt(20)).map(_ => (rng.nextInt(94) + 33).toChar).mkString
      val m = Attributes.mangle("e", raw, raw)
      assert(m.forall(c => c.isLetterOrDigit || c == '_'))
      assert(Attributes.sanitize(Attributes.sanitize(raw)) == Attributes.sanitize(raw))
    }
  }

  test("periodic sequence finder: every reported span really has its period") {
    val rng = new scala.util.Random(21)
    (1 to 200).foreach { _ =>
      val period = 1 + rng.nextInt(5)
      val times = 3 + rng.nextInt(4)
      val noise = Array.fill(rng.nextInt(5))(rng.nextInt(4))
      val unit = Array.tabulate(period)(i => 10 + i)
      val arr = noise ++ Array.fill(times)(unit).flatten ++ Array(99)
      val seqs = graft.taggers.RepetitionTaggers.findPeriodicSequences(arr, 13)
      assert(seqs.exists(_.times >= 3), s"missed planted repeat in ${arr.toSeq}")
      seqs.foreach { s =>
        (s.start until (s.end - s.period)).foreach { i =>
          assert(arr(i) == arr(i + s.period), s"span $s in ${arr.toSeq}")
        }
      }
    }
  }

  test("dedup idempotence: re-marking already-deduped rows finds nothing") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(5)
    val rows = (1 to 100).map(i => (i.toLong, s"text${rng.nextInt(30)}"))
    val df = rows.toDF("id", "text")
    val once = graft.dedup.Dedup.markDuplicates(df, col("text"), col("id"))
      .filter(!col("is_duplicate")).drop("is_duplicate")
    val twice = graft.dedup.Dedup.markDuplicates(once, col("text"), col("id"))
    assert(twice.filter(col("is_duplicate")).count() == 0)
  }

  test("KenLM: log-probs finite and never positive") {
    val lm = graft.ml.KenLm.train(Seq("a b c d e a b c x y"), order = 3)
    val rng = new scala.util.Random(3)
    val vocab = Seq("a", "b", "c", "d", "e", "x", "y", "zz", "q")
    (1 to 200).foreach { _ =>
      val ctx = (0 until rng.nextInt(4)).map(_ => vocab(rng.nextInt(vocab.length)))
      val w = vocab(rng.nextInt(vocab.length))
      val lp = lm.logProb(ctx, w)
      assert(lp <= 1e-9 && !lp.isNaN && !lp.isInfinite)
    }
  }
}
