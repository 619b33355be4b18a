package graft

import graft.taggers.RepetitionTaggers
import graft.taggers.RepetitionTaggers.{endFirstConsecutiveTrue, findPeriodicSequences, startLastConsecutiveTrue}

import org.scalatest.funsuite.AnyFunSuite

/** Vectors transcribed from
  * /root/reference/tests/python/test_repetitions_utils.py and
  * test_repetitions.py. */
class RepetitionsSpec extends AnyFunSuite {

  private def arr(s: String): Array[Int] = s.map(_ - '0').toArray

  test("find_end_first_consecutive_true vectors") {
    assert(endFirstConsecutiveTrue(Array(true, true, false, true)) == 2)
    assert(endFirstConsecutiveTrue(Array(false, true)) == 0)
    assert(endFirstConsecutiveTrue(Array(true, false)) == 1)
    assert(endFirstConsecutiveTrue(Array(true)) == 1)
    assert(endFirstConsecutiveTrue(Array(false)) == 0)
  }

  test("find_start_last_consecutive_true vectors") {
    assert(startLastConsecutiveTrue(Array(false, false, true, true)) == 2)
    assert(startLastConsecutiveTrue(Array(true, false, false, true)) == 3)
    assert(startLastConsecutiveTrue(Array(true, true, true, true)) == 0)
    assert(startLastConsecutiveTrue(Array(false, false, false, false)) == -1)
    assert(startLastConsecutiveTrue(Array(true, true, true, false)) == -1)
  }

  test("periodic sequences: 0 repeated 5 times in 5000007") {
    val seqs = findPeriodicSequences(arr("5000007"), maxPeriod = 1)
    assert(seqs == Vector(RepetitionTaggers.Periodic(1, 6, 1, 5)))
  }

  test("periodic sequences: 01 x3 in 501010127") {
    val seqs = findPeriodicSequences(arr("501010127"), maxPeriod = 2, minPeriod = 2)
    assert(seqs == Vector(RepetitionTaggers.Periodic(1, 7, 2, 3)))
  }

  test("periodic sequences: 0104 x3 in 5301040104010401") {
    val seqs = findPeriodicSequences(arr("5301040104010401"), maxPeriod = 4, minPeriod = 4)
    assert(seqs == Vector(RepetitionTaggers.Periodic(2, 16, 4, 3)))
  }

  test("periodic sequences: 040 x4 in 04004004004030") {
    val seqs = findPeriodicSequences(arr("04004004004030"), maxPeriod = 3, minPeriod = 3)
    assert(seqs == Vector(RepetitionTaggers.Periodic(0, 12, 3, 4)))
  }

  test("periodic sequences: two repetitions (46 x4, 550 x3)") {
    val seqs = findPeriodicSequences(arr("004646464639955055055046550"),
      maxPeriod = 3, minPeriod = 2)
    assert(seqs.toSet == Set(
      RepetitionTaggers.Periodic(2, 10, 2, 4),
      RepetitionTaggers.Periodic(13, 22, 3, 3)))
  }

  test("no periodic sequences in 123456789") {
    assert(findPeriodicSequences(arr("123456789"), maxPeriod = 3).isEmpty)
  }

  test("char repetitions tagger (test_repetitions.py:12-88)") {
    val doc = "\nThis is a text with repetitions.\nThis is a text with repetitions repetitions.\n" +
      "This is a text with repetitions repetitions repetitions.\n" +
      "This is a text with repetitions repetitions repetitions repetitions.\n\n" +
      "blah blah blah blah blah\n\n" +
      "No reps at the beginning of this sentence but MMMMMMMMMM\n\n" +
      "Seeing doubles: bass banana bass banana bass banana bass banana\n"
    val t = new RepetitionTaggers.CharRepetitionsTagger
    val spans = t.predict(doc)
    assert(spans.length == 7)
    val reps = spans.filter(_.typ == "repetition")
    def slice(i: Int) = graft.core.CodePoints.slice(doc, reps(i).start.toInt, reps(i).end.toInt)
    assert(slice(0) == " repetitions repetitions repetitions repetitions")
    assert(reps(0).score == 4.0)
    assert(slice(1) == "blah blah blah blah blah")
    assert(reps(1).score == 5.0)
    assert(slice(2) == "MMMMMMMMMM")
    assert(reps(2).score == 10.0)
    assert(slice(3) == " bass banana bass banana bass banana bass banana")
    assert(reps(3).score == 4.0)
    assert(spans.find(_.typ == "doc_max_score_repetition").get.score == 10.0)
    assert(spans.find(_.typ == "doc_max_length_repetition").get.score == 48.0)
    val matchesLen = 48 + 24 + 10 + 48
    assert(spans.find(_.typ == "doc_frac_repetition").get.score ==
      matchesLen.toDouble / doc.length)
  }

  test("token repetitions find planted periodic run, none in clean text") {
    val t = new RepetitionTaggers.TokenRepetitionsTagger()
    val withReps = "start foo bar foo bar foo bar foo bar end"
    val spans = t.predict(withReps)
    assert(spans.exists(_.typ == "repetition"))
    assert(t.predict("all words here are completely different tokens").isEmpty)
  }
}
