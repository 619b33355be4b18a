package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Sentences, TextSplit}

/** fastText training-set builder — the reference's `ft_dataset.py`
  * (/root/reference/python/dolma/core/ft_dataset.py:1-241) re-expressed as
  * a Spark job: a TARGET corpus contributes positive examples, one or more
  * SAMPLE corpora contribute negatives, each document is split at
  * document / paragraph / sentence granularity, and every kept segment
  * becomes one `__label__<label> <text>` line ready for
  * [[FastTextClassifier]] (or the reference's own `fasttext supervised`).
  *
  * Observable semantics mirrored from the reference:
  *  - empty documents are skipped (`ft_dataset.py:85-86`);
  *  - `mode` picks the splitter (`_split`, ft_dataset.py:47-59):
  *    `document` = the whole text, `paragraph` = `split_paragraphs`
  *    ([[TextSplit.splitParagraphs]] — slices INCLUDE the terminating
  *    newline, utils.py:92-98), `sentence` = `split_sentences`
  *    ([[Sentences.split]]);
  *  - the `newlines` policy applies AFTER splitting (ft_dataset.py:91-95):
  *    `skip` drops segments containing a newline, `replace` maps newlines
  *    to spaces, `keep` passes them through. Note the reference quirk this
  *    preserves: paragraph slices carry their trailing `\n`, so
  *    `paragraph` + `skip` (the CLI default) keeps only a final
  *    unterminated paragraph;
  *  - `nSegmentsPerClass` caps each class like `--n-segments`
  *    (ft_dataset.py:114-117 sets the exit flag once the writer has seen
  *    n lines of the current class). The reference's cap keeps whichever
  *    lines win a multiprocess race; here selection is DETERMINISTIC — the
  *    n smallest lines by `md5(line)` (a seeded uniform draw, same spirit
  *    as the hash-based `random_number_v1` deviation).
  *
  * Scale shape: splitting is a narrow map; the per-class cap plans as
  * `TakeOrderedAndProject` (per-partition top-n, only n rows reach the
  * driver merge) rather than a full sort shuffle, so a 100 TB corpus
  * feeding a few million training lines never materializes a global sort.
  */
object FtDataset {

  val DocumentLevel = "document"
  val ParagraphLevel = "paragraph"
  val SentenceLevel = "sentence"

  /** Split one document into training segments per the reference's mode +
    * newline policy (ft_dataset.py:47-59,85-95). */
  def segments(text: String, mode: String, newlines: String): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val slices = mode match {
      case DocumentLevel => Vector(text)
      case ParagraphLevel => TextSplit.splitParagraphs(text).map(_.text)
      case SentenceLevel => Sentences.split(text).map(_.text)
      case other => throw new IllegalArgumentException(
        s"Unknown data split mode: $other (ft_dataset.py:58)")
    }
    newlines match {
      case "skip" => slices.filterNot(_.contains('\n'))
      case "replace" => slices.map(_.replace('\n', ' '))
      case "keep" => slices
      case other => throw new IllegalArgumentException(
        s"Unknown newlines policy: $other (ft_dataset.py expects skip|keep|replace)")
    }
  }

  /** One labeled corpus → `(label, line)` rows. */
  private def classLines(df: DataFrame, textCol: Column, label: String,
      mode: String, newlines: String, nSegments: Option[Long]): DataFrame = {
    val seg = udf((s: String) => segments(s, mode, newlines))
    val lines = df
      .filter(length(textCol) > 0)
      .select(explode(seg(textCol)).as("__seg"))
      .select(lit(label).as("label"),
        concat(lit("__label__" + label + " "), col("__seg")).as("line"))
    nSegments match {
      case Some(n) =>
        // limit() takes an Int: a larger cap would silently wrap/truncate
        require(n > 0 && n <= Int.MaxValue,
          s"nSegmentsPerClass must be in (0, ${Int.MaxValue}], got $n")
        // deterministic stand-in for the reference's first-n race: the n
        // smallest lines by md5 — plans as TakeOrderedAndProject, no sort
        // shuffle.
        lines.orderBy(md5(col("line"))).limit(n.toInt)
      case None => lines
    }
  }

  /** Build the labeled training set (reference `main`, ft_dataset.py:133-152:
    * positives from `target`, then negatives from every sample corpus).
    * Returns `(label, line)` rows; write with [[writeText]] for the
    * fastText on-disk format. */
  def build(target: DataFrame, samples: Seq[DataFrame], textCol: Column,
      mode: String = DocumentLevel, newlines: String = "skip",
      nSegmentsPerClass: Option[Long] = None,
      posLabel: String = "pos", negLabel: String = "neg"): DataFrame = {
    require(samples.nonEmpty, "at least one sample corpus (ft_dataset.py --sample)")
    val pos = classLines(target, textCol, posLabel, mode, newlines, nSegmentsPerClass)
    // the reference caps the NEGATIVE phase as a whole (flag cleared once
    // between phases, ft_dataset.py:144-150), so union the samples first
    val negAll = samples.map(_.select(textCol.as("__t"))).reduce(_ unionAll _)
    val neg = classLines(negAll, col("__t"), negLabel, mode, newlines, nSegmentsPerClass)
    pos.unionAll(neg)
  }

  /** The fastText supervised on-disk format: one `__label__<l> <text>` line
    * per row (what the reference's writer emits, ft_dataset.py:100-117). */
  def writeText(ds: DataFrame, path: String): Unit =
    ds.select(col("line")).write.mode("overwrite").text(path)

  /** Parse [[build]] output back into deterministic `(label, text)`
    * examples — the feed for [[FastTextClassifier.train]] (the reference
    * trains `fasttext supervised` on this same file format,
    * core/ft_tagger.py:39-120). Driver-resident by design: a training set
    * is capped (`nSegmentsPerClass`) to what one trainer can hold. */
  def trainingExamples(ds: DataFrame): Seq[(String, String)] =
    ds.select(col("label"), col("line")).collect().map { r =>
      val line = r.getString(1)
      val prefix = "__label__" + r.getString(0) + " "
      (r.getString(0), line.stripPrefix(prefix))
    }.toSeq.sorted
}
