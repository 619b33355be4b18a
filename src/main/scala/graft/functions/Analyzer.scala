package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The analyzer: attribute-score histogram aggregation
  * (/root/reference/python/dolma/core/analyzer.py:66-200,
  * core/binning.py:29-120). The reference tracks per-file (score, span
  * length) distributions with log-bucket trackers and merges summaries
  * manually; Spark's partial+final aggregation replaces the two-phase
  * merge, and the bucketing is a plain Catalyst expression so the groupBy
  * is map-side combinable.
  *
  * Reference quirk kept: fastText scores are capped at 1.0 before binning
  * (analyzer.py:126-133).
  */
object Analyzer {

  /** Log10 bucket index: floor(log10(|v|) * bucketsPerDecade) with
    * sign, 0 for |v| < 1e-9 — the fixed log-bucket tracker's shape. */
  def logBucket(v: Column, bucketsPerDecade: Int = 10): Column = {
    val mag = abs(v)
    when(mag < 1e-9, lit(0L)).otherwise(
      signum(v).cast("long") *
        floor(log10(greatest(mag, lit(1e-9))) * bucketsPerDecade).cast("long"))
  }

  /** Histogram of an exploded attribute table `(attr, score)` →
    * `(attr, bucket, count)`. Scores capped at `cap` first. */
  def histogram(attrScores: DataFrame, attrCol: Column, scoreCol: Column,
      bucketsPerDecade: Int = 10, cap: Double = 1.0e18): DataFrame = {
    val capped = least(scoreCol, lit(cap))
    attrScores
      .groupBy(attrCol.as("attr"), logBucket(capped, bucketsPerDecade).as("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(capped).as("total"))
  }

  /** Typed Aggregator building a full fixed-bucket histogram in one pass —
    * the custom-UDAF form (exact-parity alternative named in SURVEY §2.4).
    * Buffer = bucket→count map; merge is map-union (associative,
    * commutative — ScalaCheck-tested). */
  class HistogramAggregator(bucketsPerDecade: Int, cap: Double)
      extends Aggregator[Double, Map[Long, Long], Map[Long, Long]] {
    def zero: Map[Long, Long] = Map.empty
    def bucketOf(v0: Double): Long = {
      val v = math.min(v0, cap)
      val mag = math.abs(v)
      if (mag < 1e-9) 0L
      else math.signum(v).toLong * math.floor(math.log10(mag) * bucketsPerDecade).toLong
    }
    def reduce(b: Map[Long, Long], a: Double): Map[Long, Long] = {
      val k = bucketOf(a)
      b.updated(k, b.getOrElse(k, 0L) + 1)
    }
    def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
      y.foldLeft(x) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
    def finish(r: Map[Long, Long]): Map[Long, Long] = r
    def bufferEncoder: Encoder[Map[Long, Long]] = Encoders.kryo[Map[Long, Long]]
    def outputEncoder: Encoder[Map[Long, Long]] = Encoders.kryo[Map[Long, Long]]
  }

  /** Top-k n-grams (wimbd counter, /root/reference/src/wimbd/ngrams/):
    * flatMap n-grams → count → global top-k. The orderBy.limit(k) compiles
    * to TakeOrderedAndProject (per-partition heaps + driver merge), which
    * is the distributed form of wimbd's fixed-size topk heap. */
  def topKNgrams(df: DataFrame, textCol: Column, n: Int, k: Int): DataFrame = {
    // materialize the token array BEFORE the per-gram lambda: a lambda body
    // referencing an unbound tokenization would re-split the text once per
    // gram (O(words^2) per row)
    val withToks = df.select(
      filter(split(lower(textCol), "\\s+"), t => t =!= "").as("__toks"))
    val toks = col("__toks")
    val starts = sequence(lit(0), greatest(size(toks) - n, lit(0)), lit(1))
    val ngrams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(starts, s => concat_ws(" ", slice(toks, s + 1, lit(n)))))
    withToks.select(explode(ngrams).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)
  }
}
