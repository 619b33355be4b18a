package graft.tools

import graft.functions.Binning
import graft.functions.Binning.{InferTracker, Summary}

/** Console report renderer over analyzer summaries — the re-expression of
  * the reference's `visualize_summaries` + `round_values_for_visual`
  * (/root/reference/python/dolma/core/analyzer.py:190-267) and the
  * aggregation driver around them (analyzer.py:160-188): each attribute's
  * summary is re-binned to `numVizBins` display buckets, the bin edges
  * are rounded with as few decimals as keeps them distinct (falling back
  * to scientific notation past `maxDecimal`), and the result renders as a
  * value / dist / count table with an optional sum/total footer.
  *
  * Deviations, by design: the display re-binning runs through the repo's
  * [[InferTracker]] (equal-count — the tracker family every analyzer
  * query ships) where the reference defaults to its fixed log-bucket
  * tracker, and the table renders as plain aligned ASCII instead of a
  * `rich` box — the numbers, rounding ladder, range notation and footer
  * semantics are the reference's.
  */
object AnalyzerReport {

  /** Rounding ladder (analyzer.py:190-205): fewest decimals in
    * [0, maxDecimal) at which all values stay distinct; otherwise
    * scientific when allowed, else maxDecimal places. */
  def roundValuesForVisual(values: Seq[Double], optSci: Boolean = false,
      maxDecimal: Int = 4): Seq[String] = {
    var d = 0
    while (d < maxDecimal) {
      val attempt = values.map(v => BigDecimal(v)
        .setScale(d, BigDecimal.RoundingMode.HALF_EVEN))
      if (attempt.distinct.length == values.length)
        return attempt.map(a => a.bigDecimal.toPlainString)
      d += 1
    }
    if (optSci) values.map(v => f"$v%.1e")
    else values.map(v => BigDecimal(v)
      .setScale(maxDecimal, BigDecimal.RoundingMode.HALF_EVEN)
      .bigDecimal.toPlainString)
  }

  /** Sum footer rounding (analyzer.py:249-259): scientific past 10
    * digits, comma-grouped when integral, else 2 decimals. */
  def formatSum(sum: Double): String = {
    val rounded = math.round(sum)
    if (rounded.toString.length > 10) f"$sum%.2e"
    else if (sum == rounded) f"$rounded%,d"
    else f"$sum%.2f"
  }

  /** One attribute's report table as lines (deterministic — Spec-pinned). */
  def renderSummary(name: String, summary: Summary, maxDecimal: Int = 4,
      numVizBins: Int = 10, showTotal: Boolean = false): Seq[String] = {
    // re-bin for display with fewer buckets (analyzer.py:214-221)
    val t = new InferTracker(100000)
    summary.bins.zip(summary.counts).foreach { case (b, c) => t.add(b, c) }
    val rebinned = t.summarize(numVizBins, "count")
    val short = Summary(rebinned.bins, rebinned.counts, summary.total, summary.sum)

    val roundedBins = roundValuesForVisual(short.bins, optSci = true, maxDecimal)
    val ranges =
      if (short.bins.length > short.counts.length)
        roundedBins.zip(roundedBins.drop(1)).zipWithIndex.map { case ((lo, hi), i) =>
          s"[$lo, $hi" + (if (i == short.bins.length - 2) "]" else ")")
        }
      else roundedBins
    val countsSum = math.max(1L, short.counts.sum)
    val dist = roundValuesForVisual(
      short.counts.map(_.toDouble / countsSum), optSci = false, maxDecimal)
    val counts = short.counts.map(c => f"$c%,d")

    val rows = ranges.lazyZip(dist).lazyZip(counts).map((v, d, c) => (v, d, c)) ++
      (if (showTotal) Seq((formatSum(short.sum), "← sum/total →", f"${short.total}%,d"))
       else Seq.empty)
    val header = ("value", "dist", "count")
    val all = header +: rows
    val w1 = all.map(_._1.length).max
    val w2 = all.map(_._2.length).max
    name +: all.map { case (a, b, c) =>
      s"${a.padTo(w1, ' ')}  ${b.padTo(w2, ' ')}  $c"
    }
  }

  /** Render every (name → summary) report, names sorted. */
  def render(summaries: Map[String, Summary], maxDecimal: Int = 4,
      numVizBins: Int = 10, showTotal: Boolean = false): Seq[String] =
    summaries.toSeq.sortBy(_._1).flatMap { case (n, s) =>
      renderSummary(n, s, maxDecimal, numVizBins, showTotal) :+ ""
    }

  /** CLI: `graft.tools.AnalyzerReport <summaries.parquet> [numVizBins]` —
    * reads rows of (name, bins, counts, total, sum) (the analyzer
    * queries' output shape), merges per name through the tracker (the
    * aggregate_summaries step, analyzer.py:160-188), prints the report. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnalyzerReport <summaries.parquet> [numVizBins]")
    val nBins = if (args.length > 1) args(1).toInt else 10
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-analyzer-report")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    try {
      val rows = spark.read.parquet(args(0)).collect()
      val merged = scala.collection.mutable.LinkedHashMap.empty[String, InferTracker]
      var totals = Map.empty[String, (Long, Double)]
      rows.foreach { r =>
        val name = r.getAs[String]("name")
        val bins = r.getAs[Seq[Double]]("bins")
        val counts = r.getAs[Seq[Long]]("counts")
        val t = merged.getOrElseUpdate(name, new InferTracker(100000))
        bins.zip(counts).foreach { case (b, c) => t.add(b, c) }
        val (pt, ps) = totals.getOrElse(name, (0L, 0.0))
        totals += name -> (pt + r.getAs[Long]("total"), ps + r.getAs[Double]("sum"))
      }
      val summaries = merged.map { case (n, t) =>
        val s = t.summarize(1000, "count")
        n -> Summary(s.bins, s.counts, totals(n)._1, totals(n)._2)
      }.toMap
      render(summaries, numVizBins = nBins, showTotal = true).foreach(println)
    } finally spark.stop()
  }
}
