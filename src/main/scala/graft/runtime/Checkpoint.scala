package graft.runtime

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable checkpoint ledger — the Spark re-expression of the
  * reference's done-markers and skip-if-exists resume
  * (/root/reference/python/dolma/core/parallel.py:33,229-231,
  * src/mixer.rs:21-25, src/deduper.rs:158-161).
  *
  * The reference's unit of resume is the output file; ours is a stable
  * work-unit key (shard id / input file / id-range). A run:
  *   1. reads the ledger, anti-joins completed keys out of the work set,
  *   2. processes the remainder,
  *   3. appends newly completed keys (with lineage: rows written, wall
  *      time) — append-only parquet, so a crash mid-append loses at most
  *      the in-flight batch, which re-runs idempotently next time.
  *
  * At 10^12-file scale the ledger is itself a table (billions of shard
  * keys ⇒ still small); the anti-join broadcasts when the ledger is
  * small and shuffles when it isn't — Catalyst's call.
  */
final class Checkpoint(spark: SparkSession, ledgerPath: String) {

  def completed(): DataFrame = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = p.getFileSystem(hadoopConf)
    // explicit schema: a crash during the very first commit can leave the
    // directory with no readable footers, and schema INFERENCE would then
    // throw on every later resume — permanently blocking the ledger
    if (fs.exists(p)) spark.read.schema(Checkpoint.schema).parquet(ledgerPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Checkpoint.schema)
  }

  /** Work units not yet completed (left anti-join on the ledger). */
  def pending(work: DataFrame, keyCol: String): DataFrame =
    work.join(completed().select(col("key").as(keyCol)), Seq(keyCol), "left_anti")

  /** Driver-side completed-key set. Only valid for file/shard-grain
    * ledgers (bounded by input file count, not corpus cardinality); at
    * extreme file counts (>10^7) use [[pending]]'s distributed anti-join
    * instead of collecting. */
  def completedKeySet(): Set[String] =
    completed().select(col("key")).collect().map(_.getString(0)).toSet

  /** Record completed units with lineage counters. */
  def commit(keys: DataFrame, keyCol: String, rowsWritten: Long): Unit = {
    keys.select(col(keyCol).cast("string").as("key"))
      .withColumn("rows_written", lit(rowsWritten))
      .withColumn("completed_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(ledgerPath)
  }
}

object Checkpoint {
  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("rows_written",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("completed_at",
        org.apache.spark.sql.types.TimestampType)))

  def apply(spark: SparkSession, path: String): Checkpoint = new Checkpoint(spark, path)
}
