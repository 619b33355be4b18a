package graft.runtime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lineage + metrics tables (north rule: "per-partition lineage and
  * attribute/metric tables written back ... for resumable
  * checkpoint-restart"). Two shapes:
  *
  *  - per-partition lineage: one row per task partition with row counts
  *    and content-hash aggregates — enough to audit which partition wrote
  *    what and re-derive any partition's inputs.
  *  - per-stage decision metrics: how many docs each exclude rule
  *    dropped, duplicate counts, scrub counts — the numbers the reference
  *    logs per file ("Dropped X of Y documents", shard.rs:496-501) made
  *    queryable.
  */
object Metrics {

  /** One row per Spark partition: row count + cheap integrity hash. */
  def partitionLineage(df: DataFrame, idCol: Column): DataFrame =
    df.select(spark_partition_id().as("partition_id"), idCol.as("__id"))
      .groupBy(col("partition_id"))
      .agg(count(lit(1)).as("rows"),
        // decimal sum: a long sum of 64-bit hashes overflows under ANSI
        sum(xxhash64(col("__id")).cast("decimal(38,0)")).as("id_hash_sum"))

  /** Keep/drop decision metrics for a set of named boolean rules: for
    * each rule, how many rows it fires on (rules may overlap). One pass,
    * map-side combinable. */
  def ruleMetrics(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("total") +:
      rules.map { case (name, c) =>
        sum(when(coalesce(c, lit(false)), 1L).otherwise(0L)).as(name)
      }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
