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

  /** One row per written output file: row count + integrity hash — the
    * audit/resume grain. Intended to run over a re-scan of the files just
    * written (column-pruned to the id), never by re-evaluating the
    * pipeline that produced them. */
  def fileLineage(df: DataFrame, idCol: Column): DataFrame =
    df.select(input_file_name().as("file"), idCol.as("__id"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("rows"),
        sum(xxhash64(col("__id")).cast("decimal(38,0)")).as("id_hash_sum"))

  /** Keep/drop decision metric expressions for a set of named boolean
    * rules: for each rule, how many rows it fires on (rules may overlap).
    * Designed to ride an output write as a `Dataset.observe`
    * CollectMetrics node — one pass, zero extra evaluations. */
  def ruleMetricExprs(rules: Seq[(String, Column)]): Seq[Column] =
    count(lit(1)).as("total") +:
      rules.map { case (name, c) =>
        sum(when(coalesce(c, lit(false)), 1L).otherwise(0L)).as(name)
      }
}
