package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-stage salted groupBy (the north rule's
  * "salted keys for skewed repos"). The corpus's repo distribution is
  * Zipf-shaped — one giant repo can own 30% of all files, so a plain
  * `groupBy(repo)` sends a third of the corpus through one reducer. The
  * salt splits each hot key across `saltBuckets` partial groups (stage 1,
  * map-side combinable), then merges the partials (stage 2, tiny).
  *
  * Only algebraic aggregates compose this way — count/sum/min/max — which
  * covers the engine's per-repo metrics. AQE's skew-join splitting covers
  * the join side; this covers aggregation.
  */
object Salted {

  /** Two-stage salted count+sum aggregation.
    * `sums`: (inputColumn → outputName). */
  def groupByWithSalt(
      df: DataFrame,
      key: Column,
      sums: Seq[(Column, String)],
      saltBuckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .withColumn("__key", key)
    val stage1 = salted.groupBy(col("__key"), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sums.zipWithIndex.map { case ((c, _), i) => sum(c).as(s"__s$i") }: _*)
    val finalAggs =
      sum(col("__cnt")).as("n") +:
        sums.zipWithIndex.map { case ((_, name), i) => sum(col(s"__s$i")).as(name) }
    stage1.groupBy(col("__key"))
      .agg(finalAggs.head, finalAggs.tail: _*)
      .withColumnRenamed("__key", "key")
  }
}
