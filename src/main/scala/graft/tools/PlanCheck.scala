package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev check: column pruning / filter pushdown reach the parquet scans. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("tag_lengths", "q2_join_agg", "dedup_exact", "ann_cosine_topk")) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
