package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.codePipeline(spark, 2000L)
    df.explain("formatted")
    spark.stop()
  }
}
