package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ToxDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val out = graft.SparkEntry.codePipeline(spark, 300L)
    val bad = out.filter(col("content").rlike(
      "(hate|stupid|idiot|trash|garbage|awful) (hate|stupid|idiot|trash|garbage|awful)"))
      .select("id", "content").as[(String, String)].collect()
    bad.foreach { case (id, c) =>
      println(s"== $id")
      c.split("\n").filter(_.matches(".*(hate|stupid).*")).foreach { line =>
        val t = graft.taggers.TaggerRegistry.resolve("jigsaw_toxicity_paragraph_v1")
        val score = graft.taggers.FastTextTaggers.toxicity.scoreLabel(line, "toxic")
        println(s"   score=$score line=${line.take(100)}")
      }
    }
    spark.stop()
  }
}
