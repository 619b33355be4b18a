package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does the tag stage lose parallelism? */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = 30000L
    for (cpus <- Seq(8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      try {
        // A: generate only
        var t0 = System.nanoTime()
        graft.sources.CodeDocs.generate(spark, n).count()
        val tGen = (System.nanoTime() - t0) / 1e9

        // B: generate + raw battery in mapPartitions (no encoder roundtrip)
        t0 = System.nanoTime()
        graft.sources.CodeDocs.generate(spark, n)
          .mapPartitions { it =>
            val taggers = Seq("gopher_v2", "code_redpajama_taggers_v1",
              "pii_regex_with_counts_fast_v2", "repetitions_v1",
              "code_copyright_comments_v1").map(graft.taggers.TaggerRegistry.resolve)
            it.map(d => taggers.map(_.predict(d.content).length).sum)
          }.reduce(_ + _)
        val tRaw = (System.nanoTime() - t0) / 1e9

        // C: full TagRunner (encoder roundtrip included)
        t0 = System.nanoTime()
        graft.operators.TagRunner.tag(
          graft.sources.CodeDocs.generate(spark, n).toDF()
            .withColumn("id", concat_ws(":", col("repo"), col("path"), col("commit"))),
          Seq("gopher_v2", "code_redpajama_taggers_v1", "pii_regex_with_counts_fast_v2",
            "repetitions_v1", "code_copyright_comments_v1"),
          "exp", idCol = "id", textCol = "content").count()
        val tTag = (System.nanoTime() - t0) / 1e9

        println(f"cpus=$cpus%2d gen=$tGen%6.2fs rawBattery=$tRaw%6.2fs tagRunner=$tTag%6.2fs partitions=${spark.sparkContext.defaultParallelism}")
      } finally spark.stop()
    }
  }
}
