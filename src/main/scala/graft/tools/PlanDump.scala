package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: write the formatted physical plan of SparkEntry queries to
  * files (the r06 optimization-round evidence trail).
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [query...]
  * Writes <outDir>/<query>_<suffix>.txt for each query (all queries when
  * none named). Uses the same session shape as Bench (local[$CPUS],
  * shuffle.partitions=$CPUS, AQE on) so plans match what Bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r06")
    val suffix = args.lift(2).getOrElse("before")
    val names = if (args.length > 3) args.drop(3).toSeq
                else graft.SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.runtime.TmpFs.sparkLocalDir("graft-plandump"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAILED $n: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
