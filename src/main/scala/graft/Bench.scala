package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint (driver contract).
  *
  * Runs every `SparkEntry.queries` entry against `SPARK_GRAFT_SF_DIR` and
  * prints ONE JSON line with per-query wall seconds. Protocol: each query
  * runs `SPARK_GRAFT_BENCH_REPS` times (default 2) and reports the MIN —
  * the first rep doubles as JIT/page-cache warmup, which separates real
  * regressions from single-shot JVM noise (sandbox noise is ~±20%).
  *
  * Failures are loud: a crashing query records time -1, lands in the
  * `errors` map (name → exception summary), and the process exits 1.
  */
object Bench {
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => " "
      case c             => c.toString
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.runtime.TmpFs.sparkLocalDir("graft-bench"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            errors(name) =
              (e.getClass.getSimpleName + ": " +
                Option(e.getMessage).getOrElse("")).take(300)
            false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val good = times.filter(_ >= 0)
      name -> (if (good.isEmpty) -1.0 else good.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + jsonEscape(v) + "\""
    }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"reps":$reps,"sf":"$sfDir"}"""
    // Persist a copy the BASELINE.md tooling can read regardless of how the
    // launcher handles stdout.
    val out = java.nio.file.Paths.get("BENCH/last_run.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    spark.stop()
    // Emit the bare result line LAST, after spark.stop(), so no executor log
    // interleaves with it; build.sbt's StdoutOutput strategy passes it
    // through without an "[info] " prefix for the driver's stdout parser.
    System.out.println(line)
    System.out.flush()
    if (errors.nonEmpty) sys.exit(1)
  }
}
