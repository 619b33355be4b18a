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

    // ---- measurement-window self-certification -------------------------
    // Round 4's bench artifact was captured in a degraded sandbox window
    // (four unchanged queries read 3-5x their variance band) and the
    // degradation was only diagnosable after the fact, from a separate
    // variance study. Sample the same two throttle signals ScalingBench
    // guards its legs with — the 32-thread pure-ALU rate (frequency caps)
    // and /proc/stat tick elapse (hypervisor descheduling) — around the
    // query loop, and publish them IN the result line, so every archived
    // BENCH_r{N}.json carries its own window-health evidence.
    def procTicks(): (Long, Long, Long) =
      try {
        val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
          .trim.split("\\s+").drop(1).map(_.toLong)
        (f.sum, if (f.length > 7) f(7) else 0L, if (f.length > 2) f(2) else 0L)
      } catch { case _: Throwable => (-1L, -1L, -1L) } // non-Linux: no evidence
    val hostCpus = Runtime.getRuntime.availableProcessors()
    val aluBefore = ScalingBench.aluRate(32, 200_000_000L)
    val (tk0, st0, sy0) = procTicks()
    val wall0 = System.nanoTime()

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

    val wallSec = (System.nanoTime() - wall0) / 1e9
    val (tk1, st1, sy1) = procTicks()
    val aluAfter = ScalingBench.aluRate(32, 200_000_000L)
    // CLK_TCK=100 on this box; tickFraction ~1.0 on a healthy guest (idle
    // ticks count), <0.9 means the guest was descheduled during the loop.
    val tickFraction =
      if (tk0 < 0 || tk1 < 0) -1.0 else (tk1 - tk0).toDouble / (hostCpus * 100L * wallSec)
    val guardJson = f"""{"alu32_before_gops":$aluBefore%.3f,"alu32_after_gops":$aluAfter%.3f,"tick_fraction":$tickFraction%.3f,"steal_ticks":${st1 - st0},"sys_ticks":${sy1 - sy0},"wall_sec":$wallSec%.1f,"healthy_alu32_floor_gops":0.24,"healthy_tick_floor":0.9}"""

    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"reps":$reps,"sf":"$sfDir","guard":$guardJson}"""
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
