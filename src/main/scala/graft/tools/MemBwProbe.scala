package graft.tools

/** Dev probe: memory-BANDWIDTH thread scaling (the ceiling the pure-ALU
  * [[FreqProbe]] cannot see). Each thread streams over its own 64 MiB
  * long array (sum-reduce, stride 1 — a read-bandwidth STREAM analogue);
  * aggregate GB/s at 2/8/32 threads bounds how shuffle- and scan-heavy
  * stages can scale on this single-socket box. On a real N→4N EXECUTOR
  * scale-up added executors bring their own DRAM channels, so a flat
  * aggregate-bandwidth curve here is a machine property, not an engine
  * property — it caps ANY workload whose working set misses cache.
  */
object MemBwProbe {
  private val WordsPerThread = 8 * 1024 * 1024 // 64 MiB of longs

  private def sweep(a: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i); i += 1 }
    s
  }

  @volatile private var sink = 0L

  /** Aggregate read bandwidth in GB/s at `t` threads, `passes` sweeps. */
  def rate(t: Int, passes: Int = 8): Double = {
    val arrays = Array.fill(t)(Array.tabulate(WordsPerThread)(_.toLong))
    // touch once: fault pages in before timing
    arrays.foreach(a => sink ^= sweep(a))
    val threads = arrays.map(a => new Thread(() => {
      var p = 0; var s = 0L
      while (p < passes) { s += sweep(a); p += 1 }
      sink ^= s
    }))
    val t0 = System.nanoTime()
    threads.foreach(_.start()); threads.foreach(_.join())
    val el = (System.nanoTime() - t0) / 1e9
    t.toLong * WordsPerThread * 8L * passes / el / 1e9
  }

  def main(args: Array[String]): Unit = {
    rate(1, 2) // JIT + allocator warmup
    val r = Seq(1, 2, 8, 32).map { t =>
      val bw = rate(t)
      println(f"threads=$t%2d aggregate=${bw}%7.2f GB/s per_thread=${bw / t}%6.2f GB/s")
      t -> bw
    }.toMap
    println(f"membw efficiency 2->8: ${r(8) / r(2) / 4}%.3f  8->32: ${r(32) / r(8) / 4}%.3f")
    if (sink == 42) println(sink)
  }
}
