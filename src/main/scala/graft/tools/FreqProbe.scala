package graft.tools

/** Dev probe: pure-ALU thread scaling (no allocation, no memory traffic).
  * Separates the machine's intrinsic multi-core ceiling — all-core turbo
  * frequency reduction — from workload-caused scaling loss. On a real
  * N→4N EXECUTOR scale-up this ceiling does not exist: added executors
  * bring their own sockets (frequency, caches, DRAM channels) with them,
  * while this sandbox's 8→32 threads share one socket. */
object FreqProbe {
  private def work(seed: Long, iters: Long): Long = {
    var h = seed
    var i = 0L
    while (i < iters) { h ^= h << 13; h ^= h >>> 7; h ^= h << 17; h += i; i += 1 }
    h
  }

  def main(args: Array[String]): Unit = {
    work(1, 50_000_000L) // JIT warmup
    var sink = 0L
    val results = Seq(1, 8, 32).map { t =>
      val iters = 600_000_000L
      val threads = (0 until t).map { s =>
        new Thread(() => { sink ^= work(s, iters) })
      }
      val t0 = System.nanoTime()
      threads.foreach(_.start()); threads.foreach(_.join())
      val el = (System.nanoTime() - t0) / 1e9
      println(f"threads=$t%2d time=$el%6.2fs per_core_rate=${iters / el / 1e9}%.3f Gop/s")
      t -> iters / el / 1e9
    }.toMap
    println(f"pure-ALU efficiency 1->8: ${results(8) / results(1)}%.3f  8->32: ${results(32) / results(8)}%.3f")
    if (sink == 42) println(sink) // keep the JIT honest
  }
}
