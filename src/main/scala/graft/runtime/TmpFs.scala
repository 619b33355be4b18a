package graft.runtime

/** Spark local-dir selection for the sandbox harnesses (Bench /
  * ScalingBench / Verify): the sandbox's virtual disk is write-throttled
  * under sustained load (measured ~42 ms average write latency), which
  * serializes shuffle-heavy stages while pure-CPU stages run at speed.
  * Shuffle/spill data goes to tmpfs when available — a real cluster
  * brings real local disks with each executor; the sandbox disk quota is
  * not a property any harness here measures. */
object TmpFs {
  def sparkLocalDir(sub: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val disable = sys.env.get("GRAFT_NO_TMPFS").orElse(sys.props.get("graft.no.tmpfs"))
      .exists(v => v == "1" || v == "true")
    if (!disable && java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createDirectories(shm.resolve(sub)).toString
    else sys.props("java.io.tmpdir")
  }

  /** Unique scratch directory under the same fast-local-storage policy as
    * [[sparkLocalDir]] — for harness-local fixture round-trips (WARC/token
    * shard temp dirs) and streaming state checkpoints, which otherwise
    * land on the throttled sandbox disk via `java.io.tmpdir` and serialize
    * on ~42 ms write latency per file. Same GRAFT_NO_TMPFS escape hatch. */
  def scratchDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sparkLocalDir("graft-scratch")), prefix).toString
}
