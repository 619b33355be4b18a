package graft.tools

import graft.sources.CodeDocs
import graft.taggers.TaggerRegistry

import java.util.concurrent.atomic.AtomicLong

/** Dev probe: raw battery scaling with plain threads (no Spark). */
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val n = 60000
    val docs = (0L until n.toLong).map(i => CodeDocs.makeDoc(i, 42L, n.toLong)).toArray
    val names = Seq("gopher_v2", "code_redpajama_taggers_v1",
      "pii_regex_with_counts_fast_v2", "tokenizer_repetitions_v2r2",
      "code_copyright_comments_v1", "jigsaw_toxicity_paragraph_v1")
    def run(threads: Int): Double = {
      val next = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        new Thread(() => {
          val taggers = names.map(TaggerRegistry.resolve)
          var i = next.getAndAdd(100)
          while (i < n) {
            val end = math.min(i + 100, n)
            var j = i
            while (j < end) {
              taggers.foreach(_.predict(docs(j.toInt).content))
              j += 1
            }
            i = next.getAndAdd(100)
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    run(4) // warmup
    for (t <- Seq(1, 8, 32)) {
      val el = run(t)
      println(f"threads=$t%2d time=$el%6.2fs docs_per_s=${n / el}%9.0f per_core=${n / el / t}%7.0f")
    }
  }
}
