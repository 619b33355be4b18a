package graft.tools

import graft.sources.CodeDocs
import graft.taggers.TaggerRegistry

/** Dev microbenchmark: per-tagger single-thread throughput + worst doc. */
object Prof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3000)
    val docs = (0L until n.toLong).map(i => CodeDocs.makeDoc(i, 42L, n.toLong))
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "gopher_v2", "code_redpajama_taggers_v1", "pii_regex_with_counts_fast_v2",
      "repetitions_v1", "code_copyright_comments_v1", "tokenizer_repetitions_v2r2")
    for (name <- names) {
      val t = TaggerRegistry.resolve(name)
      docs.take(200).foreach(d => t.predict(d.content))
      val t0 = System.nanoTime()
      var worst = 0L
      var worstIdx = -1
      docs.zipWithIndex.foreach { case (d, i) =>
        val s = System.nanoTime()
        t.predict(d.content)
        val el = System.nanoTime() - s
        if (el > worst) { worst = el; worstIdx = i }
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"$name%-35s total=$total%8.2fs docs_per_s=${n / total}%9.0f worst=${worst / 1e6}%8.1fms (doc $worstIdx)")
    }
  }
}
