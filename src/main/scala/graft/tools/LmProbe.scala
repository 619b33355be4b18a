package graft.tools
object LmProbe {
  def main(args: Array[String]): Unit = {
    val corpus = (0L until 200L).map(i => graft.sources.CodeDocs.makeDoc(i, 1234L, 200L).content)
    val lm = graft.ml.KenLm.train(corpus, order = 2)
    println(s"[probe] uni=${lm.tables(1).size} bi=${lm.tables(2).size} unk=${lm.unkLogProb}")
  }
}
