package graft.tools
object ToxProbe {
  def main(args: Array[String]): Unit = {
    val m = graft.taggers.FastTextTaggers.toxicity
    val clean = Seq(
      "def compute(x): return x + 1",
      "the function returns a list of sorted values from the input stream",
      "import os and read the configuration file before parsing arguments",
      "this module implements a simple cache with least recently used eviction")
    val toxic = Seq(
      "hate stupid idiot trash garbage awful hate stupid",
      "you stupid idiot i hate this garbage trash awful nonsense",
      "what an awful stupid trash idea from a garbage idiot")
    clean.foreach(t => println(f"clean ${m.scoreLabel(t, "toxic")}%.4f  $t"))
    toxic.foreach(t => println(f"toxic ${m.scoreLabel(t, "toxic")}%.4f  $t"))
  }
}
