package graft.tools

import graft.dedup.ReferenceDedup

object NgramDebug {
  def main(args: Array[String]): Unit = {
    val lines = scala.io.Source.fromInputStream(
      new java.util.zip.GZIPInputStream(new java.io.FileInputStream(
        "/root/reference/tests/data/provided/deduper/documents/000.json.gz")), "UTF-8").getLines().toVector
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val docs = lines.map { l =>
      val n = mapper.readTree(l)
      (n.get("id").asText(), n.get("text").asText())
    }
    val n = 6; val stride = 3
    // selection variants to fingerprint the reference behavior
    def select(toks: Vector[String], variant: String): Vector[Vector[String]] = {
      val out = Vector.newBuilder[Vector[String]]
      var last = 0
      var taken0 = false
      var wi = n - 1
      while (wi < toks.length) {
        val start = wi - (n - 1)
        val take = variant match {
          case "A" => last == 0 || start - last >= stride
          case "B" => start == 0 || start - last >= stride
          case "C" => start % stride == 0
          case "D" => !taken0 || start - last >= stride
        }
        if (take) { last = start; taken0 = true; out += toks.slice(start, start + n) }
        wi += 1
      }
      out.result()
    }
    for (variant <- Seq("A", "B", "C", "D")) {
      val seen = scala.collection.mutable.HashSet.empty[String]
      val fallbackSeen = scala.collection.mutable.HashSet.empty[String]
      println(s"== variant $variant")
      docs.foreach { case (id, text) =>
        ReferenceDedup.splitParas(id, 0L, text).foreach { p =>
          val toks = ReferenceDedup.unisegTokens(p.text)
          val sel = select(toks, variant).map(_.mkString(" "))
          if (sel.length < 2) {
            val key = "P" + p.text
            val dup = fallbackSeen.contains(key)
            if (!dup) fallbackSeen += key
          } else {
            var dups = 0
            sel.foreach { g => if (seen.contains(g)) dups += 1 else seen += g }
            val frac = dups.toFloat / sel.length
            if (frac >= 0.4)
              println(f"  $id%-70s ${p.start}-${p.end} grams=${sel.length} dups=$dups frac=$frac%.6f")
          }
        }
      }
    }
  }
}
