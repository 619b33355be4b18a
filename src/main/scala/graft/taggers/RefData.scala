package graft.taggers

/** Loader for the reference's own in-repo data files, vendored verbatim
  * under `src/main/resources/graft/data/`:
  *
  *  - `naughty_words_en.txt` — the C4 blocklist the reference ships and
  *    loads at import time (/root/reference/python/dolma/taggers/c4.py:10-13)
  *  - `ext_to_lang_mapping.json` — file-extension → language routing for
  *    the StarCoder taggers
  *    (/root/reference/python/dolma/taggers/code/code_taggers.py:204-208)
  *
  * These are data (the spec the taggers must match), not code.
  */
object RefData {
  def lines(name: String): Vector[String] = {
    val in = getClass.getResourceAsStream(s"/graft/data/$name")
    require(in != null, s"missing bundled data file: $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
  }

  /** Flat string→string JSON object. */
  def jsonMap(name: String): Map[String, String] = {
    val in = getClass.getResourceAsStream(s"/graft/data/$name")
    require(in != null, s"missing bundled data file: $name")
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      val b = Map.newBuilder[String, String]
      node.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText())
      b.result()
    } finally in.close()
  }

  /** NAUGHTY_WORDS: entries without a space, matched at word level
    * (c4.py:12). */
  lazy val naughtyWords: Set[String] =
    lines("naughty_words_en.txt").filterNot(_.contains(" ")).toSet

  /** NAUGHTY_PHRASES: entries with a space, matched as substrings
    * (c4.py:13). */
  lazy val naughtyPhrases: Vector[String] =
    lines("naughty_words_en.txt").filter(_.contains(" "))

  /** ext → language map for StarCoder nl_ratio routing. */
  lazy val extToLang: Map[String, String] =
    jsonMap("ext_to_lang_mapping.json")
}
