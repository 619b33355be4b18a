package graft.taggers

import graft.core.Span

import scala.collection.concurrent.TrieMap

/** The engine's UDF surface, mirroring the reference's tagger registry
  * (/root/reference/python/dolma/core/registry.py:9-64 and
  * core/taggers.py:25-57): a tagger maps one document's text (plus optional
  * metadata) to scored spans. Taggers are pure and thread-safe; expensive
  * state (compiled regexes, model weights) lives in the instance and is
  * created once per executor (instances are resolved inside `mapPartitions`,
  * matching dolma's once-per-process instantiation, core/runtime.py:260).
  */
trait Tagger extends Serializable {
  def name: String
  def predict(text: String, meta: Map[String, String] = Map.empty): Vector[Span]
}

/** Name → tagger resolution (reference `TaggerRegistry.add/get`). */
object TaggerRegistry {
  private val taggers = TrieMap.empty[String, () => Tagger]

  def register(name: String)(factory: => Tagger): Unit =
    taggers.put(name, () => factory)

  def get(name: String): Tagger =
    taggers.getOrElse(name, throw new NoSuchElementException(
      s"Unknown tagger '$name'. Known: ${taggers.keys.toSeq.sorted.mkString(", ")}"
    ))()

  def names: Seq[String] = { Builtins.ensure(); taggers.keys.toSeq.sorted }

  def resolve(name: String): Tagger = { Builtins.ensure(); get(name) }

  /** Lazily registers all built-in taggers exactly once. */
  private object Builtins {
    lazy val done: Unit = {
      LengthTaggers.registerAll()
      GopherTagger.registerAll()
      C4Tagger.registerAll()
      CodeTaggers.registerAll()
      PiiTaggers.registerAll()
      RepetitionTaggers.registerAll()
      TextQualityTaggers.registerAll()
      UrlTaggers.registerAll()
      LicenseTaggers.registerAll()
      FastTextTaggers.registerAll()
    }
    def ensure(): Unit = done
  }
}
