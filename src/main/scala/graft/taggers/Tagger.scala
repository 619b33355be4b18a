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

/** A user extension point: a class (or Scala `object`) that registers
  * custom taggers — the JVM analog of a reference "extra taggers" module
  * (tests/python/test_extra.py's `extras_*` packages, each of which
  * registers taggers at import time). */
trait TaggerModule {
  def register(): Unit
}

/** Name → tagger resolution (reference `TaggerRegistry.add/get`). */
object TaggerRegistry {
  private val taggers = TrieMap.empty[String, () => Tagger]
  private val importedModules = TrieMap.empty[String, Unit]

  /** JVM analog of the reference's `import_modules`
    * (core/utils.py:118-160, exercised by tests/python/test_extra.py):
    * load user tagger modules by fully-qualified class or Scala-object
    * name, so configs can use custom taggers without touching the engine.
    * A Scala `object` registers in its initializer (forced here); a class
    * implementing [[TaggerModule]] is instantiated and `register()`
    * called; any other class may register from its constructor.
    * Import-once memoized per JVM, like the reference (utils.py:139-147).
    * The reference's import-by-file-path form has no JVM analog — user
    * code ships as a jar on the Spark classpath (`--jars`), which is the
    * deployment story `spark-submit` already owns.
    *
    * Resolution happens inside `mapPartitions` tasks, so [[TagRunner]]
    * threads the module list into every task: each executor JVM imports
    * the modules before resolving names (the reference re-imports per
    * worker process the same way, core/runtime.py). */
  def importModules(modules: Seq[String]): Unit = modules.foreach { m =>
    importedModules.getOrElseUpdate(m, {
      def lookup(n: String): Option[Class[_]] =
        try Some(Class.forName(n)) catch { case _: ClassNotFoundException => None }
      val plain = lookup(m)
      val objCls = lookup(m + "$")
      // a TaggerModule CLASS wins over a same-named companion object (the
      // companion would otherwise shadow it and register() never run)
      plain match {
        case Some(cls) if classOf[TaggerModule].isAssignableFrom(cls) =>
          cls.getDeclaredConstructor().newInstance()
            .asInstanceOf[TaggerModule].register()
        case _ => objCls match {
          case Some(oc) => oc.getField("MODULE$").get(null) match {
            case tm: TaggerModule => tm.register()
            case _ => () // object-initializer side effects did the work
          }
          case None => plain match {
            case Some(cls) =>
              cls.getDeclaredConstructor().newInstance() // ctor side effects
              ()
            case None => throw new IllegalArgumentException(
              s"Could not import tagger module '$m': no such class or object on " +
                "the classpath. Package custom taggers as a jar and submit it " +
                "with --jars (the reference's import-by-path form has no JVM analog).")
          }
        }
      }
    })
  }

  /** Reference registry names this engine deliberately does NOT implement,
    * each mapped to (implemented equivalent, scope-out rationale). The
    * third-party langid engines (cld2/cld3/langdetect/lingua, reference
    * taggers/language.py:73-298) are redundant with the fastText family —
    * same document model, same span/score shape, different native library;
    * presidio (pii.py:162-165) is a heavyweight NER service the regex PII
    * taggers replace. Resolving one of these names fails with a pointer
    * to the equivalent instead of a bare miss. */
  val scopedOutAliases: Map[String, (String, String)] = {
    val langidWhy =
      "third-party langid engine scoped out (redundant with the fastText family)"
    val byShape = Map(
      "doc_v2" -> "ft_lang_id_doc_v1",
      "en_doc_v2" -> "ft_lang_id_en_doc_v2",
      "paragraph_v2" -> "ft_lang_id_paragraph_v1",
      "en_paragraph_v2" -> "ft_lang_id_en_paragraph_v2",
      "en_paragraph_with_doc_score_v2" -> "ft_lang_id_en_paragraph_with_doc_score_v2")
    val cld = for {
      engine <- Seq("cld2", "cld3")
      (shape, eq) <- byShape
      // the reference registers cld3 only in the en_doc/en_paragraph/
      // with_doc_score shapes (language.py:73-90,328)
      if engine == "cld2" || shape.startsWith("en_")
    } yield s"${engine}_$shape" -> (eq, langidWhy)
    val langdetect = Seq(
      "langdetect_doc_v1" -> ("ft_lang_id_doc_v1", langidWhy),
      "langdetect_doc_en_v1" -> ("ft_lang_id_en_doc_v2", langidWhy),
      "langdetect_paragraph_v1" -> ("ft_lang_id_paragraph_v1", langidWhy),
      "langdetect_en_paragraph_v1" -> ("ft_lang_id_en_paragraph_v2", langidWhy))
    val lingua = Seq(
      "lingua_doc_v1" -> ("ft_lang_id_doc_v1", langidWhy),
      "lingua_1e2" -> ("ft_lang_id_1e2", langidWhy),
      "lingua_doc_en_v1" -> ("ft_lang_id_en_doc_v2", langidWhy),
      "lingua_en_only_v1" -> ("ft_lang_id_en_only_v2", langidWhy),
      "lingua_par_v1" -> ("ft_lang_id_paragraph_v1", langidWhy),
      "lingua_en_par_v1" -> ("ft_lang_id_en_paragraph_v2", langidWhy))
    val pii = Seq("pii_presidio_v1" -> ("pii_regex_with_counts_fast_v2",
      "presidio NER service scoped out (regex PII taggers cover the reference's span shape)"))
    (cld ++ langdetect ++ lingua ++ pii).toMap
  }

  def register(name: String)(factory: => Tagger): Unit =
    taggers.put(name, () => factory)

  def get(name: String): Tagger =
    taggers.getOrElse(name,
      scopedOutAliases.get(name) match {
        case Some((equivalent, why)) => throw new NoSuchElementException(
          s"Tagger '$name' is a reference registry name this engine scopes out: " +
            s"$why. Use '$equivalent' instead.")
        case None => throw new NoSuchElementException(
          s"Unknown tagger '$name'. Known: ${taggers.keys.toSeq.sorted.mkString(", ")}")
      })()

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
