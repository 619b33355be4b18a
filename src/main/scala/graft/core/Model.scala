package graft.core

/** Core data model, mirroring the reference's document/attribute types
  * (/root/reference/python/dolma/core/data_types.py:19-39) re-expressed for
  * the BASELINE input table `(repo, path, commit, lang, content)`.
  */

/** One source-code file row (BASELINE.json input_hint). */
final case class Doc(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
) {
  /** Stable unique id (reference: `id` unique within source,
    * docs/data-format.md:53-62). */
  def id: String = s"$repo:$path@$commit"
}

/** A scored span over a document, offsets in Unicode code points
  * (data_types.py:173-252). `end` exclusive. */
final case class Span(start: Long, end: Long, typ: String, score: Double)

/** Tagger output row: one per (doc, experiment), attribute name →
  * span triples (data_types.py:36-39 `OutputSpec`). */
final case class AttrRow(id: String, attributes: Map[String, Seq[SpanTriple]])

/** Serialized span: (start, end, score) — the JSON triple format of
  * attribute files (data_types.py:14-16). */
final case class SpanTriple(start: Long, end: Long, score: Double)

object Attributes {

  /** Reference attribute-name mangling: `exp__tagger__type` with non-alnum
    * chars replaced by `_` (core/runtime.py:214-217, core/utils.py:55-66). */
  def mangle(experiment: String, tagger: String, typ: String): String =
    s"${sanitize(experiment)}__${sanitize(tagger)}__${sanitize(typ)}"

  /** make_variable_name (core/registry.py): ASCII [a-zA-Z0-9_] survive,
    * everything else becomes '_' — Char.isLetterOrDigit would keep
    * non-ASCII letters and mangle differently than the reference. */
  def sanitize(name: String): String =
    name.map(c => if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_') c else '_')

  /** Score rounding applied at emission (core/taggers.py:22,49). */
  def roundScore(score: Double, digits: Int = 5): Double = {
    if (score.isNaN || score.isInfinite) score
    // Python round() half-even-rounds the EXACT binary value of the
    // double; scala's BigDecimal(double) goes through Double.toString
    // (shortest decimal repr), which lands on artificial ties — e.g.
    // 1.0/320 prints as "0.003125" and HALF_EVEN gives 0.00312, while the
    // stored binary is fractionally above the tie and Python gives
    // 0.00313. The exact java.math.BigDecimal(double) constructor matches
    // Python on every value.
    else new java.math.BigDecimal(score)
      .setScale(digits, java.math.RoundingMode.HALF_EVEN).doubleValue()
  }
}
