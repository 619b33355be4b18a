package graft.mixer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler from the reference's filter-predicate strings to Catalyst
  * `Column`s — replacing the runtime jq/JSONPath engines
  * (/root/reference/src/filters.rs:250-439) with plan-time compilation, so
  * the predicate participates in codegen/pushdown instead of evaluating an
  * interpreter per row.
  *
  * Supported grammar (covers the shapes the reference ships and tests,
  * filters.rs:631-663 — the real dolma-1.7 predicates):
  *
  *   expr    := or
  *   or      := and ('||' and)*          -- jq alt: also 'or'
  *   and     := not ('&&' not)*          -- 'and'
  *   not     := '!' not | cmp | '(' expr ')'
  *   cmp     := path (op number)?        -- bare path = "non-null/truthy"
  *   op      := <= | >= | < | > | == | !=
  *   path    := ('$.' | '.')? 'attributes.' NAME selector*
  *   selector:= '[' INT ']' | '.start' | '.end' | '.score'
  *
  * `attributes.NAME` resolves to the span array `element_at(attributes,
  * NAME)`; `[i]` indexes a span (negative = from end, jq-style);
  * a span compared to a number compares its SCORE (the `[start,end,score]`
  * triple's position 2, matching `$.attributes.x[0][2]` usage); null
  * propagates to false like the reference's null→false rule
  * (filters.rs:299-317).
  */
object PredicateCompiler {

  def compile(input: String): Column = new Parser(input).parseAll()

  /** Keep-decision from include/exclude predicate strings
    * (filters.rs:327-385): include = OR of includes (empty = true);
    * exclude = any exclude true → drop; null → false. */
  def keep(include: Seq[String], exclude: Seq[String]): Column = {
    val cfg = Mixer.MixerConfig(
      include = include.map(compile), exclude = exclude.map(compile))
    Mixer.keepPredicate(cfg)
  }

  private final class Parser(s: String) {
    private var pos = 0

    def parseAll(): Column = {
      val c = parseOr()
      skipWs()
      require(pos >= s.length, s"trailing input at $pos in: $s")
      c
    }

    private def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    private def peek(tok: String): Boolean = {
      skipWs()
      s.regionMatches(pos, tok, 0, tok.length)
    }

    private def eat(tok: String): Boolean = {
      if (peek(tok)) { pos += tok.length; true } else false
    }

    private def parseOr(): Column = {
      var left = parseAnd()
      while (eat("||") || eatWord("or")) left = left || parseAnd()
      left
    }

    private def parseAnd(): Column = {
      var left = parseNot()
      while (eat("&&") || eatWord("and")) left = left && parseNot()
      left
    }

    private def eatWord(w: String): Boolean = {
      skipWs()
      if (s.regionMatches(pos, w, 0, w.length) &&
          (pos + w.length >= s.length || !s.charAt(pos + w.length).isLetterOrDigit)) {
        pos += w.length; true
      } else false
    }

    private def parseNot(): Column = {
      if (eat("!")) return !parseNot()
      if (eat("(")) {
        val inner = parseOr()
        require(eat(")"), s"expected ) at $pos in: $s")
        return inner
      }
      parseCmp()
    }

    private def parseCmp(): Column = {
      val lhs = parsePath()
      skipWs()
      val op = Seq("<=", ">=", "==", "!=", "<", ">").find(eat)
      op match {
        case None => coalesce(lhs.truthy, lit(false))
        case Some(o) =>
          val rhs = parseNumber()
          val l = lhs.numeric
          val c = o match {
            case "<=" => l <= rhs; case ">=" => l >= rhs
            case "<" => l < rhs; case ">" => l > rhs
            case "==" => l === rhs; case "!=" => l =!= rhs
          }
          coalesce(c, lit(false))
      }
    }

    private def parseNumber(): Double = {
      skipWs()
      val start = pos
      if (pos < s.length && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      var prevExp = false
      while (pos < s.length && {
        val ch = s.charAt(pos)
        ch.isDigit || ch == '.' || ch == 'e' || ch == 'E' ||
          // exponent sign directly after e/E: 1e-5, 2.5E+10
          (prevExp && (ch == '+' || ch == '-'))
      }) { prevExp = s.charAt(pos) == 'e' || s.charAt(pos) == 'E'; pos += 1 }
      require(pos > start, s"expected number at $start in: $s")
      val txt = s.substring(start, pos)
      txt.toDoubleOption.getOrElse(
        throw new IllegalArgumentException(s"malformed number '$txt' in: $s"))
    }

    /** A path value that remembers enough to coerce to numeric or truthy. */
    private case class PathValue(col: Column, kind: String) {
      // kind: "spans" (array of triples), "span" (one triple), "scalar"
      def numeric: Column = kind match {
        case "spans" => element_at(col, 1).getField("score") // first span's score
        case "span" => col.getField("score")
        case _ => col
      }
      def truthy: Column = kind match {
        case "spans" => size(col) > 0
        case "span" => col.isNotNull
        case _ => col.isNotNull && col =!= 0.0
      }
    }

    private def parsePath(): PathValue = {
      skipWs()
      eat("$")
      eat(".")
      require(eatWord("attributes"), s"path must start with attributes at $pos in: $s")
      require(eat("."), s"expected . after attributes at $pos in: $s")
      val start = pos
      while (pos < s.length && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
      val name = s.substring(start, pos)
      require(name.nonEmpty, s"expected attribute name at $start in: $s")
      var v = PathValue(element_at(col("attributes"), name), "spans")
      var continue = true
      while (continue) {
        skipWs()
        if (eat("[")) {
          val idx = parseNumber().toInt
          require(eat("]"), s"expected ] at $pos in: $s")
          v.kind match {
            case "spans" =>
              // jq negative index = from the end. A negative index into an
              // EMPTY array resolves to element_at(col, 0) — a hard Spark
              // runtime error, where the reference yields null -> false —
              // so guard the computed position to stay null-safe.
              val c =
                if (idx >= 0) element_at(v.col, idx + 1)
                else {
                  val p = size(v.col) + idx + 1
                  when(p >= 1, element_at(v.col, p))
                }
              v = PathValue(c, "span")
            case "span" =>
              // triple position, negatives from the end like jq:
              // 0/-3 = start, 1/-2 = end, 2/-1 = score
              val f = idx match {
                case 0 | -3 => v.col.getField("start")
                case 1 | -2 => v.col.getField("end")
                case 2 | -1 => v.col.getField("score")
                case other => throw new IllegalArgumentException(
                  s"span triple index $other out of range (0..2 / -3..-1) in: $s")
              }
              v = PathValue(f, "scalar")
            case _ => throw new IllegalArgumentException(s"cannot index scalar at $pos in: $s")
          }
        } else if (peek(".start") || peek(".end") || peek(".score")) {
          val f = if (eat(".start")) "start" else if (eat(".end")) "end" else { eat(".score"); "score" }
          v = PathValue(v.col.getField(f), "scalar")
        } else continue = false
      }
      v
    }
  }
}
