package graft.mixer

import org.apache.spark.sql.Column

/** jq-subset interpreter — the generic fallback for mixer predicates and
  * span selectors outside [[PredicateCompiler]]'s grammar.
  *
  * The reference compiles arbitrary jq with the jaq crate
  * (/root/reference/src/filters.rs:250-385 doc filters, :9-76 selectors);
  * this is an original interpreter for the subset its configs and test
  * vectors actually use (filters.rs:483-682, incl. the real dolma-1.7
  * predicates): path navigation with optional `?`, array indexing incl.
  * negative, pipes, parens, `length`/`add`/`map(f)`/`not`, arithmetic,
  * comparisons, `and`/`or`, and literals.
  *
  * Observable semantics mirrored from the reference's own tests:
  *  - expressions produce VALUE STREAMS; binary operators take the
  *    cartesian product of operand streams;
  *  - `and`/`or` short-circuit with jq truthiness (only null/false are
  *    falsy — 0 is TRUE here, unlike the final-output truthiness below);
  *  - field access on a non-object (including null) is an ERROR unless
  *    the segment carries `?` (filters.rs test_jq_missing_attr asserts
  *    the error; plain jq would return null — jaq behavior is the spec);
  *  - unknown functions are a COMPILE error (test_jq_raise_errror_compile);
  *  - final-output truthiness (evaluate_match, filters.rs:299-317):
  *    null→false, bool→itself, number→ ≠0, string/array/object→nonempty;
  *  - include: OR across filters, each filter true iff its output stream
  *    is nonempty and ALL outputs truthy (filters.rs:327-357);
  *  - exclude: drop iff some filter yields a truthy output; an empty
  *    output stream keeps the doc (filters.rs:359-383).
  */
object Jq {

  // ---- value model ----------------------------------------------------
  sealed trait JqVal extends Serializable
  case object JNull extends JqVal
  final case class JBool(b: Boolean) extends JqVal
  final case class JNum(n: Double) extends JqVal
  final case class JStr(s: String) extends JqVal
  final case class JArr(items: Vector[JqVal]) extends JqVal
  final case class JObj(fields: Map[String, JqVal]) extends JqVal

  final class JqError(msg: String) extends RuntimeException(msg)

  /** jq truthiness (used by and/or): only null and false are falsy. */
  private def jqTruth(v: JqVal): Boolean = v match {
    case JNull => false
    case JBool(b) => b
    case _ => true
  }

  /** Final-output truthiness (evaluate_match). */
  def outputTruth(v: JqVal): Boolean = v match {
    case JNull => false
    case JBool(b) => b
    case JNum(n) => n != 0.0
    case JStr(s) => s.nonEmpty
    case JArr(a) => a.nonEmpty
    case JObj(o) => o.nonEmpty
  }

  // ---- AST ------------------------------------------------------------
  sealed trait Expr extends Serializable
  case object Identity extends Expr
  final case class Field(name: String, optional: Boolean) extends Expr
  final case class Index(idx: Int, optional: Boolean) extends Expr
  final case class Chain(steps: Vector[Expr]) extends Expr // path application
  final case class Pipe(l: Expr, r: Expr) extends Expr
  final case class Lit(v: JqVal) extends Expr
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  final case class AndOr(isAnd: Boolean, l: Expr, r: Expr) extends Expr
  final case class Call(fn: String, arg: Option[Expr]) extends Expr

  // ---- parser (recursive descent over a token list) --------------------
  private final class Parser(input: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < input.length && input.charAt(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < input.length) input.charAt(pos) else '\u0000'
    private def eat(s: String): Boolean = {
      ws()
      if (input.startsWith(s, pos)) { pos += s.length; true } else false
    }
    private def fail(msg: String): Nothing =
      throw new JqError(s"jq parse error at $pos in '$input': $msg")

    def parse(): Expr = {
      val e = pipe()
      ws()
      if (pos != input.length) fail(s"unexpected '${input.substring(pos)}'")
      e
    }

    private def pipe(): Expr = {
      var l = orExpr()
      ws()
      while (peek == '|' && !input.startsWith("||", pos)) { pos += 1; l = Pipe(l, orExpr()); ws() }
      l
    }

    private def kw(name: String): Boolean = {
      ws()
      if (input.startsWith(name, pos) &&
          (pos + name.length >= input.length || {
            val c = input.charAt(pos + name.length)
            !Character.isLetterOrDigit(c) && c != '_'
          })) {
        pos += name.length; true
      } else false
    }

    private def orExpr(): Expr = {
      var l = andExpr()
      while (kw("or")) l = AndOr(isAnd = false, l, andExpr())
      l
    }
    private def andExpr(): Expr = {
      var l = cmpExpr()
      while (kw("and")) l = AndOr(isAnd = true, l, cmpExpr())
      l
    }
    private def cmpExpr(): Expr = {
      val l = addExpr()
      ws()
      val ops = Seq("==", "!=", "<=", ">=", "<", ">")
      ops.find(op => input.startsWith(op, pos)) match {
        case Some(op) => pos += op.length; BinOp(op, l, addExpr())
        case None => l
      }
    }
    private def addExpr(): Expr = {
      var l = mulExpr()
      ws()
      while (peek == '+' || (peek == '-' && {
        // '-' starting a number literal after an operator is handled in primary
        true
      })) {
        val op = peek.toString; pos += 1
        l = BinOp(op, l, mulExpr()); ws()
      }
      l
    }
    private def mulExpr(): Expr = {
      var l = postfix()
      ws()
      while (peek == '*' || peek == '/') {
        val op = peek.toString; pos += 1
        l = BinOp(op, l, postfix()); ws()
      }
      l
    }

    /** primary with trailing path segments (e.g. `(expr).foo[0]?`). */
    private def postfix(): Expr = {
      val p = primary()
      val steps = pathSteps()
      if (steps.isEmpty) p else Pipe(p, Chain(steps))
    }

    private def pathSteps(): Vector[Expr] = {
      val steps = Vector.newBuilder[Expr]
      var more = true
      while (more) {
        ws()
        if (peek == '.' && pos + 1 < input.length &&
            (input.charAt(pos + 1).isLetter || input.charAt(pos + 1) == '_')) {
          pos += 1
          val start = pos
          while (pos < input.length &&
            (input.charAt(pos).isLetterOrDigit || input.charAt(pos) == '_')) pos += 1
          val name = input.substring(start, pos)
          val opt = eatOpt()
          steps += Field(name, opt)
        } else if (peek == '[') {
          pos += 1; ws()
          val neg = peek == '-'
          if (neg) pos += 1
          val start = pos
          while (pos < input.length && input.charAt(pos).isDigit) pos += 1
          if (pos == start) fail("expected array index")
          val idx = input.substring(start, pos).toInt * (if (neg) -1 else 1)
          ws()
          if (peek != ']') fail("expected ]")
          pos += 1
          steps += Index(idx, eatOpt())
        } else more = false
      }
      steps.result()
    }

    private def eatOpt(): Boolean = { if (peek == '?') { pos += 1; true } else false }

    private val KnownFns = Set("length", "add", "not", "map")

    private def primary(): Expr = {
      ws()
      peek match {
        case '(' =>
          pos += 1
          val e = pipe()
          ws()
          if (peek != ')') fail("expected )")
          pos += 1
          e
        case '.' =>
          // identity or leading path
          pos += 1
          if (peek == '?') { pos += 1; Identity }
          else {
            pos -= 1
            val steps = pathSteps()
            if (steps.isEmpty) { pos += 1; Identity } else Chain(steps)
          }
        case '"' =>
          pos += 1
          val sb = new StringBuilder
          while (pos < input.length && input.charAt(pos) != '"') {
            val c = input.charAt(pos)
            if (c == '\\' && pos + 1 < input.length) {
              // standard JSON escapes — appending the raw character would
              // turn "a\nb" into "anb" and silently mis-match documents
              input.charAt(pos + 1) match {
                case 'n' => sb.append('\n'); pos += 2
                case 't' => sb.append('\t'); pos += 2
                case 'r' => sb.append('\r'); pos += 2
                case 'b' => sb.append('\b'); pos += 2
                case 'f' => sb.append('\f'); pos += 2
                case 'u' if pos + 5 < input.length =>
                  val hex = input.substring(pos + 2, pos + 6)
                  val cp = Integer.parseInt(hex, 16)
                  sb.append(cp.toChar); pos += 6
                case other => sb.append(other); pos += 2 // \" \\ \/ etc.
              }
            }
            else { sb.append(c); pos += 1 }
          }
          if (pos >= input.length) fail("unterminated string")
          pos += 1
          Lit(JStr(sb.toString))
        case c if c.isDigit || c == '-' =>
          val start = pos
          if (peek == '-') pos += 1
          var prevExp = false
          while (pos < input.length && {
            val ch = input.charAt(pos)
            ch.isDigit || ch == '.' || ch == 'e' || ch == 'E' ||
              // exponent SIGN: only directly after e/E (1e-4, 2.5E+10)
              (prevExp && (ch == '+' || ch == '-'))
          }) { prevExp = input.charAt(pos) == 'e' || input.charAt(pos) == 'E'; pos += 1 }
          val txt = input.substring(start, pos)
          val num = txt.toDoubleOption.getOrElse(
            fail(s"malformed number literal '$txt'"))
          Lit(JNum(num))
        case c if c.isLetter =>
          val start = pos
          while (pos < input.length &&
            (input.charAt(pos).isLetterOrDigit || input.charAt(pos) == '_')) pos += 1
          input.substring(start, pos) match {
            case "null" => Lit(JNull)
            case "true" => Lit(JBool(true))
            case "false" => Lit(JBool(false))
            case fn if KnownFns.contains(fn) =>
              ws()
              if (peek == '(') {
                pos += 1
                val arg = pipe()
                ws()
                if (peek != ')') fail("expected )")
                pos += 1
                Call(fn, Some(arg))
              } else Call(fn, None)
            // unknown function = compile error (filters.rs
            // test_jq_raise_errror_compile: '.x | sum' must fail to build)
            case other => fail(s"unknown jq function '$other'")
          }
        case _ => fail("expected expression")
      }
    }
  }

  /** Compile (throws JqError on parse/unknown-function). */
  def compile(expr: String): Expr = new Parser(expr).parse()

  // ---- evaluation -------------------------------------------------------
  def eval(e: Expr, v: JqVal): Vector[JqVal] = e match {
    case Identity => Vector(v)
    case Lit(x) => Vector(x)
    case Chain(steps) =>
      steps.foldLeft(Vector(v)) { (vs, step) => vs.flatMap(eval(step, _)) }
    case Field(name, opt) => v match {
      case JObj(f) => Vector(f.getOrElse(name, JNull))
      // NOTE: stock jq yields null for `null | .x`, but the reference's
      // jaq ERRORS on it and dolma pins that (filters.rs:666-682
      // test_jq_missing_attr expects is_err) — so indexing null without
      // `?` stays an error here. Use `.a.b?` for the lenient form.
      case _ =>
        if (opt) Vector.empty
        else throw new JqError(s"cannot index ${typeName(v)} with '$name'")
    }
    case Index(i, opt) => v match {
      case JArr(a) =>
        val j = if (i < 0) a.length + i else i
        Vector(if (j >= 0 && j < a.length) a(j) else JNull)
      case JNull => if (opt) Vector.empty else Vector(JNull)
      case _ =>
        if (opt) Vector.empty
        else throw new JqError(s"cannot index ${typeName(v)} with number")
    }
    case Pipe(l, r) => eval(l, v).flatMap(eval(r, _))
    case AndOr(isAnd, l, r) =>
      eval(l, v).flatMap { lv =>
        val lt = jqTruth(lv)
        if (isAnd) {
          if (!lt) Vector(JBool(false))
          else eval(r, v).map(rv => JBool(jqTruth(rv)))
        } else {
          if (lt) Vector(JBool(true))
          else eval(r, v).map(rv => JBool(jqTruth(rv)))
        }
      }
    case BinOp(op, l, r) =>
      for { lv <- eval(l, v); rv <- eval(r, v) } yield binop(op, lv, rv)
    case Call("length", None) => Vector(v match {
      case JNull => JNum(0)
      case JArr(a) => JNum(a.length)
      case JObj(o) => JNum(o.size)
      case JStr(s) => JNum(s.codePointCount(0, s.length))
      case JNum(n) => JNum(math.abs(n))
      case JBool(_) => throw new JqError("boolean has no length")
    })
    case Call("add", None) => v match {
      case JArr(a) =>
        if (a.isEmpty) Vector(JNull)
        else Vector(a.reduce((x, y) => binop("+", x, y)))
      case other => throw new JqError(s"cannot add ${typeName(other)}")
    }
    case Call("not", None) => Vector(JBool(!jqTruth(v)))
    case Call("map", Some(f)) => v match {
      case JArr(a) => Vector(JArr(a.flatMap(eval(f, _))))
      case other => throw new JqError(s"cannot map over ${typeName(other)}")
    }
    case Call(fn, _) => throw new JqError(s"unknown jq function '$fn'")
  }

  private def typeName(v: JqVal): String = v match {
    case JNull => "null"
    case _: JBool => "boolean"
    case _: JNum => "number"
    case _: JStr => "string"
    case _: JArr => "array"
    case _: JObj => "object"
  }

  private def binop(op: String, l: JqVal, r: JqVal): JqVal = op match {
    case "==" => JBool(valEq(l, r))
    case "!=" => JBool(!valEq(l, r))
    case "<" | "<=" | ">" | ">=" =>
      val c = valCmp(l, r)
      JBool(op match {
        case "<" => c < 0
        case "<=" => c <= 0
        case ">" => c > 0
        case ">=" => c >= 0
      })
    case "+" => (l, r) match {
      case (JNum(a), JNum(b)) => JNum(a + b)
      case (JStr(a), JStr(b)) => JStr(a + b)
      case (JArr(a), JArr(b)) => JArr(a ++ b)
      case (JNull, x) => x
      case (x, JNull) => x
      case _ => throw new JqError(s"cannot add ${typeName(l)} and ${typeName(r)}")
    }
    case "-" => (l, r) match {
      case (JNum(a), JNum(b)) => JNum(a - b)
      case _ => throw new JqError(s"cannot subtract ${typeName(r)} from ${typeName(l)}")
    }
    case "*" => (l, r) match {
      case (JNum(a), JNum(b)) => JNum(a * b)
      case _ => throw new JqError(s"cannot multiply ${typeName(l)} and ${typeName(r)}")
    }
    case "/" => (l, r) match {
      case (JNum(a), JNum(b)) =>
        if (b == 0.0) throw new JqError("division by zero") else JNum(a / b)
      case _ => throw new JqError(s"cannot divide ${typeName(l)} by ${typeName(r)}")
    }
  }

  private def valEq(l: JqVal, r: JqVal): Boolean = (l, r) match {
    case (JNum(a), JNum(b)) => a == b
    case (JStr(a), JStr(b)) => a == b
    case (JBool(a), JBool(b)) => a == b
    case (JNull, JNull) => true
    case (JArr(a), JArr(b)) =>
      a.length == b.length && a.zip(b).forall { case (x, y) => valEq(x, y) }
    case (JObj(a), JObj(b)) =>
      a.keySet == b.keySet && a.forall { case (k, x) => valEq(x, b(k)) }
    case _ => false
  }

  /** jq total order: null < false < true < numbers < strings < arrays <
    * objects. */
  private def typeRank(v: JqVal): Int = v match {
    case JNull => 0
    case JBool(false) => 1
    case JBool(true) => 2
    case _: JNum => 3
    case _: JStr => 4
    case _: JArr => 5
    case _: JObj => 6
  }
  private def valCmp(l: JqVal, r: JqVal): Int = (l, r) match {
    case (JNum(a), JNum(b)) => java.lang.Double.compare(a, b)
    case (JStr(a), JStr(b)) => a.compareTo(b)
    case (JArr(a), JArr(b)) =>
      a.zip(b).iterator.map { case (x, y) => valCmp(x, y) }.find(_ != 0)
        .getOrElse(Integer.compare(a.length, b.length))
    case _ => Integer.compare(typeRank(l), typeRank(r))
  }

  // ---- doc filter (filters.rs:250-385) ---------------------------------
  final class DocFilter(includeSrc: Seq[String], excludeSrc: Seq[String])
      extends Serializable {
    private val include = includeSrc.map(compile)
    private val exclude = excludeSrc.map(compile)

    def shouldKeep(doc: JqVal): Boolean = {
      var keep = include.isEmpty
      val incIt = include.iterator
      while (!keep && incIt.hasNext) {
        val out = eval(incIt.next(), doc)
        keep = out.nonEmpty && out.forall(outputTruth)
      }
      val excIt = exclude.iterator
      while (keep && excIt.hasNext) {
        val out = eval(excIt.next(), doc)
        keep = out.forall(v => !outputTruth(v))
      }
      keep
    }
  }

  // ---- span selector (filters.rs:9-76) ----------------------------------
  /** Runs the selector and flattens outputs into (start, end, score)
    * triples: each output is either a span list or a single span (a
    * 2-or-3-element numeric array; score defaults to 1.0 for pairs). */
  final class Selector(src: String) extends Serializable {
    private val expr = compile(src)
    def selectSpans(doc: JqVal): Vector[(Long, Long, Double)] = {
      def asSpan(v: JqVal): Option[(Long, Long, Double)] = v match {
        case JArr(Vector(JNum(s), JNum(e))) => Some((s.toLong, e.toLong, 1.0))
        case JArr(items) if items.length >= 3 =>
          (items(0), items(1), items(2)) match {
            case (JNum(s), JNum(e), JNum(sc)) => Some((s.toLong, e.toLong, sc))
            case _ => None
          }
        case _ => None
      }
      eval(expr, doc).flatMap {
        case JNull => Vector.empty
        case a @ JArr(items) =>
          asSpan(a).map(Vector(_)).getOrElse(items.flatMap(asSpan))
        case _ => Vector.empty
      }
    }
  }

  // ---- bridges -----------------------------------------------------------
  /** Build a JqVal doc from the mixer's row shape: id, text, source, and
    * the attributes map (name → array of (start, end, score) structs). */
  def docFromRow(id: String, text: String, source: String,
      attrs: Map[String, Seq[(Long, Long, Double)]]): JqVal =
    JObj(Map(
      "id" -> JStr(if (id == null) "" else id),
      "text" -> JStr(if (text == null) "" else text),
      "source" -> JStr(if (source == null) "" else source),
      "attributes" -> JObj(attrs.map { case (k, spans) =>
        k -> JArr(spans.iterator.map { case (s, e, sc) =>
          JArr(Vector(JNum(s.toDouble), JNum(e.toDouble), JNum(sc)))
        }.toVector)
      })))

  /** Predicate Columns for the mixer: the row is serialized to JSON
    * (id/text/attributes — the document shape the reference's jq programs
    * address) and evaluated by the interpreter in a UDF. This is the
    * FALLBACK path for predicates [[PredicateCompiler]]'s grammar can't
    * express — the compiled-Column path stays the hot path, so the
    * per-row to_json cost only applies to configs that need generic jq. */
  /** Row → document JSON with spans as `[start, end, score]` TRIPLES (the
    * shape the reference's jq programs index into, e.g. `.[0][-1]`) — a
    * struct would serialize as an object. `extra` carries the rest of the
    * document shape (source, metadata, created, added, ...) so fallback
    * predicates like `.source == "cc"` or `.metadata.x` see the same
    * document [[docFromRow]] exposes, not JNull. */
  private def docJsonColumn(attributes: Column, id: Column, text: Column,
      extra: Seq[(String, Column)]): Column = {
    import org.apache.spark.sql.functions._
    val tripleAttrs = transform_values(attributes, (_, spans) =>
      transform(spans, s => array(
        s.getField("start").cast("double"),
        s.getField("end").cast("double"),
        s.getField("score"))))
    val fields = Seq(id.as("id"), text.as("text"), tripleAttrs.as("attributes")) ++
      extra.map { case (n, c) => c.as(n) }
    // keep null fields in the JSON (to_json drops them by default): a
    // null attributes map must surface as JNull — same shape as
    // docFromRow — so predicates evaluate to false instead of differing
    // between the two doc-construction paths
    to_json(struct(fields: _*),
      java.util.Collections.singletonMap("ignoreNullFields", "false"))
  }

  def includeColumn(exprSrc: String, attributes: Column, id: Column,
      text: Column, extra: Seq[(String, Column)] = Seq.empty): Column = {
    val compiled = compile(exprSrc) // fail fast at plan time
    val f = org.apache.spark.sql.functions.udf { (json: String) =>
      val out = eval(compiled, parseJson(json))
      out.nonEmpty && out.forall(outputTruth)
    }
    f(docJsonColumn(attributes, id, text, extra))
  }

  /** True = drop signal (some output truthy); empty output keeps. */
  def excludeColumn(exprSrc: String, attributes: Column, id: Column,
      text: Column, extra: Seq[(String, Column)] = Seq.empty): Column = {
    val compiled = compile(exprSrc)
    val f = org.apache.spark.sql.functions.udf { (json: String) =>
      eval(compiled, parseJson(json)).exists(outputTruth)
    }
    f(docJsonColumn(attributes, id, text, extra))
  }

  // shared mapper: readTree is thread-safe and ObjectMapper construction is
  // expensive — a per-document instance would dominate the fallback's cost
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse a JSON document (jackson) into the JqVal model. */
  def parseJson(json: String): JqVal = fromJackson(jsonMapper.readTree(json))
  private def fromJackson(n: com.fasterxml.jackson.databind.JsonNode): JqVal = {
    import scala.jdk.CollectionConverters._
    if (n == null || n.isNull) JNull
    else if (n.isBoolean) JBool(n.asBoolean())
    else if (n.isNumber) JNum(n.asDouble())
    else if (n.isTextual) JStr(n.asText())
    else if (n.isArray) JArr(n.elements().asScala.map(fromJackson).toVector)
    else JObj(n.fields().asScala.map(e => e.getKey -> fromJackson(e.getValue)).toMap)
  }
}
