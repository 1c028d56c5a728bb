package graft.core

import scala.collection.mutable.ArrayBuffer

/** Minimal recursive-descent JSON parser (objects, arrays, strings
  * with escapes, numbers, booleans, null) for container metadata
  * blocks (RAD headers, chunk metas). Values decode to
  * Map[String, Any] / Vector[Any] / String / Double / Boolean / null.
  * Strict enough for well-formed metadata; malformed input is a named
  * error (the codecs' corrupt-input contract), never a crash. */
object MiniJson {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.at >= s.length, s"json: trailing garbage at ${p.at}")
    v
  }

  def obj(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other => throw new IllegalArgumentException(s"json: expected object, got $other")
  }

  def arr(v: Any): Vector[Any] = v match {
    case a: Vector[_] => a.asInstanceOf[Vector[Any]]
    case other => throw new IllegalArgumentException(s"json: expected array, got $other")
  }

  def num(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case other => throw new IllegalArgumentException(s"json: expected number, got $other")
  }

  def str(v: Any): String = v match {
    case s: String => s
    case other => throw new IllegalArgumentException(s"json: expected string, got $other")
  }

  /** JSON-escape + quote a string. */
  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private final class P(s: String) {
    var at = 0
    def ws(): Unit = while (at < s.length && (s(at) == ' ' || s(at) == '\n' || s(at) == '\t' || s(at) == '\r')) at += 1
    private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"json: $msg at offset $at")
    private def expect(c: Char): Unit = {
      if (at >= s.length || s(at) != c) fail(s"expected '$c'")
      at += 1
    }

    // untrusted-bytes contract: crafted nesting ("[[[[…" ×100k) must
    // raise the named parse error, not a StackOverflowError (an Error,
    // which escapes `case _: Exception` recovery in every caller)
    private var depth = 0
    private def deeper[T](body: => T): T = {
      depth += 1
      if (depth > 512) fail("nesting depth > 512")
      val r = body
      depth -= 1
      r
    }

    def value(): Any = {
      ws()
      if (at >= s.length) fail("unexpected end")
      s(at) match {
        case '{' => deeper(obj0())
        case '[' => deeper(arr0())
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => number()
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, at)) fail(s"bad literal")
      at += word.length
      v
    }

    private def obj0(): Map[String, Any] = {
      expect('{'); ws()
      if (at < s.length && s(at) == '}') { at += 1; return Map.empty }
      val m = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws()
        val k = string()
        ws(); expect(':')
        m += k -> value()
        ws()
        if (at < s.length && s(at) == ',') at += 1
        else { expect('}'); done = true }
      }
      m.result()
    }

    private def arr0(): Vector[Any] = {
      expect('['); ws()
      if (at < s.length && s(at) == ']') { at += 1; return Vector.empty }
      val a = new ArrayBuffer[Any]()
      var done = false
      while (!done) {
        a += value()
        ws()
        if (at < s.length && s(at) == ',') at += 1
        else { expect(']'); done = true }
      }
      a.toVector
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (at < s.length && s(at) != '"') {
        if (s(at) == '\\') {
          at += 1
          if (at >= s.length) fail("bad escape")
          s(at) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              if (at + 4 >= s.length) fail("bad unicode escape")
              sb += Integer.parseInt(s.substring(at + 1, at + 5), 16).toChar
              at += 4
            case c => fail(s"bad escape '\\$c'")
          }
        } else {
          // RFC 8259: raw control chars inside strings must be escaped
          if (s(at) < ' ') fail("raw control character in string")
          sb += s(at)
        }
        at += 1
      }
      expect('"')
      sb.toString
    }

    private def number(): Any = {
      val start = at
      // leading '+' is not JSON (RFC 8259 allows only an optional minus);
      // the scan loop below still eats '+'/'-' for exponents, so the first
      // significant char must be checked explicitly
      if (at < s.length && s(at) == '-') at += 1
      if (at >= s.length || !s(at).isDigit) fail("expected number")
      var integral = true
      while (at < s.length && (s(at).isDigit || s(at) == '.' || s(at) == 'e' || s(at) == 'E' || s(at) == '-' || s(at) == '+')) {
        if (!s(at).isDigit && s(at) != '-') integral = false
        at += 1
      }
      if (at == start) fail("expected number")
      val lexeme = s.substring(start, at)
      // int64 fidelity (nlohmann parity): an integral literal that fits a
      // Long keeps its exact digits — 10000000000000000 must round-trip as
      // itself, never 1.0E16 — with Double only for fractional/exponent/
      // overflow forms. `num` widens Long to Double for numeric consumers.
      if (integral) lexeme.toLongOption match {
        case Some(l) => return l
        case None => ()
      }
      try lexeme.toDouble
      catch { case _: NumberFormatException => fail("malformed number") }
    }
  }
}
