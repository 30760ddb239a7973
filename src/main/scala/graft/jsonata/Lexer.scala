package graft.jsonata

/** Raised on any parse/eval failure; code follows the public JSONata error-code
  * naming (S=syntax, T=type, D=dynamic) so tests can pin categories. */
final class JsonataException(val code: String, msg: String, val position: Int = -1)
    extends RuntimeException(s"$code: $msg" + (if (position >= 0) s" (pos $position)" else ""))

final case class Token(typ: String, value: Any, pos: Int) {
  def isOp(v: String): Boolean = typ == "operator" && value == v
}

/** Hand-written tokenizer for the JSONata 1.8 grammar (spec: jsonata.org).
  * Behavioral reference: the reference SMT delegates all expression handling to
  * a JSONata library (reference JsonataTransformation.java:68,104); this is a
  * from-scratch implementation of the published language.
  *
  * Regex-literal ambiguity with division is resolved lexer-side: `/` starts a
  * regex literal iff the previous token cannot end an operand.
  */
final class Lexer(src: String) {
  private var pos = 0
  private var prev: Token = null

  private val multiOps = Array("..", ":=", "!=", ">=", "<=", "**", "~>")
  private val singleOps = ".[]{}(),@#;:?+-*/%|=<>^&!~".toSet

  private def isNameChar(c: Char): Boolean =
    !singleOps.contains(c) && !Character.isWhitespace(c) && c != '"' && c != '\'' && c != '`' && c != '$'

  /** True when a `/` at the current position should start a regex literal. */
  private def regexAllowed: Boolean = prev match {
    case null => true
    case Token("operator", v, _) => v != ")" && v != "]" && v != "}"
    case _ => false
  }

  def next(): Token = { val t = scan(); prev = t; t }

  private def scan(): Token = {
    // skip whitespace + comments
    var skipping = true
    while (skipping) {
      skipping = false
      while (pos < src.length && Character.isWhitespace(src.charAt(pos))) pos += 1
      if (pos + 1 < src.length && src.charAt(pos) == '/' && src.charAt(pos + 1) == '*') {
        val end = src.indexOf("*/", pos + 2)
        if (end < 0) throw new JsonataException("S0106", "comment has no closing tag", pos)
        pos = end + 2
        skipping = true
      }
    }
    if (pos >= src.length) return Token("end", "", pos)
    val start = pos
    val c = src.charAt(pos)

    // regex literal
    if (c == '/' && regexAllowed) return scanRegex(start)

    // multi-char operators
    var i = 0
    while (i < multiOps.length) {
      val op = multiOps(i)
      if (src.startsWith(op, pos)) { pos += op.length; return Token("operator", op, start) }
      i += 1
    }
    if (singleOps.contains(c)) { pos += 1; return Token("operator", c.toString, start) }

    if (c == '"' || c == '\'') return scanString(c, start)
    if (c == '`') return scanQuotedName(start)
    if (c == '$') {
      pos += 1
      if (pos < src.length && src.charAt(pos) == '$') { pos += 1; return Token("variable", "$", start) }
      val sb = new StringBuilder
      while (pos < src.length && isNameChar(src.charAt(pos))) { sb += src.charAt(pos); pos += 1 }
      return Token("variable", sb.toString, start) // "" => context ref `$`
    }
    if (c.isDigit) return scanNumber(start)
    // bare name
    val sb = new StringBuilder
    while (pos < src.length && isNameChar(src.charAt(pos))) { sb += src.charAt(pos); pos += 1 }
    if (sb.isEmpty) throw new JsonataException("S0204", s"unknown character '$c'", start)
    Token("name", sb.toString, start)
  }

  private def scanNumber(start: Int): Token = {
    while (pos < src.length && src.charAt(pos).isDigit) pos += 1
    if (pos < src.length && src.charAt(pos) == '.' && pos + 1 < src.length && src.charAt(pos + 1).isDigit) {
      pos += 1
      while (pos < src.length && src.charAt(pos).isDigit) pos += 1
    }
    if (pos < src.length && (src.charAt(pos) == 'e' || src.charAt(pos) == 'E')) {
      val save = pos
      pos += 1
      if (pos < src.length && (src.charAt(pos) == '+' || src.charAt(pos) == '-')) pos += 1
      if (pos < src.length && src.charAt(pos).isDigit) {
        while (pos < src.length && src.charAt(pos).isDigit) pos += 1
      } else pos = save
    }
    Token("number", src.substring(start, pos), start)
  }

  private def scanString(quote: Char, start: Int): Token = {
    pos += 1
    val sb = new StringBuilder
    while (pos < src.length && src.charAt(pos) != quote) {
      val ch = src.charAt(pos)
      if (ch == '\\') {
        pos += 1
        if (pos >= src.length) throw new JsonataException("S0101", "string has no closing quote", start)
        src.charAt(pos) match {
          case '"'  => sb += '"'
          case '\'' => sb += '\''
          case '\\' => sb += '\\'
          case '/'  => sb += '/'
          case 'b'  => sb += '\b'
          case 'f'  => sb += '\f'
          case 'n'  => sb += '\n'
          case 'r'  => sb += '\r'
          case 't'  => sb += '\t'
          case 'u'  =>
            if (pos + 4 >= src.length) throw new JsonataException("S0104", "invalid unicode escape", pos)
            val hex = src.substring(pos + 1, pos + 5)
            try sb += Integer.parseInt(hex, 16).toChar
            catch { case _: NumberFormatException => throw new JsonataException("S0104", s"invalid unicode escape \\u$hex", pos) }
            pos += 4
          case other => throw new JsonataException("S0103", s"unsupported escape '\\$other'", pos)
        }
      } else sb += ch
      pos += 1
    }
    if (pos >= src.length) throw new JsonataException("S0101", "string has no closing quote", start)
    pos += 1
    Token("string", sb.toString, start)
  }

  private def scanQuotedName(start: Int): Token = {
    pos += 1
    val end = src.indexOf('`', pos)
    if (end < 0) throw new JsonataException("S0105", "quoted name has no closing backtick", start)
    val name = src.substring(pos, end)
    pos = end + 1
    Token("name", name, start)
  }

  private def scanRegex(start: Int): Token = {
    pos += 1
    val sb = new StringBuilder
    var depth = 0
    var done = false
    while (!done) {
      if (pos >= src.length) throw new JsonataException("S0302", "regex has no closing /", start)
      val ch = src.charAt(pos)
      if (ch == '\\' && pos + 1 < src.length) { sb += ch; sb += src.charAt(pos + 1); pos += 2 }
      else if (ch == '[') { depth += 1; sb += ch; pos += 1 }
      else if (ch == ']') { depth = math.max(0, depth - 1); sb += ch; pos += 1 }
      else if (ch == '/' && depth == 0) { pos += 1; done = true }
      else { sb += ch; pos += 1 }
    }
    var flags = 0
    var fdone = false
    while (!fdone && pos < src.length) {
      src.charAt(pos) match {
        case 'i' => flags |= java.util.regex.Pattern.CASE_INSENSITIVE; pos += 1
        case 'm' => flags |= java.util.regex.Pattern.MULTILINE; pos += 1
        case 's' => flags |= java.util.regex.Pattern.DOTALL; pos += 1
        case _   => fdone = true
      }
    }
    if (sb.isEmpty) throw new JsonataException("S0301", "empty regex", start)
    val p =
      try java.util.regex.Pattern.compile(sb.toString, flags)
      catch { case e: Exception => throw new JsonataException("S0302", s"invalid regex: ${e.getMessage}", start) }
    Token("regex", p, start)
  }
}
