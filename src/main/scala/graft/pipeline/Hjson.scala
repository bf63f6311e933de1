package graft.pipeline

/** HJSON → strict JSON (reference: chewdata parses configs with the
  * deser-hjson crate — src/main.rs:80 — and its own examples use unquoted
  * keys, unquoted values and newline member separators).
  *
  * Grammar subset: objects/arrays, quoted strings (single or double),
  * '''multiline''' strings, unquoted keys (up to `:`), unquoted values
  * (to end of line; parsed as number/bool/null when they look like one).
  * Comments are expected to be pre-stripped by `Pipeline.hjsonLite` (which
  * also keeps unquoted URLs intact). Lenient beyond the spec: a trailing
  * comma after an unquoted value is a separator, not part of the string.
  */
object Hjson {

  def toJson(input: String): String = {
    val p = new Parser(input)
    val sb = new StringBuilder
    p.skipWs()
    p.parseValue(sb)
    p.skipWs()
    require(p.eof, s"trailing content at offset ${p.offset}: ${p.rest.take(40)}")
    sb.result()
  }

  private final class Parser(s: String) {
    private var pos = 0
    def offset: Int = pos
    def eof: Boolean = pos >= s.length
    def rest: String = s.substring(math.min(pos, s.length))
    private def peek: Char = s.charAt(pos)

    def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    def parseValue(sb: StringBuilder): Unit = {
      skipWs()
      require(!eof, "unexpected end of input")
      peek match {
        case '{' => parseObject(sb)
        case '[' => parseArray(sb)
        case '"' | '\'' if s.startsWith("'''", pos) => parseMultiline(sb)
        case '"' | '\'' => parseQuoted(sb)
        case _ => parseUnquoted(sb)
      }
    }

    private def parseObject(sb: StringBuilder): Unit = {
      pos += 1 // {
      sb += '{'
      var first = true
      var done = false
      while (!done) {
        skipWs()
        require(!eof, "unterminated object")
        if (peek == '}') { pos += 1; done = true }
        else if (peek == ',') pos += 1 // stray/extra separator
        else {
          if (!first) sb += ','
          first = false
          parseKey(sb)
          skipWs()
          require(!eof && peek == ':', s"expected ':' at offset $pos: ${rest.take(20)}")
          pos += 1
          sb += ':'
          parseValue(sb)
        }
      }
      sb += '}'
    }

    private def parseArray(sb: StringBuilder): Unit = {
      pos += 1 // [
      sb += '['
      var first = true
      var done = false
      while (!done) {
        skipWs()
        require(!eof, "unterminated array")
        if (peek == ']') { pos += 1; done = true }
        else if (peek == ',') pos += 1
        else {
          if (!first) sb += ','
          first = false
          parseValue(sb)
        }
      }
      sb += ']'
    }

    private def parseKey(sb: StringBuilder): Unit = {
      if (peek == '"' || peek == '\'') parseQuoted(sb)
      else {
        val start = pos
        while (pos < s.length && !s.charAt(pos).isWhitespace &&
               !"{}[],:".contains(s.charAt(pos))) pos += 1
        require(pos > start, s"empty key at offset $pos")
        appendJsonString(sb, s.substring(start, pos))
      }
    }

    /** Quoted string with JSON escapes; single quotes normalize to double. */
    private def parseQuoted(sb: StringBuilder): Unit = {
      val q = peek
      pos += 1
      val buf = new StringBuilder
      var done = false
      while (!done) {
        require(!eof, "unterminated string")
        val c = peek
        if (c == '\\' && pos + 1 < s.length) { buf += c += s.charAt(pos + 1); pos += 2 }
        else if (c == q) { pos += 1; done = true }
        else { buf += c; pos += 1 }
      }
      if (q == '"') sb += '"' ++= buf.result() += '"'
      else appendJsonString(sb, unescape(buf.result()))
    }

    private def parseMultiline(sb: StringBuilder): Unit = {
      pos += 3 // '''
      val end = s.indexOf("'''", pos)
      require(end >= 0, "unterminated ''' string")
      val body = s.substring(pos, end).stripPrefix("\n").stripSuffix("\n")
      pos = end + 3
      appendJsonString(sb, body)
    }

    private val NumPat = raw"-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?".r

    private def parseUnquoted(sb: StringBuilder): Unit = {
      val start = pos
      // lenient vs the strict spec (which runs to newline, commas and all):
      // ',' '}' ']' terminate, so `a: b, c: d` and `[1, 2]` parse the way
      // config authors mean them; quote values that contain those chars
      while (pos < s.length && s.charAt(pos) != '\n' && s.charAt(pos) != ',' &&
             s.charAt(pos) != '}' && s.charAt(pos) != ']') pos += 1
      val raw = s.substring(start, pos).trim
      require(raw.nonEmpty, s"empty value at offset $start")
      if (raw == "true" || raw == "false" || raw == "null" || NumPat.matches(raw)) sb ++= raw
      else appendJsonString(sb, raw)
    }

    private def unescape(str: String): String = {
      val out = new StringBuilder
      var i = 0
      while (i < str.length) {
        val c = str.charAt(i)
        if (c == '\\' && i + 1 < str.length) {
          str.charAt(i + 1) match {
            case 'n' => out += '\n'; case 't' => out += '\t'; case 'r' => out += '\r'
            case o => out += o
          }
          i += 2
        } else { out += c; i += 1 }
      }
      out.result()
    }

    private def appendJsonString(sb: StringBuilder, v: String): Unit = {
      sb += '"'
      v.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      sb += '"'
    }
  }
}
