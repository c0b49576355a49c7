package graft.store

/** Zero-dependency parser for the exact JSONL shape
  * [[EmbeddedLogStore.recordToJson]] writes:
  * `{"time":N,"topic":S,"source":S,"tags":{S:S,...},"contents":{S:S,...}}`
  * with the writer's escape set (`\" \\ \n \r \t \uXXXX`). Strict: any
  * deviation (unexpected key order, whitespace, other escapes, other
  * types) returns null and the caller falls back to Jackson — so the
  * fast path can only ever be a performance choice, never a semantic
  * one. Scanning the line directly is ~3x cheaper than building a
  * Jackson tree per record on the 100k-records/query read path. */
object FastJsonl {

  def tryParse(line: String): LogRecord =
    try new Parser(line).parse()
    catch { case _: Exception => null }

  /** Per-call state: one instance per line, safe under concurrent
    * reader tasks. */
  private final class Parser(s: String) {
    private var i = 0

    def parse(): LogRecord = {
      if (!expect("{\"time\":")) return null
      var time = 0
      var neg = false
      if (i < s.length && s.charAt(i) == '-') { neg = true; i += 1 }
      val d0 = i
      while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        time = time * 10 + (s.charAt(i) - '0'); i += 1
      }
      if (i == d0) return null
      if (neg) time = -time
      if (!expect(",\"topic\":")) return null
      val topic = str(); if (topic == null) return null
      if (!expect(",\"source\":")) return null
      val source = str(); if (source == null) return null
      if (!expect(",\"tags\":{")) return null
      val tags = obj(); if (tags == null) return null
      if (!expect(",\"contents\":{")) return null
      val contents = obj(); if (contents == null) return null
      // obj() already consumed the contents object's closing brace —
      // exactly one outer '}' remains in writer output
      if (!expect("}") || i != s.length) return null
      LogRecord(time, topic, source, tags, contents)
    }

    private def expect(lit: String): Boolean = {
      if (!s.startsWith(lit, i)) return false
      i += lit.length; true
    }

    /** Quoted string at the cursor; null on any deviation. */
    private def str(): String = {
      if (i >= s.length || s.charAt(i) != '"') return null
      i += 1
      val sb = new java.lang.StringBuilder(16)
      while (i < s.length) {
        s.charAt(i) match {
          case '"' => i += 1; return sb.toString
          case '\\' =>
            if (i + 1 >= s.length) return null
            s.charAt(i + 1) match {
              case '"' => sb.append('"'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'u' =>
                if (i + 6 > s.length) return null
                val code = Integer.parseInt(s.substring(i + 2, i + 6), 16)
                sb.append(code.toChar); i += 6
              case _ => return null // escape the writer never emits
            }
          case c if c < ' ' => return null // raw control char: not ours
          case c => sb.append(c); i += 1
        }
      }
      null // unterminated
    }

    /** `k:v,...}` with the open brace already consumed. */
    private def obj(): Map[String, String] = {
      val m = Map.newBuilder[String, String]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return m.result() }
      while (true) {
        val k = str(); if (k == null) return null
        if (i >= s.length || s.charAt(i) != ':') return null
        i += 1
        val v = str(); if (v == null) return null
        m += (k -> v)
        if (i >= s.length) return null
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; return m.result()
          case _ => return null
        }
      }
      null
    }
  }
}
