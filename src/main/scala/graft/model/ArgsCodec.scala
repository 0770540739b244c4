package graft.model

import scala.collection.mutable

/** JSON codec for the dynamically-typed job `args` payload.
  *
  * Goose serializes args with nippy and guards them with a
  * round-trip-consistency spec — encode, decode, re-encode, compare
  * (reference specs.clj:161-168, utils.clj:13-33). We keep the same
  * contract over JSON: supported types are the JSON-representable subset
  * (null, Boolean, Long/Int, Double, String, Seq, Map[String, _]) and
  * [[roundTripConsistent]] is the spec made executable (property-tested
  * in ArgsCodecSpec).
  *
  * Hand-rolled (~120 lines) instead of a jackson/json4s dependency: the
  * payload schema is closed, and tying the engine to Spark's shaded JSON
  * internals would be a version hazard.
  */
object ArgsCodec {

  def encode(args: Seq[Any]): String = {
    val sb = new StringBuilder
    writeValue(sb, args)
    sb.toString()
  }

  def decode(json: String): Seq[Any] = {
    val p = new Parser(json)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v match {
      case s: Seq[_] => s.asInstanceOf[Seq[Any]]
      case other => throw new IllegalArgumentException(s"args must be a JSON array, got $other")
    }
  }

  /** The executable round-trip spec (reference specs.clj:161-168). */
  def roundTripConsistent(args: Seq[Any]): Boolean = {
    val once = encode(args)
    val twice = encode(decode(once))
    once == twice
  }

  private def writeValue(sb: StringBuilder, v: Any): Unit = v match {
    case null => sb.append("null")
    case b: Boolean => sb.append(b)
    case i: Int => sb.append(i.toLong)
    case l: Long => sb.append(l)
    case s: Short => sb.append(s.toLong)
    case b: Byte => sb.append(b.toLong)
    case d: Double =>
      require(!d.isNaN && !d.isInfinite, "non-finite doubles are not serializable")
      sb.append(d)
    case f: Float => writeValue(sb, f.toDouble)
    case s: String => writeString(sb, s)
    case m: collection.Map[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, mv) =>
        require(k.isInstanceOf[String], s"map keys must be strings, got $k")
        if (!first) sb.append(',')
        first = false
        writeString(sb, k.asInstanceOf[String])
        sb.append(':')
        writeValue(sb, mv)
      }
      sb.append('}')
    case s: Iterable[_] =>
      sb.append('[')
      var first = true
      s.foreach { e =>
        if (!first) sb.append(',')
        first = false
        writeValue(sb, e)
      }
      sb.append(']')
    case other =>
      throw new IllegalArgumentException(
        s"unsupported arg type ${other.getClass.getName} (JSON-representable types only)")
  }

  private def writeString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1

    def parseValue(): Any = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => parseString()
        case 't' => expect("true"); true
        case 'f' => expect("false"); false
        case 'n' => expect("null"); null
        case _ => parseNumber()
      }
    }

    private def expect(lit: String): Unit = {
      require(s.regionMatches(pos, lit, 0, lit.length), s"expected $lit at $pos")
      pos += lit.length
    }

    private def parseObject(): Map[String, Any] = {
      pos += 1 // '{'
      val m = mutable.LinkedHashMap.empty[String, Any]
      skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return m.toMap }
      while (true) {
        skipWs()
        val k = parseString()
        skipWs()
        require(!eof && s.charAt(pos) == ':', s"expected ':' at $pos")
        pos += 1
        m(k) = parseValue()
        skipWs()
        require(!eof, "unterminated object")
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; return m.toMap
          case c => throw new IllegalArgumentException(s"unexpected '$c' at $pos")
        }
      }
      m.toMap
    }

    private def parseArray(): Seq[Any] = {
      pos += 1 // '['
      val buf = mutable.ArrayBuffer.empty[Any]
      skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return buf.toSeq }
      while (true) {
        buf += parseValue()
        skipWs()
        require(!eof, "unterminated array")
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; return buf.toSeq
          case c => throw new IllegalArgumentException(s"unexpected '$c' at $pos")
        }
      }
      buf.toSeq
    }

    private def parseString(): String = {
      require(s.charAt(pos) == '"', s"expected string at $pos")
      pos += 1
      val sb = new StringBuilder
      while (true) {
        require(!eof, "unterminated string")
        s.charAt(pos) match {
          case '"' => pos += 1; return sb.toString()
          case '\\' =>
            pos += 1
            s.charAt(pos) match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'u' =>
                sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
                pos += 4
              case c => throw new IllegalArgumentException(s"bad escape '\\$c'")
            }
            pos += 1
          case c => sb.append(c); pos += 1
        }
      }
      sb.toString()
    }

    private def parseNumber(): Any = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      var isDouble = false
      while (!eof && (s.charAt(pos).isDigit || "eE.+-".contains(s.charAt(pos)))) {
        if (".eE".contains(s.charAt(pos))) isDouble = true
        pos += 1
      }
      val tok = s.substring(start, pos)
      require(tok.nonEmpty, s"expected number at $start")
      if (isDouble) tok.toDouble else tok.toLong
    }
  }
}
