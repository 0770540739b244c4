package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Hand-compiled counters for the regex shapes the text operators
  * actually count, bypassing `java.util.regex` where it measurably
  * breaks down.
  *
  * Motivation (r8, measured on this JVM — probe: `graft.P01Probe`):
  * negated-union character classes (`[^a-zA-Z0-9]`, `[^a-zA-Z0-9\s]`)
  * hit a ~26× throughput collapse under 32-thread concurrency —
  * 32 threads × 5k docs: 6.6 s, vs 0.06 s for the non-negated twin
  * `[a-zA-Z0-9]` at identical per-thread single-thread cost (~0.1 s).
  * All stacks sit in `Pattern$CharPredicate.lambda$negate$3` — the
  * JDK compiles negated unions to a chain of lambda predicates whose
  * dispatch degrades under concurrent profiled execution. On a 32-core
  * executor that pathology made ONE quality-filter term cost ~21 s of
  * the p01 funnel's ~52 s at the 100× corpus. Reproduced Spark-free;
  * not a Catalyst issue.
  *
  * These counters are exact replacements for MATCH COUNTS (not match
  * extraction): membership bitmaps over ASCII plus a single
  * above-ASCII membership bit (every supported class is ASCII-defined,
  * so all codepoints ≥ 128 share one membership), iterated per
  * CODEPOINT — `java.util.regex` matches a surrogate pair as one
  * character, and so do we. Counts are spec-asserted equal to
  * `java.util.regex` on every engine pattern (RegexpFunctionsSpec),
  * and DuckDB RE2 oracles agree for these shapes (no backtracking, no
  * lookaround — plain classes, runs, and anchored word alternations).
  */
private[functions] object FastCount {

  /** ASCII membership bitmap; all codepoints ≥ 128 share `above`. */
  final class Cls(val ascii: Array[Boolean], val above: Boolean)
      extends Serializable {
    @inline def has(cp: Int): Boolean = if (cp < 128) ascii(cp) else above
  }

  sealed trait Counter extends Serializable { def count(s: String): Int }

  /** Count of codepoints in the class — `[...]` with no quantifier. */
  final class PerCodepoint(cls: Cls) extends Counter {
    def count(s: String): Int = {
      var i = 0
      var c = 0
      val n = s.length
      while (i < n) {
        val cp = s.codePointAt(i)
        if (cls.has(cp)) c += 1
        i += Character.charCount(cp)
      }
      c
    }
  }

  /** Count of maximal runs of class codepoints — greedy `[...]+`. */
  final class Runs(cls: Cls) extends Counter {
    def count(s: String): Int = {
      var i = 0
      var c = 0
      var in = false
      val n = s.length
      while (i < n) {
        val cp = s.codePointAt(i)
        val m = cls.has(cp)
        if (m && !in) c += 1
        in = m
        i += Character.charCount(cp)
      }
      c
    }
  }

  /** `\b(w1|w2|...)\b` with ASCII-letter alternatives: a match is a
    * maximal word-character run equal to one alternative (the run's
    * edges ARE the word boundaries; an alternative inside a longer word
    * has word characters adjacent, so java regex rejects it too).
    * Boundary semantics follow the JDK's quirk exactly: `\b` is
    * UNICODE-aware (`_` or `Character.isLetterOrDigit`) even though
    * `\w` stays ASCII — so "aĸ" is ONE word run, not a match for
    * `\ba\b` (property-tested against java.util.regex, which is how
    * this footgun was found). Matched by length bucket + regionMatches
    * — no per-token allocation. */
  final class WordAlts(words: Seq[String]) extends Counter {
    private[this] val byLen: Array[Array[String]] = {
      val max = words.map(_.length).max
      val a = Array.fill(max + 1)(Array.empty[String])
      words.groupBy(_.length).foreach { case (l, ws) => a(l) = ws.toArray }
      a
    }
    @inline private def isWordCp(cp: Int): Boolean =
      cp == '_' || Character.isLetterOrDigit(cp)
    def count(s: String): Int = {
      var i = 0
      var c = 0
      val n = s.length
      while (i < n) {
        val cp = s.codePointAt(i)
        if (isWordCp(cp)) {
          val start = i
          var j = i
          var jcp = cp
          while (j < n && isWordCp(jcp)) {
            j += Character.charCount(jcp)
            if (j < n) jcp = s.codePointAt(j)
          }
          val len = j - start
          if (len < byLen.length) {
            val cands = byLen(len)
            var k = 0
            var hit = false
            while (k < cands.length && !hit) {
              if (s.regionMatches(start, cands(k), 0, len)) hit = true
              k += 1
            }
            if (hit) c += 1
          }
          i = j
        } else i += Character.charCount(cp)
      }
      c
    }
  }

  /** The BPE-ish pre-token pattern `[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]`
    * as one scan: letter runs and digit runs count once, every other
    * non-space codepoint counts individually — exactly the greedy
    * leftmost alternation. */
  object BpeTokens extends Counter {
    def count(s: String): Int = {
      var i = 0
      var c = 0
      var prev = 0 // 0 = none/other, 1 = in letter run, 2 = in digit run
      val n = s.length
      while (i < n) {
        val cp = s.codePointAt(i)
        if (cp < 128) {
          val ch = cp.toChar
          if ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')) {
            if (prev != 1) c += 1
            prev = 1
          } else if (ch >= '0' && ch <= '9') {
            if (prev != 2) c += 1
            prev = 2
          } else {
            prev = 0
            // \s is ASCII-only by default in java.util.regex
            if (!(ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
              ch == '\f' || ch == '\r')) c += 1
          }
        } else {
          prev = 0
          c += 1 // ≥128: not alnum, not ASCII \s → the single-char branch
        }
        i += Character.charCount(cp)
      }
      c
    }
  }

  private val asciiSpace = "\t\n\u000B\f\r ".toCharArray

  /** Parse a character-class pattern body into a [[Cls]]; null when the
    * shape is outside the supported subset (then regex handles it). */
  private[functions] def parseClassPattern(p: String): Cls = parseClass(p)

  private def parseClass(p: String): Cls = {
    val ascii = new Array[Boolean](128)
    var above = false
    def addRange(a: Char, b: Char): Boolean = {
      if (a > b || b >= 128) return false
      var ch = a.toInt
      while (ch <= b) { ascii(ch) = true; ch += 1 }
      true
    }
    def addEscape(ch: Char): Boolean = ch match {
      case 's' => asciiSpace.foreach(c => ascii(c) = true); true
      case 'd' => addRange('0', '9')
      case 'w' => addRange('a', 'z'); addRange('A', 'Z'); addRange('0', '9'); ascii('_') = true; true
      case 't' => ascii('\t') = true; true
      case 'n' => ascii('\n') = true; true
      case 'r' => ascii('\r') = true; true
      case 'f' => ascii('\f') = true; true
      case '\\' | '.' | '[' | ']' | '^' | '$' | '+' | '*' | '?' | '(' | ')' | '|' | '-' =>
        ascii(ch) = true; true
      case _ => false
    }
    p match {
      case "\\S" =>
        asciiSpace.foreach(c => ascii(c) = true)
        new Cls(ascii.map(!_), above = true)
      case "\\s" => asciiSpace.foreach(c => ascii(c) = true); new Cls(ascii, above = false)
      case "\\d" => addRange('0', '9'); new Cls(ascii, above = false)
      case "\\w" => addEscape('w'); new Cls(ascii, above = false)
      case body if body.length >= 3 && body.head == '[' && body.last == ']' =>
        var inner = body.substring(1, body.length - 1)
        val negated = inner.startsWith("^")
        if (negated) inner = inner.substring(1)
        if (inner.isEmpty) return null
        var i = 0
        while (i < inner.length) {
          val ch = inner.charAt(i)
          if (ch == '\\') {
            if (i + 1 >= inner.length || !addEscape(inner.charAt(i + 1))) return null
            i += 2
          } else if (ch >= 128 || ch == '[' || ch == '&') {
            return null // non-ASCII members / nested class / intersection
          } else if (i + 2 < inner.length && inner.charAt(i + 1) == '-' &&
            inner.charAt(i + 2) != ']') {
            val hi = inner.charAt(i + 2)
            if (hi == '\\' || !addRange(ch, hi)) return null
            i += 3
          } else {
            ascii(ch) = true
            i += 1
          }
        }
        if (negated) new Cls(ascii.map(!_), above = true)
        else new Cls(ascii, above = false)
      case _ => null
    }
  }

  private val wordAltPattern = Pattern.compile("^\\\\b\\(([a-zA-Z]+(?:\\|[a-zA-Z]+)*)\\)\\\\b$")

  /** Compile a pattern to a fast counter, or null → caller uses regex. */
  def compile(p: String): Counter = {
    if (p == "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]") return BpeTokens
    val wa = wordAltPattern.matcher(p)
    if (wa.matches()) return new WordAlts(wa.group(1).split('|').toSeq)
    if (p.endsWith("+") && !p.endsWith("\\+")) {
      val cls = parseClass(p.substring(0, p.length - 1))
      if (cls != null) return new Runs(cls)
      return null
    }
    val cls = parseClass(p)
    if (cls != null) new PerCodepoint(cls) else null
  }
}

/** Count of regex matches WITHOUT materializing them.
  *
  * The composable form — `size(regexp_extract_all(text, pat))` — and
  * Spark's own `regexp_count` (which IS `Size(RegExpExtractAll(...))`,
  * RuntimeReplaceable) allocate a String per match plus an array per row
  * just to take the length; worse, the JDK regex engine's negated-union
  * character classes collapse ~26× under executor-level concurrency
  * (see [[FastCount]]). Patterns in the supported subset (character
  * classes, class runs, word alternations, the BPE pre-token shape) run
  * as allocation-free codepoint scans; anything else runs the plain
  * `Matcher.find()` counting loop, which is still materialization-free.
  * Match counts are identical either way (spec-asserted against
  * `java.util.regex` itself), so DuckDB `len(regexp_extract_all(...))`
  * oracles are unchanged.
  *
  * The compiled Pattern is shared (thread-safe); the Matcher is
  * per-thread (Matchers are not thread-safe, and a codegen'd plan may
  * evaluate one referenced expression object from many task threads).
  */
case class RegexpCountFast(child: Expression, pattern: String)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = IntegerType

  @transient private lazy val fast = FastCount.compile(pattern)
  @transient private lazy val compiled = Pattern.compile(pattern)
  @transient private lazy val localMatcher =
    ThreadLocal.withInitial[java.util.regex.Matcher](() => compiled.matcher(""))

  def countMatches(s: UTF8String): Int = {
    val str = s.toString
    val f = fast
    if (f != null) f.count(str)
    else {
      val m = localMatcher.get().reset(str)
      var c = 0
      while (m.find()) c += 1
      c
    }
  }

  override def nullSafeEval(input: Any): Any =
    countMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("regexpCountFast", this,
      classOf[RegexpCountFast].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countMatches($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpCountFast =
    copy(child = newChild)

  override def prettyName: String = "regexp_count_fast"
}

object RegexpFunctions {
  def regexp_count_fast(text: Column, pattern: String): Column =
    ColumnBridge.column(RegexpCountFast(ColumnBridge.expression(text), pattern))

  def regexp_replace_runs_fast(text: Column, pattern: String, replacement: String): Column =
    ColumnBridge.column(RegexpReplaceRunsFast(ColumnBridge.expression(text), pattern, replacement))
}

/** `regexp_replace(text, "[class]+", literal)` as one codepoint scan —
  * each maximal run of class members becomes the literal replacement,
  * everything else copies through. Exactly java's `replaceAll` for this
  * shape (greedy `X+` matches are the maximal runs; the replacement is
  * literal, no group references). Exists for the same reason as
  * [[RegexpCountFast]]: the d03 normalization class `[^a-z0-9 ]+` is a
  * negated union, the shape that collapses ~26× under executor
  * concurrency in java.util.regex (measurement in [[FastCount]]).
  * Patterns outside the `[class]+` subset fall back to a per-thread
  * cached Matcher `replaceAll`.
  */
case class RegexpReplaceRunsFast(child: Expression, pattern: String, replacement: String)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  // the fast path requires a bare greedy class run: "<class>+"
  @transient private lazy val cls: FastCount.Cls =
    if (pattern.endsWith("+") && !pattern.endsWith("\\+"))
      FastCount.parseClassPattern(pattern.substring(0, pattern.length - 1))
    else null
  @transient private lazy val compiled = Pattern.compile(pattern)
  @transient private lazy val localMatcher =
    ThreadLocal.withInitial[java.util.regex.Matcher](() => compiled.matcher(""))

  def replaceRuns(s: UTF8String): UTF8String = {
    val str = s.toString
    val c = cls
    if (c == null)
      return UTF8String.fromString(
        localMatcher.get().reset(str).replaceAll(
          java.util.regex.Matcher.quoteReplacement(replacement)))
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var in = false
    while (i < n) {
      val cp = str.codePointAt(i)
      if (c.has(cp)) {
        if (!in) sb.append(replacement)
        in = true
      } else {
        sb.appendCodePoint(cp)
        in = false
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    replaceRuns(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("regexpReplaceRunsFast", this,
      classOf[RegexpReplaceRunsFast].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.replaceRuns($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpReplaceRunsFast =
    copy(child = newChild)

  override def prettyName: String = "regexp_replace_runs_fast"
}
