package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Salted-min-md5 MinHash over character shingles, as ONE expression.
  *
  * The composable formulation — explode shingle offsets → substr → md5 →
  * groupBy(min) — shuffles every shingle of every document (≈500 rows per
  * doc) just to take a minimum. At corpus scale that shuffle dominates
  * the whole dedup pass. This expression folds the loop into the row:
  * scan → project(minhash per salt) touches each document once and
  * produces one row, no shuffle at all; banding then explodes 4 rows per
  * doc instead of 500.
  *
  * Values are IDENTICAL to the composable form (md5 of salt||shingle,
  * lexicographic minimum of the lowercase hex), so the DuckDB oracle is
  * unchanged. Shingling follows the oracle's substr semantics: character
  * (codepoint) offsets, length-8 windows, and the full (possibly shorter)
  * prefix when the text is shorter than one shingle.
  *
  * r15: proper codegen (the expression was CodegenFallback, which
  * disabled whole-stage codegen for EVERY signatures Project — guide §4:
  * no non-codegen expressions in the hot path), and the per-shingle
  * minimum now compares raw 16-byte digests unsigned-lexicographically —
  * the same order as the lowercase-hex strings (each hex pair is
  * monotonic in the unsigned byte) — so the hex string materializes once
  * per document, not once per shingle. The MessageDigest is per-thread:
  * a codegen'd plan may evaluate one referenced expression object from
  * many task threads (see RegexpCountFast's Matcher note).
  */
case class MinHashMd5(child: Expression, salt: String, shingleLen: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType

  @transient private lazy val hex = "0123456789abcdef".toCharArray
  @transient private lazy val saltBytes = salt.getBytes("UTF-8")
  @transient private lazy val localDigest =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** a < b over 16 bytes, unsigned lexicographic — identical ordering to
    * comparing the lowercase-hex renderings. */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = (a(i) & 0xff) - (b(i) & 0xff)
      if (x != 0) return x < 0
      i += 1
    }
    false
  }

  def compute(input: UTF8String): UTF8String = {
    val text = input.toString
    val digest = localDigest.get()
    // character-based shingling, matching substr(text, i, len) semantics
    val n = math.max(text.codePointCount(0, text.length) - (shingleLen - 1), 1)
    var min: Array[Byte] = null
    var ci = 0 // char index of shingle start
    var k = 0
    while (k < n) {
      val end =
        try text.offsetByCodePoints(ci, shingleLen)
        catch { case _: IndexOutOfBoundsException => text.length }
      digest.reset()
      digest.update(saltBytes)
      digest.update(text.substring(ci, end).getBytes("UTF-8"))
      val d = digest.digest()
      if (min == null || unsignedLess(d, min)) min = d
      if (k + 1 < n) ci = text.offsetByCodePoints(ci, 1)
      k += 1
    }
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((min(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(min(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashMd5", this, classOf[MinHashMd5].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (UTF8String) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)

  override def prettyName: String = s"minhash_md5_$salt"
}

object MinHashFunctions {
  def minhash_md5(text: Column, salt: String, shingleLen: Int): Column =
    ColumnBridge.column(MinHashMd5(ColumnBridge.expression(text), salt, shingleLen))
}
