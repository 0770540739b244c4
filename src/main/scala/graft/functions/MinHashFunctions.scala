package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  */
case class MinHashMd5(child: Expression, salt: String, shingleLen: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = StringType

  @transient private lazy val digest = MessageDigest.getInstance("MD5")
  @transient private lazy val hex = "0123456789abcdef".toCharArray
  @transient private lazy val saltBytes = salt.getBytes("UTF-8")

  private def md5Hex(s: String): String = {
    digest.reset()
    digest.update(saltBytes)
    digest.update(s.getBytes("UTF-8"))
    val d = digest.digest()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // character-based shingling, matching substr(text, i, len) semantics
    val n = math.max(text.codePointCount(0, text.length) - (shingleLen - 1), 1)
    var min: String = null
    var ci = 0 // char index of shingle start
    var k = 0
    while (k < n) {
      val end =
        try text.offsetByCodePoints(ci, shingleLen)
        catch { case _: IndexOutOfBoundsException => text.length }
      val h = md5Hex(text.substring(ci, end))
      if (min == null || h.compareTo(min) < 0) min = h
      if (k + 1 < n) ci = text.offsetByCodePoints(ci, 1)
      k += 1
    }
    UTF8String.fromString(min)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)

  override def prettyName: String = s"minhash_md5_$salt"
}

object MinHashFunctions {
  def minhash_md5(text: Column, salt: String, shingleLen: Int): Column =
    ColumnBridge.column(MinHashMd5(ColumnBridge.expression(text), salt, shingleLen))
}
