package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a string's code-point distribution, in
  * ONE pass with zero shuffle — the gibberish / compression-artifact /
  * binary-spill detector of a corpus quality funnel (low entropy =
  * repeated filler, high ≈ log2(alphabet) = random bytes). The composable
  * alternative (explode chars → groupBy count → join totals) shuffles one
  * row PER CHARACTER — at 100 TB that is the corpus itself, keyed by its
  * least selective key. Here the histogram lives in a 128-slot stack
  * array (ASCII fast path; code points above fall back to a small map),
  * inside whole-stage codegen.
  *
  * H = (ln n − Σ c·ln c / n) / ln 2, accumulated in char-sorted order so
  * the fold is deterministic; the DuckDB oracle restates the identical
  * formula over its per-char counts. Empty input → 0.0 by definition.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  def entropyOf(u: UTF8String): Double = {
    val s = u.toString
    val len = s.length
    val ascii = new Array[Int](128)
    var other: java.util.TreeMap[Integer, Integer] = null
    var n = 0L
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.TreeMap[Integer, Integer]()
        val prev = other.get(cp)
        other.put(cp, if (prev == null) 1 else prev + 1)
      }
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    var sum = 0.0
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 1) sum += c * Math.log(c.toDouble) // c == 1 contributes ln 1 = 0
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator() // TreeMap: char-sorted, deterministic
      while (it.hasNext) {
        val c = it.next().intValue()
        if (c > 1) sum += c * Math.log(c.toDouble)
      }
    }
    (Math.log(n.toDouble) - sum / n) / Math.log(2.0)
  }

  override def nullSafeEval(input: Any): Any =
    entropyOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.entropyOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object EntropyFunctions {
  def char_entropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))
}
