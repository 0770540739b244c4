package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(longCol, filterBytes)` — membership probe of a
  * long column against a serialized [[BloomFilter]] sketch, inside
  * whole-stage codegen.
  *
  * The artifact pattern: a pipeline builds the filter ONCE from the
  * small side (`Dataset.stat.bloomFilter`, a distributed treeAggregate),
  * serializes it into the plan, and every executor probes it scan-local
  * — no shuffle of the big side against the small side just to discard
  * 99% of it. At 100 TB this is the difference between exchanging every
  * training-corpus shingle and exchanging only the ~|eval| that might
  * match: the filter is ~1.2 bytes/key at 1% fpp versus 8-byte hash
  * rows through a shuffle, and false positives only cost a few extra
  * rows in the exact verify join downstream — never a wrong result.
  *
  * The filter bytes ride the serialized expression; executors lazily
  * deserialize once per task-set (transient lazy val) and codegen calls
  * `mightContainLong` via a reference object, keeping the probe inside
  * the scan's codegen stage.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = BooleanType

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(x: Any): Any =
    filter.mightContainLong(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.mightContainLong($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {
  def bloom_might_contain(c: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), filterBytes))

  /** Serialize a built filter for embedding into a plan. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}
