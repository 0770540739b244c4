package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** SQL surface for graft's native Catalyst expressions, packaged the
  * idiomatic Spark way: a `SparkSessionExtensions` hook, so ANY session
  * configured with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (spark-submit conf, thriftserver, notebook — no code required) can
  * call `vec_dot`, `char_entropy`, `minhash_md5`, … from plain SQL, with
  * the same codegen plans the DataFrame wrappers produce. For a session
  * that already exists (the builder path can't be retrofitted),
  * [[GraftExtensions.registerAll]] installs the same builders as
  * temp functions.
  *
  * Scalar configuration arguments (a regex pattern, a MinHash salt, a
  * serialized Bloom filter) must be foldable literals — they parameterize
  * the expression instance itself (pattern compilation, filter
  * deserialization happen once per plan, not per row), exactly like
  * Spark's own `regexp_extract` pattern argument.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def litString(args: Seq[Expression], i: Int, fn: String): String =
    args(i) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }

  private def litInt(args: Seq[Expression], i: Int, fn: String): Int =
    args(i) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType)   => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  private def litBinary(args: Seq[Expression], i: Int, fn: String): Array[Byte] =
    args(i) match {
      case Literal(b: Array[Byte], BinaryType) => b
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a binary literal, got $other")
    }

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    require(args.length == n, s"$fn expects $n argument(s), got ${args.length}")

  private def info(name: String, cls: Class[_]): ExpressionInfo =
    new ExpressionInfo(cls.getCanonicalName, name)

  /** (name, info, builder) for every native expression with a sensible
    * SQL arity. One list, shared by the extensions hook and the
    * live-session registrar so the two paths cannot drift. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", info("vec_dot", classOf[DotProduct]),
      (a: Seq[Expression]) => { arity(a, 2, "vec_dot"); DotProduct(a(0), a(1)) }),
    ("sorted_intersect_size",
      info("sorted_intersect_size", classOf[SortedIntersectSize]),
      (a: Seq[Expression]) => {
        arity(a, 2, "sorted_intersect_size"); SortedIntersectSize(a(0), a(1))
      }),
    ("char_entropy", info("char_entropy", classOf[CharEntropy]),
      (a: Seq[Expression]) => { arity(a, 1, "char_entropy"); CharEntropy(a(0)) }),
    ("rhp_sig", info("rhp_sig", classOf[RhpSignature]),
      (a: Seq[Expression]) => { arity(a, 1, "rhp_sig"); RhpSignature(a(0)) }),
    ("rhp_hamming", info("rhp_hamming", classOf[HammingDistance]),
      (a: Seq[Expression]) => {
        arity(a, 2, "rhp_hamming"); HammingDistance(a(0), a(1))
      }),
    ("minhash_md5", info("minhash_md5", classOf[MinHashMd5]),
      (a: Seq[Expression]) => {
        arity(a, 3, "minhash_md5")
        MinHashMd5(a(0), litString(a, 1, "minhash_md5"), litInt(a, 2, "minhash_md5"))
      }),
    ("regexp_count_fast", info("regexp_count_fast", classOf[RegexpCountFast]),
      (a: Seq[Expression]) => {
        arity(a, 2, "regexp_count_fast")
        RegexpCountFast(a(0), litString(a, 1, "regexp_count_fast"))
      }),
    ("regexp_replace_runs_fast",
      info("regexp_replace_runs_fast", classOf[RegexpReplaceRunsFast]),
      (a: Seq[Expression]) => {
        arity(a, 3, "regexp_replace_runs_fast")
        RegexpReplaceRunsFast(a(0), litString(a, 1, "regexp_replace_runs_fast"),
          litString(a, 2, "regexp_replace_runs_fast"))
      }),
    ("bloom_might_contain",
      info("bloom_might_contain", classOf[BloomMightContain]),
      (a: Seq[Expression]) => {
        arity(a, 2, "bloom_might_contain")
        BloomMightContain(a(0), litBinary(a, 1, "bloom_might_contain"))
      })
  )

  /** Install the same functions into an ALREADY-RUNNING session (the
    * extensions hook only applies at session build). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
