package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The round-trip-consistency spec of the reference (specs.clj:161-168)
  * made an executable property. */
class ArgsCodecSpec extends AnyFunSuite {

  private val scalar: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.long,
    Gen.chooseNum(-1e6, 1e6).map(_.toDouble),
    Gen.oneOf(true, false),
    Gen.const(null))

  private def value(depth: Int): Gen[Any] =
    if (depth <= 0) scalar
    else Gen.frequency(
      6 -> scalar,
      1 -> Gen.listOfN(3, value(depth - 1)).map(_.toSeq),
      1 -> Gen.mapOfN(3, Gen.zip(Gen.alphaNumStr, value(depth - 1))))

  private val argsGen: Gen[Seq[Any]] = Gen.listOfN(4, value(2)).map(_.toSeq)

  test("encode/decode round-trips consistently (property)") {
    val prop = Prop.forAll(argsGen)(args => ArgsCodec.roundTripConsistent(args))
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("decoded values preserve scalar types") {
    val args = Seq("s", 42L, 3.5d, true, null, Seq(1L, "two"), Map("k" -> 7L))
    val decoded = ArgsCodec.decode(ArgsCodec.encode(args))
    assert(decoded == args)
  }

  test("string escapes round-trip") {
    val args = Seq("a\"b\\c\nd\tef", "日本語 ünïcode")
    assert(ArgsCodec.decode(ArgsCodec.encode(args)) == args)
  }

  test("non-serializable args are rejected") {
    intercept[IllegalArgumentException] {
      ArgsCodec.encode(Seq(new Object))
    }
  }

  test("non-array top level is rejected") {
    intercept[IllegalArgumentException] { ArgsCodec.decode("{\"a\":1}") }
  }

  test("custom serializer installs and round-trips (utils.clj:13-17 seam)") {
    object Base64Json extends ArgsSerializer {
      private val enc = java.util.Base64.getEncoder
      private val dec = java.util.Base64.getDecoder
      def contentType = "application/base64+json"
      def encode(args: Seq[Any]): String =
        enc.encodeToString(ArgsCodec.encode(args).getBytes("UTF-8"))
      def decode(payload: String): Seq[Any] =
        ArgsCodec.decode(new String(dec.decode(payload), "UTF-8"))
    }
    try {
      ArgsSerializers.install(Base64Json)
      val args = Seq("hello", 42L)
      val encoded = ArgsSerializers.active.encode(args)
      assert(!encoded.contains("hello")) // actually transformed
      assert(ArgsSerializers.active.decode(encoded) == args)
      assert(ArgsSerializers.active.roundTripConsistent(args))
    } finally ArgsSerializers.reset()
  }
}
