package graft.smt

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's JoseTest (`smt/JoseTest.java:22-104`) with the
  * same pinned JWK/JWE vectors. */
class JoseDecryptSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val key1 = "eyJrdHkiOiJvY3QiLCJraWQiOiJIMmg1WHlIM0dPSHQ4Wm5vTndBOUFoay1FQlJ3cTQxTHo3U01pWDJDLVRJIiwiYWxnIjoiQTI1NkdDTSIsImsiOiJkR2tQRU41YUhaQnFocDY5TmpVWGpjTUJST1R4amZ6Yl9hYldVeUo2ajBBIn0="
  private val key2 = "eyJrdHkiOiJvY3QiLCJraWQiOiJjbmVkYXRXNEg4SFA4VjFFSVQ3QjJsdHk0TXFsM3FKV3ZPUmk1MFZVdWZvIiwiYWxnIjoiQTI1NkdDTSIsImsiOiJjYmtncEtVZ1c0RFRaS2RkQzAwcHJTSjl5UnZGSGc3OTFOa0V6R2RLTFlZIn0="
  private val jwe1 = """{"protected":"eyJlbmMiOiJBMjU2R0NNIiwiYWxnIjoiZGlyIiwia2lkIjoiSDJoNVh5SDNHT0h0OFpub053QTlBaGstRUJSd3E0MUx6N1NNaVgyQy1USSJ9","iv":"QsJ90lUJoBW05RN3","ciphertext":"4YQYK0F4LoFpP6-P0g","tag":"88OtNkM7CVsOX52rLxgl2Q"}"""
  private val jwe2 = """{"protected":"eyJlbmMiOiJBMjU2R0NNIiwiYWxnIjoiZGlyIiwia2lkIjoiY25lZGF0VzRIOEhQOFYxRUlUN0IybHR5NE1xbDNxSld2T1JpNTBWVXVmbyJ9","iv":"rhGttLfHmwq7beFr","ciphertext":"L4OQkrC1zagy2DLDtw","tag":"9T29uivX5K_O_503UKmicA"}"""

  private def run(cfg: JoseConfig, payload: String): String = {
    val df = Seq(Tuple1(payload.getBytes("UTF-8"))).toDF("value")
    val out = JoseDecrypt(cfg)(df).head().getAs[Array[Byte]](0)
    new String(out, "UTF-8")
  }

  // JoseTest.java:22-38
  test("decrypts with a single key") {
    assert(run(JoseConfig(Seq(key1)), jwe1) == """{"foo":"bar"}""")
  }

  // JoseTest.java:40-56 — multiple keys tried in order
  test("decrypts with the second of multiple keys") {
    assert(run(JoseConfig(Seq(key1, key2)), jwe2) == """{"bar":"baz"}""")
  }

  // JoseTest.java:58-70
  test("fails if no key decrypts by default") {
    intercept[Exception] { run(JoseConfig(Seq(key1)), jwe2) }
  }

  // JoseTest.java:72-87
  test("skip-on-error keeps the encrypted payload") {
    assert(run(JoseConfig(Seq(key1), skipOnError = true), jwe2) == jwe2)
  }

  // JoseTest.java:89-104
  test("skip-on-error keeps non-JWE content") {
    val notJwe = "Not a JWE format at all."
    assert(run(JoseConfig(Seq(key1), skipOnError = true), notJwe) == notJwe)
  }

  test("non-JWE content throws without skip-on-error") {
    intercept[Exception] { run(JoseConfig(Seq(key1)), "Not a JWE format at all.") }
  }

  test("null payload passes through as null") {
    val df = Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("value")
    assert(JoseDecrypt(JoseConfig(Seq(key1)))(df).head().isNullAt(0))
  }

  test("non-binary column refuses at setup") {
    val df = Seq(Tuple1("s")).toDF("value")
    intercept[IllegalArgumentException] { JoseDecrypt(JoseConfig(Seq(key1)))(df) }
  }
}
