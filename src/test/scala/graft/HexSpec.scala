package graft

import graft.crawl.CrawlEngine
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The fetch hot path's table-driven SHA-256 hex must stay
  * byte-identical to the oracle's independent `%02x`-per-byte form
  * (CrawlExpected.scala) — the content_hash gates compare the two
  * across engines. */
class HexSpec extends AnyFunSuite {

  private def referenceForm(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString

  test("sha256Hex equals the %02x reference form on arbitrary payloads") {
    val prop = forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes => CrawlEngine.sha256Hex(bytes) == referenceForm(bytes)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("sha256Hex on the empty payload") {
    assert(CrawlEngine.sha256Hex(Array.empty) ===
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("sha256Hex is stable across repeated thread-local digest reuse") {
    val b = Array.tabulate[Byte](1024)(i => (i * 31).toByte)
    val first = CrawlEngine.sha256Hex(b)
    (1 to 50).foreach(_ => assert(CrawlEngine.sha256Hex(b) === first))
    assert(first === referenceForm(b))
  }
}
