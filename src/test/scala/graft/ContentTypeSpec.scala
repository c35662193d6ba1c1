package graft

import graft.crawl.ContentType
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** X4 detector unit coverage: the content-pattern classifier must
  * recover the ground-truth class from the caption payload alone for
  * every article id, and the tier order (wire → obituary → opinion)
  * must match the reference detector's
  * (content_type_detector.py:948,1071,1134). */
class ContentTypeSpec extends AnyFunSuite {

  val cfg = Synth.Config()

  test("detector recovers contentTypeOf(id) from the caption for 50k ids") {
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    (0L until 50000L).foreach { id =>
      val want = Synth.contentTypeOf(cfg)(id)
      val got = ContentType.detect(Synth.captionFor(cfg, id), Synth.ContentPatterns)
      assert(got == want, s"id=$id caption='${Synth.captionFor(cfg, id)}'")
      counts(want) += 1
    }
    // every class (and so every pattern tier) is actually exercised
    Seq("extracted", "obituary", "opinion", "wire").foreach(t =>
      assert(counts(t) > 0, s"class $t never generated"))
  }

  test("tier order: wire beats obituary beats opinion") {
    val pats = Synth.ContentPatterns
    assert(ContentType.detect("passed away (ap) wire", pats) == "wire")
    assert(ContentType.detect("opinion: he passed away", pats) == "obituary")
    assert(ContentType.detect("opinion: plain piece", pats) == "opinion")
    assert(ContentType.detect("mid-string editorial: is not a prefix", pats) == "extracted")
    assert(ContentType.detect(null, pats) == "extracted")
  }

  test("precheck fault model: ~1.3% error rate, split by source opt-in") {
    val urls = (0 until 20000).map(i => f"https://www.host-$i%04d.example/stories/a-$i%08d")
    val errs = urls.count(Synth.precheckError(cfg))
    assert(errs > 100 && errs < 500, s"precheck error rate off: $errs/20000")
    assert(Synth.precheckOf(0) && !Synth.precheckOf(1))
  }
}
