package graft

import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

/** The discovery cascade's builder-form URL generators must stay
  * byte-identical to the f-interpolator reference forms they replaced
  * (a java.util.Formatter per raw link was the cascade's dominant
  * allocation — the engine↔oracle URL space depends on exact equality,
  * including the %0Nd overflow behavior for ids wider than the pad). */
class PadSpec extends AnyFunSuite {

  private val cfg = Synth.Config(nHosts = 64, urlsPerHostPerWave = 30, nWaves = 3)
  // a world big enough that articleId exceeds 8 digits (the %08d
  // print-in-full branch) without synthesizing fake ids
  private val bigCfg = Synth.Config(nHosts = 2000000, urlsPerHostPerWave = 200, nWaves = 3)

  test("pad equals f\"%0Nd\" on arbitrary non-negative longs and widths") {
    // Locale.ROOT for the reference form (r5 ADVICE): the builder always
    // emits ASCII digits; a non-ASCII-digit default locale would
    // otherwise fail the spec even though the builder output is the
    // more deterministic of the two
    val prop = forAll(Gen.chooseNum(0L, Long.MaxValue), Gen.choose(1, 12)) { (n, w) =>
      Synth.pad(new java.lang.StringBuilder, n, w).toString ==
        String.format(java.util.Locale.ROOT, s"%0${w}d", java.lang.Long.valueOf(n))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("pad rejects negative input (the %0Nd sign divergence guard)") {
    intercept[IllegalArgumentException] {
      Synth.pad(new java.lang.StringBuilder, -12L, 6)
    }
  }

  test("hostName equals the f-interpolator reference form") {
    (Seq(0, 1, 9, 42, 999, 1000, 9999, 10000, 123456) ++
      (0 until 200)).foreach { i =>
      assert(Synth.hostName(i) === f"host-$i%04d.example")
    }
  }

  private def referenceShaped(c: Synth.Config)(hostIdx: Int, wave: Int,
                                               slots: Range): Seq[(String, Int)] = {
    val h = Synth.hostName(hostIdx)
    slots.map { slot =>
      val id = Synth.articleId(c)(hostIdx, wave, slot)
      val base = f"https://www.$h/stories/a-$id%08d"
      val url = slot % 10 match {
        case 0 | 1 | 2 => base
        case 3 => f"https://www.$h/photo-gallery/g-$id%08d"
        case 4 => base + "?utm_source=rss&ref=feed"
        case 5 => base + "#comments"
        case 6 =>
          val d = math.abs(Synth.publishDay(c)(id))
          val y = 2020 + (d % 5); val m = 1 + (d % 12); val dd = 1 + (d % 28)
          f"https://www.$h/$y%04d/$m%02d/$dd%02d/title-$id%08d"
        case 7 => s"https://www.$h/category/section-$id"
        case 8 => f"https://other-${hostIdx % 5}%02d.example/stories/x-$id%08d"
        case _ => f"https://www.$h/private/stories/a-$id%08d"
      }
      (url, slot)
    }
  }

  test("shapedLinks equals the f-interpolator reference form (every slot shape)") {
    for {
      c <- Seq(cfg, bigCfg)
      hostIdx <- Seq(0, 1, 5, 16, 63, c.nHosts - 1)
      wave <- 0 until c.nWaves
    } assert(Synth.shapedLinks(c)(hostIdx, wave, 0 until c.urlsPerHostPerWave) ===
      referenceShaped(c)(hostIdx, wave, 0 until c.urlsPerHostPerWave))
  }

  test("shapedLinks ids past 8 digits print in full (the %08d overflow branch)") {
    val maxHost = bigCfg.nHosts - 1
    val links = Synth.shapedLinks(bigCfg)(maxHost, 2, 0 until 10)
    val id = Synth.articleId(bigCfg)(maxHost, 2, 0)
    assert(id > 99999999L, s"world too small to exercise the branch: $id")
    assert(links.head._1 === s"https://www.${Synth.hostName(maxHost)}/stories/a-$id")
    assert(links === referenceShaped(bigCfg)(maxHost, 2, 0 until 10))
  }

  test("sectionLinks equals the f-interpolator reference form (all sections)") {
    for {
      c <- Seq(cfg, bigCfg)
      hostIdx <- Seq(0, 3, 17, c.nHosts - 1)
      wave <- 0 until c.nWaves
      section <- Synth.SectionVocab.toSeq :+ "unknown"
    } {
      val h = Synth.hostName(hostIdx)
      val w = if (Synth.isZeroNewHost(hostIdx)) 0 else wave
      val si = Synth.SectionVocab.indexOf(section)
      val expected =
        if (si < 0) Seq.empty
        else (0 until c.sectionLinksPerWave).map { k =>
          val id = Synth.sectionArticleId(c)(hostIdx, w, si, k)
          val url =
            if (section == "local") f"https://www.$h/stories/local-$id%08d"
            else f"https://www.$h/$section/p-$id%08d"
          (url, k)
        }
      assert(Synth.sectionLinks(c)(hostIdx, wave, section) === expected)
    }
  }

  test("homepageLinks wire URL equals the f-interpolator reference form") {
    for {
      c <- Seq(cfg, bigCfg)
      hostIdx <- Seq(0, 1, 6, 20, c.nHosts - 1)
      wave <- 0 until c.nWaves
    } {
      val h = Synth.hostName(hostIdx)
      val w = if (Synth.isStaleHomepageHost(hostIdx)) 0 else wave
      val wire = Synth.homepageLinks(c)(hostIdx, wave).last._1
      assert(wire === f"https://www.$h/wire/ap-${Synth.wireId(c)(hostIdx, w)}%08d")
    }
  }
}
