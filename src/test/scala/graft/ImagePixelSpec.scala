package graft

import graft.ops.ImageKernels
import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage

/** Pins the r6 bulk-pixel rewrites of the image kernels to the original
  * per-pixel forms: `phash64` / `resize` / `psnr` now read via one bulk
  * `getRGB(0,0,w,h,…)` and `synthPixels` / `resize` write through the
  * backing DataBufferInt — all required bit-identical to per-pixel
  * `getRGB(x,y)` / `setRGB(x,y)` (these values feed `q_crawl_results`
  * and `q_image_*` outputs, which the DuckDB oracle hash-compares). */
class ImagePixelSpec extends AnyFunSuite {

  /** Reference per-pixel implementations (the pre-r6 forms). */
  private def phashRef(img: BufferedImage): Long = {
    val gw = 8; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val cell = Array.ofDim[Long](gh, gw)
    val cnt = Array.ofDim[Long](gh, gw)
    for (y <- 0 until h; x <- 0 until w) {
      val gy = math.min(y * gh / h, gh - 1)
      val gx = math.min(x * gw / w, gw - 1)
      val rgb = img.getRGB(x, y)
      cell(gy)(gx) += ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
      cnt(gy)(gx) += 1
    }
    val means = for (gy <- 0 until gh; gx <- 0 until gw) yield cell(gy)(gx) / cnt(gy)(gx)
    val avg = means.sum / 64
    means.zipWithIndex.foldLeft(0L) { case (acc, (m, i)) =>
      if (m > avg) acc | (1L << i) else acc
    }
  }

  private def resizeRef(img: BufferedImage, tw: Int, th: Int): BufferedImage = {
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val w = img.getWidth; val h = img.getHeight
    val sums = Array.ofDim[Long](th, tw, 3)
    val cnts = Array.ofDim[Long](th, tw)
    for (y <- 0 until h; x <- 0 until w) {
      val gy = math.min(y * th / h, th - 1)
      val gx = math.min(x * tw / w, tw - 1)
      val rgb = img.getRGB(x, y)
      sums(gy)(gx)(0) += (rgb >> 16) & 0xff
      sums(gy)(gx)(1) += (rgb >> 8) & 0xff
      sums(gy)(gx)(2) += rgb & 0xff
      cnts(gy)(gx) += 1
    }
    for (gy <- 0 until th; gx <- 0 until tw) {
      val n = math.max(cnts(gy)(gx), 1L)
      out.setRGB(gx, gy, (((sums(gy)(gx)(0) / n).toInt) << 16) |
        (((sums(gy)(gx)(1) / n).toInt) << 8) | (sums(gy)(gx)(2) / n).toInt)
    }
    out
  }

  private def pixelsEqual(a: BufferedImage, b: BufferedImage): Boolean = {
    a.getWidth == b.getWidth && a.getHeight == b.getHeight &&
      (0 until a.getHeight).forall(y =>
        (0 until a.getWidth).forall(x => a.getRGB(x, y) == b.getRGB(x, y)))
  }

  /** Seeds across the synth classes, and both decode types: INT_RGB
    * (synth source), 3BYTE_BGR (decoded png), and jpeg round-trips. */
  private def testImages: Seq[BufferedImage] = {
    val seeds = Seq(0L, 1L, 42L, 0x5eedL, -7L, Long.MaxValue)
    // widths/heights ≥ the 8×8 phash grid (the production domain: synth
    // images are 24×24, thumbs 8×8 — a <8px axis leaves empty grid cells)
    val raw = seeds.map(s => ImageKernels.synthPixels(s, 24, 24)) ++
      Seq(ImageKernels.synthPixels(9L, 9, 13), ImageKernels.synthPixels(10L, 8, 8))
    val decoded = raw.flatMap { img =>
      Seq("png", "jpeg").map(f => ImageKernels.decode(ImageKernels.encode(img, f)))
    }
    raw ++ decoded
  }

  test("phash64 (bulk getRGB) equals the per-pixel reference on every image type") {
    testImages.foreach { img =>
      assert(ImageKernels.phash64(img) == phashRef(img))
    }
  }

  test("resize (bulk read + raster write) equals the per-pixel reference") {
    testImages.foreach { img =>
      assert(pixelsEqual(ImageKernels.resize(img, 8, 8), resizeRef(img, 8, 8)))
    }
  }

  test("synthPixels raster write round-trips identically through setRGB semantics") {
    // getRGB must return opaque-alpha versions of exactly the packed ints
    val img = ImageKernels.synthPixels(42L, 24, 24)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    for (y <- 0 until 24; x <- 0 until 24)
      assert(img.getRGB(x, y) == (0xff000000 | buf(y * 24 + x)))
  }

  test("psnr (bulk getRGB) matches a per-pixel recompute") {
    val a = ImageKernels.synthPixels(1L, 24, 24)
    val b = ImageKernels.decode(ImageKernels.encode(a, "jpeg"))
    var se = 0.0; var n = 0L
    for (y <- 0 until 24; x <- 0 until 24; c <- 0 until 3) {
      val d = ((a.getRGB(x, y) >> (8 * c)) & 0xff) - ((b.getRGB(x, y) >> (8 * c)) & 0xff)
      se += d.toDouble * d; n += 1
    }
    val ref = if (se == 0) Double.PositiveInfinity
              else 10.0 * math.log10(255.0 * 255.0 * n / se)
    assert(ImageKernels.psnr(a, b) == ref)
  }
}
