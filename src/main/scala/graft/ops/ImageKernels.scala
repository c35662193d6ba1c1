package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Image payload kernels (multimodal column support). Images travel as
  * opaque `binary` columns with typed metadata (w, h, fmt); decode /
  * hash / resize run inside `mapPartitions` so the codec object lives
  * once per task, not per row. ImageIO ships with the JDK — the decode
  * path is real, not stubbed. */
object ImageKernels {

  // ImageIO's default stream cache is DISK-backed: without this, every
  // encode/decode spins a temp file per image (create+write+delete —
  // measured 4× the cost of the in-memory path at 24×24). The fetch
  // resolver round-trips two streams per fetched URL, so the crawl's
  // GC-heaviest stage was also fd/IO-bound for nothing. Output bytes
  // are identical; only the staging buffer moves off disk.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic RGB pixel field from a 64-bit seed: seeded
    * low-frequency sinusoid mixture (StrictMath for cross-platform bit
    * determinism). Smooth fields survive lossy JPEG at high PSNR — the
    * per-row fidelity invariant is PSNR ≥ 40 dB — while still giving
    * per-seed-distinct phashes. */
  def synthPixels(seed: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // INT_RGB is DataBufferInt-backed; writing packed 0xRRGGBB ints into
    // the raster array directly is bit-identical to per-pixel setRGB
    // (alpha byte is zero either way) without the per-call ColorModel
    // dance — this runs once per pixel per fetched URL
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    val m = mix64(seed)
    val fx = 0.05 + ((m & 0xff).toDouble / 255.0) * 0.25
    val fy = 0.05 + (((m >>> 8) & 0xff).toDouble / 255.0) * 0.25
    val p0 = ((m >>> 16) & 0xff).toDouble / 40.0
    val p1 = ((m >>> 24) & 0xff).toDouble / 40.0
    val p2 = ((m >>> 32) & 0xff).toDouble / 40.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // single luma field on all three channels: chroma is flat, so
        // JPEG 4:2:0 subsampling costs nothing and PSNR stays ≥ 40 dB
        val v = (128 + 60 * StrictMath.sin(fx * x + fy * y + p0) +
          40 * StrictMath.sin(fy * x - fx * y + p1) +
          20 * StrictMath.sin(0.5 * fx * (x + y) + p2)).toInt.max(0).min(255)
        buf(y * w + x) = (v << 16) | (v << 8) | v
        x += 1
      }
      y += 1
    }
    img
  }

  /** One bulk ARGB read of the whole image — documented to return the
    * same values as per-pixel `getRGB(x, y)` for any image type, without
    * the per-call overhead (1.5× faster even at 24×24). */
  private def pixelsOf(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    // presized: the default 32-byte buffer doubles ~9 times to reach a
    // typical encoded payload, re-copying the array each time — pure
    // allocation churn in the fetch stage (the GC-heaviest crawl stage)
    val bos = new ByteArrayOutputStream(img.getWidth * img.getHeight / 2 + 1024)
    if (fmt == "jpeg") {
      // explicit high quality so the PSNR ≥ 40 dB invariant holds
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(0.98f)
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      writer.dispose(); ios.close()
    } else ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** 64-bit average-phash: downsample to 8×8 luma, threshold at mean.
    * Deterministic integer arithmetic (block-mean downsample, no
    * float resampling) so it is reproducible everywhere. */
  def phash64(img: BufferedImage): Long = {
    val gw = 8; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val px = pixelsOf(img)
    val cell = Array.ofDim[Long](gh, gw)
    val cnt = Array.ofDim[Long](gh, gw)
    var y = 0
    while (y < h) {
      val gy = math.min(y * gh / h, gh - 1)
      val row = y * w
      var x = 0
      while (x < w) {
        val gx = math.min(x * gw / w, gw - 1)
        val rgb = px(row + x)
        val luma = ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
        cell(gy)(gx) += luma
        cnt(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    val means = for (gy <- 0 until gh; gx <- 0 until gw) yield cell(gy)(gx) / cnt(gy)(gx)
    val avg = means.sum / 64
    means.zipWithIndex.foldLeft(0L) { case (acc, (m, i)) =>
      if (m > avg) acc | (1L << i) else acc
    }
  }

  /** PSNR (dB) between two same-size RGB images; Double.PositiveInfinity
    * for identical pixels. The graft's per-row fidelity invariant is
    * PSNR ≥ 40 dB for jpeg, exact for png. */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
    val pxa = pixelsOf(a); val pxb = pixelsOf(b)
    var se = 0.0
    var n = 0L
    var i = 0
    while (i < pxa.length) {
      val pa = pxa(i); val pb = pxb(i)
      var c = 0
      while (c < 3) {
        val d = ((pa >> (8 * c)) & 0xff) - ((pb >> (8 * c)) & 0xff)
        se += d.toDouble * d; n += 1
        c += 1
      }
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * n / se)
  }

  /** Block-mean resize to (tw × th) — deterministic integer downsample
    * for thumbnail/feature-extract stages. */
  def resize(img: BufferedImage, tw: Int, th: Int): BufferedImage = {
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val obuf = out.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    val w = img.getWidth; val h = img.getHeight
    val px = pixelsOf(img)
    val sums = Array.ofDim[Long](th, tw, 3)
    val cnts = Array.ofDim[Long](th, tw)
    var y = 0
    while (y < h) {
      val gy = math.min(y * th / h, th - 1)
      val row = y * w
      var x = 0
      while (x < w) {
        val gx = math.min(x * tw / w, tw - 1)
        val rgb = px(row + x)
        sums(gy)(gx)(0) += (rgb >> 16) & 0xff
        sums(gy)(gx)(1) += (rgb >> 8) & 0xff
        sums(gy)(gx)(2) += rgb & 0xff
        cnts(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    var gy = 0
    while (gy < th) {
      var gx = 0
      while (gx < tw) {
        val n = math.max(cnts(gy)(gx), 1L)
        val r = (sums(gy)(gx)(0) / n).toInt
        val g = (sums(gy)(gx)(1) / n).toInt
        val b = (sums(gy)(gx)(2) / n).toInt
        obuf(gy * tw + gx) = (r << 16) | (g << 8) | b
        gx += 1
      }
      gy += 1
    }
    out
  }
}
