package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

/** Real JVM image decode + perceptual hashing for the §2E media
  * operators — pure public-JDK code (`javax.imageio` ships PNG, JPEG,
  * GIF and BMP readers in every standard JVM; no native libraries, no
  * display needed).
  *
  * Everything here is DETERMINISTIC by construction, because the
  * fingerprints feed a banded near-dup join whose output must be
  * stable across runs, JVMs, and executor platforms:
  *  - the resample is an explicit area-average over integer pixel
  *    boxes, not `Graphics2D.drawImage` (whose filtering is
  *    implementation-defined);
  *  - the DCT is a plain double-precision separable DCT-II with a
  *    fixed summation order;
  *  - the bit rule is the classic pHash one (coefficient > mean of
  *    the 8×8 low-frequency block excluding DC).
  *
  * Used inside `mapPartitions` batches (decoder instances and the DCT
  * cosine table amortize per task, the shape codec work wants) — never
  * as a row-at-a-time UDF. */
private[graft] object ImageCodec {

  /** Decode any payload a registered reader claims; None for
    * non-images and corrupt containers (the caller's fallback arm). */
  def decode(payload: Array[Byte]): Option[BufferedImage] =
    if (payload == null || payload.length == 0) None
    else
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** All frames of an animated container (GIF), up to `maxFrames`;
    * single-frame formats yield one frame; None when no reader claims
    * the payload. */
  def decodeFrames(payload: Array[Byte], maxFrames: Int): Option[Vector[BufferedImage]] = {
    if (payload == null || payload.length == 0) return None
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => return None }
    if (iis == null) return None
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return None }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = math.min(reader.getNumImages(true), maxFrames)
      Some((0 until n).map(reader.read).toVector)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally { reader.dispose(); iis.close() }
  }

  /** Deterministic area-average grayscale resample to side×side
    * (BT.601 luminance). Integer box edges, full coverage. */
  def grayResample(img: BufferedImage, side: Int): Array[Double] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Double](side * side)
    var gy = 0
    while (gy < side) {
      val y0 = gy * h / side
      val y1 = math.max((gy + 1) * h / side, y0 + 1)
      var gx = 0
      while (gx < side) {
        val x0 = gx * w / side
        val x1 = math.max((gx + 1) * w / side, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        out(gy * side + gx) = s / ((y1 - y0).toDouble * (x1 - x0).toDouble)
        gx += 1
      }
      gy += 1
    }
    out
  }

  private val N = 32
  private lazy val cosTable: Array[Array[Double]] =
    Array.tabulate(N, N)((k, n) => math.cos(math.Pi / N * (n + 0.5) * k))

  /** 64-bit DCT perceptual hash (pHash): 32×32 gray → separable 2-D
    * DCT-II → 8×8 low-frequency block → bit b set iff its coefficient
    * exceeds the block mean computed WITHOUT the DC term. Visually
    * near-identical images (a re-encode, mild compression noise)
    * land within a few bits; unrelated images ~32 bits apart. */
  def pHash64(img: BufferedImage): Long = {
    val g = grayResample(img, N)
    val cos = cosTable
    // DCT along rows
    val tmp = new Array[Double](N * N)
    var y = 0
    while (y < N) {
      var k = 0
      while (k < N) {
        var s = 0.0; var n = 0
        while (n < N) { s += g(y * N + n) * cos(k)(n); n += 1 }
        tmp(y * N + k) = s; k += 1
      }
      y += 1
    }
    // DCT along columns; only the 8 frequencies the hash reads
    val block = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var n = 0
        while (n < N) { s += tmp(n * N + v) * cos(u)(n); n += 1 }
        block(u * 8 + v) = s; v += 1
      }
      u += 1
    }
    var mean = 0.0
    var i = 1
    while (i < 64) { mean += block(i); i += 1 }
    mean /= 63.0
    var bits = 0L
    i = 0
    while (i < 64) {
      if (block(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** PNG re-encode of a decoded frame — the deterministic byte form
    * the frame-sampling operator ships downstream (PNG is lossless
    * and the JDK encoder is deterministic for a given image). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
