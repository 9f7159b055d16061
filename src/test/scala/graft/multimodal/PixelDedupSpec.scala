package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** q174 pins the oracle gate cannot see: every class spans BOTH
  * containers (the decoders agree pixel-for-pixel), and the naive
  * container-byte fingerprint provably misses every one of these
  * duplicates — the failure mode the operator exists to fix. */
class PixelDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("every pixel class spans both containers") {
    val rows = PixelDedup.pixelDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(5) === 2L, s"asset ${r.getLong(0)}: class size != 2")
      assert(r.getLong(6) === 2L, s"asset ${r.getLong(0)}: not cross-format")
    }
  }

  test("container-byte hashing misses every cross-format duplicate") {
    val pairs = PixelDedup.makePair(11L)
    val Seq((_, "ppm", ppmBytes), (_, "png", pngBytes)) = pairs
    assert(!java.util.Arrays.equals(ppmBytes, pngBytes),
      "containers of the same pixels must differ at the byte level")
    // and decoding both recovers identical pixels
    val a = Ppm.decode(ppmBytes)
    val b = Png.decode(pngBytes)
    assert(a.width === b.width && a.height === b.height)
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
  }
}
