package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** q167 pins the oracle gate cannot see: the concatenated-PPM stream
  * parser recovers every frame bit-exactly; the closed-form SAD the
  * oracle uses equals the brute-force pixel loop for EVERY δ (not just
  * the two the corpus exercises); and cuts land exactly on the
  * generator's shot lattice. */
class VideoOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("decodeFrames recovers every frame of the M-PPM stream bit-exactly") {
    val v = VideoOps.makeVideo(16L) // F = 24 + 16%3*8 = 32 frames
    val frames = Ppm.decodeFrames(v.bytes)
    assert(frames.length === VideoOps.clipFrames(16L))
    val c = ((16L * 97) % 256).toInt
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.width === VideoOps.FrameW && img.height === VideoOps.FrameH)
      val base = (c + (f / VideoOps.ShotLen) * VideoOps.ShotJump + f) % 256
      Seq(0, 1, 255, 256, VideoOps.FrameN - 1).foreach { i =>
        assert((img.pixels(i) & 0xff) === (base + i) % 256,
          s"frame $f pixel $i")
      }
    }
  }

  test("closed-form SAD equals the brute-force pixel loop for every delta") {
    val n = VideoOps.FrameN
    (1 until 256).foreach { delta =>
      val a = Array.tabulate[Byte](n)(i => (i % 256).toByte)
      val b = Array.tabulate[Byte](n)(i => ((i + delta) % 256).toByte)
      var brute = 0L
      var i = 0
      while (i < n) { brute += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1 }
      val closed = (n.toLong / 256) * 2 * delta * (256 - delta)
      assert(brute === closed, s"delta=$delta")
    }
  }

  test("cuts land exactly on the generator's shot lattice") {
    val rows = VideoOps.sceneDetect(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (f, nCuts, firstCut, nShots) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(firstCut === VideoOps.ShotLen.toLong)
      assert(nCuts === (f - 1) / VideoOps.ShotLen)
      assert(nShots === nCuts + 1)
    }
  }
}
