package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** q178 pins the oracle gate cannot see: every clip identifies to its
  * TRUE (source, offset) cell with a full-alignment vote; the WAV
  * round trip is sample-exact (the codec can never influence the
  * energies); and the quadratic generator produces frame sequences
  * that genuinely depend on the frame index for every prime modulus
  * (the degeneracy class m | FrameLen·k that caused self-aliasing is
  * structurally excluded). */
class AudioMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("every clip identifies to its true source and offset with full votes") {
    val rows = AudioMatch.audioMatch(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(5) === 1L,
        s"clip ${r.getLong(0)} matched ${r.getLong(2)}@${r.getLong(3)}")
      assert(r.getLong(4) === r.getLong(1),
        s"clip ${r.getLong(0)}: votes ${r.getLong(4)} < hashes ${r.getLong(1)}")
    }
  }

  test("WAV round trip is sample-exact for the q178 generator") {
    val samples = AudioMatch.makeTrack(354L) // the m=160 regression id
    val decoded = Wav.decode(Wav.encode(8000, samples))
    assert(java.util.Arrays.equals(samples, decoded.samples))
  }

  test("prime moduli keep the stream frame-dependent (no m | 160 degeneracy)") {
    AudioMatch.QuadPrimes.foreach { m =>
      assert(m > 1 && 160 % m != 0 && m % 2 == 1 && m % 5 != 0)
      // frames 0 and 1 must differ somewhere beyond the linear shift:
      // (160+j)^2 mod m != j^2 mod m for some j
      assert((0 until 160).exists(j =>
        ((160 + j).toLong * (160 + j)) % m != (j.toLong * j) % m),
        s"m=$m: quadratic term is frame-invariant")
    }
  }
}
