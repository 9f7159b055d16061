package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** q169 pins the oracle gate cannot see: the held-out structure makes
  * every backoff tier actually fire on this corpus (a tier that never
  * fires is dead code a hash-equal oracle would still bless), tier
  * counts conserve, and scores respect the per-tier caps implied by
  * Stupid Backoff's relative frequencies (c₃ ≤ c₁₂ ⇒ tier-3 ≤ 10⁶,
  * α caps the lower tiers). */
class BackoffLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("tier ledger conserves and every backoff tier fires") {
    val rows = BackoffLm.backoffScore(spark, dir).collect()
    assert(rows.nonEmpty)
    var (h3, h2, h1) = (0L, 0L, 0L)
    rows.foreach { r =>
      val (nTri, n3, n2, n1, miss) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nTri === n3 + n2 + n1 + miss)
      h3 += n3; h2 += n2; h1 += n1
    }
    assert(h3 > 0L, "no trigram hits: train/score splits disjoint?")
    assert(h2 > 0L, "bigram backoff never fired")
    assert(h1 > 0L, "unigram backoff never fired")
  }

  test("scores stay inside the Stupid Backoff caps") {
    val rows = BackoffLm.backoffScore(spark, dir)
      .select("score_u", "total_u", "n_tri").collect()
    rows.foreach { r =>
      val score = r.getLong(0)
      assert(score >= 0L && score <= 1000000L, s"score $score out of [0, 1e6]")
      assert(r.getLong(1) <= 1000000L * r.getLong(2))
    }
  }
}
