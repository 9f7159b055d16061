package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** q183/q184 pins the oracle gate cannot see. */
class WeightedMinHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("q184: the replication reduction computes the exact weighted Jaccard") {
    // A = {a,b,c}, B = {b,c,d}; weights w(a)=3, w(b)=1, w(c)=2, w(d)=1
    // J_w = (w(b)+w(c)) / (w(a)+w(b)+w(c)+w(d)) = 3/7
    val w = Map('a' -> 3, 'b' -> 1, 'c' -> 2, 'd' -> 1)
    def rep(s: Set[Char]) = s.flatMap(h => (0 until w(h)).map(r => (h, r)))
    val (ra, rb) = (rep(Set('a', 'b', 'c')), rep(Set('b', 'c', 'd')))
    val viaReplication = (ra & rb).size.toDouble / (ra | rb).size
    assert(viaReplication === 3.0 / 7.0)
  }

  test("q184: weighting genuinely re-scores pairs on this corpus") {
    val rows = WeightedMinHash.weightedNearDup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (jw, ju) = (r.getLong(3), r.getLong(4))
      assert(jw >= WeightedMinHash.JwCutBp)
      assert(jw <= 10000L && ju <= 10000L)
    }
    assert(rows.exists(r => r.getLong(3) != r.getLong(4)),
      "weighted and unweighted Jaccard identical everywhere — weights are dead")
  }

  test("q183: every label emits exactly K outliers, ranked consistently") {
    import graft.vector.VectorOps
    val rows = VectorOps.labelOutliers(spark, dir).collect()
    val byLabel = rows.groupBy(_.getInt(0))
    assert(byLabel.nonEmpty)
    byLabel.foreach { case (l, rs) =>
      assert(rs.length === VectorOps.OutlierK, s"label $l")
      val sorted = rs.sortBy(_.getLong(1))
      // dist2 non-increasing down the rank order
      sorted.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi.getDouble(3) >= lo.getDouble(3), s"label $l rank order")
      case _ => ()
      }
    }
  }
}
