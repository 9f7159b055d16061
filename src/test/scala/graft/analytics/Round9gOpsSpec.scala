package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Round-9 additions: exact-Gini CART stump (q235), absorbing-chain
  * conversion probability (q236), pairwise lexical TV drift (q237). */
class Round9gOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("q235: hand-computed cells — argmin threshold, scaled Gini, root impurity, accuracy") {
    import spark.implicits._
    val cells = Seq(("S", 0L, 10L, 1L), ("S", 1L, 10L, 2L),
        ("S", 2L, 10L, 9L), ("S", 3L, 10L, 10L))
      .toDF("source", "bin", "n", "s")
    val r = graft.text.GiniStump.stumpOfCells(cells).collect().head
    assert(r.getLong(1) === 1L)                          // threshold: split after bin 1
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) === ((20L, 3L, 20L, 19L)))
    assert(r.getLong(6) === 7000000000000L)              // W = 102/20 + 38/20 = 7.0
    assert(r.getLong(7) === 19800000000000L)             // root: 2*22*18/40 = 19.8
    assert(r.getLong(8) === 900000L)                     // (17+19)/40
  }

  test("q235: equal-impurity thresholds tie-break to the smaller bin") {
    import spark.implicits._
    val cells = Seq(("S", 0L, 10L, 0L), ("S", 1L, 10L, 5L), ("S", 2L, 10L, 10L))
      .toDF("source", "bin", "n", "s")
    val r = graft.text.GiniStump.stumpOfCells(cells).collect().head
    assert(r.getLong(1) === 0L)
    assert(r.getLong(6) === 7500000000000L)
  }

  test("q235: sf corpus — split strictly improves on the root, ledger conserves") {
    val rows = graft.text.GiniStump.giniStump(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(6) <= r.getLong(7),
        s"${r.getString(0)}: split ${r.getLong(6)} worse than root ${r.getLong(7)}")
      assert(r.getLong(2) > 0L && r.getLong(4) > 0L)     // both sides populated
      assert(r.getLong(8) >= 500000L)                    // beats a coin at worst
    }
  }

  test("q236: deterministic two-step chain — reach propagates backward exactly") {
    import spark.implicits._
    // A -> B -> purchase, D self-loops (never absorbs), C 50/50 purchase/D
    val counts = Seq(
      ("A", "B", 1L), ("B", "purchase", 1L), ("D", "D", 5L),
      ("C", "purchase", 1L), ("C", "D", 1L))
      .toDF("from_type", "to_type", "n")
    val m = EventOps.absorbProbOfCounts(counts).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("purchase").getLong(2) === 1000000L && m("purchase").getLong(3) === 1L)
    assert(m("A").getLong(2) === 1000000L)
    assert(m("B").getLong(2) === 1000000L)
    assert(m("D").getLong(2) === 0L)
    assert(m("C").getLong(2) === 500000L)
  }

  test("q236: sf corpus — purchase pinned, every live state strictly between 0 and 1") {
    val rows = EventOps.absorbProb(spark, dir).collect()
    assert(rows.nonEmpty)
    val m = rows.map(r => r.getString(0) -> r).toMap
    assert(m("purchase").getLong(2) === 1000000L)
    rows.filter(_.getLong(3) === 0L).foreach { r =>
      assert(r.getLong(2) > 0L && r.getLong(2) < 1000000L,
        s"${r.getString(0)} reach ${r.getLong(2)}")
      assert(r.getLong(1) > 0L)
    }
  }

  test("q237: hand-computed two-source counts — TV via the inner-join decomposition") {
    import spark.implicits._
    // X: a=3, b=1 (p 750000/250000); Y: a=1, c=1 (p 500000/500000)
    // TV = (|750000-500000| + 250000 + 500000) / 2 = 500000
    val cnt = Seq(("X", "a", 3L), ("X", "b", 1L), ("Y", "a", 1L), ("Y", "c", 1L))
      .toDF("source", "tok", "c")
    val r = graft.analytics.DriftOps.lexicalDriftOfCounts(cnt).collect()
    assert(r.length === 1)
    assert((r.head.getString(0), r.head.getString(1)) === (("X", "Y")))
    assert(r.head.getLong(2) === 1L)          // only 'a' shared
    assert(r.head.getLong(3) === 500000L)
    // identical sources have zero drift
    val same = Seq(("X", "a", 2L), ("X", "b", 2L), ("Y", "a", 2L), ("Y", "b", 2L))
      .toDF("source", "tok", "c")
    assert(graft.analytics.DriftOps.lexicalDriftOfCounts(same)
      .collect().head.getLong(3) === 0L)
  }

  test("q237: sf corpus — full matrix, symmetric bounds") {
    val rows = graft.analytics.DriftOps.lexicalDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    val sources = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
    assert(rows.length === sources.length * (sources.length - 1) / 2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
      assert(r.getLong(2) > 0L) // real corpora share vocabulary
    }
  }
}
