package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Round-9 additions: association rules (q238), Kaplan-Meier
  * time-to-conversion (q239). */
class Round9hOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("q238: hand-built baskets — confidence is exact, lift exposes a negative association") {
    import spark.implicits._
    // baskets: {A,B} {A,B} {A,C} {B} — supported pair AB only (n=2);
    // conf(A->B) = 2/3, lift = 2*4/(3*3) = 8/9 < 1 despite the high conf
    val baskets = Seq((1L, 101L), (1L, 102L), (2L, 101L), (2L, 102L),
        (3L, 101L), (3L, 103L), (4L, 102L))
      .toDF("l_orderkey", "l_partkey")
    val rows = Relational.assocRulesOfBaskets(baskets).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(rows.size === 2) // AB both directions; AC under support
    val ab = rows((101L, 102L))
    assert((ab.getLong(2), ab.getLong(3), ab.getLong(4)) === ((2L, 3L, 3L)))
    assert(ab.getLong(5) === 666666L)
    assert(ab.getLong(6) === 888888L)
    val ba = rows((102L, 101L))
    assert(ba.getLong(5) === 666666L && ba.getLong(6) === 888888L)
  }

  test("q238: sf corpus — rules paired both directions, lift symmetric, conf asymmetric-consistent") {
    val rows = Relational.assocRules(spark, dir).collect()
    assert(rows.nonEmpty)
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    rows.foreach { r =>
      val rev = m((r.getLong(1), r.getLong(0)))
      assert(rev.getLong(2) === r.getLong(2))            // shared support
      assert(rev.getLong(6) === r.getLong(6))            // lift symmetric
      assert(r.getLong(5) === r.getLong(2) * 1000000L / r.getLong(3))
      assert(r.getLong(5) > 0L && r.getLong(5) <= 1000000L)
    }
  }

  test("q239: hand-computed cells — at-risk bookkeeping and the iterated-floor survival") {
    import spark.implicits._
    // nTotal 10; day1 d=2; day2 d=1 c=2; day3 d=1
    val cells = Seq(("T", 1L, 2L, 0L), ("T", 2L, 1L, 2L), ("T", 3L, 1L, 0L))
      .toDF("target", "day", "d", "c")
    val out = EventOps.kmOfCells(cells, 10L).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(out(1L).getLong(2) === 10L && out(1L).getLong(6) === 800000L)
    assert(out(2L).getLong(2) === 8L && out(2L).getLong(6) === 700000L)
    assert(out(3L).getLong(2) === 5L && out(3L).getLong(6) === 560000L)
    assert(out(3L).getLong(5) === 200000L)               // hazard 1/5
  }

  test("q239: sf corpus — survival monotone nonincreasing, at-risk conserves, censors land once") {
    val rows = EventOps.kaplanMeier(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      // survival never increases along a curve
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(6) <= a.getLong(6), s"$t day ${b.getLong(1)}")
        case _ =>
      }
      // n_risk starts at the cohort and strictly decreases by d+c
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) === a.getLong(2) - a.getLong(3) - a.getLong(4))
        case _ =>
      }
      // every curve ends with the never-converted mass censored out
      assert(sorted.last.getLong(2) === sorted.last.getLong(3) + sorted.last.getLong(4)
        || sorted.map(r => r.getLong(3) + r.getLong(4)).sum ===
           sorted.head.getLong(2))
    }
  }
}
