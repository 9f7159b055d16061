package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Round-9 additions: trimmed/winsorized mean (q232), mixture
  * diversity (q233), jackknife trend influence (q234). */
class Round9fOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("q232: planted outlier — mean explodes, trimmed and winsorized stay put") {
    import spark.implicits._
    // 1..9 plus a 1000-char outlier: k = 1 trims exactly the tails
    val docs = ((1L to 9L) :+ 1000L).map(v => ("en", v)).toDF("lang", "n_chars")
    val r = graft.text.TextOps.trimmedMeanOf(docs).collect().head
    assert(r.getLong(1) === 10L && r.getLong(2) === 1L)        // n, k
    assert(r.getLong(3) === 10450L)                            // mean: 1045/10
    assert(r.getLong(4) === 550L)                              // trimmed: 44/8
    assert(r.getLong(5) === 2L && r.getLong(6) === 9L)         // cuts
    assert(r.getLong(7) === 550L)                              // wins: (44+2+9)/10
    // clean series: all three estimators coincide
    val clean = (1L to 10L).map(v => ("en", v)).toDF("lang", "n_chars")
    val c = graft.text.TextOps.trimmedMeanOf(clean).collect().head
    assert(c.getLong(3) === 550L && c.getLong(4) === 550L && c.getLong(7) === 550L)
  }

  test("q232: sf corpus — trimmed/winsorized bracketed by the value range, k consistent") {
    val rows = graft.text.TextOps.trimmedMean(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getLong(1), r.getLong(2))
      assert(k === n * graft.text.TextOps.TrimBp / 10000L)
      assert(r.getLong(5) <= r.getLong(6))                     // lo_cut <= hi_cut
      Seq(3, 4, 7).foreach(i => assert(r.getLong(i) > 0L))
      // winsorized mean lies within the cut interval (x100)
      assert(r.getLong(7) >= r.getLong(5) * 100L && r.getLong(7) <= r.getLong(6) * 100L)
    }
  }

  test("q233: hand-computed strata — HHI, effective strata, max share per axis") {
    import spark.implicits._
    val docs = Seq(("A", "en"), ("A", "en"), ("A", "de"), ("B", "en"))
      .toDF("source", "lang")
    val rows = graft.text.TextOps.mixtureDiversityOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // source axis: counts (3,1), n=4, ss=10
    val s = rows("source")
    assert(s.getLong(1) === 2L && s.getLong(2) === 4L)
    assert(s.getLong(3) === 625000L && s.getLong(4) === 160L && s.getLong(5) === 750000L)
    // lang axis mirrors (3,1)
    val l = rows("lang")
    assert(l.getLong(3) === 625000L && l.getLong(4) === 160L)
    // source_lang axis: (2,1,1), ss=6
    val sl = rows("source_lang")
    assert(sl.getLong(1) === 3L)
    assert(sl.getLong(3) === 375000L && sl.getLong(4) === 266L && sl.getLong(5) === 500000L)
  }

  test("q233: sf corpus — bounds hold on every axis") {
    val rows = graft.text.TextOps.mixtureDiversity(spark, dir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (ns, hhi, eff, maxs) = (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(hhi >= 1000000L / ns && hhi <= 1000000L, s"hhi $hhi for $ns strata")
      assert(eff >= 100L && eff <= ns * 100L, s"eff $eff for $ns strata")
      assert(maxs * ns >= 1000000L - ns)   // max share >= fair share (floor slack)
    }
    // finer stratification cannot be MORE concentrated
    val m = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m("source_lang") <= m("source") && m("source_lang") <= m("lang"))
  }

  test("q234: collinear months have zero influence; a planted outlier flips the sign") {
    import spark.implicits._
    val clean = Seq(("N", 0L, 0L), ("N", 1L, 10L), ("N", 2L, 20L))
      .toDF("n_name", "m", "y")
    val cr = graft.analytics.Relational.trendInfluenceOf(clean).collect()
    assert(cr.length === 3)
    cr.foreach(r => assert(r.getLong(3) === 0L && r.getLong(4) === 0L))
    // adding y=-1000 at m=3: full slope -299 exactly; removing it refits +10
    val dirty = Seq(("N", 0L, 0L), ("N", 1L, 10L), ("N", 2L, 20L), ("N", 3L, -1000L))
      .toDF("n_name", "m", "y")
    val dr = graft.analytics.Relational.trendInfluenceOf(dirty).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(dr(3L).getLong(3) === 309000000L)   // (10 - (-299)) * 1e6
    assert(dr(3L).getLong(4) === 1L)
    assert(dr(0L).getLong(4) === 0L && dr(1L).getLong(4) === 0L)
  }

  test("q234: sf corpus — one row per (nation, month), deltas present") {
    val rows = graft.analytics.Relational.trendInfluence(spark, dir).collect()
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(_.getString(0))
    byNation.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).distinct.length === rs.length) // unique months
    }
    assert(rows.exists(_.getLong(3) != 0L))
  }
}
