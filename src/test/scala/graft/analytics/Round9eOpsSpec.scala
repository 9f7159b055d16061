package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Round-9 additions: link prediction (q229), multiclass classifier
  * eval (q230), streaming CUSUM (q231). */
class Round9eOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("q229: K4-minus-an-edge — the missing edge is the only candidate, scores closed-form") {
    import spark.implicits._
    // edges (1,2),(1,3),(2,3),(2,4),(3,4); missing (1,4)
    // deg: 1->2, 2->3, 3->3, 4->2; common neighbors of (1,4) = {2,3}
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("pa", "pb")
    val out = graft.graph.GraphOps.linkPredictionOf(e).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 4L)))
    assert(r.getLong(2) === 2L)                      // cn
    assert(r.getLong(3) === 2L * (1000000L / 3L))    // ra: 2 * (1e6 div 3)
    assert(r.getLong(4) === 1000000L)                // jaccard: 2e6 div (2+2-2)
  }

  test("q229: hub-capped wedges — a super-hub generates no candidates") {
    import spark.implicits._
    val cap = graft.graph.GraphOps.LinkPredHubCap
    // star: hub 100 joined to 1..cap+6 — hub degree exceeds the cap, the
    // leaves have degree 1, so no wedge survives
    val e = (1L to (cap + 6)).map(i => (i, 100L)).toDF("pa", "pb")
    assert(graft.graph.GraphOps.linkPredictionOf(e).collect().isEmpty)
    // control: the same star under the cap emits every leaf pair with cn=1,
    // which the min-cn floor then drops — still empty, but via the floor
    val small = (1L to 3L).map(i => (i, 100L)).toDF("pa", "pb")
    assert(graft.graph.GraphOps.linkPredictionOf(small).collect().isEmpty)
  }

  test("q229: sf corpus — candidates are non-edges with consistent scores") {
    val out = graft.graph.GraphOps.linkPrediction(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= graft.graph.GraphOps.LinkPredMinCn)
      assert(r.getLong(3) > 0L)
      assert(r.getLong(4) > 0L && r.getLong(4) <= 1000000L)
    }
  }

  test("q230: hand-computed 2x2 confusion — per-class P/R/F1, accuracy, macro-F1, kappa") {
    import spark.implicits._
    val cm = Seq(("a", "a", 40L), ("a", "b", 10L), ("b", "a", 20L), ("b", "b", 30L))
      .toDF("lang", "predicted", "n")
    val rows = graft.text.TextOps.evalOfConfusion(cm).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("a"); val b = rows("b")
    // class a: tp 40, fp 20, fn 10; prec 40e6 div 60, rec 40e6 div 50
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) === ((40L, 20L, 10L, 50L)))
    assert(a.getLong(5) === 666666L && a.getLong(6) === 800000L)
    assert(a.getLong(7) === 2L * 40L * 1000000L / 110L) // 727272
    // class b: tp 30, fp 10, fn 20
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) === ((30L, 10L, 20L)))
    assert(b.getLong(5) === 750000L && b.getLong(6) === 600000L && b.getLong(7) === 666666L)
    // globals repeated on every row: acc 70%, macro (727272+666666) div 2,
    // kappa = (100*70-5000)e6 div (10000-5000) = 400000
    Seq(a, b).foreach { r =>
      assert(r.getLong(8) === 700000L)
      assert(r.getLong(9) === 696969L)
      assert(r.getLong(10) === 400000L)
    }
  }

  test("q230: worse-than-chance fixture exercises the negative-kappa FLOOR branch") {
    import spark.implicits._
    // N=5, diag=2, chance=12, kden=13, knum=-2:
    // kappa = floor(-2e6/13) = -153847 (truncation would say -153846)
    val cm = Seq(("x", "x", 1L), ("x", "y", 2L), ("y", "x", 1L), ("y", "y", 1L))
      .toDF("lang", "predicted", "n")
    val out = graft.text.TextOps.evalOfConfusion(cm).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(10) === -153847L))
    // systematic total disagreement pins kappa at exactly -1
    val anti = Seq(("x", "y", 50L), ("y", "x", 50L)).toDF("lang", "predicted", "n")
    graft.text.TextOps.evalOfConfusion(anti).collect()
      .foreach(r => assert(r.getLong(10) === -1000000L))
  }

  test("q230: sf corpus — prediction-only classes carry zero support, ledger consistent") {
    val rows = graft.text.TextOps.langIdEval(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tp, fp, fn, support) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tp >= 0L && fp >= 0L && fn >= 0L)
      assert(tp + fn === support)
      Seq(5, 6, 7, 8, 9).foreach(i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) <= 1000000L))
      assert(r.getLong(10) >= -1000000L && r.getLong(10) <= 1000000L)
    }
    // the heuristic emits 'unknown' — a column class with no gold row
    val unknown = rows.find(_.getString(0) == "unknown")
    unknown.foreach(r => assert(r.getLong(4) === 0L && r.getLong(3) === 0L))
  }

  test("q231: the streamed CUSUM ledger equals the batch q226 ledger row-for-row") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.get(1).toString, r.getLong(2), r.getLong(3), r.getLong(4))
    val batch = EventOps.cusumChangepoint(spark, dir).collect().map(key).sortBy(_.toString)
    val stream = EventOps.cusumStream(spark, dir).collect().map(key).sortBy(_.toString)
    assert(stream.nonEmpty)
    assert(stream.toSeq === batch.toSeq)
  }
}
