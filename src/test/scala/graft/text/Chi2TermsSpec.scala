package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q210 χ² term-source association: planted contingency tables with
  * hand-computed χ² values, plus the degenerate everywhere-term. */
class Chi2TermsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("planted contingency: exact hand-computed chi2_u, ubiquitous term scores 0") {
    import spark.implicits._
    // 10 docs: 4 in srcA, 6 in srcB. "alpha" in all 4 srcA docs and 1
    // srcB doc; "common" in every doc.
    val docs = (
      (0 until 4).map(i => (s"d$i", "srcA", "alpha common")) ++
      (4 until 5).map(i => (s"d$i", "srcB", "alpha common")) ++
      (5 until 10).map(i => (s"d$i", "srcB", "beta common"))
    ).toDF("doc_id", "source", "text")
    val out = TextOps.chi2TermsOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // alpha/srcA: a=4 b=1 c=0 d=5, N=10
    // chi2 = 10*(4*5-1*0)^2*1e6 / (5*5*4*6) = 10*400*1e6/600 = 6666666
    assert(out(("srcA", "alpha")) === 10L * 400 * 1000000 / 600)
    // alpha/srcB: a=1 b=4 c=5 d=0 -> (ad-bc) = -20, same square
    assert(out(("srcB", "alpha")) === 10L * 400 * 1000000 / 600)
    // beta/srcB: a=5 b=0 c=1 d=4 -> (20)^2 -> 10*400*1e6/(5*5*6*4)
    assert(out(("srcB", "beta")) === 10L * 400 * 1000000 / 600)
    // a term in EVERY doc: margins zero -> defined as 0, not an error
    assert(out(("srcA", "common")) === 0L)
    assert(out(("srcB", "common")) === 0L)
  }

  test("ranks are per-source, dense from 1, ordered by score then term") {
    val out = TextOps.chi2Terms(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4), r.getInt(5)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to sorted.length).toSeq)
      sorted.toSeq.sliding(2).foreach {
        case Seq(x, y) =>
          assert(x._3 > y._3 || (x._3 == y._3 && x._2 < y._2))
        case _ =>
      }
    }
  }
}
