package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q225 split-conformal gate: the distributed ledger must equal an
  * in-memory replay (order statistic, threshold, admit counts), and
  * the finite-sample calibration guarantee must hold by construction:
  * calibration-side coverage ≥ 1−α at every level. */
class ConformalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  test("q225: ledger == in-memory order-statistic replay; coverage >= 1-alpha") {
    val scored = QualityClassifier.classify(spark, dir)
      .select(col("doc_id"), (-col("logit_u")).as("s_u"))
      .join(TextOps.hashSplit(spark, dir).select("doc_id", "split"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val cal = scored.filter(_._3 == "val").map(t => (t._2, t._1))
      .sortBy(identity).map(_._1)
    val tst = scored.filter(_._3 == "test").map(_._2)
    assert(cal.nonEmpty && tst.nonEmpty, "fixture splits empty")

    val got = QualityClassifier.conformalGate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(got.keySet === QualityClassifier.ConformalAlphas.toSet)
    QualityClassifier.ConformalAlphas.foreach { a =>
      val n = cal.length.toLong
      val k = math.min(((n + 1) * (100 - a) + 99) / 100, n)
      val thr = cal(k.toInt - 1)
      val nAdmit = tst.count(_ <= thr).toLong
      val calWithin = cal.count(_ <= thr).toLong
      val (gn, gk, gthr, gnt, gna, gppm, gcov) = got(a)
      assert(gn === n); assert(gk === k); assert(gthr === thr)
      assert(gnt === tst.length.toLong); assert(gna === nAdmit)
      assert(gppm === nAdmit * 1000000L / tst.length)
      assert(gcov === calWithin * 1000000L / n)
      // the split-conformal guarantee, exact on the calibration side:
      // at least k of n scores are <= the k-th order statistic
      assert(gcov >= (100L - a) * 10000L,
        s"alpha=$a% calibration coverage ${gcov}ppm below ${100 - a}%")
    }
  }
}
