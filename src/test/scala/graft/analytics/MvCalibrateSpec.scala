package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q175/q176 pins the oracle gate cannot see. */
class MvCalibrateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("q175: incremental merge equals the in-Spark full recompute; delta everywhere") {
    val merged = MvMaintain.mvMerge(spark, dir).collect()
      .map(r => r.getAs[java.sql.Timestamp](0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val recomputed = Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("s"),
        sum(when(col("o_orderkey") % 10 === 7, 1L).otherwise(0L)).as("d"))
      .collect()
      .map(r => r.getAs[java.sql.Timestamp](0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(merged === recomputed)
    val withDelta = merged.values.count(_._3 > 0L)
    assert(withDelta * 5 >= merged.size * 4,
      "most months should receive delta rows (merge path exercised broadly)")
    merged.values.foreach { case (n, _, d) =>
      assert(d * 5 < n || n < 5, "delta should be a small fraction of the month")
    }
  }

  test("q176: calibration flattens the top-quartile shares") {
    val rows = graft.text.CalibrateOps.rankCalibrate(spark, dir).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    val rawSpread = rows.map(_._1).max - rows.map(_._1).min
    val calSpread = rows.map(_._2).max - rows.map(_._2).min
    assert(calSpread <= 2L, s"calibrated shares spread $calSpread: not uniform")
    assert(rawSpread >= calSpread + 3,
      s"raw spread $rawSpread vs calibrated $calSpread: corpus cannot show the repair")
    // conservation: both selections pick exactly floor(N/4) documents
    val n = rows.map(_._1).sum
    assert(n === rows.map(_._2).sum)
  }
}
