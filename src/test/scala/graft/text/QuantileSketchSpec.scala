package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q155 pins: the histogram-path p50 is EXACTLY q138's per-language
  * lower median (same rank definition, shuffle-bounded shape instead
  * of the per-partition document sort), and the GK sketch respects
  * its rank-error guarantee on this corpus (wb flags all 1 — the same
  * flags the oracle gate hash-checks against literal 1). */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("histogram p50 equals q138's designed-sort lang median") {
    val viaSketchPath = TextOps.qualityQuantileSketch(spark, dir)
      .select("lang", "p50").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaSort = TextOps.qualityQuantileRoute(spark, dir)
      .select("lang", "lang_median").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSketchPath === viaSort)
  }

  test("GK sketch stays inside its rank-error bound on every language") {
    val rows = TextOps.qualityQuantileSketch(spark, dir)
      .select("lang", "n", "p50", "p90", "wb50", "wb90").collect()
    assert(rows.length >= 5)
    rows.foreach { r =>
      assert(r.getLong(4) === 1L, s"${r.getString(0)}: p50 sketch out of bound")
      assert(r.getLong(5) === 1L, s"${r.getString(0)}: p90 sketch out of bound")
      assert(r.getLong(2) <= r.getLong(3), "p50 must not exceed p90")
    }
  }
}
