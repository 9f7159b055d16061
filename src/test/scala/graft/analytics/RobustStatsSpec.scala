package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q161/q162 pins beyond the oracle gate: the histogram-path
  * median/MAD equal a brute-force reference over the raw values, and
  * the integer OLS slope matches the floating-point normal-equation
  * slope to within its quantization unit. */
class RobustStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(((s.size + 1) / 2) - 1)
  }

  test("histogram median/MAD equal the brute-force reference (q161)") {
    val got = graft.text.TextOps.madOutliers(spark, dir)
      .select("lang", "med", "mad", "n_out").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val byLang = graft.tables.Tables.documents(spark, dir)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    assert(got.keySet === byLang.keySet)
    for ((lang, rows) <- byLang) {
      val xs = rows.map(_._2).toSeq
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)))
      val nOut = xs.count(x => math.abs(x - med) > 3 * mad).toLong
      assert(got(lang) === ((med, mad, nOut)), s"lang $lang")
    }
  }

  test("integer OLS slope matches the double normal equation within 1e-4 cents (q162)") {
    val got = Relational.groupTrend(spark, dir)
      .select("n_name", "slope_u", "trend").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got.size === 25)
    // double-precision reference from the same monthly rollup
    val monthly = graft.tables.Tables.orders(spark, dir)
      .join(graft.tables.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(graft.tables.Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for ((nation, rows) <- monthly) {
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum.toDouble
      val sy = rows.map(_._3).sum.toDouble
      val sxy = rows.map(r => r._2 * r._3).sum.toDouble
      val sxx = rows.map(r => r._2 * r._2).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (slopeU, trend) = got(nation)
      assert(math.abs(slopeU / 10000.0 - slope) <= 1.0,
        s"$nation: integer slope ${slopeU / 10000.0} vs $slope")
      assert(trend === (if (slopeU > 0) "up" else if (slopeU < 0) "down" else "flat"))
    }
  }
}
