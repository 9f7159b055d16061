package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q223 Theil-Sen: the distributed median-of-pairwise-slopes must
  * equal an in-memory quadratic replay over the same monthly cells,
  * and the estimator must actually be robust — a single corrupted
  * month moves OLS but not the Theil-Sen slope. */
class TheilSenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  /** Lower median (percentile_disc(0.5) semantics, the q33 contract):
    * smallest value whose cume_dist reaches 0.5. */
  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s((s.length + 1) / 2 - 1)
  }

  private def pairSlopes(cells: Seq[(Long, Long)]): Seq[Long] =
    for {
      Seq((m1, y1), (m2, y2)) <- cells.sortBy(_._1).combinations(2).toSeq
    } yield ((y2 - y1) * 10000L) / (m2 - m1) // Long / truncates like div

  test("q223: distributed slope == quadratic in-memory replay per nation") {
    val monthly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap

    val got = Relational.theilSenTrend(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    assert(got.keySet === monthly.keySet)
    got.foreach { case (nation, (nPairs, slopeTs, agree)) =>
      val cells = monthly(nation)
      val slopes = pairSlopes(cells)
      assert(nPairs === slopes.length.toLong, s"$nation pair count")
      assert(slopeTs === lowerMedian(slopes), s"$nation TS slope")
      assert(agree === 0L || agree === 1L)
    }
  }

  test("q223: Theil-Sen ignores one corrupted month where OLS moves") {
    // clean rising series y = 100 + 50·m over 13 months, then one
    // outlier month spiked 1000x. The pairwise-median slope stays at
    // the clean 50·10⁴ while the OLS slope is dragged far off it.
    val clean = (0L to 12L).map(m => (m, 100L + 50L * m))
    val spiked = clean.updated(12, (12L, (100L + 50L * 12L) * 1000L))
    assert(lowerMedian(pairSlopes(clean)) === 500000L)
    assert(lowerMedian(pairSlopes(spiked)) === 500000L,
      "one corrupted cell moved the Theil-Sen slope")
    // OLS on the spiked series for contrast (exact integer sums)
    val n = spiked.length.toLong
    val sx = spiked.map(_._1).sum; val sy = spiked.map(_._2).sum
    val sxy = spiked.map { case (m, y) => m * y }.sum
    val sxx = spiked.map { case (m, _) => m * m }.sum
    val ols = (10000L * (n * sxy - sx * sy)) / (n * sxx - sx * sx)
    assert(math.abs(ols - 500000L) > 1000000L,
      "fixture too weak: OLS barely moved")
  }
}
