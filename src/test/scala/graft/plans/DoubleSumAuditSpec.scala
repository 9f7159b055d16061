package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** The cents-exact audit as a STANDING GATE (r12 verdict ask #6). The
  * round-12 sweep (`tools/AuditDoubleSums` + PERF.md classification
  * table) closed the order-dependent double-accumulation class once —
  * but a NEW query with a growing-group `sum(double)` would silently
  * reopen it. This spec re-runs the same analyzed-plan walk over every
  * SparkEntry query and FAILS on any Sum(Double/Float) site that is
  * not an explicitly documented keep-case, so the classification table
  * can never rot: adding an unclassified money-sum turns the suite
  * red until the site is either converted to cents or argued into the
  * allowlist below (with the argument). A negative control proves the
  * walker actually sees the unsafe shape. */
class DoubleSumAuditSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  /** Documented keep-cases — (query, summed expr), each with the
    * exactness argument from PERF.md's round-12 table:
    *  - `l_quantity` (q02/q11/q48/q56/q96): integer-valued ≤ 50 —
    *    exact in double to 2⁵³ (≈ 1.8e14 rows per group).
    *  - q14 `value` per session: groups are SESSION-sized (bounded by
    *    the 30-minute gap rule, not by corpus growth), summed
    *    magnitude stays far inside the 2⁵³ exact-integer window of
    *    the 2-dp-rounded output. */
  private val Allow: Set[(String, String)] = Set(
    "q02_revenue_by_flag" -> "l_quantity",
    "q11_rollup"          -> "l_quantity",
    "q48_pivot"           -> "l_quantity",
    "q56_range_window"    -> "l_quantity",
    "q96_orc_roundtrip"   -> "l_quantity",
    "q14_sessionize"      -> "value")

  /** Every Sum-over-Double/Float child in the ANALYZED plan (window
    * sums included) — the identical walk `tools/AuditDoubleSums`
    * prints for the PERF.md table. */
  private def doubleSumSites(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.flatMap { op =>
      op.expressions.flatMap(_.collect {
        case s: Sum if s.child.dataType == DoubleType ||
                       s.child.dataType == FloatType => s.child.sql
      })
    }.distinct

  test("every Sum(Double/Float) site in every query is a documented keep-case") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val sites =
        try doubleSumSites(fn(spark, dir))
        catch { case e: Throwable =>
          fail(s"$name failed to analyze: ${e.getMessage}") }
      sites.filterNot(s => Allow((name, s)))
        .foreach(s => offenders += s"$name -> sum($s)")
      spark.sharedState.cacheManager.clearCache()
    }
    assert(offenders.isEmpty,
      s"\nUNCLASSIFIED double-sum site(s) — convert to cents or add to the " +
        s"allowlist WITH the exactness argument:\n  ${offenders.mkString("\n  ")}")
  }

  test("negative control: the walker flags a deliberately unsafe money sum") {
    val bad = graft.tables.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice")).as("rev")) // the exact shape r11 had to fix
    val sites = doubleSumSites(bad)
    assert(sites.contains("l_extendedprice"),
      s"walker missed the unsafe sum; saw: $sites")
  }
}
