package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Benford first-digit audit (q180) — the classic data-forensics
  * screen (Benford 1938; Nigrini's fraud-detection practice):
  * naturally-occurring multi-scale amounts follow P(d) = log10(1+1/d)
  * in their leading digit, and fabricated or truncated data does not.
  * The audit bins `o_totalprice` by first digit per order priority
  * segment and emits each segment's observed per-mille distribution
  * beside the Benford expectation, plus the L1 deviation in per-mille
  * points — an ALL-INTEGER statistic (the irrational Benford
  * proportions enter as fixed per-mille contract constants
  * [[BenfordPm]], so no log is ever taken at query time).
  *
  * First digit of a positive double, integer-only: compare against
  * power-of-ten thresholds (prices are < 10⁶ cents here; the CASE
  * ladder is exact where float log10+floor wobbles at powers of ten).
  *
  * Scale shape: one map-side-combinable aggregate over (segment,
  * digit); the expectation join is a 9-row broadcast. */
object ForensicsOps {

  /** log10(1+1/d) in per-mille, d = 1..9 (301+176+125+97+79+67+58+51+46
    * = 1000 exactly — the rounding is chosen to telescope). */
  val BenfordPm: Seq[Long] = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  private def firstDigit(cents: org.apache.spark.sql.Column) = {
    // cents ∈ [1, 10^8): walk down the power ladder. Integer `div` on
    // the PASSED column (not a hard-coded name) via IntegralDivide —
    // exact, and the helper honors whatever column the caller supplies.
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val p = Seq(10000000L, 1000000L, 100000L, 10000L, 1000L, 100L, 10L, 1L)
    p.foldLeft(when(lit(false), lit(0L))) { (acc, pow) =>
      acc.when(cents >= pow,
        column(new IntegralDivide(expression(cents), expression(lit(pow)))))
    }
  }

  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("segment"),
      round(col("o_totalprice") * 100).cast("long").as("price_c"))
      .filter(col("price_c") > 0)
      .withColumn("digit",
        firstDigit(col("price_c")).otherwise(lit(0L)))
    val seg = o.groupBy("segment").agg(count(lit(1)).as("n_seg"))
    val obs = o.groupBy("segment", "digit").agg(count(lit(1)).as("n"))
    val bf = BenfordPm.zipWithIndex
      .map { case (pm, i) => (i + 1L, pm) }
      .toDF("digit", "benford_pm")
    obs.join(seg, "segment").join(broadcast(bf), Seq("digit"))
      .withColumn("obs_pm", expr("(1000 * n) div n_seg"))
      .withColumn("dev_pm", abs(col("obs_pm") - col("benford_pm")))
      .select(col("segment"), col("digit"), col("n"), col("obs_pm"),
        col("benford_pm"), col("dev_pm"))
  }

  private def bfValues: String = BenfordPm.zipWithIndex
    .map { case (pm, i) => s"(${i + 1}, $pm)" }.mkString(", ")

  val benfordAuditSql: String =
    s"""WITH o AS (
       |  SELECT o_orderpriority AS segment,
       |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
       |  FROM orders WHERE round(o_totalprice * 100) > 0),
       |d AS (
       |  SELECT segment,
       |         CASE WHEN price_c >= 10000000 THEN price_c // 10000000
       |              WHEN price_c >= 1000000 THEN price_c // 1000000
       |              WHEN price_c >= 100000 THEN price_c // 100000
       |              WHEN price_c >= 10000 THEN price_c // 10000
       |              WHEN price_c >= 1000 THEN price_c // 1000
       |              WHEN price_c >= 100 THEN price_c // 100
       |              WHEN price_c >= 10 THEN price_c // 10
       |              ELSE price_c END AS digit
       |  FROM o),
       |seg AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_seg FROM d GROUP BY 1),
       |obs AS (SELECT segment, digit, CAST(count(*) AS BIGINT) AS n
       |        FROM d GROUP BY 1, 2),
       |bf(digit, benford_pm) AS (SELECT * FROM (VALUES $bfValues))
       |SELECT obs.segment, CAST(obs.digit AS BIGINT) AS digit, obs.n,
       |       (1000 * obs.n) // seg.n_seg AS obs_pm,
       |       CAST(bf.benford_pm AS BIGINT) AS benford_pm,
       |       abs((1000 * obs.n) // seg.n_seg - bf.benford_pm) AS dev_pm
       |FROM obs
       |JOIN seg ON seg.segment = obs.segment
       |JOIN bf ON bf.digit = obs.digit""".stripMargin
}
