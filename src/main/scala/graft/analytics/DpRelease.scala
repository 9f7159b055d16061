package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs.{polyHashCol, polyHashSql, P}

/** q202: differentially-private histogram release — the fourth rung of
  * the privacy ladder (q166 k-anonymity, q198 l-diversity, q199
  * t-closeness audit the data; DP PERTURBS the release itself). Counts
  * per (nation, segment) are published with two-sided geometric noise
  * (Ghosh, Roughgarden & Sundararajan, "Universally Utility-Maximizing
  * Privacy Mechanisms", STOC 2009 — the discrete Laplace), α = 1/2,
  * i.e. ε = ln 2 per cell; cells are disjoint so parallel composition
  * keeps the whole histogram at ε = ln 2.
  *
  * The mechanism is EXACT INTEGER end to end — the repo's
  * reproducibility discipline applied to noise: P(noise = k) ∝ 2^−|k|
  * truncated at ±[[GeomB]] makes every probability a dyadic rational
  * with common denominator D = 3·2^B − 2, the inverse CDF becomes a
  * statically generated 61-branch integer CASE ladder (closed-form
  * cumulative bounds, no logs, no floats), and the uniform draw is a
  * seeded hash of the cell key (two polynomial hashes combined to
  * cover [0, P²) before the mod — residual modulo bias < 2⁻³⁰·D/P²,
  * i.e. ~10⁻⁹). Deterministic-by-key noise means the release is
  * idempotent: re-running never spends privacy budget twice on the
  * same cell, the analogue of seeded sampling in q38/q89.
  * Engineering caveats, both standard: truncation at ±B leaks
  * P(|k|>B) ≈ 2·2^−B ≈ 10⁻⁹ of tail mass, and a keyed hash is a PRF
  * stand-in for true randomness — swap the salt per release epoch.
  *
  * Scale shape: one map-side-combinable count aggregate over the
  * scan; noise is a narrow codegen'd expression on the vocab-sized
  * cell table — zero extra shuffles, no driver work. The oracle runs
  * the IDENTICAL generated CASE ladder (numeric literals shared by
  * construction), so a green hash certifies ladder, hash mix, and
  * clamp across engines. */
object DpRelease {

  /** Truncation bound of the two-sided geometric (±B). */
  val GeomB = 30
  /** Common dyadic denominator: 3·2^B − 2 (total ladder mass). */
  val GeomD: Long = 3L * (1L << GeomB) - 2

  /** Closed-form cumulative numerator: u < cum(k) ⟺ noise ≤ k.
    * cum(−j) = 2^(B−j+1) − 1;  cum(k≥0) = 3·2^B − 2^(B−k) − 1. */
  def cum(k: Int): Long =
    if (k < 0) (1L << (GeomB + k + 1)) - 1
    else 3L * (1L << GeomB) - (1L << (GeomB - k)) - 1

  /** The inverse-CDF CASE ladder over a BIGINT column named by `u` —
    * one shared SQL string evaluated by BOTH engines. */
  def ladderSql(u: String): String = {
    val branches = (-GeomB to GeomB - 1)
      .map(k => s"WHEN $u < ${cum(k)} THEN $k").mkString(" ")
    s"CAST(CASE $branches ELSE $GeomB END AS BIGINT)"
  }

  /** Seeded uniform draw over [0, GeomD) from a cell-key column. */
  def drawCol(key: Column): Column = {
    val h1 = polyHashCol(concat(key, lit(":q202a")))
    val h2 = polyHashCol(concat(key, lit(":q202b")))
    (h1 * P + h2) % GeomD
  }

  def drawSql(key: String): String =
    s"(${polyHashSql(s"concat($key, ':q202a')")} * $P + " +
      s"${polyHashSql(s"concat($key, ':q202b')")}) % $GeomD"

  def dpHistogram(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))
    g.withColumn("u",
        drawCol(concat_ws(":", col("nation").cast("string"), col("segment"))))
      .withColumn("noise", expr(ladderSql("u")))
      .select(col("nation"), col("segment"),
        greatest(col("n") + col("noise"), lit(0L)).as("noisy_count"))
  }

  val dpHistogramSql: String =
    s"""WITH g AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1, 2),
       |h AS (
       |  SELECT nation, segment, n,
       |         ${drawSql("concat(CAST(nation AS VARCHAR), ':', segment)")} AS u
       |  FROM g)
       |SELECT nation, segment,
       |       greatest(n + ${ladderSql("u")}, 0) AS noisy_count
       |FROM h""".stripMargin
}
