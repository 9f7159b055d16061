package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** k-anonymity audit (q166) — the privacy gate beside q37's value
  * REDACTION: redaction hides direct identifiers, but a record is
  * still re-identifiable when its QUASI-identifier combination
  * (location × segment × balance band) is shared by fewer than k
  * records (Sweeney, "k-Anonymity: A Model for Protecting Privacy",
  * 2002). The audit sizes every QI equivalence class at each level of
  * a GENERALIZATION LADDER — L0 (nation, segment, balance band), L1
  * drops the band, L2 keeps segment only — and reports per level how
  * many classes violate k=[[KAnon]] and how many records sit at risk,
  * i.e. exactly the evidence needed to pick the cheapest
  * generalization that clears the bar before a dataset is released.
  *
  * Balance band = floor(acctbal / 1000): floor (not truncate-toward-
  * zero) so negative balances band identically in both engines.
  *
  * Scale shape: ONE pass — the three ladder levels come from a single
  * GROUPING SETS aggregate (grouping_id() tags the level), map-side
  * combinable, shuffling only QI-tuple keys; the per-level rollup is
  * a second tiny aggregate over class sizes. The oracle derives the
  * same ledger from three INDEPENDENT per-level aggregates — a green
  * hash certifies the grouping-sets plan against the naive form. */
object PrivacyOps {

  /** Minimum acceptable QI equivalence-class size. */
  val KAnon = 5

  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000).cast("long").as("band"))
    val sized = c.groupingSets(
        Seq(Seq(col("nation"), col("segment"), col("band")),
            Seq(col("nation"), col("segment")),
            Seq(col("segment"))),
        col("nation"), col("segment"), col("band"))
      .agg(count(lit(1)).as("gsize"), grouping_id().as("gid"))
    val leveled = sized.withColumn("level",
      when(col("gid") === 0, 0L).when(col("gid") === 1, 1L).otherwise(2L))
    leveled.groupBy("level").agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("gsize") < KAnon, 1L).otherwise(0L)).as("n_small_groups"),
      sum(when(col("gsize") < KAnon, col("gsize")).otherwise(0L)).as("n_at_risk"),
      min(col("gsize")).as("min_size"),
      max(col("gsize")).as("max_size"))
  }

  /** Oracle: three independent per-level aggregates (no grouping
    * sets) unioned — the naive formulation of the same ladder. */
  val kAnonymityAuditSql: String = {
    def level(l: Int, qi: String) =
      s"""SELECT CAST($l AS BIGINT) AS level,
         |       CAST(count(*) AS BIGINT) AS n_groups,
         |       CAST(sum(CASE WHEN gsize < $KAnon THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
         |       CAST(sum(CASE WHEN gsize < $KAnon THEN gsize ELSE 0 END) AS BIGINT) AS n_at_risk,
         |       CAST(min(gsize) AS BIGINT) AS min_size,
         |       CAST(max(gsize) AS BIGINT) AS max_size
         |FROM (SELECT $qi, count(*) AS gsize FROM q GROUP BY $qi)""".stripMargin
    s"""WITH q AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
       |  FROM customer)
       |${level(0, "nation, segment, band")}
       |UNION ALL
       |${level(1, "nation, segment")}
       |UNION ALL
       |${level(2, "segment")}""".stripMargin
  }

  /** Minimum acceptable sensitive-value diversity per QI class. */
  val LDiv = 3L

  /** q198: l-diversity audit — k-anonymity's known blind spot
    * (Machanavajjhala et al., "l-Diversity: Privacy Beyond
    * k-Anonymity", 2006): a QI class can be large enough to pass k yet
    * HOMOGENEOUS in the sensitive attribute, so membership alone leaks
    * the sensitive value. Here the QI is (nation, balance band) and the
    * sensitive attribute is the market segment; every QI class is
    * scored by its count of DISTINCT sensitive values, and the ledger
    * reports, per diversity level, how many classes sit there and how
    * many records are exposed — with the k-vs-l split made explicit:
    * `n_k_ok_l_bad` counts classes that PASS the q166 k-anonymity bar
    * yet still leak under l-diversity, exactly the population q166
    * cannot see.
    *
    * Scale shape: one (QI, sensitive) count-distinct-free aggregate —
    * distinct diversity comes from a two-level groupBy (first
    * (QI, segment) pairs, then QI), both map-side combinable, shuffling
    * only bounded QI-tuple keys; the final per-level rollup is a tiny
    * aggregate over class summaries. The oracle computes diversity with
    * an explicit COUNT(DISTINCT) per class — a green hash certifies the
    * two-level re-aggregation against the direct form. */
  def lDiversityAudit(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_nationkey").as("nation"),
      floor(col("c_acctbal") / 1000).cast("long").as("band"),
      col("c_mktsegment").as("segment"))
    val pairs = c.groupBy(col("nation"), col("band"), col("segment"))
      .agg(count(lit(1)).as("n"))
    val classes = pairs.groupBy(col("nation"), col("band"))
      .agg(count(lit(1)).as("diversity"), sum(col("n")).as("gsize"))
    classes.groupBy(col("diversity"))
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("gsize")).as("n_records"),
        sum(when(col("diversity") < LDiv, col("gsize")).otherwise(0L))
          .as("n_exposed"),
        sum(when(col("gsize") >= KAnon && col("diversity") < LDiv, 1L)
          .otherwise(0L)).as("n_k_ok_l_bad"))
  }

  /** t-closeness breach threshold in ppm (t = 0.25). */
  val TClosePpm = 250000L

  /** q199: t-closeness audit — the third rung of the release-gate
    * ladder (Li, Li & Venkatasubramanian, "t-Closeness: Privacy Beyond
    * k-Anonymity and l-Diversity", ICDE 2007). l-diversity counts
    * distinct sensitive values but is blind to their DISTRIBUTION: a
    * class can hold l distinct balance bands yet sit almost entirely in
    * one of them, leaking the value probabilistically. t-closeness
    * bounds, per QI class, the Earth Mover's Distance between the
    * class's sensitive distribution and the GLOBAL one. For an ordinal
    * sensitive attribute (balance band) over an m-value ladder the EMD
    * has the closed form  (1/(m-1)) · Σ_{i<m} |CDF_class(i) − CDF_global(i)|.
    *
    * The statistic is defined in ppm-QUANTIZED form — each CDF is
    * floored to ppm before the difference — so every step is BIGINT
    * (the one product that could overflow at 100 TB row counts,
    * cum·10⁶, widens through DECIMAL(38,0)/HUGEINT exactly as q192's
    * PMI score does) and the result is bit-identical across engines,
    * runs, and partitionings. QI = (nation, segment) — one
    * generalization step FINER than q198's, so the three audits
    * (k, l, t) grade the same release candidate from three angles.
    *
    * Scale shape: two map-side-combinable aggregates over the scan
    * (global band histogram; per-(QI, band) counts), then all remaining
    * work happens on the CLASS×BAND grid — |QI classes| · m rows,
    * thousands at most, independent of corpus row count. The dense
    * band ladder is broadcast so absent (class, band) cells still
    * contribute their CDF gap, and the per-class window runs over
    * m-row partitions in parallel across classes. The oracle builds
    * the same grid from a cross join + left join and computes both
    * CDFs with explicit window sums — a green hash certifies the
    * quantized-EMD pipeline end to end. */
  def tClosenessAudit(spark: SparkSession, dir: String): DataFrame =
    tClosenessOf(Tables.customer(spark, dir).select(
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000).cast("long").as("band")))

  /** The audit over any (nation, segment, band) projection — split out
    * so specs can plant distributions with known closed-form EMD. */
  def tClosenessOf(c: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // global ordinal CDF in ppm over the dense band ladder
    val glob = c.groupBy(col("band")).agg(count(lit(1)).as("g"))
    val globTot = glob.agg(sum(col("g")).as("n_total"),
      count(lit(1)).as("m_bands"))
    val globCdf = glob
      .withColumn("cum_g", sum(col("g")).over(
        Window.orderBy(col("band")).rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(globTot))
      .select(col("band"), col("m_bands"),
        expr("cast((cast(cum_g as decimal(38,0)) * 1000000) div n_total as bigint)")
          .as("cdf_g_ppm"))
    val classes = c.groupBy(col("nation"), col("segment"))
      .agg(count(lit(1)).as("n_class"))
    val cells = c.groupBy(col("nation"), col("segment"), col("band"))
      .agg(count(lit(1)).as("cc"))
    // dense grid: every class × every global band (absent cells = 0)
    val grid = classes.crossJoin(broadcast(globCdf))
      .join(cells, Seq("nation", "segment", "band"), "left")
      .withColumn("cc", coalesce(col("cc"), lit(0L)))
      .withColumn("cum_c", sum(col("cc")).over(
        Window.partitionBy(col("nation"), col("segment"))
          .orderBy(col("band")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cdf_c_ppm",
        expr("cast((cast(cum_c as decimal(38,0)) * 1000000) div n_class as bigint)"))
    grid.groupBy(col("nation"), col("segment"), col("n_class"))
      .agg(
        expr(s"sum(abs(cdf_c_ppm - cdf_g_ppm)) div greatest(max(m_bands) - 1, 1)")
          .as("t_ppm"))
      .withColumn("breach",
        when(col("t_ppm") > TClosePpm, 1L).otherwise(0L))
  }

  /** Oracle: the same quantized EMD from explicit window-sum CDFs on a
    * cross-join grid; the cum·10⁶ product goes through HUGEINT, the
    * exact 128-bit twin of the Spark side's DECIMAL(38,0). */
  val tClosenessAuditSql: String =
    s"""WITH q AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
       |  FROM customer),
       |gh AS (SELECT band, count(*) AS g FROM q GROUP BY 1),
       |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n_total,
       |               CAST(count(*) AS BIGINT) AS m_bands FROM gh),
       |gcdf AS (
       |  SELECT band, m_bands,
       |         CAST((CAST(sum(g) OVER (ORDER BY band
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |               AS HUGEINT) * 1000000) // n_total AS BIGINT) AS cdf_g_ppm
       |  FROM gh CROSS JOIN tot),
       |cls AS (SELECT nation, segment, CAST(count(*) AS BIGINT) AS n_class
       |        FROM q GROUP BY 1, 2),
       |cells AS (SELECT nation, segment, band, count(*) AS cc
       |          FROM q GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT cls.nation, cls.segment, cls.n_class, gcdf.band,
       |         gcdf.m_bands, gcdf.cdf_g_ppm,
       |         coalesce(cells.cc, 0) AS cc
       |  FROM cls CROSS JOIN gcdf
       |  LEFT JOIN cells ON cells.nation = cls.nation
       |              AND cells.segment = cls.segment
       |              AND cells.band = gcdf.band),
       |cdf AS (
       |  SELECT nation, segment, n_class, m_bands, cdf_g_ppm,
       |         CAST((CAST(sum(cc) OVER (PARTITION BY nation, segment
       |                 ORDER BY band
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |               AS HUGEINT) * 1000000) // n_class AS BIGINT) AS cdf_c_ppm
       |  FROM grid)
       |SELECT nation, segment, n_class,
       |       CAST(sum(abs(cdf_c_ppm - cdf_g_ppm))
       |            // greatest(max(m_bands) - 1, 1) AS BIGINT) AS t_ppm,
       |       CAST(CASE WHEN sum(abs(cdf_c_ppm - cdf_g_ppm))
       |                      // greatest(max(m_bands) - 1, 1) > $TClosePpm
       |                 THEN 1 ELSE 0 END AS BIGINT) AS breach
       |FROM cdf GROUP BY 1, 2, 3""".stripMargin

  /** Oracle: per-class COUNT(DISTINCT segment) — the direct form of
    * the diversity the Spark side derives by two-level aggregation. */
  val lDiversityAuditSql: String =
    s"""WITH q AS (
       |  SELECT c_nationkey AS nation,
       |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
       |         c_mktsegment AS segment
       |  FROM customer),
       |cl AS (SELECT nation, band,
       |              CAST(count(DISTINCT segment) AS BIGINT) AS diversity,
       |              count(*) AS gsize
       |       FROM q GROUP BY 1, 2)
       |SELECT diversity,
       |       CAST(count(*) AS BIGINT) AS n_classes,
       |       CAST(sum(gsize) AS BIGINT) AS n_records,
       |       CAST(sum(CASE WHEN diversity < $LDiv THEN gsize ELSE 0 END)
       |            AS BIGINT) AS n_exposed,
       |       CAST(sum(CASE WHEN gsize >= $KAnon AND diversity < $LDiv
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_k_ok_l_bad
       |FROM cl GROUP BY 1""".stripMargin
}
