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
