package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Cross-source quality-score calibration (q176) — the mixing
  * prerequisite q138's routing quietly assumes: raw quality scores
  * are NOT comparable across sources (a boilerplate-heavy crawl
  * scores systematically below a curated source on the same rubric),
  * so selecting a "global top quartile" by raw score silently
  * over-samples whichever sources run hot. The standard fix is RANK
  * calibration — map each document to its within-source rank
  * percentile, `cal = (rank−1)·10⁶ div (n−1)` (all-integer, ties
  * broken by doc_id so both engines rank identically) — after which
  * every source's score distribution is uniform by construction. The
  * emitted ledger shows the repair directly: per source, its share
  * of the global top quartile under the RAW score beside the share
  * under the CALIBRATED score (raw shares are skewed on this corpus;
  * calibrated shares are provably near-uniform — the spec pins both).
  *
  * Scale shape: within-source ranking is one shuffle+sort on
  * `source` (bounded partitions: sources ≫ docs-per-source at corpus
  * scale; a skewed mega-source would use the q155 histogram-quantile
  * path instead of a full sort); the global quartile cut is a scalar
  * count aggregate broadcast back; ledger aggregates are map-side
  * combinable. */
object CalibrateOps {

  def rankCalibrate(spark: SparkSession, dir: String): DataFrame = {
    val q = TextOps.qualityScore(spark, dir).select(col("doc_id"), col("quality_bp"))
    val src = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"))
    val scored = src.join(q, "doc_id")
    val bySrc = Window.partitionBy("source")
      .orderBy(col("quality_bp"), col("doc_id"))
    val cal = scored
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("rank_src", row_number().over(bySrc))
      .withColumn("cal_u",
        expr("((rank_src - 1) * 1000000) div (n_src - 1)"))
    val tq = cal.agg(expr("count(1) div 4").as("topq"))
    // global windows: the q76/q114 designed-sort trade — fine for a
    // ledger; the per-shard form applies at 100 TB
    val rawRank = Window.orderBy(col("quality_bp").desc, col("doc_id"))
    val calRank = Window.orderBy(col("cal_u").desc, col("doc_id"))
    cal
      .withColumn("r_raw", row_number().over(rawRank))
      .withColumn("r_cal", row_number().over(calRank))
      .crossJoin(broadcast(tq))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("r_raw") <= col("topq"), 1L).otherwise(0L)).as("n_topq_raw"),
        sum(when(col("r_cal") <= col("topq"), 1L).otherwise(0L)).as("n_topq_cal"))
  }

  /** Oracle: same two-level ranking relationally; the global quartile
    * size is count(*)/4 by integer division. */
  val rankCalibrateSql: String =
    s"""WITH q AS (${TextOps.qualityScoreSql}),
       |s AS (
       |  SELECT d.source, q.doc_id, q.quality_bp
       |  FROM documents d JOIN q ON q.doc_id = d.doc_id),
       |c AS (
       |  SELECT source, doc_id, quality_bp,
       |         ((row_number() OVER (PARTITION BY source
       |                              ORDER BY quality_bp, doc_id) - 1) * 1000000)
       |           // (count(*) OVER (PARTITION BY source) - 1) AS cal_u
       |  FROM s),
       |r AS (
       |  SELECT source,
       |         row_number() OVER (ORDER BY quality_bp DESC, doc_id) AS r_raw,
       |         row_number() OVER (ORDER BY cal_u DESC, doc_id) AS r_cal
       |  FROM c),
       |t AS (SELECT count(*) // 4 AS topq FROM r)
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN r_raw <= t.topq THEN 1 ELSE 0 END) AS BIGINT) AS n_topq_raw,
       |       CAST(sum(CASE WHEN r_cal <= t.topq THEN 1 ELSE 0 END) AS BIGINT) AS n_topq_cal
       |FROM r CROSS JOIN t
       |GROUP BY 1""".stripMargin
}
