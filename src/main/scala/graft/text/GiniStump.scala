package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** q235: depth-1 decision-tree training (a CART stump, Breiman et al.
  * 1984) with the EXACT integer Gini split — the simplest trained
  * model with a split-selection step, the building block bagging and
  * boosting stack. Per source, the stump predicts q204's outcome
  * ("document is not internally repetitive") from the q17 quality
  * score: every candidate threshold on the binned score is priced by
  * the weighted Gini impurity of the induced split, and the argmin
  * threshold plus its confusion ledger is emitted.
  *
  * Exactness: for a side with n rows and s positives the Gini mass is
  * 2·s·(n−s)/n, so the weighted split impurity is A/n_l + B/n_r with
  * A = 2·s_l·(n_l−s_l), B likewise — a rational whose numerator and
  * denominator we carry exactly. The selection statistic is the
  * scaled floor ⌊(A·n_r + B·n_l)·10¹²/(n_l·n_r)⌋ (ties → the smaller
  * threshold): a defined, deterministic rule evaluated identically in
  * both engines, with every product widened through
  * DECIMAL(38,0)/HUGEINT (N³·10¹² stays inside DECIMAL(38) to
  * N ≈ 3·10⁸ rows per source; past that, raise the scale the q204
  * way).
  *
  * Scale shape: the corpus collapses to ≤ 101 (source, bin) cells in
  * ONE map-side-combinable aggregate (q204's argument); candidate
  * evaluation, argmin, and the ledger all run on that bounded cell
  * table — prefix sums per source partition, nothing corpus-sized
  * ever re-shuffles. */
object GiniStump {

  /** Selection-statistic scale (see exactness note above). */
  val GiniScale = "1000000000000" // 10^12

  def giniStump(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = TextOps.qualityScore(spark, dir).select(col("doc_id"), col("quality_bp"))
    val r = TextOps.repetitionScore(spark, dir)
      .select(col("doc_id"),
        when(col("rep_bp") <= IsotonicOps.RepGoodBp, 1L).otherwise(0L).as("y"))
    val src = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"))
    val cells = src.join(q, "doc_id").join(r, "doc_id")
      .groupBy(col("source"), expr(s"quality_bp div ${IsotonicOps.BinW}").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    stumpOfCells(cells)
  }

  /** Split selection + ledger on explicit (source, bin, n, s) cells —
    * exposed for hand-computed fixture specs. */
  def stumpOfCells(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = Window.partitionBy("source").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = cells.groupBy("source")
      .agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"))
    val pre = cells
      .withColumn("pn", sum(col("n")).over(ws))
      .withColumn("ps", sum(col("s")).over(ws))
      .join(broadcast(tot), "source")
      .filter(col("pn") < col("nn")) // right side must be non-empty
      .withColumn("n_l", col("pn")).withColumn("s_l", col("ps"))
      .withColumn("n_r", col("nn") - col("pn"))
      .withColumn("s_r", col("ss") - col("ps"))
      .withColumn("ga", expr("2 * cast(s_l as decimal(38,0)) * (n_l - s_l)"))
      .withColumn("gb", expr("2 * cast(s_r as decimal(38,0)) * (n_r - s_r)"))
      .withColumn("gini_scaled", expr(
        s"""cast((ga * n_r + gb * n_l) * $GiniScale
           |  div (cast(n_l as decimal(38,0)) * n_r) as bigint)""".stripMargin))
    val pick = Window.partitionBy("source")
      .orderBy(col("gini_scaled").asc, col("bin").asc)
    pre.withColumn("rk", row_number().over(pick)).filter(col("rk") === 1)
      .select(col("source"), col("bin").as("threshold_bin"),
        col("n_l"), col("s_l"), col("n_r"), col("s_r"), col("gini_scaled"),
        // unsplit (root) impurity on the same scale: 2*ss*(nn-ss)*SCALE/nn
        expr(s"""cast(2 * cast(ss as decimal(38,0)) * (nn - ss) * $GiniScale
                |  div cast(nn as decimal(38,0)) as bigint)""".stripMargin)
          .as("gini_root_scaled"),
        // majority-vote training accuracy of the fitted stump
        expr("""(greatest(s_l, n_l - s_l) + greatest(s_r, n_r - s_r))
               |  * 1000000 div nn""".stripMargin).as("acc_ppm"))
  }

  val giniStumpSql: String =
    s"""WITH q AS (${TextOps.qualityScoreSql}),
       |rep AS (${TextOps.repetitionScoreSql}),
       |j0 AS (
       |  SELECT d.source, q.quality_bp // ${IsotonicOps.BinW} AS bin,
       |         CASE WHEN rep.rep_bp <= ${IsotonicOps.RepGoodBp} THEN 1 ELSE 0 END AS y
       |  FROM documents d
       |  JOIN q ON q.doc_id = d.doc_id
       |  JOIN rep ON rep.doc_id = d.doc_id),
       |cells AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS n,
       |                 CAST(sum(y) AS BIGINT) AS s
       |          FROM j0 GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nn,
       |               CAST(sum(s) AS BIGINT) AS ss FROM cells GROUP BY 1),
       |pre AS (
       |  SELECT c.source, c.bin, t.nn, t.ss,
       |         CAST(sum(c.n) OVER w AS BIGINT) AS n_l,
       |         CAST(sum(c.s) OVER w AS BIGINT) AS s_l
       |  FROM cells c JOIN tot t ON c.source = t.source
       |  WINDOW w AS (PARTITION BY c.source ORDER BY c.bin
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |cand AS (
       |  SELECT source, bin, nn, ss, n_l, s_l, nn - n_l AS n_r, ss - s_l AS s_r,
       |         CAST((2 * CAST(s_l AS HUGEINT) * (n_l - s_l) * (nn - n_l)
       |               + 2 * CAST(ss - s_l AS HUGEINT) * ((nn - n_l) - (ss - s_l)) * n_l)
       |              * $GiniScale
       |              // (CAST(n_l AS HUGEINT) * (nn - n_l)) AS BIGINT) AS gini_scaled
       |  FROM pre WHERE n_l < nn),
       |best AS (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |            ORDER BY gini_scaled ASC, bin ASC) AS rk
       |  FROM cand)
       |SELECT source, bin AS threshold_bin, n_l, s_l, n_r, s_r, gini_scaled,
       |       CAST(2 * CAST(ss AS HUGEINT) * (nn - ss) * $GiniScale
       |            // CAST(nn AS HUGEINT) AS BIGINT) AS gini_root_scaled,
       |       CAST((greatest(s_l, n_l - s_l) + greatest(s_r, n_r - s_r))
       |            * 1000000 // nn AS BIGINT) AS acc_ppm
       |FROM best WHERE rk = 1""".stripMargin
}
