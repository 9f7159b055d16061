package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables
import graft.functions.TextExprs._

/** Stratified k-fold assignment (q179) — the cross-validation
  * counterpart of q97/q168: a plain `hash mod k` fold assignment
  * leaves per-stratum fold sizes binomially noisy (a small language's
  * folds can differ by 30%+), which skews every per-fold metric on
  * exactly the strata that matter most. Stratified assignment ranks
  * documents WITHIN each language by a deterministic hash (hash
  * order = reproducible shuffle; doc_id tie-break) and deals them
  * round-robin — per-(lang, fold) sizes then differ by AT MOST ONE
  * by construction. The ledger emits per-(lang, fold) counts plus
  * each language's fold-size spread so the balance guarantee is
  * visible in the result (and the spec pins spread ≤ 1 against the
  * plain-hash assignment, which provably violates it here).
  *
  * Scale shape: one shuffle on `lang` + per-stratum sort (bounded
  * strata; a mega-stratum would use the q155 histogram route); the
  * ledger aggregates map-side. */
object FoldOps {

  val KFolds = 5

  def stratifiedFolds(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        polyHashCol(concat_ws(":", lit("fold"), col("doc_id").cast("string")))
          .as("h"))
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    val assigned = d
      .withColumn("fold", (row_number().over(w) - 1) % KFolds)
    val sizes = assigned.groupBy("lang", "fold")
      .agg(count(lit(1)).as("n_docs"))
    val spread = sizes.groupBy("lang")
      .agg((max(col("n_docs")) - min(col("n_docs"))).as("lang_spread"))
    sizes.join(spread, "lang")
      .select(col("lang"), col("fold").cast("long").as("fold"),
        col("n_docs"), col("lang_spread"))
  }

  val stratifiedFoldsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |         ${polyHashSql("concat('fold', ':', CAST(doc_id AS VARCHAR))")} AS h
       |  FROM documents),
       |a AS (
       |  SELECT lang,
       |         (row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) - 1)
       |           % $KFolds AS fold
       |  FROM d),
       |s AS (SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_docs
       |      FROM a GROUP BY 1, 2),
       |sp AS (SELECT lang, CAST(max(n_docs) - min(n_docs) AS BIGINT) AS lang_spread
       |       FROM s GROUP BY 1)
       |SELECT s.lang, CAST(s.fold AS BIGINT) AS fold, s.n_docs, sp.lang_spread
       |FROM s JOIN sp ON sp.lang = s.lang""".stripMargin
}
