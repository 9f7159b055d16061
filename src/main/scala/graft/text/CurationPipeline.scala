package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.DedupOps
import graft.functions.TextExprs._

/** q254: the end-to-end CURATION PIPELINE composition — the DAG a
  * training-data run actually executes, chaining the verified stage
  * operators over the documents corpus (r12 verdict ask #7; reference
  * framing: BASELINE.json north-star "designed for 100 TB" pipeline):
  *
  *   1. DEDUP FUNNEL (q109 attribution): keep only documents the
  *      funnel attributes to no drop stage (exact first-wins →
  *      near-dup cluster election → substring majority).
  *   2. CONFORMAL QUALITY GATE (q225 at α = [[AlphaPct]]%): the
  *      admission threshold is calibrated on the held-out 'val' split
  *      (order statistic of the q146 learned score), then applied to
  *      every surviving document — the production admission rule with
  *      its distribution-free coverage knob.
  *   3. WATERFILL MIXTURE (q182): the max-min fair token budget over
  *      the ADMITTED per-source availability; realized by the
  *      deterministic prefix-take (docs in id order per source until
  *      the allocation is exhausted — the budget is never exceeded).
  *   4. CLUSTER-ATOMIC SPLIT (q168): train/val/test by the near-dup
  *      REP's hash bucket, so a surviving near-dup family can never
  *      straddle a split boundary.
  *   5. MANIFEST (q140/q216 shape): per (split, lang) — document
  *      count, token mass, and an order-free content digest
  *      (Σ fingerprint; polyhash values are < 2³⁰·…, the sum stays
  *      exact in int64 to ~9·10⁹ documents).
  *
  * The oracle nests the STAGE ORACLES (cluster map via the recursive
  * reachability CTE, the substring ledger, the trained classifier, the
  * waterfill chain) so the composition can never diverge from the
  * stages the gate verifies individually — the q109 convention,
  * extended through the whole pipeline.
  *
  * Scale shape: every stage keeps its own audited scale plan (banded
  * pair joins, star-CC rounds, one corpus-sized aggregate for the
  * plan, windowed prefix sums per source); the composition adds only
  * doc_id-keyed joins between them, so it scales like its slowest
  * stage — which the 10× protocol records. */
object CurationPipeline {

  /** Miscoverage of the admission gate (must be one of
    * [[QualityClassifier.ConformalAlphas]]). */
  val AlphaPct = 10L

  def curationManifest(spark: SparkSession, dir: String): DataFrame = {
    val ckpt = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    // r15: the dedup funnel (LSH + star-CC rounds) and the conformal
    // scorer (16 sequential gradient jobs) both run their internal
    // actions at CONSTRUCTION; they are independent until the `adm`
    // join below, so construct them concurrently (guide §2.6 — q254
    // was 89 fully-serialized small jobs, 10.2 s of stage wall for
    // 38 s of CPU on 32 cores).
    val parts = graft.plans.Par.all(Seq[() => DataFrame](
      () => DedupOps.funnelStaged(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens"), col("fp"), col("rep"), col("stage")),
      () => QualityClassifier.conformalScoredSplit(spark, dir)))
    val staged = parts(0)
    val j = parts(1)
    val thr = QualityClassifier.conformalThr(j)
      .filter(col("alpha_pct") === AlphaPct).select(col("thr_s_u"))
    // referenced by the availability aggregate AND the prefix-take
    val adm = staged.filter(col("stage") === "keep")
      .join(j.select(col("doc_id"), col("s_u")), "doc_id")
      .crossJoin(broadcast(thr))
      .filter(col("s_u") <= col("thr_s_u"))
      .localCheckpoint(true, ckpt)
    val avail = adm.groupBy(col("source"))
      .agg(sum(col("n_tokens")).cast("long").as("avail"))
    val plan = MixturePlan.waterfillOn(avail)
      .select(col("source"), col("alloc"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sel = adm.join(broadcast(plan), "source")
      .withColumn("cum", sum(col("n_tokens")).over(wCum))
      .filter(col("cum") <= col("alloc"))
    sel
      .withColumn("bucket",
        polyHashCol(concat(lit("rep:"), col("rep").cast("string"))) % 100)
      .withColumn("split",
        when(col("bucket") < TextOps.TrainPct, "train")
          .when(col("bucket") < TextOps.ValPct, "val")
          .otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        sum(col("fp")).cast("long").as("digest_u"))
  }

  lazy val curationManifestSql: String = {
    val planSub = MixturePlan.waterfillSqlFrom(
      "SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail FROM cadm GROUP BY 1")
    s"""WITH cdocs AS MATERIALIZED (
       |  SELECT doc_id, lang, source,
       |         CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens,
       |         ${polyHashSql(s"array_to_string(${tokensSql("text")}, ' ')")} AS fp
       |  FROM documents),
       |cexact AS (SELECT fp, min(doc_id) AS keep_id FROM cdocs GROUP BY 1),
       |ccl AS MATERIALIZED (${DedupOps.dedupClustersSql}),
       |csub AS MATERIALIZED (${DedupOps.substringDedupSql}),
       |cstaged AS MATERIALIZED (
       |  SELECT d.doc_id, d.lang, d.source, d.n_tokens, d.fp,
       |         coalesce(c.rep_id, d.doc_id) AS rep,
       |         CASE WHEN d.doc_id != e.keep_id THEN 'exact'
       |              WHEN c.rep_id IS NOT NULL AND c.rep_id != d.doc_id THEN 'near'
       |              WHEN s.n_removable IS NOT NULL
       |                   AND (s.n_removable * 10000) // s.n_grams >= ${DedupOps.SubstrDropBp}
       |                THEN 'substring'
       |              ELSE 'keep' END AS stage
       |  FROM cdocs d
       |  JOIN cexact e ON d.fp IS NOT DISTINCT FROM e.fp
       |  LEFT JOIN ccl c ON c.doc_id = d.doc_id
       |  LEFT JOIN csub s ON s.doc_id = d.doc_id),
       |csc AS MATERIALIZED (${QualityClassifier.classifySql}),
       |csp AS (${TextOps.hashSplitSql}),
       |cj AS MATERIALIZED (
       |  SELECT b.doc_id, -b.logit_u AS s_u, sp.split
       |  FROM csc b JOIN csp sp ON b.doc_id = sp.doc_id),
       |ccal AS (SELECT s_u, CAST(row_number() OVER (ORDER BY s_u, doc_id)
       |                          AS BIGINT) AS rn
       |         FROM cj WHERE split = 'val'),
       |cn AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM ccal),
       |cthr AS (SELECT c.s_u AS thr_s_u
       |         FROM ccal c, cn
       |         WHERE c.rn = least(((n_cal + 1) * (100 - $AlphaPct) + 99) // 100,
       |                            n_cal)),
       |cadm AS MATERIALIZED (
       |  SELECT st.doc_id, st.lang, st.source, st.n_tokens, st.fp, st.rep
       |  FROM cstaged st JOIN cj ON cj.doc_id = st.doc_id, cthr
       |  WHERE st.stage = 'keep' AND cj.s_u <= cthr.thr_s_u),
       |cplan AS MATERIALIZED (
       |  SELECT source, alloc FROM ($planSub)),
       |csel AS (
       |  SELECT * FROM (
       |    SELECT a.*, p.alloc,
       |           sum(a.n_tokens) OVER (PARTITION BY a.source ORDER BY a.doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM cadm a JOIN cplan p ON p.source = a.source)
       |  WHERE cum <= alloc),
       |cbuck AS (
       |  SELECT lang, n_tokens, fp,
       |         CASE WHEN bkt < ${TextOps.TrainPct} THEN 'train'
       |              WHEN bkt < ${TextOps.ValPct} THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM (SELECT *, ${polyHashSql("'rep:' || CAST(rep AS VARCHAR)")} % 100 AS bkt
       |        FROM csel))
       |SELECT split, lang,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |       CAST(sum(fp) AS BIGINT) AS digest_u
       |FROM cbuck GROUP BY 1, 2""".stripMargin
  }
}
