package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
import graft.functions.NativeExprs

/** Maximal duplicated-span report (q250) — the production form of
  * exact substring dedup (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better": remove every substring of ≥50
  * tokens that appears more than once in the corpus; reference scope:
  * GCP-Serverless-ETL-Pipeline-Lab has no dedup stage at all —
  * dataflow_transform.py:84-96 dedups exact record ids only — so this
  * extends the surveyed dedup family toward the 100 TB training-data
  * north star). q107 reports COVERAGE at a fixed fine grain (W=8
  * posting lists); this query reports the SPANS themselves at the
  * shipped threshold: every maximal region of a document covered by
  * [[MinSpanTokens]]-token windows that occur ≥2 times anywhere in
  * the corpus (other documents or elsewhere in the same one) — the
  * rows a span-removal pass would actually cut.
  *
  * Formulation: suffix arrays find maximal repeats by sorting all
  * suffixes; the distributed equivalent used here fingerprints every
  * [[MinSpanTokens]]-token window (one narrow pass, native rolling
  * expression), elects duplicated fingerprints with ONE hash-keyed
  * aggregate, and merges consecutive duplicated positions per doc with
  * the island trick (pos − row_number), which reconstructs exactly
  * the maximal repeated spans: a repeated region of L ≥ W tokens is
  * covered by L−W+1 consecutive duplicated windows, and its flanks are
  * not. The fingerprint is the same modular polynomial the rest of the
  * dedup family uses — both engines compute it exactly, so the oracle
  * re-derives every span bit-for-bit.
  *
  * Scale shape: the shuffle carries (gram-hash, doc_id, pos) postings —
  * 24 bytes per token position, never text, never doc pairs (a span
  * repeated in 10⁶ documents costs one aggregate row and 10⁶ posting
  * rows, not 10¹² pairs); duplicate election is map-side-combined on
  * the 64-bit hash; the dup-mark join is a LEFT SEMI on the same key
  * (AQE skew-join territory if one boilerplate span dominates); span
  * assembly is one doc-keyed window — per-doc state, no global sort.
  * This is the posting-list shape of suffix-array dedup: corpus-linear
  * intermediates, all keyed moves on fixed-width columns. */
object SpanDedup {

  /** Minimum duplicated span length in tokens — the Lee et al. ship
    * threshold. Windows shorter than this never form a span. */
  val MinSpanTokens = 50

  /** The span report on an explicit (doc_id, text) corpus — exposed
    * for the planted-span fixture spec. */
  def dupSpansOf(docs: DataFrame): DataFrame = {
    val W = MinSpanTokens
    // (doc, 1-based window start, window fingerprint) — one narrow pass
    val g = docs
      .select(col("doc_id"),
        posexplode(NativeExprs.gramHashes(tokensCol(col("text")), W, P)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("g"))
    // duplicated anywhere in the corpus (same doc included): ≥2 positions
    val dup = g.groupBy(col("g")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select(col("g"))
    // merge consecutive duplicated window starts into maximal spans
    val isl = g.join(dup, Seq("g"), "left_semi")
      .withColumn("isl",
        col("pos") - row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
    isl.groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(W.toLong - 1)).as("span_end"),
        (max(col("pos")) - min(col("pos")) + lit(W.toLong)).as("span_tokens"),
        count(lit(1)).as("n_windows"))
      .drop("isl")
  }

  /** q250: maximal duplicated spans over the documents table. */
  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpansOf(Tables.spread(Tables.documents(spark, dir)))

  /** Oracle: DuckDB re-derives every window fingerprint positionally
    * (lateral unnest carries the window start the Spark side gets from
    * posexplode) and re-runs the same election + island merge. */
  val dupSpansSql: String = {
    val W = MinSpanTokens
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
       |g AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |         ${polyHashSql(s"array_to_string(t[i:i+${W - 1}], ' ')")} AS g
       |  FROM toks, unnest(range(1, len(t) - $W + 2)) AS r(i)
       |  WHERE len(t) >= $W),
       |occ AS (SELECT g AS og FROM g GROUP BY 1 HAVING count(*) >= 2),
       |d AS (
       |  SELECT doc_id, pos,
       |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       |  FROM g JOIN occ ON g = og)
       |SELECT doc_id,
       |       CAST(min(pos) AS BIGINT) AS span_start,
       |       CAST(max(pos) + $W - 1 AS BIGINT) AS span_end,
       |       CAST(max(pos) - min(pos) + $W AS BIGINT) AS span_tokens,
       |       CAST(count(*) AS BIGINT) AS n_windows
       |FROM d GROUP BY doc_id, isl""".stripMargin
  }
}
