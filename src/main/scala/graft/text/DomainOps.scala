package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.plans.GroupedTopK

/** Per-domain document caps (q164) — the crawl-curation step between
  * URL dedup (q152) and content dedup: a handful of mega-domains
  * dominate any web corpus, and uncapped they dominate the training
  * mixture too, so pipelines keep at most N documents per registered
  * domain, preferring the highest-value copies (C4 and RefinedWeb both
  * apply per-domain limits ahead of mixing). Selection = top-[[DomCap]]
  * per domain by length (tie → smallest doc_id, fully deterministic);
  * the emitted LEDGER reports per-domain kept/dropped doc and char
  * mass — the "no silent caps" convention: what the cap removed is
  * sized, not vanished.
  *
  * Corpus convention (generator family): documents carry no host, so
  * the crawl domain is synthesized deterministically WITH REALISTIC
  * SKEW — 40% of documents land on one mega-domain (`d0`), the rest
  * spread across 60 — so the cap genuinely bites at gate SF and the
  * plan is exercised under the skew it exists for.
  *
  * Scale shape: kept-selection runs through [[GroupedTopK]] — the
  * custom physical operator whose state is O(1) per group (shuffle on
  * domain + spillable external sort + single forward pass), not the
  * window machinery's full-partition frame buffering; the ledger side
  * is one map-side-combinable aggregate. Both stages shuffle on
  * `domain` only. A pathological single-domain corpus degrades to one
  * sorted partition — the documented mitigation is the two-phase
  * threshold select (per-domain count + N-th-length cutoff by
  * aggregation), which trades exact ties for no sort. */
object DomainOps {

  /** Max documents kept per domain. */
  val DomCap = 20

  private def withDomain(docs: DataFrame): DataFrame =
    docs.withColumn("domain",
      concat(lit("d"),
        when(col("doc_id") % 100 < 40, lit(0L))
          .otherwise(col("doc_id") % 100).cast("string"),
        lit(".example.com")))

  /** The kept corpus itself (ranked) — the product a downstream
    * pipeline consumes; exposed for the spec's window-form parity pin. */
  private[graft] def keptDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = withDomain(Tables.spread(Tables.documents(spark, dir)))
      .select(col("doc_id"), col("domain"), col("n_chars"))
    GroupedTopK(d, Seq("domain"),
      Seq(("n_chars", false), ("doc_id", true)), DomCap)
  }

  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val d = withDomain(Tables.spread(Tables.documents(spark, dir)))
      .select(col("doc_id"), col("domain"), col("n_chars"))
    val kept = GroupedTopK(d, Seq("domain"),
        Seq(("n_chars", false), ("doc_id", true)), DomCap)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    val all = d.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    all.join(kept, Seq("domain"))
      .select(col("domain"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        col("total_chars"), col("kept_chars"),
        (col("total_chars") - col("kept_chars")).as("dropped_chars"))
  }

  /** Oracle: same domain synthesis; kept-selection as the relational
    * row_number() window — proving the custom operator's selection
    * equals the declarative form. */
  val domainCapSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         'd' || (CASE WHEN doc_id % 100 < 40 THEN 0
       |                      ELSE doc_id % 100 END) || '.example.com' AS domain,
       |         n_chars
       |  FROM documents),
       |r AS (
       |  SELECT domain, n_chars,
       |         row_number() OVER (PARTITION BY domain
       |                            ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM d)
       |SELECT domain,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN rn <= $DomCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(count(*) - sum(CASE WHEN rn <= $DomCap THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |       CAST(sum(CASE WHEN rn <= $DomCap THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
       |       CAST(sum(CASE WHEN rn > $DomCap THEN n_chars ELSE 0 END) AS BIGINT) AS dropped_chars
       |FROM r GROUP BY 1""".stripMargin
}
