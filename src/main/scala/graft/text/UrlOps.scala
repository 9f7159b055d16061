package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
import graft.functions.NativeExprs

/** Canonical-URL deduplication (q152) — the FIRST dedup key of every
  * web-crawl pipeline: the same page arrives under scheme/host case
  * variants, default ports, fragments, tracking query params and
  * trailing slashes, and URL-level dedup collapses them before any
  * content hash is ever computed (CommonCrawl dedups by canonical URL
  * ahead of WARC processing). [[NativeExprs.urlCanon]] is the REAL
  * codegen'd canonicalizer (scheme/host lowercasing, default-port and
  * fragment stripping, tracking-param filtering in original param
  * order, trailing-slash normalization).
  *
  * Corpus convention (generator family): documents carry no URL
  * column, so each document's crawl URL is synthesized
  * deterministically — four docs share each base URL, each arriving
  * as a different variant: v0 already canonical, v1 uppercased
  * scheme+host with explicit `:443` and a fragment, v2 tracking
  * params PLUS a genuine `page=2` param (which must SURVIVE — the
  * over-stripping trap), v3 trailing slash + tracking param. The
  * oracle re-derives the canonical form ARITHMETICALLY (it never
  * parses), so a green hash certifies the parser lands on the known
  * canonical for every variant class: v0/v1/v3 collapse into one
  * class, v2 stays distinct by its surviving param.
  *
  * Scale shape: canonicalization is a narrow codegen'd map; class
  * sizing groups on the 64-bit canonical FINGERPRINT, not the URL
  * string, so the shuffle carries (fp, count) only; the per-doc join
  * back is fp-keyed (AQE/broadcast territory at real class counts —
  * the class table is distinct-URL-sized, far below the corpus). */
object UrlOps {

  private def variantUrl = {
    val g = expr("doc_id div 4") // base-URL group: 4 docs per base
    val path = concat(lit("/cat"), (g % 7).cast("string"),
      lit("/doc"), g.cast("string"))
    val v = col("doc_id") % 4
    when(v === 0, concat(lit("https://example.com"), path))
      .when(v === 1, concat(lit("HTTPS://EXAMPLE.COM:443"), path,
        lit("#sec"), (col("doc_id") % 5).cast("string")))
      .when(v === 2, concat(lit("https://example.com"), path,
        lit("?utm_source=s"), (col("doc_id") % 9).cast("string"),
        lit("&page=2")))
      .otherwise(concat(lit("https://example.com"), path,
        lit("/?fbclid=x"), col("doc_id").cast("string")))
  }

  def urlCanonDedup(spark: SparkSession, dir: String): DataFrame = {
    val urls = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), variantUrl.as("url"))
      .select(col("doc_id"), col("url"),
        NativeExprs.urlCanon(col("url")).as("canon_url"))
      .withColumn("canon_fp", polyHashCol(col("canon_url")))
    val classes = urls.groupBy("canon_fp")
      .agg(count(lit(1)).as("class_size"))
    urls.join(classes, "canon_fp")
      .select(col("doc_id"), col("url"), col("canon_url"), col("canon_fp"),
        col("class_size"), (col("class_size") > 1).as("is_dup"))
  }

  /** Oracle: the same variant construction, canonical form derived
    * arithmetically (no parsing), classes grouped on the canonical. */
  val urlCanonDedupSql: String =
    s"""WITH v AS (
       |  SELECT doc_id, doc_id % 4 AS v, doc_id // 4 AS g FROM documents),
       |b AS (
       |  SELECT doc_id, v,
       |         '/cat' || (g % 7) || '/doc' || g AS path,
       |         doc_id % 5 AS f5, doc_id % 9 AS s9
       |  FROM v),
       |u AS (
       |  SELECT doc_id,
       |         CASE v
       |           WHEN 0 THEN 'https://example.com' || path
       |           WHEN 1 THEN 'HTTPS://EXAMPLE.COM:443' || path || '#sec' || f5
       |           WHEN 2 THEN 'https://example.com' || path || '?utm_source=s' || s9 || '&page=2'
       |           ELSE 'https://example.com' || path || '/?fbclid=x' || doc_id
       |         END AS url,
       |         'https://example.com' || path ||
       |           CASE WHEN v = 2 THEN '?page=2' ELSE '' END AS canon_url
       |  FROM b),
       |c AS (SELECT canon_url, count(*) AS class_size FROM u GROUP BY 1)
       |SELECT u.doc_id, u.url, u.canon_url,
       |       ${polyHashSql("u.canon_url")} AS canon_fp,
       |       CAST(c.class_size AS BIGINT) AS class_size,
       |       c.class_size > 1 AS is_dup
       |FROM u JOIN c ON u.canon_url = c.canon_url""".stripMargin
}
