package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
import graft.functions.NativeExprs

/** Content-defined chunk dedup (q153) — the storage-dedup shape
  * (LBFS/Venti/rsync lineage): chunk every document at ROLLING-HASH
  * boundaries ([[NativeExprs.cdcChunks]]: boundary where the trailing
  * [[CdcW]]-char window's polyhash ≡ 0 mod [[CdcD]], ~[[CdcD]]-char
  * expected chunks) and fingerprint each chunk. Because boundaries
  * depend only on LOCAL content, an insertion near the head of a
  * near-copy re-synchronizes after one window — shared runs land in
  * identical chunks — where fixed-size blocks would shift every
  * subsequent block (CdcSpec pins the re-sync property). Complements
  * the shingle family: q21/q73 *detect* near-dup documents; CDC
  * *localizes* the shared bytes, the sub-document granularity a
  * training pipeline needs to excise — not drop — boilerplate runs.
  *
  * The window hash IS the polyhash of the window substring, so the
  * DuckDB oracle recomputes boundaries AND chunk fingerprints from
  * the shared `polyHashSql` fold — one definition, two engines; a
  * green hash certifies the rolling O(1)/char update agrees with the
  * from-scratch windowed fold at every position of every document.
  *
  * Scale shape: chunking is a narrow codegen'd map; only (doc_id,
  * fp) rows enter the shuffle (fixed-width, ~n/[[CdcD]] per doc); the
  * chunk-frequency table aggregates with map-side combine and joins
  * back fp-keyed. Payload text never shuffles. */
object CdcOps {

  /** Rolling window (chars) and boundary divisor (expected chunk
    * length) — cross-engine contract constants. */
  val CdcW = 8
  val CdcD = 16

  def cdcChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val ch = Tables.spread(Tables.documents(spark, dir))
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        explode(NativeExprs.cdcChunks(col("text"), CdcW, CdcD)).as("fp"))
    val docsPerFp = ch.groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("nd"))
    ch.join(docsPerFp, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_u", expr("(1000000 * n_shared) div n_chunks"))
  }

  /** Oracle: boundaries and fingerprints re-derived from the shared
    * polyhash fold over explicit window substrings (no rolling
    * update — the independent from-scratch formulation). */
  val cdcChunkDedupSql: String = {
    val winHash = polyHashSql(s"substr(s, e - ${CdcW - 1}, $CdcW)")
    s"""WITH c AS (
       |  SELECT doc_id, text AS s, length(text) AS n
       |  FROM documents WHERE length(text) >= 1),
       |b AS (
       |  SELECT doc_id, s, n,
       |         list_filter(range($CdcW, n), e -> ($winHash) % $CdcD = 0) AS bnds
       |  FROM c),
       |st AS (
       |  SELECT doc_id, s,
       |         list_prepend(1, list_transform(bnds, e -> e + 1)) AS starts,
       |         list_append(bnds, n) AS ends
       |  FROM b),
       |ch AS (
       |  SELECT doc_id,
       |         substr(s, starts[u.k], ends[u.k] - starts[u.k] + 1) AS chunk
       |  FROM st, UNNEST(range(1, len(starts) + 1)) AS u(k)),
       |fp AS (SELECT doc_id, ${polyHashSql("chunk")} AS fp FROM ch),
       |nd AS (SELECT fp, count(DISTINCT doc_id) AS nd FROM fp GROUP BY 1)
       |SELECT f.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_chunks,
       |       CAST(sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |       CAST((1000000 * sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END))
       |            // count(*) AS BIGINT) AS shared_u
       |FROM fp f JOIN nd ON f.fp = nd.fp
       |GROUP BY 1""".stripMargin
  }
}
