package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._

/** q216: content-addressed corpus manifest — a per-source Merkle root
  * over document fingerprints (the dataset-provenance primitive behind
  * "is this EXACTLY the corpus that trained the model": two snapshots
  * agree iff their roots agree, and a changed source is localized
  * without comparing a single document row; cf. the Merkle design of
  * content-addressed stores like Git/IPFS, reference framing:
  * SURVEY §2's fingerprint family, `dataflow_transform.py`'s
  * validation-then-load contract).
  *
  * Leaves are the q18 polynomial document fingerprints in doc_id
  * order; each round pairs adjacent positions (left = even), combining
  * (hL·1000003 + hR) mod P, an odd tail carrying up unchanged —
  * [[MerkleRounds]] fixed rounds cover 2^20 docs per source, and a
  * collapsed source is a fixpoint (single root re-combines to itself),
  * so extra rounds are no-ops and both engines compute the same state
  * at any size. All hashes stay < P, products < ~10¹⁵ — BIGINT-safe.
  *
  * Scale shape: each round is ONE map-side-combinable aggregate keyed
  * (source, pos div 2) over fixed-width (source, pos, hash) rows —
  * O(log n) rounds total, tree level width halves every round, no
  * adjacency or driver-side state beyond the loop counter. */
object MerkleOps {

  /** Combine multiplier (any constant < ~9·10⁹ keeps products BIGINT;
    * prime for mixing) and the fixed round count (2^20 leaves). */
  val MerkleMult = 1000003L
  val MerkleRounds = 20

  def merkleManifest(spark: SparkSession, dir: String): DataFrame =
    merkleManifestOf(Tables.spread(Tables.documents(spark, dir)))

  /** The manifest on an explicit (source, doc_id, text) frame —
    * exposed for tamper-evidence specs. */
  def merkleManifestOf(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val leaves = docs
      .select(col("source"), col("doc_id"),
        polyHashCol(concat_ws(" ", tokensCol(col("text")))).as("h"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select(col("source"), col("pos"), col("h"))
    val root = (1 to MerkleRounds).foldLeft(leaves) { (lvl, _) =>
      lvl.select(col("source"), expr("pos div 2").as("ppos"),
          (col("pos") % 2).as("par"), col("h"))
        .groupBy(col("source"), col("ppos"))
        .agg(
          max(when(col("par") === 0, col("h"))).as("hl"),
          max(when(col("par") === 1, col("h"))).as("hr"))
        .select(col("source"), col("ppos").as("pos"),
          when(col("hr").isNull, col("hl"))
            .otherwise((col("hl") * MerkleMult + col("hr")) % P).as("h"))
    }
    val counts = docs
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    root.select(col("source"), col("h").as("root"))
      .join(counts, "source")
      .select(col("source"), col("n_docs"), col("root"))
  }

  val merkleManifestSql: String = {
    val rounds = (1 to MerkleRounds).map { r =>
      s"""l$r AS MATERIALIZED (
         |  SELECT source, pos // 2 AS pos,
         |         CASE WHEN max(CASE WHEN pos % 2 = 1 THEN h END) IS NULL
         |              THEN max(CASE WHEN pos % 2 = 0 THEN h END)
         |              ELSE (max(CASE WHEN pos % 2 = 0 THEN h END) * $MerkleMult
         |                    + max(CASE WHEN pos % 2 = 1 THEN h END)) % $P
         |         END AS h
         |  FROM l${r - 1} GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH l0 AS (
       |  SELECT source,
       |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
       |              AS BIGINT) - 1 AS pos,
       |         ${polyHashSql(s"array_to_string(${tokensSql("text")}, ' ')")} AS h
       |  FROM documents),
       |$rounds,
       |counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT c.source, c.n_docs, CAST(l.h AS BIGINT) AS root
       |FROM l$MerkleRounds l JOIN counts c ON l.source = c.source""".stripMargin
  }
}
