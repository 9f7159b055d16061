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

  /** The leaf + pairing-round CTE chain over a docs relation `rel`
    * (must expose source, doc_id, text), all CTE names suffixed so two
    * chains can coexist in one statement (q221). Terminal level is
    * `l$MerkleRounds$sfx`. */
  def merkleChainSql(sfx: String, rel: String): String = {
    val rounds = (1 to MerkleRounds).map { r =>
      s"""l$r$sfx AS MATERIALIZED (
         |  SELECT source, pos // 2 AS pos,
         |         CASE WHEN max(CASE WHEN pos % 2 = 1 THEN h END) IS NULL
         |              THEN max(CASE WHEN pos % 2 = 0 THEN h END)
         |              ELSE (max(CASE WHEN pos % 2 = 0 THEN h END) * $MerkleMult
         |                    + max(CASE WHEN pos % 2 = 1 THEN h END)) % $P
         |         END AS h
         |  FROM l${r - 1}$sfx GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""l0$sfx AS (
       |  SELECT source,
       |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
       |              AS BIGINT) - 1 AS pos,
       |         ${polyHashSql(s"array_to_string(${tokensSql("text")}, ' ')")} AS h
       |  FROM $rel),
       |$rounds""".stripMargin
  }

  val merkleManifestSql: String =
    s"""WITH ${merkleChainSql("", "documents")},
       |counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT c.source, c.n_docs, CAST(l.h AS BIGINT) AS root
       |FROM l$MerkleRounds l JOIN counts c ON l.source = c.source""".stripMargin

  /** Deterministic v2-snapshot derivation for [[manifestDiff]]:
    * every doc_id % [[EditEvery]] == 0 gets an appended edit marker,
    * every doc_id % [[DropEvery]] == [[DropPhase]] is removed. */
  val EditEvery = 37L
  val DropEvery = 101L
  val DropPhase = 5L

  /** q221: corpus-snapshot diff THROUGH the manifest — the operational
    * use of q216: given snapshot v1 (the corpus) and v2 (a derived
    * next-day snapshot with deterministic edits and removals), emit
    * per source the two roots, the O(1) `same` verdict, and the
    * leaf-level explanation (n_edited among surviving docs, n_removed)
    * a provenance audit drills into ONLY for sources whose roots
    * disagree. Roots are position-sensitive by design (a removal
    * shifts every later leaf — the manifest certifies the exact
    * ordered corpus, not a bag); the ledger columns carry the
    * content-level story. Scale shape: two manifest chains (O(log n)
    * rounds each) + one doc_id-keyed fingerprint anti/inner join. */
  def manifestDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.spread(Tables.documents(spark, dir))
      .select(col("source"), col("doc_id"), col("text"))
    val v2 = v1.filter(col("doc_id") % DropEvery =!= DropPhase)
      .select(col("source"), col("doc_id"),
        when(col("doc_id") % EditEvery === 0,
          concat(col("text"), lit(" editmark"))).otherwise(col("text"))
          .as("text"))
    val m1 = merkleManifestOf(v1)
      .select(col("source"), col("n_docs").as("n_docs_v1"),
        col("root").as("root_v1"))
    val m2 = merkleManifestOf(v2)
      .select(col("source"), col("n_docs").as("n_docs_v2"),
        col("root").as("root_v2"))
    val f1 = v1.select(col("source"), col("doc_id"),
      polyHashCol(concat_ws(" ", tokensCol(col("text")))).as("h1"))
    val f2 = v2.select(col("doc_id"),
      polyHashCol(concat_ws(" ", tokensCol(col("text")))).as("h2"))
    val leaf = f1.join(f2, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(sum(when(col("h2").isNotNull && col("h1") =!= col("h2"), 1L)
        .otherwise(0L)).as("n_edited"),
        sum(when(col("h2").isNull, 1L).otherwise(0L)).as("n_removed"))
    m1.join(m2, "source").join(leaf, "source")
      .select(col("source"), col("n_docs_v1"), col("n_docs_v2"),
        col("root_v1"), col("root_v2"),
        (col("root_v1") === col("root_v2")).cast("long").as("same"),
        col("n_edited"), col("n_removed"))
  }

  val manifestDiffSql: String =
    s"""WITH v2 AS (
       |  SELECT source, doc_id,
       |         CASE WHEN doc_id % $EditEvery = 0
       |              THEN concat(text, ' editmark') ELSE text END AS text
       |  FROM documents WHERE doc_id % $DropEvery != $DropPhase),
       |${merkleChainSql("a", "documents")},
       |${merkleChainSql("b", "v2")},
       |c1 AS (SELECT source, count(*) AS n_docs_v1 FROM documents GROUP BY 1),
       |c2 AS (SELECT source, count(*) AS n_docs_v2 FROM v2 GROUP BY 1),
       |f1 AS (SELECT source, doc_id,
       |         ${polyHashSql(s"array_to_string(${tokensSql("text")}, ' ')")} AS h1
       |       FROM documents),
       |f2 AS (SELECT doc_id,
       |         ${polyHashSql(s"array_to_string(${tokensSql("text")}, ' ')")} AS h2
       |       FROM v2),
       |leaf AS (
       |  SELECT f1.source,
       |         CAST(sum(CASE WHEN f2.h2 IS NOT NULL AND f1.h1 != f2.h2
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_edited,
       |         CAST(sum(CASE WHEN f2.h2 IS NULL THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_removed
       |  FROM f1 LEFT JOIN f2 ON f1.doc_id = f2.doc_id
       |  GROUP BY 1)
       |SELECT a.source, c1.n_docs_v1, c2.n_docs_v2,
       |       CAST(a.h AS BIGINT) AS root_v1, CAST(b.h AS BIGINT) AS root_v2,
       |       CAST(CASE WHEN a.h = b.h THEN 1 ELSE 0 END AS BIGINT) AS same,
       |       leaf.n_edited, leaf.n_removed
       |FROM l${MerkleRounds}a a
       |JOIN l${MerkleRounds}b b ON a.source = b.source
       |JOIN c1 ON c1.source = a.source
       |JOIN c2 ON c2.source = a.source
       |JOIN leaf ON leaf.source = a.source""".stripMargin
}
