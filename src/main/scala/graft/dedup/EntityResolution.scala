package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.NativeExprs

/** Entity resolution / record linkage (q160) — fuzzy-match dedup for
  * RELATIONAL entities (the data-cleaning op next to the reference's
  * exact D7 dedup): find every pair of registry records whose names
  * are within edit distance 1 — typo'd duplicate customers, OCR'd
  * registries, merged CRMs. The naive form is O(n²) `levenshtein`
  * comparisons; the scale path is symmetric-delete (FastSS/SymSpell)
  * blocking ([[NativeExprs.deleteVariantHashes]]): records at
  * distance ≤ 1 provably share a deletion-variant key, so a self-join
  * on O(n·len) keys yields a NO-FALSE-NEGATIVE candidate set and only
  * candidates pay the exact verify. The DuckDB oracle IS the naive
  * quadratic form, so a green hash proves the blocked path misses
  * nothing.
  *
  * Registry convention (generator family): every customer's clean
  * name, plus — for customers with `c_custkey % 7 = 3` — a typo'd
  * duplicate record (`id + 10⁹`; one digit at position
  * `11 + custkey % 6` replaced by a letter, i.e. distance exactly 1,
  * derived identically by both engines). Clean names differing in one
  * digit also match at distance 1 — deliberate: real registries are
  * full of near-identical ids, and the candidate mass they create is
  * exactly what the blocking must absorb.
  *
  * Scale shape: variant keys are a narrow codegen'd map; the
  * candidate self-join shuffles (key, id, name) with name lengths
  * bounded; pairs dedup on (id1, id2) before the verify. At 100 TB
  * registry scale the index is the standard SymSpell trade (len+1
  * keys per record), and distance-k needs the k-deletion
  * neighborhood (keys grow combinatorially — k ≤ 2 in practice). */
object EntityResolution {

  def entityResolution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val typo = cust.filter(col("c_custkey") % 7 === 3)
      .select((col("c_custkey") + 1000000000L).as("id"),
        expr("concat(substring(c_name, 1, cast(10 + c_custkey % 6 as int)), " +
          "char(97 + c_custkey % 5), " +
          "substring(c_name, cast(12 + c_custkey % 6 as int)))").as("name"))
    val reg = cust.select(col("c_custkey").as("id"), col("c_name").as("name"))
      .unionAll(typo)
    // candidate keys carry IDS ONLY: a pair sharing j variant keys
    // would otherwise shuffle its two full names j times (up to len+1
    // copies) into the distinct — dedup the (id1, id2) pairs first,
    // then join the names back for the single exact verify
    val keys = reg.select(col("id"),
      explode(NativeExprs.deleteVariantHashes(col("name"))).as("k"))
    val cand = keys.as("a").join(keys.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    cand
      .join(reg.select(col("id").as("id1"), col("name").as("n1")), "id1")
      .join(reg.select(col("id").as("id2"), col("name").as("n2")), "id2")
      .withColumn("dist", levenshtein(col("n1"), col("n2")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id1"), col("id2"), col("dist"))
  }

  /** Oracle: the naive quadratic form — independent formulation whose
    * equality proves the symmetric-delete blocking is complete. */
  val entityResolutionSql: String =
    s"""WITH reg AS (
       |  SELECT c_custkey AS id, c_name AS name FROM customer
       |  UNION ALL
       |  SELECT c_custkey + 1000000000,
       |         substr(c_name, 1, 10 + c_custkey % 6)
       |           || chr(97 + CAST(c_custkey % 5 AS INT))
       |           || substr(c_name, 12 + c_custkey % 6)
       |  FROM customer WHERE c_custkey % 7 = 3)
       |SELECT a.id AS id1, b.id AS id2,
       |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
       |FROM reg a JOIN reg b
       |  ON a.id < b.id AND levenshtein(a.name, b.name) <= 1""".stripMargin
}
