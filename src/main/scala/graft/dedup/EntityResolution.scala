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

  /** Oracle: positional mod-3 pigeonhole blocking — an independent
    * formulation (a DIFFERENT exact-blocking principle than the
    * engine's delete-variant SymSpell) whose equality proves the
    * blocked path misses nothing.
    *
    * Why not the naive quadratic join the r1–r10 gates ran: DuckDB
    * executes `ON a.id < b.id AND levenshtein(...) <= 1` as an
    * inequality join that pays the levenshtein on every id-ordered
    * pair — 14.6G calls at a 171k-name registry, single-threaded in
    * practice, >1800 s at sf1 (it was 133 s at sf0.1; quadratic).
    *
    * Soundness of the replacement (exact, not approximate):
    *  - equal lengths: lev ≤ 1 ⟺ Hamming ≤ 1 (an indel changes the
    *    length), and one substitution falls in exactly one of the
    *    three position classes i mod 3 — so the OTHER TWO classes'
    *    characters are equal. The three g-keys each drop one position
    *    class (regexp captures of char triples), so every Hamming≤1
    *    pair shares at least one (length, g) key. Unlike contiguous
    *    thirds, mod-3 interleaving keeps key entropy high when names
    *    share a long common prefix (this registry: `Customer#` + key
    *    digits — a contiguous first-two-thirds key would bucket 85k
    *    names together and go quadratic again).
    *  - length difference 1: every such pair is a candidate via the
    *    (n+1 = n) length-bucket join and pays the exact verify —
    *    sound by construction; cheap because length buckets only pair
    *    ADJACENT lengths (zero pairs in this registry's fixed-width
    *    names, bounded in general).
    *  - length difference ≥ 2 ⟹ lev ≥ 2: correctly excluded.
    * Every candidate is then levenshtein-verified, so false candidates
    * cannot leak. The id ordering is CASE-masked (same DuckDB
    * piecewise-merge-join hazard as the q186 cubic oracle). Equality
    * with the naive quadratic form is hash-proven at sf0.1 (273,160
    * pairs, identical multiset hash; 133 s → 1.1 s) and against the
    * engine at sf1-organic (3,471,136 pairs, 11.6 s). */
  val entityResolutionSql: String =
    s"""WITH reg AS (
       |  SELECT c_custkey AS id, c_name AS name FROM customer
       |  UNION ALL
       |  SELECT c_custkey + 1000000000,
       |         substr(c_name, 1, 10 + c_custkey % 6)
       |           || chr(97 + CAST(c_custkey % 5 AS INT))
       |           || substr(c_name, 12 + c_custkey % 6)
       |  FROM customer WHERE c_custkey % 7 = 3),
       |k AS (
       |  SELECT id, name, length(name) AS n,
       |         regexp_replace(name, '(.)(.)?(.)?', '\\2\\3', 'g') AS g0,
       |         regexp_replace(name, '(.)(.)?(.)?', '\\1\\3', 'g') AS g1,
       |         regexp_replace(name, '(.)(.)?(.)?', '\\1\\2', 'g') AS g2
       |  FROM reg),
       |cand AS (
       |  SELECT a.id AS id1, b.id AS id2, a.name AS n1, b.name AS n2
       |  FROM k a JOIN k b ON a.n = b.n AND a.g0 = b.g0
       |  WHERE (CASE WHEN a.id < b.id THEN 1 ELSE 0 END) = 1
       |  UNION
       |  SELECT a.id, b.id, a.name, b.name
       |  FROM k a JOIN k b ON a.n = b.n AND a.g1 = b.g1
       |  WHERE (CASE WHEN a.id < b.id THEN 1 ELSE 0 END) = 1
       |  UNION
       |  SELECT a.id, b.id, a.name, b.name
       |  FROM k a JOIN k b ON a.n = b.n AND a.g2 = b.g2
       |  WHERE (CASE WHEN a.id < b.id THEN 1 ELSE 0 END) = 1
       |  UNION
       |  SELECT least(a.id, b.id), greatest(a.id, b.id),
       |         CASE WHEN a.id < b.id THEN a.name ELSE b.name END,
       |         CASE WHEN a.id < b.id THEN b.name ELSE a.name END
       |  FROM k a JOIN k b ON a.n + 1 = b.n)
       |SELECT id1, id2, CAST(levenshtein(n1, n2) AS BIGINT) AS dist
       |FROM cand WHERE levenshtein(n1, n2) <= 1""".stripMargin
}
