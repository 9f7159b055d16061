package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
import graft.functions.NativeExprs

/** Cross-source overlap estimation from bottom-k (KMV) sketches (q163)
  * — the sketch answer to "how much does source A's content overlap
  * source B's?" that q112's exact source-overlap ledger computes by
  * joining fingerprints. The exact form shuffles every distinct
  * fingerprint; the KMV form reduces each source to its k smallest
  * uniformized hash values — a mergeable O(k) summary
  * ([[NativeExprs.bottomK]], a TypedImperativeAggregate with exact
  * union algebra) — and estimates pairwise Jaccard from sketch pairs
  * alone: with M = bottom-k(A ∪ B), Ĵ = |{v ∈ M : v ∈ skA ∧ v ∈ skB}|
  * / |M| (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07).
  *
  * Emitted beside the estimate: the EXACT pairwise intersection and
  * Jaccard (both engines compute both deterministically, so the
  * estimator's error per pair is pinned by the oracle hash — unlike
  * q156's DataSketches HLL, KMV is bit-reproducible in plain SQL).
  * At 100 TB the exact branch is dropped and only the sketch table —
  * S rows of k longs — survives: S² pair estimation never touches the
  * corpus again, and per-day/per-shard sketches union losslessly into
  * corpus sketches the way q156's HLL partials roll up.
  *
  * Scale shape: one distinct-(source, fp) pass (shuffle carries 16-byte
  * rows), one mergeable aggregate to S sketch rows (map-side partials
  * are ≤k longs per partition), one broadcast self-join over S² sketch
  * pairs with array-local arithmetic. */
object KmvSketch {

  /** Sketch size: RSE ≈ 1/√K ≈ 12.5%. Small by design so the gate-SF
    * corpus (≈250 docs/source at sf0.1) genuinely exercises the
    * approximate path (union > K); production k would be 1024–4096. */
  val K = 64

  /** Affine uniformizer h = (Ua·fp + Ub) mod P — a bijection on
    * [0, P) that decorrelates the sketch's order statistics from the
    * raw content fingerprint (and from every other fp-keyed operator).
    * Ua·fp < 8e17 stays far inside int64 under ANSI mode. */
  val Ua = 736338717L
  val Ub = 198491317L

  private def distinctFps(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))
      .select(col("source"),
        polyHashCol(array_join(tokensCol(col("text")), " ")).as("fp"))
      .distinct()

  def kmvOverlap(spark: SparkSession, dir: String): DataFrame =
    kmvOverlapFrom(distinctFps(spark, dir))

  /** Core pipeline over a distinct (source, fp) frame — split out so
    * specs can drive it with synthetic corpora of known overlap. */
  private[graft] def kmvOverlapFrom(f: DataFrame): DataFrame = {
    val h = f.withColumn("h", (lit(Ua) * col("fp") + lit(Ub)) % lit(P))
    val sk = h.groupBy("source")
      .agg(NativeExprs.bottomK(col("h"), K).as("sk"),
        count(lit(1)).as("n"))
    val a = sk.select(col("source").as("s1"), col("sk").as("sk1"), col("n").as("n1"))
    val b = sk.select(col("source").as("s2"), col("sk").as("sk2"), col("n").as("n2"))
    // S² sketch pairs; merged bottom-k of the union, then the shared
    // count inside the merged window — array-local, no corpus access
    val est = a.join(broadcast(b), col("s1") < col("s2"))
      .withColumn("u", array_sort(array_union(col("sk1"), col("sk2"))))
      .withColumn("k_used", least(lit(K), size(col("u"))).cast("long"))
      .withColumn("merged", slice(col("u"), lit(1), col("k_used").cast("int")))
      .withColumn("kmv_shared", size(filter(col("merged"),
        v => array_contains(col("sk1"), v) && array_contains(col("sk2"), v)))
        .cast("long"))
      .withColumn("est_j_bp", expr("(10000 * kmv_shared) div k_used"))
    // exact certification branch (dropped at production scale): true
    // pairwise intersection via the fp-keyed join
    val x = f.select(col("source").as("s1"), col("fp"))
    val y = f.select(col("source").as("s2"), col("fp"))
    val inter = x.join(y, "fp").filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("exact_inter"))
    est.join(inter, Seq("s1", "s2"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .withColumn("exact_j_bp",
        expr("(10000 * exact_inter) div (n1 + n2 - exact_inter)"))
      .withColumn("abs_err_bp", abs(col("est_j_bp") - col("exact_j_bp")))
      .select(col("s1"), col("s2"), col("n1"), col("n2"), col("k_used"),
        col("kmv_shared"), col("est_j_bp"), col("exact_inter"),
        col("exact_j_bp"), col("abs_err_bp"))
  }

  /** Oracle: bottom-k per source as row_number() ≤ K over the same
    * affine-uniformized fingerprint hash; merged window, shared count,
    * and the exact branch all in relational form. */
  val kmvOverlapSql: String =
    s"""WITH f AS (
       |  SELECT DISTINCT source,
       |         ${polyHashSql(s"array_to_string(${tokensSql("text")}, ' ')")} AS fp
       |  FROM documents),
       |h AS (SELECT source, ($Ua * fp + $Ub) % $P AS h FROM f),
       |rk AS (SELECT source, h,
       |              row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |       FROM h),
       |sk AS (SELECT source, h FROM rk WHERE rn <= $K),
       |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
       |prs AS (SELECT a.source AS s1, b.source AS s2
       |        FROM n a JOIN n b ON a.source < b.source),
       |u AS (SELECT p.s1, p.s2, k.h FROM prs p JOIN sk k ON k.source = p.s1
       |      UNION
       |      SELECT p.s1, p.s2, k.h FROM prs p JOIN sk k ON k.source = p.s2),
       |m AS (SELECT s1, s2, h,
       |             row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn
       |      FROM u),
       |mk AS (SELECT s1, s2, h FROM m WHERE rn <= $K),
       |ku AS (SELECT s1, s2, CAST(count(*) AS BIGINT) AS k_used
       |       FROM mk GROUP BY 1, 2),
       |sh AS (SELECT mk.s1, mk.s2, CAST(count(*) AS BIGINT) AS kmv_shared
       |       FROM mk
       |       JOIN sk a ON a.source = mk.s1 AND a.h = mk.h
       |       JOIN sk b ON b.source = mk.s2 AND b.h = mk.h
       |       GROUP BY 1, 2),
       |ix AS (SELECT x.source AS s1, y.source AS s2,
       |              CAST(count(*) AS BIGINT) AS exact_inter
       |       FROM f x JOIN f y ON x.fp = y.fp AND x.source < y.source
       |       GROUP BY 1, 2)
       |SELECT p.s1, p.s2, na.n AS n1, nb.n AS n2, ku.k_used,
       |       coalesce(sh.kmv_shared, 0) AS kmv_shared,
       |       (10000 * coalesce(sh.kmv_shared, 0)) // ku.k_used AS est_j_bp,
       |       coalesce(ix.exact_inter, 0) AS exact_inter,
       |       (10000 * coalesce(ix.exact_inter, 0))
       |         // (na.n + nb.n - coalesce(ix.exact_inter, 0)) AS exact_j_bp,
       |       abs((10000 * coalesce(sh.kmv_shared, 0)) // ku.k_used
       |           - (10000 * coalesce(ix.exact_inter, 0))
       |             // (na.n + nb.n - coalesce(ix.exact_inter, 0))) AS abs_err_bp
       |FROM prs p
       |JOIN n na ON na.source = p.s1
       |JOIN n nb ON nb.source = p.s2
       |JOIN ku ON ku.s1 = p.s1 AND ku.s2 = p.s2
       |LEFT JOIN sh ON sh.s1 = p.s1 AND sh.s2 = p.s2
       |LEFT JOIN ix ON ix.s1 = p.s1 AND ix.s2 = p.s2""".stripMargin
}
