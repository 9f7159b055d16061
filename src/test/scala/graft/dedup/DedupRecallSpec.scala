package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** The near-dup retrieval-quality ledger — the dedup mirror of
  * `VectorRecallSpec`. The DuckDB oracles pin each family's
  * COMPUTATION (both engines run the same banding), so a recall
  * regression — a broken coefficient family, a band key that stopped
  * discriminating, a collapse path that drops members — can stay
  * oracle-green (round 7's MinHash coefficient bug did exactly that
  * until the 10× protocol landed on it by luck). This spec pins it
  * structurally: a PLANTED corpus where ground truth is known by
  * construction —
  *
  *  - 10 exact-duplicate pairs (identical text): must ALL surface at
  *    jaccard 1.0 through the collapse path;
  *  - 40 near-dup pairs (2 of 120 tokens mutated, shingle Jaccard
  *    ≈ 0.9, banded capture probability ≥ 0.9999): MinHash-LSH must
  *    recall ≥ 0.95, the exact n-gram join must recall ALL;
  *  - 40 light-mutation pairs (1 of 120 tokens) for the SimHash
  *    hamming family;
  *  - 300 background docs with per-doc-unique vocabulary: ZERO
  *    cross-family pairs may appear (precision guard).
  *
  * All text is derived from a splitmix-style hash — deterministic
  * given code, so the floors are exact regression tripwires, not
  * statistical hopes. */
class DedupRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val DocLen = 120
  private val NPairs = 40

  /** Base doc i: 120 tokens from an 800-word vocabulary UNIQUE to
    * family i, with hash-mixed (non-sequential) spellings. Both
    * properties are load-bearing for the zero-cross-family precision
    * guard: (a) a vocabulary shared across families gives every doc
    * the same per-bit SimHash bias, pulling unrelated docs inside the
    * hamming band (observed: pair (5,16) at hd<=3); (b) sequential
    * spellings like "w233" give polynomial hashes differing by a
    * constant B^k, which correlates signature bits across docs. */
  private def baseTokens(i: Int): Vector[String] =
    (0 until DocLen).map { j =>
      val v = (mix(i * 1337L + j) % 800).abs
      "t" + java.lang.Long.toHexString(mix(i * 100003L + v))
    }.toVector

  private lazy val plantedDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_deduprec_").toString
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    (0 until NPairs).foreach { i =>
      val base = baseTokens(i)
      docs += ((i.toLong, base.mkString(" ")))
      // near-dup: tokens 30 and 80 replaced (6 shingles of ~118 move)
      val near = base.updated(30, "mutA" + i).updated(80, "mutB" + i)
      docs += ((1000L + i, near.mkString(" ")))
      // light mutation for the simhash family: one token replaced
      val light = base.updated(55, "mutC" + i)
      docs += ((2000L + i, light.mkString(" ")))
    }
    (0 until 10).foreach { i => // exact duplicates of the first 10 bases
      docs += ((3000L + i, baseTokens(i).mkString(" ")))
    }
    (0 until 300).foreach { i => // background: per-doc-unique vocabulary.
      // Tokens are splitmix-mixed, NOT sequential ("bg118x53"): sequential
      // strings give polynomial hashes that differ by a constant B^k
      // between adjacent docs, which correlates SimHash bits and collapses
      // hamming distance below the band threshold (observed: bg118/bg119
      // at hd<=3 on the 32-bit signature).
      val toks = (0 until DocLen).map(j =>
        "bg" + java.lang.Long.toHexString(mix((5000L + i) * 7919L + j)))
      docs += ((5000L + i, toks.mkString(" ")))
    }
    import spark.implicits._
    docs.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** family of a doc id: base index it derives from, or -1 for bg. */
  private def family(id: Long): Long =
    if (id >= 5000) -1L else id % 1000

  test("MinHash-LSH: exact dups all surface at jaccard 1.0; near-dups recall >= 0.95; zero cross-family pairs") {
    val pairs = DedupOps.minhashLsh(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // precision: nothing crosses families, nothing touches background
    pairs.foreach { case (d1, d2, _) =>
      assert(family(d1) >= 0 && family(d1) === family(d2),
        s"cross-family pair ($d1, $d2) reported")
    }
    val found = pairs.map(p => (p._1, p._2)).toSet
    val exact = (0 until 10).count(i => found.contains((i.toLong, 3000L + i)))
    assert(exact === 10, s"exact-dup pairs found: $exact/10")
    pairs.filter(p => p._2 >= 3000 && p._2 < 4000).foreach { case (d1, d2, j) =>
      if (d1 < 1000) assert(j === 1.0, s"exact pair ($d1,$d2) jaccard $j != 1.0")
    }
    val near = (0 until NPairs).count(i => found.contains((i.toLong, 1000L + i)))
    assert(near >= (NPairs * 0.95).toInt, s"near-dup recall $near/$NPairs < 0.95")
    info(s"minhash: exact 10/10, near-dup $near/$NPairs, pairs total ${pairs.length}")
  }

  test("exact n-gram Jaccard join: ALL planted near-dup pairs recovered (it is exhaustive)") {
    val found = DedupOps.ngramJaccard(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val near = (0 until NPairs).count(i => found.contains((i.toLong, 1000L + i)))
    assert(near === NPairs, s"exhaustive join missed near-dup pairs: $near/$NPairs")
    found.foreach { case (d1, d2) =>
      assert(family(d1) >= 0 && family(d1) === family(d2),
        s"cross-family pair ($d1, $d2) reported")
    }
  }

  test("SimHash hamming family: light-mutation pairs recall >= 0.85; zero cross-family pairs") {
    val pairs = DedupOps.simhashNearDup(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (d1, d2) =>
      assert(family(d1) >= 0 && family(d1) === family(d2),
        s"cross-family pair ($d1, $d2) reported")
    }
    val found = pairs.toSet
    val light = (0 until NPairs).count(i => found.contains((i.toLong, 2000L + i)))
    assert(light >= (NPairs * 0.85).toInt, s"light-mutation recall $light/$NPairs < 0.85")
    info(s"simhash: light-mutation $light/$NPairs, pairs total ${pairs.length}")
  }
}
