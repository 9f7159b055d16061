package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.dedup.DedupOps

/** Scale-behavior proofs for the hardened near-dup pipelines: on a
  * CONCENTRATED-signature corpus (the PERF.md pathology — every doc
  * drawn from one token distribution, exact-dup floods) the candidate
  * set must stay linear-ish in documents, not quadratic, while the
  * OUTPUT stays exactly the brute-force pair set. Value correctness vs.
  * DuckDB is the Verify gate's job; these specs pin the candidate
  * CARDINALITY and the exactness of the capped/collapsed machinery. */
class DedupScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  // ------------------------------------------------------- cappedPairJoin

  test("cappedPairJoin emits exactly the bucket pair set (cap < bucket size)") {
    // two buckets: 11 ids in bucket 1 (⌈11/3⌉ = 4 grid chunks), 3 in
    // bucket 2, one singleton — pair set must be exact under capping
    val rows = ((1 to 11).map(i => (1L, i.toLong)) ++
      Seq((2L, 100L), (2L, 101L), (2L, 102L)) ++ Seq((3L, 200L)))
      .toDF("bkey", "rep").withColumn("sig", col("rep") * 7)
    val got = DedupOps.cappedPairJoin(rows, Seq("bkey"), "rep", Seq("sig"), cap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expect = (for {
      a <- 1 to 11; b <- 1 to 11 if a < b
    } yield (a.toLong, b.toLong, a * 7L, b * 7L)).toSet ++
      Set((100L, 101L, 700L, 707L), (100L, 102L, 700L, 714L), (101L, 102L, 707L, 714L))
    assert(got === expect)
  }

  test("cappedProbeJoin emits exactly the cross-side bucket pairs (both sides above cap)") {
    // bucket 1: 7 left x 9 right with cap=3 → 3x3 grid; bucket 2 only
    // on the left (no right rows → no pairs); bucket 3 one pair
    val left = ((1 to 7).map(i => (1L, i.toLong)) ++ Seq((2L, 50L), (3L, 60L)))
      .toDF("bkey", "nrep").withColumn("sigN", col("nrep") * 2)
    val right = ((1 to 9).map(i => (1L, 100L + i)) ++ Seq((3L, 70L)))
      .toDF("bkey", "crep").withColumn("sigC", col("crep") * 3)
    val got = DedupOps.cappedProbeJoin(left, right, Seq("bkey"),
        "nrep", "crep", Seq("sigN"), Seq("sigC"), cap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = (for { l <- 1 to 7; r <- 1 to 9 }
      yield (l.toLong, 100L + r, l * 2L, (100L + r) * 3)).toSet ++
      Set((60L, 70L, 120L, 210L))
    assert(got === expect)
  }

  test("cappedPairJoin degenerates to the plain bucket join when m <= cap") {
    val rows = (1 to 5).map(i => (1L, i.toLong)).toDF("bkey", "rep")
    val got = DedupOps.cappedPairJoin(rows, Seq("bkey"), "rep", Seq.empty, cap = 64)
    assert(got.count() === 10)
  }

  // ------------------------------------- concentrated corpus: simhash (q73)

  /** Brute-force hamming pairs for the expected set. */
  private def bruteHamming(sigs: Seq[(Long, Long)]): Set[(Long, Long, Int)] =
    (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      hd = java.lang.Long.bitCount(s1 ^ s2) if hd <= DedupOps.HammingMax
    } yield (d1, d2, hd)).toSet

  test("simhash: exact-dup flood collapses — candidates stay O(docs), output is brute-force-exact") {
    // 400 copies of one signature + 100 distinct docs sharing its low
    // byte (the hot band-0 bucket, > BucketCap even after collapse) +
    // 20 scattered others. Doc-space band-0 bucket alone holds 500 rows
    // → C(500,2) ≈ 125k candidate pairs for the un-collapsed pipeline;
    // post-collapse + sub-banding must stay tiny.
    val s0 = 0x12345678L
    val flood    = (0 until 400).map(i => (i.toLong, s0))
    val sharedLo = (0 until 100).map(i => (400L + i, (0x78L) | ((i.toLong * 0x9E37L % 0xFFFFFFL) << 8)))
    val others   = (0 until 20).map(i => (500L + i, (i.toLong * 0x51afdbeeL) & 0xFFFFFFFFL))
    val all  = flood ++ sharedLo ++ others
    val sigs = all.toDF("doc_id", "sig")

    val groups = sigs.groupBy(col("sig"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("members"),
        count(lit(1)).cast("int").as("gsize"))
    val nCand = DedupOps.simhashRepCandidates(groups.select(col("rep"), col("sig"))).count()
    val distinctSigs = all.map(_._2).distinct.size
    // candidate space is bounded by distinct-signature pairs, and far
    // below the doc-space bucket blowup (~105k)
    assert(nCand <= distinctSigs.toLong * distinctSigs, s"candidates $nCand")
    assert(nCand < 4000, s"candidates $nCand — concentration not absorbed")

    val got = DedupOps.simhashNearDupFrom(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === bruteHamming(all))
    // the flood alone contributes its full C(400,2) within-group pairs
    assert(got.count { case (d1, d2, hd) => d1 < 400 && d2 < 400 && hd == 0 } >= 400 * 399 / 2)
  }

  test("simhash: sub-band refinement stays exact when an oversized bucket is NOT mostly identical") {
    // one hot band-0 byte, all signatures distinct: the bucket (300 rows)
    // exceeds BucketCap, takes the sub-band + grid path, and must still
    // find exactly the brute-force hamming pairs
    val all = (0 until 300).map { i =>
      (i.toLong, 0x55L | ((i.toLong * 0x01010101L % 0xFFFFFFL) << 8))
    }
    val sigs = all.toDF("doc_id", "sig")
    val got = DedupOps.simhashNearDupFrom(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === bruteHamming(all))
  }

  // ------------------------------------- concentrated corpus: minhash (q21)

  test("minhash LSH: exact-dup flood collapses and the tiered verify prunes, output brute-force-exact") {
    // hsets built directly: 300 docs with an IDENTICAL shingle set,
    // 20 docs half-overlapping it (J ≈ 1/3, below τ=0.5 — borderline
    // candidates the sketch may or may not reject), 10 disjoint docs
    val base = (1L to 40L)
    val flood   = (0 until 300).map(i => (i.toLong, base))
    val partial = (0 until 20).map { i =>
      (300L + i, (21L to 40L) ++ (1000L + i * 50 to 1000L + i * 50 + 19))
    }
    val far = (0 until 10).map(i => (320L + i, (5000L + i * 100 to 5040L + i * 100)))
    val all = (flood ++ partial ++ far).map { case (d, hs) => (d, hs.toSeq) }
    val hsets = all.toDF("doc_id", "hs").withColumn("n", size(col("hs")))

    val groups = DedupOps.collapseShingleSets(hsets)
    assert(groups.count() === 31L, "300 identical sets must collapse to one group")
    val cand = DedupOps.minhashRepCandidates(groups.select(col("rep"), col("hs")))
    val nCand = cand.count()
    assert(nCand <= 31L * 30 / 2, s"candidates $nCand exceed rep-space pairs")

    // expected: exact Jaccard over the hash SETS at τ = 0.5
    val expect = (for {
      (d1, h1) <- all; (d2, h2) <- all if d1 < d2
      s1 = h1.toSet; s2 = h2.toSet
      shared = (s1 & s2).size
      j = BigDecimal(shared.toDouble / (s1.size + s2.size - shared))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= DedupOps.JaccardThreshold
    } yield (d1, d2, shared, j)).toSet
    val got = DedupOps.minhashLshFrom(hsets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got === expect)
    assert(got.size >= 300 * 299 / 2, "flood pairs must all be emitted")
  }

  // ---------------------------------------------- containment dedup (q145)

  test("containment: finds the subset pairs the Jaccard family misses, prefix filter brute-force-exact") {
    // A (21 shingles incl. shared boilerplate 0L) quoted inside B
    // (A + 180 extra): C(A→B) = 1.0 but J ≈ 0.10 — invisible to any
    // Jaccard-threshold dedup. C is an exact copy of A (mutual
    // containment). The boilerplate shingle sits in EVERY doc, so
    // common-gram postings are maximal; rare-first probe ordering plus
    // the capped probe join must keep the output brute-force-exact
    // anyway.
    val boiler = Seq(0L)
    val docA = 1L -> ((1L to 20L) ++ boiler)
    val docB = 2L -> ((1L to 20L) ++ (100L to 279L) ++ boiler)
    val docC = 3L -> ((1L to 20L) ++ boiler)
    val noise = (0 until 50).map(i =>
      (10L + i) -> (((1000L + i * 37L) to (1030L + i * 37L)) ++ boiler))
    val all: Seq[(Long, Seq[Long])] =
      (Seq(docA, docB, docC) ++ noise).map { case (d, hs) => (d, hs.toSeq.distinct) }
    val hsets = all.toDF("doc_id", "hs").withColumn("n", size(col("hs")))
    val got = DedupOps.containmentFrom(hsets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(7))).toSet
    val expect = (for {
      (d1, h1) <- all; (d2, h2) <- all if d1 != d2
      shared = (h1.toSet & h2.toSet).size.toLong
      if 5 * shared >= 4 * h1.size
    } yield (d1, d2, shared, 3 * shared < h1.size + h2.size)).toSet
    assert(got === expect)
    // the quote-inclusion pair is found and flagged Jaccard-blind; the
    // reverse direction (B in A) is impossible and absent
    assert(got.contains((1L, 2L, 21L, true)))
    assert(!got.exists { case (d1, d2, _, _) => d1 == 2L && d2 == 1L })
    // the symmetric MinHash family really is blind to it at the same corpus
    val lsh = DedupOps.minhashLshFrom(hsets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!lsh.contains((1L, 2L)) && !lsh.contains((2L, 1L)))
    // while the mutual exact-copy pair is seen by both families
    assert(lsh.contains((1L, 3L)) && got.contains((1L, 3L, 21L, false)))
  }

  test("minhash tier-1 cut: contract holds on the corpus, rejects a low-agreement candidate") {
    // With the mixed (splitmix64) coefficient family, band collisions on
    // this corpus imply genuine agreement, so tier 1 may prune NOTHING
    // here — that is the healthy outcome (the old linear-in-i family
    // made it prune real near-dups; see AgreeCut's scaladoc). The
    // corpus assertion is therefore a sanity bound, and the rejection
    // semantics are pinned on a synthetic low-agreement candidate.
    val dir = "/root/testdata/sf0.01"
    val docs = graft.tables.Tables.documents(spark, dir)
    val hsets = docs.select(col("doc_id"),
        graft.functions.NativeExprs.shingleHashes(
          graft.functions.TextExprs.tokensCol(col("text")),
          graft.functions.TextExprs.ShingleW, graft.functions.TextExprs.P).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("n", size(col("hs")))
    val cand = DedupOps.minhashRepCandidates(
      DedupOps.collapseShingleSets(hsets).select(col("rep"), col("hs")))
    val nCand = cand.count()
    val nBorderline = cand
      .withColumn("n_agree", size(filter(
        zip_with(col("sig1"), col("sig2"), (x, y) => x === y), p => p)))
      .filter(col("n_agree") >= DedupOps.AgreeCut)
      .count()
    assert(nBorderline > 0 && nBorderline <= nCand)
    // synthetic: a candidate whose sigs agree in exactly one band
    // (the minimum that makes it a candidate) sits below the cut and
    // must be rejected by the same filter expression
    import spark.implicits._
    val sigA = (0 until 32).map(_.toLong)
    val sigB = sigA.take(DedupOps.AgreeCut - 4) ++
      sigA.drop(DedupOps.AgreeCut - 4).map(_ + 1000L)
    val one = Seq((1L, 2L, sigA, sigB)).toDF("r1", "r2", "sig1", "sig2")
    val kept = one
      .withColumn("n_agree", size(filter(
        zip_with(col("sig1"), col("sig2"), (x, y) => x === y), p => p)))
      .filter(col("n_agree") >= DedupOps.AgreeCut)
      .count()
    assert(kept === 0)
  }
}
