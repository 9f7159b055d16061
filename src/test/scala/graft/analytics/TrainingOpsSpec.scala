package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.dedup.DedupOps
import graft.text.TextOps
import graft.vector.VectorOps

/** Invariant checks for the training-data operators on sf0.001 (value
  * correctness vs. DuckDB is covered by the Verify/oracle gate — these
  * pin structural properties and cross-operator agreement). */
class TrainingOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("exact dedup partitions all documents") {
    val d = DedupOps.exactDedup(spark, dir)
    assert(d.agg(sum("n_copies")).head().getLong(0) === 500L)
  }

  test("keep-best dedup agrees with first-wins on clusters, differs only in policy (q105)") {
    val best  = DedupOps.dedupKeepBest(spark, dir).cache()
    val first = DedupOps.exactDedup(spark, dir)
    // identical cluster structure: same fingerprints, same copy counts
    val b = best.select("fp", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val f = first.select("fp", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b === f)
    // the kept doc has the cluster's max token count
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextExprs.tokensCol(col("text"))).as("nt"))
    val viol = best.join(docs, best("keep_id") === docs("doc_id"))
      .filter(col("nt") =!= col("n_tokens")).count()
    assert(viol === 0)
    best.unpersist()
  }

  test("minhash LSH finds the same near-dup pairs as exact n-gram Jaccard") {
    // With 8 bands × 4 rows, P(candidate) at j=0.5 per band = j^4; the
    // planted dups sit at j≈0.97 so recall is ~1; precision is exact
    // because candidates are verified.
    val exact = DedupOps.ngramJaccard(spark, dir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLsh(spark, dir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty)
  }

  test("simhash of near-duplicate documents has small hamming distance") {
    val sim = DedupOps.simhash(spark, dir)
    val pairs = DedupOps.ngramJaccard(spark, dir).select("d1", "d2")
    val s1 = sim.withColumnRenamed("doc_id", "d1").withColumnRenamed("simhash", "h1")
    val s2 = sim.withColumnRenamed("doc_id", "d2").withColumnRenamed("simhash", "h2")
    val ham = pairs.join(s1, "d1").join(s2, "d2")
      .select(bit_count(expr("h1 ^ h2")).as("ham")).collect().map(_.getInt(0))
    assert(ham.nonEmpty)
    assert(ham.forall(_ <= 8), s"near-dup hamming distances: ${ham.mkString(",")}")
  }

  test("quality scores are valid basis points") {
    val q = TextOps.qualityScore(spark, dir)
    val bad = q.filter(col("quality_bp") < 0 || col("quality_bp") > 10000 ||
      col("punct_bp") < 0 || col("punct_bp") > 10000 ||
      col("stop_bp") < 0 || col("stop_bp") > 10000).count()
    assert(bad === 0)
    assert(q.count() === 500)
  }

  test("language id predicts a language for every document") {
    val total = TextOps.langId(spark, dir).agg(sum("n")).head().getLong(0)
    assert(total === 500L)
  }

  test("brute kNN returns exactly K ranked neighbors per query") {
    val k = VectorOps.knnBrute(spark, dir)
    val perQuery = k.groupBy("query_id").count().collect()
    assert(perQuery.length === VectorOps.QueryMax)
    assert(perQuery.forall(_.getLong(1) === VectorOps.K))
    // rank 1 neighbor has the max cos_sim of the query's rows
    val r1 = k.filter(col("rank") === 1).select("query_id", "cos_sim")
    val mx = k.groupBy("query_id").agg(max("cos_sim").as("cos_sim"))
    assert(r1.except(mx).count() === 0)
  }

  test("int8 kNN excludes zero vectors instead of emitting NaN ranks (q71)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_knn0_").toString
    val src = spark.read.parquet(s"$dir/embeddings.parquet")
    // inject an all-zero PROBE (id 5 < QueryMax) and an all-zero CORPUS
    // vector (id 9999): both must vanish, none may poison the ranks
    val zeros = Seq((5L, Array.fill(VectorOps.Dim)(0.0f), 0),
                    (9999L, Array.fill(VectorOps.Dim)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding"), col("label").cast("int"))
    src.filter(col("vec_id") =!= 5).unionByName(zeros)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = VectorOps.knnInt8(spark, tmp).collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getLong(0) == 5L), "zero vector must not be a probe")
    assert(!rows.exists(r => r.getLong(1) == 5L || r.getLong(1) == 9999L),
      "zero vectors must not appear as neighbors")
    assert(rows.forall(!_.getDouble(2).isNaN), "no NaN cos_sim")
  }

  test("simhash hamming-band join finds exactly the quadratic near-dup pairs (q73)") {
    val banded = DedupOps.simhashNearDup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sim = DedupOps.simhash(spark, dir)
    val s1 = sim.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val s2 = sim.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val quad = s1.join(s2, col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        expr("CAST(bit_count(h1 ^ h2) AS INT)").as("hd"))
      .filter(col("hd") <= DedupOps.HammingMax)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === quad)
    assert(banded.nonEmpty)
  }

  test("contamination check: basis points valid, eval docs excluded (q75)") {
    val c = DedupOps.contamination(spark, dir)
    val rows = c.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) >= DedupOps.EvalDocMax),
      "eval docs must not appear in the corpus audit")
    rows.foreach { r =>
      val (n, hit, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hit >= 0 && hit <= n, s"doc ${r.getLong(0)}: n_hit $hit of $n")
      assert(bp >= 0 && bp <= 10000, s"doc ${r.getLong(0)}: bp $bp")
      assert(bp === hit * 10000 / n)
    }
    // the planted near-dups that straddle the eval boundary must score
    // as contaminated (their shingle sets overlap the eval set's)
    val boundary = DedupOps.ngramJaccard(spark, dir)
      .filter(col("d1") < DedupOps.EvalDocMax && col("d2") >= DedupOps.EvalDocMax)
      .select("d2").collect().map(_.getLong(0)).toSet
    if (boundary.nonEmpty) {
      val scored = rows.filter(r => boundary(r.getLong(0)))
      assert(scored.forall(_.getLong(3) > 0),
        s"near-dups of eval docs must have contam_bp > 0")
    }
  }

  test("sequence packing partitions all docs and fills bins to capacity (q76)") {
    val bins = TextOps.seqPacking(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(bins.map(_._2).sum === 500L, "every doc lands in exactly one bin")
    assert(bins.map(_._1).toSeq === bins.indices.map(_.toLong), "bins contiguous")
    // every non-terminal bin starts within capacity of its predecessor:
    // a bin's docs span [bin*C, ...) by construction of the prefix sum;
    // check the total token stream cut points are consistent
    val totalTok = bins.map(_._3).sum
    assert(bins.length === (totalTok / TextOps.PackCapacity + 1).toInt ||
           bins.length === (totalTok / TextOps.PackCapacity).toInt,
      s"bin count ${bins.length} inconsistent with $totalTok tokens")
  }

  test("mixture audit cells partition the corpus with sane dedup counts (q77)") {
    val m = TextOps.mixtureAudit(spark, dir).collect()
    assert(m.map(_.getLong(2)).sum === 500L)
    m.foreach { r =>
      assert(r.getLong(5) >= 1 && r.getLong(5) <= r.getLong(2),
        s"n_unique out of range for ${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("repetition score bounds and exact-dup consistency (q78)") {
    val rep = TextOps.repetitionScore(spark, dir).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (pos, dst, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dst >= 1 && dst <= pos, s"doc ${r.getLong(0)}")
      assert(bp >= 0 && bp < 10000, s"doc ${r.getLong(0)}: bp $bp")
    }
  }

  test("repetition rules: bounds, and concentration separates spam from diverse text (q130)") {
    val rules = TextOps.repetitionRules(spark, dir).collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      (1 to 4).foreach { i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) <= 10000,
          s"doc ${r.getLong(0)} col $i out of [0,10000]") }
      assert(r.getLong(5) == 0L || r.getLong(5) == 1L)
    }
    // adversarial corpus: a one-phrase spam doc must trip every rule,
    // a doc of all-distinct tokens must trip none
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rep_").toString
    Seq(
      (1L, Seq.fill(30)("spam").mkString(" "), "en", "srcA"),
      (2L, (1 to 30).map(i => s"tok$i").mkString(" "), "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val adv = TextOps.repetitionRules(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(adv(1L).getLong(1) === 10000L, "spam modal 2-gram share")
    assert(adv(1L).getLong(4) === 10000L, "spam duplicated 5-gram share")
    assert(adv(1L).getLong(5) === 0L, "spam must be dropped")
    assert(adv(2L).getLong(4) === 0L, "distinct doc has no duplicated 5-grams")
    assert(adv(2L).getLong(5) === 1L, "distinct doc must be kept")
  }

  test("PQ kNN returns K ranked neighbors per probe with nonzero recall (q79)") {
    val pq = VectorOps.knnPq(spark, dir)
    val perQuery = pq.groupBy("query_id").count().collect()
    assert(perQuery.length === VectorOps.QueryMax)
    assert(perQuery.forall(_.getLong(1) === VectorOps.KLsh))
    // ADC is approximate: require meaningful agreement with the exact
    // top-K, not identity (recall@KLsh against knnBrute's K=5 list)
    val brute = VectorOps.knnBrute(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = pq.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).count(brute)
    val recall = hits.toDouble / (VectorOps.QueryMax * VectorOps.KLsh)
    assert(recall >= 0.3, s"PQ recall vs exact = $recall")
  }

  test("PQ kNN excludes zero vectors from probes, shortlist, and re-rank (q79)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq0_").toString
    val src = spark.read.parquet(s"$dir/embeddings.parquet")
    val zeros = Seq((7L, Array.fill(VectorOps.Dim)(0.0f), 0),
                    (9999L, Array.fill(VectorOps.Dim)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding"), col("label").cast("int"))
    src.filter(col("vec_id") =!= 7).unionByName(zeros)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = VectorOps.knnPq(spark, tmp).collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getLong(0) == 7L))
    assert(!rows.exists(r => r.getLong(1) == 7L || r.getLong(1) == 9999L))
    assert(rows.forall(!_.getDouble(2).isNaN))
  }

  test("k-means fit: clusters partition the corpus, centroids in data range (q80)") {
    val km = VectorOps.kmeansFit(spark, dir)
    val rows = km.collect()
    assert(rows.length === VectorOps.KmK * VectorOps.Dim)
    // cluster sizes (constant across a cluster's dims) sum to the corpus
    val sizes = rows.map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(sizes.values.sum === 500L)
    // centroids must stay inside the data's convex hull (per-dim ±0.5)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 0.5))
    // Lloyd update must change the seed centroids (data isn't degenerate)
    val seeds = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === VectorOps.KmSeedMin)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0)
    val c1 = rows.filter(_.getInt(0) == 1).sortBy(_.getInt(1)).map(_.getDouble(2))
    assert(!c1.zip(seeds).forall { case (a, b) => a == b })
  }

  test("trained IVF returns K exact-scored neighbors per probe (q81)") {
    val ann = VectorOps.annIvfTrained(spark, dir)
    val perQuery = ann.groupBy("query_id").count().collect()
    assert(perQuery.length === VectorOps.QueryMax)
    assert(perQuery.forall(_.getLong(1) === VectorOps.KLsh))
    // every reported score must equal the brute-force score for that pair
    val brute = VectorOps.knnBrute(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim").as("c2"))
    val joined = ann.select(col("query_id"), col("neighbor_id"), col("cos_sim").as("c1"))
      .join(brute, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("c1") =!= col("c2")).count() === 0)
  }

  test("LSH ANN neighbors are a subset of each query's bucket with exact ranks") {
    val ann = VectorOps.annLsh(spark, dir)
    val brute = VectorOps.knnBrute(spark, dir)
    // every ANN hit must also score identically in the brute ranking
    val joined = ann.select(col("query_id"), col("neighbor_id"), col("cos_sim").as("c1"))
      .join(brute.select(col("query_id"), col("neighbor_id"), col("cos_sim").as("c2")),
        Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("c1") =!= col("c2")).count() === 0)
  }

  test("RP-ANN re-ranks with exact scores; projected shortlist recall measured (q84)") {
    val ann = VectorOps.knnRp(spark, dir).cache()
    val brute = VectorOps.knnBrute(spark, dir)
      .filter(col("rank") <= VectorOps.KLsh).cache()
    // every reported score must equal the brute-force score (re-rank
    // runs in the ORIGINAL space — compression only picks candidates)
    val joined = ann.select(col("query_id"), col("neighbor_id"), col("cos_sim").as("c1"))
      .join(brute.select(col("query_id"), col("neighbor_id"), col("cos_sim").as("c2")),
        Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("c1") =!= col("c2")).count() === 0)
    // recall@3 of the 16-dim shortlist vs the exact top-3 (threshold
    // from the measured value minus margin; see PERF.md ladder)
    val hits = joined.count().toDouble
    val recall = hits / brute.count()
    info(f"RP-ANN recall@3 = $recall%.2f")
    assert(recall >= 0.4, f"recall collapsed: $recall%.2f")
    ann.unpersist(); brute.unpersist()
  }

  test("ingest dedup gate agrees with the global near-dup pair set (q88)") {
    val gate = DedupOps.ingestDedup(spark, dir).cache()
    val global = DedupOps.minhashLsh(spark, dir)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val isNew = (id: Long) => id % DedupOps.IngestMod == DedupOps.IngestMod - 1
    // every dup verdict is a real global near-dup pair with a corpus doc
    val dups = gate.filter(col("verdict") === "dup")
      .select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.nonEmpty)
    dups.foreach { case (nid, cid) =>
      assert(isNew(nid) && !isNew(cid))
      assert(global.contains((math.min(nid, cid), math.max(nid, cid))))
    }
    // every global pair straddling the split convicts its new-side doc
    val straddling = global.collect {
      case (a, b) if isNew(a) ^ isNew(b) => if (isNew(a)) a else b
    }
    val convicted = dups.map(_._1).toSet
    straddling.foreach(nid => assert(convicted.contains(nid)))
    gate.unpersist()
  }

  test("mixture sampling fills each stratum to its token budget (q89)") {
    val sample = TextOps.mixtureSample(spark, dir).cache()
    val audit = TextOps.mixtureAudit(spark, dir)
      .select(col("source"), col("lang"),
        col("n_docs"), col("n_tokens").as("all_tokens"))
    val j = sample.join(audit, Seq("source", "lang")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val kept = r.getAs[Long]("kept_tokens")
      val nKept = r.getAs[Long]("n_kept")
      val allTok = r.getAs[Long]("all_tokens")
      val nDocs = r.getAs[Long]("n_docs")
      // either the budget is (over)filled, or the whole stratum was kept
      assert(kept >= TextOps.TokenBudget || nKept === nDocs,
        s"stratum under budget with docs left: $r")
      // never keeps more than the budget plus one overflowing doc's worth
      assert(nKept <= nDocs && kept <= allTok)
    }
    sample.unpersist()
  }

  test("random projection preserves norms in expectation and is non-degenerate (q83)") {
    val proj = VectorOps.randomProjection(spark, dir).cache()
    assert(proj.count() === 500L * VectorOps.RpK)
    // the embeddings are unit-norm, so E[Σ value²] = 1 per vector (JL);
    // with RpK=16 the per-vector variance is large but the corpus mean
    // concentrates tightly
    val meanSq = proj.groupBy("vec_id")
      .agg(sum(col("value") * col("value")).as("sq"))
      .agg(avg("sq")).head().getDouble(0)
    assert(meanSq > 0.85 && meanSq < 1.15, s"mean squared norm $meanSq")
    // a degenerate (separable) sign matrix collapses output dims onto
    // each other: every projected coordinate must vary across vectors
    val constDims = proj.groupBy("rp_dim")
      .agg(stddev("value").as("sd")).filter(col("sd") < 1e-9).count()
    assert(constDims === 0)
    proj.unpersist()
  }

  test("hash split is a deterministic partition with correct band routing (q97)") {
    val s1 = TextOps.hashSplit(spark, dir).cache()
    assert(s1.count() === 500L)
    // routing: split name follows the bucket bands exactly
    val misrouted = s1.filter(
      (col("bucket") < TextOps.TrainPct && col("split") =!= "train") ||
      (col("bucket") >= TextOps.TrainPct && col("bucket") < TextOps.ValPct
        && col("split") =!= "val") ||
      (col("bucket") >= TextOps.ValPct && col("split") =!= "test")).count()
    assert(misrouted === 0)
    assert(s1.filter(col("bucket") < 0 || col("bucket") >= 100).count() === 0)
    // deterministic: a second independent plan assigns identical splits
    val s2 = TextOps.hashSplit(spark, dir)
    assert(s1.join(s2, Seq("doc_id"))
      .filter(s1("split") =!= s2("split")).count() === 0)
    // all three splits are populated at 500 docs with ~80/10/10 routing
    assert(s1.select("split").distinct().count() === 3)
    s1.unpersist()
  }

  test("decontamination gate ledger partitions the corpus (q94)") {
    val led = DedupOps.decontaminate(spark, dir).cache()
    // every corpus (non-eval) doc is either kept or dropped, none lost
    val total = led.agg(sum(col("n_kept") + col("n_dropped"))).head().getLong(0)
    assert(total === 500L - DedupOps.EvalDocMax)
    // the gate actually fires both ways on the testdata
    assert(led.agg(sum("n_dropped")).head().getLong(0) > 0)
    assert(led.agg(sum("n_kept")).head().getLong(0) > 0)
    // surviving tokens never exceed the corpus total
    val allTokens = graft.tables.Tables.documents(spark, dir)
      .filter(col("doc_id") >= DedupOps.EvalDocMax)
      .agg(sum(size(graft.functions.TextExprs.tokensCol(col("text")))))
      .head().getLong(0)
    assert(led.agg(sum("tokens_kept")).head().getLong(0) <= allTokens)
    led.unpersist()
  }

  test("quality routing: per-language lower median, keep iff >= own stratum's bar (q138)") {
    val rows = TextOps.qualityQuantileRoute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      // one threshold per language, and it IS the lower median
      val medians = docs.map(_._4).distinct
      assert(medians.length === 1)
      val sorted = docs.map(d => (d._3, d._1)).sortBy(identity).map(_._1)
      assert(medians.head === sorted((sorted.length + 1) / 2 - 1))
      // keep flag is exactly the >= comparison; roughly half survive
      docs.foreach(d => assert((d._5 == 1L) === (d._3 >= d._4)))
      val kept = docs.count(_._5 == 1L)
      assert(kept * 2 >= docs.length, "lower median must keep at least half")
    }
  }

  test("matryoshka kNN: K exact-scored ranks per probe, measured recall vs brute (q136)") {
    val mrl = VectorOps.knnMatryoshka(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val perQuery = mrl.groupBy(_._1)
    assert(perQuery.nonEmpty)
    perQuery.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq === (1 to VectorOps.KLsh))
      // ranks ordered by the EXACT full-dim score (re-rank happened)
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // re-rank runs in the ORIGINAL space: every reported score must
    // equal the brute-force score for that (query, neighbor)
    val brute = VectorOps.knnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val scored = mrl.flatMap(t => brute.get((t._1, t._2)).map(b => (t._3, b)))
    assert(scored.forall { case (a, b) => a == b })
    // recall@K of the 16-dim prefix shortlist vs the exact top-K —
    // measured, q84 convention. The corpus is RANDOM synthetic
    // vectors (no MRL training nests the prefix), so this is the
    // recall floor; real Matryoshka embeddings concentrate mass in
    // the prefix by construction.
    val bruteK = VectorOps.knnBrute(spark, dir).collect()
      .filter(_.getInt(3) <= VectorOps.KLsh)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = mrl.count(t => bruteK((t._1, t._2))).toDouble / bruteK.size
    info(f"matryoshka recall@${VectorOps.KLsh} = $recall%.2f")
    assert(recall > 0.0, "prefix shortlist found no true neighbors at all")
  }

  test("star CC equals min-label propagation on the corpus pair graph (q134 vs q72)") {
    val star = DedupOps.dedupClustersStar(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = DedupOps.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.nonEmpty)
    assert(star === prop)
  }

  test("star CC converges in O(log n) rounds on a diameter-199 path (q134)") {
    import spark.implicits._
    // path 0-1-2-...-199: min-label propagation would need ~199 rounds
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("d1", "d2")
    val (map, rounds) = DedupOps.starComponents(pairs)
    val labels = map.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 200)
    assert(labels.values.forall(_ == 0L), "every node must reach the component min")
    assert(rounds <= 12, s"star contraction took $rounds rounds on a 200-node path")
  }

  test("star CC: singleton and two-component graphs label correctly (q134)") {
    import spark.implicits._
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("d1", "d2")
    val (map, _) = DedupOps.starComponents(pairs)
    val labels = map.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("token commonality matches an independent in-memory recomputation (q133)") {
    val got = TextOps.tokenCommonality(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // plain-Scala twin: tokenize (lowercase, strip non-alnum, split),
    // count corpus-wide, price each doc
    val texts = graft.tables.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
    val all = texts.flatMap { case (_, t) => toks(t) }
    val cnt = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = all.length.toLong
    val expected = texts.map { case (id, t) =>
      val tk = toks(t)
      if (tk.isEmpty) id -> ((0L, 0L, 0L, 0L))
      else {
        val freqs = tk.map(cnt)
        val nRare = freqs.count(_ * TextOps.RareMult < total).toLong
        id -> ((tk.length.toLong, freqs.sum, freqs.min,
          nRare * 10000 / tk.length))
      }
    }.toMap
    assert(got === expected)
    // the corpus carries a deliberately rare marker token: the rule
    // must actually separate docs (some rare_bp > 0, never all)
    val bps = got.values.map(_._4)
    assert(bps.exists(_ > 0) && bps.exists(_ == 0))
  }

  test("consensus adjudication is the exact overlay of both signals (q98)") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = pairs(DedupOps.minhashLsh(spark, dir))
    val sh = pairs(DedupOps.simhashNearDup(spark, dir))
    val cons = DedupOps.consensusNearDup(spark, dir).cache()
    assert(pairs(cons.filter(col("signal") === "both")) === (mh intersect sh))
    assert(pairs(cons.filter(col("signal") === "minhash")) === (mh diff sh))
    assert(pairs(cons.filter(col("signal") === "simhash")) === (sh diff mh))
    // sentinel scores only where the signal is absent
    assert(cons.filter(col("signal") === "simhash")
      .filter(col("jaccard") =!= 0.0).count() === 0)
    assert(cons.filter(col("signal") === "minhash")
      .filter(col("hd") =!= -1).count() === 0)
    cons.unpersist()
  }
}
