package graft.vector

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tools.RecallProbe

/** The ANN retrieval-quality ledger. The DuckDB oracles pin each
  * family's COMPUTATION (both engines run the same candidate
  * generation), so a recall regression — candidates silently getting
  * worse, the round-7 MinHash coefficient bug's failure class — would
  * stay oracle-green. This spec closes that hole two ways:
  *
  * 1. FLOORS on the gate corpus: recall@KLsh vs the exact q24 ranking,
  *    asserted per family at measured-minus-margin. The corpus is
  *    deliberately hard — near-isotropic (mean pairwise cos ≈ 0.0006,
  *    true top-3 ≈ 0.35 vs a bulk right tail of the same magnitude),
  *    so recall is information-bounded by the scan fraction; the
  *    measured ladder (PERF.md) is the honest statement of that trade.
  *
  * 2. A PLANTED-CLUSTER corpus where real retrieval structure exists
  *    (10 tight clusters, within-cluster cos ≈ 0.9, cross ≈ 0): every
  *    family must achieve HIGH recall there with the same constants.
  *    An operator bug (broken bucketing, collapsed projection,
  *    degenerate codebook) fails this hard floor even if the isotropic
  *    floor happens to survive. */
class VectorRecallSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  /** Floors on the isotropic gate corpus (deterministic given
    * code+data; measured values minus a 0.05–0.10 margin so a genuine
    * regression trips but an innocuous tie-shuffle does not). */
  private val isotropicFloors = Seq(
    ("q25_lsh", 0.15), ("q35_ivf", 0.20), ("q79_pq", 0.55),
    ("q81_ivf_trained", 0.70), ("q84_rp", 0.45), ("q136_matryoshka", 0.45),
    ("q252_graph", 0.80))

  test("isotropic corpus: every ANN family clears its measured recall floor") {
    val fams = RecallProbe.families(spark, dir).toMap
    val measured = isotropicFloors.map { case (name, floor) =>
      val r = RecallProbe.recallAt(spark, dir, fams(name))
      assert(r >= floor, f"$name recall@${VectorOps.KLsh} = $r%.3f < floor $floor")
      f"$name=$r%.3f"
    }
    info("recall@3 (isotropic): " + measured.mkString(" "))
  }

  // ---------------------------------------------------------------- planted

  /** Deterministic planted-cluster embeddings: 500 vectors, 10 clusters
    * interleaved by vec_id % 10 (so the PQ seed range [20,36) and the
    * k-means seed range [40,56) each span all clusters), center entries
    * ±1/8 by a splitmix-style hash, member = center + U[-0.08, 0.08]
    * noise. Within-cluster cosine ≈ 0.9, cross-cluster ≈ 0. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def u01(z: Long): Double = (mix(z) >>> 11).toDouble / (1L << 53).toDouble

  private lazy val plantedDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_recall_").toString
    import spark.implicits._
    val rows = (0 until 500).map { id =>
      val c = id % 10
      val v = (0 until VectorOps.Dim).map { d =>
        val center = if (mix(c * 1000003L + d) % 2 == 0) 0.125 else -0.125
        val noise = (u01(id * 131071L + d) - 0.5) * 0.16
        (center + noise).toFloat
      }.toArray
      (id.toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding"), col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("planted clusters separate: within-cluster cos ~0.9, cross ~0") {
    val e = spark.read.parquet(s"$plantedDir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.NativeExprs.dotProduct(col("v"), col("v"))))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") < 40)
      .select((col("a.label") === col("b.label")).as("same"),
        (graft.functions.NativeExprs.dotProduct(col("a.v"), col("b.v"))
          / (col("a.nrm") * col("b.nrm"))).as("cs"))
    val stats = pairs.groupBy("same").agg(avg("cs").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(stats(true) > 0.8, s"within-cluster cos ${stats(true)}")
    assert(math.abs(stats(false)) < 0.15, s"cross-cluster cos ${stats(false)}")
  }

  test("planted clusters: every ANN family achieves high recall with unchanged constants") {
    val fams = RecallProbe.families(spark, plantedDir).toMap
    // LSH floor is lower: at within-cluster cos ≈ 0.9 the expected
    // signature distance is ~8·(0.29/π) ≈ 1.2 bits, so Hamming≤2
    // multi-probe recovers most but not all same-cluster neighbors.
    // the graph floor is 0.80: within a 50-member cluster all mates are
    // near-ties (cos ≈ 0.9 ± noise), so the exact top-3 among them is
    // noise-ranked and a beam of 16 < cluster size keeps most but not
    // all of the tie set (measured 0.867)
    val floors = Seq(
      ("q25_lsh", 0.70), ("q35_ivf", 0.90), ("q79_pq", 0.90),
      ("q81_ivf_trained", 0.90), ("q84_rp", 0.90), ("q136_matryoshka", 0.90),
      ("q252_graph", 0.80))
    val measured = floors.map { case (name, floor) =>
      val r = RecallProbe.recallAt(spark, plantedDir, fams(name))
      assert(r >= floor, f"$name planted recall = $r%.3f < floor $floor")
      f"$name=$r%.3f"
    }
    info("recall@3 (planted): " + measured.mkString(" "))
  }
}
