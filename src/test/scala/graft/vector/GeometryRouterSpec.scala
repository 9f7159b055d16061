package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** The q253 geometry router's probe and routing, pinned at gate SF:
  * the 2NN intrinsic-dimension statistic must separate the two
  * diagnostic geometries with real margin (the statistic is
  * sample-size-invariant — Facco et al.'s μ ratio is Pareto(d) at any
  * sampling density — so the gate-SF values are the 200k values; the
  * 100× protocol asserts the same routes on the 200k corpora), and
  * the routed output must equal the selected index's own output —
  * the router adds routing, never a different search. */
class GeometryRouterSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.get

  test("probe separates the three geometries with margin and routes accordingly") {
    val org = graft.tables.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val (mu2Org, c1Org, routeOrg) = VectorOps.geometryProbeOn(org)
    assert(routeOrg == "ivf", s"organic routed $routeOrg (mu2=$mu2Org)")
    // measured 1.046–1.050 on every organic corpus from 500 to 200k
    // vectors; the threshold 1.1487 sits ≥ 0.09 above
    assert(mu2Org < VectorOps.RouterMu2Threshold - 0.05,
      s"organic margin collapsed: $mu2Org vs ${VectorOps.RouterMu2Threshold}")
    // c1 margin: organic nearest-cosine median sits far below the
    // clustered threshold (isotropic max-of-noise, ~0.29–0.36·10⁴)
    assert(c1Org <= VectorOps.RouterC1Threshold - 2000,
      s"organic c1 margin collapsed: $c1Org vs ${VectorOps.RouterC1Threshold}")

    val router = VectorOps.annRouter(spark, dir).cache()
    val byCorpus = router.select("corpus", "route").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byCorpus == Map("organic" -> "ivf", "lowdim" -> "graph",
      "clustered" -> "ivf_cells"),
      s"unexpected routes: $byCorpus")
    val mu2Low = router.filter(col("corpus") === "lowdim")
      .select("mu2_med").distinct().collect().head.getDouble(0)
    assert(mu2Low > VectorOps.RouterMu2Threshold + 0.05,
      s"lowdim margin collapsed: $mu2Low")
    // clustered margins: μ² flat (stays on the IVF side of the
    // dimension threshold), c1 high (in-cluster cosine ≈ 0.88·10⁴)
    val cluRow = router.filter(col("corpus") === "clustered")
      .select("mu2_med", "c1_med").distinct().collect().head
    assert(cluRow.getDouble(0) < VectorOps.RouterMu2Threshold - 0.05,
      s"clustered mu2 margin collapsed: ${cluRow.getDouble(0)}")
    assert(cluRow.getLong(1) >= VectorOps.RouterC1Threshold + 2000,
      s"clustered c1 margin collapsed: ${cluRow.getLong(1)}")

    // routed organic output ≡ the trained-IVF index's own output
    val routed = router.filter(col("corpus") === "organic")
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .collect().map(_.toSeq).toSet
    val direct = VectorOps.annIvfTrainedOn(
        org.filter(col("vec_id") < VectorOps.RouterCap),
        VectorOps.IvfTK, VectorOps.NProbeTrained)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .collect().map(_.toSeq).toSet
    assert(routed == direct, "router diverged from the selected index")
    router.unpersist()
  }
}
