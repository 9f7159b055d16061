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

  test("probe separates the two geometries with margin and routes accordingly") {
    val org = graft.tables.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val (mu2Org, routeOrg) = VectorOps.geometryProbeOn(org)
    assert(routeOrg == "ivf", s"organic routed $routeOrg (mu2=$mu2Org)")
    // measured 1.046–1.050 on every organic corpus from 500 to 200k
    // vectors; the threshold 1.1487 sits ≥ 0.09 above
    assert(mu2Org < VectorOps.RouterMu2Threshold - 0.05,
      s"organic margin collapsed: $mu2Org vs ${VectorOps.RouterMu2Threshold}")

    val router = VectorOps.annRouter(spark, dir).cache()
    val byCorpus = router.select("corpus", "route").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byCorpus == Map("organic" -> "ivf", "lowdim" -> "graph"),
      s"unexpected routes: $byCorpus")
    val mu2Low = router.filter(col("corpus") === "lowdim")
      .select("mu2_med").distinct().collect().head.getDouble(0)
    assert(mu2Low > VectorOps.RouterMu2Threshold + 0.05,
      s"lowdim margin collapsed: $mu2Low")

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
