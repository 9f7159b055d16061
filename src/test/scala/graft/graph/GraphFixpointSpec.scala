package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** Convergence-gated graph iteration (VERDICT r5 task 3): the
  * statically-unrolled K-round forms are correct for fixed-K query
  * semantics but silently under-label a graph of diameter > K; the
  * fixpoint forms must label exactly and terminate. */
class GraphFixpointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Undirected path 0 — 1 — … — n-1 as a symmetric (u, v) edge list. */
  private def pathEdges(n: Int): DataFrame = {
    val half = (0L until (n - 1).toLong).map(i => (i, i + 1))
    (half ++ half.map(_.swap)).toDF("u", "v")
  }

  private def seeds0: DataFrame = Seq((0L, 0L)).toDF("n", "hop")

  test("unrolled-K BFS under-labels a path of diameter > K; the fixpoint labels it fully") {
    val n = 10 // diameter 9 > BfsMaxHops = 3
    val e = pathEdges(n)
    // maxRounds = K reproduces exactly the unrolled form's reach
    val unrolled = GraphOps.bfsFixpoint(e, seeds0, maxRounds = GraphOps.BfsMaxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unrolled.size === GraphOps.BfsMaxHops + 1,
      "the capped form should reach only K+1 nodes on a path")
    val full = GraphOps.bfsFixpoint(e, seeds0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full === (0 until n).map(i => i.toLong -> i.toLong).toMap,
      "fixpoint BFS must label node i with hop i on the path")
  }

  test("fixpoint BFS terminates on a cycle (frontier empties once all nodes are visited)") {
    val n = 8
    val half = (0L until n.toLong).map(i => (i, (i + 1) % n))
    val e = (half ++ half.map(_.swap)).toDF("u", "v")
    val full = GraphOps.bfsFixpoint(e, seeds0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ring of 8: hops 0,1,2,3,4,3,2,1
    val want = (0 until n).map(i => i.toLong -> math.min(i, n - i).toLong).toMap
    assert(full === want)
  }

  test("fixpoint BFS with unreachable component emits no row for it") {
    val e = pathEdges(4).unionAll(Seq((100L, 101L), (101L, 100L)).toDF("u", "v"))
    val full = GraphOps.bfsFixpoint(e, seeds0)
      .collect().map(r => r.getLong(0)).toSet
    assert(full === Set(0L, 1L, 2L, 3L))
  }

  test("fixpoint PageRank converges: one extra round moves no node by more than tol") {
    val e = pathEdges(6)
    def nodes: DataFrame = (0L until 6L).toDF("n")
    val tol = 50L
    val mass = GraphOps.pageRankFixpoint(nodes, e, tolMicro = tol)
    // re-derive one more round by hand and compare
    val deg = e.groupBy(col("u").as("n")).agg(count(lit(1)).as("deg"))
    val incoming = mass.join(deg, "n")
      .select(col("n"), expr("mass div deg").as("share"))
      .join(e, col("n") === col("u"))
      .groupBy(col("v")).agg(sum(col("share")).as("in_mass"))
    val base = 15L * GraphOps.PageRankInitMass / 100L
    val next = nodes.join(incoming, col("n") === col("v"), "left")
      .select(col("n"), (lit(base) + expr("85 * coalesce(in_mass, 0L) div 100")).as("mass"))
    val delta = next.as("a").join(mass.as("b"), "n")
      .agg(max(abs(col("a.mass") - col("b.mass")))).collect()(0).getLong(0)
    assert(delta <= tol, s"claimed converged but one more round moved a node by $delta")
    // path graph symmetry must survive the integer dynamics
    val m = mass.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) === m(5L) && m(1L) === m(4L) && m(2L) === m(3L))
  }

  test("q127 converged BFS subsumes q122's capped labels on the bench corpus") {
    val dir = "/root/testdata/sf0.001"
    val capped = GraphOps.graphBfs(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = GraphOps.graphBfsConverged(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // converged ⊇ capped, agreeing wherever the cap reached
    capped.foreach { case (n, hop) =>
      assert(full.get(n).contains(hop), s"node $n: capped=$hop full=${full.get(n)}")
    }
    assert(full.size >= capped.size)
    // and its eccentricity premise for the recursive oracle holds
    assert(full.values.max < GraphOps.BfsOracleHopBound)
  }
}
