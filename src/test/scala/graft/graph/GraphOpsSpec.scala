package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** Structural invariants for the graph operators on sf0.001 (value
  * correctness vs. DuckDB is covered by the Verify/oracle gate), plus
  * an independent in-memory triangle count oracle. */
class GraphOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("BFS: hop-0 is exactly the seed brand; hops bounded; levels are genuine (q122)") {
    val bfs = GraphOps.graphBfs(spark, dir).cache()
    val seeds = graft.tables.Tables.part(spark, dir)
      .filter(col("p_brand") === GraphOps.BfsSeedBrand)
      .select(col("p_partkey"))
    // hop 0 rows = the seed set, verbatim
    assert(bfs.filter(col("hop") === 0).select(col("p_partkey"))
      .exceptAll(seeds).count() === 0)
    assert(seeds.exceptAll(bfs.filter(col("hop") === 0).select(col("p_partkey")))
      .count() === 0)
    assert(bfs.filter(col("hop") < 0 || col("hop") > GraphOps.BfsMaxHops).count() === 0)
    // each part appears once (min-hop fold is a function of the node)
    assert(bfs.groupBy("p_partkey").count().filter(col("count") > 1).count() === 0)
    bfs.unpersist()
  }

  test("triangle census matches an independent in-memory count (q123)") {
    val row = GraphOps.triangleStats(spark, dir).head()
    val (nEdges, nWedges, nTris, bp) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // independent oracle: collect the (small) sf0.001 edge list and
    // count triangles by adjacency-set intersection
    import spark.implicits._
    val li = graft.tables.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .distinct().as[(Long, Long)].collect()
    assert(nEdges === edges.length.toLong)
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val tris = edges.iterator.map { case (a, b) =>
      (adj(a) & adj(b)).size.toLong
    }.sum / 3 // each triangle counted once per edge
    assert(nTris === tris)
    // n_wedges must be the TRUE wedge count Σ C(deg, 2), not the
    // (smaller) oriented count of the enumeration pass
    val trueWedges = adj.valuesIterator
      .map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(nWedges === trueWedges)
    assert(bp === 3L * nTris * 10000L / nWedges)
    // with the true denominator the GCC cannot exceed 10000 bp
    assert(bp >= 0L && bp <= 10000L)
  }

  test("DOULION estimate: deterministic sample, exact 1/p^3 scale-up, bound holds (q128)") {
    import spark.implicits._
    val row = GraphOps.triangleEstimate(spark, dir).head()
    val (exact, est, within) = (row.getLong(0), row.getLong(1), row.getInt(2))
    assert(within === 1, s"estimator bound failed: exact=$exact est=$est")
    // independent oracle: thin the in-memory edge list with the same
    // hash and count triangles by adjacency intersection — the operator
    // must report exactly 8x that count
    val li = graft.tables.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .distinct().as[(Long, Long)].collect()
    def keep(pa: Long, pb: Long): Boolean = {
      val h1 = (pa * GraphOps.TriSampleP1 + pb) % GraphOps.TriSampleM
      val h  = h1 * GraphOps.TriSampleP2 % GraphOps.TriSampleM
      h % GraphOps.TriSampleMod < GraphOps.TriSampleKeep
    }
    val sampled = edges.filter((keep _).tupled)
    // the sample must be a genuine thinning, not all-or-nothing
    assert(sampled.length > 0 && sampled.length < edges.length)
    val adj = sampled.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val sampledTris = sampled.iterator.map { case (a, b) =>
      (adj(a) & adj(b)).size.toLong
    }.sum / 3
    assert(est === 8L * sampledTris)
  }

  test("closure_bp is the genuine GCC: a K3 reads exactly 10000 bp") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_graph_k3_").toString
    // one order with 3 parts → triangle 10-11-12; 3 edges, 3 wedges, 1 triangle
    Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 10L), (1L, 11L), (1L, 12L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val t = GraphOps.triangleStats(spark, tmp).head()
    assert((t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3)) ===
      ((3L, 3L, 1L, 10000L)))
  }

  test("pagerank: leaky-integer invariants — base floor, bounded total, dangling = base (q124)") {
    val pr = GraphOps.pageRank(spark, dir).cache()
    val base = 15L * GraphOps.PageRankInitMass / 100L
    val nParts = graft.tables.Tables.part(spark, dir).count()
    assert(pr.count() === nParts)
    assert(pr.filter(col("mass") < base).count() === 0)
    // integer truncation only loses mass: total never exceeds the input
    assert(pr.agg(sum(col("mass"))).head().getLong(0) <=
      nParts * GraphOps.PageRankInitMass)
    // a part in no co-purchase edge keeps exactly the teleport base
    import spark.implicits._
    val li = graft.tables.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val connected = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") =!= col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p"), col("b.l_partkey").as("q"))
      .count().filter(col("count") >= 2).select(col("p")).distinct()
    // a part in no co-purchase edge keeps exactly the teleport base
    // (vacuous on a corpus where every part is connected, e.g. sf0.001);
    // connected parts must strictly beat it
    val dangling = pr.join(connected, pr("p_partkey") === connected("p"), "left_anti")
    assert(dangling.filter(col("mass") =!= base).count() === 0)
    val linked = pr.join(connected, pr("p_partkey") === connected("p"), "left_semi")
    assert(linked.count() > 0)
    assert(linked.filter(col("mass") <= base).count() === 0)
    pr.unpersist()
  }

  test("degenerate corpus (single-part orders → edgeless graph): no ANSI /0, sane zeros") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_graph_degen_").toString
    Seq((1L, 10L), (2L, 11L), (3L, 12L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq((10L, "a", GraphOps.BfsSeedBrand), (11L, "b", "Brand#9"), (12L, "c", "Brand#9"))
      .toDF("p_partkey", "p_name", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val t = GraphOps.triangleStats(spark, tmp).head()
    assert((t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3)) === ((0L, 0L, 0L, 0L)))
    val bfs = GraphOps.graphBfs(spark, tmp).collect()
    assert(bfs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set(10L -> 0L))
    val pr = GraphOps.pageRank(spark, tmp).collect()
    val base = 15L * GraphOps.PageRankInitMass / 100L
    assert(pr.length === 3 && pr.forall(_.getLong(1) === base))
  }

  test("triangle closure pass is broadcast-joined, never sort-merge (q123)") {
    val plan = GraphOps.triangleStats(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      s"wedge stream must not be sorted:\n$plan")
  }
}
