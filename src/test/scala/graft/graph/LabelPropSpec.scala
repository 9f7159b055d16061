package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q208 label-propagation communities: the distributed fold must
  * bit-match an independent in-memory synchronous replay (same
  * majority/min-tie rule), and on a planted barbell graph the two
  * cliques must resolve to two communities despite the bridge. */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  /** Independent replay: synchronous rounds, majority label among
    * neighbors, tie -> smallest label, isolated nodes keep their own. */
  private def replay(nodes: Seq[Long], edges: Seq[(Long, Long)],
                     rounds: Int): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { n =>
        adj.get(n) match {
          case None => n -> lab(n)
          case Some(ns) =>
            val counts = ns.groupBy(lab).map { case (l, xs) => l -> xs.size }
            val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
            n -> best
        }
      }.toMap
    }
    lab
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    val nodesDf = nodes.toDF("n")
    val e0 = edges.toDF("u", "v")
    val e = e0.unionAll(e0.select(col("v"), col("u")))
      .toDF("u", "v")
    GraphOps.labelPropRounds(() => nodes.toDF("n"), e, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("barbell graph: two cliques stay two communities across the bridge") {
    val cliqueA = (1L to 5L)
    val cliqueB = (11L to 15L)
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = clique(cliqueA) ++ clique(cliqueB) :+ (5L -> 11L)
    val nodes = (cliqueA ++ cliqueB) :+ 99L // 99 isolated
    val got = run(nodes, edges, GraphOps.LabelPropRounds)
    assert(got === replay(nodes, edges, GraphOps.LabelPropRounds))
    // the two cliques carry distinct labels; the isolate is singleton
    val labA = cliqueA.map(got).toSet
    val labB = cliqueB.map(got).toSet
    assert(labA.size === 1 && labB.size === 1 && labA != labB)
    assert(got(99L) === 99L)
  }

  test("distributed fold == in-memory replay on a random-ish graph") {
    // deterministic pseudo-random sparse graph (multiply-mod hash)
    val nodes = (0L until 40L)
    val edges = (for (i <- 0L until 40L; j <- (i + 1) until 40L
                      if ((i * 2654435761L + j * 40503L) % 97) < 9)
      yield (i, j)).toSeq
    val rounds = GraphOps.LabelPropRounds
    assert(run(nodes, edges, rounds) === replay(nodes, edges, rounds))
  }

  test("q208 shape on sf0.001: labels are node ids, sizes consistent") {
    val out = GraphOps.labelProp(spark, "/root/testdata/sf0.001").cache()
    // every node appears exactly once
    assert(out.groupBy("p_partkey").count().filter(col("count") > 1).count() === 0)
    // comm_size is the actual community cardinality
    val sizes = out.groupBy("community").count()
    val bad = out.join(sizes, "community")
      .filter(col("comm_size") =!= col("count")).count()
    assert(bad === 0)
    out.unpersist()
  }
}
