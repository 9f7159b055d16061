package graft.vector

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** Structural invariants of the q252 graph-ANN operator that the
  * recall floors (VectorRecallSpec) and the oracle hash cannot see:
  *
  *  - BOUNDED DEGREE: the refined kNN edge table keeps at most
  *    [[VectorOps.NswM]] out-edges per node — the property that bounds
  *    every build round at N·(M+RevCap)² candidate rows and makes the
  *    2-hop self-join safe at 100 TB (an uncapped hub turns it
  *    quadratic).
  *  - OUTPUT CONTRACT: exactly KLsh ranked neighbors per query, the
  *    query itself never among them (the honest out-of-corpus search
  *    model — the walk may visit the query's node but must not emit
  *    it).
  *  - DETERMINISM: two independent builds produce identical output —
  *    the property the cross-engine oracle depends on (rounded-cosine
  *    ranks, id tie-breaks, hash-chained init). */
class GraphAnnSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("refined kNN graph keeps at most NswM out-edges per node") {
    val deg = VectorOps
      .devBuildGraph(spark, dir, VectorOps.NswM, VectorOps.NswBuildRounds)
      .groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d"), min("d")).collect().head
    assert(deg.getLong(0) <= VectorOps.NswM,
      s"max out-degree ${deg.getLong(0)} > NswM ${VectorOps.NswM}")
    assert(deg.getLong(1) >= 1L)
  }

  test("beam search emits exactly KLsh non-self neighbors per query, ranked") {
    val out = VectorOps.annGraph(spark, dir).cache()
    val perQ = out.groupBy("query_id").agg(
      count(lit(1)).as("n"),
      sum(when(col("neighbor_id") === col("query_id"), 1).otherwise(0)).as("selfs"),
      max("rank").as("maxr"), min("rank").as("minr")).collect()
    assert(perQ.length == VectorOps.QueryMax)
    perQ.foreach { r =>
      assert(r.getLong(1) == VectorOps.KLsh, s"query ${r.get(0)}: ${r.getLong(1)} rows")
      assert(r.getLong(2) == 0L, s"query ${r.get(0)} returned itself")
      assert(r.getInt(4) == 1 && r.getInt(3) == VectorOps.KLsh)
    }
    out.unpersist()
  }

  test("two independent runs are bit-identical (the oracle's premise)") {
    val a = VectorOps.annGraph(spark, dir)
      .orderBy("query_id", "rank").collect().toSeq
    val b = VectorOps.annGraph(spark, dir)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
  }
}
