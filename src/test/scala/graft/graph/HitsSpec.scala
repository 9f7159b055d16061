package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q224 HITS: the distributed mutual-reinforcement rounds must equal
  * an in-memory replay of the same exact-integer recurrence over the
  * collected edge list, and the renormalization contract must hold
  * (scores in [0, 10⁶], the max exactly 10⁶). */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private def replay(edges: Seq[(Long, Long)], parts: Seq[Long],
                     custs: Seq[Long]): Map[Long, Long] = {
    val byCust = edges.groupBy(_._1)
    val byPart = edges.groupBy(_._2)
    def renorm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = math.max(m.values.max, 1L)
      m.map { case (k, v) => k -> (v * GraphOps.HitsScale) / mx }
    }
    var auth = parts.map(_ -> GraphOps.HitsScale).toMap
    for (_ <- 1 to GraphOps.HitsRounds) {
      val hub = renorm(custs.map(c =>
        c -> byCust.getOrElse(c, Nil).map(e => auth(e._2)).sum).toMap)
      auth = renorm(parts.map(p =>
        p -> byPart.getOrElse(p, Nil).map(e => hub(e._1)).sum).toMap)
    }
    auth
  }

  test("q224: distributed auth scores == in-memory integer replay") {
    val edges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val parts = Tables.part(spark, dir).select("p_partkey")
      .collect().map(_.getLong(0)).toSeq
    val custs = Tables.customer(spark, dir).select("c_custkey")
      .collect().map(_.getLong(0)).toSeq

    val got = GraphOps.hits(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = replay(edges, parts, custs)
    val deg = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    assert(got.length === parts.length)
    got.foreach { case (p, auth, nBuyers) =>
      assert(auth === want(p), s"part $p auth")
      assert(nBuyers === deg.getOrElse(p, 0L), s"part $p degree")
    }
    assert(got.map(_._2).max === GraphOps.HitsScale, "max auth != scale")
    assert(got.forall(r => r._2 >= 0L && r._2 <= GraphOps.HitsScale))
  }
}
