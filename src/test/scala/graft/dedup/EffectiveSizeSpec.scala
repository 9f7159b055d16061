package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.vector.VectorOps

/** q190/q191 pins the oracle gate cannot see. */
class EffectiveSizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("q190: double-rank-1 consensus wins the fusion; lists are full") {
    val fused = VectorOps.rrfFusion(spark, dir).collect()
    val byQuery = fused.groupBy(_.getLong(0))
    assert(byQuery.size > 1)
    byQuery.foreach { case (q, rs) =>
      assert(rs.length === VectorOps.RrfOut, s"query $q list short")
      // scores non-increasing down the fused ranking
      rs.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(hi, lo) => assert(hi.getLong(3) >= lo.getLong(3), s"query $q")
        case _ => ()
      }
    }
    assert(fused.exists(_.getLong(4) == 1L), "no consensus neighbors at all")
    // a neighbor at rank 1 in BOTH lists scores 2·(10⁶ div 61) — the
    // maximum — and must be fused rank 1
    val maxScore = 2L * (1000000L / (VectorOps.RrfDamp + 1))
    fused.filter(_.getLong(3) == maxScore)
      .foreach(r => assert(r.getLong(1) === 1L, s"max-score row not rank 1: $r"))
  }

  test("q191: cluster-mass identity and a populated discount") {
    val rows = EffectiveSize.effectiveSize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, eff, disc) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(c <= n)
      assert(eff <= 1000000L * n)
      assert(disc >= 0L && disc < 10000L)
    }
    assert(rows.exists(_.getLong(4) > 0L), "no language shows any dedup discount")
    // global identity: Σ per-doc weights ≈ 10⁶ · global clusters
    // (exact up to the integer-division remainder per cluster)
    val pairs = DedupOps.minhashLsh(spark, dir).select("d1", "d2")
    val clusters = DedupOps.starComponents(pairs)._1
    val docs = graft.tables.Tables.documents(spark, dir).select("doc_id")
    val reps = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("rep_id"), col("doc_id")))
    val nClusters = reps.select("rep").distinct().count()
    val nDocs = docs.count()
    val effSum = rows.map(_.getLong(3)).sum
    assert(effSum <= 1000000L * nClusters)
    assert(effSum >= 1000000L * nClusters - nDocs)
  }
}
