package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Round-9 additions: personalized PageRank (q245), mixture
  * importance weights + effective sample size (q246). */
class Round9lOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("q245: seeds carry at least the teleport base; proximity mass is deterministic") {
    val rows = graft.graph.GraphOps.pprBrand(spark, dir).collect()
    assert(rows.nonEmpty)
    val nParts = graft.tables.Tables.part(spark, dir).count()
    assert(rows.length === nParts)
    val base = 15L * graft.graph.GraphOps.PageRankInitMass / 100L
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L)
      if (r.getLong(1) === 1L) assert(r.getLong(2) >= base)
    }
    assert(rows.exists(_.getLong(1) === 1L))
    // mass flows beyond the seeds through the co-purchase graph
    assert(rows.exists(r => r.getLong(1) === 0L && r.getLong(2) > 0L))
    // but non-seeds get no teleport floor: some sit below the seed base
    assert(rows.exists(r => r.getLong(1) === 0L && r.getLong(2) < base))
    val again = graft.graph.GraphOps.pprBrand(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(2)).toMap === again)
  }

  test("q246: hand plans — uniform weights give full ESS, one-source plans give its mass") {
    import spark.implicits._
    val uniform = Seq(("A", 100L, 50L), ("B", 100L, 50L))
      .toDF("source", "avail", "alloc")
    val u = graft.text.MixturePlan.essOfAllocation(uniform).collect()
    u.foreach { r =>
      assert(r.getLong(3) === 500000L)
      assert(r.getLong(5) === 200L)        // ESS = all tokens under uniform w
      assert(r.getLong(6) === 1000000L)
    }
    val skew = Seq(("A", 100L, 100L), ("B", 100L, 0L))
      .toDF("source", "avail", "alloc")
    val s = graft.text.MixturePlan.essOfAllocation(skew).collect()
    s.foreach { r =>
      assert(r.getLong(5) === 100L)        // only A's tokens count
      assert(r.getLong(6) === 500000L)
    }
  }

  test("q246: sf corpus — weights bounded, capped sources at full weight, ESS within total") {
    val rows = graft.text.MixturePlan.mixtureEss(spark, dir).collect()
    assert(rows.nonEmpty)
    val plan = graft.text.MixturePlan.mixtureWaterfill(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val tTotal = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
      if (plan(r.getString(0)) === 1L) assert(r.getLong(3) === 1000000L)
      assert(r.getLong(5) > 0L && r.getLong(5) <= tTotal)
      assert(r.getLong(6) > 0L && r.getLong(6) <= 1000000L)
    }
  }

  test("q247: the streamed diversity ledger equals the batch q233 ledger row-for-row") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val batch = graft.text.TextOps.mixtureDiversity(spark, dir)
      .collect().map(key).sortBy(_.toString)
    val stream = graft.text.TextOps.mixtureDiversityStream(spark, dir)
      .collect().map(key).sortBy(_.toString)
    assert(stream.nonEmpty)
    assert(stream.toSeq === batch.toSeq)
  }

  test("q248: Good-Turing ledger — identities hold, singletons bounded by vocabulary") {
    val rows = graft.text.TextOps.goodTuring(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v, f1, f2) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(v <= n)                       // counts are >= 1
      assert(f1 + f2 <= v)
      assert(r.getLong(5) === f1 * 1000000L / n)
      assert(r.getLong(6) === f2 * 2L * 1000000L / n)
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
    }
    // the synthetic corpus draws from fixed generators, so every token
    // may repeat — the ledger itself must still be populated
    assert(rows.map(_.getLong(2)).sum > 0L)
  }
}
