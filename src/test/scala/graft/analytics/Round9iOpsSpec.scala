package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date
import graft.etl.SparkTestSession

/** Round-9 additions: RFM segmentation (q240), vector quality
  * profile (q241). */
class Round9iOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("q240: planted cohort — every customer lands on the (i,i,i) diagonal") {
    import spark.implicits._
    // customer i: i orders on day base+i at price i —
    // freq, monetary, and recency ranks all equal i
    val base = Date.valueOf("2024-01-01").toLocalDate
    val rows = for {
      i <- 1 to 5; _ <- 1 to i
    } yield (i.toLong, Date.valueOf(base.plusDays(i)), i.toDouble)
    val out = Relational.rfmOfOrders(rows.toDF("o_custkey", "o_orderdate", "o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r).toMap
    assert(out.size === 5)
    (1 to 5).foreach { i =>
      val r = out((i.toLong, i.toLong, i.toLong))
      assert(r.getLong(3) === 1L)
      assert(r.getLong(4) === i.toLong * i * 100L)
    }
  }

  test("q240: sf corpus — 125-grid bounds, customer conservation, monotone monetary") {
    val rows = Relational.rfmSegments(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(0, 1, 2).foreach(i => assert(r.getLong(i) >= 1L && r.getLong(i) <= 5L))
      assert(r.getLong(3) > 0L)
    }
    val nCust = graft.tables.Tables.orders(spark, dir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum === nCust)
    // monetary score 5 cells hold more money per customer than score 1 cells
    val hi = rows.filter(_.getLong(2) === 5L)
    val lo = rows.filter(_.getLong(2) === 1L)
    assert(hi.map(_.getLong(4)).sum / hi.map(_.getLong(3)).sum >
           lo.map(_.getLong(4)).sum / lo.map(_.getLong(3)).sum)
  }

  test("q241: hand-built vectors — zero, duplicate, and percentile ledgers exact") {
    import spark.implicits._
    val emb = Seq(
      (1, Seq(0.0f, 0.0f)), (1, Seq(0.5f, 0.5f)),
      (1, Seq(0.5f, 0.5f)), (1, Seq(1.0f, 0.0f)))
      .toDF("label", "embedding")
    val r = graft.vector.VectorOps.vectorProfileOf(emb).collect().head
    assert(r.getLong(1) === 4L && r.getLong(2) === 2L)
    assert(r.getLong(3) === 1L)                       // one zero vector
    assert(r.getLong(4) === 50000000L)                // p50 norm2: 2*(5000^2)
    assert(r.getLong(5) === 100000000L)               // p95: 10000^2
    assert(r.getLong(6) === 2L && r.getLong(7) === 1L) // dup pair, excess 1
  }

  test("q241: sf corpus — widths constant, ledgers bounded, percentiles ordered") {
    val rows = graft.vector.VectorOps.vectorProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).distinct.length === 1) // one embedding width
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(1))
      assert(r.getLong(4) <= r.getLong(5))
      assert(r.getLong(7) <= r.getLong(6))
      assert(r.getLong(6) <= r.getLong(1))
    }
  }
}
