package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q219 skyline: the two-phase (bucket-prune + range-window sweep)
  * front must equal a quadratic dominance replay on planted and
  * pseudo-random point sets, including ties on either axis. */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def quad(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, q, t) =>
      !pts.exists { case (_, q2, t2) =>
        q2 >= q && t2 >= t && (q2 > q || t2 > t)
      }
    }.toSet

  private def run(pts: Seq[(Long, Long, Long)]): Seq[(Int, Long, Long, Long)] = {
    import spark.implicits._
    TextOps.skylineOf(pts.toDF("doc_id", "quality_bp", "n_tokens"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("planted front with ties survives; dominated points drop") {
    // front: (9000,10), (8000,30), (5000,50) + a duplicate of the
    // middle point (ties on both axes keep BOTH); everything else is
    // dominated, including a same-quality-shorter and a cross-bucket case
    val pts = Seq(
      (1L, 9000L, 10L), (2L, 8000L, 30L), (3L, 5000L, 50L),
      (4L, 8000L, 30L),             // exact tie of 2 -> kept
      (5L, 8000L, 20L),             // same q, fewer tokens -> dominated
      (6L, 4900L, 50L),             // dominated by 3 (cross-bucket)
      (7L, 100L, 5L))               // dominated by everything
    val got = run(pts)
    assert(got.map(r => (r._2, r._3, r._4)).toSet ===
      quad(pts).map { case (id, q, t) => (id, q, t) })
    assert(got.map(_._2).toSet === Set(1L, 2L, 3L, 4L))
    // ranks dense from 1 in (q desc, t desc, id) order
    assert(got.sortBy(_._1).map(_._1).toSeq === (1 to got.length).toSeq)
  }

  test("pseudo-random set: two-phase == quadratic replay") {
    val pts = (0L until 400L).map { i =>
      val q = (i * 2654435761L) % 10000
      val t = (i * 40503L + 17) % 200
      (i, q, t)
    }
    val got = run(pts).map(r => (r._2, r._3, r._4)).toSet
    assert(got === quad(pts).map { case (id, q, t) => (id, q, t) })
  }
}
