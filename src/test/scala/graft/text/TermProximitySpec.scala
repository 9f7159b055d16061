package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q220 term proximity: the distributed running-max sweep must produce
  * the true minimal cover span — checked against a brute-force
  * all-windows replay over the sf0.001 page docs. */
class TermProximitySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  private def tokenize(s: String): Vector[String] =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").filter(_.nonEmpty).toVector

  /** Brute force: minimal window [i, j] whose token set covers all
    * query terms (None if some term is absent). */
  private def minSpan(tokens: Vector[String], terms: Set[String]): Option[Long] = {
    val positions = tokens.zipWithIndex.filter(t => terms(t._1))
    if (positions.map(_._1).toSet != terms) None
    else Some((for {
      i <- positions.indices
      j <- i until positions.length
      if positions.slice(i, j + 1).map(_._1).toSet == terms
    } yield (positions(j)._2 - positions(i)._2 + 1).toLong).min)
  }

  test("sweep span == brute-force minimal cover on every page doc") {
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> tokenize(r.getString(1))).toMap
    val out = SearchOps.termProximity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    val qmap = SearchOps.Bm25Queries.toMap
    out.foreach { case (qid, _, docId, _, hasAll, span) =>
      val want = minSpan(docs(docId), qmap(qid).toSet)
      assert(hasAll === (if (want.isDefined) 1L else 0L),
        s"q$qid doc$docId has_all")
      assert(span === want.getOrElse(0L), s"q$qid doc$docId span")
    }
    // rerank ordering: has_all desc, span asc among present
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2).toSeq
      sorted.sliding(2).foreach {
        case Seq(x, y) =>
          assert(x._5 > y._5 ||
            (x._5 == y._5 && (x._5 == 0L || x._6 <= y._6)))
        case _ =>
      }
    }
  }
}
