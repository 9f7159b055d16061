package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q209 BM25 retrieval: the distributed integer scoring must equal an
  * independent in-memory replay of the same Okapi formula over the
  * sf0.001 corpus, and the ranking must respect (score desc, doc asc). */
class Bm25Spec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  private def tokenize(s: String): Seq[String] =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").filter(_.nonEmpty).toSeq

  test("distributed BM25 == in-memory integer replay (q209)") {
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> tokenize(r.getString(1)))
    val post = docs.flatMap { case (id, tk) =>
      tk.groupBy(identity).map { case (t, xs) =>
        (id, tk.size.toLong, t, xs.size.toLong)
      }
    }
    val dft = post.groupBy(_._3).map { case (t, xs) =>
      t -> xs.map(_._1).distinct.size.toLong
    }
    val tt = post.map(_._4).sum
    val nn = docs.length.toLong
    def score(qts: Seq[String], id: Long): Option[(Long, Long)] = {
      val hits = post.filter(p => p._1 == id && qts.contains(p._3))
      if (hits.isEmpty) None
      else Some((hits.map { case (_, dl, t, tf) =>
        val den = BigInt(20) * tt * tf + BigInt(6) * tt + BigInt(18) * dl * nn
        val tfPart = (BigInt(tf) * 44 * tt * 1000000) / den
        val idf = (BigInt(2 * (nn - dft(t)) + 1) * 1000000) / (2 * dft(t) + 1)
        ((idf * tfPart) / 1000000).toLong
      }.sum, hits.size.toLong))
    }
    val got = SearchOps.bm25Retrieval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // replay: full ranking per query, cut to top-k
    val want = SearchOps.Bm25Queries.flatMap { case (qid, qts) =>
      docs.map(_._1).flatMap(id => score(qts, id).map(s => (id, s)))
        .sortBy { case (id, (s, _)) => (-s, id) }
        .take(SearchOps.Bm25TopK).zipWithIndex
        .map { case ((id, (s, h)), i) => (qid, i + 1, id, s, h) }
    }
    assert(got.sortBy(r => (r._1, r._2)) === want.sortBy(r => (r._1, r._2)))
    // every query retrieved a full (or corpus-limited) page
    assert(got.groupBy(_._1).forall(_._2.nonEmpty))
  }
}
