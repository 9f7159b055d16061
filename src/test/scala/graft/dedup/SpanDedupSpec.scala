package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.etl.SparkTestSession

/** Planted-span fixtures for q250: the oracle gate proves both engines
  * derive the same spans from the same corpus; these pin that the
  * spans are the RIGHT ones — exact maximal boundaries on a planted
  * duplicate, no flagging below the 50-token threshold, within-doc
  * repeats caught, and flank tokens never absorbed. */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val W = SpanDedup.MinSpanTokens

  /** n distinct filler tokens no other fixture uses. */
  private def uniq(tag: String, n: Int): Seq[String] =
    (1 to n).map(i => s"u${tag}x$i")

  private def spans(docs: (Long, Seq[String])*): Map[Long, Seq[(Long, Long, Long)]] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      docs.map { case (id, tk) => Row(id, tk.mkString(" ")) }.asJava,
      org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING"))
    SpanDedup.dupSpansOf(df).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
  }

  test("a planted 60-token duplicate reports exact maximal boundaries in both docs") {
    val shared = uniq("s", 60)
    // doc 1: 10 filler + shared + 5 filler; doc 2: shared + 20 filler
    val got = spans(
      1L -> (uniq("a", 10) ++ shared ++ uniq("b", 5)),
      2L -> (shared ++ uniq("c", 20)))
    // doc 1: span covers tokens 11..70 (60 tokens); doc 2: 1..60
    assert(got(1L) === Seq((11L, 70L, 60L)))
    assert(got(2L) === Seq((1L, 60L, 60L)))
  }

  test("a 49-token shared region is below threshold and reports nothing") {
    val shared = uniq("t", W - 1)
    val got = spans(
      3L -> (shared ++ uniq("d", 30)),
      4L -> (uniq("e", 30) ++ shared))
    assert(got.isEmpty, s"sub-threshold span flagged: $got")
  }

  test("a within-doc repeat is a duplicate even with no second document") {
    val rep = uniq("r", W)
    val got = spans(5L -> (rep ++ uniq("f", 10) ++ rep))
    // two maximal spans in the same doc: 1..50 and 61..110
    assert(got(5L) === Seq((1L, 50L, 50L), (61L, 110L, 50L)))
  }

  test("two disjoint shared regions in one doc stay two spans (no bridging)") {
    val s1 = uniq("g", W)
    val s2 = uniq("h", W)
    val got = spans(
      6L -> (s1 ++ uniq("i", 7) ++ s2),
      7L -> (s2 ++ uniq("j", 25) ++ s1))
    assert(got(6L) === Seq((1L, 50L, 50L), (58L, 107L, 50L)))
    assert(got(7L) === Seq((1L, 50L, 50L), (76L, 125L, 50L)))
  }

  test("gate corpus: every span is >= 50 tokens and window counts are consistent") {
    val rows = SpanDedup.dupSpans(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "no duplicated spans found in the gate corpus")
    rows.foreach { r =>
      val (s, e, t, nw) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(t >= W && t == e - s + 1, s"bad span geometry: $r")
      assert(nw == t - W + 1, s"window count inconsistent with maximality: $r")
    }
  }
}
