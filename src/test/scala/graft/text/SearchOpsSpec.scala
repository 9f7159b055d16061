package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.functions.NativeExprs

/** q158/q159 pins beyond the oracle gate: the gram index has no false
  * negatives by construction (every probe window is in the containing
  * text's gram set), cross-document matches surface, and the leakage
  * audit's counts obey their algebra. */
class SearchOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("gram postings: containing text holds every window hash of the probe") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog"
    val probe = text.substring(10, 29) // "brown fox jumps ove"
    val tg = Seq(text).toDF("t")
      .select(NativeExprs.charGramHashes(col("t"), SearchOps.GramW))
      .head.getSeq[Long](0).toSet
    val pg = Seq(probe).toDF("t")
      .select(NativeExprs.charGramHashes(col("t"), SearchOps.GramW))
      .head.getSeq[Long](0).toSet
    assert(pg.subsetOf(tg), "probe grams must all appear in the text's grams")
    // and a non-substring's gram set is NOT contained
    val ng = Seq("completely different words").toDF("t")
      .select(NativeExprs.charGramHashes(col("t"), SearchOps.GramW))
      .head.getSeq[Long](0).toSet
    assert(!ng.subsetOf(tg))
  }

  test("q158 equals brute-force contains on the corpus (incl. cross-doc matches)") {
    val dir = "/root/testdata/sf0.01"
    val got = SearchOps.substringSearch(spark, dir)
      .select("pid", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = graft.tables.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (pid, ptext) <- docs
      if pid % SearchOps.ProbeEvery == 0 &&
        ptext.length >= SearchOps.ProbeStart + SearchOps.ProbeLen - 1
      probe = ptext.substring(SearchOps.ProbeStart - 1,
        SearchOps.ProbeStart - 1 + SearchOps.ProbeLen)
      (did, dtext) <- docs if dtext.contains(probe)
    } yield (pid, did)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
    // every probe at least finds its own source document
    expected.groupBy(_._1).foreach { case (pid, hits) =>
      assert(hits.contains((pid, pid))) }
  }

  test("q159 leakage algebra: splits partition events; leakage bounded") {
    val r = graft.analytics.EventOps.leakageAudit(spark, "/root/testdata/sf0.01").head()
    val total = graft.tables.Tables.events(spark, "/root/testdata/sf0.01").count()
    val (nTrain, nEval) = (r.getLong(0), r.getLong(1))
    val (uTrain, uEval, uBoth) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nTrain + nEval === total)
    assert(nTrain > 0 && nEval > 0, "split point must land inside the span")
    assert(uBoth <= math.min(uTrain, uEval))
    assert(r.getLong(5) === 10000L * uBoth / uEval)
  }
}
