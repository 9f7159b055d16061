package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** The oracle gate proves cross-engine training equality (identical
  * weights, predictions and w_fp); these specs pin what the oracle
  * cannot see — that the trained model actually beats the raw
  * marker-count heuristic (the q16 shape) on held-out documents, and
  * that training is run-to-run deterministic. */
class LangIdTrainedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("training is deterministic: two independent runs land on identical weights") {
    val (w1, _) = LangIdTrained.learn(spark, dir)
    val (w2, _) = LangIdTrained.learn(spark, dir)
    assert(w1.map(_.toSeq).toSeq === w2.map(_.toSeq).toSeq)
    assert(w1.flatten.exists(_ != 0L), "all-zero weights — training did not move")
  }

  test("trained model beats the marker-count heuristic on held-out docs") {
    val out = LangIdTrained.langIdTrained(spark, dir)
      .filter(col("split") === "held")
      .select("lang", "predicted", "correct").collect()
    val n = out.length
    assert(n > 50, s"held-out split unexpectedly small: $n")
    val accTrained = out.count(_.getBoolean(2)).toDouble / n

    // The heuristic twin: argmax of the SAME raw count features
    // (real marker hits + injection boosts — i.e. the counts a q16
    // marker list sees on this corpus), ties in Langs order. This is
    // the strongest count-based baseline; q16's actual fixed lists do
    // worse because they don't know the injection vocabulary.
    import graft.functions.NativeExprs
    import graft.functions.TextExprs.tokensCol
    val K = LangIdTrained.Langs.size
    val li = LangIdTrained.Langs.zipWithIndex.tail.foldLeft(
      when(col("lang") === LangIdTrained.Langs.head, 0)) { case (c, (l, i)) =>
      c.when(col("lang") === l, i) }.otherwise(K - 1).as("li")
    val base = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), li, tokensCol(col("text")).as("tk"))
    val cs = (0 until K).map { k =>
      (least(NativeExprs.countInSet(col("tk"), LangIdTrained.Markers(k)),
          lit(LangIdTrained.FeatCap))
        + when(col("li") === k, lit(2) + (col("doc_id") % 2).cast("int")).otherwise(0)
        + when((col("li") + 1 + col("doc_id") % 4) % K === k, 1).otherwise(0))
        .as(s"c$k")
    }
    val heurPred = (0 until K - 1).foldLeft(None: Option[org.apache.spark.sql.Column]) {
      (acc, k) =>
        val isMax = ((k + 1) until K)
          .map(m => col(s"c$k") >= col(s"c$m")).reduce(_ && _)
        Some(acc.fold(when(isMax, LangIdTrained.Langs(k)))(
          _.when(isMax, LangIdTrained.Langs(k))))
    }.get.otherwise(LangIdTrained.Langs(K - 1))
    val heur = base.select(Seq(col("doc_id"), col("lang")) ++ cs: _*)
      .filter(col("doc_id") % 5 === 4)
      .select((heurPred === col("lang")).as("ok")).collect()
    val accHeur = heur.count(_.getBoolean(0)).toDouble / heur.length

    assert(accTrained >= 0.8, s"trained held-out accuracy $accTrained < 0.8")
    assert(accTrained > accHeur + 0.1,
      s"trained $accTrained does not clearly beat heuristic $accHeur")
  }
}
