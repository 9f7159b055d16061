package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** The oracle gate proves cross-engine training equality; these specs
  * pin what the oracle cannot see — that the trained model actually
  * LEARNED something (beats the majority class on its weak label) and
  * that training is run-to-run deterministic (identical weights from
  * independent sessions of the same corpus). */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("q193: rank-statistic AUC equals brute-force pairwise AUC") {
    // brute force over the real scored table: AUC = (#concordant +
    // 0.5·#tied) / (n_pos·n_neg) — the definition the rank formula
    // must reproduce exactly (doubled-rank arithmetic included)
    val scored = QualityClassifier.classify(spark, dir)
      .select("y", "logit_u").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pos = scored.filter(_._1 == 1L).map(_._2)
    val neg = scored.filter(_._1 == 0L).map(_._2)
    var conc2 = 0L // doubled: 2 per concordant pair, 1 per tie
    for (p <- pos; n <- neg) {
      if (p > n) conc2 += 2 else if (p == n) conc2 += 1
    }
    val row = QualityClassifier.aucExact(spark, dir).collect().head
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    assert(row.getLong(2) === conc2, "U statistic != pairwise count")
    assert(row.getLong(3) ===
      (1000000L * conc2) / (2L * pos.length * neg.length))
  }

  test("training is deterministic: two independent runs land on identical weights") {
    val (w1, _) = QualityClassifier.learn(spark, dir)
    val (w2, _) = QualityClassifier.learn(spark, dir)
    assert(w1.toSeq === w2.toSeq)
    assert(w1.exists(_ != 0L), "all-zero weights — training did not move")
  }

  test("learned model beats the majority class on the weak label") {
    val rows = QualityClassifier.classify(spark, dir)
      .select("y", "correct").collect()
    val n = rows.length
    val acc = rows.count(_.getBoolean(1)).toDouble / n
    val majority = math.max(
      rows.count(_.getLong(0) == 1L), rows.count(_.getLong(0) == 0L)).toDouble / n
    assert(acc > majority + 0.05,
      s"accuracy $acc does not beat majority baseline $majority")
  }
}
