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

  test("q222: reliability bins equal an in-memory ntile+ECE replay") {
    // independent replay: score, sort by (logit_u, y), split into
    // ntile buckets (first n%k buckets one larger — Spark semantics),
    // aggregate, and recompute the count-weighted ECE in exact
    // integer arithmetic.
    val scored = QualityClassifier.classify(spark, dir)
      .select("y", "logit_u").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (y, l) => (l, y) }
    val n = scored.length
    val k = QualityClassifier.CalBins
    val base = n / k; val extra = n % k
    val sizes = (1 to k).map(b => if (b <= extra) base + 1 else base)
    val offsets = sizes.scanLeft(0)(_ + _)
    def pU(l: Long): Long = {
      val dev = (math.abs(l) * 1000000L) / (2L * (1000000L + math.abs(l)))
      if (l >= 0) 500000L + dev else 500000L - dev
    }
    val want = (1 to k).map { b =>
      val rows = scored.slice(offsets(b - 1), offsets(b))
      val nb = rows.length.toLong
      val nPos = rows.map(_._1).sum
      val sumP = rows.map(r => pU(r._2)).sum
      val avgP = sumP / nb
      val obs = (nPos * 1000000L) / nb
      (b.toLong, nb, nPos, avgP, obs, math.abs(avgP - obs))
    }
    val eceWant =
      want.map(r => r._2 * r._6).sum / want.map(_._2).sum
    val got = QualityClassifier.reliabilityDiagram(spark, dir)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(got.length === k)
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) === want)
    assert(got.forall(_._7 == eceWant))
    // calibration sanity: predicted probability is monotone over the
    // logit-ordered bins, and the ECE is a probability in micro-units
    assert(got.map(_._4) === got.map(_._4).sorted, "avg_p_u not monotone")
    assert(eceWant >= 0L && eceWant <= 1000000L)
  }
}
