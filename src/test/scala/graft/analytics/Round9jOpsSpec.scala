package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Round-9 additions: span-corruption mask plan (q242), two-sample
  * KS audit (q243). */
class Round9jOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("q242: plan structure — span count, mask share, position bounds, non-overlap arithmetic") {
    val W = graft.text.TextOps.SpanBlockW
    val S = graft.text.TextOps.SpanW
    val rows = graft.text.TextOps.spanMaskPlan(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, spans, masked, bp, ps) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(spans === n / W)
      assert(masked === spans * S)
      assert(bp === masked * 10000L / math.max(n, 1L))
      // every span start sits inside its own block: Σ 20b <= pos_sum <= Σ (20b+17)
      val lo = W * spans * (spans - 1) / 2
      assert(ps >= lo && ps <= lo + spans * (W - S),
        s"doc ${r.getLong(0)}: pos_sum $ps outside [$lo, ${lo + spans * (W - S)}]")
    }
    // masked share sits in the S/W = 15% band once a span exists
    val masked = rows.filter(_.getLong(2) >= 1L)
    assert(masked.nonEmpty)
    masked.foreach(r => assert(r.getLong(4) >= 750L && r.getLong(4) <= 1500L,
      s"doc ${r.getLong(0)}: masked_bp ${r.getLong(4)}"))
  }

  test("q242: the plan is deterministic run-over-run") {
    val a = graft.text.TextOps.spanMaskPlan(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val b = graft.text.TextOps.spanMaskPlan(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(a === b)
  }

  test("q243: hand histograms — separated samples score 1.0, identical samples score 0") {
    import spark.implicits._
    val sep = Seq(("X", 1L, 1L), ("X", 2L, 1L), ("Y", 3L, 1L), ("Y", 4L, 1L))
      .toDF("source", "v", "cnt")
    val out = graft.text.TextOps.ksOfHist(sep).collect()
      .map(r => r.getString(0) -> r).toMap
    Seq("X", "Y").foreach { s =>
      assert(out(s).getLong(3) === 1000000L)
      assert(out(s).getLong(4) === 2L) // the gap peaks where X's mass ends
    }
    val same = Seq(("X", 1L, 2L), ("X", 2L, 2L), ("Y", 1L, 2L), ("Y", 2L, 2L))
      .toDF("source", "v", "cnt")
    graft.text.TextOps.ksOfHist(same).collect()
      .foreach(r => assert(r.getLong(3) === 0L))
    // a lone source owns every row: the rest-sample is empty, the KS
    // denominator is 0, and the defined answer is 0 ppm — NOT a null
    // (Spark div) or an error (DuckDB //); the r9 advice guard
    val lone = Seq(("X", 1L, 3L), ("X", 2L, 1L)).toDF("source", "v", "cnt")
    val lr = graft.text.TextOps.ksOfHist(lone).collect()
    assert(lr.length === 1)
    assert(!lr(0).isNullAt(3) && lr(0).getLong(3) === 0L)
    assert(lr(0).getLong(2) === 0L) // n_rest
  }

  test("q244: rep-keyed routing never splits a cluster; doc-keyed routing does") {
    val rows = graft.sources.ShardOps.clusterShards(spark, dir).collect()
    assert(rows.nonEmpty)
    val rep = rows.filter(_.getString(0) == "rep")
    val doc = rows.filter(_.getString(0) == "doc")
    assert(rep.map(_.getLong(5)).sum === 0L)
    // both schemes place every document exactly once
    assert(rep.map(_.getLong(2)).sum === doc.map(_.getLong(2)).sum)
    val nDocs = graft.tables.Tables.documents(spark, dir).count()
    assert(rep.map(_.getLong(2)).sum === nDocs)
    // the corpus has multi-doc near-dup clusters, so naive routing splits some
    assert(rep.map(_.getLong(4)).max > 1L)
    assert(doc.map(_.getLong(5)).sum > 0L,
      "doc-keyed routing split no cluster - fixture too weak")
    // cluster counts: splitting can only increase per-shard cluster presence
    assert(doc.map(_.getLong(3)).sum >= rep.map(_.getLong(3)).sum)
  }

  test("q243: KS dominates TV/2 relationship sanity and bounds on the sf corpus") {
    val rows = graft.text.TextOps.ksAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L && r.getLong(2) > 0L)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 10000L)
    }
  }
}
