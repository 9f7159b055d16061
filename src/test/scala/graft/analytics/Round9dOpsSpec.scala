package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.etl.SparkTestSession

/** Round-9 additions: CUSUM changepoint (q226), Kendall-tau sketch
  * concordance (q227), HRW resharding audit (q228). */
class Round9dOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  // planted dense grid: one type, `pre` in-control hours at `level`,
  // then `post` hours from the supplied series
  private def grid(level: Long, post: Seq[Long]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val base = 1700000000000L // fixed epoch ms, hour-aligned enough
    val rows = (0 until 48).map(h =>
      (new Timestamp(base + h * 3600000L), "view", level)) ++
      post.zipWithIndex.map { case (v, i) =>
        (new Timestamp(base + (48 + i) * 3600000L), "view", v) }
    rows.toDF("window_start", "event_type", "n_events")
  }

  test("q226: planted level shift alarms at the closed-form hour, closed-form cusum") {
    // ref: n_ref=48, sum_ref=480, slack = 480*2500 div 10000 = 120
    // post at 25: d_u = 48*25 - 480 - 120 = 600 per hour -> cusum = 600*t
    // threshold 5*480 = 2400 -> first alarm at t=5 (3000 > 2400)
    val out = EventOps.cusumOf(grid(10L, Seq.fill(12)(25L)))
      .orderBy("window_start").collect()
    assert(out.length === 12)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(3) === 600L * (i + 1), s"cusum at t=${i + 1}")
      assert(r.getLong(4) === (if (i + 1 >= 5) 1L else 0L), s"alarm at t=${i + 1}")
    }
  }

  test("q226: in-control jitter never alarms; downshift is invisible to the one-sided sweep") {
    val jitter = EventOps.cusumOf(
      grid(10L, (0 until 20).map(i => 10L + (if (i % 2 == 0) 1L else -1L))))
      .collect()
    assert(jitter.forall(_.getLong(4) === 0L))
    // +1 hour: d = 48*11-600 = -72 < 0, so cusum never accumulates here
    assert(jitter.map(_.getLong(3)).max < 2400L)
    val down = EventOps.cusumOf(grid(10L, Seq.fill(20)(2L))).collect()
    assert(down.forall(r => r.getLong(3) === 0L && r.getLong(4) === 0L))
  }

  test("q226: window identity equals the recursive CUSUM on a mixed series") {
    val post = Seq(25L, 3L, 30L, 10L, 40L, 2L, 2L, 35L, 35L, 35L, 1L, 50L)
    val out = EventOps.cusumOf(grid(10L, post))
      .orderBy("window_start").collect().map(_.getLong(3))
    var s = 0L
    val expect = post.map { x =>
      val d = 48L * x - 480L - 120L
      s = math.max(0L, s + d); s
    }
    assert(out.toSeq === expect)
  }

  test("q226: sf corpus — ledger covers every type past warm-up, cusum nonnegative") {
    val out = graft.analytics.EventOps.cusumChangepoint(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 0L))
    val types = rows.map(_.getString(0)).distinct.sorted
    val gridTypes = graft.tables.Tables.events(spark, dir)
      .select("event_type").distinct().collect().map(_.getString(0)).sorted
    assert(types.toSeq === gridTypes.toSeq)
  }

  test("q227: per-probe tau ledger is internally consistent and deterministic") {
    val rows = graft.vector.VectorOps.kendallTau(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === graft.vector.VectorOps.QueryMax)
    rows.foreach { case (_, nPairs, c, d, tau) =>
      assert(nPairs === 45L) // C(10,2)
      assert(c + d === nPairs)
      assert(c >= 0L && d >= 0L)
      val expect = ((c - d + nPairs) * 1000000L) / nPairs - 1000000L
      assert(tau === expect)
      assert(tau >= -1000000L && tau <= 1000000L)
    }
    val again = graft.vector.VectorOps.kendallTau(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(rows.map(r => (r._1, r._5)).toMap === again)
  }

  test("q227: the RP sketch orders better than random — mean tau positive") {
    val taus = graft.vector.VectorOps.kendallTau(spark, dir).collect()
      .map(_.getLong(4))
    assert(taus.sum / taus.length > 0L,
      s"mean tau ${taus.sum / taus.length} ppm — sketch ordering no better than chance")
  }

  test("q228: HRW moves exactly the new shard's keys; mod moves ~8/9") {
    val rows = graft.sources.ShardOps.shardRebalance(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val hrw = rows.filter(_._1 == "hrw")
    val mod = rows.filter(_._1 == "mod")
    val hrwGlobal = hrw.find(_._2 == -1L).get
    val modGlobal = mod.find(_._2 == -1L).get
    // conservation: per-shard placements sum to the global count
    assert(hrw.filter(_._2 >= 0L).map(_._3).sum === hrwGlobal._3)
    assert(mod.filter(_._2 >= 0L).map(_._3).sum === modGlobal._3)
    // HRW structural exactness: a key moves iff the NEW shard wins it —
    // shards 0..7 absorb zero moves; shard 8's moves equal its placement
    hrw.filter(r => r._2 >= 0L && r._2 < 8L).foreach(r =>
      assert(r._4 === 0L, s"hrw shard ${r._2} absorbed moved keys"))
    val s8 = hrw.find(_._2 === 8L).get
    assert(s8._4 === s8._3)
    assert(hrwGlobal._4 === s8._3)
    // magnitudes: hrw ~ 1/9 of keys, mod ~ 8/9; hrw strictly far below mod
    assert(hrwGlobal._5 > 40000L && hrwGlobal._5 < 250000L,
      s"hrw moved ${hrwGlobal._5} ppm")
    assert(modGlobal._5 > 700000L, s"mod moved ${modGlobal._5} ppm")
    assert(hrwGlobal._5 * 3 < modGlobal._5)
    // placement balance at k=9: no empty shard, no shard above 3x fair share
    val n = hrwGlobal._3
    hrw.filter(_._2 >= 0L).foreach { r =>
      assert(r._3 > 0L, s"hrw shard ${r._2} empty")
      assert(r._3 * 3 < n, s"hrw shard ${r._2} holds ${r._3} of $n")
    }
  }
}
