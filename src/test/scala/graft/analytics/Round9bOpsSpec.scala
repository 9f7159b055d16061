package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q199–q202 pins the oracle gate cannot see: closed-form EMD on
  * planted distributions, hand-computed padding ledgers, exact
  * stationary mass on planted graphs, and the DP ladder's inverse-CDF
  * boundaries + release invariants. */
class Round9bOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"
  import spark.implicits._

  // ------------------------------------------------------------- q199

  test("q199: concentrated classes against a uniform global hit the closed-form EMD") {
    // 4 classes, class k holds 25 rows all in band k → global is
    // uniform over 4 bands; quantized EMD is computable by hand
    val rows = (0 until 4).flatMap(k =>
      Seq.fill(25)((k.toLong, "S", k.toLong)))
    val out = PrivacyOps.tClosenessOf(rows.toDF("nation", "segment", "band"))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // class 0: Σ|CDF gaps| = 750000+500000+250000 → /3 = 500000
    // class 1: 250000+500000+250000 → /3 = 333333 (floor div)
    assert(out(0L) === (500000L, 1L))
    assert(out(1L) === (333333L, 1L))
    assert(out(2L) === (333333L, 1L))
    assert(out(3L) === (500000L, 1L))
  }

  test("q199: a class matching the global distribution scores exactly zero") {
    val rows = (0 until 2).flatMap(c => (0 until 4).flatMap(b =>
      Seq.fill(10)((c.toLong, "S", b.toLong))))
    val out = PrivacyOps.tClosenessOf(rows.toDF("nation", "segment", "band"))
      .collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(3) === 0L, s"class ${r.getLong(0)} t_ppm")
      assert(r.getLong(4) === 0L)
    }
  }

  test("q199: sf audit stays in ppm range and breach agrees with the threshold") {
    val rows = PrivacyOps.tClosenessAudit(spark, dir).collect()
    assert(rows.length === 125, "25 nations × 5 segments")
    rows.foreach { r =>
      val t = r.getLong(3)
      assert(t >= 0L && t <= 1000000L)
      assert(r.getLong(4) === (if (t > PrivacyOps.TClosePpm) 1L else 0L))
    }
  }

  // ------------------------------------------------------------- q200

  test("q200: uniform lengths waste zero under both strategies") {
    val docs = (0L until 64L).map(i => (i, 10L)).toDF("doc_id", "n_tok")
    val out = graft.text.TextOps.paddingWasteOf(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("arrival") === (8L, 640L, 640L, 0L, 0L))
    assert(out("sorted") === (8L, 640L, 640L, 0L, 0L))
  }

  test("q200: interleaved short/long docs — sorted batching erases the arrival waste") {
    // 64 docs all in shard 0 (ids ≡ 0 mod 8), alternating 1- and
    // 1000-token lengths in arrival order
    val docs = (0L until 64L).map(i =>
      (i * 8L, if (i % 2 == 0) 1L else 1000L)).toDF("doc_id", "n_tok")
    val out = graft.text.TextOps.paddingWasteOf(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // arrival: 2 batches of 32 interleaved → both pad to 1000
    assert(out("arrival") === (2L, 32032L, 64000L, 31968L))
    // sorted: lengths 1 and 1000 land in different 64-token buckets →
    // two homogeneous batches, zero padding
    assert(out("sorted") === (2L, 32032L, 32032L, 0L))
  }

  test("q200: sf ledger equals an independent Scala replay of both strategies") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.NativeExprs.countWsTokens(col("text")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val B = graft.text.TextOps.PadBatch.toInt
    def replay(parts: ((Long, Long)) => (Long, Long),
        ord: ((Long, Long)) => (Long, Long)): (Long, Long, Long) = {
      val batches = docs.groupBy(parts).toSeq.flatMap { case (_, ds) =>
        ds.sortBy(ord).grouped(B).toSeq
      }
      (batches.size.toLong,
        batches.map(_.map(_._2).sum).sum,
        batches.map(b => b.map(_._2).max * b.size.toLong).sum)
    }
    val W = graft.text.TextOps.PadBucketW
    val S = graft.text.TextOps.PadShards
    val arrival = replay(d => (d._1 % S, 0L), d => (d._1, 0L))
    val sorted = replay(d => (d._2 / W, d._1 % S), d => (d._2, d._1))
    val out = graft.text.TextOps.paddingWaste(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("arrival") === arrival)
    assert(out("sorted") === sorted)
    // and on this corpus, length-bucketing must actually help
    val waste = graft.text.TextOps.paddingWaste(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(waste("sorted") < waste("arrival"),
      "sorted strategy should waste strictly fewer tokens on the sf corpus")
  }

  // ------------------------------------------------------------- q201

  test("q201: a symmetric pair is a fixpoint at exactly the initial mass") {
    val e = Seq((1L.toString, 2L.toString, 10L), (2L.toString, 1L.toString, 10L))
      .toDF("u", "v", "w").localCheckpoint(true)
    // rankEdges emits (n, mass, s)
    val out = graft.text.TextRank.rankEdges(e).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("1" -> (1000000L, 10L), "2" -> (1000000L, 10L)))
  }

  test("q201: star graph — hand-unrolled 3-round masses, hub first, leaves tie") {
    val leaves = (1 to 4).map(_.toString)
    val e = leaves.flatMap(l => Seq(("hub", l, 10L), (l, "hub", 10L)))
      .toDF("u", "v", "w").localCheckpoint(true)
    val out = graft.text.TextRank.rankEdges(e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // r1: hub 150000+85%·4e6 = 3550000; leaf 150000+85%·250000 = 362500
    // r2: hub 1382500; leaf 904375
    // r3: hub 150000+85%·(4·904375) = 3224875; leaf 150000+85%·345625 = 443781
    assert(out("hub") === 3224875L)
    leaves.foreach(l => assert(out(l) === 443781L, s"leaf $l"))
  }

  test("q201: sf keyword table is 20 rows, rank-ordered, mass above teleport base") {
    val rows = graft.text.TextRank.textRank(spark, dir).collect()
    assert(rows.length === graft.text.TextRank.TopK)
    val masses = rows.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(masses.zip(masses.tail).forall { case (a, b) => a >= b },
      "mass must be non-increasing in rank")
    assert(masses.head > graft.text.TextRank.InitMass,
      "the top keyword must have attracted mass beyond its own start")
  }

  // ------------------------------------------------------------- q207

  test("q207: integer AP numerator equals the exact rational AP for every hit pattern") {
    // all 2^10 hit patterns: Σ hitᵢ·hits@i·(2520/i) over 2520·10 must
    // equal AP computed in exact rational arithmetic
    val K = graft.vector.VectorOps.KMap
    val S = graft.vector.VectorOps.APScale
    (0 until (1 << K)).foreach { pat =>
      val hits = (1 to K).map(i => (pat >> (i - 1)) & 1)
      var cum = 0L
      var apU = 0L
      var num = BigInt(0); var den = BigInt(1) // exact Σ hits@i/i
      (1 to K).foreach { i =>
        cum += hits(i - 1)
        if (hits(i - 1) == 1) {
          apU += cum * (S / i)
          num = num * i + den * cum; den = den * i
          val g = num.gcd(den); if (g > 1) { num /= g; den /= g }
        }
      }
      assert(BigInt(apU) * den === num * S,
        s"pattern $pat: integer AP ≠ rational AP")
    }
  }

  test("q207: sf MAP ledger — bounded, self-consistent, and informative") {
    val rows = graft.vector.VectorOps.mapEval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === graft.vector.VectorOps.QueryMax)
    val full = graft.vector.VectorOps.APScale * graft.vector.VectorOps.KMap
    rows.foreach { case (q, nRel, apU, apPpm) =>
      assert(nRel >= 0L && nRel <= graft.vector.VectorOps.KMap)
      assert(apU >= 0L && apU <= full, s"q$q ap_u $apU")
      assert(apPpm === apU * 1000000L / full, s"q$q ppm consistency")
      // AP can't exceed what a perfect ordering of the found set gives
      assert(apU <= nRel * graft.vector.VectorOps.APScale)
    }
    val map = rows.map(_._4).sum / rows.length
    assert(map > 0L, "the RP sketch must retrieve something")
    info(s"RP-sketch MAP@10 = $map ppm over ${rows.length} probes")
  }

  // ------------------------------------------------------------- q206

  test("q206: planted sequence — hand-computed model, split, and scores") {
    // one user, types A B A B A B A C A B A at seconds 0..10: the 80%
    // cut over transition-source times [0s, 9s] lands at 7.2s, so
    // transitions 0..7 train (A→B ×3, B→A ×3, A→C, C→A) and 8..9 test
    val types = Seq("A", "B", "A", "B", "A", "B", "A", "C", "A", "B", "A")
    val ev = types.zipWithIndex.map { case (t, i) =>
      (1L, i.toLong * 1000000L, i.toLong, t)
    }.toDF("user_id", "us", "event_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val out = EventOps.markovEvalOf(ev).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out === Map(
      "A" -> (("B", 4L, 1L, 1L, 1000000L)),
      "B" -> (("A", 3L, 1L, 1L, 1000000L))))
  }

  test("q206: sf ledger equals an independent Scala replay of train and eval") {
    val raw = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = raw.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4, a._2)
      }
    }.toSeq
    val cut = pairs.map(_._3).min +
      (pairs.map(_._3).max - pairs.map(_._3).min) * 8 / 10
    val (train, test) = pairs.partition(_._3 < cut)
    val model = train.groupBy(p => (p._1, p._2)).view.mapValues(_.size).toSeq
      .groupBy(_._1._1).map { case (f, cs) =>
        f -> cs.sortBy { case ((_, t), n) => (-n, t) }.head._1._2
      }
    val expect = test.groupBy(_._1).map { case (f, ts) =>
      val hits = ts.count(t => model.get(f).contains(t._2))
      f -> (model.getOrElse(f, "(none)"),
        train.count(_._1 == f).toLong, ts.size.toLong, hits.toLong,
        hits.toLong * 1000000L / math.max(ts.size.toLong, 1L))
    }
    val got = EventOps.markovEval(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === expect)
  }

  // ------------------------------------------------------------- q205

  test("q205: collinear powers of two select farthest-first with exact radii") {
    // 8 points on a line at 0,1,2,4,8,16,32,64 (quant units, dim 64
    // with only component 0 set): Gonzalez picks them in strictly
    // halving-radius order, and sel_dist2(r) = radius_after(r−1)
    val xs = Seq(0L, 1L, 2L, 4L, 8L, 16L, 32L, 64L)
    val vecs = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, x.toDouble +: Seq.fill(63)(0.0))
    }.toDF("vec_id", "q")
    val out = graft.vector.CoresetOps.kCenterOf(spark, vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 4096L), (2L, 7L, 4096L, 1024L), (3L, 6L, 1024L, 256L),
      (4L, 5L, 256L, 64L), (5L, 4L, 64L, 16L), (6L, 3L, 16L, 4L),
      (7L, 2L, 4L, 1L), (8L, 1L, 1L, 0L)))
  }

  test("q205: sf ledger — distinct centers, non-increasing radii, chained selection") {
    val rows = graft.vector.CoresetOps.kCenter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.length === graft.vector.CoresetOps.KCenters)
    assert(rows.map(_._2).distinct.length === rows.length, "centers distinct")
    val radii = rows.map(_._4)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      "coverage radius must be non-increasing")
    // Gonzalez invariant: each pick's distance IS the previous radius
    rows.sliding(2).foreach { case Array(prev, curN) =>
      assert(curN._3 === prev._4,
        s"round ${curN._1}: sel_dist2 must equal the prior coverage radius")
    }
  }

  // ------------------------------------------------------------- q204

  test("q204: PAVA leaves monotone means untouched") {
    val fits = graft.text.IsotonicOps.pava(Array((2L, 0L), (2L, 1L), (2L, 2L)))
    assert(fits.toSeq === Seq(0L, 500000L, 1000000L))
  }

  test("q204: PAVA pools violators to the exact rational mean") {
    assert(graft.text.IsotonicOps.pava(Array((1L, 1L), (1L, 0L))).toSeq
      === Seq(500000L, 500000L))
    // [1, 0, 0, 1]: the first three pool to 1/3, the final 1 stands
    assert(graft.text.IsotonicOps.pava(
      Array((1L, 1L), (1L, 0L), (1L, 0L), (1L, 1L))).toSeq
      === Seq(333333L, 333333L, 333333L, 1000000L))
  }

  test("q204: sf calibration curves are monotone and conserve the joined corpus") {
    val out = graft.text.IsotonicOps.isotonicCalibration(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val byBin = rows.sortBy(_._2)
      val fits = byBin.map(_._5)
      assert(fits.zip(fits.tail).forall { case (a, b) => a <= b },
        s"$src: isotonic fit must be nondecreasing in score bin")
      byBin.foreach { case (_, _, n, s, f) =>
        assert(s >= 0L && s <= n, "pool sums stay within cell counts")
        assert(f >= 0L && f <= 1000000L)
      }
    }
    // every doc that survives both feature joins lands in exactly one cell
    val joined = graft.text.TextOps.qualityScore(spark, dir).select("doc_id")
      .join(graft.text.TextOps.repetitionScore(spark, dir).select("doc_id"), "doc_id")
      .count()
    assert(out.map(_._3).sum === joined)
  }

  // ------------------------------------------------------------- q203

  test("q203: streaming drift ledger row-for-row equals the batch monitor") {
    val batch = DriftOps.driftMonitor(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    val stream = DriftOps.driftStream(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    assert(stream === batch,
      "the live ingest gate must reproduce the batch TV ledger exactly")
  }

  // ------------------------------------------------------------- q202

  test("q202: inverse-CDF ladder hits its closed-form boundaries exactly") {
    val B = DpRelease.GeomB
    val D = DpRelease.GeomD
    val probes = Seq(
      0L -> -B.toLong,                        // first dyadic cell
      (DpRelease.cum(-1) - 1) -> -1L,         // last u mapping to −1
      DpRelease.cum(-1) -> 0L,                // first u mapping to 0
      (DpRelease.cum(0) - 1) -> 0L,           // last u mapping to 0
      DpRelease.cum(0) -> 1L,                 // first u mapping to +1
      (D - 1) -> B.toLong)                    // top of the ladder
    val got = probes.map(_._1).toDF("u")
      .withColumn("noise", expr(DpRelease.ladderSql("u")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { case (u, want) =>
      assert(got(u) === want, s"ladder($u)")
    }
  }

  test("q202: ladder mass per noise value is the dyadic geometric profile") {
    // P(0) = 2^B/D, P(±k) = 2^(B−k)/D: check by differencing cum
    val B = DpRelease.GeomB
    assert(DpRelease.cum(0) - DpRelease.cum(-1) === (1L << B))
    (1 to B).foreach { k =>
      assert(DpRelease.cum(k) - DpRelease.cum(k - 1) === (1L << (B - k)), s"+$k")
      assert(DpRelease.cum(-k) - (if (k == B) 0L else DpRelease.cum(-k - 1))
        === (1L << (B - k)), s"−$k")
    }
    assert(DpRelease.cum(B) === DpRelease.GeomD, "ladder exhausts the draw range")
  }

  test("q202: release is deterministic, bounded, and mostly low-noise") {
    val rel = DpRelease.dpHistogram(spark, dir)
    val a = rel.collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = DpRelease.dpHistogram(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a === b, "seeded noise must be idempotent across runs")
    val truth = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a.keySet === truth.keySet)
    val noises = a.map { case (k, v) => v - truth(k) }
    noises.foreach(n => assert(math.abs(n) <= DpRelease.GeomB, s"noise $n"))
    a.values.foreach(v => assert(v >= 0L))
    // P(|noise| ≤ 2) ≈ 5/6 — across 125 cells, well over half is sure
    assert(noises.count(n => math.abs(n) <= 2) * 2 > noises.size,
      "the geometric profile concentrates near zero")
  }
}
