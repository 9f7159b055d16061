package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.functions.TextExprs.P

/** q212 Count-Min: the native aggregate's counters must equal an
  * in-memory replay, be invariant to partitioning (mergeable), and
  * never underestimate. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def polyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 31 + c) % P)

  private def sketchOf(hs: Seq[Long]): Array[Long] = {
    val buf = new Array[Long](TextOps.CmA.length * TextOps.CmWidth)
    for (h <- hs; r <- TextOps.CmA.indices) {
      val cell = (((TextOps.CmA(r) * h + TextOps.CmB(r)) % P) % TextOps.CmWidth).toInt
      buf(r * TextOps.CmWidth + cell) += 1L
    }
    buf
  }

  test("native CMS == in-memory replay, partition-invariant (mergeable)") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "eps")
    val hs = (0 until 500).map(i => polyHash(words(i % 5) + (i % 17)))
    def sketch(parts: Int): Array[Long] =
      hs.toDF("h").repartition(parts)
        .agg(graft.functions.NativeExprs.countMinAgg(
          col("h"), TextOps.CmWidth, TextOps.CmA, TextOps.CmB, P).as("sk"))
        .head().getSeq[Long](0).toArray
    val want = sketchOf(hs)
    assert(sketch(1).toSeq === want.toSeq)
    assert(sketch(7).toSeq === want.toSeq)
    // total mass per row == number of inserts
    want.grouped(TextOps.CmWidth).foreach(row => assert(row.sum === hs.length))
  }

  test("q214 ledger (batch form) == in-memory probe replay") {
    import spark.implicits._
    import graft.dedup.KmvSketch.{Ua, Ub}
    val events = (0L until 300L).map(i =>
      (i % 23, Seq("view", "click", "buy")(((i * 7) % 3).toInt)))
      .toDF("user_id", "event_type")
    val got = graft.streaming.EventsStream.countMinUsers(events)
      .collect().map(r => r.getString(0) ->
        (1 until r.length).map(r.getLong)).toMap
    val byType = (0L until 300L).groupBy(i => Seq("view", "click", "buy")(((i * 7) % 3).toInt))
    for ((t, is) <- byType) {
      val hs = is.map(i => (Ua * (i % 23) + Ub) % P)
      val sk = sketchOf(hs)
      val want = graft.streaming.EventsStream.CmProbeUsers.map { u =>
        val hu = (Ua * u + Ub) % P
        TextOps.CmA.indices.map { r =>
          val cell = (((TextOps.CmA(r) * hu + TextOps.CmB(r)) % P) % TextOps.CmWidth).toInt
          sk(r * TextOps.CmWidth + cell)
        }.min
      }
      assert(got(t) === hs.length.toLong +: want)
    }
  }

  test("q212 on sf0.001: est >= exact for the probed keys, over_u consistent") {
    val out = TextOps.countMinShingles(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === TextOps.CmTopK)
    out.foreach { r =>
      val (n, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= n)
      assert(over === est - n)
    }
  }
}
