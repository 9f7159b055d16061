package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.etl.SparkTestSession

/** q213 gapped sequential patterns on planted timelines: the gap bound
  * must exclude too-distant subsequences, distinct-user support must
  * count repeat occurrences once, and the floor must drop minority
  * patterns. */
class SeqPatternsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def df(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.map { case (u, i, t) =>
      (u, new Timestamp(i * 1000L), i, t)
    }.toDF("user_id", "ts", "event_id", "event_type")
  }

  private def mine(rows: Seq[(Long, Long, String)]) =
    EventOps.seqPatternsOf(df(rows)).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap

  test("gap bound excludes too-distant subsequences") {
    // user 1: A x x x B C — A..B positional gap 4 > SeqGap=3, so
    // (A,B,C) must NOT be supported; (x,x,B)/(x,B,C) etc. are.
    val rows = Seq("A", "x", "x", "x", "B", "C").zipWithIndex
      .map { case (t, i) => (1L, i.toLong, t) }
    val got = mine(rows)
    assert(!got.contains(("A", "B", "C")))
    assert(got.contains(("x", "B", "C")))
    // within-gap triple present: A,x,x (gaps 1,1)
    assert(got.contains(("A", "x", "x")))
  }

  test("distinct-user support counts repeats once; floor drops minority patterns") {
    // 10 users: all have A B C; only 2 have D E F appended -> 20% < 30%
    val rows = (1L to 10L).flatMap { u =>
      val base = Seq("A", "B", "C").zipWithIndex
        .map { case (t, i) => (u, i.toLong, t) }
      val extra = if (u <= 2)
        Seq("D", "E", "F").zipWithIndex.map { case (t, i) => (u, 10L + i, t) }
      else Seq.empty
      base ++ extra ++
        // a second A B C occurrence for user 1 — support must stay 10
        (if (u == 1) Seq((u, 20L), (u, 21L), (u, 22L)).zip(Seq("A", "B", "C"))
          .map { case ((uu, i), t) => (uu, i, t) } else Seq.empty)
    }
    val got = mine(rows)
    assert(got(("A", "B", "C")) === ((10L, 10000L)))
    assert(!got.contains(("D", "E", "F")))
    // cross-block triple for user 1 within gap (C at pos 2, A at 20: far) absent
    assert(!got.contains(("C", "A", "B")) || got(("C", "A", "B"))._1 <= 2L)
  }
}
