package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.functions.NativeExprs

/** Content-defined chunking (q153): the rolling-hash boundary stream
  * against a from-scratch reference, the tiling invariant, and the
  * property the operator exists for — boundary re-synchronization
  * after an insertion (fixed-size blocks provably lack it). */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val W = CdcOps.CdcW
  private val D = CdcOps.CdcD
  private val P = 1000000007L

  private def fps(s: String): Seq[Long] = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(NativeExprs.cdcChunks(col("t"), W, D)).head
      .getSeq[Long](0)
  }

  /** From-scratch reference: windowed hash recomputed per position
    * (no rolling update), chunks re-hashed from substrings. */
  private def refChunks(s: String): Seq[String] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return Seq.empty
    def winHash(end: Int): Long = { // inclusive 0-based end
      var acc = 0L
      for (j <- end - W + 1 to end) acc = (acc * 31 + cps(j)) % P
      acc
    }
    val bounds = (W - 1 until n - 1).filter(i => winHash(i) % D == 0)
    val starts = 0 +: bounds.map(_ + 1)
    val ends = bounds.map(_ + 1) :+ n
    starts.zip(ends).map { case (a, b) =>
      new String(cps, a, b - a) }
  }

  private def hash(s: String): Long =
    graft.functions.PolyHashExpr.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  test("rolling boundaries equal the from-scratch windowed reference") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a" * 100, "short", "", "x" * (W - 1),
      "batch window spark order data column agg join table value part")
    for (s <- docs) {
      val expect = refChunks(s)
      assert(fps(s) === expect.map(hash), s"mismatch for: $s")
      assert(expect.mkString === s, "chunks must tile the document")
      assert(expect.forall(_.nonEmpty), "no empty chunks")
    }
  }

  test("boundaries re-synchronize after a head insertion (the CDC property)") {
    // non-periodic base; the inserted prefix length (14) is NOT a
    // multiple of the block size, so fixed blocks cannot realign
    val words = ("key agg row scan slow fast table value part hash merge " +
      "batch window spark order data column join line stream").split(" ")
    val rnd = new scala.util.Random(5)
    val base = Seq.fill(80)(words(rnd.nextInt(words.length))).mkString(" ")
    val shifted = "NEW PREFIX 13 " + base
    val a = fps(base).toSet
    val b = fps(shifted).toSet
    val shared = a.intersect(b).size.toDouble / a.size
    assert(shared >= 0.7,
      s"only ${(shared * 100).toInt}% of chunks survived a head insertion")
    // fixed-size blocks at the same mean length share (almost) nothing
    val fixA = base.grouped(D).toSeq
    val fixB = shifted.grouped(D).toSeq
    val fixShared = fixA.toSet.intersect(fixB.toSet).size.toDouble / fixA.size
    assert(fixShared < shared,
      "fixed blocks matched CDC — the test corpus is degenerate")
  }

  test("q153 corpus invariants: counts bounded, ratios in range") {
    val rows = CdcOps.cdcChunkDedup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length ===
      graft.tables.Tables.documents(spark, "/root/testdata/sf0.001").count())
    rows.foreach { r =>
      val (nc, ns, u) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nc >= 1L)
      assert(ns >= 0L && ns <= nc)
      assert(u === 1000000L * ns / nc)
    }
  }
}
