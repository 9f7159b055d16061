package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.functions.NativeExprs

/** Learned-BPE (q144) invariants: the native greedy application on
  * adversarial symbol runs, and distributed training vs an independent
  * in-test reference implementation (value correctness vs DuckDB's
  * relational re-learn is the Verify/oracle gate). */
class BpeSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  private def seg(text: String, merges: Seq[(String, String)]): String = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(NativeExprs.bpeSegment(col("t"), merges)).head.getString(0)
  }

  test("greedy merge pass: identical-symbol runs merge at 1st/3rd/... positions") {
    assert(seg("aaaa", Seq("a" -> "a")) === "aa aa")
    assert(seg("aaa", Seq("a" -> "a")) === "aa a")
    assert(seg("aaaaa", Seq("a" -> "a")) === "aa aa a")
    // merges apply in learned order: (a,a) then (aa,aa)
    assert(seg("aaaa", Seq("a" -> "a", "aa" -> "aa")) === "aaaa")
  }

  test("merges apply per word, never across word boundaries") {
    assert(seg("ab a b", Seq("a" -> "b")) === "ab a b")
    assert(seg("xy! zw", Seq("y" -> "z")) === "x y z w")
  }

  test("application tokenizes like q15: case folds, non-alnum splits") {
    assert(seg("Ab-cd", Seq("a" -> "b", "c" -> "d")) === "ab cd")
    assert(seg("", Nil) === "")
    assert(seg("...", Nil) === "")
  }

  test("distributed training matches an independent in-test reference (sf0.001)") {
    // reference: plain Scala BPE over the collected token stream
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("text")).collect().map(_.getString(0))
    val words = docs.flatMap(
      _.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
    val freq = words.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    var segs: Map[String, Vector[String]] =
      freq.keys.map(w => w -> w.map(_.toString).toVector).toMap
    var expected = Vector.empty[(String, String)]
    while (expected.length < BpeOps.BpeRounds) {
      // batched reference: rank pairs, greedily accept the first
      // BpeBatchM symbol-disjoint ones from the top-BpeScanW window,
      // apply them sequentially in rank order
      val stats = collection.mutable.Map.empty[(String, String), Long]
      for ((w, f) <- freq; i <- 0 until segs(w).length - 1) {
        val p = (segs(w)(i), segs(w)(i + 1))
        stats(p) = stats.getOrElse(p, 0L) + f
      }
      val ranked = stats.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.take(BpeOps.BpeScanW)
      var used = Set.empty[String]
      var batch = Vector.empty[(String, String)]
      for (((a, b), _) <- ranked if batch.length < BpeOps.BpeBatchM)
        if (!used(a) && !used(b)) { batch :+= ((a, b)); used ++= Seq(a, b) }
      assert(batch.length == BpeOps.BpeBatchM)
      for (best <- batch) {
        expected :+= best
        segs = segs.map { case (w, s) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == best._1 && s(i + 1) == best._2) {
              out += s(i) + s(i + 1); i += 2
            } else { out += s(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    val learned = BpeOps.bpeLearn(spark, dir)
    assert(learned === expected)
    // and the native application agrees with the reference segmentation
    val sample = docs.head
    val refSeg = sample.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .map(w => segs(w).mkString(" ")).mkString(" ")
    assert(seg(sample, learned) === refSeg)
  }

  test("q144 stats: n_bpe >= n_ws, fingerprints re-derive (sf0.001)") {
    val rows = BpeOps.bpeTokenStats(spark, dir).collect()
    assert(rows.length ===
      graft.tables.Tables.documents(spark, dir).count())
    val mtFps = rows.map(_.getLong(4)).distinct
    assert(mtFps.length === 1) // one merge table for the whole corpus
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"doc ${r.getLong(0)}: subword count below word count")
    }
  }
}
