package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.functions.TextExprs.P

/** q171 pins the oracle gate cannot see: pruning must change the COST,
  * never the ANSWER (n_hit/contam_bp bit-equal to q75's un-pruned
  * join), the filter must have no false NEGATIVES ever (candidates ⊇
  * hits per doc), and the false-POSITIVE path must genuinely fire on
  * this corpus — a bloom whose FP branch never executes is untested
  * dead code no hash compare would catch. */
class BloomOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("bloom-pruned result equals the un-pruned q75 join exactly") {
    val pruned = BloomOps.bloomDecontaminate(spark, dir)
      .select("doc_id", "n_hit", "contam_bp").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = DedupOps.contamination(spark, dir)
      .select("doc_id", "n_hit", "contam_bp").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pruned === exact)
  }

  test("no false negatives; false-positive path fires and is ledgered") {
    val rows = BloomOps.bloomDecontaminate(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3),
        s"doc ${r.getLong(0)}: candidates < hits — bloom dropped a true key")
    }
    assert(rows.exists(r => r.getLong(2) > r.getLong(3)),
      "no false positives on this corpus: the FP branch is unexercised")
    // pruning actually prunes: the candidate mass is far below the
    // total shingle mass the un-pruned join would shuffle
    val shingles = rows.map(_.getLong(1)).sum
    val candidates = rows.map(_.getLong(2)).sum
    assert(candidates * 10 < shingles,
      s"bloom passes $candidates of $shingles shingles — not pruning")
  }

  test("membership probe agrees with the aggregate's bit semantics on planted keys") {
    import spark.implicits._
    val keys = (1L to 500L).map(i => (i * 2654435761L) % P)
    val in = keys.toDF("h")
    val bloom = in.agg(graft.functions.NativeExprs.bloomAgg(
      col("h"), BloomOps.MBits, BloomOps.As, BloomOps.Bs, P).as("bits"))
    val probed = in.unionByName(
        ((5001L to 5500L).map(i => (i * 2654435761L) % P)).toDF("h"))
      .crossJoin(broadcast(bloom))
      .withColumn("cand", BloomOps.bloomTest(col("h"), col("bits")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    keys.foreach(k => assert(probed(k), s"inserted key $k not found"))
    // most non-inserted keys must be rejected (FP rate ~0.5% at this load)
    val out = (5001L to 5500L).map(i => (i * 2654435761L) % P)
      .filterNot(keys.toSet)
    val fps = out.count(probed(_))
    assert(fps * 10 < out.size, s"$fps false positives of ${out.size}")
  }
}
