package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.text.TextOps

/** q168 pins the oracle gate cannot see: the audit column is zero
  * BECAUSE clusters are atomic (every rep maps to exactly one split),
  * and the per-document q97 split genuinely leaks on the same pair
  * set — i.e., the operator fixes a real problem on this corpus, not
  * a vacuous one. */
class SplitOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("cluster split has zero cross-split near-dup pairs; per-doc split leaks") {
    val rows = SplitOps.clusterSplit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) === 0L, "cluster split must not leak"))
    // same audit under q97's per-document split: must be > 0 here,
    // otherwise this corpus cannot distinguish the two policies
    val pairs = DedupOps.minhashLsh(spark, dir).select("d1", "d2")
    val perDoc = TextOps.hashSplit(spark, dir).select(col("doc_id"), col("split"))
    val leaked = pairs
      .join(perDoc.select(col("doc_id").as("d1"), col("split").as("sp1")), "d1")
      .join(perDoc.select(col("doc_id").as("d2"), col("split").as("sp2")), "d2")
      .filter(col("sp1") =!= col("sp2")).count()
    assert(leaked > 0L, "per-doc split should leak on this corpus")
  }

  test("every near-dup cluster lands wholly inside one split") {
    val pairs = DedupOps.minhashLsh(spark, dir).select("d1", "d2")
    val clusters = DedupOps.starComponents(pairs)._1
    val assigned = SplitOps.clusterSplit(spark, dir) // ledger only; recompute map
    val docs = graft.tables.Tables.documents(spark, dir).select("doc_id")
    val full = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("rep_id"), col("doc_id")))
      .withColumn("bucket", graft.functions.TextExprs.polyHashCol(
        concat(lit("rep:"), col("rep").cast("string"))) % 100)
      .withColumn("split", when(col("bucket") < TextOps.TrainPct, "train")
        .when(col("bucket") < TextOps.ValPct, "val").otherwise("test"))
    val reps = full.select("rep").distinct().count()
    val repSplits = full.select("rep", "split").distinct().count()
    assert(reps === repSplits)
    // and the ledger's totals agree with the recomputed assignment
    val ledger = assigned.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = full.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ledger === direct)
  }
}
