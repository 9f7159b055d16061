package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q165/q166 pins the oracle gate cannot see. */
class DiffPrivacySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("q165: ledger conserves keys and matches the closed-form class counts") {
    val rows = SnapshotDiff.snapshotDiff(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val keys = Tables.orders(spark, dir).select(col("o_orderkey").as("k"))
    val n = keys.count()
    def cnt(p: org.apache.spark.sql.Column) = keys.filter(p).count()
    // added: in new only (k%17==0 && k%19!=0); removed: old only
    assert(rows(("added", "")) === cnt(col("k") % 17 === 0 && col("k") % 19 =!= 0))
    assert(rows(("removed", "")) === cnt(col("k") % 17 =!= 0 && col("k") % 19 === 0))
    // both-present changed classes partition by 11/13 divisibility
    val both = col("k") % 17 =!= 0 && col("k") % 19 =!= 0
    assert(rows(("changed", "status")) ===
      cnt(both && col("k") % 11 === 0 && col("k") % 13 =!= 0))
    assert(rows(("changed", "price")) ===
      cnt(both && col("k") % 11 =!= 0 && col("k") % 13 === 0))
    assert(rows.getOrElse(("changed", "status,price"), 0L) ===
      cnt(both && col("k") % 143 === 0))
    // conservation: every key of old ∪ new lands in exactly one class
    val unionKeys = cnt(col("k") % 17 =!= 0 || col("k") % 19 =!= 0)
    assert(rows.values.sum === unionKeys)
    assert(unionKeys < n) // keys ≡ 0 mod (17·19) are in neither snapshot
  }

  test("q166: grouping-sets ladder equals independent per-level audits") {
    val viaGroupingSets = PrivacyOps.kAnonymityAudit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val c = Tables.customer(spark, dir).select(
      col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000).cast("long").as("band"))
    def naive(qi: Seq[String]) = {
      val g = c.groupBy(qi.map(col): _*).agg(count(lit(1)).as("gsize"))
      val r = g.agg(count(lit(1)), sum(when(col("gsize") < PrivacyOps.KAnon, 1L).otherwise(0L)),
        sum(when(col("gsize") < PrivacyOps.KAnon, col("gsize")).otherwise(0L))).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(viaGroupingSets(0L) === naive(Seq("nation", "segment", "band")))
    assert(viaGroupingSets(1L) === naive(Seq("nation", "segment")))
    assert(viaGroupingSets(2L) === naive(Seq("segment")))
    // generalization monotonicity: records at risk shrink up the ladder
    assert(viaGroupingSets(1L)._3 <= viaGroupingSets(0L)._3)
    assert(viaGroupingSets(2L)._3 <= viaGroupingSets(1L)._3)
  }
}
