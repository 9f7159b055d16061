package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.functions.NativeExprs

/** q160 pins: the symmetric-delete key-sharing guarantee for every
  * distance-1 edit class (substitute / insert / delete / equal), and
  * corpus-level recall — every planted typo record resolves to its
  * clean source. */
class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def keys(s: String): Set[Long] = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(NativeExprs.deleteVariantHashes(col("t"))).head
      .getSeq[Long](0).toSet
  }

  test("distance-1 pairs always share a deletion-variant key") {
    val base = "Customer#000000042"
    for (other <- Seq(
        base,                                   // equal
        "Customer#0000a0042",                   // substitution
        "Customer#0000000042",                  // insertion
        "Customer#00000042")) {                 // deletion
      assert(keys(base).intersect(keys(other)).nonEmpty,
        s"no shared key for '$other'")
    }
    // distance-2 strings need not share (and here do not)
    assert(keys(base).intersect(keys("Customer#0000ab042")).isEmpty)
  }

  test("every planted typo record resolves to its clean source (q160)") {
    val dir = "/root/testdata/sf0.001"
    val pairs = EntityResolution.entityResolution(spark, dir)
      .select("id1", "id2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val typoKeys = graft.tables.Tables.customer(spark, dir)
      .filter(col("c_custkey") % 7 === 3)
      .select("c_custkey").collect().map(_.getLong(0))
    assert(typoKeys.nonEmpty)
    for (k <- typoKeys)
      assert(pairs.exists(p => p._1 == k && p._2 == k + 1000000000L && p._3 == 1L),
        s"typo record of customer $k not resolved")
    // all emitted pairs are genuine distance <= 1 and ordered
    pairs.foreach { case (a, b, d) => assert(a < b && d <= 1L) }
  }
}
