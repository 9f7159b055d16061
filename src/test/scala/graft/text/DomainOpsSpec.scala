package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q164 pins the oracle gate cannot see: the custom GroupedTopK
  * operator's kept SET (not just its aggregate sizes) equals the
  * declarative window form row-for-row; the ledger is conservation-
  * consistent; and the synthetic skew actually bites — the mega-domain
  * holds ~40% of the corpus and is capped while the tail is not. */
class DomainOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("GroupedTopK kept set equals the window-form kept set row-for-row") {
    val viaOperator = DomainOps.keptDocs(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaWindow = Tables.documents(spark, dir)
      .withColumn("domain",
        concat(lit("d"), when(col("doc_id") % 100 < 40, lit(0L))
          .otherwise(col("doc_id") % 100).cast("string"), lit(".example.com")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("domain").orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") <= DomainOps.DomCap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaOperator === viaWindow)
  }

  test("ledger conserves mass and respects the cap under skew") {
    val rows = DomainOps.domainCap(spark, dir).collect()
    assert(rows.length > 1)
    var total = 0L
    rows.foreach { r =>
      val (nDocs, nKept, nDropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (tc, kc, dc) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nKept === math.min(DomainOps.DomCap.toLong, nDocs))
      assert(nDocs === nKept + nDropped)
      assert(tc === kc + dc)
      total += nDocs
    }
    val mega = rows.find(_.getString(0) == "d0.example.com").get
    assert(mega.getLong(1) * 10 >= total * 3, "mega-domain should hold ~40%")
    assert(mega.getLong(2) === DomainOps.DomCap.toLong, "mega-domain must be capped")
  }
}
