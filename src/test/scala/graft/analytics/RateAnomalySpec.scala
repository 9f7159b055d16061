package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q173 pins the oracle gate cannot see: both classes genuinely
  * populated, the warm-up gate holds, and the integer
  * cross-multiplication test is EQUIVALENT to the rational deviation
  * test it replaces (not an approximation of it). */
class RateAnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("both classes populated; warm-up hours never flag") {
    val rows = EventOps.rateAnomaly(spark, dir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("hour")))
      .collect()
    val anoms = rows.count(_.getAs[Long]("is_anom") == 1L)
    assert(anoms > 0, "no anomalies flagged")
    assert(anoms * 10 < rows.length, "more than 10% anomalous: threshold broken")
    rows.filter(_.getAs[Int]("rn") <= EventOps.AnomWarmup)
      .foreach(r => assert(r.getAs[Long]("is_anom") === 0L,
        s"warm-up hour flagged: ${r}"))
  }

  test("integer cross-multiplication equals the rational deviation test") {
    for (n <- 0L to 60L; tn <- 12L to 26L; sum <- Seq(50L, 137L, 480L)) {
      val viaInt = math.abs(n * tn - sum) > sum
      val mean = sum.toDouble / tn
      val viaRational = math.abs(n - mean) > mean
      assert(viaInt === viaRational, s"n=$n tn=$tn sum=$sum")
    }
  }
}
