package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** Properties of the Morton interleave that the data-skipping claim
  * rests on (the physical row-group measurement lives in
  * ScalePlanSpec's z-order case). */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private lazy val pairs = Seq.fill(2000)(
    (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)).toDF("x", "y")

  test("zValue is a bijection: de-interleaving the bits recovers both keys") {
    // extract even bits (x) and odd bits (y) by folding the spread masks
    // in reverse — implemented directly in SQL so the test is
    // independent of the production code path
    def unspread(e: String): String = {
      val s1 = s"($e & 1431655765)"                       // keep even bits
      val s2 = s"(($s1 | ($s1 >> 1)) & 858993459)"
      val s3 = s"(($s2 | ($s2 >> 2)) & 252645135)"
      val s4 = s"(($s3 | ($s3 >> 4)) & 16711935)"
      s"(($s4 | ($s4 >> 8)) & 65535)"
    }
    val checked = pairs
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .withColumn("x2", expr(unspread("z")))
      .withColumn("y2", expr(unspread("(z >> 1)")))
      .filter(col("x2") =!= col("x") || col("y2") =!= col("y"))
    assert(checked.count() === 0)
  }

  test("z tile prefix property: top 2k bits of z == z of the top k bits of each key") {
    // this is exactly why a z-range file covers a 2-D rectangle: fixing
    // a z prefix fixes a prefix of BOTH keys
    for (k <- Seq(2, 5, 8)) {
      val bad = pairs
        .withColumn("z", ZOrder.zValue(col("x"), col("y")))
        .withColumn("ztile", shiftright(col("z"), 2 * (16 - k)))
        .withColumn("ktile", ZOrder.zValue(
          shiftright(col("x"), 16 - k), shiftright(col("y"), 16 - k)))
        .filter(col("ztile") =!= col("ktile"))
      assert(bad.count() === 0, s"prefix property fails at k=$k")
    }
  }

  test("norm16 maps the domain ends to 0 and 65535 and is monotone") {
    val df = Seq((0L, 0L, 1000L), (500L, 0L, 1000L), (1000L, 0L, 1000L),
      (7L, 7L, 7L)) // degenerate lo==hi guarded by greatest(,1)
      .toDF("x", "lo", "hi")
      .select(ZOrder.norm16(col("x"), col("lo"), col("hi")).as("n"))
      .collect().map(_.getLong(0))
    assert(df(0) === 0L && df(2) === 65535L && df(1) > 0 && df(1) < 65535L)
    assert(df(3) === 0L)
  }
}
