package graft.etl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the ETL validate/clean chain (SURVEY.md §5d):
  *  - every input line lands in exactly one of {clean, error};
  *  - every clean row satisfies the derived-column invariant and the
  *    declared value domains;
  *  - clean ids are unique (first-wins dedup).
  * Generators cover valid rows plus targeted corruptions of each field;
  * seeds are fixed so failures reproduce.
  */
class SalesEtlPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val genId = Gen.chooseNum(0, 40).map(_.toString)
  private val genProduct = Gen.oneOf("Laptop", "Phone", "Webcam", "'Quoted'", "  padded  ", "")
  private val genPrice = Gen.oneOf(
    Gen.chooseNum(1, 100000).map(c => (c / 100.0).toString),
    Gen.oneOf("-1", "0", "abc", ""))
  private val genQty = Gen.oneOf(
    Gen.chooseNum(1L, 99L).map(_.toString),
    Gen.oneOf("0", "-2", "1.5", "x", ""))
  private val genDate = Gen.oneOf(
    "2024-01-15", "2024/01/22", "2024-18-01", "not-a-date", "")
  private val genLine = for {
    id <- genId; p <- genProduct; pr <- genPrice; q <- genQty; d <- genDate
  } yield s"$id,$p,$pr,$q,$d"
  private val genBatch = Gen.listOfN(60, genLine)

  test("clean ⊕ error partition, derived column, and id uniqueness hold") {
    import scala.jdk.CollectionConverters._
    (1 to 8).foreach { trial =>
      val lines = genBatch(Gen.Parameters.default, Seed(trial.toLong)).get
      val df = spark.createDataFrame(
        lines.map(org.apache.spark.sql.Row(_)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
      val (clean, errors) = SalesEtl.parseAndValidate(df)
      val cleanRows = clean.collect()
      val nErr = errors.count()
      assert(cleanRows.length + nErr === lines.length, s"partition failed (seed=$trial)")
      cleanRows.foreach { r =>
        assert(r.getAs[Double]("total_sale") ===
          r.getAs[Double]("price") * r.getAs[Long]("quantity"))
        assert(r.getAs[Double]("price") > 0 && r.getAs[Long]("quantity") > 0)
        assert(r.getAs[String]("id").forall(_.isDigit))
        assert(!r.getAs[String]("product").exists(c => c == '"' || c == '\''))
      }
      val ids = cleanRows.map(_.getAs[String]("id"))
      assert(ids.distinct.length === ids.length, s"duplicate ids survived (seed=$trial)")
    }
  }
}
