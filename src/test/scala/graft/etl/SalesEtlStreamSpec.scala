package graft.etl

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ETL must produce the same clean/dead-letter split as
  * the batch pipeline on the golden fixture (single file → single
  * micro-batch → identical claim scope). */
class SalesEtlStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("streaming drain of the golden CSV matches the batch 12/14 split") {
    val work = Files.createTempDirectory("etl-stream").toString
    val inDir = Files.createDirectory(Paths.get(work, "in"))
    Files.copy(Paths.get("src/test/resources/messy_sales_data.csv"),
      inDir.resolve("messy_sales_data.csv"), StandardCopyOption.REPLACE_EXISTING)

    val (clean, errors) = SalesEtlStream.run(spark, inDir.toString, s"$work/out")
    assert(clean === 12L)
    assert(errors === 14L)

    // value-level equality with the batch pipeline
    val streamed = spark.read.parquet(s"$work/out/clean")
    val (batchClean, _) = SalesEtl.parseAndValidate(
      spark.read.text(inDir.toString))
    assert(streamed.collect().map(_.toString).sorted
      === batchClean.collect().map(_.toString).sorted)
  }

  test("an empty drain reports zero rows instead of throwing") {
    val work = Files.createTempDirectory("etl-stream-empty").toString
    Files.createDirectory(Paths.get(work, "in"))
    val (c, e) = SalesEtlStream.run(spark, s"$work/in", s"$work/out")
    assert(c === 0L && e === 0L)
  }

  test("a second drain with a new file appends only the new batch") {
    val work = Files.createTempDirectory("etl-stream2").toString
    val inDir = Files.createDirectory(Paths.get(work, "in"))
    Files.copy(Paths.get("src/test/resources/messy_sales_data.csv"),
      inDir.resolve("a.csv"), StandardCopyOption.REPLACE_EXISTING)
    val (c1, e1) = SalesEtlStream.run(spark, inDir.toString, s"$work/out")
    assert(c1 === 12L && e1 === 14L)

    // drop in one new well-formed file; the re-run processes ONLY it
    // (file-source checkpoint), appending 1 clean row
    Files.writeString(inDir.resolve("b.csv"),
      "id,product,price,quantity,sale_date\n900,Widget,10.0,2,2024-03-01\n")
    val (c2, e2) = SalesEtlStream.run(spark, inDir.toString, s"$work/out")
    assert(c2 === 13L && e2 === 14L)
  }
}
