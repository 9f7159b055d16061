package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Orchestration negative paths (SURVEY.md §2c O1/O3): the pipeline
  * must abort — like the reference's sensor timeout and
  * BigQueryCheckOperator — when the input is missing or the quality
  * gate fails. */
class SalesPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("missing input aborts before running the ETL (O1)") {
    val e = intercept[IllegalArgumentException] {
      SalesPipeline.run(spark, "/nonexistent/input.csv", "/tmp/graft_pipe_out")
    }
    assert(e.getMessage.contains("input not found"))
  }

  test("failure alerting fires the onFailure callback and still aborts (O5)") {
    // An input whose every row fails validation leaves the clean table
    // empty, so the O3 gate (count == 1) trips — the induced failure.
    val tmp = java.nio.file.Files.createTempDirectory("graft_o5_")
    val input = tmp.resolve("bad.csv")
    java.nio.file.Files.writeString(input,
      "id,product,price,quantity,sale_date\nx1,Widget,-5,0,not-a-date\n")
    var alerted: Option[Throwable] = None
    val e = intercept[IllegalArgumentException] {
      SalesPipeline.run(spark, input.toString, tmp.resolve("out").toString,
        onFailure = t => alerted = Some(t))
    }
    assert(e.getMessage.contains("data quality check failed"))
    assert(alerted.exists(_ eq e), "onFailure must receive the failing exception")
  }

  test("a throwing alert transport cannot mask the pipeline's root cause (O5)") {
    val e = intercept[IllegalArgumentException] {
      SalesPipeline.run(spark, "/nonexistent/input.csv", "/tmp/graft_o5_mask",
        onFailure = _ => throw new RuntimeException("smtp down"))
    }
    assert(e.getMessage.contains("input not found"))
    assert(e.getSuppressed.exists(_.getMessage == "smtp down"))
  }

  test("a transient failure succeeds on retry (O6)") {
    // attempt 0: input missing (sensor-style transient); the delay hook
    // "delivers" the file, so attempt 1 runs the full pipeline cleanly
    val tmp = java.nio.file.Files.createTempDirectory("graft_o6_")
    val input = tmp.resolve("sales.csv")
    var delays = List.empty[Long]
    val r = SalesPipeline.runWithRetries(
      spark, input.toString, tmp.resolve("out").toString,
      retries = 2, retryDelayMs = 123L,
      sleep = ms => {
        delays ::= ms
        java.nio.file.Files.copy(
          java.nio.file.Paths.get("src/test/resources/messy_sales_data.csv"), input)
      })
    assert(r.cleanRows === 12L && r.errorRows === 14L)
    assert(delays === List(123L), "exactly one retry delay, with the configured backoff")
  }

  test("a persistent failure exhausts retries, alerts per attempt, and keeps the history (O6+O5)") {
    var alerts = 0
    var sleeps = 0
    val e = intercept[IllegalArgumentException] {
      SalesPipeline.runWithRetries(spark, "/nonexistent/input.csv", "/tmp/graft_o6_out",
        retries = 2, retryDelayMs = 1L,
        onFailure = _ => alerts += 1, sleep = _ => sleeps += 1)
    }
    assert(e.getMessage.contains("input not found"))
    assert(alerts === 3, "every failed attempt must alert (retries=2 → 3 attempts)")
    assert(sleeps === 2)
    // the thrown exception carries the previous attempt as suppressed
    assert(e.getSuppressed.nonEmpty &&
      e.getSuppressed.head.getMessage.contains("input not found"))
  }

  test("quality gate rejects a table with duplicate ids / broken totals (O3)") {
    import spark.implicits._
    val bad = Seq(
      ("1", "Laptop", 10.0, 2L, java.sql.Date.valueOf("2024-01-15"), 20.0),
      ("1", "Laptop", 10.0, 2L, java.sql.Date.valueOf("2024-01-15"), 20.0), // dup id
      ("2", "Mouse", 5.0, 1L, java.sql.Date.valueOf("2024-01-16"), 99.0)    // wrong total
    ).toDF("id", "product", "price", "quantity", "sale_date", "total_sale")
    assert(SalesQueries.validateQuality(bad).count() === 0)
    val good = Seq(
      ("1", "Laptop", 10.0, 2L, java.sql.Date.valueOf("2024-01-15"), 20.0),
      ("2", "Mouse", 5.0, 1L, java.sql.Date.valueOf("2024-01-16"), 5.0)
    ).toDF("id", "product", "price", "quantity", "sale_date", "total_sale")
    assert(SalesQueries.validateQuality(good).count() === 1)
  }
}
