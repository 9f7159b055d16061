package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Pins the bench harness's per-query watchdog contract
  * ([[Bench.runWithWatchdog]]): a hung query records a timeout error
  * instead of stalling the whole bench artifact, a failing query
  * surfaces its message, and a healthy query reports wall seconds. */
class BenchWatchdogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("healthy action returns Right(elapsed seconds)") {
    val r = Bench.runWithWatchdog(spark, "wd_ok", 60) {
      assert(spark.range(1000).count() === 1000L)
    }
    assert(r.isRight)
    assert(r.toOption.get > 0.0)
  }

  test("throwing action returns Left(first message line)") {
    val r = Bench.runWithWatchdog(spark, "wd_err", 60) {
      throw new IllegalStateException("boom line one\nline two")
    }
    assert(r === Left("boom line one"))
  }

  test("hung Spark job is cancelled and records a timeout, not a hang") {
    import org.apache.spark.sql.functions.{col, udf}
    val sleeper = udf { (x: Long) => Thread.sleep(30000L); x }
    val t0 = System.nanoTime()
    val r = Bench.runWithWatchdog(spark, "wd_hang", 2) {
      // filter (not select): count() would prune a projected UDF away
      spark.range(8).filter(sleeper(col("id")) >= 0).count(); ()
    }
    val waited = (System.nanoTime() - t0) / 1e9
    assert(r === Left("timeout after 2s"))
    // the cancel must land promptly — well inside the 30s the job
    // would have taken had the watchdog not killed it
    assert(waited < 20.0, s"watchdog took ${waited}s to reclaim control")
  }
}
