package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q156/q157 pins the oracle gate cannot see: HLL is insertion-order
  * and partition invariant (register-wise max), so (a) merging daily
  * PARTIALS must give the IDENTICAL estimate as one sketch over the
  * raw stream, and (b) the streaming drain's estimate must equal the
  * batch estimate exactly — not merely within the error bound. */
class SketchRollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("merged daily partials equal the single-shot sketch exactly") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val viaPartials = ev
      .groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val singleShot = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaPartials === singleShot)
  }

  test("streaming sketch estimate equals the batch estimate exactly") {
    import graft.streaming.EventsStream
    val streamed = EventsStream.runAvailableNow(spark,
      EventsStream.sketchRollup(EventsStream.source(spark, dir)),
      "sketch_spec_drain", outputMode = "complete")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, dir).groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }
}
