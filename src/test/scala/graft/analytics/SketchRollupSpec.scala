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

  test("q170: streaming KMV sketch is BIT-equal to its batch twin and near exact") {
    import graft.streaming.EventsStream
    val key = (r: org.apache.spark.sql.Row) =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val streamed = EventsStream.runAvailableNow(spark,
      EventsStream.kmvUsers(EventsStream.source(spark, dir)),
      "kmv_spec_drain", outputMode = "complete").collect().map(key).toMap
    val batch = EventsStream.kmvUsers(Tables.events(spark, dir))
      .collect().map(key).toMap
    assert(streamed === batch)
    // accuracy: KMV RSE ≈ 1/√(K−2) ≈ 12.7%; gate at 3σ
    val exact = Tables.events(spark, dir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    streamed.foreach { case (t, (_, _, _, est)) =>
      assert(math.abs(est - exact(t)) <= math.max(2L, (exact(t) * 0.4).toLong),
        s"$t: KMV estimate $est vs exact ${exact(t)}")
    }
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
