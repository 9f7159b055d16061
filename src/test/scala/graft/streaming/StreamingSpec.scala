package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.EventOps
import graft.etl.SparkTestSession

/** Streaming forms must agree with their batch twins on the same input
  * (Trigger.AvailableNow drains the directory exactly once). */
class StreamingSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  private def asSet(rows: Seq[Row]): Set[Seq[String]] =
    rows.map(_.toSeq.map(String.valueOf)).toSet

  test("streaming tumbling window counts equal the batch result") {
    val streamed = EventsStream.runAvailableNow(
      spark, EventsStream.tumblingCounts(EventsStream.source(spark, dir)),
      "stream_tumbling")
    val batch = EventOps.tumblingCounts(spark, dir)
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("mapGroupsWithState per-user stats equal the batch aggregate") {
    import org.apache.spark.sql.functions._
    val streamed = EventsStream.runAvailableNow(
      spark, EventsStream.userStats(EventsStream.source(spark, dir)),
      "stream_userstats", outputMode = "update")
    val batch = graft.tables.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        date_trunc("second", min("ts")).as("first_s"),
        date_trunc("second", max("ts")).as("last_s"))
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("streaming funnel state machine equals the batch funnel (q129 vs q110)") {
    val streamed = EventsStream.funnelRollup(EventsStream.runAvailableNow(
      spark, EventsStream.funnelStages(EventsStream.source(spark, dir)),
      "stream_funnel", outputMode = "update"))
    val batch = EventOps.eventFunnel(spark, dir)
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
    // and the funnel is non-degenerate on the corpus
    val r = streamed.collect()(0)
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
  }

  test("streaming attribution state machine equals the batch attribution (q141 vs q137)") {
    val streamed = EventsStream.attributionRollup(EventsStream.runAvailableNow(
      spark, EventsStream.attributionStages(EventsStream.source(spark, dir)),
      "stream_attrib", outputMode = "update"))
    val batch = EventOps.purchaseAttribution(spark, dir)
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
    // non-degenerate: at least two channels earn purchases on the corpus
    assert(streamed.collect().length >= 2)
  }

  test("streaming sliding windows equal the batch result") {
    val streamed = EventsStream.runAvailableNow(
      spark, EventsStream.slidingCounts(EventsStream.source(spark, dir)),
      "stream_sliding")
    val batch = EventOps.slidingCounts(spark, dir)
    assert(streamed.count() > batch.select("window_start").distinct().count())
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("flatMapGroupsWithState chunker emits exactly the complete batch chunks") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val streamed = EventsStream.runAvailableNow(
      spark, EventsStream.chunkEvents(EventsStream.source(spark, dir)),
      "stream_chunks", outputMode = "append")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = graft.tables.Tables.events(spark, dir)
      .withColumn("idx", row_number().over(w) - 1)
      .withColumn("chunk_id", (col("idx") / 10).cast("int"))
      .groupBy("user_id", "chunk_id")
      .agg(date_trunc("second", min("ts")).as("first_s"),
        date_trunc("second", max("ts")).as("last_s"),
        round(sum("value"), 2).as("sum_value"),
        count(lit(1)).as("n"))
      .filter(col("n") === 10).drop("n")
    assert(streamed.count() > 0)
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("update-mode user stats survive a multi-file, multi-batch drain") {
    import org.apache.spark.sql.functions._
    // Split the events across TWO parquet files and force one file per
    // micro-batch: users now emit intermediate rows into the update-mode
    // sink, and only the keep-latest read makes the result correct.
    val tmp = java.nio.file.Files.createTempDirectory("graft_ev2_").toString
    val ev = graft.tables.Tables.events(spark, dir)
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(tmp)
    ev.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val sink = EventsStream.runAvailableNow(
      spark, EventsStream.userStats(stream), "stream_userstats_2files",
      outputMode = "update")
    // the sink really did accumulate stale rows across batches
    assert(sink.count() > sink.select("user_id").distinct().count())
    val streamed = EventsStream.latestUserStats(sink)
    val batch = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        date_trunc("second", min("ts")).as("first_s"),
        date_trunc("second", max("ts")).as("last_s"))
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("streaming stateful dedup emits exactly the batch-distinct key set") {
    val streamed = EventsStream.runAvailableNow(
      spark, EventsStream.dedupKeys(EventsStream.source(spark, dir)),
      "stream_dedup", outputMode = "append")
    val batch = graft.tables.Tables.events(spark, dir)
      .select("user_id", "event_type").distinct()
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = EventsStream.runAvailableNow(
      spark, EventsStream.intervalJoin(
        EventsStream.source(spark, dir), EventsStream.source(spark, dir)),
      "stream_interval", outputMode = "append")
    val batch = EventOps.intervalJoin(spark, dir)
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("streaming session windows equal the batch lag-based sessionization") {
    val streamed = EventsStream.runAvailableNow(
      spark, EventsStream.sessionize(EventsStream.source(spark, dir)),
      "stream_sessions")
    val batch = EventOps.sessionize(spark, dir)
      .selectExpr("user_id", "session_start", "n_events", "sum_value")
    assert(asSet(streamed.select("user_id", "session_start", "n_events", "sum_value")
      .collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("stream-static join rollup equals the batch join (q101)") {
    val streamed = EventsStream.runAvailableNow(
      spark, EventsStream.streamStaticNationRollup(
        EventsStream.source(spark, dir),
        graft.tables.Tables.customer(spark, dir)), "stream_static_spec")
    val batch = graft.tables.Tables.events(spark, dir)
      .join(graft.tables.Tables.customer(spark, dir),
        col("user_id") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("typed cogroup reconciliation equals the declarative full-outer twin (q102)") {
    val cg = EventOps.cogroupReconcile(spark, dir)
    val e = graft.tables.Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
    val o = graft.tables.Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_spend"))
    val twin = e.join(o, col("user_id") === col("o_custkey"), "full_outer")
      .select(coalesce(col("user_id"), col("o_custkey")).as("user_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("sum_spend"), lit(0.0)).as("sum_spend"))
    assert(asSet(cg.collect().toSeq) === asSet(twin.collect().toSeq))
  }

  test("foreachBatch parquet sink round-trips the purchase rollup (q100)") {
    val sunk = EventsStream.foreachBatchSink(spark, dir)
    val batch = graft.tables.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum("value"), 2).as("sum_value"))
    assert(asSet(sunk.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("persistent checkpoint: repeated AvailableNow drains process each file exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val dataDir = java.nio.file.Files.createTempDirectory("graft_ckpt_data").toString
    val ckpt    = java.nio.file.Files.createTempDirectory("graft_ckpt_meta").toString
    val outDir  = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    val events = graft.tables.Tables.events(spark, dir).select("event_id", "user_id")
    val sch = events.schema

    def drain(): Unit = {
      val q = spark.readStream.schema(sch).parquet(dataDir)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
          df.write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // the file source does not recurse into plain subdirs — land each
    // arrival as a single flat file, like the testdata layout
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dataDir/$name"))
    }

    // day 1: half the events arrive, first drain picks them up
    addFile(events.filter(col("event_id") % 2 === 0), "day1.parquet")
    drain()
    val afterFirst = spark.read.parquet(outDir)
    assert(afterFirst.count() === events.filter(col("event_id") % 2 === 0).count())

    // day 2: the rest arrives; the SAME checkpoint resumes and must
    // process only the new file — every event exactly once, no re-reads
    addFile(events.filter(col("event_id") % 2 === 1), "day2.parquet")
    drain()
    val all = spark.read.parquet(outDir)
    assert(all.count() === events.count())
    assert(all.select("event_id").distinct().count() === events.count())
  }

  test("dropDuplicatesWithinWatermark dedup equals batch distinct on a bounded drain") {
    // delay (60 d) covers the testdata span (30 d), so no key's state is
    // evicted mid-drain and the watermarked form must equal exact DISTINCT
    val streamed = EventsStream.runAvailableNow(
      spark, EventsStream.dedupKeysWithinWatermark(EventsStream.source(spark, dir)),
      "stream_dedup_wm", outputMode = "append")
    val batch = graft.tables.Tables.events(spark, dir)
      .select("user_id", "event_type").distinct()
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }
}
