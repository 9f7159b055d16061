package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import graft.etl.SparkTestSession

/** Checkpoint crash-recovery proofs: the AvailableNow drains elsewhere
  * in the suite show steady-state correctness; these tests KILL a query
  * mid-stream and prove the checkpoint restores (a) stateful operator
  * state and (b) exactly-once sink output on the retried batch —
  * end-to-end, against the batch oracle. */
class CrashRecoverySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  /** Land `df` as ONE flat parquet file in `dataDir` (the file source
    * does not recurse into plain subdirs). */
  private def addFile(dataDir: String, df: DataFrame, name: String): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft_stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dataDir/$name"))
  }

  test("stateful mapGroupsWithState survives a stop/restart: resumed state equals the batch oracle") {
    val dataDir = java.nio.file.Files.createTempDirectory("graft_cr_data").toString
    val ckpt    = java.nio.file.Files.createTempDirectory("graft_cr_ckpt").toString
    val outDir  = java.nio.file.Files.createTempDirectory("graft_cr_out").toString
    val events  = graft.tables.Tables.events(spark, dir)
    val sch     = events.schema

    def drain(): Unit = {
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dataDir)
      val q = EventsStream.userStats(graft.tables.Tables.normalizeTs(stream))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
          df.write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: half the corpus arrives (even event_ids), drain, "crash"
    // (the query object and every in-JVM state handle are discarded —
    // only the checkpoint survives, as after a process kill)
    addFile(dataDir, events.filter(col("event_id") % 2 === 0), "half1.parquet")
    drain()
    // run 2: the rest arrives; the restart must RESTORE per-user
    // running (count, sum, min_ts, max_ts) from the state store — a
    // user spanning both halves reports the union only if the restored
    // state is exact
    addFile(dataDir, events.filter(col("event_id") % 2 === 1), "half2.parquet")
    drain()

    val sink = spark.read.parquet(outDir)
    // update mode really did emit per-batch intermediate rows
    assert(sink.count() > sink.select("user_id").distinct().count(),
      "expected intermediate update-mode rows across batches")
    val streamed = EventsStream.latestUserStats(sink)
      .select(col("user_id"), col("n_events"), col("sum_value"),
        col("first_s"), col("last_s"))
    val batch = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        date_trunc("second", min("ts")).as("first_s"),
        date_trunc("second", max("ts")).as("last_s"))
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s === b, "post-restart state diverged from the batch oracle")
  }

  @volatile private var crashArmed = true

  test("mid-stream batch failure: restart re-runs the failed batch, sink stays exactly-once") {
    val dataDir = java.nio.file.Files.createTempDirectory("graft_cr2_data").toString
    val ckpt    = java.nio.file.Files.createTempDirectory("graft_cr2_ckpt").toString
    val outDir  = java.nio.file.Files.createTempDirectory("graft_cr2_out").toString
    val events  = graft.tables.Tables.events(spark, dir)
      .select("event_id", "user_id", "value")
    val sch = events.schema
    (0 until 4).foreach(i =>
      addFile(dataDir, events.filter(col("event_id") % 4 === i), s"part$i.parquet"))

    def drain(): Unit = {
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dataDir)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
          if (id == 2 && crashArmed) {
            crashArmed = false
            throw new RuntimeException("injected crash in batch 2")
          }
          // idempotent sink: a RETRIED batch overwrites itself
          df.write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1 dies inside batch 2 — batches 0,1 committed, 2 is not
    val ex = intercept[StreamingQueryException] { drain() }
    assert(ex.getMessage.contains("injected crash") ||
      Option(ex.getCause).exists(_.getMessage.contains("injected crash")))
    val committed = new java.io.File(outDir).listFiles().map(_.getName).toSet
    assert(committed === Set("batch=0", "batch=1"),
      s"expected exactly batches 0,1 before the crash, got $committed")

    // run 2 from the same checkpoint: must RE-EXECUTE batch 2 (its
    // offsets were logged but never committed), then finish batch 3
    drain()
    val batches = new java.io.File(outDir).listFiles().map(_.getName).toSet
    assert(batches === Set("batch=0", "batch=1", "batch=2", "batch=3"))
    // exactly-once end-to-end: every event id exactly once despite the
    // crash-and-retry
    val out = spark.read.parquet(outDir)
    assert(out.count() === events.count())
    assert(out.select("event_id").distinct().count() === events.count())
  }
}
