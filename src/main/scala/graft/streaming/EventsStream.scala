package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructType}

/** Structured Streaming forms of the event-stream operators
  * (SURVEY.md §1: the reference's Airflow sensor→process loop
  * (`composer/sales_etl_dag.py:42-48`) maps onto Spark's file source +
  * `Trigger.AvailableNow` — "process whatever has arrived, then stop",
  * re-run per schedule).
  *
  * The batch twins in [[graft.analytics.EventOps]] carry the DuckDB
  * oracles; these streaming forms are verified by the spec against the
  * batch results on the same input.
  *
  * Scale notes: file-source streaming with `maxFilesPerTrigger` bounds
  * per-batch work; the watermark bounds window state; session windows
  * use the native `session_window` operator whose state store is keyed
  * by (user, session) — all standard multi-executor-safe machinery.
  */
object EventsStream {

  /** Streaming source over the events parquet directory, normalizing the
    * nanosecond `ts` (see Tables.events) to a microsecond timestamp.
    * The nanos legacy conf is scoped to schema inference and restored
    * (see Tables.withNanosAsLong). */
  def source(spark: SparkSession, dir: String): DataFrame = {
    val (schema: StructType, raw) = graft.tables.Tables.withNanosAsLong(spark) {
      val s = spark.read.parquet(s"$dir/events.parquet").schema
      // The file source needs a directory basePath; select just the
      // events file from the shared testdata dir via pathGlobFilter.
      (s, spark.readStream.schema(s)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    }
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Tumbling 1-hour window counts with a 1-hour watermark — the
    * streaming twin of EventOps.tumblingCounts. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Native session windows (30-minute gap) per user — the streaming
    * twin of EventOps.sessionize (which assigns session ids with lag +
    * running sum; same (user, session) partitioning of events). */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        date_trunc("second", col("session_window.start")).as("session_start"),
        col("n_events"), col("sum_value"))

  /** Run a streaming aggregate to completion over the files currently in
    * `dir` (Trigger.AvailableNow — the "sense, drain, stop" loop) and
    * return the final result from the in-memory sink.
    *
    * Session confs are tuned for the drain-then-stop shape and restored
    * afterwards: the per-batch checkpoint fsync+checksum tax and one
    * HDFS-backed state store per shuffle partition dominate a short run,
    * so state parallelism is capped and checkpoint file checksums are
    * skipped (the checkpoint is a temp dir, discarded on exit).
    */
  def runAvailableNow(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val conf = spark.conf
    val saved = Seq("spark.sql.shuffle.partitions",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.shuffle.partitions", "8")
    conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    try {
      val q = agg.writeStream
        .format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
    spark.table(name)
  }
}
