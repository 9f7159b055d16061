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
    * nanosecond `ts` (see Tables.events) to a microsecond timestamp. */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema: StructType = spark.read.parquet(s"$dir/events.parquet").schema
    // The file source needs a directory basePath; select just the events
    // file from the shared testdata dir via pathGlobFilter.
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
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
    * return the final result from the in-memory sink. */
  def runAvailableNow(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
