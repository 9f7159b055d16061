package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). One parquet file per table under `dir`.
  *
  * All loaders are plain parquet scans so Catalyst predicate pushdown
  * and column pruning apply to every downstream query.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * rejects by default (PARQUET_TYPE_ILLEGAL). Read it as a nano-epoch
    * long (legacy conf) and convert to a microsecond timestamp —
    * truncation ns→µs matches DuckDB's epoch_ms()/date_trunc semantics
    * downstream. The conf is only consulted while `spark.read.parquet`
    * infers the schema (verified empirically: execution with the conf
    * reset still succeeds), so it is restored immediately — no lasting
    * session-state side effect for concurrent users.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(withNanosAsLong(spark)(table(spark, dir, "events")))

  /** Normalize `ts` to a session-zone TIMESTAMP regardless of how the
    * driver generated the parquet: TIMESTAMP(NANOS) arrives as a
    * nano-epoch long (via nanosAsLong) and is truncated to micros;
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ
    * and is cast — value-preserving under the UTC session this library
    * pins, and required because the epoch functions (`unix_micros` in
    * q137/q141, `unix_millis` in q14/q60) reject NTZ inputs. */
  def normalizeTs(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType =>
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      raw.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => raw
  }

  /** Runs `body` with spark.sql.legacy.parquet.nanosAsLong=true and
    * restores the previous value (schema inference happens inside). */
  def withNanosAsLong[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Spread an under-partitioned scan across the session's cores.
    *
    * The driver testdata is ONE parquet split per table, which would
    * serialize every CPU-heavy map (tokenize/shingle/hash) onto a single
    * task. A production deployment reads thousands of splits and must
    * NOT pay an extra full shuffle — so the round-robin repartition only
    * fires when the scan exposes fewer partitions than the session's
    * parallelism. At 100 TB this is a no-op; on a laptop-sized file it
    * unlocks all cores. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Repartition ONLY when the scan provably cannot reach `target`
    // partitions on its own: fewer files than cores AND total bytes
    // below cores × maxPartitionBytes (file splitting would not create
    // enough partitions either). Both signals come from the file index
    // / logical stats — no second physical-plan compile (the df.rdd
    // probe this replaces) — and a single LARGE splittable file no
    // longer triggers a pointless full shuffle.
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    lazy val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (df.inputFiles.length < target && bytes < BigInt(maxPart) * target)
      df.repartition(target)
    else df
  }
}
