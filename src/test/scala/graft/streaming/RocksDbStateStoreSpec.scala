package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** The stateful streaming family under the RocksDB state store — the
  * backend an unbounded-key 100 TB stream actually needs (HDFS-backed
  * state lives on the executor heap; RocksDB spills to local disk and
  * caps memory). Each pipeline must produce EXACTLY the values the
  * HDFS-backed default produces in StreamingSpec — asserted against
  * the same batch twins — covering all three state shapes:
  * mapGroupsWithState (q47), flatMapGroupsWithState (q85), and
  * dropDuplicatesWithinWatermark eviction state (q93). */
class RocksDbStateStoreSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private def asSet(rows: Seq[Row]): Set[Seq[String]] =
    rows.map(_.toSeq.map(String.valueOf)).toSet

  test("mapGroupsWithState user stats under RocksDB equal the batch aggregate (q47)") {
    val streamed = withRocksDb {
      EventsStream.runAvailableNow(
        spark, EventsStream.userStats(EventsStream.source(spark, dir)),
        "rocks_userstats", outputMode = "update")
    }
    val batch = graft.tables.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        date_trunc("second", min("ts")).as("first_s"),
        date_trunc("second", max("ts")).as("last_s"))
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("flatMapGroupsWithState chunker under RocksDB equals the batch chunks (q85)") {
    import org.apache.spark.sql.expressions.Window
    val streamed = withRocksDb {
      EventsStream.runAvailableNow(
        spark, EventsStream.chunkEvents(EventsStream.source(spark, dir)),
        "rocks_chunks", outputMode = "append")
    }
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

  test("watermarked dedup under RocksDB equals batch distinct (q93)") {
    val streamed = withRocksDb {
      EventsStream.runAvailableNow(
        spark,
        EventsStream.dedupKeysWithinWatermark(EventsStream.source(spark, dir)),
        "rocks_dedup_wm", outputMode = "append")
    }
    val batch = graft.tables.Tables.events(spark, dir)
      .select("user_id", "event_type").distinct()
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }

  test("fingerprint-keyed dedup under RocksDB equals batch distinct fingerprints") {
    val streamed = withRocksDb {
      EventsStream.runAvailableNow(
        spark,
        EventsStream.dedupKeyFingerprintsWithinWatermark(
          EventsStream.source(spark, dir)),
        "rocks_dedup_fp", outputMode = "append")
    }
    val batch = graft.tables.Tables.events(spark, dir)
      .select(xxhash64(col("user_id"), col("event_type")).as("key_fp"))
      .distinct()
    // set equality, not just count: a collision or a dropped key both
    // surface here (64-bit collisions are ~n²/2⁶⁵ — none at gate SF)
    assert(streamed.count() > 0)
    assert(asSet(streamed.collect().toSeq) === asSet(batch.collect().toSeq))
  }
}
