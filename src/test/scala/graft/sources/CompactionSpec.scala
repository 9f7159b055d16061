package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** Small-file compaction — the maintenance pass every streaming/
  * incremental sink needs: thousands of per-batch files re-written to
  * target-size files so downstream scans stop paying per-file open
  * cost. The rewrite must be byte-preserving (same rows, same values)
  * and actually hit the target file count. */
class CompactionSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  private def parquetFiles(path: String): Array[java.io.File] =
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction reduces the file count without touching a row or byte") {
    val fragmented = Files.createTempDirectory("graft_fragmented").toString
    val compacted  = Files.createTempDirectory("graft_compacted").toString
    // a streaming sink's typical aftermath: many tiny files
    Tables.lineitem(spark, dir).repartition(64)
      .write.mode("overwrite").parquet(fragmented)
    assert(parquetFiles(fragmented).length === 64)

    // the compaction pass: coalesce to the target count and rewrite
    spark.read.parquet(fragmented).repartition(4)
      .write.mode("overwrite").parquet(compacted)
    assert(parquetFiles(compacted).length === 4)

    // content-preserving: row count and full-column checksum agree
    def digest(path: String) = spark.read.parquet(path)
      .agg(count(lit(1)).as("n"),
        sum(hash(col("*"))).as("rowhash"))
      .head()
    assert(digest(compacted) === digest(fragmented))
  }
}
