package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._

/** Source/sink format coverage beyond parquet/CSV/binaryFile: JSONL
  * (the de-facto training-data interchange format) and ORC (the other
  * columnar format a lakehouse ingests), each proven by a full
  * write→read round trip whose aggregate must hash-match a DuckDB
  * oracle computed over the ORIGINAL parquet — a corrupted value,
  * dropped row, or type coercion anywhere in the round trip flips the
  * hash. (Avro is not bundled with this Spark build — the spark-avro
  * module is a separate artifact — so the matrix is parquet/CSV/JSONL/
  * ORC/binaryFile.)
  *
  * Scale notes: both writers shard by the upstream partitioning (one
  * file per task — at 100 TB the writer parallelism IS the reader
  * parallelism of the next stage); JSONL compresses and splits by line
  * so a downstream scan parallelizes per-block; the explicit read
  * schema skips the inference pass a blind `read.json` would pay (a
  * full extra scan of the data).
  */
object FormatRoundtrip {

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    TempDirs.deleteOnExit(d)
    d.toString
  }

  /** documents → JSONL → read back (explicit schema) → per-lang ledger
    * with a content-hash sum, so the text payload (including whatever
    * JSON must escape) is certified byte-identical through the round
    * trip, not just the row count. */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val out = tmpDir("graft_jsonl")
    docs.write.mode("overwrite").json(out)
    spark.read.schema(docs.schema).json(out)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(polyHashCol(col("text"))).as("content_sum"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
  }

  /** Oracle reads the ORIGINAL parquet — green iff the JSONL round trip
    * preserved every row and byte. */
  val jsonlRoundtripSql: String =
    s"""SELECT lang,
       |       count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       CAST(sum(${polyHashSql("text")}) AS BIGINT) AS content_sum,
       |       min(doc_id) AS min_id,
       |       max(doc_id) AS max_id
       |FROM documents GROUP BY lang""".stripMargin

  /** documents → CSV → read back, with a column BUILT to stress the
    * quoting machinery: embedded commas, double quotes, and a newline,
    * so the round trip proves escaping + multiLine parsing, not just
    * happy-path text (the reference's own ETL bug class — its naive
    * split corrupts quoted commas — is what a correct CSV sink/source
    * must not reproduce). The content hash covers the constructed
    * column, so one mangled byte anywhere flips the oracle hash. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        concat(lit("v,\""), col("lang"), lit("\"\n"), col("text")).as("tricky"))
    val out = tmpDir("graft_csv")
    docs.write.mode("overwrite").option("header", "true")
      // the writer TRIMS value-edge whitespace by default — that would
      // silently break the byte-identical contract on any doc whose
      // text starts/ends with whitespace
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    spark.read.schema(docs.schema)
      .option("header", "true").option("multiLine", "true").csv(out)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(polyHashCol(col("tricky"))).as("content_sum"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
  }

  /** Oracle constructs the same tricky column straight from parquet —
    * chr(10) mirrors the embedded newline. */
  val csvRoundtripSql: String =
    s"""SELECT lang,
       |       count(*) AS n_docs,
       |       CAST(sum(${polyHashSql("concat('v,\"', lang, '\"', chr(10), text)")}) AS BIGINT) AS content_sum,
       |       min(doc_id) AS min_id,
       |       max(doc_id) AS max_id
       |FROM documents GROUP BY lang""".stripMargin

  /** lineitem → ORC → read back → the q02-shaped revenue rollup; the
    * doubles round-trip bit-exactly (ORC stores IEEE doubles), and
    * revenue is quantized once per row to integer cents before the sum
    * (ORC write/read reorders rows, so a double sum's error becomes
    * order-dependent — at sf1-organic it crossed round(,2)'s
    * granularity; cents sums are order-free). */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val out = tmpDir("graft_orc")
    li.write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        (sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
          .cast("double") / 100.0).as("revenue"))
  }

  val orcRoundtripSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       count(*) AS n_rows,
      |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
      |FROM lineitem GROUP BY 1, 2""".stripMargin
}
