package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** Pins the old-reader/new-reader contract of q249's two-generation
  * layout — the behaviors the oracle rollup can't distinguish:
  * which files each read path sees, how the widened column is
  * upcast, and exactly where vanilla `mergeSchema` stops working
  * (the reason the explicit-schema seam exists). */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private lazy val src = graft.tables.Tables.orders(spark, dir).select(
    col("o_orderkey").as("order_id"),
    floor(col("o_totalprice")).cast("long").as("price_units"),
    when(col("order_id") % 2 === 1, lit("web")).as("channel"))

  test("new reader: explicit target schema upcasts v1 int32 and null-fills the added column") {
    val out = SchemaEvolution.writeGenerations(src)
    val uni = spark.read.schema(SchemaEvolution.TargetSchema).parquet(out)
    val total = src.count()
    assert(uni.count() === total, "unified read dropped rows")
    // v1 rows (even ids): channel null-filled; values upcast losslessly
    val v1 = uni.filter(col("order_id") % 2 === 0)
    assert(v1.filter(col("channel").isNotNull).count() === 0)
    val wantV1 = src.filter(col("order_id") % 2 === 0)
      .agg(sum("price_units"), sum("order_id")).head
    val gotV1 = v1.agg(sum("price_units"), sum("order_id")).head
    assert(gotV1 === wantV1, "int32→int64 upcast corrupted v1 values")
    // v2 rows kept their channel
    assert(uni.filter(col("order_id") % 2 === 1 && col("channel").isNull).count() === 0)
  }

  test("mergeSchema handles the ADDED column when types agree") {
    val d = java.nio.file.Files.createTempDirectory("evo_add")
    TempDirs.deleteOnExit(d)
    src.filter(col("order_id") % 2 === 0).select("order_id", "price_units")
      .write.mode("overwrite").parquet(d.toString)
    src.filter(col("order_id") % 2 === 1)
      .write.mode("append").parquet(d.toString)
    val merged = spark.read.option("mergeSchema", "true").parquet(d.toString)
    assert(merged.columns.sorted.toSeq === Seq("channel", "order_id", "price_units"))
    assert(merged.count() === src.count())
    assert(merged.filter(col("order_id") % 2 === 0 && col("channel").isNotNull).count() === 0)
  }

  test("mergeSchema REFUSES the widened int32/int64 conflict — the explicit-schema seam is load-bearing") {
    val out = SchemaEvolution.writeGenerations(src)
    val e = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(out).schema
    }
    val msg = Option(e.getMessage).getOrElse("") + Option(e.getCause)
      .flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.contains("merge") || msg.toLowerCase.contains("incompatible"),
      s"expected a schema-merge failure, got: $e")
  }

  test("old v1 reader still reads a pre-evolution snapshot unchanged") {
    // evolution appends — it never rewrites v1 files, so a reader
    // pinned to the v1 schema over a v1-only snapshot is untouched
    val d = java.nio.file.Files.createTempDirectory("evo_v1")
    TempDirs.deleteOnExit(d)
    src.filter(col("order_id") % 2 === 0)
      .select(col("order_id").cast("int").as("order_id"),
        col("price_units").cast("int").as("price_units"))
      .write.mode("overwrite").parquet(d.toString)
    val v1 = spark.read.schema("order_id INT, price_units INT").parquet(d.toString)
    assert(v1.count() === src.filter(col("order_id") % 2 === 0).count())
    assert(v1.schema.fields.map(_.dataType.simpleString).toSeq === Seq("int", "int"))
  }
}
