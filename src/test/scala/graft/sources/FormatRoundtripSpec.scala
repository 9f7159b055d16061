package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** The round-trip queries must equal the same aggregate computed
  * directly over the source parquet — any row loss, value corruption,
  * or type coercion in the write→read cycle breaks the equality. */
class FormatRoundtripSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("JSONL round trip preserves every row and byte of the corpus (q95)") {
    val direct = Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(graft.functions.TextExprs.polyHashCol(col("text"))).as("content_sum"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
    assert(asSet(FormatRoundtrip.jsonlRoundtrip(spark, dir)) === asSet(direct))
  }

  test("CSV round trip survives embedded commas, quotes, and newlines (q103)") {
    val direct = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        concat(lit("v,\""), col("lang"), lit("\"\n"), col("text")).as("tricky"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextExprs.polyHashCol(col("tricky"))).as("content_sum"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
    assert(asSet(FormatRoundtrip.csvRoundtrip(spark, dir)) === asSet(direct))
  }

  test("bucketed join is shuffle-free, correct, and re-runnable (q99)") {
    // the op itself REQUIREs a zero-Exchange executed plan; here we pin
    // value correctness against the plain-parquet join and exercise the
    // per-call table naming by running it twice in one session
    val direct = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100, 0).cast("long")).as("revenue_cents"))
    val first = Bucketing.bucketedJoin(spark, dir)
    assert(asSet(first) === asSet(direct))
    val second = Bucketing.bucketedJoin(spark, dir)
    assert(asSet(second) === asSet(direct))
  }

  test("ORC round trip preserves the lineitem aggregate bit-exactly (q96)") {
    val direct = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        (sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
          .cast("double") / 100.0).as("revenue"))
    assert(asSet(FormatRoundtrip.orcRoundtrip(spark, dir)) === asSet(direct))
  }
}
