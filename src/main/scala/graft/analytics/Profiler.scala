package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.Tables
import graft.functions.TextExprs.{polyHashCol, polyHashSql}

/** Single-pass column profiler (q172) — the Deequ/dbt-docs "profile
  * every column" operator a warehouse runs before constraints (q121)
  * are even written: per column, row/null/distinct counts and
  * canonicalized min/max, for EVERY column of the table, computed in
  * ONE aggregate pass (all 5·n_cols expressions in a single agg —
  * the profiler never scans per column). The plan is built FROM THE
  * SCHEMA at runtime — the dynamic-DataFrame shape: nothing here
  * names a column statically, so the same operator profiles any
  * table.
  *
  * Cross-engine min/max canonicalization (the driver compare hashes
  * values, and float/timestamp rendering differs between engines):
  * integers as-is; doubles as round(·100) cents; timestamps as epoch
  * seconds; strings as the polyhash OF the min/max string (string
  * ORDER is binary/lexicographic in both engines on this ASCII data,
  * and hashing after the aggregate keeps the value integer).
  *
  * Scale shape: one shuffle-free partial-agg pass per table (count/
  * min/max/null-count all map-side combinable); the exact
  * count(DISTINCT) expressions expand the shuffle ×n_cols (Spark's
  * multi-distinct Expand) — the documented 100 TB form swaps them for
  * `approx_count_distinct` (HLL, one pass, no Expand) at a 2% RSE;
  * exact is kept here because the oracle certifies exact. */
object Profiler {

  private def canonMin(f: StructField): Column = f.dataType match {
    case LongType | IntegerType => min(col(f.name)).cast("long")
    case DoubleType    => round(min(col(f.name)) * 100).cast("long")
    case TimestampType | TimestampNTZType =>
      unix_timestamp(min(col(f.name)).cast("timestamp")).cast("long")
    case StringType    => polyHashCol(min(col(f.name)))
    case other => throw new IllegalArgumentException(s"unprofiled type $other")
  }

  private def canonMax(f: StructField): Column = f.dataType match {
    case LongType | IntegerType => max(col(f.name)).cast("long")
    case DoubleType    => round(max(col(f.name)) * 100).cast("long")
    case TimestampType | TimestampNTZType =>
      unix_timestamp(max(col(f.name)).cast("timestamp")).cast("long")
    case StringType    => polyHashCol(max(col(f.name)))
    case other => throw new IllegalArgumentException(s"unprofiled type $other")
  }

  /** Profile every column of `df` in one aggregate pass. */
  def profile(df: DataFrame, table: String): DataFrame = {
    val fields = df.schema.fields
    val aggs = Seq(count(lit(1)).as("__n")) ++ fields.zipWithIndex.flatMap {
      case (f, i) => Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        countDistinct(col(f.name)).as(s"__dist_$i"),
        canonMin(f).as(s"__min_$i"),
        canonMax(f).as(s"__max_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      struct(lit(table).as("table_name"), lit(f.name).as("column_name"),
        col("__n").as("n_rows"), col(s"__nulls_$i").as("n_nulls"),
        col(s"__dist_$i").as("n_distinct"),
        col(s"__min_$i").as("min_v"), col(s"__max_$i").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  def profileTables(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir), "orders")
      .unionByName(profile(Tables.customer(spark, dir), "customer"))

  /** Oracle: one SELECT-block per column, per-type canonicalization
    * mirrored — the naive per-column formulation of the same stats. */
  val profileTablesSql: String = {
    def block(table: String, c: String, kind: String): String = {
      val (mn, mx) = kind match {
        case "int" => (s"CAST(min($c) AS BIGINT)", s"CAST(max($c) AS BIGINT)")
        case "dbl" => (s"CAST(round(min($c) * 100) AS BIGINT)",
                       s"CAST(round(max($c) * 100) AS BIGINT)")
        case "ts"  => (s"CAST(date_part('epoch', min($c)) AS BIGINT)",
                       s"CAST(date_part('epoch', max($c)) AS BIGINT)")
        case "str" => (polyHashSql(s"min($c)"), polyHashSql(s"max($c)"))
      }
      s"""SELECT '$table' AS table_name, '$c' AS column_name,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |       $mn AS min_v, $mx AS max_v
         |FROM $table""".stripMargin
    }
    val cols = Seq(
      ("orders", "o_orderkey", "int"), ("orders", "o_custkey", "int"),
      ("orders", "o_orderstatus", "str"), ("orders", "o_totalprice", "dbl"),
      ("orders", "o_orderdate", "ts"), ("orders", "o_orderpriority", "str"),
      ("customer", "c_custkey", "int"), ("customer", "c_name", "str"),
      ("customer", "c_nationkey", "int"), ("customer", "c_acctbal", "dbl"),
      ("customer", "c_mktsegment", "str"))
    cols.map { case (t, c, k) => block(t, c, k) }.mkString("\nUNION ALL\n")
  }
}
