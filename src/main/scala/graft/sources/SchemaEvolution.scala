package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Parquet schema evolution across write generations (q249) — the gap
  * the reference cannot hit because its BigQuery table pins a fixed
  * 6-column REQUIRED schema (terraform/main.tf:74-105), but a 100 TB
  * training-data lake hits constantly: files written months apart
  * coexist in one table path with ADDED columns and WIDENED types, and
  * every reader must see one coherent schema without rewriting
  * history.
  *
  * The query materializes a two-generation table in place:
  *   gen v1 — (order_id INT, price_units INT), the even order keys;
  *   gen v2 — (order_id BIGINT, price_units BIGINT, channel STRING),
  *            the odd keys, appended to the SAME directory after the
  *            "schema migration" (ids outgrew int32 — the classic
  *            widening motive — and a provenance column was added).
  * It then reads the mixed directory back through ONE explicit target
  * schema: Spark's parquet readers upcast the v1 INT32 pages to the
  * requested BIGINT (supported widenings: int→long, float→double —
  * SPARK-40876) and null-fill the column v1 files don't carry. That
  * explicit-schema seam is the point: parquet `mergeSchema` handles
  * ADDED columns but REFUSES int32/int64 conflicts (StructType.merge
  * throws), so type evolution needs the reader-declared schema — the
  * behavior SchemaEvolutionSpec pins for both directions.
  *
  * The rollup over the unified read must hash-match a DuckDB oracle
  * that recomputes the same split arithmetically from the ORIGINAL
  * orders parquet — a dropped row, misrouted generation, bad upcast,
  * or wrong null-fill anywhere flips the hash.
  *
  * Scale shape: both generations shard by upstream partitioning; the
  * unified read is one scan with the schema applied per file (no
  * footer-merge pass over every file like `mergeSchema`, which at
  * 100 TB reads ~10⁶ footers on the driver before the query starts);
  * the rollup is one map-side-combined aggregate on a 4-value key. */
object SchemaEvolution {

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    TempDirs.deleteOnExit(d)
    d.toString
  }

  /** The unified post-evolution schema every new reader declares. */
  val TargetSchema = "order_id BIGINT, price_units BIGINT, channel STRING"

  /** Write the two generations of `src` (order_id, price_units,
    * channel columns expected) into one directory; returns its path.
    * Exposed for the spec. */
  def writeGenerations(src: DataFrame): String = {
    val out = tmpDir("graft_schema_evo")
    // generation v1: narrow types, no channel column
    src.filter(col("order_id") % 2 === 0)
      .select(col("order_id").cast("int").as("order_id"),
        col("price_units").cast("int").as("price_units"))
      .write.mode("overwrite").parquet(out)
    // generation v2: widened ids/prices + the new provenance column,
    // appended in place — old files are never rewritten
    src.filter(col("order_id") % 2 === 1)
      .select(col("order_id"), col("price_units"), col("channel"))
      .write.mode("append").parquet(out)
    out
  }

  private def withChannel(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("order_id"),
      floor(col("o_totalprice")).cast("long").as("price_units"),
      when(col("o_orderkey") % 2 === 1,
        when(col("o_orderkey") % 3 === 0, "web")
          .when(col("o_orderkey") % 3 === 1, "store")
          .otherwise("app"))
        .as("channel"))

  /** q249: evolve, read back through the target schema, roll up. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = writeGenerations(withChannel(spark, dir))
    spark.read.schema(TargetSchema).parquet(out)
      .groupBy(coalesce(col("channel"), lit("legacy")).as("channel"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_units")).as("units"),
        min(col("order_id")).as("min_id"),
        max(col("order_id")).as("max_id"))
  }

  /** Oracle: recompute the generation split + channel derivation
    * straight from the source parquet — independent of the evolved
    * files entirely, so it cross-checks the whole write→evolve→read
    * path, not just the rollup. */
  val schemaEvolutionSql: String =
    """WITH src AS (
      |  SELECT o_orderkey AS order_id,
      |         CAST(floor(o_totalprice) AS BIGINT) AS price_units,
      |         CASE WHEN o_orderkey % 2 = 1 THEN
      |           CASE WHEN o_orderkey % 3 = 0 THEN 'web'
      |                WHEN o_orderkey % 3 = 1 THEN 'store'
      |                ELSE 'app' END
      |         END AS channel
      |  FROM orders)
      |SELECT coalesce(channel, 'legacy') AS channel,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(price_units) AS BIGINT) AS units,
      |       CAST(min(order_id) AS BIGINT) AS min_id,
      |       CAST(max(order_id) AS BIGINT) AS max_id
      |FROM src GROUP BY 1""".stripMargin
}
