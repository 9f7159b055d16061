package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Incremental materialized-view maintenance (q175) — the rollup
  * update path every warehouse runs nightly: a monthly revenue MV
  * exists over yesterday's orders; a delta batch arrives; instead of
  * recomputing the MV over the full history, the delta is aggregated
  * ALONE and MERGED into the stored partials — legal exactly because
  * count/sum are commutative monoids (the same algebra that makes
  * Spark's own partial aggregation correct). The ORACLE is the full
  * recompute over base ∪ delta, so a green hash IS the proof that
  * merge ≡ recompute on this data; `n_delta` is emitted per group so
  * the untouched-group mass (merge cost ∝ delta-affected groups, not
  * history) is observable in the result.
  *
  * Snapshot convention (generator family): base = orders with key ≢ 7
  * (mod 10); delta = the ≡ 7 residue class — every month receives
  * delta rows, and the ledger shows how few rows the merge actually
  * touched. Prices aggregate in integer cents (round(·100)) so the
  * merged and recomputed sums are bit-identical.
  *
  * Scale shape: the delta aggregate scans the DELTA only (a
  * partition-pruned scan in a date-partitioned warehouse); the merge
  * is a group-key union-aggregate over MV-sized rows — history is
  * never re-read. That asymmetry is the whole point of the operator:
  * recompute is O(history), maintenance is O(delta + MV). */
object MvMaintain {

  def mvMerge(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"),
      date_trunc("month", col("o_orderdate")).as("month"),
      round(col("o_totalprice") * 100).cast("long").as("price_c"))
    def rollup(df: DataFrame, isDelta: Boolean) = df
      .groupBy("month")
      .agg(count(lit(1)).as("n"), sum(col("price_c")).as("s"))
      .withColumn("d", lit(if (isDelta) 1L else 0L))
    val mvBase  = rollup(o.filter(col("k") % 10 =!= 7), isDelta = false)
    val mvDelta = rollup(o.filter(col("k") % 10 === 7), isDelta = true)
    mvBase.unionByName(mvDelta)
      .groupBy("month")
      .agg(sum(col("n")).as("n_orders"),
        sum(col("s")).as("sum_price_c"),
        sum(when(col("d") === 1L, col("n")).otherwise(0L)).as("n_delta"))
  }

  /** Oracle: the FULL RECOMPUTE over base ∪ delta — hash equality
    * proves the incremental merge changed cost, not answer. */
  val mvMergeSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |       CAST(sum(CASE WHEN o_orderkey % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
      |FROM orders GROUP BY 1""".stripMargin
}
