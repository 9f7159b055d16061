package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Keyed snapshot diff (q165) — the table-level change-data-capture
  * report every incremental pipeline needs between two loads: given
  * yesterday's and today's snapshot of a keyed table, classify every
  * key as added / removed / changed / unchanged, with a per-column
  * CHANGE MASK for the changed class, and aggregate the result into a
  * diff ledger (q153 localizes shared bytes INSIDE documents; this is
  * the row-level complement over keyed records — the shape of a Delta
  * MERGE audit or a warehouse reconciliation job).
  *
  * Snapshot convention (generator family): both snapshots derive
  * deterministically from `orders` — the old snapshot omits keys
  * ≡ 0 (mod 17) ("not yet loaded"), the new snapshot omits keys ≡ 0
  * (mod 19) ("deleted since") and rewrites keys ≡ 0 (mod 13) with a
  * +10% price (integer cents) and keys ≡ 0 (mod 11) with a terminal
  * status — so every class, including multi-column masks (key ≡ 0
  * mod 143), is populated and the expected ledger is closed-form.
  * Prices are compared in integer CENTS (round(price·100)) so the
  * diff predicate is exact in both engines.
  *
  * Scale shape: ONE full-outer sort-merge join on the snapshot key —
  * the canonical diff plan; the classification and mask are narrow
  * codegen'd projections on the joined row, and the ledger aggregates
  * with map-side combine. At 100 TB both snapshots would be bucketed
  * by key (q99's layout), turning the diff into a zero-shuffle
  * co-located merge; partition-pruned date columns bound it to
  * changed partitions. */
object SnapshotDiff {

  private def base(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      round(col("o_totalprice") * 100).cast("long").as("price_c"),
      col("o_orderpriority").as("prio"))

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    val old = b.filter(col("k") % 17 =!= 0)
      .select(col("k"), col("status").as("o_status"),
        col("price_c").as("o_price_c"), col("prio").as("o_prio"))
    val neu = b.filter(col("k") % 19 =!= 0)
      .select(col("k"),
        when(col("k") % 11 === 0, lit("X")).otherwise(col("status")).as("n_status"),
        when(col("k") % 13 === 0, col("price_c") + expr("price_c div 10"))
          .otherwise(col("price_c")).as("n_price_c"),
        col("prio").as("n_prio"))
    val joined = old.join(neu, Seq("k"), "full_outer")
    val mask = concat_ws(",", filter(array(
      when(col("n_status") =!= col("o_status"), lit("status")),
      when(col("n_price_c") =!= col("o_price_c"), lit("price")),
      when(col("n_prio") =!= col("o_prio"), lit("prio"))), c => c.isNotNull))
    val classified = joined
      .withColumn("change_type",
        when(col("o_status").isNull, lit("added"))
          .when(col("n_status").isNull, lit("removed"))
          .when(col("n_status") =!= col("o_status") ||
                col("n_price_c") =!= col("o_price_c") ||
                col("n_prio") =!= col("o_prio"), lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("change_mask",
        when(col("change_type") === "changed", mask).otherwise(lit("")))
    classified.groupBy("change_type", "change_mask")
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col("n_price_c"), col("o_price_c"))).as("total_price_c"),
        sum(when(col("change_type") === "changed",
          col("n_price_c") - col("o_price_c")).otherwise(0L)).as("price_delta_c"))
  }

  val snapshotDiffSql: String =
    """WITH b AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS status,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
      |         o_orderpriority AS prio
      |  FROM orders),
      |old AS (
      |  SELECT k, status AS o_status, price_c AS o_price_c, prio AS o_prio
      |  FROM b WHERE k % 17 != 0),
      |neu AS (
      |  SELECT k,
      |         CASE WHEN k % 11 = 0 THEN 'X' ELSE status END AS n_status,
      |         CASE WHEN k % 13 = 0 THEN price_c + price_c // 10
      |              ELSE price_c END AS n_price_c,
      |         prio AS n_prio
      |  FROM b WHERE k % 19 != 0),
      |j AS (
      |  SELECT coalesce(old.k, neu.k) AS k, o_status, o_price_c, o_prio,
      |         n_status, n_price_c, n_prio
      |  FROM old FULL OUTER JOIN neu ON old.k = neu.k),
      |c AS (
      |  SELECT *,
      |         CASE WHEN o_status IS NULL THEN 'added'
      |              WHEN n_status IS NULL THEN 'removed'
      |              WHEN n_status != o_status OR n_price_c != o_price_c
      |                   OR n_prio != o_prio THEN 'changed'
      |              ELSE 'unchanged' END AS change_type
      |  FROM j)
      |SELECT change_type,
      |       CASE WHEN change_type = 'changed' THEN
      |         array_to_string(list_filter(
      |           [CASE WHEN n_status != o_status THEN 'status' END,
      |            CASE WHEN n_price_c != o_price_c THEN 'price' END,
      |            CASE WHEN n_prio != o_prio THEN 'prio' END],
      |           x -> x IS NOT NULL), ',')
      |       ELSE '' END AS change_mask,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(coalesce(n_price_c, o_price_c)) AS BIGINT) AS total_price_c,
      |       CAST(sum(CASE WHEN change_type = 'changed'
      |                     THEN n_price_c - o_price_c ELSE 0 END) AS BIGINT)
      |         AS price_delta_c
      |FROM c GROUP BY 1, 2""".stripMargin
}
