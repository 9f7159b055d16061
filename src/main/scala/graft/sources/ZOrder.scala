package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Z-order (Morton) clustering for MULTI-dimensional data skipping —
  * the layout lever when queries filter on two range keys and a single
  * sort column can only serve one of them (the 1-D case is the
  * range-sorted layout proven in ScalePlanSpec). Interleaving the bits
  * of both keys gives every parquet row group a tight min/max band on
  * BOTH columns at once, so either predicate (or their conjunction)
  * skips row groups without picking a winner dimension.
  *
  * The z-value is pure integer bit arithmetic (the classic
  * mask-spread: x |= x<<8 &c., one codegen'd expression chain — no UDF,
  * no shuffle), so computing it is a narrow map; clustering is then
  * `sortWithinPartitions(z)` at write time — a per-file sort, NOT a
  * global sort, exactly like the 1-D layout. ZOrderPlanSpec measures
  * the skipping; [[zorderLayout]] is the oracle-verified tile summary
  * showing each z-bucket covers a tight 2-D rectangle. */
object ZOrder {

  /** Bits kept per dimension (two 16-bit keys interleave into a 32-bit
    * z-value). */
  val DimBits = 16

  private val spreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spreads the low 16 bits of `x` to even bit positions (0,2,4,…30). */
  def spread16(x: Column): Column =
    spreadSteps.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (c, (s, m)) =>
      c.bitwiseOR(shiftleft(c, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton interleave of two 16-bit keys: y gets odd bits. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Min/max-normalizes a key to the full 16-bit range before
    * interleaving. REQUIRED when the two dimensions have unequal
    * domains: raw interleave lets the wider key's high bits dominate
    * the sort and the narrow dimension gets no locality at all
    * (measured: an unnormalized z-sort on (partkey, suppkey) skipped
    * zero row groups for suppkey predicates because suppkey's few bits
    * all sit below partkey's). Integer arithmetic end-to-end. */
  def norm16(x: Column, lo: Column, hi: Column): Column =
    // long/long `/` is double division in the Column API; the truncating
    // cast still equals exact integer division here because the numerator
    // is < 2^53 (exact in double) and the quotient granularity 1/denom is
    // orders of magnitude coarser than a double ulp at 16-bit magnitudes
    (((x - lo) * lit(65535L)) / greatest(hi - lo, lit(1L))).cast("long")

  def norm16Sql(x: String, lo: String, hi: String): String =
    s"((($x - $lo) * 65535) // greatest($hi - $lo, 1))"

  /** The same spread chain as DuckDB SQL (one expression, identical
    * integer semantics — shifts/masks on BIGINT). */
  private def spread16Sql(e: String): String =
    spreadSteps.foldLeft(s"($e & 65535)") { case (c, (s, m)) =>
      s"(($c | ($c << $s)) & $m)"
    }

  def zValueSql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** Tile shift for the summary query: keeping the top 6 z bits makes
    * an 8 × 8 grid of 2-D tiles over the normalized key space. */
  val ZBucketShift = 26

  /** Oracle-verified z-layout tile summary over lineitem
    * (l_partkey × l_suppkey): per z-tile, the row count and the 2-D
    * bounding rectangle. Tight rectangles per tile == the min/max
    * bands a parquet footer would carry per row group after a z-sorted
    * write — the data-skipping evidence in relational form (the actual
    * row-group skip is measured physically in the z-order plan spec).
    * The min/max normalization pass is one tiny aggregate broadcast
    * back over the scan — the same two-pass shape a production
    * OPTIMIZE ZORDER BY runs. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    val bounds = li.agg(
      min(col("l_partkey")).as("plo"), max(col("l_partkey")).as("phi"),
      min(col("l_suppkey")).as("slo"), max(col("l_suppkey")).as("shi"))
    li.crossJoin(broadcast(bounds))
      .select(col("l_partkey"), col("l_suppkey"),
        zValue(norm16(col("l_partkey"), col("plo"), col("phi")),
               norm16(col("l_suppkey"), col("slo"), col("shi"))).as("z"))
      .groupBy(shiftright(col("z"), ZBucketShift).as("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
  }

  val zorderLayoutSql: String =
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
       |         min(l_suppkey) AS slo, max(l_suppkey) AS shi
       |  FROM lineitem),
       |z AS (
       |  SELECT l_partkey, l_suppkey,
       |         ${zValueSql(norm16Sql("l_partkey", "plo", "phi"),
                            norm16Sql("l_suppkey", "slo", "shi"))} AS z
       |  FROM lineitem CROSS JOIN b)
       |SELECT z >> $ZBucketShift AS zbucket, count(*) AS n_rows,
       |       min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |       min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM z GROUP BY 1""".stripMargin
}
