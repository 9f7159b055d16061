package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Distribution-drift monitor (q197) — the ingest-gate check a
  * training-data pipeline runs between corpus snapshots before letting
  * a new batch into the mix: has the per-stream value distribution
  * moved enough that downstream mixtures (q77/q89/q182) and trained
  * filters (q146/q149) were fit on stale data?
  *
  * The events table is split into a REFERENCE window and a CURRENT
  * window at the midpoint of its time span (scale-free: the boundary
  * derives from min/max event time, never from a constant). Each
  * event_type's value distribution is histogrammed into fixed
  * [[DriftOps.BandCents]]-wide bands, and the drift statistic is the
  * exact total-variation distance in parts-per-million:
  * TV = Σ_bands |p_ref − p_cur| / 2 with both sides in integer ppm —
  * the repo's FP-safe discipline (no KL/PSI logarithm: TV is the
  * metric with an exact integer form, bounded [0, 1e6], and it is the
  * statistic PSI thresholds approximate anyway). A stream whose TV
  * exceeds [[DriftOps.DriftTvPpmThreshold]] is flagged.
  *
  * Scale shape: ONE scan — a single map-side-combinable
  * (event_type, band, window) count aggregate (the window tag is a
  * scalar comparison against a broadcast 1-row min/max aggregate),
  * pivoted to ref/cur columns by conditional sums in the SAME
  * aggregate, then a tiny per-type rollup. Shuffled keys are
  * (type, band) tuples — bounded by type-count × band-count, never by
  * event count, so the plan is identical at 100 TB. The oracle derives
  * the same ledger from two INDEPENDENT per-window histograms
  * FULL-OUTER-joined — a green hash certifies the fused single-pass
  * pivot against the naive two-pass form.
  *
  * Integer-range: cnt·10⁶ needs a per-(type,band) count < 9.2e12 —
  * comfortably true even at 10¹² events per type (counts split across
  * ~100 bands); the per-band quotient is ≤ 10⁶ so the TV sum is tiny.
  * Empty-window guard: a type seen in only one window divides by
  * greatest(n, 1) on the empty side (its TV reads ~10⁶ ppm = maximal
  * drift, the correct signal for a brand-new stream).
  */
object DriftOps {

  /** Histogram band width in value cents (5.00 units/band). */
  val BandCents = 500L

  /** TV distance (ppm) above which a stream is flagged as drifted. */
  val DriftTvPpmThreshold = 20000L

  def driftMonitor(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"),
      unix_millis(col("ts")).as("ms"),
      expr(s"cast(round(value * 100, 0) as bigint) div $BandCents").as("band"))
    // 1-row broadcast: the midpoint of the observed time span
    val bound = ev.agg(
      expr("(min(ms) + max(ms)) div 2").as("mid_ms"))
    val tagged = ev.crossJoin(broadcast(bound))
      .withColumn("win", when(col("ms") < col("mid_ms"), 0L).otherwise(1L))
    val hist = tagged.groupBy(col("event_type"), col("band"))
      .agg(sum(when(col("win") === 0L, 1L).otherwise(0L)).as("cnt_ref"),
           sum(when(col("win") === 1L, 1L).otherwise(0L)).as("cnt_cur"))
    tvLedger(hist)
  }

  /** The per-type TV rollup over a (event_type, band, cnt_ref,
    * cnt_cur) histogram — shared by the batch monitor and its
    * streaming twin [[driftStream]]. */
  def tvLedger(hist: DataFrame): DataFrame = {
    val totals = hist.groupBy(col("event_type"))
      .agg(sum(col("cnt_ref")).as("n_ref"), sum(col("cnt_cur")).as("n_cur"))
    hist.join(totals, "event_type")
      .groupBy(col("event_type"))
      .agg(
        max(col("n_ref")).as("n_ref"),
        max(col("n_cur")).as("n_cur"),
        count(lit(1)).as("n_bands"),
        expr("sum(abs(cnt_ref * 1000000 div greatest(n_ref, 1) " +
             "- cnt_cur * 1000000 div greatest(n_cur, 1))) div 2").as("tv_ppm"))
      .withColumn("drifted",
        (col("tv_ppm") > DriftTvPpmThreshold).cast("int"))
  }

  /** q203: the drift monitor as a LIVE ingest gate — the current
    * window is a Structured Streaming aggregate (the arriving batch),
    * the reference histogram is static (the blessed corpus), and the
    * ledger must hash-equal the q197 batch form. The stream side
    * keeps only (event_type, band) count state — bounded by
    * type-count × band-count, never event count — and the midpoint
    * boundary is a 1-row batch pre-pass (bounded driver collect, the
    * model-artifact pattern). After the AvailableNow drain the
    * reference join and TV rollup run as plain batch plans. */
  def driftStream(spark: SparkSession, dir: String): DataFrame = {
    def proj(df: DataFrame): DataFrame = df.select(
      col("event_type"),
      unix_millis(col("ts")).as("ms"),
      expr(s"cast(round(value * 100, 0) as bigint) div $BandCents").as("band"))
    val evB = proj(Tables.events(spark, dir))
    val mid = evB.agg(expr("(min(ms) + max(ms)) div 2")).collect()(0).getLong(0)
    val cur = proj(graft.streaming.EventsStream.source(spark, dir))
      .filter(col("ms") >= mid)
      .groupBy(col("event_type"), col("band"))
      .agg(count(lit(1)).as("cnt_cur"))
    val drained = graft.streaming.EventsStream.runAvailableNow(
      spark, cur, "q203_stream_drift", outputMode = "complete")
    val ref = evB.filter(col("ms") < mid)
      .groupBy(col("event_type"), col("band"))
      .agg(count(lit(1)).as("cnt_ref"))
    val hist = ref.join(drained, Seq("event_type", "band"), "full_outer")
      .select(col("event_type"), col("band"),
        coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
        coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
    tvLedger(hist)
  }

  /** Oracle: two independent per-window histograms FULL-OUTER-joined —
    * the naive two-pass formulation of the same ledger. */
  val driftMonitorSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, epoch_ms(ts) AS ms,
       |         CAST(round(value * 100, 0) AS BIGINT) // $BandCents AS band
       |  FROM events),
       |b AS (SELECT (min(ms) + max(ms)) // 2 AS mid_ms FROM ev),
       |hr AS (SELECT event_type, band, count(*) AS cnt_ref
       |       FROM ev, b WHERE ms < mid_ms GROUP BY 1, 2),
       |hc AS (SELECT event_type, band, count(*) AS cnt_cur
       |       FROM ev, b WHERE ms >= mid_ms GROUP BY 1, 2),
       |h AS (SELECT coalesce(hr.event_type, hc.event_type) AS event_type,
       |             coalesce(hr.band, hc.band) AS band,
       |             coalesce(cnt_ref, 0) AS cnt_ref,
       |             coalesce(cnt_cur, 0) AS cnt_cur
       |      FROM hr FULL OUTER JOIN hc
       |        ON hr.event_type = hc.event_type AND hr.band = hc.band),
       |t AS (SELECT event_type, sum(cnt_ref) AS n_ref, sum(cnt_cur) AS n_cur
       |      FROM h GROUP BY 1)
       |SELECT h.event_type,
       |       CAST(max(n_ref) AS BIGINT) AS n_ref,
       |       CAST(max(n_cur) AS BIGINT) AS n_cur,
       |       CAST(count(*) AS BIGINT) AS n_bands,
       |       CAST(sum(abs(cnt_ref * 1000000 // greatest(n_ref, 1)
       |                  - cnt_cur * 1000000 // greatest(n_cur, 1))) // 2
       |            AS BIGINT) AS tv_ppm,
       |       CAST(CASE WHEN sum(abs(cnt_ref * 1000000 // greatest(n_ref, 1)
       |                            - cnt_cur * 1000000 // greatest(n_cur, 1))) // 2
       |                      > $DriftTvPpmThreshold
       |            THEN 1 ELSE 0 END AS INTEGER) AS drifted
       |FROM h JOIN t ON h.event_type = t.event_type
       |GROUP BY 1""".stripMargin
}
