package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types.{LongType, StructType}

/** Running per-user accumulator for [[EventsStream.userStats]];
  * sum_value in integer cents (r12 cents-exact sweep — a per-user
  * running money sum grows with history). */
case class UserAggState(
    n_events: Long, sum_value: Long, first_ms: Long, last_ms: Long)

/** Emitted per-user row for [[EventsStream.userStats]]; cents. */
case class UserAgg(
    user_id: Long, n_events: Long, sum_value: Long,
    first_ms: Long, last_ms: Long)

/** Running chunk accumulator for [[EventsStream.chunkEvents]]: index of
  * the chunk being filled, rows so far, its first-event ms, value sum. */
case class ChunkState(
    chunk_idx: Int, n: Int, first_ms: Long, sum_value: Double)

/** A completed fixed-size chunk of one user's event stream. */
case class EventChunk(
    user_id: Long, chunk_id: Int, first_ms: Long, last_ms: Long,
    sum_value: Double)

/** LOCF carry state for [[EventsStream.forwardFillStream]]: the last
  * observed (non-masked) value in integer cents, or None before any
  * observation, plus the event-time position (ms, event_id) of that
  * observation. The position makes the carry ORDER-ROBUST across
  * micro-batches: an observation arriving in a later batch with an
  * EARLIER event-time position never overwrites a newer carry, so a
  * `maxFilesPerTrigger` change that splits a user's rows out of
  * event-time order cannot silently corrupt the repair (it can only
  * affect which donor a masked row between the two batches sees —
  * the documented single-batch drain keeps that exact too). */
case class FillState(last: Option[Long], ms: Long, eid: Long)

/** One forward-filled event row (q194); value in integer cents. */
case class FilledEvent(
    user_id: Long, event_id: Long, was_missing: Int, filled: Option[Long])

/** Per-user state for [[EventsStream.seqOccurrences]]: whether the
  * user's presence marker was emitted, and the last ≤ 2·SeqGap event
  * types oldest-first — the ONLY history gapped-triple completion ever
  * needs, so state is O(1) per user at any timeline length. */
case class SeqPatState(marked: Boolean, recent: List[String])

/** One gapped-triple occurrence ending at the newest event (null
  * pattern fields = the once-per-user presence marker that keeps the
  * support denominator exact). */
case class SeqOcc(user_id: Long, t1: String, t2: String, t3: String)

/** Per-user funnel state for [[EventsStream.funnelStages]]: first-view,
  * first-click-after-view, first-purchase-after-that-click epoch ms
  * (−1 = stage not reached). */
case class FunnelState(v_ms: Long, c_ms: Long, p_ms: Long)

/** Emitted per-user funnel position (0 = none … 3 = purchased). */
case class FunnelStage(user_id: Long, stage: Int)

/** Per-user attribution state for [[EventsStream.attributionStages]]:
  * last click/view micros (−1 = never seen), events processed so far
  * (the monotone collapse key), and running per-channel purchase
  * tallies. */
case class AttribState(
    last_c: Long, last_v: Long, n_seen: Long,
    nc: Long, nv: Long, nd: Long, vc: Long, vv: Long, vd: Long)

/** Emitted per-user cumulative attribution tallies; values in integer
  * cents (r12 cents-exact sweep: per-user accumulations grow with
  * history, and the channel rollup must stay hash-equal to the
  * cents-exact batch q137). */
case class AttribUser(
    user_id: Long, n_seen: Long,
    nc: Long, nv: Long, nd: Long, vc: Long, vv: Long, vd: Long)

/** Structured Streaming forms of the event-stream operators
  * (SURVEY.md §1: the reference's Airflow sensor→process loop
  * (`composer/sales_etl_dag.py:42-48`) maps onto Spark's file source +
  * `Trigger.AvailableNow` — "process whatever has arrived, then stop",
  * re-run per schedule).
  *
  * The batch twins in [[graft.analytics.EventOps]] carry the DuckDB
  * oracles; these streaming forms are verified by the spec against the
  * batch results on the same input.
  *
  * Scale notes: file-source streaming with `maxFilesPerTrigger` bounds
  * per-batch work; the watermark bounds window state; session windows
  * use the native `session_window` operator whose state store is keyed
  * by (user, session) — all standard multi-executor-safe machinery.
  */
object EventsStream {

  /** Streaming source over the events parquet directory, normalizing the
    * nanosecond `ts` (see Tables.events) to a microsecond timestamp.
    * The nanos legacy conf is scoped to schema inference and restored
    * (see Tables.withNanosAsLong).
    *
    * `events.parquet` may be either a single file (driver testdata) or a
    * Spark-written DIRECTORY of part files (derived corpora such as the
    * 10x scale run). A file needs the pathGlobFilter trick — the file
    * source wants a directory basePath, so we point it at `dir` and
    * filter to the one leaf name; a directory IS a valid basePath, and
    * the glob would match nothing (leaves are part-*.parquet), so we
    * stream it directly. */
  def source(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isDir = fs.getFileStatus(hPath).isDirectory
    val (schema: StructType, raw) = graft.tables.Tables.withNanosAsLong(spark) {
      val s = spark.read.parquet(path).schema
      val reader = spark.readStream.schema(s)
      (s, if (isDir) reader.parquet(path)
          else reader.option("pathGlobFilter", "events.parquet").parquet(dir))
    }
    graft.tables.Tables.normalizeTs(raw)
  }

  /** Documents table as a file-source stream — the ingest side for the
    * corpus-facing streaming gates (q247). Same single-file/glob
    * handling as [[source]]. */
  def docsSource(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isDir = fs.getFileStatus(hPath).isDirectory
    val s = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(s)
    if (isDir) reader.parquet(path)
    else reader.option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** Tumbling 1-hour window counts with a 1-hour watermark — the
    * streaming twin of EventOps.tumblingCounts. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // cents-exact, matching the converted batch twin (r12 sweep)
        (sum(expr("cast(round(value * 100) as bigint)"))
          .cast("double") / 100.0).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding (hopping) 2-hour/1-hour windows with a 1-hour watermark —
    * the streaming twin of EventOps.slidingCounts. Each event updates
    * two window states; the watermark closes a window once event time
    * passes its end plus the lateness bound. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // cents-exact, matching the converted batch twin (r12 sweep)
        (sum(expr("cast(round(value * 100) as bigint)"))
          .cast("double") / 100.0).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Native session windows (30-minute gap) per user — the streaming
    * twin of EventOps.sessionize (which assigns session ids with lag +
    * running sum; same (user, session) partitioning of events). */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        date_trunc("second", col("session_window.start")).as("session_start"),
        col("n_events"), col("sum_value"))

  /** STREAM-STREAM interval join: purchases joined with same-user
    * clicks from the trailing hour, both sides watermarked so the state
    * store evicts rows once they can no longer match (clicks kept 1 h
    * past the purchase watermark per the band). Inner joins emit as
    * matches arrive; the watermark bounds state, not output latency.
    * Batch twin / oracle: [[graft.analytics.EventOps.intervalJoin]]. */
  def intervalJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("c_ts"))).as("gap_ms"))
  }

  /** Custom stateful streaming aggregate via `mapGroupsWithState` — the
    * arbitrary-state API (the escape hatch when built-in windows can't
    * express the state machine): one [[UserAggState]] per user, updated
    * per micro-batch, emitted in Update mode. State is partitioned by
    * the group key across executors and persisted in the state store —
    * the standard scale path for custom streaming state. Emitted values
    * (counts, ms timestamps) are integer-derived except the double sum,
    * which is rounded on output like every other oracle query. */
  def userStats(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val ds = events
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
      .as[(Long, Long, Double)]
    ds.groupByKey(_._1)
      .mapGroupsWithState[UserAggState, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[UserAggState]) =>
          var s = state.getOption.getOrElse(
            UserAggState(0L, 0L, Long.MaxValue, Long.MinValue))
          rows.foreach { case (_, ms, v) =>
            // HALF-AWAY-FROM-ZERO cents, matching SQL round(): plain
            // math.round is half-up toward +inf and disagrees with the
            // batch/oracle twins on negative exact-half-cent values
            // (refunds/adjustments)
            val cents = math.signum(v).toLong * math.round(math.abs(v) * 100)
            s = UserAggState(s.n_events + 1, s.sum_value + cents,
              math.min(s.first_ms, ms), math.max(s.last_ms, ms))
          }
          state.update(s)
          UserAgg(uid, s.n_events, s.sum_value, s.first_ms, s.last_ms)
      }
      .toDF()
      .select(col("user_id"), col("n_events"),
        (col("sum_value").cast("double") / 100.0).as("sum_value"),
        timestamp_millis(col("first_ms")).as("first_s"),
        timestamp_millis(col("last_ms")).as("last_s"))
      // second precision on output (ms == s here; ts is ns-truncated)
      .withColumn("first_s", date_trunc("second", col("first_s")))
      .withColumn("last_s", date_trunc("second", col("last_s")))
  }

  /** Fixed-size event chunking via `flatMapGroupsWithState` — the
    * MULTI-ROW arbitrary-state API (vs [[userStats]]'s one-row-per-key
    * `mapGroupsWithState`): each user's stream is cut into chunks of
    * `chunkSize` events; every COMPLETED chunk is emitted exactly once
    * (Append mode — a finished chunk never changes, so no stale-row
    * collapse is needed at the sink), the partial chunk rides in the
    * state store until its last event arrives. The sequence-packing
    * shape (q76) on a live stream. State is one small accumulator per
    * user, key-partitioned across executors. Rows are sorted by
    * (ms, event_id) inside each group iterator (Spark does not order
    * them); chunk identity across multi-batch drains assumes batches
    * arrive in time order, the file-source default. */
  def chunkEvents(events: DataFrame, chunkSize: Int = 10): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val ds = events
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[ChunkState, EventChunk](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: GroupState[ChunkState]) =>
          var s = state.getOption.getOrElse(ChunkState(0, 0, 0L, 0.0))
          val out = Seq.newBuilder[EventChunk]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ms, _, v) =>
            val first = if (s.n == 0) ms else s.first_ms
            val n = s.n + 1
            val sum = s.sum_value + v
            if (n == chunkSize) {
              out += EventChunk(uid, s.chunk_idx, first, ms, sum)
              s = ChunkState(s.chunk_idx + 1, 0, 0L, 0.0)
            } else s = ChunkState(s.chunk_idx, n, first, sum)
          }
          state.update(s)
          out.result().iterator
      }
      .toDF()
      .select(col("user_id"), col("chunk_id"),
        date_trunc("second", timestamp_millis(col("first_ms"))).as("first_s"),
        date_trunc("second", timestamp_millis(col("last_ms"))).as("last_s"),
        round(col("sum_value"), 2).as("sum_value"))
  }

  /** Batch oracle for [[chunkEvents]]: chunk membership from the global
    * (ts, event_id) order per user, keeping only complete chunks —
    * exactly the rows the Append-mode stream emits. (`events.ts` is
    * second-aligned, so the stream's ms ordering and this ts ordering
    * agree.) */
  val chunkEventsSql: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, value,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts, event_id) - 1 AS idx
      |  FROM events),
      |g AS (
      |  SELECT user_id, CAST(idx // 10 AS INT) AS chunk_id,
      |         date_trunc('second', min(ts)) AS first_s,
      |         date_trunc('second', max(ts)) AS last_s,
      |         round(sum(value), 2) AS sum_value, count(*) AS n
      |  FROM ordered GROUP BY 1, 2)
      |SELECT user_id, chunk_id, first_s, last_s, sum_value
      |FROM g WHERE n = 10""".stripMargin

  /** Streaming distinct-user sketch (q157) — q156's rollup ON A LIVE
    * STREAM: per event type, a DataSketches HLL accumulates users
    * across micro-batches (the streaming aggregate's state IS the
    * sketch — fixed 2^lgK-register size per type, never per-user
    * state, exactly why production counts distincts by sketch and not
    * `dropDuplicates`+count on an unbounded stream). Complete mode:
    * every drain emits the full per-type estimate so the memory sink
    * holds the final-stream answer. The estimate is bound-checked
    * against the batch-exact distinct count in the q157 wrapper. */
  def sketchRollup(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("est"))

  /** Streaming LOCF forward-fill (q194) — q188's repair as a live
    * ingest operator: per-user state carries the last observed value
    * across micro-batches, and every arriving row leaves either as
    * observed, imputed (state's carry), or unfillable (no observation
    * yet) — the repair happens AT INGEST, before anything downstream
    * sees a null. Missingness is the q188 plant (event_id ≡ 0 mod 7).
    * Rows sort by (ms, event_id) inside each group iterator (the q85
    * convention — Spark does not order them); state is ONE optional
    * double per user. The q188 batch ledger over the same corpus is
    * the oracle's third derivation of the same repair. */
  def forwardFillStream(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val ds = events
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_id"),
        when(col("event_id") % 7 === 0, lit(null).cast("long"))
          .otherwise(round(col("value") * 100).cast("long")).as("v"))
      .as[(Long, Long, Long, Option[Long])]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[FillState, FilledEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Option[Long])],
         state: GroupState[FillState]) =>
          var s = state.getOption.getOrElse(FillState(None, Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[FilledEvent]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ms, eid, v) =>
            v match {
              case Some(x) =>
                // carry advances only FORWARD in event time: an
                // observation from an out-of-order later batch with an
                // earlier (ms, eid) never overwrites a newer carry
                if (ms > s.ms || (ms == s.ms && eid > s.eid)) s = FillState(Some(x), ms, eid)
                out += FilledEvent(uid, eid, 0, Some(x))
              case None =>
                out += FilledEvent(uid, eid, 1, s.last)
            }
          }
          state.update(s)
          out.result().iterator
      }
      .toDF()
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("was_missing")).cast("long").as("n_missing"),
        sum(when(col("was_missing") === 1 && col("filled").isNotNull, 1L)
          .otherwise(0L)).as("n_imputed"),
        sum(when(col("filled").isNull, 1L).otherwise(0L)).as("n_unfillable"),
        sum(when(col("was_missing") === 1, coalesce(col("filled"), lit(0L)))
          .otherwise(0L)).as("imputed_mass_c"))
  }

  /** Streaming KMV bottom-k distinct-user sketch per event type
    * (q170) — q157's shape with OUR mergeable aggregate
    * ([[graft.functions.NativeExprs.bottomK]], a TypedImperativeAggregate)
    * as the streaming state, and a stronger contract: KMV is fully
    * ORDER-INVARIANT integer arithmetic, so unlike the DataSketches
    * HLL twin the emitted sketch statistics (k_used, k-th smallest,
    * sketch sum) and the KMV estimate ((K−1)·P div h_K, exact when
    * the sketch holds everything) are BIT-EQUAL to the batch oracle's
    * row_number() form — the oracle hash pins the whole streaming
    * state machine, not just an error bound. State per event type is
    * O(K) longs regardless of stream length. Works identically on a
    * batch frame (the spec's batch-twin pin). */
  def kmvUsers(events: DataFrame): DataFrame = {
    import graft.dedup.KmvSketch.{K, Ua, Ub}
    val P = graft.functions.TextExprs.P
    events.groupBy(col("event_type"))
      .agg(graft.functions.NativeExprs.bottomK(
        (lit(Ua) * col("user_id") + lit(Ub)) % lit(P), K).as("sk"))
      .select(col("event_type"),
        size(col("sk")).cast("long").as("k_used"),
        element_at(col("sk"), size(col("sk"))).as("kth_h"),
        aggregate(col("sk"), lit(0L), (a, x) => a + x).as("sk_sum"))
      .withColumn("est_users",
        when(col("k_used") < K, col("k_used"))
          .otherwise(expr(s"${(K - 1).toLong * P}L div kth_h")))
  }

  /** Probe users for [[countMinUsers]] — fixed ids whose estimates the
    * ledger emits (cell positions are compile-time constants in BOTH
    * engines, so the probe math never touches the data path). */
  val CmProbeUsers: Seq[Long] = 0L until 10L

  /** q218: q213's gapped sequential patterns ON A LIVE STREAM —
    * `flatMapGroupsWithState` completes every triple ENDING at the
    * arriving event from a per-user buffer of the last 2·SeqGap event
    * types (the only history gap-bounded completion can reference), so
    * state is O(users·2·SeqGap) regardless of timeline length and each
    * occurrence is emitted exactly once in Append mode. A once-per-user
    * presence marker keeps the support denominator equal to the batch
    * DISTINCT-user count even for users too short to form a triple.
    * [[seqSupportRollup]] collapses the drained emissions to EXACTLY
    * the q213 ledger — stream and batch share one oracle. Same
    * ordered-source contract as forwardFillStream: rows sort by
    * (ts, event_id) within each micro-batch group, and the
    * AvailableNow drain delivers a user's timeline in one batch. */
  def seqOccurrences(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val gap = graft.analytics.EventOps.SeqGap
    val keep = 2 * gap
    val ds = events
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[SeqPatState, SeqOcc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[SeqPatState]) =>
          var s = state.getOption.getOrElse(SeqPatState(false, Nil))
          val out = Seq.newBuilder[SeqOcc]
          if (!s.marked) {
            out += SeqOcc(uid, null, null, null)
            s = s.copy(marked = true)
          }
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, t) =>
            val recent = s.recent
            val n = recent.length
            for (d2 <- 1 to gap; d1 <- 1 to gap if n >= d1 + d2)
              out += SeqOcc(uid, recent(n - d2 - d1), recent(n - d2), t)
            s = s.copy(recent = (recent :+ t).takeRight(keep))
          }
          state.update(s)
          out.result().iterator
      }
      .toDF()
  }

  /** Post-drain collapse of [[seqOccurrences]] emissions to the q213
    * support ledger (distinct-user support, same floor). */
  def seqSupportRollup(occ: DataFrame): DataFrame = {
    val pct = graft.analytics.EventOps.SeqMinSupPct
    val users = occ.agg(countDistinct(col("user_id")).as("n_total"))
    occ.filter(col("t1").isNotNull)
      .distinct()
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(users))
      .filter(col("n_users") * 100 >= col("n_total") * pct)
      .select(col("t1"), col("t2"), col("t3"), col("n_users"),
        expr("(n_users * 10000) div n_total").as("support_bp"))
  }

  /** q214: Count-Min per event type ON A LIVE STREAM — the aggregate's
    * state IS the sketch (q157's principle, counters instead of HLL
    * registers): depth×width fixed longs per event_type, NEVER
    * per-user state, merged across micro-batches by counter addition
    * (graft.functions.CountMinAggExpr), so an unbounded stream's
    * frequency-monitor memory is O(types·depth·width) forever. The
    * ledger emits, per type, the event count and the point estimates
    * for [[CmProbeUsers]] — batch-exact: the DuckDB oracle rebuilds
    * every probed counter relationally and must hash-match BIT-equal
    * (the q170 streaming-sketch contract, not a bound check). */
  def countMinUsers(events: DataFrame): DataFrame = {
    import graft.dedup.KmvSketch.{Ua, Ub}
    import graft.text.TextOps.{CmA, CmB, CmWidth}
    val P = graft.functions.TextExprs.P
    val h = (lit(Ua) * col("user_id") + lit(Ub)) % lit(P)
    val ests = CmProbeUsers.map { u =>
      val hu = (Ua * u + Ub) % P
      least(CmA.indices.map { r =>
        val cell = ((CmA(r) * hu + CmB(r)) % P) % CmWidth
        element_at(col("sk"), lit((r * CmWidth + cell + 1).toInt))
      }: _*).as(s"est_u$u")
    }
    events.groupBy(col("event_type"))
      .agg(graft.functions.NativeExprs.countMinAgg(h, CmWidth, CmA, CmB, P)
        .as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("event_type") +: col("n_events") +: ests: _*)
  }

  /** Oracle: each probed counter rebuilt as a conditional count in one
    * grouped pass (cell positions are the same Scala-computed
    * literals the engine probes). */
  val countMinUsersSql: String = {
    import graft.dedup.KmvSketch.{Ua, Ub}
    import graft.text.TextOps.{CmA, CmB, CmWidth}
    val P = graft.functions.TextExprs.P
    val estCols = CmProbeUsers.map { u =>
      val hu = (Ua * u + Ub) % P
      val terms = CmA.indices.map { r =>
        val cell = ((CmA(r) * hu + CmB(r)) % P) % CmWidth
        s"sum(CASE WHEN (((${CmA(r)} * (($Ua * user_id + $Ub) % $P)" +
          s" + ${CmB(r)}) % $P) % $CmWidth) = $cell THEN 1 ELSE 0 END)"
      }
      s"CAST(least(${terms.mkString(", ")}) AS BIGINT) AS est_u$u"
    }
    s"""SELECT event_type, count(*) AS n_events,
       |       ${estCols.mkString(",\n       ")}
       |FROM events GROUP BY 1""".stripMargin
  }

  /** Streaming exact dedup — the ingest-side "drop already-seen keys"
    * operator a training-data pipeline runs in front of its corpus
    * store. `dropDuplicates` holds one state-store entry per key,
    * partitioned by key across executors; on an unbounded stream the
    * production form is `dropDuplicatesWithinWatermark` (keys evicted
    * once the watermark passes them — state bounded by the lateness
    * window), while the bounded-drain form here keeps exact DISTINCT
    * semantics so the batch oracle can verify it. Only the key columns
    * are emitted: which physical row wins the intra-batch race is
    * execution-dependent, the key SET is not. */
  def dedupKeys(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")

  /** The PRODUCTION form of [[dedupKeys]]: `dropDuplicatesWithinWatermark`
    * holds a key's state only until the event-time watermark passes it
    * plus the lateness bound — on an unbounded stream, state is bounded
    * by the dedup window instead of growing with the key universe (the
    * reason plain `dropDuplicates` can't run forever). The testdata
    * spans 30 days and the delay here is 60, so a bounded drain keeps
    * every key's state to the end and the semantics collapse to exact
    * DISTINCT — which is what makes the batch oracle able to verify the
    * operator. Only the key columns are emitted (which physical row
    * wins the intra-batch race is execution-dependent, the key set is
    * not). */
  def dedupKeysWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "60 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

  /** [[dedupKeysWithinWatermark]] with FINGERPRINT state keys (r12
    * verdict ask #2): the state store keys on a single 64-bit hash of
    * the composite key instead of the raw (long, string) pair — the
    * state-size trade an unbounded-key ingest makes (q93 holds 37
    * bytes/key raw; the fingerprint drops the per-row payload to the
    * hash alone), at a 64-bit collision risk of ~n²/2⁶⁵ (≈ 3·10⁻⁸ at
    * 750k keys — two colliding keys would dedup as one; acceptable
    * where the output feeds counting/budgeting, not exact billing).
    * Meant to run under the RocksDB state-store provider, where state
    * spills to local disk instead of the executor heap — the
    * production backend for linear-state streams; the 100× protocol
    * records both and asserts the emitted fingerprint set equals the
    * batch-exact one. */
  def dedupKeyFingerprintsWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "60 days")
      .select(col("ts"), xxhash64(col("user_id"), col("event_type")).as("key_fp"))
      .dropDuplicatesWithinWatermark("key_fp")
      .select(col("key_fp"))

  /** The q110 conversion funnel ON A LIVE STREAM: one [[FunnelState]]
    * state machine per user via `mapGroupsWithState` (view → click-at-
    * or-after-first-view → purchase-at-or-after-that-click), emitting
    * the user's current funnel position each micro-batch in Update
    * mode. The global rollup happens OFF the sink ([[funnelRollup]]) —
    * stage is monotone per user, so the max row is the final state;
    * keeping the stateful operator per-key and the 1-row rollup in
    * batch avoids chaining a second stateful aggregate behind the
    * arbitrary-state operator.
    *
    * Within a batch, rows are processed in (ms, stage-rank, event_id)
    * order: the stage rank breaks ms ties the way the batch funnel's
    * `>=` comparisons do (a click at the exact first-view timestamp
    * counts, so the view must apply first). Across batches, time-
    * ordered arrival is assumed — the file-source default, same as
    * [[chunkEvents]].
    *
    * State is one 3-long record per user, key-partitioned across
    * executors — constant per key, the funnel's natural scale shape. */
  def funnelStages(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val rank = when(col("event_type") === "view", 0)
      .when(col("event_type") === "click", 1)
      .when(col("event_type") === "purchase", 2).otherwise(3)
    val ds = events
      .select(col("user_id"), rank.as("r"), unix_millis(col("ts")).as("ms"),
        col("event_id"))
      .as[(Long, Int, Long, Long)]
    ds.groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelStage](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Int, Long, Long)],
         state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          rows.toSeq.sortBy(r => (r._3, r._2, r._4)).foreach { case (_, r, ms, _) =>
            r match {
              case 0 if s.v_ms < 0                           => s = s.copy(v_ms = ms)
              case 1 if s.c_ms < 0 && s.v_ms >= 0 && ms >= s.v_ms => s = s.copy(c_ms = ms)
              case 2 if s.p_ms < 0 && s.c_ms >= 0 && ms >= s.c_ms => s = s.copy(p_ms = ms)
              case _ =>
            }
          }
          state.update(s)
          val stage =
            if (s.p_ms >= 0) 3 else if (s.c_ms >= 0) 2 else if (s.v_ms >= 0) 1 else 0
          FunnelStage(uid, stage)
      }
      .toDF()
  }

  /** q137's last-touch attribution as a live per-user state machine
    * (q141): state carries (last click µs, last view µs, running
    * channel tallies); each micro-batch replays its rows in event-time
    * order, attributing every purchase against state from STRICTLY
    * earlier timestamps — equal-timestamp groups attribute first, then
    * update, reproducing the batch form's 1-PRECEDING range frame
    * exactly (a click sharing the purchase's micros earns nothing).
    * Emits cumulative per-user tallies in update mode; `n_seen` is
    * strictly increasing, so the rollup's max-collapse picks each
    * user's final row (the userStats convention). Same oracle as the
    * batch q137. */
  def attributionStages(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val L = graft.analytics.EventOps.AttribLookbackUs
    val ds = events
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("tus"))
      .as[(Long, String, Double, Long)]
    ds.groupByKey(_._1)
      .mapGroupsWithState[AttribState, AttribUser](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Double, Long)],
         state: GroupState[AttribState]) =>
          var s = state.getOption.getOrElse(
            AttribState(-1L, -1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          // replay in event-time order, one equal-timestamp group at a
          // time: purchases in the group see only state from earlier µs
          rows.toSeq.sortBy(_._4).groupBy(_._4).toSeq.sortBy(_._1)
            .foreach { case (tus, group) =>
              group.foreach { case (_, et, v, _) =>
                if (et == "purchase") {
                  // quantize ONCE per row; half AWAY FROM ZERO to match
                  // the oracle's round() on negative exact-half cents
                  // (r13 ADVICE #1 — same form as UserAggState)
                  val cents = math.signum(v).toLong * math.round(math.abs(v) * 100)
                  if (s.last_c >= 0 && tus - s.last_c <= L)
                    s = s.copy(nc = s.nc + 1, vc = s.vc + cents)
                  else if (s.last_v >= 0 && tus - s.last_v <= L)
                    s = s.copy(nv = s.nv + 1, vv = s.vv + cents)
                  else s = s.copy(nd = s.nd + 1, vd = s.vd + cents)
                }
              }
              group.foreach { case (_, et, _, _) =>
                if (et == "click") s = s.copy(last_c = tus)
                else if (et == "view") s = s.copy(last_v = tus)
              }
              s = s.copy(n_seen = s.n_seen + group.length)
            }
          state.update(s)
          AttribUser(uid, s.n_seen, s.nc, s.nv, s.nd, s.vc, s.vv, s.vd)
      }
      .toDF()
  }

  /** Collapse an update-mode [[attributionStages]] sink (max-`n_seen`
    * row per user = final state) and roll up to q137's channel table:
    * purchases, distinct users, rounded revenue per channel — only
    * channels that attributed at least one purchase appear, matching
    * the batch groupBy. */
  def attributionRollup(sink: DataFrame): DataFrame = {
    val fin = sink.groupBy(col("user_id")).agg(max(struct(
        col("n_seen"), col("nc"), col("nv"), col("nd"),
        col("vc"), col("vv"), col("vd"))).as("s"))
      .select(col("user_id"), col("s.nc").as("nc"), col("s.nv").as("nv"),
        col("s.nd").as("nd"), col("s.vc").as("vc"), col("s.vv").as("vv"),
        col("s.vd").as("vd"))
    Seq(("click", "nc", "vc"), ("view", "nv", "vv"), ("direct", "nd", "vd"))
      .map { case (ch, n, v) =>
        fin.select(lit(ch).as("channel"), col(n).as("np"),
          col(v).as("pv"), col("user_id"))
      }
      .reduce(_ unionAll _)
      .filter(col("np") > 0)
      .groupBy(col("channel"))
      .agg(sum(col("np")).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"),
        // pv is integer cents — the sum is exact; emit dollars
        (sum(col("pv")).cast("double") / 100.0).as("total_value"))
  }

  /** Batch rollup of an update-mode [[funnelStages]] sink to the q110
    * output row: stage is monotone non-decreasing per user, so max =
    * final position; counts and basis-point rates match the batch
    * funnel column-for-column (same /0 guard). */
  def funnelRollup(sink: DataFrame): DataFrame =
    sink.groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
      .agg(count(when(col("stage") >= 1, 1)).as("n_view"),
           count(when(col("stage") >= 2, 1)).as("n_click"),
           count(when(col("stage") >= 3, 1)).as("n_purchase"))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        when(col("n_view") === 0, lit(0L))
          .otherwise(expr("(n_click * 10000) div n_view")).as("click_bp"),
        when(col("n_view") === 0, lit(0L))
          .otherwise(expr("(n_purchase * 10000) div n_view")).as("purchase_bp"))

  /** Collapse an UPDATE-mode sink of [[userStats]] rows to the final
    * state per user. The memory sink accumulates one row per user per
    * micro-batch, so a multi-file drain (maxFilesPerTrigger, or several
    * files in the events dir) leaves stale intermediate rows behind the
    * latest one. A user's `n_events` is strictly increasing across its
    * emitted rows (mapGroupsWithState only re-emits a key when new rows
    * arrive), so the max-n_events row IS the final state — ties are
    * impossible. */
  def latestUserStats(sink: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    sink.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1).drop("graft_rn")
  }

  /** STREAM-STATIC join — the third join form in the streaming matrix
    * (beside stream-stream q61 and the batch twins): each micro-batch
    * joins against the static customer dimension with no state store at
    * all (the static side is just re-planned per batch), and the
    * explicit `broadcast` keeps the stream side from ever shuffling for
    * the join. The canonical enrich-then-aggregate shape for dimension
    * lookups on a live stream. */
  def streamStaticNationRollup(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_nationkey"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_events"),
        // cents-exact: per-nation groups grow with corpus volume
        (sum(expr("cast(round(value * 100) as bigint)"))
          .cast("double") / 100.0).as("sum_value"))

  /** Oracle for [[streamStaticNationRollup]]: the same enrich+rollup as
    * one batch join. */
  val streamStaticNationRollupSql: String =
    """SELECT c_nationkey, count(*) AS n_events,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1""".stripMargin

  /** `foreachBatch` parquet sink — the PRODUCTION sink API (memory sinks
    * are test fixtures): each micro-batch lands under `batch=<id>` with
    * mode("overwrite"), so a retried batch replaces itself instead of
    * double-writing — idempotent exactly-once on top of the sink's
    * at-least-once contract, the standard pattern for sinks without
    * transactional commit. Returns the per-user purchase rollup READ
    * BACK from the files the stream wrote, so the oracle verifies the
    * whole write path, not the in-memory stream state.
    *
    * Scale notes: the foreachBatch writer runs distributed (it is a
    * normal batch write per micro-batch); partition discovery prunes by
    * `batch=` like any partitioned layout. */
  def foreachBatchSink(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_fbsink")
    graft.sources.TempDirs.deleteOnExit(out)
    val purchases = source(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
    val q = purchases.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        df.write.mode("overwrite").parquet(s"$out/batch=$id")
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory(ckptBase, "fbsink").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out.toString)          // batch=N discovered as a partition col
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        // cents-exact: per-user purchase history grows with time
        (sum(expr("cast(round(value * 100) as bigint)"))
          .cast("double") / 100.0).as("sum_value"))
  }

  /** Oracle for [[foreachBatchSink]] — the same rollup straight off the
    * events table. */
  val foreachBatchSinkSql: String =
    """SELECT user_id, count(*) AS n_purchases,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  /** Run a streaming aggregate to completion over the files currently in
    * `dir` (Trigger.AvailableNow — the "sense, drain, stop" loop) and
    * return the final result from the in-memory sink.
    *
    * Session confs are tuned for the drain-then-stop shape and restored
    * afterwards: the per-batch checkpoint fsync+checksum tax and one
    * HDFS-backed state store per shuffle partition dominate a short run,
    * so state parallelism is capped and checkpoint file checksums are
    * skipped (the checkpoint is a temp dir, discarded on exit).
    */
  def runAvailableNow(spark: SparkSession, agg: DataFrame, name: String,
                      outputMode: String = "complete"): DataFrame =
    runAvailableNowStats(spark, agg, name, outputMode)._1

  /** Per-drain telemetry, rolled up from the query's progress events:
    * total input rows, wall seconds, micro-batch count, per-batch
    * trigger latency (avg/max), drain throughput, and the SPLIT the
    * bench needs to tell code regressions from environment noise —
    * `computeSecs` (time inside trigger executions, the part the
    * engine's operators own) vs `setupSecs` (wall minus that: query
    * start/stop, checkpoint WAL fsyncs between batches, source file
    * listing — the part that tracks host/filesystem latency). */
  final case class DrainStats(inputRows: Long, wallSecs: Double,
      batches: Int, avgBatchMs: Double, maxBatchMs: Double,
      rowsPerSec: Double, computeSecs: Double, setupSecs: Double,
      stateRows: Long = 0L, stateBytes: Long = 0L)

  /** Checkpoint base for the drain-then-stop shape: tmpfs when the
    * host has it (/dev/shm — checkpoints are discarded on exit, and
    * putting the per-batch WAL fsyncs on shared-disk /tmp previously
    * let filesystem latency pollute quiet-run streaming numbers by
    * >2x on untouched code), else java.io.tmpdir. Overridable for
    * durability experiments via SPARK_GRAFT_STREAM_CKPT_BASE. */
  private[graft] lazy val ckptBase: java.nio.file.Path = {
    val base = sys.env.get("SPARK_GRAFT_STREAM_CKPT_BASE")
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isWritable(shm)) Some("/dev/shm") else None
      }
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val p = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(base), "graft_stream_ckpt")
    graft.sources.TempDirs.deleteOnExit(p)
    p
  }

  /** AvailableNow drain through a `foreachBatch` PARQUET sink instead
    * of the in-memory sink: each micro-batch's emissions land as a
    * distributed batch write under `batch=<id>` (idempotent overwrite,
    * the q100 pattern) and the result is read back from the files.
    * For APPEND-mode operators with high emission volume (q218 emits
    * up to gap² occurrence rows per input event — ~9M rows at sf1)
    * the memory sink is the scale ceiling: every row funnels through
    * a single driver-side table append. Here emissions never visit
    * the driver, so the drain stays executor-parallel end to end. */
  def runAvailableNowViaParquet(spark: SparkSession, agg: DataFrame,
                                name: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory(s"graft_drain_$name")
    graft.sources.TempDirs.deleteOnExit(out)
    val conf = spark.conf
    val saved = Seq("spark.sql.shuffle.partitions",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.shuffle.partitions", "8")
    conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    try {
      val q = agg.writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          df.write.mode("overwrite").parquet(s"$out/batch=$id")
        }
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(ckptBase, name).toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
    val wrote = { // a zero-batch drain writes nothing — return empty
      val ls = java.nio.file.Files.list(out)
      try ls.findFirst().isPresent finally ls.close()
    }
    if (wrote) spark.read.parquet(out.toString).drop("batch")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], agg.schema)
  }

  def runAvailableNowStats(spark: SparkSession, agg: DataFrame, name: String,
                           outputMode: String = "complete"): (DataFrame, DrainStats) = {
    val conf = spark.conf
    val saved = Seq("spark.sql.shuffle.partitions",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.shuffle.partitions", "8")
    conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val stats = try {
      val t0 = System.nanoTime()
      val q = agg.writeStream
        .format("memory")
        .queryName(name)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(ckptBase, name).toString)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val ps = q.recentProgress.toSeq
      val rows = ps.map(_.numInputRows).sum
      val batchMs = ps.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.toDouble))
      val computeSecs = batchMs.sum / 1000.0
      // State-store footprint at drain end (r11 verdict ask #6): the
      // LAST progress event with state operators carries the final
      // per-operator row/byte totals — the number the bounded-state
      // scale argument has to assert, not infer.
      val lastState = ps.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.toSeq).getOrElse(Seq.empty)
      DrainStats(rows, wall, ps.size,
        if (batchMs.nonEmpty) batchMs.sum / batchMs.size else 0.0,
        if (batchMs.nonEmpty) batchMs.max else 0.0,
        if (wall > 0) rows / wall else 0.0,
        computeSecs, math.max(0.0, wall - computeSecs),
        lastState.map(_.numRowsTotal).sum,
        lastState.map(_.memoryUsedBytes).sum)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
    (spark.table(name), stats)
  }
}
