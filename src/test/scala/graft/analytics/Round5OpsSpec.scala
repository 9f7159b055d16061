package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** Invariant checks for the round-5 analytics additions on sf0.001
  * (value correctness vs. DuckDB is covered by the Verify/oracle gate —
  * these pin structural properties). */
class Round5OpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("event funnel is monotone and stage 1 counts exactly the viewing users (q110)") {
    val r = EventOps.eventFunnel(spark, dir).head()
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv >= nc && nc >= np && nv > 0)
    val viewers = graft.tables.Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(nv === viewers)
    // bp rates re-derive from the counts
    assert(r.getLong(3) === nc * 10000 / nv)
    assert(r.getLong(4) === np * 10000 / nv)
  }

  test("event funnel on a view-free corpus: no ANSI /0, all-zero row (q110)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_funnel_noview_").toString
    // clicks and purchases but not a single 'view' → n_view = 0; the
    // bp rates must be 0 by definition, not a division-by-zero error
    Seq((1L, "click", "2024-01-01 00:00:00"),
        (1L, "purchase", "2024-01-01 00:01:00"),
        (2L, "click", "2024-01-01 00:02:00"))
      .toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"), to_timestamp(col("ts_s")).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = EventOps.eventFunnel(spark, tmp).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((0L, 0L, 0L, 0L, 0L)))
  }

  test("attribution: lookback, precedence, and the same-timestamp tie (q137)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_attrib_").toString
    Seq(
      // u1: click 10 min before the purchase → click
      (1L, "view", "2024-01-01 00:00:00", 0.0),
      (1L, "click", "2024-01-01 00:10:00", 0.0),
      (1L, "purchase", "2024-01-01 00:20:00", 10.0),
      // u2: only a view, 25 min before → view
      (2L, "view", "2024-01-01 00:00:00", 0.0),
      (2L, "purchase", "2024-01-01 00:25:00", 20.0),
      // u3: cold purchase → direct
      (3L, "purchase", "2024-01-01 00:00:00", 40.0),
      // u4: click at the SAME micros as the purchase — the tie is NOT
      // strictly preceding, so it must not earn the credit → direct
      (4L, "click", "2024-01-01 00:00:00", 0.0),
      (4L, "purchase", "2024-01-01 00:00:00", 80.0),
      // u5: click 31 min before (outside lookback), view 25 min before → view
      (5L, "click", "2024-01-01 00:00:00", 0.0),
      (5L, "view", "2024-01-01 00:06:00", 0.0),
      (5L, "purchase", "2024-01-01 00:31:00", 160.0))
      .toDF("user_id", "event_type", "ts_s", "value")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("ts_s")).as("ts"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.purchaseAttribution(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      "click"  -> ((1L, 1L, 10.0)),
      "view"   -> ((2L, 2L, 180.0)),
      "direct" -> ((2L, 2L, 120.0))))
  }

  test("attribution on the corpus partitions all purchases (q137)") {
    val rows = EventOps.purchaseAttribution(spark, dir).collect()
    val total = rows.map(_.getLong(1)).sum
    val purchases = graft.tables.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(total === purchases)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("click", "view", "direct")))
  }

  test("gap-filled hourly grid is dense and loses no events (q111)") {
    val g = EventOps.gapfillHourly(spark, dir).cache()
    val hours = g.select(col("window_start")).distinct().count()
    val types = g.select(col("event_type")).distinct().count()
    assert(g.count() === hours * types)
    val total = graft.tables.Tables.events(spark, dir).count()
    assert(g.agg(sum(col("n_events"))).head().getLong(0) === total)
    // the spine is contiguous: n hours == (max-min)/1h + 1
    val mm = g.agg(min(col("window_start")).as("lo"), max(col("window_start")).as("hi"))
      .select(((unix_timestamp(col("hi")) - unix_timestamp(col("lo"))) / 3600 + 1).as("n"))
      .head().getDouble(0)
    assert(hours === mm.toLong)
    g.unpersist()
  }

  test("source overlap matrix is upper-triangular with bounded containment (q112)") {
    val m = graft.dedup.DedupOps.sourceOverlap(spark, dir).cache()
    assert(m.filter(col("source_a") >= col("source_b")).count() === 0)
    assert(m.filter(col("containment_bp") < 0 || col("containment_bp") > 10000).count() === 0)
    // shared counts are positive by construction
    assert(m.filter(col("n_shared_grams") <= 0).count() === 0)
    m.unpersist()
  }

  test("quality rules: keep verdict is exactly the conjunction of the four rules (q113)") {
    import graft.text.TextOps._
    val r = qualityRules(spark, dir).cache()
    val recomputed = r.filter(
      col("n_tokens").between(RuleMinTokens, RuleMaxTokens) &&
      col("mean_centi").between(RuleMinMeanCenti, RuleMaxMeanCenti) &&
      col("symbol_bp") <= RuleMaxSymbolBp &&
      col("stop_hits") >= RuleMinStopHits).count()
    assert(r.filter(col("keep") === 1).count() === recomputed)
    // the rule set is non-degenerate on this corpus: both verdicts occur
    assert(r.filter(col("keep") === 1).count() > 0)
    assert(r.filter(col("keep") === 0).count() > 0)
    r.unpersist()
  }

  test("event transitions: one transition per consecutive pair, shares sum to ~10000 (q119)") {
    val t = EventOps.eventTransitions(spark, dir).cache()
    val ev = graft.tables.Tables.events(spark, dir)
    val users = ev.select(col("user_id")).distinct().count()
    // transitions = events - users (each user's first event has no predecessor)
    assert(t.agg(sum(col("n"))).head().getLong(0) === ev.count() - users)
    val bp = t.agg(sum(col("share_bp"))).head().getLong(0)
    assert(bp > 10000L - t.count() && bp <= 10000L) // floor-div loses < 1 bp per cell
    t.unpersist()
  }

  test("Misra-Gries guarantee holds under partitioned merge with tiny capacity (q116)") {
    import spark.implicits._
    // 1000 rows of noise tokens (all distinct) + one token on 300 rows:
    // freq 300 > N/(cap+1) = 1300/3, false -> use cap 4: 1300/5 = 260 < 300
    val rows = (1 to 1000).map(i => Seq(s"noise$i")) ++ Seq.fill(300)(Seq("hot"))
    val df = rows.toDF("t").repartition(13) // force many partial merges
    val cand = df.agg(graft.functions.NativeExprs.misraGries(col("t"), 4).as("c"))
      .head().getSeq[String](0)
    assert(cand.contains("hot"), s"hot item missing from candidates $cand")
    assert(cand.size <= 4)
    // and the oracle-facing query flags every heavy hitter as in-sketch
    val hh = graft.text.TextOps.heavyHitters(spark, dir)
    assert(hh.count() > 0)
    assert(hh.filter(col("in_sketch") =!= 1).count() === 0)
  }

  test("windowed distinct users bounded by events; no events lost (q117)") {
    val w = EventOps.windowDistinctUsers(spark, dir).cache()
    assert(w.filter(col("n_users") > col("n_events")).count() === 0)
    val total = graft.tables.Tables.events(spark, dir).count()
    assert(w.agg(sum(col("n_events"))).head().getLong(0) === total)
    w.unpersist()
  }

  test("co-purchase pairs are ordered, support-thresholded, bounded by basket fanout (q120)") {
    val p = Relational.copurchasePairs(spark, dir).cache()
    assert(p.filter(col("part_a") >= col("part_b")).count() === 0)
    assert(p.filter(col("n_orders") < Relational.CopurchaseMinSupport).count() === 0)
    // total pair mass (pre-threshold) == sum over orders of C(size,2)
    val li = graft.tables.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val expectedPairs = li.groupBy("l_orderkey").count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long"))).head().getLong(0)
    val allPairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey")).count()
    assert(allPairs === expectedPairs)
    p.unpersist()
  }

  test("co-purchase top-k via custom operator agrees with the window form (q125)") {
    val topk = Relational.copurchaseTopK(spark, dir).cache()
    assert(topk.groupBy("part").count()
      .filter(col("count") > Relational.CopurchaseTopK).count() === 0)
    assert(topk.filter(col("rank") < 1 || col("rank") > Relational.CopurchaseTopK)
      .count() === 0)
    // independent window-function twin
    val p = Relational.copurchasePairs(spark, dir)
    val sym = p.select(col("part_a").as("part"), col("part_b").as("reco"), col("n_orders"))
      .unionAll(p.select(col("part_b").as("part"), col("part_a").as("reco"), col("n_orders")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("part")).orderBy(desc("n_orders"), col("reco"))
    val windowed = sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= Relational.CopurchaseTopK)
    assert(topk.exceptAll(windowed.select(topk.columns.map(col).toSeq: _*)).count() === 0)
    assert(windowed.count() === topk.count())
    topk.unpersist()
  }

  test("constraint audit: pass flag re-derives from violations; checked = table sizes (q121)") {
    val a = Relational.constraintAudit(spark, dir).cache()
    assert(a.count() === 6)
    assert(a.filter((col("n_violations") === 0) =!= (col("pass") === 1)).count() === 0)
    val li = graft.tables.Tables.lineitem(spark, dir).count()
    assert(a.filter(col("check_name") === "lineitem_order_fk")
      .head().getAs[Long]("n_checked") === li)
    // the synthetic warehouse is referentially intact: FK checks pass
    assert(a.filter(col("check_name").endsWith("_fk") && col("pass") =!= 1).count() === 0)
    a.unpersist()
  }

  test("cohort retention: day-0 is each cohort's max and equals its size (q118)") {
    val r = EventOps.cohortRetention(spark, dir).cache()
    // every cohort has a day-0 row, and no offset beats day-0
    val perCohort = r.groupBy("cohort_day")
      .agg(max(when(col("day_offset") === 0, col("n_active"))).as("d0"),
           max(col("n_active")).as("mx"))
    assert(perCohort.filter(col("d0").isNull || col("mx") > col("d0")).count() === 0)
    // cohort sizes partition the user base
    val users = graft.tables.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(r.filter(col("day_offset") === 0)
      .agg(sum(col("n_active"))).head().getLong(0) === users)
    r.unpersist()
  }
}
