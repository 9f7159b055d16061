package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q179–q182 pins the oracle gate cannot see. */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("q179: stratified folds balanced within 1; plain hash mod k is not") {
    val rows = graft.text.FoldOps.stratifiedFolds(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) <= 1L,
      s"${r.getString(0)}: fold spread ${r.getLong(3)}"))
    // the naive assignment this replaces: raw hash % k per doc
    val naiveSpread = Tables.documents(spark, dir)
      .withColumn("fold", graft.functions.TextExprs.polyHashCol(
        concat_ws(":", lit("fold"), col("doc_id").cast("string"))) % graft.text.FoldOps.KFolds)
      .groupBy("lang", "fold").count()
      .groupBy("lang").agg((max("count") - min("count")).as("spread"))
      .agg(max("spread")).collect().head.getLong(0)
    assert(naiveSpread > 1L, "plain hash folds are balanced here by luck — corpus too small to show the repair")
  }

  test("q180: every segment's digit histogram conserves and stays in 1..9") {
    val rows = ForensicsOps.benfordAudit(spark, dir).collect()
    val bySeg = rows.groupBy(_.getString(0))
    val totals = Tables.orders(spark, dir)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySeg.foreach { case (seg, rs) =>
      assert(rs.map(_.getLong(2)).sum === totals(seg), s"$seg row conservation")
      rs.foreach(r => assert(r.getLong(1) >= 1L && r.getLong(1) <= 9L))
      val pmSum = rs.map(_.getLong(3)).sum
      assert(pmSum >= 990L && pmSum <= 1000L, s"$seg per-mille sum $pmSum")
    }
  }

  test("q181: paths respect the cap and multi-step paths exist") {
    val rows = EventOps.sessionPaths(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1).split(">").length <= EventOps.PathCap)
    }
    assert(rows.exists(_.getString(1).contains(">")),
      "no multi-event paths in the top list")
  }

  test("q187: histogram buckets respect their power-of-4 bounds and conserve") {
    val rows = EventOps.dwellHistogram(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, mn, mx) = (r.getLong(1), r.getLong(3), r.getLong(4))
      val hi = math.pow(4, k).toLong
      assert(mx < hi, s"bucket $k max $mx >= $hi")
      if (k > 0) assert(mn >= math.pow(4, k - 1).toLong, s"bucket $k min $mn")
    }
    val ev = Tables.events(spark, dir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected,
      "every non-final event per user must land in exactly one bucket")
  }

  test("q188: LOCF fills from the same user's past only; all classes fire") {
    val rows = EventOps.forwardFill(spark, dir).collect()
    val (obs, imp, unf) = (rows.map(_.getLong(1)).sum,
      rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    assert(obs > 0 && imp > 0 && unf > 0, "all three repair classes must fire")
    val total = Tables.events(spark, dir).count()
    assert(obs + imp + unf === total)
    // unfillable = users whose FIRST events are masked: count directly
    val masked = Tables.events(spark, dir)
      .withColumn("m", col("event_id") % 7 === 0)
    val leadNulls = masked
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("ts", "event_id")))
      .orderBy("user_id", "rn").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (_, evs) => evs.sortBy(_.getAs[Int]("rn"))
        .takeWhile(_.getAs[Boolean]("m")).length }
      .sum
    assert(unf.toInt === leadNulls)
  }

  test("q195: credit conserves exactly at one million micro-units per attributed purchase") {
    val rows = EventOps.linearAttribution(spark, dir).collect()
    val unattr = rows.find(_.getLong(0) == -1L).get.getLong(1)
    val totalCredit = rows.filter(_.getLong(0) >= 0L).map(_.getLong(2)).sum
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(totalCredit === 1000000L * (purchases - unattr),
      "credit mass must equal 1e6 per attributed purchase — integer remainder included")
    assert(unattr > 0, "unattributed ledger row unexercised")
    rows.filter(_.getLong(0) >= 0L)
      .foreach(r => assert(r.getLong(0) <= EventOps.AttribWindowH))
  }

  test("q194: streaming LOCF totals equal the q188 batch ledger") {
    import graft.streaming.EventsStream
    val streamed = EventsStream.runAvailableNow(spark,
      EventsStream.forwardFillStream(EventsStream.source(spark, dir)),
      "fill_spec_drain", outputMode = "complete").collect()
    val (sMiss, sImp, sUnf) = (streamed.map(_.getLong(2)).sum,
      streamed.map(_.getLong(3)).sum, streamed.map(_.getLong(4)).sum)
    val batch = EventOps.forwardFill(spark, dir).collect()
    assert(sImp === batch.map(_.getLong(2)).sum)
    assert(sUnf === batch.map(_.getLong(3)).sum)
    assert(sMiss === sImp + sUnf)
    // integer-cents mass: the two engines' ledgers agree EXACTLY
    // (long sums are accumulation-order invariant, unlike doubles)
    val sm = streamed.map(_.getLong(5)).sum
    val bm = batch.map(_.getLong(4)).sum
    assert(sm === bm, s"imputed mass cents $sm vs $bm")
  }

  test("q189: island arithmetic conserves and both flag classes fire") {
    val rows = EventOps.botRuns(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "max run cannot exceed events")
      assert(r.getLong(2) <= r.getLong(1), "islands cannot exceed events")
    }
    val flags = rows.map(_.getLong(4)).toSet
    assert(flags === Set(0L, 1L), "both bot and clean users must exist")
    assert(rows.map(_.getLong(1)).sum === Tables.events(spark, dir).count())
  }

  test("q182: waterfill conserves the budget exactly and is max-min fair") {
    val rows = graft.text.MixturePlan.mixtureWaterfill(spark, dir).collect()
    val budget = rows.head.getLong(4)
    assert(rows.map(_.getLong(2)).sum === budget, "allocation must sum to budget")
    val (capped, uncapped) = rows.partition(_.getLong(3) == 1L)
    assert(capped.nonEmpty && uncapped.nonEmpty, "both branches must fire")
    capped.foreach(r => assert(r.getLong(2) === r.getLong(1), "capped = whole source"))
    uncapped.foreach(r => assert(r.getLong(2) <= r.getLong(1), "alloc within availability"))
    val allocs = uncapped.map(_.getLong(2))
    assert(allocs.max - allocs.min <= 1L, "uncapped shares must differ by at most 1")
    // max-min fairness: every capped source is smaller than every uncapped share
    capped.foreach(c => assert(c.getLong(1) <= allocs.min))
  }
}
