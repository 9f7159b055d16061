package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q196–q198 pins the oracle gate cannot see: planted-graph k-core
  * semantics (the oracle only certifies Spark-vs-DuckDB agreement on
  * the sf corpus, not that peeling itself is right), drift-ledger
  * conservation, and the k-vs-l privacy split. */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("u", "v")

  test("q196: a clique survives peeling, an attached tree peels away entirely") {
    // K4 on 0..3 (every degree 3) + a path 3—10—11—12 hanging off it
    val e = sym(Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 10L), (10L, 11L), (11L, 12L)))
    val core = graft.graph.GraphOps.kCorePeel(e, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      "3-core of K4+tail must be exactly the K4, every node at in-core degree 3")
  }

  test("q196: peeling cascades one layer per round and still reaches the fixpoint") {
    // cycle 0..5 + tail 0—100—101—102: at k=2 the tail peels endpoint
    // by endpoint (3 rounds), the cycle survives whole
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6))
    val e = sym(cycle ++ Seq((0L, 100L), (100L, 101L), (101L, 102L)))
    val core = graft.graph.GraphOps.kCorePeel(e, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === (0L until 6L).map(_ -> 2L).toMap)
  }

  test("q196: a graph below threshold everywhere peels to the empty core") {
    val e = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L))) // path: max degree 2
    assert(graft.graph.GraphOps.kCorePeel(e, k = 3).count() === 0L)
  }

  test("q196: sf k-core peels a strict, non-empty subset at the derived threshold") {
    val rows = graft.graph.GraphOps.kCore(spark, dir).collect()
    assert(rows.nonEmpty, "k-core of the sf co-purchase graph should be non-empty")
    val nParts = Tables.part(spark, dir).count()
    assert(rows.length < nParts,
      "the scale-free threshold must make peeling non-trivial (some node removed)")
    // independent recomputation of the scale-free threshold; every
    // survivor must meet it IN-CORE (stronger than initial degree)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e0 = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val deg = e0.select(col("u")).unionAll(e0.select(col("v").as("u")))
      .groupBy("u").agg(count(lit(1)).as("deg"))
    val k = graft.graph.GraphOps.kCoreThreshold(deg)
    assert(k > 3L, "derived threshold should exceed any trivial constant here")
    rows.foreach { r =>
      assert(r.getLong(1) >= k,
        s"part ${r.getLong(0)} survived with in-core degree ${r.getLong(1)} < $k")
      assert(r.getInt(2) === 1, "sf peel must report convergence within the round cap")
    }
  }

  test("q197: drift ledger conserves events and stays in ppm range") {
    val rows = DriftOps.driftMonitor(spark, dir).collect()
    assert(rows.length === 5, "one row per event_type")
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total === Tables.events(spark, dir).count(), "n_ref + n_cur conserves")
    rows.foreach { r =>
      val tv = r.getLong(4)
      assert(tv >= 0L && tv <= 1000000L, s"${r.getString(0)}: tv_ppm $tv")
      assert(r.getInt(5) === (if (tv > DriftOps.DriftTvPpmThreshold) 1 else 0))
    }
  }

  test("q197: identical windows read zero drift, disjoint windows read ~max drift") {
    // invariance probe on the metric itself via the same expressions:
    // same histogram twice -> TV 0; fully disjoint bands -> TV ~1e6
    val h = Seq((1L, 10L, 10L), (2L, 30L, 30L)).toDF("band", "cnt_ref", "cnt_cur")
    val tv0 = h.agg(expr(
      "sum(abs(cnt_ref * 1000000 div 40 - cnt_cur * 1000000 div 40)) div 2"))
      .collect()(0).getLong(0)
    assert(tv0 === 0L)
    val hd = Seq((1L, 40L, 0L), (2L, 0L, 40L)).toDF("band", "cnt_ref", "cnt_cur")
    val tv1 = hd.agg(expr(
      "sum(abs(cnt_ref * 1000000 div 40 - cnt_cur * 1000000 div 40)) div 2"))
      .collect()(0).getLong(0)
    assert(tv1 === 1000000L)
  }

  test("q198: diversity is bounded by class size and by the segment universe") {
    val rows = PrivacyOps.lDiversityAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    val nSegments = Tables.customer(spark, dir)
      .select(countDistinct(col("c_mktsegment"))).collect()(0).getLong(0)
    rows.foreach { r =>
      val (div, nClasses, nRecords) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(div >= 1L && div <= nSegments)
      assert(nRecords >= nClasses * div,
        s"diversity $div: $nRecords records in $nClasses classes needs >= ${nClasses * div}")
      // exposure ledger is all-or-nothing per diversity level
      val exposed = r.getLong(3)
      assert(exposed === (if (div < PrivacyOps.LDiv) nRecords else 0L))
    }
    // total records conserve across diversity levels
    assert(rows.map(_.getLong(2)).sum ===
      Tables.customer(spark, dir).count())
  }
}
