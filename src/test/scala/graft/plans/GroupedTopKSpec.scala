package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession
import graft.analytics.Relational

/** The custom bounded-heap operator must agree exactly with the
  * window-function formulation, including tie-breaks. */
class GroupedTopKSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("GroupedTopK equals row_number window form on orders") {
    val window = Relational.topOrdersPerPriority(spark, dir)
    val custom = Relational.topOrdersPerPriorityCustom(spark, dir)
    assert(custom.columns.toSeq === window.columns.toSeq)
    assert(custom.exceptAll(window).count() === 0)
    assert(window.exceptAll(custom).count() === 0)
  }

  test("GroupedTopK handles k larger than group size and single groups") {
    val df = spark.range(7).toDF("x")
      .withColumn("g", col("x") % 2)
    val top = GroupedTopK(df, Seq("g"), Seq("x" -> false), k = 10)
    assert(top.count() === 7)
    val r1 = top.filter(col("rank") === 1).orderBy("g")
      .select("x").collect().map(_.getLong(0)).toSeq
    assert(r1 === Seq(6L, 5L))  // max x per parity group
  }

  test("group-key filters are pushed below GroupedTopK (optimizer rule)") {
    val top = Relational.topOrdersPerPriorityCustom(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val optimized = top.queryExecution.optimizedPlan
    // after PushFilterThroughGroupedTopK, no Filter sits ABOVE the node
    // (the predicate should reach the scan), and the node is still there
    var aboveFilter = false
    var seenTopK = false
    optimized.foreach {
      case _: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        if (!seenTopK) aboveFilter = true
      case g: GroupedTopK => seenTopK = true
      case _ =>
    }
    assert(seenTopK, optimized.toString)
    assert(!aboveFilter, s"filter not pushed below GroupedTopK:\n$optimized")
    // the predicate must reach the parquet scan as a pushed filter
    val physical = top.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]")
      || physical.contains("EqualTo(o_orderpriority,1-URGENT)"), physical)
    // semantics unchanged: equals filter-after-rank on the window form
    val expected = Relational.topOrdersPerPriority(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    assert(top.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(top).count() === 0)
  }

  test("rank/order filters are NOT pushed (they don't commute)") {
    val top = Relational.topOrdersPerPriorityCustom(spark, dir)
      .filter(col("rank") <= 2 && col("o_orderpriority") === "1-URGENT")
    // still correct: rank filter applied above, group filter pushed
    val expected = Relational.topOrdersPerPriority(spark, dir)
      .filter(col("rank") <= 2 && col("o_orderpriority") === "1-URGENT")
    assert(top.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(top).count() === 0)
  }

  test("plan contains the custom exec node and one exchange") {
    val top = Relational.topOrdersPerPriorityCustom(spark, dir)
    // SparkPlan.nodeName strips the "Exec" suffix in plan rendering
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan)
  }
}
