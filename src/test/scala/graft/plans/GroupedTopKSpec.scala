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

  test("plan contains the custom exec node and one exchange") {
    val top = Relational.topOrdersPerPriorityCustom(spark, dir)
    // SparkPlan.nodeName strips the "Exec" suffix in plan rendering
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan)
  }
}
