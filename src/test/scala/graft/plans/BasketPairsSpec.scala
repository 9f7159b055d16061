package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** BasketPairs under a pathological MEGA-BASKET (r14 verdict #6 / r15
  * ask #9): one basket holding thousands of distinct items concentrates
  * its whole C(m, 2) fanout in a single aggregation buffer (aggregate
  * form) or a single shuffle bucket (join form) — the same bound either
  * way, but the aggregate path additionally holds the basket's full
  * distinct item SET in one ObjectHashAggregate buffer. This spec pins:
  *
  *  1. the two implementations stay value-equivalent on exactly this
  *     shape (duplicate items, NULL baskets, NULL items included);
  *  2. the aggregate path really is ObjectHashAggregate (the map-side-
  *     combined set union the scale notes rely on);
  *  3. the ObjectHashAggregate SORT-BASED FALLBACK (the §5 safety valve
  *     when mega-basket buffers exhaust the hash map — forced here via
  *     spark.sql.objectHashAggregate.sortBased.fallbackThreshold=2)
  *     completes and produces the identical pair set, so a real
  *     mega-basket degrades to sort, not to an OOM. */
class BasketPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val MegaBasketItems = 1200

  private def fixture = {
    import spark.implicits._
    val mega = (1 to MegaBasketItems).map(i => (Option(10L), Option(i.toLong)))
    val dups = (1 to 100).map(i => (Option(10L), Option(i.toLong))) // re-lands
    val small = Seq(
      (Option(20L), Option(5L)), (Option(20L), Option(7L)),
      (Option(30L), Option(5L)), (Option(30L), Option(7L)), (Option(30L), Option(9L)),
      (Option.empty[Long], Option(5L)), // NULL basket: never pairs
      (Option(40L), Option.empty[Long]), (Option(40L), Option(3L))) // NULL item: never pairs
    (mega ++ dups ++ small).toDF("o", "p")
  }

  test("mega-basket: aggregate ≡ join form, ObjectHashAggregate path, sort fallback completes") {
    val df = fixture
    val agg = BasketPairs(df, "o", "p")
    val join = BasketPairs.viaJoinOfDistinct(
      df.filter(col("o").isNotNull).distinct(), "o", "p")

    // 2. the aggregate path is the map-side-combinable object hash agg
    assert(agg.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"),
      "basket set aggregation no longer runs as ObjectHashAggregate")

    // 1. exact pair-set equivalence (distributed compare, no collect):
    // C(1200, 2) = 719,400 distinct (pa, pb) rows — the small baskets'
    // items all re-land inside the mega basket, raising counts only
    val nAgg = agg.count()
    assert(nAgg == MegaBasketItems.toLong * (MegaBasketItems - 1) / 2,
      s"unexpected pair count $nAgg")
    assert(agg.join(join, Seq("pa", "pb", "n"), "left_anti").isEmpty &&
      join.join(agg, Seq("pa", "pb", "n"), "left_anti").isEmpty,
      "aggregate and join pair builders diverged on the mega-basket fixture")

    // 3. force the sort-based fallback after 2 hash-map entries: the
    // mega-basket buffer must survive the spill path with identical output
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "2")
    try {
      val aggFb = BasketPairs(df, "o", "p")
      assert(aggFb.count() == nAgg)
      assert(aggFb.join(join, Seq("pa", "pb", "n"), "left_anti").isEmpty,
        "sort-based fallback produced different pairs")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
