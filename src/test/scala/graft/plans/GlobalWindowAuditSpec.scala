package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** The single-partition global-window audit as a STANDING GATE (r13
  * verdict ask #4) — `DoubleSumAuditSpec`'s sibling. Round 14 converted
  * the last corpus-growing `Window.orderBy(...)` ranks (q193 AUC, q222
  * deciles, the q225/q254 conformal order statistic) to the exact
  * value-histogram form, but a NEW query with an unpartitioned window
  * over a row-sized input would silently reopen the class — q254
  * inherited `conformalThr`'s global rank precisely because nothing
  * flagged it. This spec walks every SparkEntry query's ANALYZED plan
  * and fails on any `Window` with an EMPTY partition spec unless:
  *
  *  1. it is LADDER-SHAPED — the window's child (through
  *     Project/Filter/alias wrappers) is an Aggregate whose GROUPING
  *     KEYS cover every order key, i.e. the window runs over the
  *     distinct-VALUE histogram (q155/q232 pattern: cardinality
  *     bounded by distinct values, not corpus rows), or
  *  2. it is a documented keep-case in [[Allow]] with the boundedness
  *     argument recorded next to it.
  *
  * A negative control proves the walker sees the unsafe shape. */
class GlobalWindowAuditSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  /** Documented keep-cases — (query, sorted order-key names), each
    * with its boundedness argument:
    *  - q76/q114 doc-ordered prefix sums: the designed-sort trade is
    *    documented in-source (TextOps.scala per-shard notes) — the
    *    fleet-scale form is per-shard prefix + shard-offset merge.
    *  - TextRank / PMI / path / funnel / plan rankings: inputs are
    *    POST-AGGREGATE catalog-sized tables (vocab, thresholded
    *    collocation pairs, distinct paths, sources) ordered by an
    *    aggregate MEASURE, so the single partition holds distinct
    *    groups, not corpus rows. */
  private val Allow: Set[(String, String)] = Set(
    // doc-ordered prefix sums with in-source per-shard notes
    ("q76_seq_packing", "doc_id"),
    ("q114_pps_sample", "doc_id"),
    // vocab-/catalog-sized post-aggregate rankings
    ("q201_textrank", "mass,n"),
    ("q192_pmi_collocations", "score_u,w1,w2"),
    ("q181_session_paths", "n_sessions,path"),
    ("q182_mixture_waterfill", "avail,source"),
    ("q246_mixture_ess", "avail,source"),
    // q254 embeds the q182 waterfill: same source-cardinality input
    ("q254_curation_pipeline", "avail,source"),
    // q219 skyline: the exact sweep + front rank run on the PRUNED
    // survivor set (front-adjacent mass after the bucket-max prune,
    // documented in TextOps.skylineOf), not the corpus
    ("q219_skyline", "quality_bp"),
    ("q219_skyline", "quality_bp,n_tokens,doc_id"))

  /** Unpartitioned windows in the analyzed plan that are NOT
    * ladder-shaped, as (orderKeys, inputSummary) pairs. */
  private def offendingWindows(df: DataFrame): Seq[String] = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case pr: Project          => strip(pr.child)
      case s: SubqueryAlias     => strip(s.child)
      case f: Filter            => strip(f.child)
      case r: RepartitionOperation => strip(r.child)
      case _                    => p
    }
    // grouping-key exprIds an Aggregate exposes: direct attribute
    // groupings plus result aliases of a grouping expression
    def groupingIds(a: Aggregate): Set[ExprId] = {
      val direct = a.groupingExpressions.collect {
        case ar: AttributeReference => ar.exprId }
      val aliased = a.aggregateExpressions.collect {
        case al: Alias if a.groupingExpressions.exists(_.semanticEquals(al.child)) =>
          al.exprId }
      (direct ++ aliased).toSet
    }
    df.queryExecution.analyzed.collect {
      case w: Window if w.partitionSpec.isEmpty =>
        val orderAttrs = w.orderSpec.map(_.child).collect {
          case ar: AttributeReference => ar }
        val ladder = strip(w.child) match {
          case a: Aggregate =>
            val gids = groupingIds(a)
            orderAttrs.nonEmpty && orderAttrs.forall(ar => gids(ar.exprId))
          case _ => false
        }
        if (ladder) None
        else Some(w.orderSpec.map(_.child.sql.replaceAll("#\\d+", ""))
          .mkString(","))
    }.flatten
  }

  test("every unpartitioned Window in every query is ladder-shaped or documented") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val sites =
        try offendingWindows(fn(spark, dir))
        catch { case e: Throwable =>
          fail(s"$name failed to analyze: ${e.getMessage}") }
      sites.filterNot(s => Allow((name, s)))
        .foreach(s => offenders += s"(\"$name\", \"$s\")")
      spark.sharedState.cacheManager.clearCache()
    }
    assert(offenders.isEmpty,
      s"\nUNPARTITIONED corpus-window site(s) — convert to the value-" +
        s"histogram form (q155/q232/q193 pattern) or add to the allowlist " +
        s"WITH the boundedness argument:\n  ${offenders.mkString("\n  ")}")
  }

  test("negative control: the walker flags a global rank over a row table") {
    import org.apache.spark.sql.expressions.{Window => W}
    val bad = graft.tables.Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(
        W.orderBy(col("l_extendedprice")))) // the exact shape q193 had
      .groupBy(col("l_returnflag")).agg(max(col("rn")).as("m"))
    assert(offendingWindows(bad).nonEmpty, "walker missed the global rank")
  }

  test("negative control 2: a histogram ladder window is recognized as safe") {
    import org.apache.spark.sql.expressions.{Window => W}
    val ok = graft.tables.Tables.lineitem(spark, dir)
      .groupBy(col("l_quantity")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(W.orderBy(col("l_quantity"))))
    assert(offendingWindows(ok).isEmpty,
      "ladder shape wrongly flagged — allowlist churn would follow")
  }
}
