package graft.text

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** q255 incremental curation refresh: (1) incremental maintenance ≡
  * full recompute (the oracle also pins this cross-engine; here it is
  * pinned engine-internally against q254's own frame), (2) the
  * corpus-side prefix-take reflow really is EXCHANGE-FREE — the window
  * consumes the source-bucketed state scan with no shuffle on its
  * stream path (broadcast sides excluded: the waterfill plan and the
  * 1-row threshold arrive by broadcast by design). */
class CurationRefreshSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("refresh manifest equals the full-recompute q254 manifest") {
    val full = CurationPipeline.curationManifest(spark, dir)
      .orderBy("split", "lang").collect().map(_.toSeq)
    val inc = CurationRefresh.curationRefresh(spark, dir)
      .orderBy("split", "lang").collect().map(_.toSeq)
    assert(inc.toSeq == full.toSeq)
  }

  test("corpus reflow window runs exchange-free over the bucketed state scan") {
    val st = CurationRefresh.buildState(spark, dir)
    try {
      val manifest = CurationRefresh.refresh(spark, dir, st)
      val plan = manifest.queryExecution.sparkPlan

      // stream-side traversal: stop at broadcast boundaries (bounded
      // sides by design), collect shuffles / scans on the stream path
      def stream[A](p: SparkPlan)(pf: PartialFunction[SparkPlan, A]): Seq[A] = {
        val here = pf.lift(p).toSeq
        p match {
          case _: BroadcastExchangeExec => Nil
          case other => here ++ other.children.flatMap(c => stream(c)(pf))
        }
      }
      def streamHasStateScan(p: SparkPlan): Boolean =
        stream(p) { case f: FileSourceScanExec
          if f.toString.contains("graft_q255_docs") => f }.nonEmpty

      val windows = plan.collect { case w: WindowExec => w }
      val corpusWindows = windows.filter(streamHasStateScan)
      assert(corpusWindows.nonEmpty,
        "no window found over the bucketed state scan — seam moved?")
      corpusWindows.foreach { w =>
        val shuffles = stream(w) { case s: ShuffleExchangeExec => s }
        assert(shuffles.isEmpty,
          s"corpus reflow window shuffles on its stream path:\n$w")
      }
    } finally st.tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
