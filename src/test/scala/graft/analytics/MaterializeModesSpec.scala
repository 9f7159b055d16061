package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** The dedup pipelines' lineage-truncation barriers must be a pure
  * performance choice, never load-bearing for correctness: the default
  * `localCheckpoint` path, the cluster-mode lineage-only path
  * (`graft.dedup.eagerMaterialize=false`), and the fault-tolerant
  * reliable-`checkpoint` path (`graft.dedup.materializeMode=reliable`)
  * must all produce identical rows on the multi-self-join queries that
  * lean on the barriers hardest (q21 LSH, q72 cluster propagation, q98
  * consensus overlay). */
class MaterializeModesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"
  private val queries = Seq("q21_minhash_lsh", "q72_dedup_clusters", "q98_consensus_neardup")

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def rows(name: String): Set[String] =
    graft.SparkEntry.queries(name)(spark, dir)
      .collect().map(_.mkString("|")).toSet

  private lazy val defaults: Map[String, Set[String]] =
    queries.map(n => n -> rows(n)).toMap

  test("lineage-only path (eagerMaterialize=false) matches the localCheckpoint default") {
    withConfs("graft.dedup.eagerMaterialize" -> "false") {
      for (n <- queries) {
        val got = rows(n)
        assert(got === defaults(n), s"$n diverged on the lineage-only path")
        assert(got.nonEmpty, s"$n returned nothing")
      }
    }
  }

  test("reliable checkpoint path matches the localCheckpoint default") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_")
    graft.sources.TempDirs.deleteOnExit(ckpt)
    val saved = Option(spark.sparkContext.getCheckpointDir).flatten
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    try withConfs("graft.dedup.materializeMode" -> "reliable") {
      for (n <- queries)
        assert(rows(n) === defaults(n), s"$n diverged on the reliable-checkpoint path")
    } finally saved.foreach(spark.sparkContext.setCheckpointDir)
  }
}
