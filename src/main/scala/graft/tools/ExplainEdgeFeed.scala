package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the co-purchase EDGE FEED subplan (the part of the
  * q123/q128/q196 census queries that runs as its own eager-checkpoint
  * job, so it never appears in the final query's explain) under both
  * BasketPairs implementations. Evidence for the round-15 per-call-site
  * routing decision. */
object ExplainEdgeFeed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "plans/r15"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for ((impl, ms) <- Seq(("agg", 1L), ("join", 1L))) {
      spark.conf.set("graft.plans.basketPairsImpl", impl)
      val plan = graft.graph.GraphOps.edges(spark, dir, ms)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/edge_feed_minsup1_$impl.txt"), plan)
      println(s"[explain] $outDir/edge_feed_minsup1_$impl.txt")
    }
    spark.stop()
  }
}
