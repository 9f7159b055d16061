package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: report how many build/walk rounds q252 actually executes
  * under the round-13 fixpoint early exit, and its wall, per corpus.
  * Usage: runMain graft.tools.ProbeQ252Rounds <dir> */
object ProbeQ252Rounds {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.vector.VectorOps.annGraph(spark, dir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[probe252r] dir=$dir rows=$n wall=$secs%.1f s " +
      s"buildRounds=${graft.vector.VectorOps.lastBuildRoundsRun}/${graft.vector.VectorOps.NswBuildRounds} " +
      s"walkRounds=${graft.vector.VectorOps.lastWalkRoundsRun}/${graft.vector.VectorOps.NswSearchRounds}")
    spark.stop()
  }
}
