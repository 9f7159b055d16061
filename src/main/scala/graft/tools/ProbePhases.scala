package graft.tools
import org.apache.spark.sql.SparkSession
object ProbePhases {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.vector.VectorOps
    // warm
    VectorOps.annGraph(spark, dir).count()
    var t0 = System.nanoTime()
    VectorOps.devBuildGraph(spark, dir, VectorOps.NswM, VectorOps.NswBuildRounds).count()
    println(f"[phase] build-only: ${(System.nanoTime()-t0)/1e9}%.1f s rounds=${VectorOps.lastBuildRoundsRun}")
    t0 = System.nanoTime()
    VectorOps.annGraph(spark, dir).count()
    println(f"[phase] full: ${(System.nanoTime()-t0)/1e9}%.1f s walkRounds=${VectorOps.lastWalkRoundsRun}")
    spark.stop()
  }
}
