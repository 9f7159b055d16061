package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.vector.VectorOps

/** Dev-only: print the geometry probe's (μ²-med, c1-med, route) for
  * the organic corpus and both derived diagnostic corpora of a SF dir,
  * plus any extra corpus dirs given — the measurement that pins
  * [[VectorOps.RouterC1Threshold]]'s margins.
  * Usage: runMain graft.tools.ProbeGeometry <sfDir> [extraDir...] */
object ProbeGeometry {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir("/tmp/graft_probe_ckpt")
    def show(tag: String, base: org.apache.spark.sql.DataFrame): Unit = {
      val (mu2, c1, route) = VectorOps.geometryProbeOn(base)
      println(f"[probe] $tag%-20s mu2=$mu2%.4f c1=$c1 route=$route")
    }
    def orgOf(d: String) = graft.tables.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    show(s"organic:$dir", orgOf(dir))
    show("lowdim-derived", VectorOps.devRouterLowBase(spark, dir))
    show("clustered-derived", VectorOps.devRouterClusterBase(spark, dir))
    args.drop(1).foreach(d => show(s"extra:$d", orgOf(d)))
    spark.stop()
  }
}
