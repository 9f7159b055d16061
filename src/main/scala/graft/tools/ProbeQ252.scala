package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: decompose q252 graph-ANN recall at scale into BUILD
  * quality (are the true top-3 among each query node's own refined
  * out-edges?) vs SEARCH quality (does the beam walk reach them from
  * the entry?). Usage: runMain graft.tools.ProbeQ252 <dir> [rounds] */
object ProbeQ252 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt)
      .getOrElse(graft.vector.VectorOps.NswBuildRounds)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.vector.VectorOps
    val brute = VectorOps.knnBrute(spark, dir)
      .filter(col("rank") <= VectorOps.KLsh)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nb = brute.count()
    // replicate the build portion only, via the public entry with 0
    // search value: we re-run annGraphAt and grab its edges through a
    // dev hook
    val edges = VectorOps.devBuildGraph(spark, dir, VectorOps.NswM, rounds)
    val qEdges = edges.filter(col("src") < VectorOps.QueryMax)
      .select(col("src").as("query_id"), col("dst").as("neighbor_id"))
    val hit = brute.join(qEdges, Seq("query_id", "neighbor_id")).count()
    println(f"[probe252] dir=$dir rounds=$rounds build-contains-true-top3: $hit/$nb = ${hit.toDouble / nb}%.3f")
    val beam = args.lift(2).map(_.toInt).getOrElse(VectorOps.NswBeam)
    val sr = args.lift(3).map(_.toInt).getOrElse(VectorOps.NswSearchRounds)
    val t0 = System.nanoTime()
    val got = VectorOps.annGraphAt(spark, dir, VectorOps.NswM, rounds, beam, sr)
      .select("query_id", "neighbor_id")
    val shit = brute.join(got, Seq("query_id", "neighbor_id")).count()
    println(f"[probe252] search recall@3 (beam=$beam sr=$sr): $shit/$nb = ${shit.toDouble / nb}%.3f in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
