package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: prove the large-star/small-star cluster map (q134) equals
  * min-label propagation (q72) on an arbitrary corpus — the scale-run
  * equality check (at 10× the recursive-CTE DuckDB oracle is
  * impractically slow, but q72 itself hash-matched it at 10× in the r5
  * protocol, so star == propagation transfers the certificate).
  *
  * Usage: runMain graft.tools.CcProbe [sfDir]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val star = graft.dedup.DedupOps.dedupClustersStar(spark, dir).cache()
    val prop = graft.dedup.DedupOps.dedupClusters(spark, dir).cache()
    val n = star.count()
    val diff = star.exceptAll(prop).count() + prop.exceptAll(star).count()
    println(s"[ccprobe] dir=$dir nodes=$n diff=$diff")
    require(diff == 0, s"star CC diverged from propagation on $dir")
    spark.stop()
  }
}
