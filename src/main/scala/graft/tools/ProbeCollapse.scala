package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the COLLAPSED-form censuses behind the simhash/phash
  * families — distinct signature classes, class-size maxima, and
  * rep-space radius-1 pair counts — the observables that stay linear
  * when member-pair expansion is quadratic-by-construction.
  * Usage: runMain graft.tools.ProbeCollapse <dir> */
object ProbeCollapse {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.DedupOps
    val hs = graft.functions.NativeExprs.tokenHashes(
      graft.functions.TextExprs.tokensCol(col("text")))
    val sigs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.NativeExprs.simHash(hs, DedupOps.SimhashBits).as("sig"))
      .groupBy("sig").agg(count(lit(1)).as("n"))
      .cache()
    val nSig = sigs.count()
    val maxG = sigs.agg(max("n")).collect().head.getLong(0)
    // rep-space radius-1 pairs: distinct sigs at hamming <= 1
    val reps = sigs.select(col("sig"))
    val r1 = reps.as("a").join(reps.as("b"),
        col("a.sig") < col("b.sig") &&
        expr("bit_count(a.sig ^ b.sig)") <= 1).count()
    println(s"[collapse] dir=$dir simhash: distinct_sigs=$nSig max_group=$maxG rep_pairs_r1=$r1")
    val cls = graft.multimodal.MultimodalOps.phashGroups(spark, dir)
      .filter(col("asset_id") === col("rep_id"))
      .agg(count(lit(1)).as("classes"), max("n_same").as("max_class"))
      .collect().head
    println(s"[collapse] dir=$dir phash: classes=${cls.getLong(0)} max_class=${cls.getLong(1)}")
    spark.stop()
  }
}
