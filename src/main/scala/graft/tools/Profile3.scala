package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
object Profile3 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($r)")
    }
    val hsets = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        graft.functions.NativeExprs.shingleHashes(tokensCol(col("text")), ShingleW, P).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("n", size(col("hs")))
      .localCheckpoint()
    time("hsets")(hsets.count())
    val bands = hsets
      .select(col("doc_id"), minhashSigCol(col("hs")).as("sig"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(Bands - 1))).as("b"), col("sig"))
      .select(col("doc_id"), col("b"), bandKeyCol(col("sig"), col("b")).as("bkey"))
      .localCheckpoint()
    time("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .localCheckpoint()
    time("cand")(cand.count())
    val h1 = hsets.select(col("doc_id").as("d1"), col("hs").as("hs1"), col("n").as("n1"))
    val h2 = hsets.select(col("doc_id").as("d2"), col("hs").as("hs2"), col("n").as("n2"))
    val fin = cand.join(h1, "d1").join(h2, "d2")
      .withColumn("shared", size(array_intersect(col("hs1"), col("hs2"))))
      .withColumn("jaccard", round(
        col("shared").cast("double") / (col("n1") + col("n2") - col("shared")), 4))
      .filter(col("jaccard") >= graft.dedup.DedupOps.JaccardThreshold)
    time("verify join")(fin.count())
    time("q21 full fresh")(graft.dedup.DedupOps.minhashLsh(spark, dir).count())
    spark.stop()
  }
}
