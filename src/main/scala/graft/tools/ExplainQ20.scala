package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
object ExplainQ20 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($r)")
    }
    val docs = Tables.documents(spark, dir)
    val hs = docs.select(col("doc_id"),
      array_distinct(transform(shinglesCol(tokensCol(col("text"))), s => polyHashCol(s))).as("hs"))
    val ex = hs.select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("h")).cache()
    time("cache run1")(ex.count())
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    time("pairs run1")(pairs.count())
    Thread.sleep(600000)
    spark.stop()
  }
}
