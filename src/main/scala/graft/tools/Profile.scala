package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._

/** Dev-only micro-profiler for the hot bench queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    val docs = Tables.documents(spark, dir)
    time("docs count")(docs.count())
    time("tokens")(docs.select(tokensCol(col("text")).as("t")).selectExpr("sum(size(t))").head())
    time("shingles")(docs.select(shinglesCol(tokensCol(col("text"))).as("s"))
      .selectExpr("sum(size(s))").head())
    val hs = docs.select(col("doc_id"),
      array_distinct(transform(shinglesCol(tokensCol(col("text"))), s => polyHashCol(s))).as("hs"))
    time("shingle hashes")(hs.selectExpr("sum(size(hs))").head())
    val ex = hs.select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("h"))
    time("exploded index")(ex.count())
    val exC = ex.cache()
    time("cache materialize")(exC.count())
    val pairs = exC.as("a").join(exC.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    time("pair join+agg")(pairs.count())
    time("q20 full")(graft.dedup.DedupOps.ngramJaccard(spark, dir).count())
    time("q21 full")(graft.dedup.DedupOps.minhashLsh(spark, dir).count())
    time("q16 full")(graft.text.TextOps.langId(spark, dir).count())
    val tk = tokensCol(col("text"))
    time("q16 zh regex only")(docs.select(
      regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]")).as("z"))
      .selectExpr("sum(z)").head())
    time("q16 markers only")(docs.select(
      size(filter(tk, t => t.isin("the", "and", "of", "is", "to"))).as("s"))
      .selectExpr("sum(s)").head())
    spark.stop()
  }
}
