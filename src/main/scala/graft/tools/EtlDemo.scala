package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI entry for the sales ETL pipeline — the Spark-native equivalent of
  * `python dataflow_transform.py --input … --output …`
  * (reference: dataflow/dataflow_transform.py:135-143).
  *
  * Usage: runMain graft.tools.EtlDemo <input.csv> <outDir>
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: EtlDemo <input.csv> <outDir>")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val res = graft.analytics.SalesPipeline.run(spark, args(0), args(1))
      println(s"[etl] clean=${res.cleanRows} errors=${res.errorRows}")
      println(s"[etl] report=${res.report.mkString("; ")}")
      println("[etl] clean rows:")
      spark.read.parquet(s"${args(1)}/clean").orderBy("id").show(100, truncate = false)
      println("[etl] dead-letter rows:")
      spark.read.parquet(s"${args(1)}/errors").groupBy("error").count().show(truncate = false)
    } finally spark.stop()
  }
}
