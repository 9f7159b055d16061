package graft
import org.apache.spark.sql.SparkSession

/** Bench harness: runs every SparkEntry query once against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":…,"queries":{…},"errors":{…},"sf":…}`.
  *
  * Failure policy: a query that throws is recorded with a NEGATIVE
  * elapsed time in `queries` plus its message in `errors`, is excluded
  * from the total, and the process exits nonzero — a broken query must
  * not read as a fast pass in bench telemetry.
  */
object Bench {
  /** First-pass time above which a query earns one re-run (min wins). */
  val RerunThresholdSec = 5.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Stable name order; drop per-query state (caches AND the
    // lineage-truncation localCheckpoint blocks, which clearCache does
    // not touch) so queries don't fight for storage within the JVM.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def run1(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val failed = try { fn(spark, sfDir).count(); false } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
          true
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      if (failed) -dt else dt
    }
    // Untimed warmup: primes the parquet reader, codegen compiler, and
    // shuffle machinery so the alphabetically-first query doesn't carry
    // the JVM's one-time init in its number.
    try graft.tables.Tables.lineitem(spark, sfDir)
      .limit(10000).groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = ordered.map { case (name, fn) => name -> run1(name, fn) }
    // The host is shared: transient CPU contention can inflate an
    // arbitrary query 10×+. Re-run the slow successes once and keep the
    // per-query minimum — the reproducible engine cost, not the noise.
    val results = pass1.map { case (name, t) =>
      if (t >= RerunThresholdSec) {
        val t2 = run1(name, SparkEntry.queries(name))
        if (t2 >= 0) name -> math.min(t, t2)
        else { errors.remove(name); name -> t } // pass-1 success stands
      } else name -> t
    }.toMap
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(2)
  }
}
