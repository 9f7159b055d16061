package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.SparkTestSession
import graft.functions.NativeExprs

/** q163 pins the oracle gate cannot see:
  *  - the TypedImperativeAggregate's bottom-k is PARTITION-INVARIANT
  *    (KMV union algebra is exact, so map-side partials merge
  *    losslessly under any partitioning), and equals the relational
  *    row_number() ≤ k form the oracle uses;
  *  - in the exact regime (|A ∪ B| ≤ k the sketch IS the set) the
  *    estimator returns the true Jaccard;
  *  - in the genuinely approximate regime (union ≫ k, synthetic
  *    corpus of known overlap) the estimate lands inside the 3σ
  *    binomial band around the true value. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("bottom-k aggregate is partition-invariant and matches row_number form") {
    import spark.implicits._
    val vals = (1L to 5000L).map(i => ("s", (i * 2654435761L) % 1000000007L))
    val base = vals.toDF("source", "h")
    val viaAgg = (reparts: Int) => base.repartition(reparts)
      .groupBy("source").agg(NativeExprs.bottomK(col("h"), KmvSketch.K).as("sk"))
      .collect().head.getSeq[Long](1)
    val one = viaAgg(1)
    assert(one === viaAgg(7))
    assert(one === viaAgg(32))
    val viaWindow = base.distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("h")))
      .filter(col("rn") <= KmvSketch.K)
      .orderBy("h").select("h").as[Long].collect().toSeq
    assert(one === viaWindow)
  }

  test("estimator is exact when the pair union fits in the sketch") {
    val rows = KmvSketch.kmvOverlap(spark, dir)
      .select("k_used", "est_j_bp", "exact_j_bp", "abs_err_bp").collect()
    assert(rows.nonEmpty)
    rows.filter(r => r.getLong(0) < KmvSketch.K).foreach { r =>
      assert(r.getLong(3) === 0L,
        s"union ${r.getLong(0)} < K but est ${r.getLong(1)} != exact ${r.getLong(2)}")
    }
  }

  test("estimate lands in the 3-sigma band on a known-overlap synthetic corpus") {
    import spark.implicits._
    // A = {0..1999}, B = {1000..2999}: |A∩B| = 1000, |A∪B| = 3000,
    // J = 1/3 — far above K=64, so the sketch path is genuinely
    // approximate here (unlike the sf0.01 corpus where unions fit).
    val f = ((0L until 2000L).map(("a", _)) ++ (1000L until 3000L).map(("b", _)))
      .toDF("source", "fp")
    val r = KmvSketch.kmvOverlapFrom(f).collect().head
    val kUsed = r.getAs[Long]("k_used")
    val est = r.getAs[Long]("est_j_bp")
    assert(kUsed === KmvSketch.K.toLong)
    assert(r.getAs[Long]("exact_j_bp") === 3333L)
    // 3σ for a binomial proportion at J=1/3, k=64: ±~1770 bp
    assert(math.abs(est - 3333L) <= 1770L,
      s"estimate $est bp outside 3-sigma band around 3333 bp")
  }
}
