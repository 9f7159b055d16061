package graft.vector

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q211 power iteration: the distributed 6-round state must equal an
  * exact BigInt replay from the raw parquet doubles, and the iterate
  * must satisfy the L∞-normalization invariant. */
class PowerIterationSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("distributed rounds == exact BigInt replay; L-inf invariant (q211)") {
    val vecs = graft.tables.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](1).take(VectorOps.PiDim)
        .map(x => BigInt(math.floor(x * VectorOps.PiQ + 0.5).toLong)).toArray)
    val d = VectorOps.PiDim
    val g = Array.tabulate(d, d)((i, j) =>
      vecs.iterator.map(v => v(i) * v(j)).sum)
    val s = BigInt(VectorOps.PiS)
    var w = Array.fill(d)(s)
    var lambdas = List.empty[BigInt]
    for (_ <- 1 to VectorOps.PiRounds) {
      val u = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * w(j)).sum)
      val m = u.map(_.abs).max.max(BigInt(1))
      w = u.map(ui => (ui + m) * s / m - s)
      val num = (for (i <- 0 until d; j <- 0 until d) yield g(i)(j) * w(i) * w(j)).sum
      val den = w.map(x => x * x).sum
      lambdas ::= num * 1000000 / den
    }
    val got = VectorOps.powerIteration(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._2).toSeq === w.map(_.toLong).toSeq)
    assert(got.map(_._3).distinct.toSeq === Seq(lambdas.head.toLong))
    // L-inf normalization: at least one coordinate at +/-PiS, none above
    assert(got.map(r => math.abs(r._2)).max === VectorOps.PiS)
    // Rayleigh quotient is nonnegative (G is PSD) and, for power
    // iterates of a symmetric PSD matrix, nondecreasing round-over-
    // round (allow a 0.1% dip for the integer renormalization floor).
    // NOT asserted: closeness to lambda_1 — near-isotropic synthetic
    // embeddings have a small spectral gap, so 6 rounds leave a real
    // residual; both engines compute the same 6-round state either way.
    val ls = lambdas.reverse.map(BigDecimal(_))
    assert(ls.forall(_ >= 0))
    ls.sliding(2).foreach {
      case Seq(prev, next) => assert(next >= prev - prev * 0.001)
      case _ =>
    }
  }
}
