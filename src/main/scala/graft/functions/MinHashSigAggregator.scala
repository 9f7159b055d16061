package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate: the MinHash signature of a GROUP of documents —
  * sig[i] = min over every shingle hash h in the group of
  * (a_i·h + b_i) mod P. The signature of a union of sets is the
  * element-wise min of the sets' signatures, so the buffer is a
  * fixed-size, commutative, MERGEABLE sketch: partial aggregation
  * (map-side combine) ships K longs per group per partition no matter
  * how many documents or shingles the group holds — the canonical
  * scale shape for sketch aggregation (same constants as
  * [[MinHashSigExpr]], so per-row and per-group forms agree).
  *
  * Usage: `udaf(MinHashSigAggregator)` → `df.agg(f(col("hs")))`.
  */
object MinHashSigAggregator extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  private val A = TextExprs.minhashA.toArray
  private val B = TextExprs.minhashB.toArray
  private val P = TextExprs.P
  private val K = A.length

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], hs: Seq[Long]): Array[Long] = {
    if (hs != null) {
      val it = hs.iterator
      while (it.hasNext) {
        val h = it.next()
        var i = 0
        while (i < K) {
          val v = (A(i) * h + B(i)) % P
          if (v < buf(i)) buf(i) = v
          i += 1
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
