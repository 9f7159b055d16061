package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** The q252 operator has ONE contract and two execution paths: the
  * distributed NN-Descent/beam-walk round loop (the ≥32 MB scale
  * path) and the in-memory kernel that sub-broadcast-size corpora run
  * (a corpus that fits the scoring-join broadcast was already being
  * shipped whole to every executor — at diagnostic scale the 16-round
  * loop was pure scheduling tax, ~14 s for 2k vectors). This spec is
  * what makes the split safe: the two paths must be BIT-IDENTICAL on
  * the gate corpus — every cosine, every rank, every tie-break —
  * so the DuckDB oracle and the 100× protocol see one operator.
  * Parity pins the subtle contract points: 4-dp HALF_UP rounding
  * before every rank, (cos desc, id asc) ordering under Spark's
  * -0.0/NaN sort semantics, the LCG init with dangling ids dropped
  * only at scoring joins, the rev-cap admission order, and the
  * fixpoint early exits. */
class AnnGraphKernelParitySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("kernel path ≡ distributed path, bit-for-bit, at gate SF") {
    val ckpt = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    // the public entry routes this corpus to the kernel (sub-32MB)
    val kernel = VectorOps.annGraph(spark, dir)
      .orderBy("query_id", "rank")
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val e = Tables(spark, dir)
    val dist = VectorOps.annGraphDistributed(spark, e,
        VectorOps.NswM, VectorOps.NswBuildRounds,
        VectorOps.NswBeam, VectorOps.NswSearchRounds)
      .orderBy("query_id", "rank")
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(kernel.nonEmpty)
    assert(kernel == dist,
      s"kernel/distributed divergence:\n  kernel=${kernel.take(6)}\n  dist=${dist.take(6)}")
  }

  private def Tables(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val ckpt = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    graft.tables.Tables.spread(graft.tables.Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.NativeExprs.dotProduct(col("v"), col("v"))))
      .localCheckpoint(true, ckpt)
  }
}
