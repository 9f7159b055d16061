package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only: the 100× FAMILY protocol — round 11's extension of the
  * graph-family 100× evidence ([[Scale100xGraph]]) to the other
  * north-star families. Each family runs its SCALE-PATH operator (not
  * the labeled brute baseline) against a 100×-sf0.1 organic corpus
  * (500k documents / 200k embeddings / 10M events, fresh entities via
  * [[ScaleOrganic]]) with a SEMANTIC gate, so the record proves the
  * operator still computes the right thing at two orders above the
  * bench SF — not merely that it terminates:
  *
  *  - dedup (q21 MinHash+LSH, q250 maximal duplicated spans): the
  *    organic corpus plants near-dups at the measured LINEAR sf0.1
  *    rate, so both pair censuses must grow ~×reps — the gate accepts
  *    [reps/5, reps×20] vs a live sf0.1 baseline and rejects the two
  *    failure shapes: a collapsed index (≈0 pairs) and the quadratic
  *    family blow-up replication used to manufacture (×reps²).
  *  - ANN (q81 trained IVF): recall@k against the q24 brute-force
  *    ground truth TRUNCATED TO THE SAME k (q81 emits top-KLsh=3;
  *    comparing top-3 against brute top-5 ceilings recall at 0.60 and
  *    misreads the gap — an early draft did). The query set is the
  *    fixed QueryMax prefix, so the ground truth stays a bounded
  *    broadcast join at any corpus size. TWO configurations run: the
  *    gate-SF shape (nlist=16, nProbe=4; recall@3 0.633 at 100×) and
  *    the PROBE-DEEPENED shape (nlist=16, nProbe=8; 0.867, gated
  *    ≥ 0.6) — probe depth, not √N-grown nlist, is the recall knob on
  *    this corpus's wide Gaussian labels, which fragment under finer
  *    cells (see [[graft.vector.VectorOps.annIvfTrainedAt]]).
  *  - text training (q149 trained lang-id): gradient descent is
  *    driver-round-trip-bound by design (12 fused trips, data-parallel
  *    aggregates), so the gate is rows > 0 with the wall recorded —
  *    the interesting number is wall vs sf0.1 staying far below ×100.
  *  - streaming (q218 sequence patterns): the per-user bounded-buffer
  *    state machine drains 10M events through the foreachBatch parquet
  *    sink; gate rows > 0, wall recorded.
  *
  * Prints one JSON line; nonzero exit if any gate fails.
  *
  * Usage: runMain graft.tools.Scale100xFamilies <100xDir> [sf01Dir] [reps]
  */
object Scale100xFamilies {
  def main(args: Array[String]): Unit = {
    val src100 = args.lift(0).getOrElse("/tmp/sf100organic")
    val src01  = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps   = args.lift(2).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir("/tmp/fam100x_ckpt")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val q = graft.SparkEntry.queries

    // dedup: linear-growth pair censuses vs a live sf0.1 baseline
    val base21  = q("q21_minhash_lsh")(spark, src01).count()
    val base250 = q("q250_dup_spans")(spark, src01).count()
    val (n21, t21)   = timed(q("q21_minhash_lsh")(spark, src100).count())
    val (n250, t250) = timed(q("q250_dup_spans")(spark, src100).count())
    def linearOk(n100: Long, n01: Long): Boolean =
      n01 > 0 && n100 >= n01 * reps / 5 && n100 <= n01 * reps * 20L
    val dedupOk = linearOk(n21, base21) && linearOk(n250, base250)

    // ANN: recall of the trained-IVF scale path against the brute
    // ground truth — both on the 100× corpus, both bounded query sets.
    // Fixed gate-SF parameters first (recorded), then the √N-scaled
    // configuration (gated).
    // ground truth truncated to the IVF's own k (q24 emits top-K=5,
    // q81 top-KLsh=3): recall@k must compare at EQUAL k — the first
    // protocol run compared IVF top-3 against brute top-5 and read a
    // hard 0.60 ceiling (30/50) as a recall deficit
    val (brute, t24) = timed {
      val d = q("q24_knn_brute")(spark, src100)
        .filter(col("rank") <= graft.vector.VectorOps.KLsh)
        .select("query_id", "neighbor_id").cache()
      d.count(); d
    }
    val nBrute = brute.count()
    def ivfRecall(nlist: Int, nProbe: Int): (Double, Double) = {
      val (ivf, t) = timed {
        val d = graft.vector.VectorOps
          .annIvfTrainedAt(spark, src100, nlist, nProbe)
          .select("query_id", "neighbor_id").cache()
        d.count(); d
      }
      val hit = brute.join(ivf, Seq("query_id", "neighbor_id")).count()
      ivf.unpersist()
      (if (nBrute == 0) 0.0 else hit.toDouble / nBrute, t)
    }
    val (recFixed, t81) = ivfRecall(graft.vector.VectorOps.IvfTK,
                                    graft.vector.VectorOps.NProbe)
    val (recScaled, t81s) = ivfRecall(graft.vector.VectorOps.IvfTK, 8)
    val annOk = recScaled >= 0.6

    // text training: driver-round-trip-bound GD over 500k docs
    val (n149, t149) = timed(q("q149_lang_id_trained")(spark, src100).count())
    // streaming: 10M events through the per-user state machine
    val (n218, t218) = timed(q("q218_stream_seqpat")(spark, src100).count())
    val restOk = n149 > 0 && n218 > 0

    println(s"""{"protocol":"families100x","src":"$src100","reps":$reps,""" +
      s""""q21_secs":${f(t21)},"q21_pairs":$n21,"q21_sf01_pairs":$base21,""" +
      s""""q250_secs":${f(t250)},"q250_spans":$n250,"q250_sf01_spans":$base250,""" +
      s""""q81_secs":${f(t81)},"q81_scaled_secs":${f(t81s)},"q24_secs":${f(t24)},""" +
      s""""ann_recall_probe4":${f(recFixed)},"ann_recall_probe8":${f(recScaled)},""" +
      s""""q149_secs":${f(t149)},"q149_rows":$n149,""" +
      s""""q218_secs":${f(t218)},"q218_rows":$n218,""" +
      s""""gates":{"dedup_linear":$dedupOk,"ann_recall":$annOk,"nonempty":$restOk}}""")
    spark.stop()
    if (!dedupOk || !annOk || !restOk) sys.exit(3)
  }

  private def f(v: Double): BigDecimal =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
}
