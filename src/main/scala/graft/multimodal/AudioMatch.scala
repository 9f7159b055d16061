package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Audio fingerprint matching by offset-histogram vote (q178) — the
  * Shazam retrieval shape (Wang, "An Industrial-Strength Audio Search
  * Algorithm", ISMIR'03) over the corpus's audio assets: a REFERENCE
  * index fingerprints every source track, a frame-aligned CLIP is cut
  * from each track and fingerprinted the same way, and each clip is
  * identified by the (source, time-offset) cell that accumulates the
  * most matching hashes — the offset-histogram vote that makes the
  * scheme robust to partial overlap. The published scheme hashes
  * spectral peak pairs; this engine's integer-arithmetic contract
  * replaces the spectrogram with the per-frame ENERGY sequence
  * (Σ|sample| per [[MultimodalOps.FrameLen]]-sample frame — the q135
  * VAD statistic) and hashes energy TRIPLES — a landmark-free
  * shingle, chosen over peak pairs because slow-drift tracks can go
  * ≫8 frames between energy peaks, which silently drops clips from a
  * peak-pair match (observed on this corpus: 65 of 167 clips), while
  * triple-shingles fingerprint every clip densely. All 167 clips
  * identify to their true (source, offset) cell on this corpus.
  *
  * Pipeline (all relational past the codec pass): decode WAV →
  * per-frame energies (one mapPartitions pass, the codec convention)
  * → explode → lead/lead window per asset builds triple hashes → clip
  * hashes join the reference index on hash → votes group on (clip,
  * source, Δframe) → deterministic argmax (votes desc, then ids).
  * Clips are frame-aligned sub-ranges re-encoded as REAL WAV files,
  * so the clip side exercises encode → parse again rather than
  * slicing arrays.
  *
  * Oracle: energies re-derived from the generator stream (Σ|((c + i
  * + i² mod m) mod 256) − 128| over each frame's range — it never
  * sees a WAV byte), then the SAME relational pipeline; clip
  * energies are the source energies shifted by the planted frame
  * offset. A green hash certifies codec, windowing, shingle hashing,
  * and the vote.
  *
  * Scale shape: the index is hash-keyed (the join key IS the
  * fingerprint — shuffle carries (hash, id, frame) rows only); votes
  * are map-side-combinable counts; per-asset state in the codec pass
  * is one energy array (frames ≪ samples). At catalog scale the
  * reference index is the big side, bucketed by hash; clips
  * broadcast. */
object AudioMatch {

  /** Hash-pack base: energies lie in [0, 160·128] = [0, 20480]
    * (20481³ < 2⁶³). No quantization: the channel is lossless (WAV
    * in, WAV out), so coarsening only manufactures cross-track
    * collisions — robustness quantization belongs to lossy channels
    * (the q131 aHash family). */
  val PackBase = 20481L
  val ClipFrames = 40
  private def clipOffFrames(id: Long): Int = ((id % 7) * 3).toInt

  /** q178's own track generator: sample i of track `id` is
    * ((c + i + i² mod m) mod 256) − 128 with a per-track quadratic
    * PRIME modulus m = QuadPrimes[id mod 25]. The quadratic term makes each
    * track's energy sequence pseudo-random AND structurally distinct
    * per modulus class — the shared linear (c+i) stream of q126/q135
    * is 8-frame periodic, and purely linear per-track phase steps
    * leave whole step classes as circular-shift / mirror aliases of
    * each other (observed: 26 then 12 cross-matched clips under two
    * linear variants); an identification corpus needs identities.
    * Track length reuses the corpus convention (100 + id mod 50
    * frames). */
  /** Per-track quadratic moduli: primes (coprime to FrameLen·anything),
    * so (160k+j)² mod m genuinely depends on the frame index k — a
    * composite m sharing factors with FrameLen (e.g. m=160) makes
    * i² mod m frame-periodic and the track self-aliases (observed:
    * clip 354 matched itself at dt≡true mod 8). */
  private[multimodal] val QuadPrimes: Array[Int] =
    Array(101,103,107,109,113,127,131,137,139,149,151,157,163,167,173,179,181,191,193,197,199,211,223,227,229)

  private[multimodal] def makeTrack(id: Long): Array[Short] = {
    val c = ((id * 97) % 256).toInt
    val m = QuadPrimes((id % 25).toInt)
    val frames = (100 + id % 50).toInt
    val n = frames * MultimodalOps.FrameLen
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((java.lang.Math.floorMod(
        c.toLong + i + (i.toLong * i) % m, 256L)) - 128L).toShort
      i += 1
    }
    out
  }

  /** Per-frame |sample| energies from a decoded WAV (the classic
    * energy statistic; the quadratic generator already breaks the
    * mirror/shift alias classes a symmetric statistic would expose
    * under linear streams). */
  private def energies(samples: Array[Short]): Array[Long] = {
    val f = samples.length / MultimodalOps.FrameLen
    val out = new Array[Long](f)
    var k = 0
    while (k < f) {
      var s = 0L
      var i = k * MultimodalOps.FrameLen
      val end = i + MultimodalOps.FrameLen
      while (i < end) { s += math.abs(samples(i).toLong); i += 1 }
      out(k) = s
      k += 1
    }
    out
  }

  /** (asset_id, frame, energy) rows for sources and their derived
    * clips — the ONLY non-relational stage (codec pass). Clips are
    * re-encoded WAV sub-ranges, parsed again on read. */
  private def energyRows(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val audio = Tables.spread(Tables.documents(spark, dir)
        .select(col("doc_id")).filter(col("doc_id") % 3 === 0))
      .as[Long]
    val both = audio.mapPartitions { it =>
      it.map { id =>
        // encode → parse: the WAV container is real on both sides
        val au = Wav.decode(Wav.encode(8000, makeTrack(id)))
        val off = clipOffFrames(id) * MultimodalOps.FrameLen
        val clipSamples = java.util.Arrays.copyOfRange(
          au.samples, off, off + ClipFrames * MultimodalOps.FrameLen)
        val clip = Wav.decode(Wav.encode(au.sampleRate, clipSamples))
        (id, energies(au.samples), energies(clip.samples))
      }
    }.toDF("asset_id", "src_e", "clip_e")
    val src = both.select(col("asset_id"),
      posexplode(col("src_e")).as(Seq("frame", "e")))
    val clip = both.select(col("asset_id"),
      posexplode(col("clip_e")).as(Seq("frame", "e")))
    (src, clip)
  }

  /** Quantized energy-TRIPLE shingles as fingerprint hashes — the
    * landmark-free variant: every run of three consecutive frames
    * contributes one hash, so EVERY clip (not only clips containing
    * close peak pairs) fingerprints densely and nothing silently
    * drops out of the match. Shared by both sides and by the oracle. */
  private def hashes(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("asset_id").orderBy("frame")
    e.withColumn("e2", lead(col("e"), 1).over(w))
      .withColumn("e3", lead(col("e"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(col("asset_id"), col("frame").cast("long").as("t"),
        ((col("e") * PackBase + col("e2")) * PackBase
          + col("e3")).as("hash"))
  }

  def audioMatch(spark: SparkSession, dir: String): DataFrame = {
    val (srcE, clipE) = energyRows(spark, dir)
    val index = hashes(srcE)
      .select(col("asset_id").as("src_id"), col("t").as("t_src"), col("hash"))
    val probes = hashes(clipE)
      .select(col("asset_id").as("clip_id"), col("t").as("t_clip"), col("hash"))
    val votes = probes.join(index, "hash")
      .groupBy(col("clip_id"), col("src_id"),
        (col("t_src") - col("t_clip")).as("dt"))
      .agg(count(lit(1)).as("votes"))
    val best = Window.partitionBy("clip_id")
      .orderBy(col("votes").desc, col("src_id"), col("dt"))
    val nProbes = probes.groupBy("clip_id").agg(count(lit(1)).as("n_hashes"))
    votes.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .join(nProbes, "clip_id")
      .select(col("clip_id"), col("n_hashes"), col("src_id").as("best_src"),
        col("dt").as("best_dt"), col("votes"),
        when(col("src_id") === col("clip_id") &&
          col("dt") === (col("clip_id") % 7) * 3, 1L).otherwise(0L)
          .as("is_correct"))
  }

  /** Oracle: generator-arithmetic energies (the prefix the codec can
    * never influence), then the identical relational pipeline. The
    * energy sequence of a track depends ONLY on its (c, modulus) class
    * — at most 256×25 = 6,400 classes regardless of corpus size — so
    * the expensive per-sample lambda mass is computed once per CLASS
    * (clsE, ≤ 6,400×149 frames) and joined back to assets, instead of
    * once per asset (25M frames × 160 samples at sf1 was the 541 s
    * oracle wall; the class rewrite is hash-identical by construction
    * since every asset's (c, mi, frame < f) slice is unchanged). */
  val audioMatchSql: String =
    s"""WITH a AS MATERIALIZED (
       |  SELECT doc_id AS asset_id,
       |         (doc_id * 97) % 256 AS c,
       |         doc_id % 25 AS mi,
       |         100 + doc_id % 50 AS f
       |  FROM documents WHERE doc_id % 3 = 0),
       |cls AS (
       |  SELECT c, mi, [101,103,107,109,113,127,131,137,139,149,151,157,163,167,173,179,181,191,193,197,199,211,223,227,229][mi + 1] AS prim
       |  FROM (SELECT DISTINCT c, mi FROM a)),
       |nums AS MATERIALIZED (
       |  SELECT unnest(range(0, ${149 * MultimodalOps.FrameLen})) AS i),
       |-- per-SAMPLE rows + GROUP BY, not a per-frame list lambda:
       |-- DuckDB's interpreted list_transform costs ~3 us/element and
       |-- was 463 of the 541 s sf1 wall; the vectorized row form is 9 s
       |clsE AS MATERIALIZED (
       |  SELECT c, mi, i // ${MultimodalOps.FrameLen} AS frame,
       |         CAST(sum(abs(((c + i + (i * i) % prim) % 256) - 128)) AS BIGINT) AS e
       |  FROM cls, nums GROUP BY 1, 2, 3),
       |se AS MATERIALIZED (
       |  SELECT a.asset_id, clsE.frame, clsE.e
       |  FROM a JOIN clsE ON a.c = clsE.c AND a.mi = clsE.mi
       |  WHERE clsE.frame < a.f),
       |ce AS (
       |  SELECT se.asset_id, se.frame - (se.asset_id % 7) * 3 AS frame, se.e
       |  FROM se
       |  WHERE se.frame >= (se.asset_id % 7) * 3
       |    AND se.frame < (se.asset_id % 7) * 3 + $ClipFrames),
       |sh AS (
       |  SELECT asset_id AS src_id, CAST(frame AS BIGINT) AS t_src,
       |         (e * $PackBase + lead(e, 1) OVER w) * $PackBase
       |           + lead(e, 2) OVER w AS hash
       |  FROM se WINDOW w AS (PARTITION BY asset_id ORDER BY frame)
       |  QUALIFY lead(e, 2) OVER w IS NOT NULL),
       |ch AS MATERIALIZED (
       |  SELECT asset_id AS clip_id, CAST(frame AS BIGINT) AS t_clip,
       |         (e * $PackBase + lead(e, 1) OVER w) * $PackBase
       |           + lead(e, 2) OVER w AS hash
       |  FROM ce WINDOW w AS (PARTITION BY asset_id ORDER BY frame)
       |  QUALIFY lead(e, 2) OVER w IS NOT NULL),
       |np AS (SELECT clip_id, CAST(count(*) AS BIGINT) AS n_hashes
       |       FROM ch GROUP BY 1),
       |v AS (
       |  SELECT ch.clip_id, sh.src_id, sh.t_src - ch.t_clip AS dt,
       |         CAST(count(*) AS BIGINT) AS votes
       |  FROM ch JOIN sh ON ch.hash = sh.hash
       |  GROUP BY 1, 2, 3),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY clip_id
       |            ORDER BY votes DESC, src_id, dt) AS rn
       |  FROM v)
       |SELECT r.clip_id, np.n_hashes, r.src_id AS best_src,
       |       r.dt AS best_dt, r.votes,
       |       CAST(CASE WHEN r.src_id = r.clip_id
       |                  AND r.dt = (r.clip_id % 7) * 3
       |                 THEN 1 ELSE 0 END AS BIGINT) AS is_correct
       |FROM r JOIN np ON np.clip_id = r.clip_id
       |WHERE r.rn = 1""".stripMargin
}
