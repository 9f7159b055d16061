package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** A "video" asset: a motion sequence stored as back-to-back P6 PPM
  * frames, each with its own header (the MJPEG concatenation shape —
  * [[Ppm.decodeFrames]] re-walks every frame's header grammar). */
case class VideoAsset(asset_id: Long, n_bytes: Long, bytes: Array[Byte])

/** Shot-boundary (scene-change) detection (q167) — the first step of
  * every video curation pipeline: segment each clip into shots by
  * thresholding the frame-to-frame SAD (sum of absolute pixel
  * differences), then keyframe/caption per shot rather than per frame
  * (video-LM data pipelines sample per shot; PySceneDetect's
  * "content detector" is this exact statistic).
  *
  * Generator family: clips are synthesized for doc_ids ≡ 2 (mod 7) —
  * [[FrameW]]×[[FrameH]] RGB frames, [[clipFrames]] of them, where
  * frame f's pixel i is `(c + (f div ShotLen)·ShotJump + f + i) mod
  * 256`: inside a shot consecutive frames drift by δ=1; across a shot
  * boundary they jump by δ=[[ShotJump]]+1. For byte streams of the
  * form (x+i) mod 256 the SAD of two frames has the CLOSED FORM
  * N·2·δ·(256−δ)/256 (over every 256-aligned window, δ positions wrap
  * to |256−δ| and the rest differ by δ; N = [[FrameN]] is a multiple
  * of 256), so the oracle re-derives every SAD, cut index and shot
  * count arithmetically while Spark computes them from genuinely
  * parsed frame buffers — same convention as q126/q142: a green hash
  * certifies encoder, stream parser, and the differencing loop.
  *
  * Scale shape: synthesize → parse → per-clip SAD scan is one narrow
  * mapPartitions pass (frames of ONE clip stay local — the natural
  * partitioning of video: shard by clip, never by frame); only the
  * per-clip summary rows (fixed width) enter the shuffle-free output.
  * Clips too long for one task would stream frame-pairs with a
  * 1-frame carry — the same scan shape, bounded memory. */
object VideoOps {

  val FrameW = 64
  val FrameH = 64
  /** Bytes per decoded frame; multiple of 256 (closed-form SAD). */
  val FrameN: Int = FrameW * FrameH * 3
  /** Frames per shot in the generator. */
  val ShotLen = 8
  /** Extra per-frame drift at a shot boundary. */
  val ShotJump = 53
  /** SAD above this is a cut (within-shot SAD = 96·255 = 24 480;
    * boundary SAD = 96·54·202 = 1 047 168). */
  val SadCut = 100000L

  private[multimodal] def clipFrames(id: Long): Int = (24 + (id % 3) * 8).toInt

  private[multimodal] def makeVideo(id: Long): VideoAsset = {
    val c = ((id * 97) % 256).toInt
    val f = clipFrames(id)
    val out = new java.io.ByteArrayOutputStream()
    var fi = 0
    while (fi < f) {
      val base = (c + (fi / ShotLen) * ShotJump + fi) % 256
      val px = new Array[Byte](FrameN)
      var i = 0
      while (i < FrameN) { px(i) = ((base + i) % 256).toByte; i += 1 }
      out.write(Ppm.encode(FrameW, FrameH, px))
      fi += 1
    }
    val bytes = out.toByteArray
    VideoAsset(id, bytes.length.toLong, bytes)
  }

  private def clips(spark: SparkSession, dir: String): Dataset[VideoAsset] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir)
        .select(col("doc_id")).filter(col("doc_id") % 7 === 2))
      .as[Long].map(makeVideo _)
  }

  def sceneDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    clips(spark, dir).mapPartitions { it =>
      it.map { v =>
        val frames = Ppm.decodeFrames(v.bytes)
        var prev: Array[Byte] = null
        var f = 0
        var nCuts = 0L
        var firstCut = -1L
        var totalSad = 0L
        var maxSad = 0L
        frames.foreach { img =>
          if (prev != null) {
            var sad = 0L
            var i = 0
            while (i < FrameN) {
              val d = (img.pixels(i) & 0xff) - (prev(i) & 0xff)
              sad += math.abs(d)
              i += 1
            }
            if (sad > SadCut) {
              nCuts += 1
              if (firstCut < 0) firstCut = f
            }
            totalSad += sad
            if (sad > maxSad) maxSad = sad
          }
          prev = img.pixels
          f += 1
        }
        (v.asset_id, frames.length.toLong, nCuts, firstCut,
          nCuts + 1, totalSad, maxSad)
      }
    }.toDF("asset_id", "n_frames", "n_cuts", "first_cut",
      "n_shots", "total_sad", "max_sad")
  }

  /** Oracle: frame count, cut positions, and every SAD re-derived
    * from the generator arithmetic via the closed form
    * SAD(δ) = FrameN·2·δ·(256−δ)/256. */
  val sceneDetectSql: String = {
    def sadOf(delta: String) = s"($FrameN // 256) * 2 * ($delta) * (256 - ($delta))"
    s"""WITH v AS (
       |  SELECT doc_id AS asset_id,
       |         24 + (doc_id % 3) * 8 AS f
       |  FROM documents WHERE doc_id % 7 = 2),
       |d AS (
       |  SELECT asset_id, f,
       |         (f - 1) // $ShotLen AS n_cuts
       |  FROM v)
       |SELECT asset_id,
       |       CAST(f AS BIGINT) AS n_frames,
       |       CAST(n_cuts AS BIGINT) AS n_cuts,
       |       CAST($ShotLen AS BIGINT) AS first_cut,
       |       CAST(n_cuts + 1 AS BIGINT) AS n_shots,
       |       CAST(n_cuts * (${sadOf(s"${ShotJump + 1}")})
       |            + (f - 1 - n_cuts) * (${sadOf("1")}) AS BIGINT) AS total_sad,
       |       CAST(${sadOf(s"${ShotJump + 1}")} AS BIGINT) AS max_sad
       |FROM d""".stripMargin
  }
}
