package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Raw multimodal asset: media treated as an opaque binary column plus
  * typed metadata — the storage contract for image/audio/video at scale
  * (builder brief: multimodal columns). `bytes` holds a REAL format
  * payload (binary PPM for images, RIFF/WAVE PCM for audio) decoded
  * only by [[MultimodalOps.decode]] via [[Ppm]]/[[Wav]]. */
case class Asset(
    asset_id: Long,
    kind: String,          // "image" | "audio"
    bytes: Array[Byte],    // P6 PPM or RIFF/WAVE PCM payload
    source: String)

/** Decoded per-asset features. `checksum` is computed from the DECODED
  * units — pixel bytes for images, 16-bit samples for audio — not from
  * the container bytes, so it certifies the codec path end to end. */
case class DecodedAsset(
    asset_id: Long,
    kind: String,
    width: Int,            // images: pixels; audio: 0
    height: Int,
    sample_rate: Int,      // audio: Hz; images: 0
    n_frames: Int,         // audio: sample frames of [[MultimodalOps.FrameLen]]; images: 1
    byte_len: Int,         // container size (header + raster/samples)
    checksum: Long)        // Σ pixel bytes (image) / Σ samples (audio)

/** Multimodal-column operators: binary payloads with typed metadata,
  * decode / feature-extract / resize / frame-sample — all on REAL
  * format bytes (P6 PPM images, RIFF/WAVE 16-bit PCM audio; see
  * [[Ppm]]/[[Wav]]). This closes the round-5 stub: `decode` parses the
  * actual formats, `resizePlans` runs a genuine nearest-neighbor pixel
  * resample, and `frameSamples` sums real PCM sample frames.
  *
  * Oracle strategy: the synthetic generator writes pixel byte `i` of
  * asset `id` as `(c + i) mod 256` with `c = (id·97) mod 256` (audio
  * samples are the same stream recentred to `[-128, 127]`), so DuckDB
  * can re-derive every pixel/sample-level checksum ARITHMETICALLY —
  * closed-form prefix sums for contiguous ranges, a per-pixel index
  * map for the resize — while the Spark side computes the same number
  * from genuinely decoded buffers. A green hash certifies encoder,
  * parser, pixel indexing, and sampling lattice together.
  *
  * Scale notes: payload bytes never enter a shuffle — synthesize →
  * decode → feature row is one narrow `mapPartitions` pass (the JVM
  * analog of `mapInPandas`), and every downstream join/agg sees only
  * the small feature/checksum rows (asserted in ScalePlanSpec).
  * Repartition by asset_id BEFORE decode if source files skew.
  */
object MultimodalOps {

  /** Samples per audio frame (20 ms @ 8 kHz). */
  val FrameLen = 160

  /** Resize box for [[resizePlans]]. */
  val MaxSide = 128

  /** Per-asset byte-stream seed: pixel/sample unit `i` of asset `id`
    * is `(seed(id) + i) mod 256` (audio: minus 128, stored int16). */
  private[multimodal] def seed(id: Long): Int = ((id * 97) % 256).toInt

  /** The deterministic asset generator: kind/dimension/rate formulas
    * are pure arithmetic on the id (unchanged since round 2, so the
    * oracles re-derive them), and the payload is a REAL encoded file:
    * P6 PPM for images, mono 16-bit PCM WAV for audio. */
  private[multimodal] def makeAsset(id: Long): Asset = {
    val c = seed(id)
    if (id % 3 != 0) {
      val w = (64 + (id % 8) * 32).toInt
      val h = (64 + (id % 5) * 48).toInt
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < px.length) { px(i) = ((c + i) % 256).toByte; i += 1 }
      Asset(id, "image", Ppm.encode(w, h, px), s"bucket/part-${id % 16}")
    } else {
      val sr = (8000 * (1 + id % 3)).toInt
      val frames = (100 + id % 50).toInt
      val n = frames * FrameLen
      val s = new Array[Short](n)
      var i = 0
      while (i < n) { s(i) = (((c + i) % 256) - 128).toShort; i += 1 }
      Asset(id, "audio", Wav.encode(sr, s), s"bucket/part-${id % 16}")
    }
  }

  /** Deterministic synthetic asset table (stands in for
    * `spark.read.format("binaryFile")` over a media bucket — the
    * payloads are real PPM/WAV files a stock viewer could open). */
  def synthesizeAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).as[Long].map(makeAsset _)
  }

  /** Decode the binary column into typed features — per-partition batch
    * loop, REAL parsers: the container is sniffed (P6 magic vs RIFF),
    * the PPM header grammar / RIFF chunk list is walked, and the
    * checksum is summed over the DECODED pixel bytes / PCM samples.
    * `kind` comes from the payload, not trusted metadata. */
  def decode(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.bytes.length >= 2 && a.bytes(0) == 'P' && a.bytes(1) == '6') {
          val img = Ppm.decode(a.bytes)
          var sum = 0L; var i = 0
          while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
          DecodedAsset(a.asset_id, "image", img.width, img.height, 0, 1,
            a.bytes.length, sum)
        } else if (Png.isPng(a.bytes)) {
          val img = Png.decode(a.bytes)
          var sum = 0L; var i = 0
          while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
          DecodedAsset(a.asset_id, "image", img.width, img.height, 0, 1,
            a.bytes.length, sum)
        } else {
          val au = Wav.decode(a.bytes)
          var sum = 0L; var i = 0
          while (i < au.samples.length) { sum += au.samples(i); i += 1 }
          DecodedAsset(a.asset_id, "audio", 0, 0, au.sampleRate,
            au.samples.length / FrameLen, a.bytes.length, sum)
        }
      }
    }
  }

  /** Nearest-neighbor resample of an interleaved-RGB buffer. Source
    * index mapping is pure integer floor arithmetic — `sx = x·w / nw`,
    * `sy = y·h / nh` — exactly the map the DuckDB oracle reproduces. */
  private[multimodal] def resizeNearest(
      px: Array[Byte], w: Int, h: Int, nw: Int, nh: Int): Array[Byte] = {
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * h / nh).toInt
      var x = 0
      while (x < nw) {
        val sx = (x.toLong * w / nw).toInt
        val src = (sy * w + sx) * 3
        val dst = (y * nw + x) * 3
        out(dst) = px(src); out(dst + 1) = px(src + 1); out(dst + 2) = px(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Metadata-level resize plan (target box fit preserving aspect
    * ratio) over already-decoded features — the planning half of
    * [[resizePlans]], kept for feature-table consumers that size
    * storage before touching pixels. */
  def resizePlan(decoded: Dataset[DecodedAsset], maxSide: Int): DataFrame =
    decoded.toDF()
      .filter(col("kind") === "image" && greatest(col("width"), col("height")) > maxSide)
      .withColumn("scale",
        lit(maxSide) / greatest(col("width"), col("height")))
      .withColumn("new_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("new_height", floor(col("height") * col("scale")).cast("int"))
      .select(col("asset_id"), col("width"), col("height"),
        col("new_width"), col("new_height"))

  /** Metadata-level frame-index lattice (every `stride`-th frame per
    * multi-frame asset) — the planning half of [[frameSamples]]. */
  def frameSample(decoded: Dataset[DecodedAsset], stride: Int): DataFrame =
    decoded.toDF()
      .filter(col("n_frames") > 1)
      .select(col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** One asset per corpus document — the SINGLE derivation q82, q92 and
    * q126 (and their oracles' generator arithmetic) depend on. Only
    * `doc_id` crosses the (round-robin, testdata-only) spread exchange;
    * the payload is synthesized inside the narrow map.
    *
    * Kind selection happens HERE as a column predicate on `doc_id`
    * (audio ⇔ `doc_id % 3 = 0`, the [[makeAsset]] branch condition),
    * not as a typed lambda after the map: a lambda over `Asset` blocks
    * codegen and forces every asset to be synthesized before being
    * dropped, while the column predicate prunes at the parquet scan —
    * at corpus scale that is 2/3 (audio) or 1/3 (image) of all decode
    * work never scheduled. */
  private def corpusAssets(spark: SparkSession, dir: String,
                           kind: Option[String] = None): Dataset[Asset] = {
    import spark.implicits._
    val ids = graft.tables.Tables.documents(spark, dir).select(col("doc_id"))
    val wanted = kind match {
      case Some("audio") => ids.filter(col("doc_id") % 3 === 0)
      case Some("image") => ids.filter(col("doc_id") % 3 =!= 0)
      case _             => ids
    }
    graft.tables.Tables.spread(wanted).as[Long].map(makeAsset _)
  }

  /** The full decode pipeline as an oracle-gated query (q126): every
    * corpus asset round-trips encode → real parser → typed features +
    * decoded-unit checksum. The DuckDB oracle re-derives byte_len from
    * the container layout (PPM header length is digit-count dependent;
    * WAV is 44 + 2n) and the checksum from the closed-form prefix sum
    * of `(c + i) mod 256` — it never sees a byte, so a green hash
    * proves the encoder and parser agree with the spec. */
  def decodeStats(spark: SparkSession, dir: String): DataFrame =
    decode(corpusAssets(spark, dir)).toDF()
      .select(col("asset_id"), col("kind"), col("width"), col("height"),
        col("sample_rate"), col("n_frames"),
        col("byte_len").cast("long").as("byte_len"), col("checksum"))

  /** Closed-form Σ_{j<m} (j mod 256) as DuckDB SQL (32640 = Σ_{0..255}).
    * Checksums of contiguous generator ranges are S(hi) − S(lo). */
  private def prefixSql(m: String): String =
    s"(($m) // 256) * 32640 + (($m) % 256) * ((($m) % 256) - 1) // 2"

  val decodeStatsSql: String = {
    val sHi = prefixSql("c + n"); val sLo = prefixSql("c")
    s"""WITH base AS (
       |  SELECT doc_id AS asset_id,
       |         (doc_id * 97) % 256 AS c,
       |         doc_id % 3 != 0 AS is_img,
       |         64 + (doc_id % 8) * 32 AS w,
       |         64 + (doc_id % 5) * 48 AS h,
       |         8000 * (1 + doc_id % 3) AS sr,
       |         100 + doc_id % 50 AS fr
       |  FROM documents),
       |sized AS (
       |  SELECT asset_id, c, is_img,
       |         CASE WHEN is_img THEN 'image' ELSE 'audio' END AS kind,
       |         CASE WHEN is_img THEN w ELSE 0 END AS width,
       |         CASE WHEN is_img THEN h ELSE 0 END AS height,
       |         CASE WHEN is_img THEN 0 ELSE sr END AS sample_rate,
       |         CASE WHEN is_img THEN 1 ELSE fr END AS n_frames,
       |         CASE WHEN is_img THEN w * h * 3 ELSE fr * $FrameLen END AS n,
       |         CASE WHEN is_img
       |              THEN 9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
       |                     + w * h * 3
       |              ELSE 44 + fr * $FrameLen * 2 END AS byte_len
       |  FROM base)
       |SELECT asset_id, kind,
       |       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       |       CAST(sample_rate AS INT) AS sample_rate,
       |       CAST(n_frames AS INT) AS n_frames,
       |       CAST(byte_len AS BIGINT) AS byte_len,
       |       CAST($sHi - ($sLo)
       |            - CASE WHEN is_img THEN 0 ELSE 128 * n END AS BIGINT) AS checksum
       |FROM sized""".stripMargin
  }

  /** The full audio pipeline as an oracle-gated query (q82): corpus
    * rows become real WAV assets, the RIFF parser recovers the PCM
    * stream, and every 7th [[FrameLen]]-sample frame is summed — a
    * SAMPLE-LEVEL check, not just an index lattice. The oracle
    * re-derives each frame sum as a closed-form prefix-sum difference
    * of the generator stream (recentred by −128·FrameLen), so a green
    * hash certifies WAV encode, chunk walk, int16 decode, and the
    * frame windowing end to end. Payloads never shuffle: synthesize →
    * decode → frame sums is one narrow pass emitting only
    * (asset_id, frame_idx, frame_sum). */
  def frameSamples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpusAssets(spark, dir, kind = Some("audio"))
      .mapPartitions { it =>
        it.flatMap { a =>
          val au = Wav.decode(a.bytes)
          val frames = au.samples.length / FrameLen
          Iterator.range(0, frames, 7).map { f =>
            var s = 0L
            var k = f * FrameLen
            val end = k + FrameLen
            while (k < end) { s += au.samples(k); k += 1 }
            (a.asset_id, f, s)
          }
        }
      }.toDF("asset_id", "frame_idx", "frame_sum")
  }

  /** Oracle: audio assets are doc_id ≡ 0 (mod 3); DuckDB range() is
    * stop-exclusive where the frame count is exact, and each frame sum
    * is S(c + 160(f+1)) − S(c + 160f) − 128·160 by the generator
    * arithmetic alone. */
  val frameSamplesSql: String = {
    val sHi = prefixSql("hi"); val sLo = prefixSql("lo")
    s"""WITH au AS (
       |  SELECT doc_id AS asset_id,
       |         (doc_id * 97) % 256 AS c,
       |         100 + doc_id % 50 AS fr
       |  FROM documents WHERE doc_id % 3 = 0),
       |f AS (
       |  SELECT asset_id, c, CAST(unnest(range(0, fr, 7)) AS BIGINT) AS fi
       |  FROM au),
       |b AS (
       |  SELECT asset_id, fi,
       |         c + fi * $FrameLen AS lo,
       |         c + fi * $FrameLen + $FrameLen AS hi
       |  FROM f)
       |SELECT asset_id, CAST(fi AS INT) AS frame_idx,
       |       CAST($sHi - ($sLo) - ${128 * FrameLen} AS BIGINT) AS frame_sum
       |FROM b""".stripMargin
  }

  /** The resize step as an oracle-gated query (q92): every image whose
    * longest side exceeds [[MaxSide]] is DECODED (real P6 parse) and
    * nearest-neighbor RESAMPLED into its aspect-preserving target box,
    * and the resized pixel buffer is summed — a PIXEL-LEVEL check of
    * the resample, not just box arithmetic. The oracle replays the
    * integer source-index map `sx = x·w / nw, sy = y·h / nh` over the
    * generator byte formula per resized pixel (it never sees a byte),
    * so a green hash certifies the codec round trip AND the pixel
    * indexing of the resample. Narrow map end to end: payloads never
    * shuffle, output is one small row per asset. */
  def resizePlans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpusAssets(spark, dir, kind = Some("image"))
      .mapPartitions { it =>
        it.flatMap { a =>
          val img = Ppm.decode(a.bytes)
          val (w, h) = (img.width, img.height)
          val mx = math.max(w, h)
          if (mx <= MaxSide) Iterator.empty
          else {
            // scale factor computed BEFORE the multiply, matching the
            // oracle's floor(w * (MaxSide / greatest(w, h))) bit-exactly
            val scale = MaxSide.toDouble / mx
            val nw = math.floor(w * scale).toInt
            val nh = math.floor(h * scale).toInt
            val resized = resizeNearest(img.pixels, w, h, nw, nh)
            var s = 0L; var i = 0
            while (i < resized.length) { s += resized(i) & 0xff; i += 1 }
            Iterator.single((a.asset_id, w, h, nw, nh, s))
          }
        }
      }.toDF("asset_id", "width", "height", "new_width", "new_height", "resized_sum")
  }

  /** Oracle: per resized pixel p = y·nw + x the source byte index is
    * base = ((y·h/nh)·w + x·w/nw)·3, and the RGB triple sums to
    * 3m+3 for m = (c + base) mod 256 except at the 254/255 wrap. */
  val resizePlansSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id AS asset_id,
       |         (doc_id * 97) % 256 AS c,
       |         64 + (doc_id % 8) * 32 AS w,
       |         64 + (doc_id % 5) * 48 AS h
       |  FROM documents WHERE doc_id % 3 != 0),
       |boxed AS (
       |  SELECT asset_id, c, w, h,
       |         CAST(floor(w * ($MaxSide / greatest(w, h))) AS BIGINT) AS nw,
       |         CAST(floor(h * ($MaxSide / greatest(w, h))) AS BIGINT) AS nh
       |  FROM dims WHERE greatest(w, h) > $MaxSide),
       |px AS (
       |  SELECT asset_id, c, w, h, nw, nh, unnest(range(0, nw * nh)) AS p
       |  FROM boxed),
       |m AS (
       |  SELECT asset_id, w, h, nw, nh,
       |         (c + ((p // nw * h // nh) * w + (p % nw) * w // nw) * 3) % 256 AS mm
       |  FROM px)
       |SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |       CAST(nw AS INT) AS new_width, CAST(nh AS INT) AS new_height,
       |       CAST(sum(CASE WHEN mm = 254 THEN 509 WHEN mm = 255 THEN 256
       |                     ELSE 3 * mm + 3 END) AS BIGINT) AS resized_sum
       |FROM m GROUP BY asset_id, w, h, nw, nh""".stripMargin

  /** COMPRESSED-container decode gate (q142): every image document's
    * generator pixels are encoded as a REAL deflate-compressed PNG
    * ([[Png.encode]]: our chunk framing + a genuine `Deflater` stream)
    * and decoded back through the JDK's INDEPENDENT ImageIO PNG reader
    * (inflate + unfilter), then the decoded buffer is checksummed and
    * aHashed — so the q131 perceptual family's arithmetic runs over
    * bytes that really traversed a compressed container. The DuckDB
    * oracle re-derives checksum (closed-form prefix sum) and the aHash
    * halves (the q131 cell map) from generator arithmetic alone; the
    * container length is compression-dependent and deliberately NOT a
    * column. A green hash therefore certifies our encoder and the
    * JDK's decoder agree pixel-exactly on every image. Same scale
    * shape as q126: synthesize → encode → decode → fixed-width feature
    * row in ONE narrow pass; payload bytes never shuffle. */
  def pngDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // image-id predicate as a column BEFORE the typed boundary so it
    // reaches the parquet scan (a typed lambda here blocked pushdown)
    graft.tables.Tables.spread(
        graft.tables.Tables.documents(spark, dir)
          .select(col("doc_id")).filter(col("doc_id") % 3 =!= 0))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val c = seed(id)
          val w = (64 + (id % 8) * 32).toInt
          val h = (64 + (id % 5) * 48).toInt
          val px = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) { px(i) = ((c + i) % 256).toByte; i += 1 }
          val png = Png.encode(w, h, px)
          val img = Png.decode(png)
          require(img.width == w && img.height == h,
            s"PNG round trip changed dimensions for asset $id")
          var sum = 0L; var k = 0
          while (k < img.pixels.length) { sum += img.pixels(k) & 0xff; k += 1 }
          val (hi, lo) = ahashHalves(img)
          (id, w, h, sum, hi, lo)
        }
      }.toDF("asset_id", "width", "height", "checksum", "phash_hi", "phash_lo")
  }

  /** Oracle: image dims + prefix-sum checksum (q126 arithmetic) joined
    * to the q131 aHash CTE — never sees a byte. */
  lazy val pngDecodeStatsSql: String = {
    val sHi = prefixSql("c + n"); val sLo = prefixSql("c")
    s"""WITH $phashHashesSql,
       |d2 AS (
       |  SELECT doc_id AS asset_id, (doc_id * 97) % 256 AS c,
       |         64 + (doc_id % 8) * 32 AS w, 64 + (doc_id % 5) * 48 AS h
       |  FROM documents WHERE doc_id % 3 != 0),
       |s2 AS (SELECT asset_id, c, w, h, w * h * 3 AS n FROM d2)
       |SELECT s2.asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |       CAST($sHi - ($sLo) AS BIGINT) AS checksum,
       |       hh.phash_hi, hh.phash_lo
       |FROM s2 JOIN hashes hh ON s2.asset_id = hh.asset_id""".stripMargin
  }

  /** LOSSY-container decode gate with dead-letter routing (q150):
    * every image document's generator pixels are encoded as a REAL
    * baseline JPEG ([[Jpeg.encode]]: the JDK's DCT/Huffman writer at
    * quality 0.85), the frame header is recovered by OUR independent
    * T.81 marker walker ([[Jpeg.parseHeader]] — no MCU decode, the
    * manifest-pass shape), and the full decode runs through ImageIO.
    * Because JPEG is lossy the decoded pixels are NOT
    * generator-reproducible, so the certification splits:
    *  - the ORACLE pins the deterministic surface — dimensions,
    *    component count, precision, and which assets dead-letter;
    *  - the SPARK side gates fidelity in-query: the marker walker and
    *    ImageIO must agree on the frame dimensions, those must match
    *    the generator's, and the mean |decoded − source| per asset
    *    must stay ≤ [[JpegMeanErrBound]] (measured 1.3–4.8 at q0.85
    *    on the gradient corpus). A require failure FAILS the query —
    *    fidelity violations never masquerade as dead letters.
    * Dead-letter path (reference D13, `dataflow_transform.py:127-131`
    * analog): assets with `doc_id % 13 = 5` carry a truncated payload
    * (SOI + 18 bytes); parse/decode throws and the asset routes to a
    * `status = 'dead_letter'` row instead of poisoning the batch.
    * Same scale shape as q126/q142: synthesize → encode → parse →
    * decode → fixed-width feature row in ONE narrow pass; payload
    * bytes never shuffle.
    *
    * Measured limitation worth knowing (probe over 1000 corpus
    * images, q0.85): the q131 aHash drifts up to 16/64 bits under a
    * JPEG round trip on this gradient corpus — ABOVE the
    * [[PHashHamming]]=7 near-dup cut — and an 8×8 block-MEAN variant
    * is no better here (mean 2.4, max 16: block means of a sawtooth
    * gradient are all near the threshold). Recompressed copies of an
    * image therefore need content hashing on DECODED-pixel checksums
    * (q126/q142) or coarser perceptual bits, not the 64-bit aHash
    * alone — which is why the dedup manifests key on decoded
    * checksums. */
  val JpegMeanErrBound = 8.0

  def jpegDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.spread(
        graft.tables.Tables.documents(spark, dir)
          .select(col("doc_id")).filter(col("doc_id") % 3 =!= 0))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val c = seed(id)
          val w = (64 + (id % 8) * 32).toInt
          val h = (64 + (id % 5) * 48).toInt
          val px = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) { px(i) = ((c + i) % 256).toByte; i += 1 }
          val full = Jpeg.encode(w, h, px)
          val jpg = if (id % 13 == 5) java.util.Arrays.copyOf(full, 20) else full
          val parsed =
            SafeDecode("jpeg")((Jpeg.parseHeader(jpg), Jpeg.decode(jpg))).toOption
          parsed match {
            case None =>
              (id, 0, 0, 0, 0, "dead_letter")
            case Some((hd, img)) =>
              require(hd.width == img.width && hd.height == img.height,
                s"JPEG header/decoder dimension disagreement for asset $id")
              require(hd.width == w && hd.height == h,
                s"JPEG round trip changed dimensions for asset $id")
              var errSum = 0L; var k = 0
              while (k < px.length) {
                errSum += math.abs((img.pixels(k) & 0xff) - (px(k) & 0xff))
                k += 1
              }
              require(errSum <= JpegMeanErrBound * px.length,
                s"JPEG fidelity bound exceeded for asset $id: " +
                  s"mean err ${errSum.toDouble / px.length}")
              (id, hd.width, hd.height, hd.nComponents, hd.precision, "ok")
          }
        }
      }.toDF("asset_id", "width", "height", "n_components", "precision", "status")
  }

  /** Oracle: generator dimension arithmetic + the deterministic
    * dead-letter predicate — never sees a byte; the lossy pixels are
    * gated Spark-side (see [[jpegDecodeStats]]). */
  val jpegDecodeStatsSql: String =
    s"""SELECT doc_id AS asset_id,
       |       CAST(CASE WHEN doc_id % 13 = 5 THEN 0
       |                 ELSE 64 + (doc_id % 8) * 32 END AS INT) AS width,
       |       CAST(CASE WHEN doc_id % 13 = 5 THEN 0
       |                 ELSE 64 + (doc_id % 5) * 48 END AS INT) AS height,
       |       CAST(CASE WHEN doc_id % 13 = 5 THEN 0 ELSE 3 END AS INT) AS n_components,
       |       CAST(CASE WHEN doc_id % 13 = 5 THEN 0 ELSE 8 END AS INT) AS precision,
       |       CASE WHEN doc_id % 13 = 5 THEN 'dead_letter' ELSE 'ok' END AS status
       |FROM documents WHERE doc_id % 3 != 0""".stripMargin

  /** Binary-column metadata extraction with a cross-engine oracle: the
    * documents' text bytes stand in for an opaque media payload (this
    * container ships no real media), and the query exercises the binary
    * plumbing a media table needs — BINARY cast, byte length, a
    * deterministic content digest (md5), and a typed `kind` column
    * derived from the payload. Narrow map, payload never shuffles (the
    * aggregate sees only the small metadata row). */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val bin = col("text").cast("binary")
          // spread: no-op on a multi-split deployment, parallelizes the 1-split testdata
    graft.tables.Tables.spread(graft.tables.Tables.documents(spark, dir))
      .select(col("doc_id"),
        when(length(bin) % 3 === 0, "image")
          .when(length(bin) % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        length(bin).cast("long").as("n_bytes"),
        md5(bin).as("digest"))
  }

  /** Real media-bucket ingestion path: `spark.read.format("binaryFile")`
    * over a directory of opaque files — (path, length, content) per
    * file, metadata + digest extracted without the payload ever
    * entering a shuffle. Reads the SAME `dir` every other query
    * receives, so bench times track the scale factor; the oracle is
    * DuckDB's read_blob over the same directory (the `{SF_DIR}` token
    * is substituted with the run's actual dir by graft.Verify when it
    * dumps oracle_sql.json). The digest is md5(hex(content)) because
    * DuckDB's md5 only takes VARCHAR — both engines emit identical
    * uppercase hex, verified byte-identical. */
  def binaryFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .load(s"$dir/*.parquet")
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("length").as("n_bytes"),
        md5(hex(col("content"))).as("digest"))

  /** Oracle: read_blob over the ENGINE'S ENUMERATED file list (the
    * `{BINARY_FILES}` token — graft.Verify substitutes the exact
    * paths the binaryFile source resolved, via the source itself).
    * A glob here was layout-sensitive: on a part-directory corpus
    * Spark's glob descends into `t.parquet/` directories while
    * DuckDB's matches plain files only, so the two engines saw
    * different file sets (round-10 PERF note). The explicit list
    * makes the oracle layout-indifferent. */
  val binaryFilesSql: String =
    s"""SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |       CAST(size AS BIGINT) AS n_bytes,
       |       md5(hex(content)) AS digest
       |FROM read_blob({BINARY_FILES})""".stripMargin

  val binaryMetaSql: String =
    """SELECT doc_id,
      |       CASE WHEN octet_length(CAST(text AS BLOB)) % 3 = 0 THEN 'image'
      |            WHEN octet_length(CAST(text AS BLOB)) % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS kind,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |       md5(text) AS digest
      |FROM documents""".stripMargin

  // ---------------------------------------- perceptual hash (q131/q132)

  /** Hamming radius for perceptual near-dup pairs. With the 64-bit
    * hash split into 8 one-byte bands, any pair within 7 bits differs
    * in at most 7 bands, so at least ONE band matches exactly
    * (pigeonhole) — band blocking is EXACT at this radius, not
    * approximate. */
  val PHashHamming = 7

  /** 64-bit average hash (aHash) of a decoded image: nearest-neighbor
    * sample an 8×8 grid of RGB-sum cells (the q92 index map at a fixed
    * 8×8 target), set bit `p` iff its cell exceeds the grid mean
    * (`64·cell > Σcells`, all-integer — no float mean). Returned as
    * two unsigned 32-bit halves packed in Longs so BOTH engines can do
    * the arithmetic in plain signed 64-bit without overflow. */
  private[multimodal] def ahashHalves(img: Ppm.Image): (Long, Long) = {
    val cells = new Array[Long](64)
    var tot = 0L
    var p = 0
    while (p < 64) {
      val sy = (p / 8) * img.height / 8
      val sx = (p % 8) * img.width / 8
      val base = (sy * img.width + sx) * 3
      val cell = (img.pixels(base) & 0xff).toLong +
        (img.pixels(base + 1) & 0xff) + (img.pixels(base + 2) & 0xff)
      cells(p) = cell; tot += cell; p += 1
    }
    var hi = 0L; var lo = 0L
    p = 0
    while (p < 64) {
      if (64L * cells(p) > tot) {
        if (p >= 32) hi |= 1L << (p - 32) else lo |= 1L << p
      }
      p += 1
    }
    (hi, lo)
  }

  /** Per-image perceptual hash rows — REAL codec path (P6 parse →
    * pixel grid → bits), one narrow pass, payloads never leave the
    * partition; only (asset_id, two longs) ever moves. */
  private def imageHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpusAssets(spark, dir, kind = Some("image"))
      .mapPartitions { it =>
        it.map { a =>
          val (hi, lo) = ahashHalves(Ppm.decode(a.bytes))
          (a.asset_id, hi, lo)
        }
      }.toDF("asset_id", "phash_hi", "phash_lo")
  }

  /** Perceptual exact-dup grouping (q131): every image keyed by its
    * aHash; per class the representative is the min asset_id. This is
    * the collapsed, LINEAR form of image dedup — classes are rows,
    * members point at reps, and the quadratic pair set inside a class
    * (the 100 TB killer: popular thumbnails repeat millions of times)
    * is never emitted. One hash-keyed shuffle of fixed-width rows. */
  def phashGroups(spark: SparkSession, dir: String): DataFrame = {
    val h = imageHashes(spark, dir)
    val cls = h.groupBy(col("phash_hi"), col("phash_lo"))
      .agg(min(col("asset_id")).as("rep_id"), count(lit(1)).as("n_same"))
    h.join(cls, Seq("phash_hi", "phash_lo"))
      .select(col("asset_id"), col("phash_hi"), col("phash_lo"),
        col("rep_id"), col("n_same"))
  }

  /** Perceptual NEAR-dup pairs (q132) at hamming ≤ [[PHashHamming]],
    * computed over DISTINCT hashes only — the q21 collapse idea
    * applied to images: exact-dup classes (the quadratic mass) are
    * first collapsed to one row each by [[phashGroups]]' keyed agg,
    * then the 8 one-byte bands of each distinct hash block the
    * candidate join (exact at this radius — see [[PHashHamming]]),
    * and `bit_count(xor)` verifies. Shuffles carry only id/long rows;
    * candidate volume is O(distinct-hashes × 8), independent of how
    * often each image repeats. */
  def phashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val cls = imageHashes(spark, dir)
      .groupBy(col("phash_hi"), col("phash_lo"))
      .agg(min(col("asset_id")).as("rep_id"), count(lit(1)).as("n"))
    val bandCols = (0 until 8).map { k =>
      val half = if (k < 4) col("phash_lo") else col("phash_hi")
      struct(lit(k).as("bk"),
        shiftright(half, 8 * (k % 4)).bitwiseAND(lit(255L)).as("bv"))
    }
    val bands = cls.select(col("rep_id"), col("phash_hi"), col("phash_lo"),
      col("n"), explode(array(bandCols: _*)).as("band"))
      .select(col("rep_id"), col("phash_hi"), col("phash_lo"), col("n"),
        col("band.bk").as("bk"), col("band.bv").as("bv"))
    val a = bands.alias("a"); val b = bands.alias("b")
    a.join(b, col("a.bk") === col("b.bk") && col("a.bv") === col("b.bv") &&
        col("a.rep_id") < col("b.rep_id"))
      .select(col("a.rep_id").as("a1"), col("b.rep_id").as("a2"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        (bit_count(col("a.phash_hi").bitwiseXOR(col("b.phash_hi"))) +
          bit_count(col("a.phash_lo").bitwiseXOR(col("b.phash_lo"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= PHashHamming)
      .distinct()
  }

  // ------------------------------------------ audio segmentation (q135)

  /** A frame is "active" when its mean |sample| is ≥ 64 (half full
    * scale of the int8-ish generator stream) — Σ|s| ≥ 160·64. */
  val EnergyThreshold: Long = FrameLen * 64L

  /** Voice-activity-style energy segmentation (q135): every audio
    * asset is DECODED (real RIFF walk, int16 samples), per-frame
    * Σ|sample| energies are classified against [[EnergyThreshold]],
    * and maximal runs of the same class become segment rows — the
    * silence-trim / speech-extent primitive an audio training
    * pipeline runs before chunking.
    *
    * Scale shape: segmentation is per-asset-LOCAL, so the whole
    * operator is one narrow mapPartitions pass emitting small segment
    * rows — zero shuffle, no window function, payloads never move.
    * The DuckDB oracle rebuilds the same segments relationally
    * (per-sample generator arithmetic → frame energies →
    * gaps-and-islands), so the imperative run-builder is value-checked
    * against a declarative twin. */
  def audioSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpusAssets(spark, dir, kind = Some("audio"))
      .mapPartitions { it =>
        it.flatMap { a =>
          val au = Wav.decode(a.bytes)
          val nFrames = au.samples.length / FrameLen
          val segs = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long, Long, Long)]
          var segActive = -1L; var segStart = 0L; var segEnergy = 0L
          var f = 0
          while (f < nFrames) {
            var e = 0L; var k = f * FrameLen; val end = k + FrameLen
            while (k < end) { e += math.abs(au.samples(k).toLong); k += 1 }
            val act = if (e >= EnergyThreshold) 1L else 0L
            if (segActive < 0) { segActive = act; segStart = 0; segEnergy = e }
            else if (act == segActive) segEnergy += e
            else {
              segs += ((a.asset_id, segs.length.toLong, segActive,
                segStart, f - segStart, segEnergy))
              segActive = act; segStart = f; segEnergy = e
            }
            f += 1
          }
          if (segActive >= 0)
            segs += ((a.asset_id, segs.length.toLong, segActive,
              segStart, nFrames - segStart, segEnergy))
          segs.iterator
        }
      }.toDF("asset_id", "seg_idx", "is_active", "start_frame",
        "n_frames", "energy_sum")
  }

  /** Oracle: per-sample |((c+i) mod 256) − 128| energies summed per
    * frame, then textbook gaps-and-islands (`f − row_number` within
    * (asset, class)) — never sees a byte. */
  val audioSegmentsSql: String =
    s"""WITH au AS (
       |  SELECT doc_id AS asset_id, (doc_id * 97) % 256 AS c,
       |         100 + doc_id % 50 AS fr
       |  FROM documents WHERE doc_id % 3 = 0),
       |smp AS (
       |  SELECT asset_id, c, unnest(range(0, fr * $FrameLen)) AS i FROM au),
       |fe AS (
       |  SELECT asset_id, i // $FrameLen AS f,
       |         sum(abs(((c + i) % 256) - 128)) AS e
       |  FROM smp GROUP BY 1, 2),
       |cl AS (
       |  SELECT asset_id, f, e,
       |         CASE WHEN e >= $EnergyThreshold THEN 1 ELSE 0 END AS act
       |  FROM fe),
       |isl AS (
       |  SELECT asset_id, f, e, act,
       |         f - row_number() OVER (PARTITION BY asset_id, act ORDER BY f) AS grp
       |  FROM cl),
       |seg AS (
       |  SELECT asset_id, act, min(f) AS start_frame,
       |         count(*) AS n_frames, sum(e) AS energy_sum
       |  FROM isl GROUP BY asset_id, act, grp)
       |SELECT asset_id,
       |       CAST(row_number() OVER (PARTITION BY asset_id ORDER BY start_frame) - 1
       |            AS BIGINT) AS seg_idx,
       |       CAST(act AS BIGINT) AS is_active,
       |       CAST(start_frame AS BIGINT) AS start_frame,
       |       CAST(n_frames AS BIGINT) AS n_frames,
       |       CAST(energy_sum AS BIGINT) AS energy_sum
       |FROM seg""".stripMargin

  // ---------------------------------------------- audio resampling (q148)

  /** Resample-ladder target rates (Hz). ASR/speech pipelines normalize
    * every asset to canonical rates before chunking; the corpus's WAVs
    * are 8 kHz, so the ladder exercises ×2 and ×4 integer decimation. */
  val ResampleTargets: Seq[Int] = Seq(4000, 2000)

  /** Audio resampling (q148): every audio asset DECODED (real RIFF
    * walk) and resampled to each [[ResampleTargets]] rate by integer
    * box-mean decimation — out[j] = ⌊Σₜ(in[jk+t]+128)/k⌋ − 128 with
    * k = sr/target (the +128 shift keeps the integer division on
    * non-negative values, where Scala `/` and DuckDB `//` agree). The
    * k-sample mean IS a crude anti-alias low-pass, so this is the
    * honest zero-order pipeline form, not bare sample-dropping.
    *
    * Scale shape: per-asset-LOCAL like q135 — one narrow mapPartitions
    * pass, zero shuffle, payloads never move; each asset emits
    * |ladder| fixed-width rows whose `checksum_rs` summarizes every
    * resampled sample, which the oracle re-derives from generator
    * arithmetic (certifying encoder + RIFF parser + resampler). */
  /** Box-mean ×k decimation summary: (output length, Σ output samples).
    * The +128 shift keeps the per-window integer division non-negative
    * (where truncation and floor agree across engines). */
  private[multimodal] def resampleChecksum(samples: Array[Short], k: Int): (Long, Long) = {
    val nOut = samples.length / k
    var j = 0
    var cs = 0L
    while (j < nOut) {
      var s = 0L
      var t = 0
      while (t < k) { s += samples(j * k + t) + 128; t += 1 }
      cs += s / k - 128
      j += 1
    }
    (nOut.toLong, cs)
  }

  def audioResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val targets = ResampleTargets
    corpusAssets(spark, dir, kind = Some("audio"))
      .mapPartitions { it =>
        it.flatMap { a =>
          val au = Wav.decode(a.bytes)
          targets.iterator.map { tgt =>
            require(au.sampleRate % tgt == 0, s"non-integer ratio ${au.sampleRate}/$tgt")
            val k = au.sampleRate / tgt
            val (nOut, cs) = resampleChecksum(au.samples, k)
            (a.asset_id, au.sampleRate.toLong, tgt.toLong,
              au.samples.length.toLong, nOut, cs)
          }
        }
      }.toDF("asset_id", "sr_in", "target", "n_in", "n_out", "checksum_rs")
  }

  /** Oracle: generator arithmetic — in[i]+128 = (c+i) mod 256, so each
    * output sample is a k-term modular sum; never sees a byte. The sum
    * is CLOSED-FORM and PERIODIC, which is what keeps this oracle off
    * the sf1 wall list (a per-output-sample expansion was 250M rows ×
    * an interpreted k-term lambda = 176 s): with b = (c + j·k) mod 256
    * the window's k consecutive residues sum to k·b + k(k−1)/2 −
    * 256·max(0, b+k−256) (the wrap correction), and b cycles in j with
    * period p = 256/k — so each (c, k) class needs only its p-row
    * cycle table (≤ 65k rows total), a cycle sum, and prefix sums;
    * every asset's checksum is then full_cycles · cycle_sum +
    * prefix(n_out mod p). Values identical by construction: the
    * closed form IS the sum the per-sample loop computes. */
  val audioResampleSql: String =
    s"""WITH au AS MATERIALIZED (
       |  SELECT doc_id AS asset_id, (doc_id * 97) % 256 AS c,
       |         8000 AS sr, (100 + doc_id % 50) * $FrameLen AS n_in
       |  FROM documents WHERE doc_id % 3 = 0),
       |tg AS (SELECT unnest([${ResampleTargets.mkString(", ")}]) AS target),
       |ks AS (SELECT DISTINCT 8000 // target AS k FROM tg),
       |percl AS MATERIALIZED (
       |  SELECT c, k, jj,
       |         ((k*b + (k*(k-1)) // 2 - 256 * greatest(0, b + k - 256)) // k) - 128 AS s
       |  FROM (
       |    SELECT cs.c, ks.k, jj.jj, (cs.c + jj.jj * ks.k) % 256 AS b
       |    FROM (SELECT DISTINCT c FROM au) cs
       |    CROSS JOIN ks
       |    CROSS JOIN (SELECT unnest(range(0, 256)) AS jj) jj
       |    WHERE jj.jj < 256 // ks.k)),
       |cyc AS (SELECT c, k, CAST(sum(s) AS BIGINT) AS cycle_sum
       |        FROM percl GROUP BY 1, 2),
       |pre AS (SELECT c, k, jj,
       |               CAST(coalesce(sum(s) OVER (PARTITION BY c, k ORDER BY jj
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |                 AS BIGINT) AS pfx
       |        FROM percl),
       |ax AS (
       |  SELECT asset_id, c, sr, n_in, target, sr // target AS k,
       |         n_in // (sr // target) AS n_out
       |  FROM au CROSS JOIN tg)
       |SELECT ax.asset_id, CAST(ax.sr AS BIGINT) AS sr_in,
       |       CAST(ax.target AS BIGINT) AS target,
       |       CAST(ax.n_in AS BIGINT) AS n_in,
       |       CAST(ax.n_out AS BIGINT) AS n_out,
       |       CAST((ax.n_out // (256 // ax.k)) * cyc.cycle_sum + pre.pfx
       |            AS BIGINT) AS checksum_rs
       |FROM ax
       |JOIN cyc ON cyc.c = ax.c AND cyc.k = ax.k
       |JOIN pre ON pre.c = ax.c AND pre.k = ax.k
       |        AND pre.jj = ax.n_out % (256 // ax.k)""".stripMargin

  /** Multimodal training-sample manifest (q140): the end-to-end
    * curation join a dataset build finishes with — every document
    * paired with its media asset's decoded features, its exact-dedup
    * canonicality (first-wins fingerprint rep), and its per-language
    * quality-routing verdict (q138); `sample_ok` marks the rows a
    * training run would actually emit (canonical AND quality-kept).
    * Composes the stage operators VERBATIM (the q109 funnel
    * convention), so the manifest certifies the stages agree when
    * joined, not just individually.
    *
    * Scale shape: three doc_id-keyed equi-joins of fixed-width
    * verdict/feature rows (text and payloads stay in their narrow
    * stages); the fingerprint agg is the q19 shuffle. Nothing here
    * adds a new scale risk — that is the point of manifest assembly. */
  def trainingManifest(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextExprs._
    val docs = graft.tables.Tables.spread(
        graft.tables.Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"),
        polyHashCol(array_join(tokensCol(col("text")), " ")).as("fp"))
    val keep = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    val route = graft.text.TextOps.qualityQuantileRoute(spark, dir)
      .select(col("doc_id"), col("quality_bp"),
        col("keep").as("quality_keep"))
    val assets = decodeStats(spark, dir)
      .select(col("asset_id").as("doc_id"), col("kind"), col("byte_len"))
    docs.join(keep, "fp")
      .withColumn("is_canonical",
        when(col("doc_id") === col("keep_id"), 1L).otherwise(0L))
      .join(route, "doc_id")
      .join(assets, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"),
        col("is_canonical"), col("quality_bp"), col("quality_keep"),
        col("kind"), col("byte_len"),
        when(col("is_canonical") === 1L && col("quality_keep") === 1L, 1L)
          .otherwise(0L).as("sample_ok"))
  }

  /** Nests the stage oracles verbatim (q19 fingerprint, q138 routing,
    * q126 decode arithmetic) as parenthesized subqueries. */
  lazy val trainingManifestSql: String = {
    import graft.functions.TextExprs.{polyHashSql, tokensSql}
    s"""WITH fps AS (
       |  SELECT doc_id, lang, source,
       |         ${polyHashSql(s"array_to_string(${tokensSql("text")}, ' ')")} AS fp
       |  FROM documents),
       |keepids AS (SELECT fp, min(doc_id) AS keep_id FROM fps GROUP BY 1),
       |route AS (${graft.text.TextOps.qualityQuantileRouteSql}),
       |assets AS ($decodeStatsSql)
       |SELECT f.doc_id, f.lang, f.source,
       |       CAST(CASE WHEN f.doc_id = k.keep_id THEN 1 ELSE 0 END AS BIGINT) AS is_canonical,
       |       r.quality_bp, r.keep AS quality_keep, a.kind, a.byte_len,
       |       CAST(CASE WHEN f.doc_id = k.keep_id AND r.keep = 1
       |                 THEN 1 ELSE 0 END AS BIGINT) AS sample_ok
       |FROM fps f
       |JOIN keepids k ON f.fp = k.fp
       |JOIN route r ON f.doc_id = r.doc_id
       |JOIN assets a ON f.doc_id = a.asset_id""".stripMargin
  }

  /** Incremental perceptual ingest gate (q139): every image asset with
    * `asset_id ≡ 4 (mod 5)` plays the ARRIVING batch (the q88
    * convention), the rest the standing corpus, and each batch image
    * gets a verdict: does the corpus already hold a perceptual
    * near-dup (hamming ≤ [[PHashHamming]])? The verdict is elected
    * per DISTINCT batch hash — (best hamming, then lowest corpus rep)
    * — and expanded back to batch members, so per-run work is
    * O(batch-distinct × 8 bands) probing a corpus-side index,
    * INDEPENDENT of corpus size per probe: the incremental shape a
    * daily image-ingest pipeline needs (contrast q132, which pairs the
    * whole corpus). All joins carry only ids and hash longs. */
  def phashIngestGate(spark: SparkSession, dir: String): DataFrame = {
    val h = imageHashes(spark, dir)
    val isNew = col("asset_id") % graft.dedup.DedupOps.IngestMod ===
      graft.dedup.DedupOps.IngestMod - 1
    val bCls = h.filter(isNew).groupBy(col("phash_hi"), col("phash_lo"))
      .agg(count(lit(1)).as("nb"))
    val cCls = h.filter(!isNew).groupBy(col("phash_hi"), col("phash_lo"))
      .agg(min(col("asset_id")).as("crep"))
    def bands(cls: DataFrame, pfx: String): DataFrame = {
      val bandCols = (0 until 8).map { k =>
        val half = if (k < 4) col("phash_lo") else col("phash_hi")
        struct(lit(k).as("bk"),
          shiftright(half, 8 * (k % 4)).bitwiseAND(lit(255L)).as("bv"))
      }
      cls.select(col("phash_hi").as(s"${pfx}_hi"),
          col("phash_lo").as(s"${pfx}_lo"),
          explode(array(bandCols: _*)).as("band"))
        .select(col(s"${pfx}_hi"), col(s"${pfx}_lo"),
          col("band.bk").as("bk"), col("band.bv").as("bv"))
    }
    val cand = bands(bCls, "b")
      .join(bands(cCls.select(col("phash_hi"), col("phash_lo")), "c"),
        Seq("bk", "bv"))
      .select(col("b_hi"), col("b_lo"), col("c_hi"), col("c_lo"))
      .distinct()
      .withColumn("hamming",
        (bit_count(col("b_hi").bitwiseXOR(col("c_hi"))) +
          bit_count(col("b_lo").bitwiseXOR(col("c_lo")))).cast("long"))
      .filter(col("hamming") <= PHashHamming)
    val best = cand
      .join(cCls.select(col("phash_hi").as("c_hi"),
        col("phash_lo").as("c_lo"), col("crep")), Seq("c_hi", "c_lo"))
      .groupBy(col("b_hi"), col("b_lo"))
      .agg(min(struct(col("hamming"), col("crep"))).as("m"))
      .select(col("b_hi").as("phash_hi"), col("b_lo").as("phash_lo"),
        col("m.hamming").as("best_hamming"), col("m.crep").as("dup_of"))
    h.filter(isNew)
      .join(best, Seq("phash_hi", "phash_lo"), "left")
      .select(col("asset_id"), col("phash_hi"), col("phash_lo"),
        when(col("dup_of").isNotNull, 1L).otherwise(0L).as("is_dup"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        coalesce(col("best_hamming"), lit(-1L)).as("best_hamming"))
  }

  /** Oracle: brute-force popcount join of distinct batch hashes against
    * distinct corpus hashes, same (hamming, rep) election. */
  lazy val phashIngestGateSql: String =
    s"""WITH $phashHashesSql,
       |bh AS (
       |  SELECT * FROM hashes
       |  WHERE asset_id % ${graft.dedup.DedupOps.IngestMod} = ${graft.dedup.DedupOps.IngestMod - 1}),
       |ch AS (
       |  SELECT * FROM hashes
       |  WHERE asset_id % ${graft.dedup.DedupOps.IngestMod} != ${graft.dedup.DedupOps.IngestMod - 1}),
       |bcls AS (SELECT DISTINCT phash_hi, phash_lo FROM bh),
       |ccls AS (
       |  SELECT phash_hi, phash_lo, min(asset_id) AS crep
       |  FROM ch GROUP BY 1, 2),
       |cand AS (
       |  SELECT b.phash_hi AS b_hi, b.phash_lo AS b_lo, c.crep,
       |         CAST(bit_count(xor(b.phash_hi, c.phash_hi))
       |              + bit_count(xor(b.phash_lo, c.phash_lo)) AS BIGINT) AS hamming
       |  FROM bcls b JOIN ccls c
       |    ON bit_count(xor(b.phash_hi, c.phash_hi))
       |       + bit_count(xor(b.phash_lo, c.phash_lo)) <= $PHashHamming),
       |best AS (
       |  SELECT b_hi, b_lo, hamming AS best_hamming, crep AS dup_of
       |  FROM (SELECT *, row_number() OVER (PARTITION BY b_hi, b_lo
       |                                     ORDER BY hamming, crep) AS rn
       |        FROM cand)
       |  WHERE rn = 1)
       |SELECT h.asset_id, h.phash_hi, h.phash_lo,
       |       CAST(CASE WHEN best.dup_of IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
       |       coalesce(best.dup_of, -1) AS dup_of,
       |       coalesce(best.best_hamming, -1) AS best_hamming
       |FROM bh h LEFT JOIN best
       |  ON h.phash_hi = best.b_hi AND h.phash_lo = best.b_lo""".stripMargin

  /** Shared oracle CTE: re-derives every image's aHash ARITHMETICALLY
    * from the generator formula (per-cell byte index map exactly as the
    * q92 resize oracle, RGB-triple sum with the 254/255 wrap cases),
    * never touching a byte — the Spark side hashes genuinely decoded
    * pixels, so a green hash certifies codec + grid + threshold. */
  private val phashHashesSql: String =
    s"""dims AS (
       |  SELECT doc_id AS asset_id,
       |         (doc_id * 97) % 256 AS c,
       |         64 + (doc_id % 8) * 32 AS w,
       |         64 + (doc_id % 5) * 48 AS h
       |  FROM documents WHERE doc_id % 3 != 0),
       |grid AS (
       |  SELECT asset_id, c, w, h, unnest(range(0, 64)) AS p
       |  FROM dims),
       |cellv AS (
       |  SELECT asset_id, p,
       |         (c + (((p // 8) * h // 8) * w + (p % 8) * w // 8) * 3) % 256 AS m
       |  FROM grid),
       |cells AS (
       |  SELECT asset_id, p,
       |         CASE WHEN m = 254 THEN 509 WHEN m = 255 THEN 256
       |              ELSE 3 * m + 3 END AS cell
       |  FROM cellv),
       |tots AS (SELECT asset_id, sum(cell) AS tot FROM cells GROUP BY 1),
       |bits AS (
       |  SELECT c.asset_id, p,
       |         CASE WHEN 64 * cell > tot THEN 1 ELSE 0 END AS bit
       |  FROM cells c JOIN tots t ON c.asset_id = t.asset_id),
       |hashes AS (
       |  SELECT asset_id,
       |         CAST(sum(CASE WHEN bit = 1 AND p >= 32
       |                       THEN (1::BIGINT << (p - 32)) ELSE 0 END) AS BIGINT) AS phash_hi,
       |         CAST(sum(CASE WHEN bit = 1 AND p < 32
       |                       THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS phash_lo
       |  FROM bits GROUP BY 1)""".stripMargin

  val phashGroupsSql: String =
    s"""WITH $phashHashesSql,
       |cls AS (
       |  SELECT phash_hi, phash_lo, min(asset_id) AS rep_id,
       |         CAST(count(*) AS BIGINT) AS n_same
       |  FROM hashes GROUP BY 1, 2)
       |SELECT h.asset_id, h.phash_hi, h.phash_lo, c.rep_id, c.n_same
       |FROM hashes h JOIN cls c
       |  ON h.phash_hi = c.phash_hi AND h.phash_lo = c.phash_lo""".stripMargin

  /** Oracle verifies the BANDED Spark result against brute-force
    * popcount over all distinct-hash pairs — the strongest possible
    * check that band blocking lost nothing (cheap in DuckDB because
    * distinct hashes are few; the Spark side must never do this). */
  val phashNeardupSql: String =
    s"""WITH $phashHashesSql,
       |cls AS (
       |  SELECT phash_hi, phash_lo, min(asset_id) AS rep_id,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM hashes GROUP BY 1, 2)
       |SELECT a.rep_id AS a1, b.rep_id AS a2, a.n AS n_a, b.n AS n_b,
       |       CAST(bit_count(xor(a.phash_hi, b.phash_hi))
       |            + bit_count(xor(a.phash_lo, b.phash_lo)) AS BIGINT) AS hamming
       |FROM cls a JOIN cls b ON a.rep_id < b.rep_id
       |WHERE bit_count(xor(a.phash_hi, b.phash_hi))
       |      + bit_count(xor(a.phash_lo, b.phash_lo)) <= $PHashHamming""".stripMargin
}
