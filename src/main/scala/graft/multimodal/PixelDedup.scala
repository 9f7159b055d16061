package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs.P

/** Format-crossing pixel-level image dedup (q174) — the rule every
  * image-corpus pipeline learns the hard way: the same photograph
  * arrives as a PNG here and a PPM/JPEG there, so CONTAINER-byte
  * hashing (q19's shape on `bytes`) silently misses the duplicate;
  * the dedup key must be a digest of the DECODED pixel buffer. Every
  * selected document yields the same generator pixels wrapped in TWO
  * real containers — raw P6 PPM and deflate-compressed PNG ([[Ppm]]/
  * [[Png]], independent encode paths) — and the operator groups
  * assets by the polyhash of their decoded interleaved-RGB bytes:
  * every class must collapse to size 2 spanning both formats, which
  * only happens if the PPM parser and the PNG inflate+unfilter agree
  * byte-for-byte on every pixel of every image (the spec also pins
  * that the CONTAINER-byte fingerprints do NOT collide — the naive
  * key provably misses what this one catches).
  *
  * Oracle: the generator's pixel stream is (c + i) mod 256, so DuckDB
  * re-derives each image's pixel fingerprint as the same fold over
  * `range(0, w·h·3)` — it never sees a container byte; a green hash
  * certifies both decoders against the spec arithmetic.
  *
  * Scale shape: synthesize → decode → (asset_id, fp, dims) is one
  * narrow mapPartitions pass; payloads never shuffle; the class table
  * groups 16-byte rows and joins back fp-keyed. */
object PixelDedup {

  private[multimodal] def dims(d: Long): (Int, Int) =
    ((32 + (d % 4) * 16).toInt, (32 + (d % 3) * 16).toInt)

  private[multimodal] def makePair(d: Long): Seq[(Long, String, Array[Byte])] = {
    val (w, h) = dims(d)
    val c = ((d * 97) % 256).toInt
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = ((c + i) % 256).toByte; i += 1 }
    Seq((d * 2, "ppm", Ppm.encode(w, h, px)),
        (d * 2 + 1, "png", Png.encode(w, h, px)))
  }

  def pixelDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assets = Tables.spread(Tables.documents(spark, dir)
        .select(col("doc_id")).filter(col("doc_id") % 5 === 1))
      .as[Long].flatMap(makePair _)
      .toDF("asset_id", "format", "bytes")
    val decoded = assets.as[(Long, String, Array[Byte])].mapPartitions { it =>
      it.map { case (id, fmt, bytes) =>
        val img = if (Png.isPng(bytes)) Png.decode(bytes) else Ppm.decode(bytes)
        var fp = 0L
        var i = 0
        while (i < img.pixels.length) {
          fp = (fp * 31 + (img.pixels(i) & 0xff)) % P
          i += 1
        }
        (id, fmt, img.width.toLong, img.height.toLong, fp)
      }
    }.toDF("asset_id", "format", "w", "h", "pix_fp")
    val classes = decoded.groupBy("pix_fp")
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("format")).as("n_formats"))
    decoded.join(classes, "pix_fp")
      .select(col("asset_id"), col("format"), col("w"), col("h"),
        col("pix_fp"), col("class_size"), col("n_formats"))
  }

  /** Oracle: per selected doc, dims/seed by the generator formulas and
    * the pixel fingerprint as the same fold over the arithmetic
    * stream; two container rows per doc share it. */
  val pixelDedupSql: String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |         32 + (doc_id % 4) * 16 AS w,
       |         32 + (doc_id % 3) * 16 AS h,
       |         (doc_id * 97) % 256 AS c
       |  FROM documents WHERE doc_id % 5 = 1),
       |f AS (
       |  SELECT doc_id, w, h,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(range(0, w * h * 3), i -> (c + i) % 256)),
       |           (acc, x) -> (acc * 31 + x) % $P) AS pix_fp
       |  FROM g),
       |a AS (
       |  SELECT doc_id * 2 AS asset_id, 'ppm' AS format, w, h, pix_fp FROM f
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, 'png', w, h, pix_fp FROM f),
       |cl AS (SELECT pix_fp, CAST(count(*) AS BIGINT) AS class_size,
       |              CAST(count(DISTINCT format) AS BIGINT) AS n_formats
       |       FROM a GROUP BY 1)
       |SELECT a.asset_id, a.format, CAST(a.w AS BIGINT) AS w,
       |       CAST(a.h AS BIGINT) AS h, a.pix_fp, cl.class_size, cl.n_formats
       |FROM a JOIN cl ON cl.pix_fp = a.pix_fp""".stripMargin
}
