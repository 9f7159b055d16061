package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private lazy val assets  = MultimodalOps.synthesizeAssets(spark, 200)
  private lazy val decoded = MultimodalOps.decode(assets).cache()

  /** Closed-form Σ_{j<m} (j mod 256) — the oracle arithmetic. */
  private def prefix(m: Long): Long =
    (m / 256) * 32640 + (m % 256) * ((m % 256) - 1) / 2

  // ---- codec unit tests (format-generic, not just generator output) ----

  test("PPM codec: encode/decode round trip preserves pixels") {
    val px = Array.tabulate(4 * 3 * 3)(i => ((i * 37 + 5) % 256).toByte)
    val img = Ppm.decode(Ppm.encode(4, 3, px))
    assert((img.width, img.height, img.maxVal) === ((4, 3, 255)))
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("PPM parser: comments and arbitrary whitespace in the header (netpbm spec)") {
    val px = Array.tabulate(2 * 2 * 3)(i => (i + 1).toByte)
    val header = "P6 # a comment\n#another whole-line comment\n 2\t2 #dims\n255\n"
    val bytes = header.getBytes("US-ASCII") ++ px
    val img = Ppm.decode(bytes)
    assert((img.width, img.height) === ((2, 2)))
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("PPM parser: rejects non-P6 and truncated rasters") {
    intercept[IllegalArgumentException](Ppm.decode("P5\n2 2\n255\n".getBytes))
    intercept[IllegalArgumentException](
      Ppm.decode("P6\n2 2\n255\nxx".getBytes)) // 12-byte raster expected
  }

  test("WAV codec: encode/decode round trip preserves samples and rate") {
    val samples = Array.tabulate(320)(i => ((i * 7) - 160).toShort)
    val au = Wav.decode(Wav.encode(16000, samples))
    assert(au.sampleRate === 16000)
    assert(au.channels === 1)
    assert(au.samples.toSeq === samples.toSeq)
  }

  test("WAV parser: skips unknown chunks (incl. odd-length + pad byte)") {
    import java.nio.{ByteBuffer, ByteOrder}
    val samples = Array.tabulate(100)(i => (i - 50).toShort)
    val canonical = Wav.encode(8000, samples)
    // splice a 5-byte (odd) LIST chunk between WAVE and fmt
    val extra = ByteBuffer.allocate(canonical.length + 8 + 5 + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    extra.put(canonical, 0, 12)                  // RIFF/size/WAVE
    extra.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII")).put(0.toByte) // odd len + pad
    extra.put(canonical, 12, canonical.length - 12)
    val bytes = extra.array()
    // fix the RIFF size field (not that the walker uses it)
    ByteBuffer.wrap(bytes, 4, 4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(bytes.length - 8)
    val au = Wav.decode(bytes)
    assert(au.sampleRate === 8000)
    assert(au.samples.toSeq === samples.toSeq)
  }

  test("PNG codec: encode/decode round trip is pixel-exact through a real deflate stream") {
    val px = Array.tabulate(7 * 5 * 3)(i => ((i * 131 + 17) % 256).toByte)
    val png = Png.encode(7, 5, px)
    // genuine PNG container: signature + the round trip goes through
    // the JDK's INDEPENDENT ImageIO reader (inflate + unfilter)
    assert(Png.isPng(png))
    val img = Png.decode(png)
    assert((img.width, img.height) === ((7, 5)))
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("PNG encoder emits a real compressed stream on repetitive pixels") {
    // constant image: deflate must beat the raw raster by a wide margin
    val px = Array.fill(64 * 64 * 3)(42.toByte)
    val png = Png.encode(64, 64, px)
    assert(png.length < px.length / 4,
      s"PNG of constant 64x64 image is ${png.length}B — not compressed")
    assert(Png.decode(png).pixels.toSeq === px.toSeq)
  }

  test("PNG decode rejects non-PNG payloads") {
    intercept[IllegalArgumentException](Png.decode("not a png at all".getBytes))
    val ppm = Ppm.encode(2, 2, Array.fill(12)(1.toByte))
    intercept[IllegalArgumentException](Png.decode(ppm))
  }

  test("generic decode sniffs PNG beside PPM and WAV") {
    import spark.implicits._
    val px = Array.tabulate(3 * 3 * 3)(i => (i * 5).toByte)
    val asset = Asset(7L, "image", Png.encode(3, 3, px), "s")
    val d = MultimodalOps.decode(Seq(asset).toDS()).collect().head
    assert((d.kind, d.width, d.height, d.n_frames) === (("image", 3, 3, 1)))
    assert(d.checksum === px.map(_ & 0xff).map(_.toLong).sum)
  }

  test("nearest-neighbor resize: exact source-index mapping") {
    // 4x2 image, pixel value = its flat byte index
    val px = Array.tabulate(4 * 2 * 3)(_.toByte)
    val out = MultimodalOps.resizeNearest(px, 4, 2, 2, 1)
    // (x=0,y=0) -> sx=0,sy=0 -> bytes 0,1,2 ; (x=1,y=0) -> sx=2 -> bytes 6,7,8
    assert(out.toSeq === Seq[Byte](0, 1, 2, 6, 7, 8))
    val id = MultimodalOps.resizeNearest(px, 4, 2, 4, 2)
    assert(id.toSeq === px.toSeq) // identity when target == source
  }

  // ---- pipeline tests over the synthetic generator ----

  test("decode recovers typed metadata AND decoded-unit checksums for every asset") {
    assert(decoded.count() === 200)
    val byKind = decoded.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("audio") === 67)  // ids ≡ 0 (mod 3)
    assert(byKind("image") === 133)
    val a5 = decoded.filter(col("asset_id") === 5).head()
    val (w5, h5) = (64 + (5 % 8) * 32, 64 + (5 % 5) * 48)
    assert(a5.width === w5)
    assert(a5.height === h5)
    // PPM container: "P6\n224 64\n255\n" header + w*h*3 raster
    assert(a5.byte_len === s"P6\n$w5 $h5\n255\n".length + w5 * h5 * 3)
    // pixel checksum re-derived from the generator closed form
    val c5 = (5L * 97) % 256; val n5 = w5.toLong * h5 * 3
    assert(a5.checksum === prefix(c5 + n5) - prefix(c5))
    val a6 = decoded.filter(col("asset_id") === 6).head()
    assert(a6.kind === "audio")
    assert(a6.sample_rate === 8000)
    val fr6 = 100 + 6 % 50
    assert(a6.n_frames === fr6)
    assert(a6.byte_len === 44 + fr6 * MultimodalOps.FrameLen * 2)
    val c6 = (6L * 97) % 256; val n6 = fr6.toLong * MultimodalOps.FrameLen
    assert(a6.checksum === prefix(c6 + n6) - prefix(c6) - 128L * n6)
  }

  test("resize plan fits the target box and keeps aspect ratio") {
    val plan = MultimodalOps.resizePlan(decoded, maxSide = 100)
    val rows = plan.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h)   = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (nw, nh) = (r.getAs[Int]("new_width"), r.getAs[Int]("new_height"))
      assert(nw <= 100 && nh <= 100)
      assert(math.max(nw, nh) === 100 ||
        math.abs(nw - 100.0 * w / math.max(w, h)) < 1)
    }
  }

  test("corpus frame-sample query: indices AND sample sums match the generator (q82)") {
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalOps.frameSamples(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val docIds = graft.tables.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = (for {
      id <- docIds if id % 3 == 0
      f  <- 0 until (100 + (id % 50)).toInt by 7
    } yield {
      val c = (id * 97) % 256
      val lo = c + f.toLong * MultimodalOps.FrameLen
      val hi = lo + MultimodalOps.FrameLen
      (id, f) -> (prefix(hi) - prefix(lo) - 128L * MultimodalOps.FrameLen)
    }).toMap
    assert(out === expected)
  }

  test("corpus resize query: boxes AND resized pixel sums match the generator (q92)") {
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalOps.resizePlans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4), r.getLong(5))).toSet
    val docIds = graft.tables.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = (for {
      id <- docIds if id % 3 != 0
      w = (64 + (id % 8) * 32).toInt
      h = (64 + (id % 5) * 48).toInt
      if math.max(w, h) > MultimodalOps.MaxSide
      scale = MultimodalOps.MaxSide.toDouble / math.max(w, h)
    } yield {
      val nw = math.floor(w * scale).toInt
      val nh = math.floor(h * scale).toInt
      // independent re-derivation: replay the source-index map over the
      // generator byte formula (never touches the codec or the buffer)
      val c = (id * 97) % 256
      var s = 0L
      for (y <- 0 until nh; x <- 0 until nw; ch <- 0 until 3) {
        val base = ((y.toLong * h / nh) * w + (x.toLong * w / nw)) * 3
        s += (c + base + ch) % 256
      }
      (id, nw, nh, s)
    }).toSet
    assert(out === expected)
    out.foreach { case (_, nw, nh, _) =>
      assert(nw <= MultimodalOps.MaxSide && nh <= MultimodalOps.MaxSide)
    }
  }

  test("aHash over real decoded pixels matches independent generator arithmetic (q131)") {
    val dir = "/root/testdata/sf0.001"
    val got = MultimodalOps.phashGroups(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docIds = graft.tables.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    // independent re-derivation straight from the byte formula — never
    // touches the codec, the buffer, or ahashHalves
    val expected = (for (id <- docIds if id % 3 != 0) yield {
      val c = (id * 97) % 256
      val w = (64 + (id % 8) * 32).toInt
      val h = (64 + (id % 5) * 48).toInt
      val cells = Array.tabulate(64) { p =>
        val base = (((p / 8) * h / 8) * w.toLong + (p % 8) * w / 8) * 3
        (0 until 3).map(k => (c + base + k) % 256).sum
      }
      val tot = cells.sum
      var hi = 0L; var lo = 0L
      for (p <- 0 until 64 if 64L * cells(p) > tot)
        if (p >= 32) hi |= 1L << (p - 32) else lo |= 1L << p
      id -> ((hi, lo))
    }).toMap
    assert(got === expected)
  }

  test("PNG decode gate: checksums and aHashes over ImageIO-decoded pixels match the generator (q142)") {
    val dir = "/root/testdata/sf0.001"
    val got = MultimodalOps.pngDecodeStats(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val docIds = graft.tables.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    // independent re-derivation from the byte formula — never touches
    // the PNG encoder, ImageIO, or ahashHalves
    val expected = (for (id <- docIds if id % 3 != 0) yield {
      val c = (id * 97) % 256
      val w = (64 + (id % 8) * 32).toInt
      val h = (64 + (id % 5) * 48).toInt
      val n = w.toLong * h * 3
      val cells = Array.tabulate(64) { p =>
        val base = (((p / 8) * h / 8) * w.toLong + (p % 8) * w / 8) * 3
        (0 until 3).map(k => (c + base + k) % 256).sum
      }
      val tot = cells.sum
      var hi = 0L; var lo = 0L
      for (p <- 0 until 64 if 64L * cells(p) > tot)
        if (p >= 32) hi |= 1L << (p - 32) else lo |= 1L << p
      id -> ((w, h, prefix(c + n) - prefix(c), hi, lo))
    }).toMap
    assert(got === expected)
  }

  test("JPEG: header walker agrees with ImageIO; lossy round trip stays in the fidelity bound") {
    val w = 96; val h = 80
    val px = Array.tabulate(w * h * 3)(i => ((7 + i) % 256).toByte)
    val jpg = Jpeg.encode(w, h, px)
    assert(Jpeg.isJpeg(jpg))
    // independent parses: our T.81 marker walker vs the JDK decoder
    val hd = Jpeg.parseHeader(jpg)
    val img = Jpeg.decode(jpg)
    assert((hd.width, hd.height, hd.nComponents, hd.precision) === ((w, h, 3, 8)))
    assert((img.width, img.height) === ((w, h)))
    val meanErr = px.indices.map(i =>
      math.abs((img.pixels(i) & 0xff) - (px(i) & 0xff))).sum.toDouble / px.length
    assert(meanErr <= MultimodalOps.JpegMeanErrBound,
      s"mean |decoded-source| $meanErr exceeds bound")
    // the walker skips leading APPn/COM segments it has never seen:
    // splice a COM segment right after SOI
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0, 7) ++ "hello".getBytes
    val spliced = jpg.take(2) ++ com ++ jpg.drop(2)
    assert(Jpeg.parseHeader(spliced) === hd)
  }

  test("JPEG parser: rejects non-JPEG and truncated payloads") {
    intercept[IllegalArgumentException](Jpeg.parseHeader("nope".getBytes))
    val jpg = Jpeg.encode(16, 16, Array.fill(16 * 16 * 3)(3.toByte))
    intercept[IllegalArgumentException](Jpeg.parseHeader(jpg.take(20)))
    // ImageIO surfaces stream corruption as IIOException (an
    // IOException) — q150's NonFatal catch routes both to dead-letter
    intercept[Exception](
      Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte, 0, 0)))
  }

  test("JPEG decode gate: dims/dead-letter routing match the generator; corrupt assets never poison the batch (q150)") {
    val dir = "/root/testdata/sf0.001"
    val got = MultimodalOps.jpegDecodeStats(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))).toMap
    val docIds = graft.tables.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = (for (id <- docIds if id % 3 != 0) yield {
      if (id % 13 == 5) id -> ((0, 0, 0, 0, "dead_letter"))
      else id -> (((64 + (id % 8) * 32).toInt, (64 + (id % 5) * 48).toInt,
        3, 8, "ok"))
    }).toMap
    assert(got === expected)
    assert(got.values.exists(_._5 == "dead_letter"),
      "corpus slice exercised no dead-letter asset")
  }

  test("phash grouping: reps share the hash, class sizes sum to the image count (q131)") {
    val dir = "/root/testdata/sf0.001"
    val rows = MultimodalOps.phashGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byHash = rows.groupBy(r => (r._2, r._3))
    byHash.values.foreach { members =>
      val rep = members.map(_._4).distinct
      assert(rep.length === 1)                       // one rep per class
      assert(rep.head === members.map(_._1).min)     // rep = min asset
      assert(members.forall(_._5 == members.length)) // n_same consistent
    }
    assert(rows.length === rows.map(_._1).distinct.length) // one row per image
  }

  test("phash near-dup banding is EXACT: equals brute-force popcount over distinct hashes (q132)") {
    val dir = "/root/testdata/sf0.001"
    val banded = MultimodalOps.phashNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val cls = MultimodalOps.phashGroups(spark, dir).collect()
      .map(r => ((r.getLong(1), r.getLong(2)), r.getLong(3), r.getLong(4)))
      .distinct
    val brute = (for {
      i <- cls.indices; j <- cls.indices
      if cls(i)._2 < cls(j)._2
      d = java.lang.Long.bitCount(cls(i)._1._1 ^ cls(j)._1._1) +
        java.lang.Long.bitCount(cls(i)._1._2 ^ cls(j)._1._2)
      if d <= MultimodalOps.PHashHamming
    } yield (cls(i)._2, cls(j)._2, cls(i)._3, cls(j)._3, d.toLong)).toSet
    assert(brute.nonEmpty)
    assert(banded === brute)
  }

  test("audio segmentation: segments match generator arithmetic and tile each asset (q135)") {
    val dir = "/root/testdata/sf0.001"
    val rows = MultimodalOps.audioSegments(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val docIds = graft.tables.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    // independent twin from the byte formula (never touches the codec)
    val expected = (for (id <- docIds if id % 3 == 0) yield {
      val c = (id * 97) % 256
      val nFrames = (100 + id % 50).toInt
      val cls = (0 until nFrames).map { f =>
        val e = (f * 160 until (f + 1) * 160)
          .map(i => math.abs((c + i) % 256 - 128).toLong).sum
        (e, if (e >= MultimodalOps.EnergyThreshold) 1L else 0L)
      }
      val segs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long, Long)]
      var start = 0
      for (f <- 1 to nFrames)
        if (f == nFrames || cls(f)._2 != cls(start)._2) {
          segs += ((id, segs.length.toLong, cls(start)._2, start.toLong,
            (f - start).toLong, cls.slice(start, f).map(_._1).sum))
          start = f
        }
      segs
    }).flatten.toSet
    assert(rows.toSet === expected)
    // structural invariants: per asset the segments alternate class and
    // tile [0, nFrames) without gaps
    rows.groupBy(_._1).values.foreach { segs =>
      val s = segs.sortBy(_._2)
      s.sliding(2).foreach {
        case Array(p, n) =>
          assert(p._3 != n._3, "adjacent segments must alternate class")
          assert(p._4 + p._5 === n._4, "segments must be contiguous")
        case _ =>
      }
      assert(s.head._4 === 0L)
    }
  }

  test("resampleChecksum: box-mean decimation on a crafted window (incl. negative samples)") {
    // samples: [-128, -126, 100, 102, 7] with k=2 → windows [-128,-126],
    // [100,102]; shifted means (0+2)/2=1, (228+230)/2=229 → outputs
    // 1-128=-127 and 229-128=101; the trailing odd sample is dropped.
    val (n, cs) = MultimodalOps.resampleChecksum(
      Array[Short](-128, -126, 100, 102, 7), 2)
    assert((n, cs) === ((2L, (-127L) + 101L)))
    // k=1 is the identity: checksum = plain sample sum
    val (n1, cs1) = MultimodalOps.resampleChecksum(Array[Short](-5, 3, 7), 1)
    assert((n1, cs1) === ((3L, 5L)))
  }

  test("audio resample ladder matches generator arithmetic for every asset (q148)") {
    val dir = "/root/testdata/sf0.001"
    val rows = MultimodalOps.audioResample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val docIds = graft.tables.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    // independent twin from the byte formula (never touches the codec)
    val expected = (for {
      id <- docIds if id % 3 == 0
      tgt <- MultimodalOps.ResampleTargets
    } yield {
      val c = (id * 97) % 256
      val nIn = (100 + id % 50).toInt * 160
      val k = 8000 / tgt
      val nOut = nIn / k
      val cs = (0 until nOut).map { j =>
        (0 until k).map(t => (c + j * k + t) % 256).sum / k - 128L
      }.sum
      (id, 8000L, tgt.toLong, nIn.toLong, nOut.toLong, cs)
    }).toSet
    assert(rows.toSet === expected)
  }

  test("phash ingest gate agrees with a brute-force probe of the corpus index (q139)") {
    val dir = "/root/testdata/sf0.001"
    val got = MultimodalOps.phashIngestGate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val hashes = MultimodalOps.phashGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mod = graft.dedup.DedupOps.IngestMod
    val (batch, corpus) = hashes.partition(_._1 % mod == mod - 1)
    val corpusCls = corpus.groupBy(h => (h._2, h._3))
      .map { case (k, v) => k -> v.map(_._1).min }
    val expected = batch.map { case (id, hi, lo) =>
      val matches = corpusCls.toSeq.flatMap { case ((chi, clo), crep) =>
        val d = java.lang.Long.bitCount(hi ^ chi) + java.lang.Long.bitCount(lo ^ clo)
        if (d <= MultimodalOps.PHashHamming) Some((d.toLong, crep)) else None
      }
      if (matches.isEmpty) id -> ((0L, -1L, -1L))
      else { val (d, rep) = matches.min; id -> ((1L, rep, d)) }
    }.toMap
    assert(got === expected)
    assert(got.values.exists(_._1 == 1L), "the corpus should catch some batch dups")
    assert(got.values.exists(_._1 == 0L), "some batch images should be novel")
  }

  test("training manifest: one row per doc, verdicts re-derive from the stage operators (q140)") {
    val dir = "/root/testdata/sf0.001"
    val rows = MultimodalOps.trainingManifest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(5), r.getString(6), r.getLong(8)))
    val nDocs = graft.tables.Tables.documents(spark, dir).count()
    assert(rows.length.toLong === nDocs)
    // sample_ok is exactly canonical AND quality-kept, and both
    // verdict populations are non-trivial on this corpus
    rows.foreach { case (_, canon, qkeep, _, ok) =>
      assert(ok === (if (canon == 1L && qkeep == 1L) 1L else 0L))
    }
    assert(rows.exists(_._5 == 1L) && rows.exists(_._5 == 0L))
    // kind agrees with the asset generator's id rule
    rows.foreach { case (id, _, _, kind, _) =>
      assert(kind === (if (id % 3 != 0) "image" else "audio"))
    }
  }

  test("frame sampling emits every stride-th frame index") {
    val sampled = MultimodalOps.frameSample(decoded, stride = 10)
    val perAsset = sampled.groupBy("asset_id").count()
    val joined = decoded.filter(col("n_frames") > 1)
      .join(perAsset, "asset_id")
      .selectExpr("n_frames", "count").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val expect = (r.getAs[Int]("n_frames") + 9) / 10
      assert(r.getAs[Long]("count") === expect)
    }
  }
}
