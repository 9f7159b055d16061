package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-corpus matrix for every binary parser: ≥3 malformed
  * classes per codec, each of which must route to dead-letter through
  * [[SafeDecode]] (a `Left` with the codec tag) — never an uncaught
  * throw, never a runaway allocation, never a silent misparse. The
  * happy-path control rows prove the guard passes valid payloads
  * through untouched. */
class CodecFuzzSpec extends AnyFunSuite {

  private val pixels = Array.tabulate[Byte](8 * 6 * 3)(i => (i % 251).toByte)
  private val goodPpm = Ppm.encode(8, 6, pixels)
  private val goodPng = Png.encode(8, 6, pixels)
  private val goodJpg = Jpeg.encode(8, 6, pixels)
  private val goodWav = Wav.encode(8000, Array.tabulate[Short](64)(i => (i * 7).toShort))

  private def str(s: String) = s.getBytes("US-ASCII")

  private def assertDeadLetter(codec: String, label: String)(body: => Any): Unit = {
    val r = SafeDecode(codec)(body)
    assert(r.isLeft, s"$codec/$label: malformed payload decoded as ${r}")
    assert(r.swap.toOption.get.startsWith(s"$codec: "), s"$codec/$label: untagged reason")
  }

  // ------------------------------------------------------------------ PPM

  test("PPM fuzz matrix: overflow, comment bomb, truncation, bad magic, wide maxval") {
    // 1. dimension overflow: must reject while PARSING the integer,
    //    before w*h*3 wraps Int and sizes a bogus allocation
    assertDeadLetter("ppm", "dim-overflow") {
      Ppm.decode(str("P6 99999999999 99999999999 255 ") ++ pixels)
    }
    // 2a. comment bomb: a multi-megabyte comment must terminate
    //     (linear skip), then reject at EOF — bounded time, no hang
    val bomb = str("P6 ") ++ Array.fill[Byte](2 << 20)('#')
    val t0 = System.nanoTime()
    assertDeadLetter("ppm", "comment-bomb")(Ppm.decode(bomb))
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "comment bomb not linear")
    // 2b. EOF inside a comment that swallowed the whole header
    assertDeadLetter("ppm", "eof-in-comment") {
      Ppm.decode(str("P6 #this comment never ends"))
    }
    // 3. truncated raster
    assertDeadLetter("ppm", "truncated-raster") {
      Ppm.decode(java.util.Arrays.copyOf(goodPpm, goodPpm.length - 7))
    }
    // 4. wrong magic (P5 greyscale is not supported)
    assertDeadLetter("ppm", "bad-magic") {
      Ppm.decode(str("P5 8 6 255 ") ++ pixels)
    }
    // 5. 2-byte-per-sample maxval
    assertDeadLetter("ppm", "wide-maxval") {
      Ppm.decode(str("P6 8 6 65535 ") ++ pixels)
    }
    // control: the valid payload still decodes
    val img = SafeDecode("ppm")(Ppm.decode(goodPpm))
    assert(img.toOption.get.pixels.toSeq === pixels.toSeq)
  }

  // ------------------------------------------------------------------ WAV

  test("WAV fuzz matrix: lying chunk sizes, short fmt, zero channels, missing data") {
    def patchLE32(b: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val c = b.clone()
      c(off) = (v & 0xff).toByte; c(off + 1) = ((v >> 8) & 0xff).toByte
      c(off + 2) = ((v >> 16) & 0xff).toByte; c(off + 3) = ((v >> 24) & 0xff).toByte
      c
    }
    // 1. data chunk claims more bytes than the buffer holds
    assertDeadLetter("wav", "chunk-overrun") {
      Wav.decode(patchLE32(goodWav, 40, 1 << 20))
    }
    // 2. negative chunk length (0x80000000)
    assertDeadLetter("wav", "negative-length") {
      Wav.decode(patchLE32(goodWav, 40, 0x80000000))
    }
    // 3. fmt chunk too short to hold its fixed fields — would
    //    otherwise read the NEXT chunk's bytes as fmt fields
    assertDeadLetter("wav", "short-fmt") {
      Wav.decode(patchLE32(goodWav, 16, 8))
    }
    // 4. zero channels (fmt fields lie)
    val zeroCh = goodWav.clone(); zeroCh(22) = 0; zeroCh(23) = 0
    assertDeadLetter("wav", "zero-channels")(Wav.decode(zeroCh))
    // 5. data chunk renamed away: no data at all
    val noData = goodWav.clone()
    System.arraycopy(str("junk"), 0, noData, 36, 4)
    assertDeadLetter("wav", "missing-data")(Wav.decode(noData))
    // 6. RIFF magic but not WAVE
    val notWave = goodWav.clone()
    System.arraycopy(str("AVI "), 0, notWave, 8, 4)
    assertDeadLetter("wav", "not-wave")(Wav.decode(notWave))
    // control
    assert(SafeDecode("wav")(Wav.decode(goodWav)).toOption.get.samples.length === 64)
  }

  // ------------------------------------------------------------------ PNG

  test("PNG fuzz matrix: CRC corruption, truncation, lying lengths, bad signature") {
    // 1. CRC corruption: flip one byte of the IDAT chunk's CRC trailer
    //    (ImageIO alone would NOT catch this — our verifyChunks does)
    val crcFlip = goodPng.clone()
    crcFlip(goodPng.length - 13) = (crcFlip(goodPng.length - 13) ^ 0x40).toByte
    assertDeadLetter("png", "crc-corrupt")(Png.decode(crcFlip))
    // 2. payload corruption INSIDE a chunk (deflate bytes) — the CRC
    //    pass catches the mismatch without inflating anything
    val dataFlip = goodPng.clone()
    dataFlip(60) = (dataFlip(60) ^ 0x11).toByte
    assertDeadLetter("png", "data-corrupt")(Png.decode(dataFlip))
    // 3. truncated mid-chunk
    assertDeadLetter("png", "truncated") {
      Png.decode(java.util.Arrays.copyOf(goodPng, goodPng.length / 2))
    }
    // 4. chunk length lies beyond EOF
    val lenLie = goodPng.clone()
    lenLie(8) = 0x7f.toByte // IHDR declared length becomes huge
    assertDeadLetter("png", "length-lie")(Png.decode(lenLie))
    // 5. bad signature
    assertDeadLetter("png", "bad-signature") {
      Png.decode(str("NOTAPNG") ++ goodPng)
    }
    // control
    assert(SafeDecode("png")(Png.decode(goodPng)).toOption.get.pixels.toSeq === pixels.toSeq)
  }

  // ----------------------------------------------------------------- JPEG

  test("JPEG fuzz matrix: truncation, EOI-before-frame, segment overrun, no SOF") {
    // 1. truncated payload (the q150 dead-letter class)
    assertDeadLetter("jpeg", "truncated") {
      Jpeg.parseHeader(java.util.Arrays.copyOf(goodJpg, 20))
    }
    // 2. EOI immediately after SOI: well-formed markers, no frame
    assertDeadLetter("jpeg", "eoi-before-frame") {
      Jpeg.parseHeader(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
    }
    // 3. segment length overruns the buffer
    assertDeadLetter("jpeg", "segment-overrun") {
      Jpeg.parseHeader(Array(0xff, 0xd8, 0xff, 0xe0, 0x7f, 0xff).map(_.toByte))
    }
    // 4. marker stream ends with no SOF ever seen
    assertDeadLetter("jpeg", "no-frame-header") {
      Jpeg.parseHeader(Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00).map(_.toByte))
    }
    // 5. garbage where a marker should be
    assertDeadLetter("jpeg", "bad-marker") {
      Jpeg.parseHeader(Array(0xff, 0xd8, 0x12, 0x34).map(_.toByte))
    }
    // control: header walker and ImageIO agree on the valid payload
    val hd = SafeDecode("jpeg")(Jpeg.parseHeader(goodJpg)).toOption.get
    assert(hd.width === 8 && hd.height === 6)
  }

  // ------------------------------------------------- pipeline integration

  test("dead-lettered assets classify, never poison the batch (q150 contract)") {
    // the full malformed matrix routed through the SAME guard the
    // query uses: every entry becomes a Left, the good asset a Right —
    // so a mapPartitions decode pass over a mixed batch always
    // completes with per-row verdicts
    val batch: Seq[(String, Array[Byte])] = Seq(
      "good" -> goodJpg,
      "trunc" -> java.util.Arrays.copyOf(goodJpg, 20),
      "eoi" -> Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte),
      "junk" -> str("not an image at all"))
    val verdicts = batch.map { case (k, b) =>
      k -> SafeDecode("jpeg")(Jpeg.decode(b)).fold(_ => "dead_letter", _ => "ok")
    }.toMap
    assert(verdicts === Map("good" -> "ok", "trunc" -> "dead_letter",
      "eoi" -> "dead_letter", "junk" -> "dead_letter"))
  }
}
