package graft.operators

import graft.operators.MultimodalQueries.{PerceptualHash, PixelCodec, WavCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level tests for the real multimodal codecs (mm05/mm06) — the
  * properties the oracle can't see directly: exact per-pixel/-sample
  * round trips (not just aggregate sums), corruption detection, and
  * the container edge cases (PNG filter reconstruction, RIFF pad
  * bytes, BMP row padding at non-multiple-of-4 widths).
  */
class CodecSpec extends AnyFunSuite {

  private val px: PixelCodec.PxFn = (x, y) =>
    ((x * 31 + y * 7) % 256, (x * 3 + y * 13) % 256, (x * 17 + y * 29) % 256)

  private def collect(decode: ((Int, Int, Int, Int, Int) => Unit) => (Long, Long))
      : (Long, Long, Map[(Int, Int), (Int, Int, Int)]) = {
    val m = scala.collection.mutable.Map.empty[(Int, Int), (Int, Int, Int)]
    val (w, h) = decode((x, y, r, g, b) => m((x, y)) = (r, g, b))
    (w, h, m.toMap)
  }

  test("BMP round trip is pixel-exact, including padded odd widths") {
    for (w <- Seq(1, 2, 3, 4, 5, 7, 8); h <- Seq(1, 2, 3)) {
      val bytes = PixelCodec.encodeBmp(w, h, px)
      // stride padding: 3w rounded up to 4
      assert(bytes.length == 54 + ((3 * w + 3) & ~3) * h)
      val (dw, dh, m) = collect(PixelCodec.decodeBmp(bytes, _))
      assert((dw, dh) == (w.toLong, h.toLong))
      for (x <- 0 until w; y <- 0 until h)
        assert(m((x, y)) == px(x, y), s"($x,$y) w=$w h=$h")
    }
  }

  test("PNG round trip is pixel-exact through zlib + Sub-filter reconstruction") {
    for ((w, h) <- Seq((1, 1), (3, 5), (16, 9), (31, 4))) {
      val bytes = PixelCodec.encodePng(w, h, px)
      val (dw, dh, m) = collect(PixelCodec.decodePng(bytes, _))
      assert((dw, dh) == (w.toLong, h.toLong))
      for (x <- 0 until w; y <- 0 until h)
        assert(m((x, y)) == px(x, y), s"($x,$y) w=$w h=$h")
    }
  }

  test("PNG decoder reconstructs ALL five spec filters (hand-built stream)") {
    // one 4-wide, 5-row RGB image, rows filtered 0..4 by hand; the
    // decoder must invert each per the spec's recon definitions
    val w = 4; val h = 5
    val want = Array.tabulate(h, w)((y, x) => px(x, y))
    def flat(y: Int): Array[Int] =
      want(y).flatMap { case (r, g, b) => Array(r, g, b) }
    val raw = new java.io.ByteArrayOutputStream
    for (y <- 0 until h) {
      val cur = flat(y)
      val up = if (y == 0) new Array[Int](3 * w) else flat(y - 1)
      raw.write(y) // filter type = row index
      for (i <- 0 until 3 * w) {
        val a = if (i >= 3) cur(i - 3) else 0
        val b = up(i)
        val c = if (i >= 3) up(i - 3) else 0
        val enc = y match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - b
          case 3 => cur(i) - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            cur(i) - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw.write(enc & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater
    defl.setInput(raw.toByteArray); defl.finish()
    val out = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, body: Array[Byte]) = {
      val t = tag.getBytes("US-ASCII")
      val c = new java.util.zip.CRC32; c.update(t); c.update(body)
      be32(body.length) ++ t ++ body ++ be32(c.getValue.toInt)
    }
    val png = MultimodalQueries.ImgCodec.PngSig ++
      chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", out.toByteArray) ++ chunk("IEND", Array.empty)
    val (dw, dh, m) = collect(PixelCodec.decodePng(png, _))
    assert((dw, dh) == (w.toLong, h.toLong))
    for (x <- 0 until w; y <- 0 until h)
      assert(m((x, y)) == want(y)(x), s"filter row $y, x=$x")
  }

  test("PNG decoder rejects a corrupted chunk (CRC mismatch)") {
    val bytes = PixelCodec.encodePng(8, 8, px)
    bytes(40) = (bytes(40) ^ 0x01).toByte // flip a bit inside IDAT
    assertThrows[IllegalArgumentException] {
      PixelCodec.decodePng(bytes, (_, _, _, _, _) => ())
    }
  }

  test("BMP orientation: wsum over y is NOT flip-invariant (the mm05 canary works)") {
    // an asymmetric gradient: if bottom-up rows were read top-down the
    // y-weighted sum must change
    val grad: PixelCodec.PxFn = (_, y) => (y % 256, 0, 0)
    var wsum = 0L
    PixelCodec.decodeBmp(PixelCodec.encodeBmp(4, 6, grad),
      (_, y, r, _, _) => wsum += y.toLong * r)
    // Σ y·y over 4 columns = 4 · (0+1+4+9+16+25)
    assert(wsum == 4L * 55)
  }

  test("WAV round trip: rate, count and samples exact; odd chunk padded past") {
    val samples = Array.tabulate(373)(i => ((i * 977) % 65536 - 32768).toShort)
    val st = WavCodec.stats(7L, WavCodec.encode(16000, samples))
    assert(st.sample_rate == 16000L)
    assert(st.n_samples == 373L)
    assert(st.duration_ms == 373L * 1000 / 16000)
    assert(st.sum_s == samples.map(_.toLong).sum)
    assert(st.min_s == samples.map(_.toLong).min)
    assert(st.max_s == samples.map(_.toLong).max)
    assert(st.sum_abs == samples.map(s => math.abs(s.toLong)).sum)
    assert(st.n_clipped == samples.count(s => math.abs(s.toInt) >= 30000).toLong)
  }

  test("WAV decoder rejects non-PCM and truncated containers") {
    val ok = WavCodec.encode(8000, Array.tabulate(16)(_.toShort))
    val nonPcm = ok.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float
    assertThrows[IllegalArgumentException] {
      WavCodec.stats(0L, nonPcm)
    }
    assertThrows[IllegalArgumentException] {
      WavCodec.stats(0L, "RIFX????".getBytes("US-ASCII"))
    }
  }

  // ---- PerceptualHash (mm07): the properties the oracle can't see ----

  /** mm07's fixture shape: pattern value sampled at the pooled cell. */
  private def patternPx(w: Int, h: Int, p: Long): PixelCodec.PxFn = (x, y) => {
    val cx = x * 9 / w
    val cy = y * 8 / h
    (((cx * 31 + cy * 17 + p * 53) % 256).toInt,
      ((cx * 13 + cy * 29 + p * 71) % 256).toInt,
      ((cx * 37 + cy * 11 + p * 89) % 256).toInt)
  }

  test("dHash is resolution- and container-invariant for pooled-cell patterns") {
    val a = PerceptualHash.dhash(PixelCodec.encodeBmp(9, 8, patternPx(9, 8, 3)))
    val b = PerceptualHash.dhash(PixelCodec.encodePng(31, 22, patternPx(31, 22, 3)))
    val c = PerceptualHash.dhash(PixelCodec.encodeBmp(17, 15, patternPx(17, 15, 3)))
    assert(a._3.length == 64 && a._3.forall(ch => ch == '0' || ch == '1'))
    assert(a._3 == b._3, "BMP 9x8 vs PNG 31x22, same pattern")
    assert(a._3 == c._3, "BMP 9x8 vs BMP 17x15, same pattern")
    assert((a._1, a._2) == (9L, 8L) && (b._1, b._2) == (31L, 22L))
  }

  test("dHash separates the fixture's 7 patterns and flips on a one-cell edit") {
    val hashes = (0L until 7L).map(p =>
      PerceptualHash.dhash(PixelCodec.encodeBmp(20, 12, patternPx(20, 12, p)))._3)
    assert(hashes.distinct.size == 7, "pattern collision in the fixture formula")
    // brighten one interior cell enough to flip its two horizontal
    // gradient comparisons: a perceptual CHANGE, not a re-encode
    val base = patternPx(20, 12, 3)
    val edited: PixelCodec.PxFn = (x, y) =>
      if (x * 9 / 20 == 4 && y * 8 / 12 == 4) (255, 255, 255) else base(x, y)
    val h0 = PerceptualHash.dhash(PixelCodec.encodeBmp(20, 12, base))._3
    val h1 = PerceptualHash.dhash(PixelCodec.encodeBmp(20, 12, edited))._3
    assert(h0 != h1, "a visible edit must change the hash")
    assert(h0.zip(h1).count { case (x, y) => x != y } <= 3,
      "a one-cell edit must stay a NEAR duplicate (small hamming distance)")
  }

  test("Y4M round trip: header geometry, frame count, sampled luma stats exact") {
    import graft.operators.MultimodalQueries.Y4mCodec
    val w = 10; val h = 6; val nf = 7
    def lum(f: Int, x: Int, y: Int) = (x * 5 + y * 3 + f * 11) % 256
    val p = Y4mCodec.encode(w, h, 25, 1, nf,
      (f, x, y) => (lum(f, x, y), 128, 64))
    val st = Y4mCodec.stats(42L, p)
    assert((st.width, st.height, st.n_frames, st.fps_num) == (10L, 6L, 7L, 25L))
    assert(st.duration_ms == nf * 1000L / 25L)
    // recompute sampled (f % 3 == 0) luma stats directly
    val vals = for (f <- 0 until nf if f % 3 == 0; y <- 0 until h; x <- 0 until w)
      yield lum(f, x, y).toLong
    assert(st.n_sampled == 3L && st.sum_y == vals.sum &&
      st.min_y == vals.min && st.max_y == vals.max)
  }

  test("Y4M decoder rejects wrong magic, non-444 planes, and torn frame markers") {
    import graft.operators.MultimodalQueries.Y4mCodec
    val good = Y4mCodec.encode(4, 4, 24, 1, 2, (_, _, _) => (1, 2, 3))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[Exception](Y4mCodec.stats(1L, badMagic))
    val c420 = new String(good, "ISO-8859-1")
      .replace("C444", "C420").getBytes("ISO-8859-1")
    intercept[Exception](Y4mCodec.stats(1L, c420))
    val torn = good.clone()
    val fm = new String(good, "ISO-8859-1").indexOf("FRAME")
    torn(fm) = 'G'.toByte
    intercept[Exception](Y4mCodec.stats(1L, torn))
  }
}
