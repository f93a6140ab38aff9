package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Vp8l
import graft.pipeline.Vp8lEncoder._

/** Encoder/decoder roundtrips for the from-scratch VP8L codec — each
  * test exercises a distinct decoder path (prefix-code families, color
  * cache, LZ77 direct + 2D-mapped distances, the four transforms). */
class Vp8lSpec extends AnyFunSuite {

  private def rt(w: Int, h: Int, px: Array[Int], bytes: Array[Byte],
                 label: String): Unit = {
    val Some((dw, dh, got)) = Vp8l.decode(bytes)
    assert(dw === w && dh === h, s"$label dims")
    assert(got.toSeq === px.toSeq, label)
  }

  private def grayPx(w: Int, h: Int)(v: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val p = v(i % w, i / w) & 0xff
      0xff000000 | (p << 16) | (p << 8) | p
    }

  test("literal-only roundtrip (code-length-coded prefix codes)") {
    val (w, h) = (16, 13)
    val px = grayPx(w, h)((x, y) => (x * 17 + y * 31) % 251)
    rt(w, h, px, encode(w, h, px), "literals")
  }

  test("full-color roundtrip with varying alpha") {
    val (w, h) = (9, 7)
    val px = Array.tabulate(w * h) { i =>
      (((i * 37 + 11) % 256) << 24) | (((i * 53) % 256) << 16) |
        (((i * 101 + 3) % 256) << 8) | ((i * 29 + 200) % 256)
    }
    rt(w, h, px, encode(w, h, px), "argb literals")
  }

  test("subtract-green transform roundtrip") {
    val (w, h) = (12, 12)
    val px = Array.tabulate(w * h) { i =>
      0xff000000 | (((i * 3) % 256) << 16) | (((i * 7) % 256) << 8) | ((i * 11) % 256)
    }
    rt(w, h, px, encode(w, h, px, subtractGreen = true), "subtract-green")
  }

  test("color cache + LZ77 with DIRECT distance (plane > 120)") {
    val (w, h) = (20, 10)
    // long runs + a small recurring palette: exercises copies and cache hits
    val px = Array.tabulate(w * h) { i =>
      val v = Array(10, 10, 10, 10, 200, 10, 10, 10, 10, 90)((i / 4) % 10)
      0xff000000 | (v << 16) | (v << 8) | v
    }
    rt(w, h, px, encode(w, h, px, cacheBits = 4, useLz = true,
      planeForDist1 = 121), "cache+lz direct")
  }

  test("LZ77 with 2D-MAPPED distance: plane code 2 = offset (1,0) = distance 1") {
    val (w, h) = (20, 10)
    val px = Array.tabulate(w * h) { i =>
      val v = if ((i / 16) % 2 == 0) 40 else 220
      0xff000000 | (v << 16) | (v << 8) | v
    }
    rt(w, h, px, encode(w, h, px, useLz = true, planeForDist1 = 2),
      "lz mapped dist1")
  }

  test("LZ77 with 2D-MAPPED distance: plane code 1 = offset (0,1) = distance w") {
    val (w, h) = (14, 9)
    val row = Array.tabulate(w)(x => 0xff000000 | ((x * 19 % 256) << 16) |
      ((x * 19 % 256) << 8) | (x * 19 % 256))
    val px = Array.tabulate(w * h)(i => row(i % w))
    // hand-built op stream: first row literal, then ONE copy of (h-1)*w
    // pixels at plane code 1 (the decoder must map it to dist = w)
    val ops = row.map(p =>
      Lit(p >>> 24, (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)).toSeq :+
      Copy((h - 1) * w, 1)
    val bw = new BitWriter
    bw.writeBits(0x2f, 8); bw.writeBits(w - 1, 14); bw.writeBits(h - 1, 14)
    bw.writeBit(0); bw.writeBits(0, 3)
    bw.writeBit(0) // no transforms
    val (g, r, b, a, d) = codesFor(ops, 0)
    bw.writeBit(0) // no cache
    bw.writeBit(0) // no meta
    writePrefixCode(bw, g); writePrefixCode(bw, r); writePrefixCode(bw, b)
    writePrefixCode(bw, a); writePrefixCode(bw, d)
    ops.foreach {
      case Lit(aa, rr, gg, bb) =>
        g.write(bw, gg); r.write(bw, rr); b.write(bw, bb); a.write(bw, aa)
      case Copy(len, plane) =>
        val (lc, lev, leb) = lz77CodeOf(len)
        g.write(bw, 256 + lc); if (leb > 0) bw.writeBits(lev, leb)
        val (dc, dev, deb) = lz77CodeOf(plane)
        d.write(bw, dc); if (deb > 0) bw.writeBits(dev, deb)
      case CacheRef(i) => g.write(bw, 256 + 24 + i)
    }
    rt(w, h, px, riff(bw.result()), "lz mapped distW")
  }

  test("predictor transform roundtrip (uniform L mode over 4x4 blocks)") {
    val (w, h) = (11, 6)
    val px = grayPx(w, h)((x, y) => (x * 23 + y * 5) % 256)
    rt(w, h, px, encode(w, h, px, predictorMode = 1), "predictor L")
    rt(w, h, px, encode(w, h, px, predictorMode = 2), "predictor T")
    rt(w, h, px, encode(w, h, px, predictorMode = 0), "predictor black")
  }

  test("palette (color indexing) roundtrip with sub-byte bundling") {
    val palette = Array(0xff102030, 0xff405060, 0xff708090, 0xffa0b0c0)
    val (w, h) = (13, 5) // 4 colors -> 2 bits/idx, 4 idx per coded pixel
    val px = Array.tabulate(w * h)(i => palette((i * 7 + i / w) % 4))
    rt(w, h, px, encode(w, h, px, palette = palette), "palette4")
    val pal16 = Array.tabulate(16)(i => 0xff000000 | (i * 16 << 8) | i)
    val px16 = Array.tabulate(w * h)(i => pal16((i * 11 + 3) % 16))
    rt(w, h, px16, encode(w, h, px16, palette = pal16), "palette16")
  }

  test("container: lossy VP8 returns None; garbage returns None; truncated throws inside gate") {
    val lossy = "RIFF".getBytes ++ Array[Byte](20, 0, 0, 0) ++ "WEBP".getBytes ++
      "VP8 ".getBytes ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    assert(Vp8l.decode(lossy).isEmpty, "lossy VP8 has no VP8L chunk")
    assert(Vp8l.decode("not webp at all".getBytes).isEmpty)
    // a truncated STREAM inside a well-formed RIFF must throw from the
    // bit-reader overrun guard (the caller gates with try/None), never
    // return wrong pixels silently
    val goodStream = {
      val full = encode(4, 4, grayPx(4, 4)((x, y) => x * 60 + y))
      val Some((off, len)) = Vp8l.findVp8lChunk(full)
      full.slice(off, off + len)
    }
    intercept[Exception] {
      Vp8l.decode(riff(goodStream.dropRight(3))).map(_._3.toSeq)
    }
  }

  test("duplicate transform type is rejected (spec: each at most once)") {
    val bw = new BitWriter
    bw.writeBits(0x2f, 8); bw.writeBits(3, 14); bw.writeBits(3, 14)
    bw.writeBit(0); bw.writeBits(0, 3)
    bw.writeBit(1); bw.writeBits(2, 2) // subtract-green
    bw.writeBit(1); bw.writeBits(2, 2) // subtract-green AGAIN
    val ex = intercept[IllegalArgumentException] {
      Vp8l.decode(riff(bw.result()))
    }
    assert(ex.getMessage.contains("duplicate transform"))
  }

  test("single-color image: single-symbol codes cost zero bits") {
    val (w, h) = (8, 8)
    val px = Array.fill(w * h)(0xff336699)
    rt(w, h, px, encode(w, h, px), "constant image")
  }
}
