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

  // ---------------------------------------------------------- r17: ADVICE
  // fixes + real-encoder conformance (fixtures produced by the system
  // libwebp 1.2.4 via tools/make_webp_fixtures.py)

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webp/$name")
    assert(in != null, s"missing test resource webp/$name")
    try in.readAllBytes() finally in.close()
  }

  /** .argb fixture layout: BE int32 w, h, then w*h BE packed-ARGB ints. */
  private def readArgb(name: String): (Int, Int, Array[Int]) = {
    val b = java.nio.ByteBuffer.wrap(resource(name))
    val w = b.getInt; val h = b.getInt
    val px = Array.fill(w * h)(b.getInt)
    (w, h, px)
  }

  test("distance map equals libwebp's 120-entry plane-code table byte-for-byte") {
    // Fixture extracted from the Debian libwebp7 1.2.4 shared object
    // (the real decoder's kCodeToPlane): each entry packs an offset as
    // (y << 4) | (8 - x). The generated map must reproduce it exactly —
    // this is the external conformance the r16 provenance note lacked.
    val expected = resource("vp8l_code_to_plane.bin")
    assert(expected.length === 120)
    val packed = Vp8l.distanceMap.map { case (x, y) => ((y << 4) | (8 - x)).toByte }
    assert(packed.toSeq === expected.toSeq)
    // spot anchors from the spec: code 1 = (0,1), code 2 = (1,0),
    // code 97 = (8,0) (the r16 advisor's counterexample), code 120 = (8,7)
    assert(Vp8l.distanceMap(0) === ((0, 1)))
    assert(Vp8l.distanceMap(1) === ((1, 0)))
    assert(Vp8l.distanceMap(96) === ((8, 0)))
    assert(Vp8l.distanceMap(119) === ((8, 7)))
  }

  test("Select predictor ties go to T (spec: pL < pT ? L : T)") {
    val l = 0x0a000000; val t = 0x000a0000; val tl = 0x00000000
    assert(Vp8l.selectPredict(l, t, tl) === t, "tie must predict T")
    // non-tie sanity in each direction: with TL=0, pL = sum of T's
    // channels and pT = sum of L's channels — the side closer to the
    // gradient wins, i.e. the SMALLER opposing sum
    assert(Vp8l.selectPredict(0x0a000000, 0x00050000, 0) === 0x0a000000, "pL=5 < pT=10: L")
    assert(Vp8l.selectPredict(0x05000000, 0x000a0000, 0) === 0x000a0000, "pT=5 < pL=10: T")
  }

  test("uniform run longer than 4096 pixels splits into spec-max copies") {
    val (w, h) = (70, 70) // 4900-pixel run: one Copy would alias past code 23
    val px = Array.fill(w * h)(0xff2255aa)
    rt(w, h, px, encode(w, h, px, useLz = true), "long uniform run, no cache")
    rt(w, h, px, encode(w, h, px, useLz = true, cacheBits = 4), "long uniform run, cache")
  }

  test("crafted chunk size near 2^31 is rejected cleanly (no Int overflow)") {
    val hdr = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0x7f.toByte) ++ "WEBP".getBytes ++
      "VP8L".getBytes ++ Array[Byte](0xf0.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte) ++
      Array.fill[Byte](64)(0)
    assert(Vp8l.findVp8lChunk(hdr).isEmpty, "oversize chunk must be a clean None")
  }

  test("real libwebp lossless fixtures decode pixel-exactly") {
    for (name <- Seq("lossless_gradient", "lossless_photo",
                     "lossless_palette", "lossless_alpha")) {
      val (w, h, want) = readArgb(s"$name.argb")
      val got = Vp8l.decode(resource(s"$name.webp"))
      assert(got.isDefined, s"$name: no VP8L chunk found")
      val (dw, dh, px) = got.get
      assert(dw === w && dh === h, s"$name dims")
      assert(px.toSeq === want.toSeq, s"$name pixels")
    }
  }

  test("real lossy fixtures: VP8 simple container and VP8X extended container both walk to None") {
    // lossy_gradient.webp: libwebp-encoded simple lossy (RIFF + VP8 chunk);
    // python_vp8x_lossy.webp: CPython's test fixture — a genuine extended
    // VP8X + VP8 layout from a real-world encoder.
    for (name <- Seq("lossy_gradient.webp", "python_vp8x_lossy.webp")) {
      val bytes = resource(name)
      assert(Vp8l.findVp8lChunk(bytes).isEmpty, s"$name: must have no VP8L chunk")
      assert(Vp8l.decode(bytes).isEmpty, s"$name: lossy must decode to None")
    }
  }
}
