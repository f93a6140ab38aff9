package graft.pipeline

/** Pure-JVM WebP-LOSSLESS (VP8L) decoder — closes the r15 verdict's
  * "majority-WebP crawl corpus decodes ~0% under stock ImageIO" gap for
  * the lossless half of the format (lossy VP8 needs a full video codec
  * and stays undecodable; [[Multimodal.imageDecodeReport]] counts both).
  *
  * Implemented from the public VP8L bitstream specification (RFC 9649 /
  * the WebP lossless format spec, Alakuijala 2012): RIFF/VP8X container
  * walk, LSB-first bit reader, simple and code-length-coded canonical
  * prefix codes (single-symbol codes are zero-cost, the reference
  * decoder's behavior), optional meta-prefix entropy image, color cache
  * (hash 0x1e35a7bd >> (32-bits)), LZ77 backward references with both
  * direct (plane code > 120) and 2D-mapped distances, and all four
  * transforms — predictor (14 modes), color (signed 3.5 fixed-point
  * cross-channel deltas), subtract-green, and color indexing (palette,
  * including sub-byte pixel bundling) — applied in reverse order.
  *
  * PROVENANCE NOTE (the MP2-filterbank discipline, SCALE.md): the
  * 120-entry 2D distance map is GENERATED from the spec's window and
  * ordering rule — exactly the offsets (x, y) with y in [0, 7], x in
  * [-7, 8], excluding y == 0 with x <= 0 (8 + 7·16 = 120, the full
  * window, no truncation), ordered by x² + y² then |x| ascending with
  * positive x before negative — rather than transcribed
  * digit-by-digit. An r16 advisor review found the previous window
  * (y ≤ 8, x ≥ -8, nearest-120 truncation) diverged from the spec
  * table at plane codes 97–120; Vp8lSpec now asserts the generated
  * table against the spec's published 120-entry table element by
  * element, and the encoder/decoder roundtrip suite exercises both the
  * mapped and the direct distance paths.
  *
  * Returns packed ARGB pixels (the [[Multimodal.lumaGrid]] contract).
  * Every malformed stream throws; callers gate with try/None. */
object Vp8l {

  /** Decode a WebP payload's VP8L chunk to (width, height, argb pixels).
    * None when the RIFF has no VP8L chunk (lossy VP8, or not WebP). */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    findVp8lChunk(bytes).map { case (off, len) => decodeStream(bytes, off, len) }

  /** Locate the VP8L chunk payload inside a RIFF WebP container (walks
    * top-level chunks, so VP8X-extended files work too). */
  private[graft] def findVp8lChunk(b: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def fourcc(i: Int) = new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b == null || b.length < 20 || fourcc(0) != "RIFF" || fourcc(8) != "WEBP") return None
    var p = 12
    while (p + 8 <= b.length) {
      val fc = fourcc(p)
      val sz = le32(p + 4)
      if (sz < 0 || p + 8L + sz > b.length) return None // Long: sz near 2^31 must not wrap
      if (fc == "VP8L") return Some((p + 8, sz))
      p += 8 + sz + (sz & 1) // chunks are 2-byte aligned
    }
    None
  }

  /** LSB-first bit reader over a byte range (the VP8L convention: bits
    * are consumed from the least-significant end of each byte). */
  private final class Br(b: Array[Byte], start: Int, len: Int) {
    private var pos = start
    private val end = start + len
    private var bit = 0
    def readBit(): Int = {
      require(pos < end, "VP8L: bitstream overrun")
      val v = (b(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  /** Canonical prefix code. lengths(sym) = code length (0 = absent).
    * Single-symbol codes cost zero bits (reference-decoder behavior). */
  private final class PrefixCode(lengths: Array[Int]) {
    private val present = lengths.indices.filter(lengths(_) > 0)
    require(present.nonEmpty, "VP8L: empty prefix code")
    private val single = if (present.length == 1) present.head else -1
    // canonical assignment: by length, then symbol order; decode walks a
    // (length, code-so-far) map — codes are at most 15 bits. Kraft sum
    // checked EXACTLY in units of 2^-15 (a non-complete code means a
    // corrupt stream or a decoder bug; fail loudly either way).
    private val table: java.util.HashMap[Integer, Integer] = {
      val m = new java.util.HashMap[Integer, Integer]()
      if (single < 0) {
        var code = 0
        var l = 1
        var kraft = 0L
        while (l <= 15) {
          present.foreach { s =>
            if (lengths(s) == l) {
              m.put((l << 16) | code, s)
              code += 1
              kraft += 1L << (15 - l)
            }
          }
          code <<= 1
          l += 1
        }
        require(kraft == (1L << 15), s"VP8L: prefix code not complete (kraft $kraft)")
      }
      m
    }
    def read(br: Br): Int = {
      if (single >= 0) return single
      var code = 0
      var l = 0
      while (l < 15) {
        code = (code << 1) | br.readBit()
        l += 1
        val s = table.get((l << 16) | code)
        if (s ne null) return s.intValue
      }
      throw new IllegalArgumentException("VP8L: bad prefix code in stream")
    }
  }

  /** Order in which code-length-code lengths are stored. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or code-length-coded) for `alphabet`
    * symbols. */
  private def readPrefixCode(br: Br, alphabet: Int): PrefixCode = {
    val lengths = new Array[Int](alphabet)
    if (br.readBit() == 1) { // simple
      val numSymbols = br.readBit() + 1
      val firstWide = br.readBit() // 1 => 8-bit first symbol
      val s0 = br.readBits(if (firstWide == 1) 8 else 1)
      require(s0 < alphabet, s"VP8L: simple symbol $s0 >= $alphabet")
      lengths(s0) = 1
      if (numSymbols == 2) {
        val s1 = br.readBits(8)
        require(s1 < alphabet && s1 != s0, s"VP8L: bad simple pair $s0/$s1")
        lengths(s1) = 1
      }
      new PrefixCode(lengths)
    } else {
      val numCl = 4 + br.readBits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = br.readBits(3); i += 1 }
      val clCode = new PrefixCode(clLengths)
      val maxSymbol =
        if (br.readBit() == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          val m = 2 + br.readBits(nbits)
          require(m <= alphabet, s"VP8L: max_symbol $m > $alphabet")
          m
        } else alphabet
      var sym = 0
      var prev = 8
      var budget = maxSymbol
      while (sym < alphabet && budget > 0) {
        budget -= 1
        val cl = clCode.read(br)
        cl match {
          case c if c < 16 =>
            lengths(sym) = c; sym += 1; if (c != 0) prev = c
          case 16 =>
            val rep = 3 + br.readBits(2)
            var j = 0
            while (j < rep && sym < alphabet) { lengths(sym) = prev; sym += 1; j += 1 }
          case 17 =>
            val rep = 3 + br.readBits(3)
            sym += rep
          case 18 =>
            val rep = 11 + br.readBits(7)
            sym += rep
        }
      }
      require(sym <= alphabet, "VP8L: code lengths overflow alphabet")
      new PrefixCode(lengths)
    }
  }

  /** One group of the five per-group codes. */
  private final case class Group(green: PrefixCode, red: PrefixCode,
                                 blue: PrefixCode, alpha: PrefixCode,
                                 dist: PrefixCode)

  private def readGroup(br: Br, cacheSize: Int): Group = Group(
    green = readPrefixCode(br, 256 + 24 + cacheSize),
    red = readPrefixCode(br, 256),
    blue = readPrefixCode(br, 256),
    alpha = readPrefixCode(br, 256),
    dist = readPrefixCode(br, 40))

  /** length/distance prefix value: codes 0-3 are 1-4; above, extra bits. */
  private def lz77Value(code: Int, br: Br): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.readBits(extra) + 1
    }

  /** 2D distance map for plane codes 1..120 — GENERATED from the spec's
    * ordering rule (see object scaladoc). */
  private[graft] lazy val distanceMap: Array[(Int, Int)] = {
    // The spec's window is exactly y in [0,7], x in [-7,8] with (x,y)
    // strictly after the current pixel in scan order (y==0 => x>=1):
    // 8 + 7*16 = 120 entries — the full window, no truncation. Ordered
    // by squared euclidean distance, then |x| ascending (equivalently y
    // descending at fixed distance), positive x before negative.
    val candidates = for {
      y <- 0 to 7
      x <- -7 to 8
      if !(y == 0 && x <= 0)
    } yield (x, y)
    val sorted = candidates.sortBy { case (x, y) =>
      (x * x + y * y, math.abs(x), if (x > 0) 0 else 1)
    }.toArray
    require(sorted.length == 120, s"VP8L distance map: ${sorted.length}")
    sorted
  }

  private def planeCodeToDistance(width: Int, plane: Int): Int =
    if (plane > 120) plane - 120
    else {
      val (x, y) = distanceMap(plane - 1)
      math.max(1, y * width + x)
    }

  private def cacheKey(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  /** Decode a spatially-coded image of w×h pixels (the shared machinery
    * of the main image, the entropy image, transform data, and the
    * palette). `allowMeta` is true only for the main image. */
  private def decodeEntropyImage(br: Br, w: Int, h: Int,
                                 allowMeta: Boolean): Array[Int] = {
    val cacheBits = if (br.readBit() == 1) {
      val c = br.readBits(4)
      require(c >= 1 && c <= 11, s"VP8L: cache bits $c")
      c
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    var metaBits = 0
    var metaImage: Array[Int] = null
    var nGroups = 1
    if (allowMeta && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      val mw = subSize(w, metaBits)
      val mh = subSize(h, metaBits)
      metaImage = decodeEntropyImage(br, mw, mh, allowMeta = false)
      metaImage.foreach { p =>
        val idx = (p >> 8) & 0xffff // meta index = (red << 8) | green
        if (idx + 1 > nGroups) nGroups = idx + 1
      }
    }
    val groups = Array.fill(nGroups)(readGroup(br, cacheSize))
    val out = new Array[Int](w * h)
    var pos = 0
    val n = w * h
    while (pos < n) {
      val x = pos % w
      val y = pos / w
      val g =
        if (metaImage == null) groups(0)
        else {
          val mp = metaImage((y >> metaBits) * subSize(w, metaBits) + (x >> metaBits))
          groups((mp >> 8) & 0xffff)
        }
      val s = g.green.read(br)
      if (s < 256) {
        val red = g.red.read(br)
        val blue = g.blue.read(br)
        val alpha = g.alpha.read(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        if (cache != null) cache(cacheKey(px, cacheBits)) = px
        pos += 1
      } else if (s < 256 + 24) {
        val length = lz77Value(s - 256, br)
        val distCode = g.dist.read(br)
        val dist = planeCodeToDistance(w, lz77Value(distCode, br))
        require(dist <= pos, s"VP8L: back-reference $dist past start at $pos")
        var j = 0
        while (j < length && pos < n) {
          val px = out(pos - dist)
          out(pos) = px
          if (cache != null) cache(cacheKey(px, cacheBits)) = px
          pos += 1
          j += 1
        }
      } else {
        require(cache != null, "VP8L: cache symbol without color cache")
        out(pos) = cache(s - 256 - 24)
        pos += 1
      }
    }
    out
  }

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Predictor mode 11 (Select): the one of L/T whose per-channel
    * Manhattan distance to the gradient L + T - TL is smaller; ties
    * predict T (spec: "pL < pT ? L : T"). */
  private[graft] def selectPredict(l: Int, t: Int, tl: Int): Int = {
    def comp(p: Int, sh: Int) = (p >>> sh) & 0xff
    var pl = 0; var pt = 0
    Seq(24, 16, 8, 0).foreach { sh =>
      val pred = comp(l, sh) + comp(t, sh) - comp(tl, sh)
      pl += math.abs(pred - comp(l, sh))
      pt += math.abs(pred - comp(t, sh))
    }
    if (pl < pt) l else t
  }

  // ------------------------------------------------------------ transforms

  private sealed trait Transform { def apply(px: Array[Int], w: Int, h: Int): (Array[Int], Int) }

  /** Predictor transform: block modes in the GREEN channel of a
    * subsampled image; inverse ADDS the prediction (per channel mod 256).
    * Spec edge rules: (0,0) predicts opaque black; rest of the top row
    * uses L; the left column uses T; top-right of the rightmost column
    * wraps to the LEFTMOST pixel of the same row as T would be — i.e.
    * out(y*w) of the PREVIOUS row's first pixel (the reference decoder's
    * wrap: TR at x = w-1 reads the pixel at (0, y), which in the row-major
    * scan is the first pixel of the current row, already decoded). */
  private final case class PredictorT(bits: Int, data: Array[Int]) extends Transform {
    def apply(px: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      val bw = subSize(w, bits)
      def addPx(a: Int, b: Int): Int = {
        val aa = ((a >>> 24) + (b >>> 24)) & 0xff
        val rr = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff
        val gg = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff
        val bb = ((a & 0xff) + (b & 0xff)) & 0xff
        (aa << 24) | (rr << 16) | (gg << 8) | bb
      }
      def avg2(a: Int, b: Int): Int = {
        val aa = (((a >>> 24) + (b >>> 24)) / 2) & 0xff
        val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2) & 0xff
        val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2) & 0xff
        val bb = (((a & 0xff) + (b & 0xff)) / 2) & 0xff
        (aa << 24) | (rr << 16) | (gg << 8) | bb
      }
      def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
      def select(l: Int, t: Int, tl: Int): Int = selectPredict(l, t, tl)
      def caf(l: Int, t: Int, tl: Int): Int = { // ClampAddSubtractFull
        def c(sh: Int) = clamp(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
        (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
      }
      def cah(l: Int, t: Int, tl: Int): Int = { // ClampAddSubtractHalf
        val a = avg2(l, t)
        def c(sh: Int) = {
          val av = (a >>> sh) & 0xff
          clamp(av + (av - ((tl >>> sh) & 0xff)) / 2)
        }
        (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
      }
      var pos = 0
      while (pos < w * h) {
        val x = pos % w; val y = pos / w
        val mode = (data((y >> bits) * bw + (x >> bits)) >> 8) & 0xff
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1)          // top row: L
          else if (x == 0) px(pos - w)          // left column: T
          else {
            val l = px(pos - 1)
            val t = px(pos - w)
            val tl = px(pos - w - 1)
            // pos-w+1 at x = w-1 is the FIRST pixel of the CURRENT row
            // (already decoded): the spec defines TR on the linear pixel
            // array, so the rightmost column's top-right wraps there
            val tr = px(pos - w + 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => caf(l, t, tl)
              case 13 => cah(l, t, tl)
              case m => throw new IllegalArgumentException(s"VP8L: predictor mode $m")
            }
          }
        px(pos) = addPx(px(pos), pred)
        pos += 1
      }
      (px, w)
    }
  }

  /** Color transform: per-block signed 3.5 fixed-point cross-channel
    * deltas (blue channel of the transform pixel = green_to_red, green =
    * green_to_blue, red = red_to_blue); inverse reconstructs red first,
    * then blue from the reconstructed red. */
  private final case class ColorT(bits: Int, data: Array[Int]) extends Transform {
    def apply(px: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      val bw = subSize(w, bits)
      def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
      var pos = 0
      while (pos < w * h) {
        val x = pos % w; val y = pos / w
        val cte = data((y >> bits) * bw + (x >> bits))
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val p = px(pos)
        val green = (p >> 8) & 0xff
        val red = (((p >> 16) & 0xff) + delta(g2r, green)) & 0xff
        val blue = ((p & 0xff) + delta(g2b, green) + delta(r2b, red)) & 0xff
        px(pos) = (p & 0xff000000) | (red << 16) | (green << 8) | blue
        pos += 1
      }
      (px, w)
    }
  }

  /** Subtract-green: inverse adds green back onto red and blue. */
  private case object SubtractGreenT extends Transform {
    def apply(px: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) + g) & 0xff
        val b = ((p & 0xff) + g) & 0xff
        px(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
      }
      (px, w)
    }
  }

  /** Color indexing: palette lookup by the GREEN channel; palettes of
    * <= 16 colors bundle multiple sub-pixels per coded pixel. */
  private final case class PaletteT(palette: Array[Int], widthBits: Int,
                                    fullWidth: Int) extends Transform {
    def apply(px: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      val out = new Array[Int](fullWidth * h)
      val perPixel = 1 << widthBits
      val idxBits = 8 >> widthBits
      val mask = (1 << idxBits) - 1
      var y = 0
      while (y < h) {
        var ox = 0
        var cx = 0
        while (ox < fullWidth) {
          val packed = (px(y * w + cx) >> 8) & 0xff
          var k = 0
          while (k < perPixel && ox < fullWidth) {
            val idx = (packed >> (k * idxBits)) & mask
            require(idx < palette.length, s"VP8L: palette index $idx")
            out(y * fullWidth + ox) = palette(idx)
            ox += 1
            k += 1
          }
          cx += 1
        }
        y += 1
      }
      (out, fullWidth)
    }
  }

  /** Decode the VP8L stream at b[off, off+len). */
  private def decodeStream(b: Array[Byte], off: Int, len: Int): (Int, Int, Array[Int]) = {
    require(len >= 5 && (b(off) & 0xff) == 0x2f, "VP8L: bad signature")
    val br = new Br(b, off + 1, len - 1)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    br.readBit() // alpha hint
    require(br.readBits(3) == 0, "VP8L: unsupported version")
    val px = decodeBody(br, w, h)
    (w, h, px)
  }

  /** Decode a HEADERLESS VP8L stream (no signature/dims/version — the
    * ALPH-chunk form, RFC 9649 §4.5: dimensions come from the carrier
    * frame; alpha lives in the green channel of the decoded pixels). */
  private[pipeline] def decodeHeaderless(b: Array[Byte], off: Int, len: Int,
                                         w: Int, h: Int): Array[Int] =
    decodeBody(new Br(b, off, len), w, h)

  private def decodeBody(br: Br, w: Int, h: Int): Array[Int] = {
    // transforms, each type at most once, applied inverse in reverse order
    var codedW = w
    var transforms = List.empty[Transform]
    var seenTypes = Set.empty[Int]
    var more = br.readBit() == 1
    while (more) {
      val ttype = br.readBits(2)
      require(!seenTypes(ttype), s"VP8L: duplicate transform type $ttype")
      seenTypes += ttype
      ttype match {
        case 0 => // predictor
          val bits = br.readBits(3) + 2
          val d = decodeEntropyImage(br, subSize(codedW, bits), subSize(h, bits), allowMeta = false)
          transforms ::= PredictorT(bits, d)
        case 1 => // color
          val bits = br.readBits(3) + 2
          val d = decodeEntropyImage(br, subSize(codedW, bits), subSize(h, bits), allowMeta = false)
          transforms ::= ColorT(bits, d)
        case 2 =>
          transforms ::= SubtractGreenT
        case 3 =>
          val size = br.readBits(8) + 1
          val raw = decodeEntropyImage(br, size, 1, allowMeta = false)
          // palette entries are componentwise delta-coded
          val pal = new Array[Int](size)
          var acc = 0
          var i = 0
          while (i < size) {
            acc = addArgb(acc, raw(i))
            pal(i) = acc
            i += 1
          }
          val widthBits = if (size <= 2) 3 else if (size <= 4) 2 else if (size <= 16) 1 else 0
          val packedW = subSize(codedW, widthBits)
          transforms ::= PaletteT(pal, widthBits, codedW)
          codedW = packedW
      }
      more = br.readBit() == 1
    }
    var px = decodeEntropyImage(br, codedW, h, allowMeta = true)
    var curW = codedW
    transforms.foreach { t => // list head = LAST-read transform = first inverse
      val (p2, w2) = t.apply(px, curW, h)
      px = p2
      curW = w2
    }
    require(curW == w, s"VP8L: width mismatch after transforms: $curW vs $w")
    px
  }

  private def addArgb(a: Int, d: Int): Int = {
    val aa = ((a >>> 24) + (d >>> 24)) & 0xff
    val rr = (((a >> 16) & 0xff) + ((d >> 16) & 0xff)) & 0xff
    val gg = (((a >> 8) & 0xff) + ((d >> 8) & 0xff)) & 0xff
    val bb = ((a & 0xff) + (d & 0xff)) & 0xff
    (aa << 24) | (rr << 16) | (gg << 8) | bb
  }
}
