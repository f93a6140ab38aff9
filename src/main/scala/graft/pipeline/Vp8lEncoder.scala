package graft.pipeline

import scala.collection.mutable

/** Minimal from-scratch VP8L (WebP lossless) ENCODER — the write side of
  * [[Vp8l]]: a lossless-WebP sink for multimodal pipelines and the
  * roundtrip verifier of every decoder path (simple and
  * code-length-coded prefix codes, color cache, LZ77 with BOTH direct
  * and 2D-mapped distances, subtract-green, uniform-mode predictor
  * blocks, palette indexing with sub-byte bundling — the
  * FlacTestEncoder/Mp2TestBuilder discipline, shipped in main because a
  * deterministic webp WRITER is independently useful for corpus
  * construction). Compression is intentionally simple (one prefix-code
  * group, run-length LZ77, optional cache/palette); correctness, not
  * ratio, is the contract. Canonical code assignment mirrors the spec
  * (by length, then symbol order); code bits are written MSB-first,
  * everything else LSB-first — exactly the stream layout [[Vp8l]]
  * consumes. */
object Vp8lEncoder {

  final class BitWriter {
    private val bytes = mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << nbits
      nbits += 1
      if (nbits == 8) { bytes += cur.toByte; cur = 0; nbits = 0 }
    }
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { writeBit((v >> i) & 1); i += 1 }
    }
    /** prefix-code bits go MSB-first. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBit((code >> i) & 1); i -= 1 }
    }
    def result(): Array[Byte] = {
      val out = if (nbits > 0) bytes :+ cur.toByte else bytes
      out.toArray
    }
  }

  /** Plain Huffman code lengths over symbol frequencies (depth unbounded
    * but test alphabets stay far under 15; asserted). Single-symbol
    * alphabets get length 1 (encoded cost 0 — see decoder). */
  def huffmanLengths(freq: Map[Int, Long], maxSym: Int): Array[Int] = {
    val lengths = new Array[Int](maxSym)
    val syms = freq.filter(_._2 > 0).keys.toSeq.sorted
    require(syms.nonEmpty, "no symbols")
    if (syms.length == 1) { lengths(syms.head) = 1; return lengths }
    // (weight, tiebreak-id, members)
    val pq = mutable.PriorityQueue.empty[(Long, Long, List[Int])](
      Ordering.by[(Long, Long, List[Int]), (Long, Long)](t => (t._1, t._2)).reverse)
    var tid = 0L
    syms.foreach { s => pq.enqueue((freq(s), tid, List(s))); tid += 1 }
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      (a._3 ++ b._3).foreach(s => lengths(s) += 1)
      pq.enqueue((a._1 + b._1, tid, a._3 ++ b._3)); tid += 1
    }
    require(lengths.forall(_ <= 15), s"huffman depth > 15: ${lengths.max}")
    lengths
  }

  /** Canonical codes from lengths (the decoder's assignment rule). */
  def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lengths.length)
    var code = 0
    var l = 1
    while (l <= 15) {
      lengths.indices.foreach { s =>
        if (lengths(s) == l) { codes(s) = code; code += 1 }
      }
      code <<= 1
      l += 1
    }
    codes
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** A built prefix code ready for emission. */
  final case class Code(lengths: Array[Int], codes: Array[Int]) {
    def write(bw: BitWriter, sym: Int): Unit = {
      require(lengths(sym) > 0, s"symbol $sym has no code")
      if (lengths.count(_ > 0) > 1) bw.writeCode(codes(sym), lengths(sym))
      // single-symbol codes cost zero bits
    }
  }

  def buildCode(freq: Map[Int, Long], alphabet: Int): Code = {
    val lens = huffmanLengths(freq, alphabet)
    Code(lens, canonicalCodes(lens))
  }

  /** Emit a prefix code: simple when <=2 symbols, else code-length-coded
    * (numCl always 19; zero runs as 17/18 tokens; no 16 repeats). */
  def writePrefixCode(bw: BitWriter, c: Code): Unit = {
    val present = c.lengths.indices.filter(c.lengths(_) > 0)
    if (present.length <= 2 && present.forall(_ < 256) &&
        (present.length == 1 || present.forall(s => c.lengths(s) == 1))) {
      bw.writeBit(1) // simple
      bw.writeBits(present.length - 1, 1)
      if (present.head < 2 && present.length == 1) {
        bw.writeBit(0); bw.writeBits(present.head, 1)
      } else {
        bw.writeBit(1); bw.writeBits(present.head, 8)
      }
      if (present.length == 2) bw.writeBits(present(1), 8)
      return
    }
    bw.writeBit(0) // code-length-coded
    // tokenize lengths: literals + zero runs
    val tokens = mutable.ArrayBuffer.empty[(Int, Int, Int)] // (sym, extraVal, extraBits)
    var i = 0
    // trailing zeros need no tokens: the decoder leaves unread symbols 0,
    // terminating on alphabet exhaustion is fine only if we emit ops for
    // every symbol... the CL loop runs while sym < alphabet AND budget —
    // budget = alphabet (no max_symbol), so unread ops would UNDERFLOW the
    // stream. Emit zero-run tokens through the LAST nonzero symbol, then
    // 17/18 runs to cover the tail exactly.
    val last = present.max
    while (i <= last) {
      val l = c.lengths(i)
      if (l > 0) { tokens += ((l, 0, 0)); i += 1 }
      else {
        var run = 0
        while (i + run <= last && c.lengths(i + run) == 0) run += 1
        var left = run
        while (left > 0) {
          if (left >= 11) {
            val take = math.min(left, 138)
            tokens += ((18, take - 11, 7)); left -= take
          } else if (left >= 3) {
            val take = math.min(left, 10)
            tokens += ((17, take - 3, 3)); left -= take
          } else {
            tokens += ((0, 0, 0)); left -= 1
          }
        }
        i += run
      }
    }
    // cover the tail after `last` with zero runs so the reader's symbol
    // counter reaches the alphabet size exactly
    var tail = c.lengths.length - 1 - last
    while (tail > 0) {
      if (tail >= 11) { val t = math.min(tail, 138); tokens += ((18, t - 11, 7)); tail -= t }
      else if (tail >= 3) { val t = math.min(tail, 10); tokens += ((17, t - 3, 3)); tail -= t }
      else { tokens += ((0, 0, 0)); tail -= 1 }
    }
    val clFreq = tokens.groupBy(_._1).map { case (s, ts) => s -> ts.size.toLong }
    val clCode = buildCode(clFreq, 19)
    bw.writeBits(19 - 4, 4) // num_code_lengths = 19
    ClOrder.foreach(s => bw.writeBits(clCode.lengths(s), 3))
    bw.writeBit(0) // no max_symbol
    tokens.foreach { case (s, ev, eb) =>
      clCode.write(bw, s)
      if (eb > 0) bw.writeBits(ev, eb)
    }
  }

  /** Ops for the spatially-coded stream. */
  sealed trait Op
  final case class Lit(a: Int, r: Int, g: Int, b: Int) extends Op
  final case class Copy(length: Int, distSymValue: Int) extends Op // lz77Value-domain plane code
  final case class CacheRef(idx: Int) extends Op

  /** closed-form inverse of the decoder's lz77Value:
    * value -> (code, extraVal, extraBits). */
  def lz77CodeOf(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"lz77 value $v")
    if (v <= 4) return (v - 1, 0, 0)
    val x = v - 1 // in [4, ...): offset + extra where offset = (2+b) << e
    var e = 1
    while ((4 << e) <= x) e += 1
    // x in [2 << e, 4 << e): b = (x >> e) - 2 in {0,1}
    val b = (x >> e) - 2
    val code = 2 * e + 2 + b
    val extraVal = x - ((2 + b) << e)
    (code, extraVal, e)
  }

  /** Emit one entropy-coded image (no meta, optional cache) given its
    * op stream and prebuilt codes. */
  def writeImageBody(bw: BitWriter, cacheBits: Int, ops: Seq[Op],
                     green: Code, red: Code, blue: Code, alpha: Code,
                     dist: Code): Unit = {
    if (cacheBits > 0) { bw.writeBit(1); bw.writeBits(cacheBits, 4) }
    else bw.writeBit(0)
    // (meta-prefix bit is written by the caller only for the main image)
    writePrefixCode(bw, green)
    writePrefixCode(bw, red)
    writePrefixCode(bw, blue)
    writePrefixCode(bw, alpha)
    writePrefixCode(bw, dist)
    ops.foreach {
      case Lit(a, r, g, b) =>
        green.write(bw, g); red.write(bw, r); blue.write(bw, b); alpha.write(bw, a)
      case Copy(len, plane) =>
        val (lc, lev, leb) = lz77CodeOf(len)
        green.write(bw, 256 + lc); if (leb > 0) bw.writeBits(lev, leb)
        val (dc, dev, deb) = lz77CodeOf(plane)
        dist.write(bw, dc); if (deb > 0) bw.writeBits(dev, deb)
      case CacheRef(i) =>
        green.write(bw, 256 + 24 + i)
    }
  }

  /** Build codes from an op stream (green includes length + cache arms). */
  def codesFor(ops: Seq[Op], cacheBits: Int): (Code, Code, Code, Code, Code) = {
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val gf = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val rf = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val bf = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val af = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val df = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    ops.foreach {
      case Lit(a, r, g, b) => gf(g) += 1; rf(r) += 1; bf(b) += 1; af(a) += 1
      case Copy(len, plane) =>
        gf(256 + lz77CodeOf(len)._1) += 1; df(lz77CodeOf(plane)._1) += 1
      case CacheRef(i) => gf(256 + 24 + i) += 1
    }
    // dist/red/blue/alpha codes must exist even when unused
    if (rf.isEmpty) rf(0) = 1
    if (bf.isEmpty) bf(0) = 1
    if (af.isEmpty) af(0) = 1
    if (df.isEmpty) df(0) = 1
    (buildCode(gf.toMap, 256 + 24 + cacheSize), buildCode(rf.toMap, 256),
      buildCode(bf.toMap, 256), buildCode(af.toMap, 256), buildCode(df.toMap, 40))
  }

  def cacheKey(argb: Int, bits: Int): Int = (0x1e35a7bd * argb) >>> (32 - bits)

  /** Turn ARGB pixels into an op stream: run-length LZ77 on immediate
    * repeats (dist plane code given), cache hits when enabled, literals
    * otherwise — two-pass-safe (pure function of the pixels). */
  def opsFor(px: Array[Int], cacheBits: Int, useLz: Boolean,
             planeForDist1: Int): Seq[Op] = {
    val ops = mutable.ArrayBuffer.empty[Op]
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val seen = if (cacheBits > 0) new Array[Boolean](1 << cacheBits) else null
    var i = 0
    while (i < px.length) {
      val p = px(i)
      if (useLz && i > 0 && px(i - 1) == p) {
        var run = 0
        while (i + run < px.length && px(i + run) == p) run += 1
        // LZ77 length codes top out at 4096 (code 23); longer runs must
        // split or the length would alias into the color-cache range.
        var rem = run
        while (rem > 0) { val c = math.min(rem, 4096); ops += Copy(c, planeForDist1); rem -= c }
        // copied pixels enter the cache too (decoder behavior)
        if (cache != null) { val k = cacheKey(p, cacheBits); cache(k) = p; seen(k) = true }
        i += run
      } else {
        val k = if (cache != null) cacheKey(p, cacheBits) else -1
        if (cache != null && seen(k) && cache(k) == p) { ops += CacheRef(k); i += 1 }
        else {
          ops += Lit(p >>> 24, (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          if (cache != null) { cache(k) = p; seen(k) = true }
          i += 1
        }
      }
    }
    ops.toSeq
  }

  /** Wrap a VP8L stream payload in a RIFF WebP container. */
  def riff(vp8l: Array[Byte]): Array[Byte] = {
    val bos = mutable.ArrayBuffer.empty[Byte]
    def ascii(s: String): Unit = s.foreach(c => bos += c.toByte)
    def le32(v: Int): Unit = (0 until 4).foreach(i => bos += ((v >> (8 * i)) & 0xff).toByte)
    val chunkLen = vp8l.length
    val padded = chunkLen + (chunkLen & 1)
    ascii("RIFF"); le32(4 + 8 + padded); ascii("WEBP")
    ascii("VP8L"); le32(chunkLen); bos ++= vp8l
    if ((chunkLen & 1) == 1) bos += 0
    bos.toArray
  }

  /** Main entry: encode ARGB pixels. Options exercise decoder paths.
    * `predictorMode` >= 0 writes a predictor transform with that uniform
    * mode over 4x4 blocks (size_bits=2); `palette` (if set) must contain
    * every pixel value and triggers color indexing. */
  def encode(w: Int, h: Int, argb: Array[Int], subtractGreen: Boolean = false,
             cacheBits: Int = 0, useLz: Boolean = false,
             planeForDist1: Int = 121, predictorMode: Int = -1,
             palette: Array[Int] = null): Array[Byte] = {
    require(argb.length == w * h)
    val bw = new BitWriter
    bw.writeBits(0x2f, 8)
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBit(0) // alpha hint
    bw.writeBits(0, 3) // version
    var px = argb.clone()
    var codedW = w
    // transforms in stream order; FORWARD application order here must be
    // the reverse of the decoder's inverse order: the decoder inverts
    // last-read FIRST, so we apply forward transforms in read order too
    // (each forward transform here operates on the current px)
    if (predictorMode >= 0) {
      bw.writeBit(1); bw.writeBits(0, 2) // transform: predictor
      bw.writeBits(0, 3) // size_bits = 2
      val bits = 2
      val bwid = (codedW + 3) >> bits
      val bhei = (h + 3) >> bits
      // transform data image: uniform mode in green; single-symbol codes
      val mode = predictorMode
      val ops = Seq.fill(bwid * bhei)(Lit(0, 0, mode, 0))
      val (g, r, b, a, d) = codesFor(ops, 0)
      writeImageBody(bw, 0, ops, g, r, b, a, d)
      // forward predictor: residual = px - pred (channelwise mod 256);
      // computed in scan order against the ORIGINAL pixels
      val res = px.clone()
      var pos = 0
      while (pos < px.length) {
        val x = pos % codedW; val y = pos / codedW
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1)
          else if (x == 0) px(pos - codedW)
          else mode match {
            case 0 => 0xff000000
            case 1 => px(pos - 1)
            case 2 => px(pos - codedW)
            case m => throw new IllegalArgumentException(
              s"test encoder supports uniform predictor modes 0-2 only: $m")
          }
        def sub(pp: Int, qq: Int): Int = {
          val aa = ((pp >>> 24) - (qq >>> 24)) & 0xff
          val rr = (((pp >> 16) & 0xff) - ((qq >> 16) & 0xff)) & 0xff
          val gg = (((pp >> 8) & 0xff) - ((qq >> 8) & 0xff)) & 0xff
          val bb = ((pp & 0xff) - (qq & 0xff)) & 0xff
          (aa << 24) | (rr << 16) | (gg << 8) | bb
        }
        res(pos) = sub(px(pos), pred)
        pos += 1
      }
      px = res
    }
    if (subtractGreen) {
      bw.writeBit(1); bw.writeBits(2, 2) // transform: subtract green
      px = px.map { p =>
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        (p & 0xff00ff00) | (r << 16) | b
      }
    }
    if (palette != null) {
      bw.writeBit(1); bw.writeBits(3, 2) // transform: color indexing
      bw.writeBits(palette.length - 1, 8)
      // palette image: delta-coded entries as a 1 x size literal image
      val deltas = palette.indices.map { i =>
        val prev = if (i == 0) 0 else palette(i - 1)
        val cur = palette(i)
        def sub(sh: Int) = (((cur >>> sh) & 0xff) - ((prev >>> sh) & 0xff)) & 0xff
        (sub(24) << 24) | (sub(16) << 16) | (sub(8) << 8) | sub(0)
      }
      val pops = deltas.map(d =>
        Lit(d >>> 24, (d >> 16) & 0xff, (d >> 8) & 0xff, d & 0xff))
      val (g, r, b, a, d) = codesFor(pops, 0)
      writeImageBody(bw, 0, pops, g, r, b, a, d)
      // pack indices into the green channel
      val size = palette.length
      val widthBits = if (size <= 2) 3 else if (size <= 4) 2 else if (size <= 16) 1 else 0
      val perPixel = 1 << widthBits
      val idxBits = 8 >> widthBits
      val packedW = (codedW + perPixel - 1) >> widthBits
      val idxOf = palette.zipWithIndex.toMap
      val packed = new Array[Int](packedW * h)
      var y = 0
      while (y < h) {
        var cx = 0
        while (cx < packedW) {
          var v = 0
          var k = 0
          while (k < perPixel) {
            val ox = cx * perPixel + k
            if (ox < codedW) v |= idxOf(px(y * codedW + ox)) << (k * idxBits)
            k += 1
          }
          packed(y * packedW + cx) = 0xff000000 | (v << 8)
          cx += 1
        }
        y += 1
      }
      px = packed
      codedW = packedW
    }
    bw.writeBit(0) // no more transforms
    // main image: optional cache, no meta
    val ops = opsFor(px, cacheBits, useLz, planeForDist1)
    val (g, r, b, a, d) = codesFor(ops, cacheBits)
    if (cacheBits > 0) { bw.writeBit(1); bw.writeBits(cacheBits, 4) }
    else bw.writeBit(0)
    bw.writeBit(0) // no meta prefix (main image only)
    writePrefixCode(bw, g)
    writePrefixCode(bw, r)
    writePrefixCode(bw, b)
    writePrefixCode(bw, a)
    writePrefixCode(bw, d)
    ops.foreach {
      case Lit(aa, rr, gg, bb) =>
        g.write(bw, gg); r.write(bw, rr); b.write(bw, bb); a.write(bw, aa)
      case Copy(len, plane) =>
        val (lc, lev, leb) = lz77CodeOf(len)
        g.write(bw, 256 + lc); if (leb > 0) bw.writeBits(lev, leb)
        val (dc, dev, deb) = lz77CodeOf(plane)
        d.write(bw, dc); if (deb > 0) bw.writeBits(dev, deb)
      case CacheRef(i) =>
        g.write(bw, 256 + 24 + i)
    }
    riff(bw.result())
  }
}
