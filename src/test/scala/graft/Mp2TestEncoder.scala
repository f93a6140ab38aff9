package graft

import graft.pipeline.MpegAudio

/** Reference-grade MPEG-1 Layer II ENCODER (test scope): matched partner
  * of [[graft.pipeline.MpegAudio.decodeLayer2]] used by the round-trip
  * suite and the committed fixture generator (FixtureGen). Fixed
  * allocation strategy per subband class, budget-fitted; see
  * MpegAudioSpec for the round-trip contract. */
object Mp2TestEncoder {
  // ------------------------------------------------ test-side MP2 encoder
  final class BitWriter {
    private val buf = collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0; private var nb = 0
    def put(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def padToBytes(total: Int): Unit = {
      while (nb != 0) put(0, 1)
      while (buf.length < total) buf += 0.toByte
    }
    def bytes: Array[Byte] = buf.toArray
  }

  /** Per-subband encoder choice for the 48 kHz / B.2a layout: high
    * precision (511 levels) in the low bands, 15 in the mid, grouped 5 up
    * top — allocation indices match the decoder's class tables. */
  def levelsFor(sb: Int): (Int, Int) = // (allocIndex, levels)
    if (sb < 3) (8, 511) else if (sb < 11) (10, 511)
    else if (sb < 23) (5, 15) else (2, 5)
  def nbalFor(sb: Int): Int =
    if (sb < 11) 4 else if (sb < 23) 3 else 2

  /** Encode interleaved PCM doubles (−1..1) as MPEG-1 Layer II.
    * `jointBound` >= 0 emits joint (intensity) stereo: mode 01 with
    * bound = jointBound (must be 4/8/12/16); subbands above the bound
    * carry ONE shared sample set (the channel mean) with per-channel
    * scalefactors — the decoder's intensity branch. */
  def encodeMp2(pcm: Array[Double], channels: Int, kbps: Int = 192,
                        rate: Int = 48000, jointBound: Int = -1): Array[Byte] = {
    val brIdx = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384).indexOf(kbps)
    require(brIdx > 0, s"unsupported kbps $kbps")
    val srIdx = Array(44100, 48000, 32000).indexOf(rate)
    require(srIdx >= 0, s"unsupported rate $rate")
    val sblimit = if (rate == 48000) 27 else if (kbps / channels >= 96) 30 else 27
    val bound = if (jointBound >= 0) jointBound else sblimit
    require(channels == 2 || jointBound < 0, "joint needs stereo")
    val frameBytes = 144 * kbps * 1000 / rate
    val frameBits = frameBytes * 8
    val perCh = pcm.length / channels
    val nFrames = (perCh + 1151) / 1152
    val analysis = Array.fill(channels)(new MpegAudio.Analysis)
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    val chPcm = Array.ofDim[Double](channels, nFrames * 1152)
    var i = 0
    while (i < perCh) {
      var c = 0
      while (c < channels) { chPcm(c)(i) = pcm(i * channels + c); c += 1 }
      i += 1
    }
    val sbBuf = Array.ofDim[Double](channels, 36, 32) // per frame
    var fr = 0
    while (fr < nFrames) {
      var c = 0
      while (c < channels) {
        var g = 0
        while (g < 36) {
          analysis(c).step(chPcm(c), fr * 1152 + g * 32, sbBuf(c)(g))
          g += 1
        }
        c += 1
      }
      // shared (intensity) subbands carry the channel-mean sample set
      if (jointBound >= 0) {
        var sb = bound
        while (sb < sblimit) {
          var g = 0
          while (g < 36) {
            val m2 = (sbBuf(0)(g)(sb) + sbBuf(1)(g)(sb)) / 2
            sbBuf(0)(g)(sb) = m2; sbBuf(1)(g)(sb) = m2
            g += 1
          }
          sb += 1
        }
      }
      // scalefactor index per (ch, sb, part): smallest value covering max|s|
      val sfIdx = Array.ofDim[Int](channels, sblimit, 3)
      val active = collection.mutable.ArrayBuffer.empty[(Double, Int, Int)] // (peak, ch, sb)
      c = 0
      while (c < channels) {
        var sb = 0
        while (sb < sblimit) {
          var peak = 0.0
          var p = 0
          while (p < 3) {
            var mx = 0.0
            var g = p * 12
            while (g < (p + 1) * 12) {
              val v = math.abs(sbBuf(c)(g)(sb)); if (v > mx) mx = v; g += 1
            }
            if (mx > peak) peak = mx
            var idx = 62
            while (idx > 0 && MpegAudio.scaleFactor(idx) < mx * (1 + 1e-9)) idx -= 1
            sfIdx(c)(sb)(p) = idx
            p += 1
          }
          if (peak > 1e-9) active += ((peak, c, sb))
          sb += 1
        }
        c += 1
      }
      // fit the bit budget: header + allocation field always paid; each
      // active (ch,sb) adds scfsi + 3 scalefactors + its sample bits
      val headerAllocBits = 32 +
        (0 until sblimit).map(sb => (if (sb < bound) channels else 1) * nbalFor(sb)).sum
      var budget = frameBits - headerAllocBits
      val keep = Array.ofDim[Boolean](channels, sblimit)
      def sampleBitsOf(lv: Int): Int = lv match {
        case 5 => 12 * 7
        case 15 => 12 * 3 * 4
        case 511 => 12 * 3 * 9
        case other => throw new IllegalArgumentException(s"unexpected levels $other")
      }
      active.sortBy(-_._1).foreach { case (_, c2, sb2) =>
        val lv = levelsFor(sb2)._2
        if (sb2 >= bound) {
          // shared: samples once, scfsi+scf per channel; decide once
          if (!keep(0)(sb2)) {
            val cost = channels * (2 + 18) + sampleBitsOf(lv)
            if (budget >= cost) {
              var c3 = 0
              while (c3 < channels) { keep(c3)(sb2) = true; c3 += 1 }
              budget -= cost
            }
          }
        } else {
          val cost = 2 + 18 + sampleBitsOf(lv)
          if (budget >= cost) { keep(c2)(sb2) = true; budget -= cost }
        }
      }
      // ---- emit
      val w = new BitWriter
      w.put(0xff, 8)
      w.put(0xfd, 8) // MPEG-1, Layer II, no CRC
      w.put(brIdx, 4); w.put(srIdx, 2); w.put(0, 1); w.put(0, 1) // rate, no pad
      if (jointBound >= 0) { w.put(1, 2); w.put(jointBound / 4 - 1, 2) }
      else { w.put(if (channels == 1) 3 else 0, 2); w.put(0, 2) } // mode
      w.put(0, 2); w.put(0, 2) // copyright/original + emphasis
      var sb = 0
      while (sb < sblimit) {
        if (sb < bound) {
          c = 0
          while (c < channels) {
            w.put(if (keep(c)(sb)) levelsFor(sb)._1 else 0, nbalFor(sb)); c += 1
          }
        } else w.put(if (keep(0)(sb)) levelsFor(sb)._1 else 0, nbalFor(sb))
        sb += 1
      }
      sb = 0
      while (sb < sblimit) {
        c = 0
        while (c < channels) { if (keep(c)(sb)) w.put(0, 2); c += 1 } // scfsi=0
        sb += 1
      }
      sb = 0
      while (sb < sblimit) {
        c = 0
        while (c < channels) {
          if (keep(c)(sb)) { var p = 0; while (p < 3) { w.put(sfIdx(c)(sb)(p), 6); p += 1 } }
          c += 1
        }
        sb += 1
      }
      var g = 0
      while (g < 12) {
        sb = 0
        while (sb < sblimit) {
          val chLimit = if (sb < bound) channels else 1
          c = 0
          while (c < chLimit) {
            if (keep(c)(sb)) {
              val lv = levelsFor(sb)._2
              val sf = MpegAudio.scaleFactor(sfIdx(c)(sb)(g / 4))
              def q(t: Int): Int = {
                val s = sbBuf(c)(g * 3 + t)(sb) / sf
                math.max(0, math.min(lv - 1, math.round((s * lv + lv - 1) / 2.0).toInt))
              }
              if (lv == 5) w.put(q(0) + 5 * q(1) + 25 * q(2), 7)
              else {
                val nb = if (lv == 15) 4 else 9
                w.put(q(0), nb); w.put(q(1), nb); w.put(q(2), nb)
              }
            }
            c += 1
          }
          sb += 1
        }
        g += 1
      }
      w.padToBytes(frameBytes)
      out ++= w.bytes
      fr += 1
    }
    out.toArray
  }


  /** MPEG-1 LAYER I encoder, mono (test fixture grade): uniform 4-bit
    * allocation (nb = 9 bits -> 511 levels on active subbands), one
    * scalefactor per active subband per frame, 12 granules of one sample
    * each — the decoder's Layer I branch partner. */
  def encodeMp1Mono(pcm: Array[Double], kbps: Int = 192): Array[Byte] = {
    val rate = 48000
    val brIdx = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448).indexOf(kbps)
    require(brIdx > 0, s"unsupported L1 kbps $kbps")
    val frameBytes = 12 * kbps * 1000 / rate * 4
    val frameBits = frameBytes * 8
    val nFrames = (pcm.length + 383) / 384
    val analysis = new MpegAudio.Analysis
    val padded = java.util.Arrays.copyOf(pcm, nFrames * 384)
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    val sb = Array.ofDim[Double](12, 32)
    var fr = 0
    while (fr < nFrames) {
      var g = 0
      while (g < 12) { analysis.step(padded, fr * 384 + g * 32, sb(g)); g += 1 }
      val peak = Array.tabulate(32)(k => (0 until 12).map(g2 => math.abs(sb(g2)(k))).max)
      val sfIdx = Array.tabulate(32) { k =>
        var idx = 62
        while (idx > 0 && MpegAudio.scaleFactor(idx) < peak(k) * (1 + 1e-9)) idx -= 1
        idx
      }
      // budget: header 32 + alloc 4*32; each active: 6 + 12*9
      var budget = frameBits - 32 - 128
      val keep = new Array[Boolean](32)
      (0 until 32).sortBy(k => -peak(k)).foreach { k =>
        if (peak(k) > 1e-9 && budget >= 6 + 108) { keep(k) = true; budget -= 114 }
      }
      val w = new BitWriter
      w.put(0xff, 8); w.put(0xff, 8)              // MPEG-1, Layer I, no CRC
      w.put(brIdx, 4); w.put(1, 2); w.put(0, 1); w.put(0, 1)
      w.put(3, 2); w.put(0, 2); w.put(0, 2); w.put(0, 2) // single channel
      (0 until 32).foreach(k => w.put(if (keep(k)) 8 else 0, 4)) // nb=9
      (0 until 32).foreach(k => if (keep(k)) w.put(sfIdx(k), 6))
      g = 0
      while (g < 12) {
        var k = 0
        while (k < 32) {
          if (keep(k)) {
            val sf = MpegAudio.scaleFactor(sfIdx(k))
            val s2 = sb(g)(k) / sf
            val q = math.max(0, math.min(510, math.round((s2 * 511 + 510) / 2.0).toInt))
            w.put(q, 9)
          }
          k += 1
        }
        g += 1
      }
      w.padToBytes(frameBytes)
      out ++= w.bytes
      fr += 1
    }
    out.toArray
  }
}
