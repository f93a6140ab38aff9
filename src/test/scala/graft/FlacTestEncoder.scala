package graft

/** Minimal test-scope FLAC encoder — just enough legal bitstream (CRC bytes
  * zeroed; the decoder derives features, it does not verify archival
  * integrity) to build the committed `sample.flac` fixture that
  * `SparkEntry.multimodal_features` routes through the REAL
  * `Multimodal.decodeFlac` kernel. PipelineSpec builds its own richer
  * streams inline (stereo channel assignments, escapes); this one pins a
  * small deterministic mono stream: frame 0 FIXED order-2 + Rice on a
  * sine, frame 1 VERBATIM on a ramp. */
object FlacTestEncoder {
  val rate = 8000
  val bs = 64

  private final class BW {
    val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0; private var nb = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt; nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def align(): Unit = while (nb != 0) put(0, 1)
    def bytes: Array[Byte] = { align(); buf.toArray }
  }

  /** The two deterministic mono frames the fixture carries, as 16-bit
    * sample values (frame order = concatenation order). */
  def fixtureSamples: Array[Long] = {
    val sine = Array.tabulate(bs)(i => (8000 * StrictMath.sin(2 * math.Pi * 440 * i / rate)).toLong)
    val ramp = Array.tabulate(bs)(i => (i * 200 - 6400).toLong)
    sine ++ ramp
  }

  def encodeFixture(): Array[Byte] = {
    val w = new BW
    val samples = fixtureSamples
    val (sine, ramp) = samples.splitAt(bs)
    // STREAMINFO
    w.put(0x664c6143L, 32)              // fLaC
    w.put(0x80, 8); w.put(34, 24)       // last block, STREAMINFO, len 34
    w.put(bs, 16); w.put(bs, 16); w.put(0, 24); w.put(0, 24)
    w.put(rate, 20); w.put(0, 3); w.put(15, 5) // mono, 16 bps
    w.put(samples.length.toLong, 36); (0 until 16).foreach(_ => w.put(0, 8))
    // frame 0: FIXED order-2 + Rice(k=6)
    frameHeader(w, frameNo = 0)
    w.put(0, 1); w.put(8 + 2, 6); w.put(0, 1)   // FIXED order 2
    w.put(sine(0) & 0xffffL, 16); w.put(sine(1) & 0xffffL, 16)
    w.put(0, 2); w.put(0, 4); w.put(6, 4)       // RICE, 1 partition, k=6
    (2 until sine.length).foreach { i =>
      val e = sine(i) - (2 * sine(i - 1) - sine(i - 2))
      val u = (e << 1) ^ (e >> 63)              // zigzag
      val q = (u >>> 6).toInt
      (0 until q).foreach(_ => w.put(0, 1)); w.put(1, 1)
      w.put(u & 63L, 6)
    }
    endFrame(w)
    // frame 1: VERBATIM
    frameHeader(w, frameNo = 1)
    w.put(0, 1); w.put(1, 6); w.put(0, 1)
    ramp.foreach(v => w.put(v & 0xffffL, 16))
    endFrame(w)
    w.bytes
  }

  private def frameHeader(w: BW, frameNo: Int): Unit = {
    w.put(0x3ffe, 14); w.put(0, 1); w.put(0, 1)
    w.put(6, 4)                          // blockSize: 8-bit follows
    w.put(0, 4)                          // rate from STREAMINFO
    w.put(0, 4); w.put(4, 3); w.put(0, 1) // mono, 16-bit, reserved
    w.put(frameNo, 8)                    // UTF-8 frame number (< 0x80)
    w.put(bs - 1, 8)                     // blockSize - 1
    w.put(0, 8)                          // CRC-8 (zeroed)
  }

  private def endFrame(w: BW): Unit = { w.align(); w.put(0, 16) } // CRC-16 (zeroed)
}
