package graft

/** Shared test-side WAV construction (16-bit PCM little-endian via
  * javax.sound) — the independent decode path several suites cross-check
  * the from-scratch FLAC/MP2 decoders against, and the generator behind
  * the committed sample.wav fixture. One definition instead of a copy per
  * suite. */
object TestWav {

  /** Interleaved 16-bit sample VALUES (low 16 bits of each Long). */
  def fromShorts(samples: Array[Long], channels: Int, rate: Float): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    write(raw, channels, rate, samples.length / channels)
  }

  /** Interleaved float PCM in [-1, 1], scaled to 16-bit. */
  def fromDoubles(pcm: Array[Double], channels: Int, rate: Float): Array[Byte] = {
    val n = pcm.length
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = math.max(-32768, math.min(32767, math.round(pcm(i) * 32767).toInt)).toShort
      raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    write(raw, channels, rate, n / channels)
  }

  private def write(raw: Array[Byte], channels: Int, rate: Float,
                    frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }
}
