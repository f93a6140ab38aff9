package graft.tools

/** Scratch end-to-end driver for ad-hoc verification (see skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    import graft.pipeline.MpegAudio
    val n = 48000
    // broadband deterministic test signal: 40 tones across the spectrum
    val x = {
      val a = new Array[Double](n)
      var j = 0
      while (j < 40) {
        val f = 180.0 * (j + 1) + 37.0 * j * j % 91
        val ph = j * 0.713
        var i = 0
        while (i < n) { a(i) += 0.1 * math.sin(2 * math.Pi * f * i / 48000.0 + ph); i += 1 }
        j += 1
      }
      a
    }
    val an = new MpegAudio.Analysis
    val syn = new MpegAudio.Synthesis
    val y = new Array[Double](n)
    val sb = new Array[Double](32)
    var m = 0
    while ((m + 1) * 32 <= n) {
      an.step(x, m * 32, sb)
      syn.step(sb, y, m * 32)
      m += 1
    }
    val d = 481
    var num = 0.0; var den = 0.0
    var i = 0
    while (i + d < n) { val e = x(i) - y(i + d); den += e * e; num += x(i) * x(i); i += 1 }
    println(f"[mp2] production filterbank broadband SNR ${10 * math.log10(num / den)}%.1f dB at delay $d")
  }
}
