package graft

/** Regenerates the committed binary fixtures under
  * src/main/resources/graft/fixtures/ — run with
  * `sbt "Test/runMain graft.FixtureGen"` after changing the test-side
  * MP2 encoder or MP4 builder. The fixtures feed the driver-visible
  * multimodal queries (SparkEntry `multimodal_audio_mp2` /
  * `multimodal_mp4_demux`), whose oracles are VALUES literals pinned to
  * these exact bytes. */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("src/main/resources/graft/fixtures")
    java.nio.file.Files.createDirectories(outDir)

    // 0.25 s mono 48 kHz two-tone, Layer II 192 kbps
    val n = 12000
    val pcm = Array.tabulate(n) { i =>
      0.5 * StrictMath.sin(2 * math.Pi * 440 * i / 48000.0) +
        0.2 * StrictMath.sin(2 * math.Pi * 2900 * i / 48000.0)
    }
    val mp2 = Mp2TestEncoder.encodeMp2(pcm, channels = 1)
    java.nio.file.Files.write(outDir.resolve("sample.mp2"), mp2)

    val (mp4, _) = Mp4TestBuilder.buildMp4()
    java.nio.file.Files.write(outDir.resolve("sample.mp4"), mp4)

    // mono FLAC, 2 frames (FIXED+Rice sine / VERBATIM ramp) — feeds the
    // real decodeFlac kernel in the multimodal_features query
    val flac = FlacTestEncoder.encodeFixture()
    java.nio.file.Files.write(outDir.resolve("sample.flac"), flac)

    // 0.1 s 440 Hz sine, 16-bit mono 8 kHz WAV — real javax.sound decode
    val wav = TestWav.fromShorts(Array.tabulate(800)(i =>
      (0.5 * StrictMath.sin(2 * math.Pi * 440 * i / 8000.0) * 32767).toLong),
      1, 8000f)
    java.nio.file.Files.write(outDir.resolve("sample.wav"), wav)

    // 8x4 horizontal red->blue gradient BMP — real ImageIO decode
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach { x =>
      val r = (x * 255 / 7) & 0xff
      val rgb = (r << 16) | (255 - r)
      (0 until 4).foreach(y => img.setRGB(x, y, rgb))
    }
    val bmpBaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmpBaos)
    java.nio.file.Files.write(outDir.resolve("sample.bmp"), bmpBaos.toByteArray)

    println(s"wrote sample.mp2 (${mp2.length}B), sample.mp4 (${mp4.length}B), " +
      s"sample.flac (${flac.length}B), sample.wav (${wav.length}B), " +
      s"sample.bmp (${bmpBaos.size}B) to $outDir")
  }
}
