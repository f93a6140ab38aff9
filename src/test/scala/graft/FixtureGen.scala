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
      0.5 * math.sin(2 * math.Pi * 440 * i / 48000.0) +
        0.2 * math.sin(2 * math.Pi * 2900 * i / 48000.0)
    }
    val mp2 = Mp2TestEncoder.encodeMp2(pcm, channels = 1)
    java.nio.file.Files.write(outDir.resolve("sample.mp2"), mp2)

    val (mp4, _) = Mp4TestBuilder.buildMp4()
    java.nio.file.Files.write(outDir.resolve("sample.mp4"), mp4)

    println(s"wrote ${mp2.length}B sample.mp2 and ${mp4.length}B sample.mp4 to $outDir")
  }
}
