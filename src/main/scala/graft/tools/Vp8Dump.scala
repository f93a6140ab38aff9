package graft.tools

import graft.pipeline.Vp8

/** Debug harness for the VP8 decoder: decodes the conformance fixtures
  * and diffs the planes against reference .yuv dumps (filtered oracles in
  * test resources, bypass_filtering oracles in /tmp via the ctypes
  * script). Usage: runMain graft.tools.Vp8Dump [nofilter] */
object Vp8Dump {
  private def readYuv(path: String): (Int, Int, Array[Byte], Array[Byte], Array[Byte]) = {
    val b = java.nio.ByteBuffer.wrap(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val w = b.getInt; val h = b.getInt
    val y = new Array[Byte](w * h); b.get(y)
    val cs = ((w + 1) / 2) * ((h + 1) / 2)
    val u = new Array[Byte](cs); b.get(u)
    val v = new Array[Byte](cs); b.get(v)
    (w, h, y, u, v)
  }

  private def diff(tag: String, want: Array[Byte], got: Array[Byte], w: Int): Unit = {
    var bad = 0; var first = -1
    val n = math.min(want.length, got.length)
    var i = 0
    while (i < n) { if (want(i) != got(i)) { bad += 1; if (first < 0) first = i }; i += 1 }
    if (bad == 0) println(s"  $tag: EXACT")
    else {
      println(s"  $tag: $bad/$n differ, first (${first % w},${first / w}) want ${want(first) & 0xff} got ${got(first) & 0xff}")
      // print the first bad row context
      val r = first / w
      val lo = math.max(0, first % w - 4); val hi = math.min(w, first % w + 8)
      println(s"    want row $r [${lo}..${hi}): " + (lo until hi).map(c => want(r * w + c) & 0xff).mkString(","))
      println(s"    got  row $r [${lo}..${hi}): " + (lo until hi).map(c => got(r * w + c) & 0xff).mkString(","))
    }
  }

  def main(args: Array[String]): Unit = {
    val nofilter = args.contains("nofilter")
    if (nofilter) System.setProperty("graft.vp8.skipLoopFilter", "true")
    System.setProperty("graft.vp8.debugHeader", "true")
    if (args.contains("mb")) System.setProperty("graft.vp8.debugMb", "true")
    val only = args.filterNot(Set("nofilter","mb","grid","alldiff")).headOption
    val all = Seq("vp8_grad_q75", "vp8_grad_q95", "vp8_photo_q50",
      "vp8_photo_q95", "vp8_photo_q1", "vp8_photo_q75", "python_vp8x_lossy",
      "vp8_adv_simplefilter", "vp8_adv_parts8", "vp8_adv_sharp",
      "vp8_adv_simple_parts")
    val names = only match { case Some(n) => Seq(n); case None => all }
    for (name <- names) {
      val webp = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"src/test/resources/webp/$name.webp"))
      val oraclePath =
        if (nofilter) s"/tmp/${name}_nofilter.yuv"
        else s"src/test/resources/webp/$name.yuv"
      val (w, h, ey, eu, ev) = readYuv(oraclePath)
      println(s"$name (${w}x$h)${if (nofilter) " [nofilter]" else ""}:")
      Vp8.decodeYuv(webp) match {
        case None => println("  NO VP8 CHUNK")
        case Some(yuv) =>
          diff("Y", ey, yuv.y, w)
          diff("U", eu, yuv.u, (w + 1) / 2)
          diff("V", ev, yuv.v, (w + 1) / 2)
          if (args.contains("alldiff")) {
            for (i <- 0 until w * h if ey(i) != yuv.y(i))
              println(s"  ydiff (${i % w},${i / w}) want ${ey(i) & 0xff} got ${yuv.y(i) & 0xff}")
          }
          if (args.contains("grid")) {
            for (r <- 0 until math.min(16, h)) {
              val wr = (0 until math.min(16, w)).map(c => f"${ey(r * w + c) & 0xff}%3d").mkString(" ")
              val gr = (0 until math.min(16, w)).map(c => f"${yuv.y(r * w + c) & 0xff}%3d").mkString(" ")
              println(s"  want $wr")
              println(s"  got  $gr")
            }
          }
      }
    }
  }
}
