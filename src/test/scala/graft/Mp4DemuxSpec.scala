package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Mp4Demux, Multimodal}

/** Hand-built ISO-BMFF containers prove the sample-table demux: known
  * chunk layout, per-sample sizes/timestamps/keyframes, and the exact
  * payload bytes sliced back out. */
class Mp4DemuxSpec extends SparkSpec {

  test("mp4 demux: chunk layout, timestamps, keyframes, and exact payload bytes") {
    val (mp4, payloads) = Mp4TestBuilder.buildMp4()
    val got = Mp4Demux.demuxWithPayload(mp4)
    assert(got.length === 5)
    got.zipWithIndex.foreach { case ((s, pl), i) =>
      assert(s.trackId === 7)
      assert(s.codec === "avc1")
      assert(s.sampleIdx === i)
      assert(s.size === i + 3)
      assert(pl.toSeq === payloads(i).toSeq, s"payload bytes of sample $i")
    }
    // pts: dts = i*100 (+50 composition offset on sample index 2), /1000
    val pts = got.map(_._1.ptsSec)
    assert(pts === Seq(0.0, 0.1, 0.25, 0.3, 0.4))
    assert(got.map(_._1.keyframe) === Seq(true, false, false, true, false))
  }

  test("mp4 demux: non-BMFF, truncated, and stbl-less containers yield no samples") {
    assert(Mp4Demux.demux("not an mp4 at all".getBytes) === Nil)
    val (mp4, _) = Mp4TestBuilder.buildMp4()
    assert(Mp4Demux.demux(mp4.take(60)) === Nil)     // cut inside mdat
    // metadata-only container (the parseContainerMeta fixture shape)
    val w = new Mp4TestBuilder.BoxWriter
    w.box("ftyp") { w.fourcc("isom"); w.u32(0); w.fourcc("isom") }
    w.box("moov") { w.box("mvhd") { w.u32(0); w.u32(0); w.u32(0); w.u32(1000); w.u32(5000); w.raw(new Array[Byte](80)) } }
    assert(Mp4Demux.demux(w.bytes) === Nil)
  }

  test("mp4 demux: uniform stsz and co64 offsets take the same paths") {
    val w = new Mp4TestBuilder.BoxWriter
    w.box("ftyp") { w.fourcc("isom"); w.u32(0); w.fourcc("isom") }
    val mdatStart = w.bb.position()
    val payload = Array.tabulate(12)(_.toByte) // 3 samples x 4 bytes
    w.box("mdat") { w.raw(payload) }
    w.box("moov") {
      w.box("trak") {
        w.box("tkhd") { w.u32(0); w.u32(0); w.u32(0); w.u32(3); w.raw(new Array[Byte](72)) }
        w.box("mdia") {
          w.box("mdhd") { w.u32(0); w.u32(0); w.u32(0); w.u32(600); w.u32(300); w.u16(0); w.u16(0) }
          w.box("minf") { w.box("stbl") {
            w.box("stsd") { w.u32(0); w.u32(1); w.box("mp4a") { w.raw(new Array[Byte](8)) } }
            w.box("stts") { w.u32(0); w.u32(1); w.u32(3); w.u32(200) }
            w.box("stsc") { w.u32(0); w.u32(1); w.u32(1); w.u32(3); w.u32(1) }
            w.box("stsz") { w.u32(0); w.u32(4); w.u32(3) } // UNIFORM size 4
            w.box("co64") { w.u32(0); w.u32(1); w.u32(0); w.u32(mdatStart + 8) } // 64-bit offset
            // no stss: every sample is a sync sample
          } }
        }
      }
    }
    val got = Mp4Demux.demuxWithPayload(w.bytes)
    assert(got.length === 3)
    assert(got.forall(_._1.codec === "mp4a"))
    assert(got.forall(_._1.size === 4))
    assert(got.forall(_._1.keyframe), "no stss -> all sync")
    assert(got.map(_._1.ptsSec) === Seq(0.0, 200.0 / 600, 400.0 / 600))
    assert(got.flatMap(_._2).toSeq === payload.toSeq)
  }

  test("mp4 demux: version-1 ctts offsets are SIGNED; corrupt counts are capped, not OOM") {
    val w = new Mp4TestBuilder.BoxWriter
    w.box("ftyp") { w.fourcc("isom"); w.u32(0); w.fourcc("isom") }
    val mdatStart = w.bb.position()
    w.box("mdat") { w.raw(Array.tabulate(6)(_.toByte)) } // 2 samples x 3
    w.box("moov") { w.box("trak") {
      w.box("tkhd") { w.u32(0); w.u32(0); w.u32(0); w.u32(1); w.raw(new Array[Byte](72)) }
      w.box("mdia") {
        w.box("mdhd") { w.u32(0); w.u32(0); w.u32(0); w.u32(100); w.u32(200); w.u32(0) }
        w.box("minf") { w.box("stbl") {
          w.box("stsd") { w.u32(0); w.u32(1); w.box("avc1") { w.raw(new Array[Byte](8)) } }
          w.box("stts") { w.u32(0); w.u32(1); w.u32(2); w.u32(100) }
          // VERSION 1 ctts: sample 2 carries a NEGATIVE offset (-50)
          w.box("ctts") { w.bb.put(1.toByte); w.bb.put(new Array[Byte](3))
            w.u32(2); w.u32(1); w.u32(0); w.u32(1); w.u32(-50 & 0xffffffff) }
          w.box("stsc") { w.u32(0); w.u32(1); w.u32(1); w.u32(2); w.u32(1) }
          w.box("stsz") { w.u32(0); w.u32(3); w.u32(2) }
          w.box("stco") { w.u32(0); w.u32(1); w.u32(mdatStart + 8) }
        } }
      }
    } }
    val got = Mp4Demux.demux(w.bytes)
    assert(got.map(_.ptsSec) === Seq(0.0, 0.5), got.map(_.ptsSec)) // (100-50)/100
    // corrupt declared count: stts claiming 0x3FFFFFFF entries must cap at
    // what fits in the box instead of attempting a multi-GB allocation
    val c = new Mp4TestBuilder.BoxWriter
    c.box("ftyp") { c.fourcc("isom"); c.u32(0); c.fourcc("isom") }
    c.box("moov") { c.box("trak") { c.box("mdia") { c.box("minf") { c.box("stbl") {
      c.box("stts") { c.u32(0); c.u32(0x3FFFFFFF); c.u32(1); c.u32(100) }
    } } } } }
    assert(Mp4Demux.demux(c.bytes) === Nil) // parsed, no samples — no OOM
  }

  test("mp4 demux: multi-entry stsd resolves per-chunk codecs via stsc desc index") {
    val w = new Mp4TestBuilder.BoxWriter
    w.box("ftyp") { w.fourcc("isom"); w.u32(0); w.fourcc("isom") }
    val mdatStart = w.bb.position()
    w.box("mdat") { w.raw(Array.tabulate(8)(_.toByte)) } // 4 samples x 2 bytes
    w.box("moov") { w.box("trak") {
      w.box("tkhd") { w.u32(0); w.u32(0); w.u32(0); w.u32(2); w.raw(new Array[Byte](72)) }
      w.box("mdia") {
        w.box("mdhd") { w.u32(0); w.u32(0); w.u32(0); w.u32(100); w.u32(400); w.u32(0) }
        w.box("minf") { w.box("stbl") {
          // TWO sample descriptions: avc1 then hvc1
          w.box("stsd") { w.u32(0); w.u32(2)
            w.box("avc1") { w.raw(new Array[Byte](8)) }
            w.box("hvc1") { w.raw(new Array[Byte](8)) } }
          w.box("stts") { w.u32(0); w.u32(1); w.u32(4); w.u32(100) }
          // chunk 1 (2 samples) uses desc 1 (avc1), chunk 2 uses desc 2 (hvc1)
          w.box("stsc") { w.u32(0); w.u32(2)
            w.u32(1); w.u32(2); w.u32(1)
            w.u32(2); w.u32(2); w.u32(2) }
          w.box("stsz") { w.u32(0); w.u32(2); w.u32(4) } // uniform size 2
          w.box("stco") { w.u32(0); w.u32(2); w.u32(mdatStart + 8); w.u32(mdatStart + 12) }
        } }
      }
    } }
    val got = Mp4Demux.demux(w.bytes)
    assert(got.map(_.codec) === Seq("avc1", "avc1", "hvc1", "hvc1"))
  }

  test("mp4 demux: malformed sibling box poisons the track instead of emitting wrong rows") {
    // same track as buildMp4 but with a box whose size lies BEFORE stss is
    // reached: the old walk aborted silently and every sample came back
    // keyframe=true; the poisoned track must emit NOTHING
    val w = new Mp4TestBuilder.BoxWriter
    w.box("ftyp") { w.fourcc("isom"); w.u32(0); w.fourcc("isom") }
    val mdatStart = w.bb.position()
    w.box("mdat") { w.raw(Array.tabulate(6)(_.toByte)) }
    w.box("moov") { w.box("trak") {
      w.box("tkhd") { w.u32(0); w.u32(0); w.u32(0); w.u32(1); w.raw(new Array[Byte](72)) }
      w.box("mdia") {
        w.box("mdhd") { w.u32(0); w.u32(0); w.u32(0); w.u32(100); w.u32(200); w.u32(0) }
        w.box("minf") { w.box("stbl") {
          w.box("stsd") { w.u32(0); w.u32(1); w.box("avc1") { w.raw(new Array[Byte](8)) } }
          w.box("stts") { w.u32(0); w.u32(1); w.u32(2); w.u32(100) }
          w.box("stsc") { w.u32(0); w.u32(1); w.u32(1); w.u32(2); w.u32(1) }
          w.box("stsz") { w.u32(0); w.u32(3); w.u32(2) }
          w.box("stco") { w.u32(0); w.u32(1); w.u32(mdatStart + 8) }
          // box claiming to extend past its parent -> malformed
          w.u32(0x7FFFFFFF); w.fourcc("free")
          // stss would mark ONLY sample 1 as sync — never reached
          w.box("stss") { w.u32(0); w.u32(1); w.u32(1) }
        } }
      }
    } }
    assert(Mp4Demux.demux(w.bytes) === Nil,
      "partially-parsed sample table must not emit (stss unreached -> all-keyframe lie)")
  }

  test("mp4 demux: mp4Samples Spark op explodes one row per sample") {
    import spark.implicits._
    val (mp4, payloads) = Mp4TestBuilder.buildMp4()
    val df = Seq((31L, mp4), (32L, "garbage".getBytes)).toDF("doc_id", "payload")
    val rows = Multimodal.mp4Samples(spark, df, "doc_id", "payload")
      .orderBy("id", "sample_idx").collect()
    assert(rows.length === 5)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === 31L)
      assert(r.getInt(1) === 7)
      assert(r.getString(2) === "avc1")
      assert(r.getInt(3) === i)
      assert(r.getAs[Array[Byte]]("payload").toSeq === payloads(i).toSeq)
    }
    // keyframe selection — the curation filter this exists for
    val keys = Multimodal.mp4Samples(spark, df, "doc_id", "payload")
      .filter(col("keyframe")).select("sample_idx").as[Int].collect().sorted
    assert(keys === Array(0, 3))
  }
}
