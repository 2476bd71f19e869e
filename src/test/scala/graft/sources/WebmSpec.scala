package graft.sources

import graft.SparkTestBase

class WebmSpec extends SparkTestBase {
  import spark.implicits._

  private def vp8Chunk(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name.webp")
    require(in != null, s"missing fixture $name")
    val webp = try in.readAllBytes() finally in.close()
    val sz = (webp(16) & 0xff) | ((webp(17) & 0xff) << 8) |
      ((webp(18) & 0xff) << 16) | ((webp(19) & 0xff) << 24)
    java.util.Arrays.copyOfRange(webp, 20, 20 + sz)
  }

  test("mux round-trip with real VP8 payloads: tracks triage + keyframe walk + decode") {
    val f1 = vp8Chunk("one_mb_q60")
    val f2 = vp8Chunk("tiny_5x7_q80")
    val webm = Webm.encodeWebm(Seq(f1, f2, f1), 16, 16, frameMs = 40)
    val (ts, scale) = Webm.tracks(webm)
    assert(scale == 1000000L)
    assert(ts == Seq(Webm.WebmTrack(1, 1, "V_VP8", 16, 16)))
    val kf = Webm.keyFrames(webm, 1)
    assert(kf.map(_._1) == Seq(0L, 40L, 80L))
    assert(kf(0)._2.sameElements(f1) && kf(1)._2.sameElements(f2) && kf(2)._2.sameElements(f1))
    // payloads decode through the validated VP8 decoder
    val y0 = graft.operators.Vp8.decode(kf(0)._2)
    assert(y0.w == 16 && y0.h == 16)
    assert(graft.operators.Vp8.decode(kf(1)._2).w == 5)
  }

  test("lacing: Xiph, fixed-size and EBML blocks unpack to the exact frame payloads") {
    val f1 = vp8Chunk("one_mb_q60")
    val f2 = vp8Chunk("tiny_5x7_q80")
    // Xiph (different sizes; first frame > 255 bytes exercises the
    // 255-saturated size coding if the fixture is large enough)
    for (lacing <- Seq(1, 3)) {
      val webm = Webm.encodeWebmLaced(Seq(f1, f2, f1), 16, 16, lacing)
      val kf = Webm.keyFrames(webm, 1)
      assert(kf.length == 3, s"lacing $lacing")
      assert(kf(0)._2.sameElements(f1) && kf(1)._2.sameElements(f2) && kf(2)._2.sameElements(f1),
        s"lacing $lacing payloads")
      assert(kf.map(_._1) == Seq(0L, 0L, 0L)) // laced frames share the block ts
      // payloads still decode through the validated VP8 decoder
      assert(graft.operators.Vp8.decode(kf(1)._2).w == 5)
    }
    // fixed-size needs equal frames
    val fixed = Webm.encodeWebmLaced(Seq(f2, f2, f2, f2), 5, 7, lacing = 2)
    val kf2 = Webm.keyFrames(fixed, 1)
    assert(kf2.length == 4 && kf2.forall(_._2.sameElements(f2)))
    // corrupt lacing is loud: truncate inside the lace sizes
    val webm = Webm.encodeWebmLaced(Seq(f1, f2), 16, 16, lacing = 1)
    val cut = java.util.Arrays.copyOfRange(webm, 0, webm.length - f2.length - 4)
    intercept[Exception](Webm.keyFrames(cut, 1))
  }

  test("non-keyframe SimpleBlocks are skipped; BlockGroup keyframe = no ReferenceBlock") {
    val f = vp8Chunk("one_mb_q60")
    val webm = Webm.encodeWebm(Seq(f, f), 16, 16)
    // clear the keyframe flag of the SECOND SimpleBlock: find its flags
    // byte by scanning for the block header pattern (0x81, rel, rel, 0x80)
    val patched = webm.clone()
    var found = 0
    var i = 0
    while (i < patched.length - 3) {
      if (patched(i) == 0x81.toByte && patched(i + 3) == 0x80.toByte &&
        ((patched(i + 1) & 0xff) << 8 | (patched(i + 2) & 0xff)) == 40) {
        patched(i + 3) = 0 // drop keyframe flag
        found += 1
      }
      i += 1
    }
    assert(found == 1, s"expected one frame-40 block header, found $found")
    assert(Webm.keyFrames(patched, 1).map(_._1) == Seq(0L))
  }

  test("frames(): map-only Spark extraction; non-VP8 codec markers; corrupt quarantine") {
    val f = vp8Chunk("tiny_5x7_q80")
    val good = Webm.encodeWebm(Seq(f), 5, 7)
    val vp9 = Webm.encodeWebm(Seq(f), 5, 7, codec = "V_VP9")
    val bad = "not webm at all".getBytes("US-ASCII")
    val ds = Seq(Webm.WebmFile(1, good), Webm.WebmFile(2, vp9), Webm.WebmFile(3, bad)).toDS()
    val kept = Webm.frames(ds, keepCorrupt = true).collect().sortBy(_.id)
    assert(kept.length == 3)
    assert(kept(0).error == null && kept(0).width == 5 && kept(0).height == 7 && kept(0).luma_sum > 0)
    assert(kept(1).error != null && kept(1).error.contains("V_VP9"))
    assert(kept(2).error != null && kept(2).frame == -1)
    intercept[org.apache.spark.SparkException](Webm.frames(ds).collect())
    val plan = Webm.frames(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"WebM extraction must stay map-only:\n$plan")
  }
}
