package graft.sources

import graft.SparkTestBase
import graft.operators.{Jpeg, Media}

class Mp4Spec extends SparkTestBase {
  import spark.implicits._

  private def tile(f: Int, w: Int = 72, h: Int = 64): Array[Int] =
    Array.tabulate(w * h)(p => (((p % w) / 8) * 13 + ((p / w) / 8) * 29 + f * 17) % 256)

  private def mp4(n: Int, fps: Int = 10, syncEvery: Int = 1, w: Int = 72, h: Int = 64) =
    Mp4.encodeMp4Jpeg(w, h, (0 until n).map(f => Jpeg.encodeGray(w, h, tile(f, w, h))),
      fps, syncEvery)

  test("track metadata: codec, dims, timescale, duration, samples, sync cadence") {
    val t = Mp4.tracks(mp4(7, fps = 25, syncEvery = 3)) match { case Seq(t) => t }
    assert(t.trackId == 1L && t.handler == "vide" && t.codec == "jpeg")
    assert(t.width == 72 && t.height == 64)
    assert(t.timescale == 25000L && t.duration == 7000L) // 7 frames at delta 1000
    assert(t.nSamples == 7L && t.nSync == 3L) // frames 1, 4, 7
    assert(t.mediaBytes > 0L)
  }

  test("stss absent means every sample is sync (spec default)") {
    val t = Mp4.tracks(mp4(5, syncEvery = 1)).head
    assert(t.nSamples == 5L && t.nSync == 5L)
  }

  test("sample resolve round-trips every frame through stsc two-per-chunk packing") {
    // odd count → last chunk is short; the open-ended stsc run must still resolve it
    for (n <- Seq(1, 2, 5, 8)) {
      val (codec, samples) = Mp4.videoSamples(mp4(n))
      assert(codec == "jpeg" && samples.length == n, s"n=$n")
      samples.zipWithIndex.foreach { case ((bytes, sync), i) =>
        assert(sync, s"n=$n frame=$i")
        val (w, h, px) = Jpeg.decode(bytes)
        assert((w, h) == (72, 64))
        assert(px.toSeq == Jpeg.decode(Jpeg.encodeGray(72, 64, tile(i))).decodedPx, s"n=$n frame=$i")
      }
    }
  }

  test("mp4Frames decodes the jpeg track; DHT-less samples get the Annex-K splice") {
    val frames = (0 until 3).map(f =>
      Jpeg.encodeGray(72, 64, tile(f), stdHuffman = true, omitDht = true))
    val got = Mp4.mp4Frames(Mp4.encodeMp4Jpeg(72, 64, frames))
    assert(got.length == 3)
    got.zipWithIndex.foreach { case ((w, h, px), f) =>
      assert((w, h) == (72, 64))
      assert(px.toSeq == Jpeg.decode(Jpeg.encodeGray(72, 64, tile(f))).decodedPx, s"frame $f")
    }
  }

  test("autoFrames dispatches ftyp magic; three containers, identical pixels") {
    val frames = (0 until 3).map(f => tile(f))
    val viaMp4 = Media.autoFrames(
      Mp4.encodeMp4Jpeg(72, 64, frames.map(Jpeg.encodeGray(72, 64, _))))
    val viaAvi = Media.autoFrames(
      Media.encodeAviMjpeg(72, 64, frames.map(Jpeg.encodeGray(72, 64, _))))
    assert(viaMp4.length == 3 && viaAvi.length == 3)
    viaMp4.zip(viaAvi).foreach { case ((w1, h1, p1), (w2, h2, p2)) =>
      assert((w1, h1) == (w2, h2) && p1.toSeq == p2.toSeq)
    }
  }

  test("non-decodable codecs refuse BY NAME; corrupt boxes refuse loudly") {
    // rewrite the sample-entry fourcc to avc1: metadata still reads, decode names the codec
    val p = mp4(2)
    val idx = indexOfSlice(p, "jpeg".getBytes("US-ASCII"))
    assert(idx > 0)
    val avc = p.clone()
    System.arraycopy("avc1".getBytes("US-ASCII"), 0, avc, idx, 4)
    assert(Mp4.tracks(avc).head.codec == "avc1")
    val e = intercept[IllegalArgumentException](Mp4.mp4Frames(avc))
    assert(e.getMessage.contains("avc1"))
    intercept[IllegalArgumentException](Mp4.tracks("not an mp4 at all".getBytes("US-ASCII")))
    // truncating inside moov must not loop or silently succeed
    intercept[Exception](Mp4.tracks(p.take(p.length - 40)))
  }

  test("pdqFrames over mixed AVI + MP4 + GIF payloads hashes uniformly via autoFrames") {
    val frames = (0 until 2).map(f => tile(f))
    val items = Seq(
      Media.MediaItem(1L, "video", Mp4.encodeMp4Jpeg(72, 64, frames.map(Jpeg.encodeGray(72, 64, _)))),
      Media.MediaItem(2L, "video", Media.encodeAviMjpeg(72, 64, frames.map(Jpeg.encodeGray(72, 64, _)))),
      Media.MediaItem(3L, "video", "nope".getBytes("US-ASCII"))).toDS()
    val got = Media.pdqFrames(items, Media.autoFrames, keepUndecodable = true)
      .collect().sortBy(r => (r.id, r.frame_no))
    val mp4Hashes = got.filter(_.id == 1L).map(r => (r.frame_no, r.pdq_hex)).toSeq
    val aviHashes = got.filter(_.id == 2L).map(r => (r.frame_no, r.pdq_hex)).toSeq
    assert(mp4Hashes.nonEmpty && mp4Hashes == aviHashes) // container-invariant identity
    assert(got.filter(_.id == 3L).map(_.pdq_hex).toSeq == Seq(null)) // quarantined
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      if (needle.indices.forall(j => hay(i + j) == needle(j))) return i
      i += 1
    }
    -1
  }

  private implicit class DecodedOps(t: (Int, Int, Array[Int])) {
    def decodedPx: Seq[Int] = t._3.toSeq
  }
}
