package graft.operators

class ExifGpsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def baseJpeg: Array[Byte] = {
    val w = 72; val h = 64
    val gray = Array.tabulate(w * h)(p => ((p % w) / 8 * 13 + (p / w) / 8 * 29) % 256)
    Jpeg.encodeGray(w, h, gray)
  }

  test("gps read-back: signed hemispheres, exact micro-arc-seconds") {
    val lat = 37L * 3600 + 46 * 60 + 30   // 37 deg 46' 30" N
    val lon = -(122L * 3600 + 25 * 60 + 6) // 122 deg 25' 6" W
    val tagged = Jpeg.withExifGps(baseJpeg, lat, lon)
    assert(Jpeg.gpsArcsecMicro(tagged).contains((lat * 1000000L, lon * 1000000L)))
    assert(Jpeg.gpsArcsecMicro(baseJpeg).isEmpty)
  }

  test("stripGps: location unreadable AND zeroed; pixels untouched; idempotent") {
    val lat = -(5L * 3600 + 59 * 60 + 59)
    val lon = 179L * 3600 + 1
    val tagged = Jpeg.withExifGps(baseJpeg, lat, lon)
    val (clean, had) = Jpeg.stripGps(tagged)
    assert(had)
    assert(Jpeg.gpsArcsecMicro(clean).isEmpty)
    // the coordinate rationals must be GONE from the bytes, not merely
    // unlinked: 179 deg = 0x000000B3 big-endian appears in the tagged
    // payload's GPS values and nowhere in the cleaned one
    def count(p: Array[Byte], v: Int): Int =
      p.sliding(4).count(w => ((w(0) & 0xff) << 24 | (w(1) & 0xff) << 16 |
        (w(2) & 0xff) << 8 | (w(3) & 0xff)) == v)
    assert(count(tagged, 179) > count(clean, 179))
    assert(Jpeg.decode(clean).productIterator.toSeq.lastOption.map(_.asInstanceOf[Array[Int]].toSeq)
      == Jpeg.decode(tagged).productIterator.toSeq.lastOption.map(_.asInstanceOf[Array[Int]].toSeq))
    // idempotent and a no-op on clean inputs (same-instance return)
    val (again, had2) = Jpeg.stripGps(clean)
    assert(!had2 && (again eq clean))
    val noGps = baseJpeg
    val (same, had3) = Jpeg.stripGps(noGps)
    assert(!had3 && (same eq noGps))
  }
}
