package graft.operators

/** AV1 spec constant tables for [[Av1Decoder]], extracted at dev time
  * from the system libaom's read-only data by
  * `tools/extract_av1_tables.py` (structural-signature recovery, same
  * approach as [[Vp8Tables]]/`CcittTables`; anchored on values the
  * public spec prints verbatim — the 8x8 partition CDF, the skip CDFs,
  * the V_PRED angle-delta row — and validated bit-exactly against
  * libdav1d golden decodes by `Av1DecoderSpec`).
  *
  * CDFs use the public AOM inverse representation: for an n-symbol CDF
  * the table row holds n-1 strictly-decreasing values icdf(k) =
  * 32768 - cum(k), a terminal 0, and an adaptation counter (0 in the
  * defaults). Resource layout (little-endian):
  * repeat: [u8 nameLen][name][u16 groups][u16 stride][u16 x groups*stride]
  */
object Av1Tables {

  private val raw: Map[String, (Int, Int, Array[Int])] = {
    val in = getClass.getResourceAsStream("/graft/av1_tables.bin")
    require(in != null, "av1_tables.bin resource missing")
    val bytes =
      try in.readAllBytes()
      finally in.close()
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val m = scala.collection.mutable.Map.empty[String, (Int, Int, Array[Int])]
    while (bb.hasRemaining) {
      val nameLen = bb.get() & 0xff
      val nb = new Array[Byte](nameLen)
      bb.get(nb)
      val groups = bb.getShort() & 0xffff
      val stride = bb.getShort() & 0xffff
      val vals = new Array[Int](groups * stride)
      var i = 0
      while (i < vals.length) { vals(i) = bb.getShort() & 0xffff; i += 1 }
      m(new String(nb, "US-ASCII")) = (groups, stride, vals)
    }
    m.toMap
  }

  /** (groups, stride, values) for a named table. */
  def table(name: String): (Int, Int, Array[Int]) =
    raw.getOrElse(name, throw new IllegalArgumentException(s"av1: unknown table '$name'"))

  /** Flat values of a named table. */
  def values(name: String): Array[Int] = table(name)._3

  /** Self-guided restoration parameter sets (spec Sgr_Params, stored
    * as libaom av1_sgr_params {r0, r1, s0, s1} — s = the precomputed
    * (1<<20)/(n²e) scale; recovered from libaom .rodata @0x47c6e0,
    * validated by the dav1d-arbitrated LR fixtures). */
  val SgrParams: Array[Array[Int]] = Array(
    Array(2, 1, 140, 3236), Array(2, 1, 112, 2158), Array(2, 1, 93, 1618),
    Array(2, 1, 80, 1438), Array(2, 1, 70, 1295), Array(2, 1, 58, 1177),
    Array(2, 1, 47, 1079), Array(2, 1, 37, 996), Array(2, 1, 30, 925),
    Array(2, 1, 25, 863), Array(0, 1, -1, 2589), Array(0, 1, -1, 1618),
    Array(0, 1, -1, 1177), Array(0, 1, -1, 925), Array(2, 0, 56, -1),
    Array(2, 0, 22, -1))

  /** Superres normative upscale filter (spec Upscale_Filter): 64
    * phases x 8 taps, signed, each row sums to 128. */
  val UpscaleFilter: Array[Array[Int]] = {
    val raw = values("upscale_filter")
    Array.tabulate(64, 8) { (p, k) =>
      val v = raw(p * 8 + k)
      if (v > 32767) v - 65536 else v
    }
  }

  // non-CDF spec constants
  val DcQLookup: Array[Int] = values("dc_qlookup")
  val AcQLookup: Array[Int] = values("ac_qlookup")
  val DcQLookup10: Array[Int] = values("dc_qlookup_10")
  val AcQLookup10: Array[Int] = values("ac_qlookup_10")
  val DcQLookup12: Array[Int] = values("dc_qlookup_12")
  val AcQLookup12: Array[Int] = values("ac_qlookup_12")
  val DrIntraDerivative: Array[Int] = values("dr_intra_derivative")
  /** Smooth-prediction weights, concatenated for block dims 4,8,16,32,64. */
  val SmWeights: Array[Int] = values("sm_weights")
  /** Filter-intra taps [5 modes][8 outputs][8 taps] (p0..p6 + pad),
    * sign-extended from the byte-packed table; each row sums to 16. */
  val FilterTaps: Array[Array[Array[Int]]] = {
    val raw = values("filter_taps")
    Array.tabulate(5, 8, 8) { (m, k, j) =>
      val v = raw((m * 8 + k) * 8 + j)
      if (v > 127) v - 256 else v
    }
  }
  def smWeights(dim: Int): Array[Int] = dim match {
    case 4 => SmWeights.slice(0, 4)
    case 8 => SmWeights.slice(4, 12)
    case 16 => SmWeights.slice(12, 28)
    case 32 => SmWeights.slice(28, 60)
    case 64 => SmWeights.slice(60, 124)
    case d => throw new IllegalArgumentException(s"av1: no smooth weights for dim $d")
  }

  /** cos(i*pi/128) in Q12, i in [0,63] — the spec's inverse-transform
    * cosine table is defined by this exact formula. */
  val CosPi: Array[Int] = Array.tabulate(64) { i =>
    math.round(math.cos(i * math.Pi / 128) * 4096).toInt
  }
  /** ADST4 sin constants in Q12 per the spec:
    * sqrt(2) * sin(i*pi/9) * 2/3 (giving 1321/2482/3344/3803). */
  val SinPi: Array[Int] = Array.tabulate(5) { i =>
    math.round(math.sqrt(2) * math.sin(i * math.Pi / 9) * 2 / 3 * 4096).toInt
  }
}
