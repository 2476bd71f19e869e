package graft.operators

import Av1Headers.{FrameHeader, SeqHeader}

/** From-scratch AV1 intra (AVIF/still) decoder on the JVM, per the
  * public AV1 bitstream spec: OBU walk → sequence/frame headers
  * ([[Av1Headers]]) → per-tile MSAC decode ([[Av1Msac]], default CDFs
  * from [[Av1Tables]]) → partition tree → intra mode info →
  * coefficient decode → prediction ([[Av1Predict]]) + inverse
  * transform ([[Av1Transform]]) reconstruction, then the full
  * post-filter chain (deblock, CDEF, superres, loop restoration,
  * film grain). Covers every still-AVIF configuration: profiles 0-2,
  * 8/10/12-bit, 4:2:0/4:2:2/4:4:4 and monochrome, keyframe /
  * intra-only streams. Every unsupported feature (screen-content
  * tools, inter frames, ...) refuses loudly by name. Validated
  * bit-exactly against libdav1d golden decodes (Av1DecoderSpec over
  * `src/test/resources/av1/`).
  */
object Av1Decoder {

  // ---------------------------------------------------------- sizes

  // block sizes: (w4, h4) in 4-px units, spec ordering
  val BlkW4: Array[Int] = Array(1, 1, 2, 2, 2, 4, 4, 4, 8, 8, 8, 16, 16, 16, 32, 32, 1, 4, 2, 8, 4, 16)
  val BlkH4: Array[Int] = Array(1, 2, 1, 2, 4, 2, 4, 8, 4, 8, 16, 8, 16, 32, 16, 32, 4, 1, 8, 2, 16, 4)
  val B8x8 = 3; val B16x16 = 6; val B32x32 = 9; val B64x64 = 12; val B128x128 = 15

  // partition types
  val PartNone = 0; val PartHorz = 1; val PartVert = 2; val PartSplit = 3
  val PartHorzA = 4; val PartHorzB = 5; val PartVertA = 6; val PartVertB = 7
  val PartHorz4 = 8; val PartVert4 = 9

  /** subsize for square parent `b` (8..128) under partition `p`; -1 = invalid */
  def partSubsize(p: Int, b: Int): Int = {
    val sq = Array(B8x8, B16x16, B32x32, B64x64, B128x128).indexOf(b)
    require(sq >= 0, s"av1: partition of non-square bsize $b")
    p match {
      case PartNone => b
      case PartHorz | PartHorzA | PartHorzB => Array(2, 5, 8, 11, 14)(sq)
      case PartVert | PartVertA | PartVertB => Array(1, 4, 7, 10, 13)(sq)
      case PartSplit => Array(0, B8x8, B16x16, B32x32, B64x64)(sq)
      case PartHorz4 => Array(-1, 17, 19, 21, -1)(sq)
      case PartVert4 => Array(-1, 16, 18, 20, -1)(sq)
      case _ => -1
    }
  }

  // tx sizes: (w4, h4)
  val TxW4: Array[Int] = Array(1, 2, 4, 8, 16, 1, 2, 2, 4, 4, 8, 8, 16, 1, 4, 2, 8, 4, 16)
  val TxH4: Array[Int] = Array(1, 2, 4, 8, 16, 2, 1, 4, 2, 8, 4, 16, 8, 4, 1, 8, 2, 16, 4)
  /** largest tx fitting each block size */
  val MaxTxSizeRect: Array[Int] = Array(0, 5, 6, 1, 7, 8, 2, 9, 10, 3, 11, 12, 4, 4, 4, 4, 13, 14, 15, 16, 17, 18)
  val MaxTxDepth: Array[Int] = Array(0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 4, 4, 4, 2, 2, 3, 3, 4, 4)
  val SplitTxSize: Array[Int] = Array(0, 0, 1, 2, 3, 0, 0, 1, 1, 2, 2, 3, 3, 5, 6, 7, 8, 9, 10)
  /** square size class 0..4 (4,8,16,32,64) by rounding DOWN */
  val TxSizeSqr: Array[Int] = Array(0, 1, 2, 3, 4, 0, 0, 1, 1, 2, 2, 3, 3, 0, 0, 1, 1, 2, 2)
  /** square size class by rounding UP */
  val TxSizeSqrUp: Array[Int] = Array(0, 1, 2, 3, 4, 1, 1, 2, 2, 3, 3, 4, 4, 2, 2, 3, 3, 4, 4)

  // tx types
  val DctDct = 0; val AdstDct = 1; val DctAdst = 2; val AdstAdst = 3
  val FlipadstDct = 4; val DctFlipadst = 5; val FlipadstFlipadst = 6
  val AdstFlipadst = 7; val FlipadstAdst = 8; val Idtx = 9
  val VDct = 10; val HDct = 11; val VAdst = 12; val HAdst = 13
  val VFlipadst = 14; val HFlipadst = 15

  val TxClass2D = 0; val TxClassHoriz = 1; val TxClassVert = 2
  def txClass(t: Int): Int = t match {
    case VDct | VAdst | VFlipadst => TxClassVert // row-major scan (pinned vs dav1d)
    case HDct | HAdst | HFlipadst => TxClassHoriz // col-major scan
    case _ => TxClass2D
  }

  val TxTypeIntraInvSet1: Array[Int] = Array(Idtx, DctDct, VDct, HDct, AdstAdst, AdstDct, DctAdst)
  val TxTypeIntraInvSet2: Array[Int] = Array(Idtx, DctDct, AdstAdst, AdstDct, DctAdst)

  /** intra prediction mode → implied chroma tx type */
  val Mode2Txfm: Array[Int] = Array(
    DctDct, AdstDct, DctAdst, DctDct, AdstAdst, AdstDct, DctAdst,
    DctAdst, AdstDct, AdstAdst, AdstDct, DctAdst, AdstAdst, DctDct)

  val IntraModeContext: Array[Int] = Array(0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0)

  val SkipContexts: Array[Array[Int]] = Array(
    Array(1, 2, 2, 2, 3), Array(1, 4, 4, 4, 5), Array(1, 4, 4, 4, 5),
    Array(1, 4, 4, 4, 5), Array(1, 4, 4, 4, 6))

  // ------------------------------------------------------ cdf state

  /** Per-tile working CDFs: mutable clones of the defaults, rows
    * normalized so each n-symbol row has n+1 slots (counter last). */
  final class Cdfs(qctx: Int) {
    private def clone2(name: String): Array[Int] = Av1Tables.table(name)._3.clone()
    private def cloneQ(name: String, perQ: Int, stride: Int): Array[Int] = {
      val all = Av1Tables.table(name)._3
      java.util.Arrays.copyOfRange(all, qctx * perQ * stride, (qctx + 1) * perQ * stride)
    }
    val partition: Array[Int] = clone2("partition") // [20] x11
    val kfYMode: Array[Int] = clone2("kf_y_mode") // [5][5] x14
    val uvMode: Array[Int] = clone2("uv_mode") // [2][13] x15
    val angleDelta: Array[Int] = clone2("angle_delta") // [8] x8 (n7 → row has 8 slots: 6 vals,0,count)
    val skip: Array[Int] = clone2("skip") // [3] x3
    val txSize: Array[Int] = clone2("tx_size") // [4][3] x4
    val intraExtTx: Array[Int] = clone2("intra_ext_tx") // [2][4][13] x17
    val cflSign: Array[Int] = {
      val v = Av1Tables.table("cfl_sign")._3 // 8 slots: 7 vals + terminal
      val out = new Array[Int](9); System.arraycopy(v, 0, out, 0, 8); out
    }
    val cflAlpha: Array[Int] = clone2("cfl_alpha") // [6] x17
    val filterIntra: Array[Int] = clone2("filter_intra") // [22 bsize] x3
    val filterIntraMode: Array[Int] = clone2("filter_intra_mode") // [1] x6
    // palette (screen content) families — [7 bsize][3 ctx] / [2 ctx] /
    // [7 bsize] sizes / [7 size][5 ctx] color-index (nsym = sizeIdx+2)
    val paletteYMode: Array[Int] = clone2("palette_y_mode")
    val paletteUvMode: Array[Int] = clone2("palette_uv_mode")
    val paletteYSize: Array[Int] = clone2("palette_y_size")
    val paletteUvSize: Array[Int] = clone2("palette_uv_size")
    val paletteYColor: Array[Int] = clone2("palette_y_color")
    val paletteUvColor: Array[Int] = clone2("palette_uv_color")
    // loop-restoration unit-type CDFs (libaom entropymode.c defaults,
    // located structurally beside the skip families; AV1_LR_CDF env
    // override is the dev pinning hook)
    // defaults = the spec's Default_{Wiener,Sgrproj,Switchable}_Restore_Cdf
    // (AOM_CDF2(11570), AOM_CDF2(16855), AOM_CDF3(9413, 22581)), pinned
    // empirically by the chroma-sync sweep (tools/Av1LrPin) on real
    // libaom LR encodes
    private val lrCdf = sys.props.get("av1.lr.cdf").orElse(sys.env.get("AV1_LR_CDF"))
      .map(_.split(",").map(_.toInt))
      .getOrElse(Array(21198, 15913, 23355, 10187))
    private val lrSwap = sys.env.contains("AV1_LR_SWAP_WS")
    val restoreWiener: Array[Int] = Array(lrCdf(if (lrSwap) 1 else 0), 0, 0)
    val restoreSgrproj: Array[Int] = Array(lrCdf(if (lrSwap) 0 else 1), 0, 0)
    val restoreSwitchable: Array[Int] = Array(lrCdf(2), lrCdf(3), 0, 0)
    val deltaQ: Array[Int] = Array(4608, 648, 91, 0, 0)
    val deltaLf: Array[Int] = Array(4608, 648, 91, 0, 0)
    val deltaLfMulti: Array[Int] = Array.fill(4)(Array(4608, 648, 91, 0, 0)).flatten
    // coefficient families for this qctx
    val txbSkip: Array[Int] = cloneQ("txb_skip", 65, 3) // [5][13] x3
    val eobPt: Array[Array[Int]] = Array( // per eobMultisize 0..6: [2 plane][2 class] rows
      cloneQ("eob_pt_16", 4, 6), cloneQ("eob_pt_32", 4, 7), cloneQ("eob_pt_64", 4, 8),
      cloneQ("eob_pt_128", 4, 9), cloneQ("eob_pt_256", 4, 10), cloneQ("eob_pt_512", 4, 11),
      cloneQ("eob_pt_1024", 4, 12))
    val eobExtra: Array[Int] = cloneQ("eob_extra", 90, 3) // [5][2][9] x3
    val coeffBaseEob: Array[Int] = cloneQ("coeff_base_eob", 40, 4) // [5][2][4] x4
    val coeffBase: Array[Int] = cloneQ("coeff_base", 420, 5) // [5][2][42] x5
    val coeffBr: Array[Int] = cloneQ("coeff_br", 210, 5) // [5][2][21] x5
    val dcSign: Array[Int] = cloneQ("dc_sign", 6, 3) // [2][3] x3
  }

  // ------------------------------------------------------- results

  /** Decoded planes as unsigned pixel values (0 .. (1<<bitDepth)-1),
    * stored in Shorts (8-bit values fit unchanged; 10-bit uses the
    * full positive range). */
  final case class Decoded(width: Int, height: Int, monochrome: Boolean,
      subX: Int, subY: Int, planes: Array[Array[Short]], bitDepth: Int = 8)

  /** Decode a raw OBU still stream (the AVIF item payload shape). */
  def decode(obuBytes: Array[Byte]): Decoded = {
    val obuList = Av1Headers.obus(obuBytes)
    var sh: SeqHeader = null
    var out: Decoded = null
    obuList.foreach { o =>
      o.obuType match {
        case Av1Headers.ObuSequenceHeader =>
          sh = Av1Headers.parseSeqHeader(new Av1Headers.BitReader(obuBytes, o.payloadStart, o.payloadEnd))
        case Av1Headers.ObuFrame if out == null =>
          require(sh != null, "av1: frame before sequence header")
          val r = new Av1Headers.BitReader(obuBytes, o.payloadStart, o.payloadEnd)
          val fh = Av1Headers.parseFrameHeader(r, sh)
          if (sys.env.contains("AV1_TRACE"))
            println(s"[av1] fh-end abs-bitpos=${r.pos * 8 + r.bit} tile-start=${((r.pos * 8 + r.bit) + 7) / 8 * 8}")
          r.byteAlign()
          out = new FrameDecode(sh, fh, obuBytes, r.pos, o.payloadEnd).run()
        case Av1Headers.ObuTemporalDelimiter | Av1Headers.ObuMetadata | Av1Headers.ObuPadding => ()
        case Av1Headers.ObuFrameHeader | Av1Headers.ObuTileGroup =>
          throw new IllegalArgumentException("av1: split frame-header/tile-group layout unsupported (expect OBU_FRAME)")
        case Av1Headers.ObuTileList =>
          throw new IllegalArgumentException("av1: large-scale tile lists unsupported")
        case t => throw new IllegalArgumentException(s"av1: unknown obu type $t")
      }
    }
    require(out != null, "av1: no frame in stream")
    out
  }
}
