package graft.operators

/** AV1 OBU + header parsing for the intra/still decode path
  * ([[Av1Decoder]]), per the public AV1 bitstream spec §5. Plain
  * big-endian bit reads (f(n)/uvlc/leb128/su) — no arithmetic coding
  * in headers. Parses sequence + frame headers for keyframe /
  * intra-only streams (the AVIF shape) and refuses, loudly and by
  * name, every feature outside the supported envelope (inter frames,
  * superres, segmentation, quantizer matrices, film grain, >8-bit).
  */
object Av1Headers {

  final class BitReader(val data: Array[Byte], var pos: Int, val end: Int) {
    var bit = 0
    def f(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        require(pos < end, "av1: truncated header")
        v = (v << 1) | ((data(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def su(n: Int): Int = { // sign bit + magnitude (spec su(1+n))
      val v = f(n)
      if (f(1) == 1) -v else v
    }
    def uvlc(): Int = {
      var lz = 0
      while (f(1) == 0) { lz += 1; require(lz < 32, "av1: uvlc overflow") }
      if (lz == 0) 0 else (1 << lz) - 1 + f(lz)
    }
    def ns(n: Int): Int = { // non-symmetric: spec 4.10.7
      val w = 32 - Integer.numberOfLeadingZeros(n)
      val m = (1 << w) - n
      val v = f(w - 1)
      if (v < m) v else (v << 1) - m + f(1)
    }
    def byteAlign(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  def leb128(data: Array[Byte], at: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    var more = true
    while (more) {
      require(at + i < data.length && i < 8, "av1: bad leb128")
      val b = data(at + i) & 0xff
      v |= (b & 0x7fL) << (7 * i)
      more = (b & 0x80) != 0
      i += 1
    }
    (v, i)
  }

  case class Obu(obuType: Int, payloadStart: Int, payloadEnd: Int)

  val ObuSequenceHeader = 1
  val ObuTemporalDelimiter = 2
  val ObuFrameHeader = 3
  val ObuTileGroup = 4
  val ObuMetadata = 5
  val ObuFrame = 6
  val ObuRedundantFrameHeader = 7
  val ObuTileList = 8
  val ObuPadding = 15

  /** Walk the OBU stream; sizes must be present (AVIF/libaom shape). */
  def obus(data: Array[Byte]): Seq[Obu] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Obu]
    var at = 0
    while (at < data.length) {
      val hdr = data(at) & 0xff
      require((hdr & 0x80) == 0, "av1: obu forbidden bit set")
      val t = (hdr >> 3) & 0xf
      val ext = (hdr >> 2) & 1
      val hasSize = (hdr >> 1) & 1
      var p = at + 1
      if (ext == 1) p += 1
      require(hasSize == 1, "av1: obu without size field unsupported")
      val (sz, n) = leb128(data, p)
      p += n
      require(p + sz <= data.length, "av1: truncated obu")
      out += Obu(t, p, p + sz.toInt)
      at = p + sz.toInt
    }
    out.toSeq
  }

  case class SeqHeader(
      profile: Int,
      stillPicture: Boolean,
      reducedStillPicture: Boolean,
      maxWidth: Int,
      maxHeight: Int,
      frameWidthBits: Int,
      frameHeightBits: Int,
      frameIdNumbersPresent: Boolean,
      deltaFrameIdLength: Int,
      additionalFrameIdLength: Int,
      use128x128Superblock: Boolean,
      enableFilterIntra: Boolean,
      enableIntraEdgeFilter: Boolean,
      forceScreenContentTools: Int, // 0/1 fixed, 2 = per-frame choice
      forceIntegerMv: Int, // 0/1 fixed, 2 = per-frame choice
      orderHintBits: Int,
      enableSuperres: Boolean,
      enableCdef: Boolean,
      enableRestoration: Boolean,
      monochrome: Boolean,
      subsamplingX: Int,
      subsamplingY: Int,
      separateUvDeltaQ: Boolean,
      filmGrainPresent: Boolean,
      bitDepth: Int = 8)

  def parseSeqHeader(r: BitReader): SeqHeader = {
    val profile = r.f(3)
    require(profile <= 2, s"av1: bad seq_profile $profile")
    val still = r.f(1) == 1
    val reduced = r.f(1) == 1
    var forceScreen = 2
    if (reduced) {
      r.f(5) // seq_level_idx[0]
    } else {
      val timingPresent = r.f(1) == 1
      require(!timingPresent, "av1: timing_info unsupported (not a still stream)")
      val initialDisplayDelay = r.f(1) == 1
      val opCnt = r.f(5) + 1
      var i = 0
      while (i < opCnt) {
        r.f(12) // operating_point_idc
        val level = r.f(5)
        if (level > 7) r.f(1) // seq_tier
        if (initialDisplayDelay && r.f(1) == 1) r.f(4)
        i += 1
      }
    }
    val wBits = r.f(4) + 1
    val hBits = r.f(4) + 1
    val maxW = r.f(wBits) + 1
    val maxH = r.f(hBits) + 1
    var frameIdNumbers = false
    var deltaFrameIdLen = 0
    var addFrameIdLen = 0
    if (!reduced) {
      frameIdNumbers = r.f(1) == 1
      if (frameIdNumbers) {
        deltaFrameIdLen = r.f(4) + 2
        addFrameIdLen = r.f(3) + 1
      }
    }
    val use128 = r.f(1) == 1
    val filterIntra = r.f(1) == 1
    val intraEdge = r.f(1) == 1
    var forceIntegerMv = 2
    var orderHintBits = 0
    if (!reduced) {
      // inter-only enable bits: values irrelevant for intra decode but
      // the bit positions matter
      r.f(1) // enable_interintra_compound
      r.f(1) // enable_masked_compound
      r.f(1) // enable_warped_motion
      r.f(1) // enable_dual_filter
      val enableOrderHint = r.f(1) == 1
      if (enableOrderHint) {
        r.f(1) // enable_jnt_comp
        r.f(1) // enable_ref_frame_mvs
      }
      forceScreen = if (r.f(1) == 1) 2 else r.f(1)
      forceIntegerMv = if (forceScreen > 0) { if (r.f(1) == 1) 2 else r.f(1) } else 2
      if (enableOrderHint) orderHintBits = r.f(3) + 1
    }
    val enableSuperres = r.f(1) == 1
    val enableCdef = r.f(1) == 1
    val enableRestoration = r.f(1) == 1
    // color_config (spec 5.5.2): BitDepth from high_bitdepth (+
    // twelve_bit for profile 2)
    val highBitdepth = r.f(1) == 1
    val bitDepth =
      if (profile == 2 && highBitdepth) { if (r.f(1) == 1) 12 else 10 }
      else if (highBitdepth) 10
      else 8
    val mono = if (profile != 1) r.f(1) == 1 else false
    var subX = 1
    var subY = 1
    if (r.f(1) == 1) { // color_description_present
      val cp = r.f(8); val tc = r.f(8); val mc = r.f(8)
      if (!mono && cp == 1 && tc == 13 && mc == 0) {
        subX = 0; subY = 0
        // color_range implied 1; no further reads
      } else {
        r.f(1) // color_range
        if (mono) { subX = 1; subY = 1 }
        else if (profile == 0) { subX = 1; subY = 1 }
        else if (profile == 1) { subX = 0; subY = 0 }
        else if (bitDepth == 12) { // profile 2, 12-bit: coded subsampling
          subX = r.f(1)
          subY = if (subX == 1) r.f(1) else 0
        } else { // profile 2, 8/10-bit is always 4:2:2
          subX = 1; subY = 0
        }
        if (!mono && subX == 1 && subY == 1) r.f(2) // chroma_sample_position
      }
    } else {
      r.f(1) // color_range
      if (mono) { subX = 1; subY = 1 }
      else if (profile == 0) { subX = 1; subY = 1 }
      else if (profile == 1) { subX = 0; subY = 0 }
      else if (bitDepth == 12) {
        subX = r.f(1)
        subY = if (subX == 1) r.f(1) else 0
      } else { subX = 1; subY = 0 }
      if (!mono && subX == 1 && subY == 1) r.f(2)
    }
    val separateUv = if (mono) false else r.f(1) == 1
    val filmGrain = r.f(1) == 1
    SeqHeader(profile, still, reduced, maxW, maxH, wBits, hBits,
      frameIdNumbers, deltaFrameIdLen, addFrameIdLen,
      use128, filterIntra, intraEdge, forceScreen, forceIntegerMv, orderHintBits,
      enableSuperres, enableCdef, enableRestoration,
      mono, subX, subY, separateUv, filmGrain, bitDepth)
  }

  case class CdefParams(damping: Int, bits: Int,
      yPri: Array[Int], ySec: Array[Int], uvPri: Array[Int], uvSec: Array[Int])

  case class FrameHeader(
      width: Int, // DECODE (post-superres-downscale) width
      height: Int,
      upscaledWidth: Int, // output width (== width without superres)
      superresDenom: Int, // 8 when superres off
      disableCdfUpdate: Boolean,
      allowScreenContentTools: Boolean,
      allowIntrabc: Boolean,
      baseQIdx: Int,
      deltaQYDc: Int, deltaQUDc: Int, deltaQUAc: Int, deltaQVDc: Int, deltaQVAc: Int,
      deltaQPresent: Boolean, deltaQRes: Int,
      deltaLfPresent: Boolean, deltaLfRes: Int, deltaLfMulti: Boolean,
      codedLossless: Boolean,
      filterLevel: Array[Int], // y-v, y-h, u, v
      sharpness: Int,
      filterDeltaEnabled: Boolean,
      refDeltaIntra: Int, // loop_filter_ref_deltas[INTRA_FRAME] (default 1)
      cdef: Option[CdefParams],
      lrType: Array[Int], // per plane: RestoreNone/Switchable/Wiener/Sgrproj
      lrUnitSize: Array[Int], // per plane, in PLANE pixels (64/128/256 luma)
      txModeSelect: Boolean,
      reducedTxSet: Boolean,
      filmGrain: Option[Av1FilmGrain.Params],
      tileColsLog2: Int, tileRowsLog2: Int,
      tileColStarts: Array[Int], tileRowStarts: Array[Int], // in superblocks
      tileSizeBytes: Int)

  final val RestoreNone = 0
  final val RestoreSwitchable = 1
  final val RestoreWiener = 2
  final val RestoreSgrproj = 3

  /** Parse an (intra) frame header. `sh` from the same stream. */
  def parseFrameHeader(r: BitReader, sh: SeqHeader): FrameHeader = {
    var disableCdfUpdate = false
    var allowScreen = false
    var frameSizeOverride = false
    var errorResilient = false
    if (sh.reducedStillPicture) {
      // KEY frame, shown
      disableCdfUpdate = r.f(1) == 1
      allowScreen = if (sh.forceScreenContentTools == 2) r.f(1) == 1 else sh.forceScreenContentTools == 1
    } else {
      val showExisting = r.f(1) == 1
      require(!showExisting, "av1: show_existing_frame unsupported")
      val frameType = r.f(2)
      require(frameType == 0 || frameType == 2,
        s"av1: only KEY/INTRA_ONLY frames supported (got type $frameType)")
      val showFrame = r.f(1) == 1
      if (!showFrame) r.f(1) // showable_frame
      errorResilient =
        if (frameType == 3 || (frameType == 0 && showFrame)) true
        else r.f(1) == 1
      disableCdfUpdate = r.f(1) == 1
      allowScreen = if (sh.forceScreenContentTools == 2) r.f(1) == 1 else sh.forceScreenContentTools == 1
      if (allowScreen && sh.forceIntegerMv == 2) r.f(1) // force_integer_mv
      if (sh.frameIdNumbersPresent) r.f(sh.deltaFrameIdLength + sh.additionalFrameIdLength)
      frameSizeOverride = r.f(1) == 1
      r.f(sh.orderHintBits) // order_hint (0 bits when order hints disabled)
      // refresh_frame_flags is coded for every frame EXCEPT a shown
      // key frame (spec 5.9.2: frame_type != KEY_FRAME || !show_frame);
      // a non-shown key frame (type 0, show_frame 0) carries it too.
      if (frameType == 0 && showFrame) {
        // shown key frame: refresh_frame_flags implied all-ones, not coded
      } else {
        r.f(8) // refresh_frame_flags (INTRA_ONLY or non-shown KEY)
      }
    }
    // frame_size()
    var w = sh.maxWidth
    var h = sh.maxHeight
    if (frameSizeOverride) {
      w = r.f(sh.frameWidthBits) + 1
      h = r.f(sh.frameHeightBits) + 1
    }
    // superres_params (spec 5.9.8): the parsed width is the UPSCALED
    // width; the frame DECODES at the downscaled width and a normative
    // horizontal resample restores it (spec 7.16, Av1FrameDecode)
    val upscaledWidth = w
    var superresDenom = 8 // SUPERRES_NUM
    if (sh.enableSuperres && r.f(1) == 1) {
      superresDenom = r.f(3) + 9 // SUPERRES_DENOM_MIN
      w = (upscaledWidth * 8 + (superresDenom / 2)) / superresDenom
    }
    if (r.f(1) == 1) { // render_and_frame_size_different
      r.f(16); r.f(16)
    }
    var allowIntrabc = false
    if (allowScreen) {
      allowIntrabc = r.f(1) == 1
      require(!allowIntrabc, "av1: intra block copy unsupported")
    }
    if (!sh.reducedStillPicture && !disableCdfUpdate) r.f(1) // disable_frame_end_update_cdf
    // tile_info()
    val sbShift = if (sh.use128x128Superblock) 5 else 4
    val sbSizeLog2 = if (sh.use128x128Superblock) 7 else 6
    val miCols = 2 * ((w + 7) >> 3)
    val miRows = 2 * ((h + 7) >> 3)
    val sbCols = (miCols + (1 << sbShift) - 1) >> sbShift
    val sbRows = (miRows + (1 << sbShift) - 1) >> sbShift
    val sbSize = sbShift + 2
    val maxTileWidthSb = 4096 >> sbSizeLog2
    val maxTileAreaSb = (4096 * 2304) >> (2 * sbSizeLog2)
    val minLog2TileCols = tileLog2(maxTileWidthSb, sbCols)
    val maxLog2TileCols = tileLog2(1, math.min(sbCols, 64))
    val maxLog2TileRows = tileLog2(1, math.min(sbRows, 64))
    val minLog2Tiles = math.max(minLog2TileCols, tileLog2(maxTileAreaSb, sbRows * sbCols))
    var tileColsLog2 = 0
    var tileRowsLog2 = 0
    var colStarts = Array(0, sbCols)
    var rowStarts = Array(0, sbRows)
    if (r.f(1) == 1) { // uniform_tile_spacing_flag
      tileColsLog2 = minLog2TileCols
      while (tileColsLog2 < maxLog2TileCols && r.f(1) == 1) tileColsLog2 += 1
      val tileWidthSb = (sbCols + (1 << tileColsLog2) - 1) >> tileColsLog2
      colStarts = (0 until sbCols by tileWidthSb).toArray :+ sbCols
      val minLog2TileRows = math.max(minLog2Tiles - tileColsLog2, 0)
      tileRowsLog2 = minLog2TileRows
      while (tileRowsLog2 < maxLog2TileRows && r.f(1) == 1) tileRowsLog2 += 1
      val tileHeightSb = (sbRows + (1 << tileRowsLog2) - 1) >> tileRowsLog2
      rowStarts = (0 until sbRows by tileHeightSb).toArray :+ sbRows
    } else {
      val cs = scala.collection.mutable.ArrayBuffer(0)
      var startSb = 0
      var widestW = 0
      while (startSb < sbCols) {
        val width = r.ns(math.min(sbCols - startSb, maxTileWidthSb)) + 1
        widestW = math.max(widestW, width)
        startSb += width
        cs += startSb
      }
      colStarts = cs.toArray
      tileColsLog2 = tileLog2(1, cs.length - 1)
      val maxTileAreaSb2 = if (minLog2Tiles > 0) maxTileAreaSb >> (minLog2Tiles + 1) else maxTileAreaSb
      val maxTileHeightSb = math.max(maxTileAreaSb2 / widestW, 1)
      val rs = scala.collection.mutable.ArrayBuffer(0)
      startSb = 0
      while (startSb < sbRows) {
        val height = r.ns(math.min(sbRows - startSb, maxTileHeightSb)) + 1
        startSb += height
        rs += startSb
      }
      rowStarts = rs.toArray
      tileRowsLog2 = tileLog2(1, rs.length - 1)
    }
    var tileSizeBytes = 1
    if (tileColsLog2 > 0 || tileRowsLog2 > 0) {
      r.f(tileColsLog2 + tileRowsLog2) // context_update_tile_id
      tileSizeBytes = r.f(2) + 1
    }
    // quantization_params()
    val baseQIdx = r.f(8)
    def readDeltaQ(): Int = if (r.f(1) == 1) r.su(6) else 0
    val dqYDc = readDeltaQ()
    var dqUDc = 0; var dqUAc = 0; var dqVDc = 0; var dqVAc = 0
    if (!sh.monochrome) {
      val diffUv = if (sh.separateUvDeltaQ) r.f(1) == 1 else false
      dqUDc = readDeltaQ(); dqUAc = readDeltaQ()
      if (diffUv) { dqVDc = readDeltaQ(); dqVAc = readDeltaQ() }
      else { dqVDc = dqUDc; dqVAc = dqUAc }
    }
    require(r.f(1) == 0, "av1: quantizer matrices unsupported")
    // segmentation_params()
    require(r.f(1) == 0, "av1: segmentation unsupported")
    // delta_q_params()
    var deltaQPresent = false
    var deltaQRes = 0
    if (baseQIdx > 0) deltaQPresent = r.f(1) == 1
    if (deltaQPresent) deltaQRes = r.f(2)
    // delta_lf_params()
    var deltaLfPresent = false
    var deltaLfRes = 0
    var deltaLfMulti = false
    if (deltaQPresent) {
      if (!allowIntrabc) deltaLfPresent = r.f(1) == 1
      if (deltaLfPresent) { deltaLfRes = r.f(2); deltaLfMulti = r.f(1) == 1 }
    }
    val codedLossless = baseQIdx == 0 && dqYDc == 0 && dqUDc == 0 && dqUAc == 0 &&
      dqVDc == 0 && dqVAc == 0
    // loop_filter_params()
    val filterLevel = Array(0, 0, 0, 0)
    var sharpness = 0
    var filterDeltaEnabled = false
    var refDeltaIntra = 1 // spec default loop_filter_ref_deltas[INTRA_FRAME]
    if (!codedLossless && !allowIntrabc) {
      if (sys.env.contains("AV1_TRACE"))
        println(s"[av1] lfparams abs-bitpos=${r.pos * 8 + r.bit}")
      filterLevel(0) = r.f(6)
      filterLevel(1) = r.f(6)
      if (!sh.monochrome && (filterLevel(0) > 0 || filterLevel(1) > 0)) {
        filterLevel(2) = r.f(6)
        filterLevel(3) = r.f(6)
      }
      sharpness = r.f(3)
      filterDeltaEnabled = r.f(1) == 1
      if (filterDeltaEnabled) { // delta_enabled
        if (r.f(1) == 1) { // delta_update
          // intra decode uses only ref_deltas[INTRA_FRAME] (slot 0):
          // retain it so deblock applies the coded value, not the
          // default. Slots 1..7 and the mode deltas never apply to
          // intra blocks (spec 7.14.4 mode deltas key on inter modes).
          var i = 0
          while (i < 8) {
            if (r.f(1) == 1) { val d = r.su(6); if (i == 0) refDeltaIntra = d }
            i += 1
          }
          i = 0
          while (i < 2) { if (r.f(1) == 1) r.su(6); i += 1 }
        }
      }
    }
    // cdef_params()
    var cdef: Option[CdefParams] = None
    if (!codedLossless && !allowIntrabc && sh.enableCdef) {
      val damping = r.f(2) + 3
      val bits = r.f(2)
      val n = 1 << bits
      val yPri = new Array[Int](n); val ySec = new Array[Int](n)
      val uvPri = new Array[Int](n); val uvSec = new Array[Int](n)
      var i = 0
      while (i < n) {
        yPri(i) = r.f(4)
        ySec(i) = { val s = r.f(2); if (s == 3) 4 else s }
        if (!sh.monochrome) {
          uvPri(i) = r.f(4)
          uvSec(i) = { val s = r.f(2); if (s == 3) 4 else s }
        }
        i += 1
      }
      cdef = Some(CdefParams(damping, bits, yPri, ySec, uvPri, uvSec))
    }
    // lr_params() (spec 5.9.20): Remap_Lr_Type maps the coded 2-bit
    // field to {NONE, SWITCHABLE, WIENER, SGRPROJ}
    val lrType = Array(0, 0, 0)
    var lrUnitSize = Array(256, 256, 256)
    if (sys.env.contains("AV1_TRACE"))
      println(s"[av1] lrparams abs-bitpos=${r.pos * 8 + r.bit} seqLr=${sh.enableRestoration}")
    if (!codedLossless && !allowIntrabc && sh.enableRestoration) {
      val remap = Array(RestoreNone, RestoreSwitchable, RestoreWiener, RestoreSgrproj)
      var usesLr = false
      var usesChromaLr = false
      val np = if (sh.monochrome) 1 else 3
      var p = 0
      while (p < np) {
        lrType(p) = remap(r.f(2))
        if (lrType(p) != RestoreNone) { usesLr = true; if (p > 0) usesChromaLr = true }
        p += 1
      }
      if (usesLr) {
        var lrUnitShift =
          if (sh.use128x128Superblock) 1 + r.f(1)
          else { val s0 = r.f(1); if (s0 == 1) 1 + r.f(1) else 0 }
        val ySize = 256 >> (2 - lrUnitShift)
        val lrUvShift =
          if (sh.subsamplingX == 1 && sh.subsamplingY == 1 && usesChromaLr) r.f(1) else 0
        lrUnitSize = Array(ySize, ySize >> lrUvShift, ySize >> lrUvShift)
      }
      if (sys.env.contains("AV1_TRACE"))
        println(s"[av1] lrparams end-bitpos=${r.pos * 8 + r.bit} types=${lrType.mkString(",")} sizes=${lrUnitSize.mkString(",")}")
    }
    // read_tx_mode()
    val txModeSelect = if (codedLossless) false else r.f(1) == 1
    // frame_reference_mode: intra → no read; skip_mode: not allowed → no read
    // allow_warped_motion: intra → no read
    val reducedTxSet = r.f(1) == 1
    // global_motion_params: intra → none
    // film_grain_params (spec 5.9.30) — the last frame-header fields;
    // synthesis pinned bit-exact vs dav1d (Av1FilmGrain)
    var filmGrain: Option[Av1FilmGrain.Params] = None
    if (sh.filmGrainPresent) {
      // show_frame is true for the still-frame shapes this decoder
      // accepts (non-shown frames refuse upstream)
      if (r.f(1) == 1) { // apply_grain
        val seed = r.f(16)
        // KEY/INTRA_ONLY: update_grain implicit 1 (no load path)
        val numY = r.f(4)
        require(numY <= 14, "av1: film grain num_y_points > 14")
        val yPts = Array.fill(numY) { Array(r.f(8), r.f(8)) }
        val csfl = if (sh.monochrome) false else r.f(1) == 1
        var cbPts = Array.empty[Array[Int]]
        var crPts = Array.empty[Array[Int]]
        if (!(sh.monochrome || csfl ||
          (sh.subsamplingX == 1 && sh.subsamplingY == 1 && numY == 0))) {
          val nCb = r.f(4)
          require(nCb <= 10, "av1: film grain num_cb_points > 10")
          cbPts = Array.fill(nCb) { Array(r.f(8), r.f(8)) }
          val nCr = r.f(4)
          require(nCr <= 10, "av1: film grain num_cr_points > 10")
          crPts = Array.fill(nCr) { Array(r.f(8), r.f(8)) }
        }
        val scalingShift = r.f(2) + 8
        val lag = r.f(2)
        val numPosLuma = 2 * lag * (lag + 1)
        val numPosChroma = if (numY > 0) numPosLuma + 1 else numPosLuma
        val arY = if (numY > 0) Array.fill(numPosLuma)(r.f(8) - 128) else Array.empty[Int]
        val arCb = if (csfl || cbPts.nonEmpty) Array.fill(numPosChroma)(r.f(8) - 128) else Array.empty[Int]
        val arCr = if (csfl || crPts.nonEmpty) Array.fill(numPosChroma)(r.f(8) - 128) else Array.empty[Int]
        val arShift = r.f(2) + 6
        val gss = r.f(2)
        val (cbM, cbLM, cbO) = if (cbPts.nonEmpty) (r.f(8), r.f(8), r.f(9)) else (0, 0, 0)
        val (crM, crLM, crO) = if (crPts.nonEmpty) (r.f(8), r.f(8), r.f(9)) else (0, 0, 0)
        val overlap = r.f(1) == 1
        val clip = r.f(1) == 1
        filmGrain = Some(Av1FilmGrain.Params(seed, yPts, csfl, cbPts, crPts,
          scalingShift, lag, arY, arCb, arCr, arShift, gss,
          cbM, cbLM, cbO, crM, crLM, crO, overlap, clip))
      }
    }
    FrameHeader(w, h, upscaledWidth, superresDenom, disableCdfUpdate, allowScreen, allowIntrabc,
      baseQIdx, dqYDc, dqUDc, dqUAc, dqVDc, dqVAc,
      deltaQPresent, deltaQRes, deltaLfPresent, deltaLfRes, deltaLfMulti,
      codedLossless, filterLevel, sharpness, filterDeltaEnabled, refDeltaIntra,
      cdef, lrType, lrUnitSize, txModeSelect, reducedTxSet, filmGrain,
      tileColsLog2, tileRowsLog2, colStarts, rowStarts, tileSizeBytes)
  }

  private def tileLog2(blkSize: Int, target: Int): Int = {
    var k = 0
    while ((blkSize << k) < target) k += 1
    k
  }
}
