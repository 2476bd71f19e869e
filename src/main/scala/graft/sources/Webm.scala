package graft.sources

import org.apache.spark.sql.Dataset

/** WebM (Matroska/EBML) container walk — the open-web video container,
  * and the other place VP8 key frames live beside lossy WebP. Pure JVM,
  * public specs only: RFC 8794 (EBML) for the variable-length
  * integer/element grammar, the Matroska/WebM element registry for the
  * IDs used here.
  *
  * Implements the triage-first shape [[Mp4]] established: [[tracks]]
  * reads only the Tracks element (codec, dimensions — the metadata a
  * 100 TB video crawl filters on before touching sample data), and
  * [[keyFrames]] walks Clusters extracting key-frame payloads from
  * SimpleBlocks (flag bit) and BlockGroups (keyframe = no
  * ReferenceBlock), resolving timestamps as cluster timecode + block
  * offset scaled by TimecodeScale. VP8 key frames then decode through
  * [[graft.operators.Vp8]]; other codecs (VP9/AV1/Opus/Vorbis) surface
  * in triage and refuse loudly at decode — the same honest routing as
  * Mp4's AVC refusal. Laced blocks refuse loudly (key frames are
  * written unlaced in practice; silent mis-framing would corrupt
  * payloads).
  *
  * [[encodeWebm]] is the fixture muxer: minimal EBML header + Segment
  * (Info/Tracks/Cluster) wrapping REAL VP8 payloads, so specs exercise
  * the walk against the real codec bitstream.
  *
  * Spark shape: [[frames]] is a map-only flatMap over one-file rows,
  * zero exchange, corrupt payloads quarantined under `keepCorrupt` —
  * the same contract as every decoder tier here. */
object Webm {

  // Matroska element IDs (stored with the length marker, as in the file)
  private val IdEbml = 0x1A45DFA3L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimecodeScale = 0x2AD7B1L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdCluster = 0x1F43B675L
  private val IdTimecode = 0xE7L
  private val IdSimpleBlock = 0xA3L
  private val IdBlockGroup = 0xA0L
  private val IdBlock = 0xA1L
  private val IdReferenceBlock = 0xFBL

  /** EBML element ID at `at`: kept WITH its marker bit (the registry
    * convention); returns (id, bytes consumed). */
  private def readId(p: Array[Byte], at: Int): (Long, Int) = {
    require(at < p.length, "EBML: truncated id")
    val b0 = p(at) & 0xff
    require(b0 != 0, "EBML: invalid id")
    val len = java.lang.Integer.numberOfLeadingZeros(b0) - 23
    require(len >= 1 && len <= 4 && at + len <= p.length, "EBML: bad id length")
    var v = b0.toLong
    var i = 1
    while (i < len) { v = (v << 8) | (p(at + i) & 0xff); i += 1 }
    (v, len)
  }

  /** EBML data size at `at`: marker stripped; -1 = unknown size (all
    * value bits set — legal for Segment/Cluster in live streams). */
  private def readSize(p: Array[Byte], at: Int): (Long, Int) = {
    require(at < p.length, "EBML: truncated size")
    val b0 = p(at) & 0xff
    require(b0 != 0, "EBML: invalid size")
    val len = java.lang.Integer.numberOfLeadingZeros(b0) - 23
    require(len >= 1 && len <= 8 && at + len <= p.length, "EBML: bad size length")
    var v = (b0 & (0xff >>> len)).toLong
    var allOnes = (b0 & (0xff >>> len)) == (0xff >>> len)
    var i = 1
    while (i < len) {
      val b = p(at + i) & 0xff
      if (b != 0xff) allOnes = false
      v = (v << 8) | b
      i += 1
    }
    (if (allOnes) -1L else v, len)
  }

  private def readUint(p: Array[Byte], at: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (p(at + i) & 0xff); i += 1 }
    v
  }

  /** Walk the children of [from, to), invoking `f(id, payloadFrom,
    * payloadLen)`; unknown-size children only legal for Cluster (walk
    * delegates the cut to the caller via to). */
  private def walk(p: Array[Byte], from: Int, to: Int)(f: (Long, Int, Int) => Unit): Unit = {
    var at = from
    while (at < to) {
      val (id, idLen) = readId(p, at)
      val (sz, szLen) = readSize(p, at + idLen)
      val body = at + idLen + szLen
      val len =
        if (sz >= 0) sz.toInt
        else to - body // unknown size: extends to the enclosing end
      require(body + len <= to, s"EBML: element 0x${id.toHexString} truncated")
      f(id, body, len)
      at = body + len
    }
  }

  /** One video/audio track's triage row. */
  case class WebmTrack(number: Long, trackType: Int, codec: String, width: Int, height: Int)

  private def segmentBounds(p: Array[Byte]): (Int, Int) = {
    val (id0, l0) = readId(p, 0)
    require(id0 == IdEbml, "not an EBML/WebM payload")
    val (hsz, hszLen) = readSize(p, l0)
    require(hsz >= 0, "EBML: header must have known size")
    var at = l0 + hszLen + hsz.toInt
    while (at < p.length) {
      val (id, idLen) = readId(p, at)
      val (sz, szLen) = readSize(p, at + idLen)
      val body = at + idLen + szLen
      if (id == IdSegment) {
        val end = if (sz >= 0) body + sz.toInt else p.length
        require(end <= p.length, "WebM: segment truncated")
        return (body, end)
      }
      require(sz >= 0, "EBML: unknown-size non-segment element")
      at = body + sz.toInt
    }
    throw new IllegalArgumentException("WebM: no Segment element")
  }

  /** Metadata triage: tracks with codec + dimensions, plus the
    * timecode scale (ns per timecode tick; Matroska default 1e6). */
  def tracks(p: Array[Byte]): (Seq[WebmTrack], Long) = {
    val (segFrom, segTo) = segmentBounds(p)
    val out = scala.collection.mutable.ArrayBuffer.empty[WebmTrack]
    var scale = 1000000L
    walk(p, segFrom, segTo) { (id, from, len) =>
      if (id == IdInfo) walk(p, from, from + len) { (iid, ifrom, ilen) =>
        if (iid == IdTimecodeScale) scale = readUint(p, ifrom, ilen)
      }
      else if (id == IdTracks) walk(p, from, from + len) { (tid, tfrom, tlen) =>
        if (tid == IdTrackEntry) {
          var num = -1L
          var typ = -1
          var codec = ""
          var w = 0
          var h = 0
          walk(p, tfrom, tfrom + tlen) { (eid, efrom, elen) =>
            eid match {
              case IdTrackNumber => num = readUint(p, efrom, elen)
              case IdTrackType => typ = readUint(p, efrom, elen).toInt
              case IdCodecId => codec = new String(p, efrom, elen, "US-ASCII")
              case IdVideo => walk(p, efrom, efrom + elen) { (vid, vfrom, vlen) =>
                if (vid == IdPixelWidth) w = readUint(p, vfrom, vlen).toInt
                else if (vid == IdPixelHeight) h = readUint(p, vfrom, vlen).toInt
              }
              case _ => ()
            }
          }
          require(num > 0, "WebM: TrackEntry without TrackNumber")
          out += WebmTrack(num, typ, codec, w, h)
        }
      }
    }
    (out.toSeq, scale)
  }

  /** Key-frame payloads of the given track: (timestampMs, frameBytes).
    * SimpleBlocks use the keyframe flag; Block-in-BlockGroup is a key
    * frame iff the group carries no ReferenceBlock. All three lacing
    * modes (Xiph / fixed-size / EBML, Matroska §"Block lacing") are
    * unpacked — laced frames share the block timestamp (per-frame
    * spacing needs DefaultDuration, which a frame sampler does not). */
  def keyFrames(p: Array[Byte], trackNumber: Long): Seq[(Long, Array[Byte])] = {
    val (segFrom, segTo) = segmentBounds(p)
    val (_, scale) = tracks(p)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]

    def blockPayloads(from: Int, len: Int, needKeyFlag: Boolean): Seq[(Long, Array[Byte])] = {
      // block: track VINT (size semantics), s16 timecode, flags, data
      val (tn, tnLen) = readSize(p, from)
      val rel = ((p(from + tnLen) & 0xff) << 8 | (p(from + tnLen + 1) & 0xff)).toShort.toLong
      val flags = p(from + tnLen + 2) & 0xff
      if (tn != trackNumber) Nil
      else if (needKeyFlag && (flags & 0x80) == 0) Nil
      else {
        val dataFrom = from + tnLen + 3
        val dataEnd = from + len
        val lacing = (flags >> 1) & 3
        if (lacing == 0) Seq((rel, java.util.Arrays.copyOfRange(p, dataFrom, dataEnd)))
        else {
          val n = (p(dataFrom) & 0xff) + 1
          var at = dataFrom + 1
          val sizes = new Array[Int](n)
          lacing match {
            case 1 => // Xiph: 255-saturated size bytes for frames 0..n-2
              var i = 0
              while (i < n - 1) {
                var sz = 0
                var b = 255
                while (b == 255) {
                  require(at < dataEnd, "WebM: Xiph lacing truncated")
                  b = p(at) & 0xff; sz += b; at += 1
                }
                sizes(i) = sz
                i += 1
              }
            case 2 => // fixed-size: equal split of the remainder
              val total = dataEnd - at
              require(total % n == 0, s"WebM: fixed lacing remainder $total not divisible by $n")
              java.util.Arrays.fill(sizes, total / n)
            case _ => // EBML: first size a VINT, then signed-VINT deltas
              val (first, fl) = readSize(p, at); at += fl
              sizes(0) = first.toInt
              var prev = first.toInt
              var i = 1
              while (i < n - 1) {
                val (v, vl) = readSize(p, at); at += vl
                val delta = v - ((1L << (7 * vl - 1)) - 1) // center the unsigned range
                prev = (prev + delta).toInt
                require(prev >= 0, "WebM: EBML lacing size underflow")
                sizes(i) = prev
                i += 1
              }
          }
          if (lacing != 2) {
            val used = { var s = 0; var i = 0; while (i < n - 1) { s += sizes(i); i += 1 }; s }
            val rem = dataEnd - at - used
            require(rem >= 0, "WebM: laced sizes overrun block")
            sizes(n - 1) = rem
          }
          val frames = Seq.newBuilder[(Long, Array[Byte])]
          var i = 0
          while (i < n) {
            require(at + sizes(i) <= dataEnd, "WebM: laced frame overruns block")
            frames += ((rel, java.util.Arrays.copyOfRange(p, at, at + sizes(i))))
            at += sizes(i)
            i += 1
          }
          require(at == dataEnd, "WebM: laced frames leave trailing bytes")
          frames.result()
        }
      }
    }

    walk(p, segFrom, segTo) { (id, from, len) =>
      if (id == IdCluster) {
        var clusterTc = 0L
        walk(p, from, from + len) { (cid, cfrom, clen) =>
          if (cid == IdTimecode) clusterTc = readUint(p, cfrom, clen)
          else if (cid == IdSimpleBlock) {
            blockPayloads(cfrom, clen, needKeyFlag = true).foreach { case (rel, data) =>
              out += (((clusterTc + rel) * scale / 1000000L, data))
            }
          } else if (cid == IdBlockGroup) {
            var hasRef = false
            var blk: Seq[(Long, Array[Byte])] = Nil
            walk(p, cfrom, cfrom + clen) { (gid, gfrom, glen) =>
              if (gid == IdReferenceBlock) hasRef = true
              else if (gid == IdBlock) blk = blockPayloads(gfrom, glen, needKeyFlag = false)
            }
            if (!hasRef) blk.foreach { case (rel, data) =>
              out += (((clusterTc + rel) * scale / 1000000L, data))
            }
          }
        }
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------ encode

  private def vint(v: Long): Array[Byte] = {
    // shortest size encoding with marker
    var len = 1
    while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1 // avoid all-ones (= unknown)
    val out = new Array[Byte](len)
    var i = len - 1
    var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out(0) = (out(0) | (0x80 >> (len - 1))).toByte
    out
  }

  private def idBytes(id: Long): Array[Byte] = {
    val len = if (id <= 0xff) 1 else if (id <= 0xffff) 2 else if (id <= 0xffffff) 3 else 4
    val out = new Array[Byte](len)
    var i = len - 1
    var x = id
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  private def elem(id: Long, body: Array[Byte]): Array[Byte] = {
    val ib = idBytes(id)
    val sb = vint(body.length.toLong)
    val out = new Array[Byte](ib.length + sb.length + body.length)
    System.arraycopy(ib, 0, out, 0, ib.length)
    System.arraycopy(sb, 0, out, ib.length, sb.length)
    System.arraycopy(body, 0, out, ib.length + sb.length, body.length)
    out
  }

  private def uintBody(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    val out = new Array[Byte](len)
    var i = len - 1
    var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  /** Fixture muxer: one VP8 video track, one Cluster per frame batch,
    * each frame a keyframe SimpleBlock at `frameMs` spacing. */
  def encodeWebm(framesVp8: Seq[Array[Byte]], w: Int, h: Int, frameMs: Int = 40,
      codec: String = "V_VP8"): Array[Byte] = {
    val header = elem(IdEbml, Array.concat(
      elem(0x4286L, uintBody(1)), // EBMLVersion
      elem(0x42F7L, uintBody(1)), // EBMLReadVersion
      elem(0x42F2L, uintBody(4)), // EBMLMaxIDLength
      elem(0x42F3L, uintBody(8)), // EBMLMaxSizeLength
      elem(0x4282L, "webm".getBytes("US-ASCII")), // DocType
      elem(0x4287L, uintBody(2)), // DocTypeVersion
      elem(0x4285L, uintBody(2)))) // DocTypeReadVersion
    val info = elem(IdInfo, elem(IdTimecodeScale, uintBody(1000000L)))
    val trackEntry = elem(IdTrackEntry, Array.concat(
      elem(IdTrackNumber, uintBody(1)),
      elem(0x73C5L, uintBody(1)), // TrackUID
      elem(IdTrackType, uintBody(1)),
      elem(IdCodecId, codec.getBytes("US-ASCII")),
      elem(IdVideo, Array.concat(
        elem(IdPixelWidth, uintBody(w.toLong)),
        elem(IdPixelHeight, uintBody(h.toLong))))))
    val tracksEl = elem(IdTracks, trackEntry)
    val blocks = framesVp8.zipWithIndex.map { case (f, i) =>
      val rel = i * frameMs
      val hdr = Array[Byte](0x81.toByte, ((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte, 0x80.toByte)
      elem(IdSimpleBlock, hdr ++ f)
    }
    val cluster = elem(IdCluster, Array.concat(
      (elem(IdTimecode, uintBody(0L)) +: blocks): _*))
    val segment = elem(IdSegment, Array.concat(info, tracksEl, cluster))
    Array.concat(header, segment)
  }

  /** Signed VINT (EBML lacing deltas): value stored as delta + bias
    * where bias = 2^(7*len-1) - 1. */
  private def svint(d: Long): Array[Byte] = {
    var len = 1
    def bias(l: Int): Long = (1L << (7 * l - 1)) - 1
    while (len < 8 && (d < -bias(len) || d > bias(len))) len += 1
    val u = d + bias(len)
    val out = new Array[Byte](len)
    var i = len - 1
    var x = u
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out(0) = (out(0) | (0x80 >> (len - 1))).toByte
    out
  }

  /** Laced fixture muxer: ONE keyframe SimpleBlock carrying all frames
    * under the requested lacing (1 = Xiph, 2 = fixed-size, 3 = EBML);
    * fixed-size requires equal frame lengths. */
  def encodeWebmLaced(framesVp8: Seq[Array[Byte]], w: Int, h: Int, lacing: Int,
      codec: String = "V_VP8"): Array[Byte] = {
    require(lacing >= 1 && lacing <= 3, "lacing must be 1 (Xiph), 2 (fixed) or 3 (EBML)")
    require(framesVp8.nonEmpty && framesVp8.length <= 256, "1..256 laced frames")
    if (lacing == 2)
      require(framesVp8.map(_.length).distinct.size == 1, "fixed lacing needs equal sizes")
    val unlaced = encodeWebm(framesVp8.take(1), w, h, codec = codec) // header/info/tracks template
    // rebuild the cluster with a single laced block
    val hdrFlags = (0x80 | (lacing << 1)).toByte
    val sizesEnc: Array[Byte] = lacing match {
      case 1 => // Xiph: 255-saturated bytes for all but the last frame
        framesVp8.dropRight(1).flatMap { f =>
          val full = f.length / 255
          Array.fill(full)(255.toByte) :+ (f.length % 255).toByte
        }.toArray
      case 2 => Array.emptyByteArray
      case _ => // EBML: first size as VINT, then signed deltas
        val sizes = framesVp8.dropRight(1).map(_.length)
        if (sizes.isEmpty) Array.emptyByteArray
        else vint(sizes.head.toLong) ++
          sizes.sliding(2).filter(_.length == 2).flatMap(p2 => svint((p2(1) - p2(0)).toLong)).toArray
    }
    val body = Array.concat(
      Array[Byte](0x81.toByte, 0, 0, hdrFlags, (framesVp8.length - 1).toByte),
      sizesEnc, Array.concat(framesVp8: _*))
    val cluster = elem(IdCluster, Array.concat(
      elem(IdTimecode, uintBody(0L)), elem(IdSimpleBlock, body)))
    // splice: reuse everything before the template's Cluster
    val clusterAt = {
      val idb = idBytes(IdCluster)
      var i = 0
      var found = -1
      while (found < 0 && i + idb.length <= unlaced.length) {
        if (java.util.Arrays.equals(java.util.Arrays.copyOfRange(unlaced, i, i + idb.length), idb)) found = i
        i += 1
      }
      require(found > 0, "template cluster not found")
      found
    }
    // the Segment size changes: rebuild Segment from its parts instead
    val header = java.util.Arrays.copyOfRange(unlaced, 0, {
      // header = everything before Segment id
      val sid = idBytes(IdSegment)
      var i = 0; var f = -1
      while (f < 0 && i + sid.length <= unlaced.length) {
        if (java.util.Arrays.equals(java.util.Arrays.copyOfRange(unlaced, i, i + sid.length), sid)) f = i
        i += 1
      }
      f
    })
    val (segFrom, _) = segmentBounds(unlaced)
    val segBody = java.util.Arrays.copyOfRange(unlaced, segFrom, clusterAt)
    Array.concat(header, elem(IdSegment, Array.concat(segBody, cluster)))
  }

  // ------------------------------------------------------------- spark

  case class WebmFile(id: Long, bytes: Array[Byte])

  /** One decoded key frame (or triage/quarantine marker): `error` null
    * for a decoded frame; frame -1 + error for corrupt payloads (under
    * `keepCorrupt`) or refused codecs. */
  case class WebmFrame(id: Long, track: Long, frame: Int, ts_ms: Long,
      width: Int, height: Int, luma_sum: Long, error: String)

  /** Map-only key-frame extraction + VP8 decode over one-file rows;
    * VP8 tracks decode, other codecs yield a loud marker row per
    * track, corrupt files quarantine under `keepCorrupt`. */
  def frames(files: Dataset[WebmFile], keepCorrupt: Boolean = false): Dataset[WebmFrame] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      try {
        val (ts, _) = tracks(f.bytes)
        ts.filter(_.trackType == 1).flatMap { t =>
          if (t.codec != "V_VP8")
            Seq(WebmFrame(f.id, t.number, -1, -1L, t.width, t.height, 0L,
              s"WebM: codec ${t.codec} unsupported (VP8 key frames only)"))
          else keyFrames(f.bytes, t.number).zipWithIndex.map { case ((ms, data), i) =>
            val yuv = graft.operators.Vp8.decode(data)
            var s = 0L
            var j = 0
            while (j < yuv.y.length) { s += yuv.y(j) & 0xff; j += 1 }
            WebmFrame(f.id, t.number, i, ms, yuv.w, yuv.h, s, null)
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) if keepCorrupt =>
          Seq(WebmFrame(f.id, -1L, -1, -1L, 0, 0, 0L,
            s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }
}
