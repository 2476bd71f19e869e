package graft.sources

import org.apache.spark.sql.Dataset

/** HEIF / AVIF triage — a pure-JVM ISOBMFF `meta` box walk (public
  * specs: ISO/IEC 14496-12 boxes, 23008-12 HEIF item model, the AVIF
  * spec's `av01` item type), the still-image sibling of
  * [[Mp4.tracks]]: read ONLY the structural boxes and answer the
  * routing questions — codec, dimensions, alpha, bit depth, Exif
  * presence — without decoding a single pixel. That is the first
  * operation over the modern image web: HEIC is the default camera
  * format of a few billion phones, AVIF the growing web-delivery
  * format; at 100 TB the triage fork (what is it? route it) must not
  * cost a decode.
  *
  * Boxes walked: `ftyp` (major brand), `meta`/`hdlr` (must be
  * `pict`), `pitm` (primary item), `iinf`/`infe` (item types, Exif),
  * `iprp`/`ipco` (properties: `ispe` dimensions, `av1C`/`hvcC` codec
  * config, `pixi` bit depth, `auxC` aux type) + `ipma` (property
  * associations), `iref` (`auxl` references → alpha plane detection).
  * Dimensions are the coded `ispe` values (no `irot`/`imir`
  * transform applied — triage, not presentation).
  *
  * Golden validation: `HeifSpec` pins every field against what
  * libheif's own API reports for REAL libheif/libaom-encoded .avif
  * and .heic fixtures (`tools/gen_heif_fixtures.py`).
  *
  * Pixel decode ([[decodePrimary]]): av01 primaries — single item,
  * grid-tiled, and alpha-aux — decode through the in-repo AV1 intra
  * decoder ([[graft.operators.Av1Decoder]], bit-exact vs libdav1d per
  * Av1DecoderSpec) with a deterministic BT.601 conversion; HEVC/VVC
  * primaries refuse loudly by codec name (no encoder exists in this
  * environment to produce a golden). */
object Heif {

  final case class HeifFile(id: Long, bytes: Array[Byte])

  /** Triage row; `error` marks a quarantined file. */
  final case class HeifInfo(id: Long, brand: String, codec: String,
                            width: Int, height: Int, alpha: Boolean,
                            bitDepth: Int, nItems: Int, hasExif: Boolean,
                            error: String)

  def isHeif(p: Array[Byte]): Boolean =
    p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p' && {
      val brand = new String(p, 8, 4, "US-ASCII")
      Set("avif", "avis", "heic", "heix", "hevc", "mif1", "msf1").contains(brand)
    }

  def triage(id: Long, p: Array[Byte]): HeifInfo = {
    @inline def u16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    @inline def u32(i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) | ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    @inline def fourcc(i: Int): String = new String(p, i, 4, "US-ASCII")

    /** Walk child boxes of [from,until); call f(type, payloadStart, payloadEnd). */
    def walk(from: Int, until: Int)(f: (String, Int, Int) => Unit): Unit = {
      var at = from
      while (at + 8 <= until) {
        var size = u32(at)
        var hdr = 8
        val typ = fourcc(at + 4)
        if (size == 1) {
          require(at + 16 <= until, "heif: truncated largesize box")
          val ls = (u32(at + 8) << 32) | u32(at + 12)
          require(ls >= 16 && ls <= Int.MaxValue, "heif: largesize out of range")
          size = ls; hdr = 16
        } else if (size == 0) size = until - at // box extends to end
        require(size >= hdr && at + size <= until, s"heif: box '$typ' overruns container")
        f(typ, at + hdr, at + size.toInt)
        at += size.toInt
      }
    }

    require(isHeif(p), "heif: not a HEIF/AVIF file (ftyp brand)")
    val brand = fourcc(8)

    var handler = ""
    var primary = -1L
    // itemId -> type
    val itemTypes = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    // 1-indexed ipco property list: (type, payloadStart, payloadEnd)
    val props = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    // itemId -> property indices
    val assoc = scala.collection.mutable.HashMap.empty[Long, Seq[Int]]
    // auxl references: fromItem -> toItems
    val auxl = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    // dimg references (grid/overlay derived images): fromItem -> tiles
    val dimg = scala.collection.mutable.HashMap.empty[Long, Seq[Long]]

    walk(0, p.length) {
      case ("meta", ms, me) =>
        walk(ms + 4, me) { // meta is a FullBox: skip version+flags
          case ("hdlr", s, _) => handler = fourcc(s + 8)
          case ("pitm", s, _) =>
            val v = p(s) & 0xff
            primary = if (v == 0) u16(s + 4).toLong else u32(s + 4)
          case ("iinf", s, e) =>
            val v = p(s) & 0xff
            val skip = if (v == 0) 2 else 4
            walk(s + 4 + skip, e) {
              case ("infe", is, _) =>
                val iv = p(is) & 0xff
                require(iv >= 2, s"heif: infe version $iv unsupported")
                val itemId = if (iv == 2) u16(is + 4).toLong else u32(is + 4)
                val typOff = if (iv == 2) is + 8 else is + 10
                itemTypes(itemId) = fourcc(typOff)
              case _ => ()
            }
          case ("iprp", s, e) =>
            walk(s, e) {
              case ("ipco", cs, ce) =>
                walk(cs, ce)((t, ps, pe) => props += ((t, ps, pe)))
              case ("ipma", ms2, _) =>
                val v = p(ms2) & 0xff
                val flags = u32(ms2) & 0xffffff
                var at = ms2 + 4
                val n = u32(at); at += 4
                var k = 0L
                while (k < n) {
                  val itemId = if (v < 1) { val x = u16(at); at += 2; x.toLong }
                               else { val x = u32(at); at += 4; x }
                  val cnt = p(at) & 0xff; at += 1
                  val ids = (0 until cnt).map { _ =>
                    if ((flags & 1) != 0) { val x = u16(at) & 0x7fff; at += 2; x }
                    else { val x = p(at) & 0x7f; at += 1; x }
                  }
                  assoc(itemId) = ids
                  k += 1
                }
              case _ => ()
            }
          case ("iref", s, e) =>
            val v = p(s) & 0xff
            walk(s + 4, e) { (rt, rs, _) =>
              val (from, base) =
                if (v == 0) (u16(rs).toLong, rs + 2) else (u32(rs), rs + 4)
              val cnt = u16(base)
              val tos = (0 until cnt).map { j =>
                if (v == 0) u16(base + 2 + 2 * j).toLong else u32(base + 2 + 4 * j)
              }
              if (rt == "auxl") auxl += ((from, tos))
              if (rt == "dimg") dimg(from) = tos
            }
          case _ => ()
        }
      case _ => ()
    }

    require(handler == "pict", s"heif: handler '$handler' is not a picture ('pict')")
    require(primary >= 0, "heif: no primary item (pitm)")

    def propsOf(item: Long): Seq[(String, Int, Int)] =
      assoc.getOrElse(item, Seq.empty).flatMap(i => props.lift(i - 1)) // 1-indexed

    val pProps = propsOf(primary)
    val ispe = pProps.find(_._1 == "ispe")
    require(ispe.isDefined, "heif: primary item has no ispe (dimensions)")
    val w = u32(ispe.get._2 + 4).toInt
    val hgt = u32(ispe.get._2 + 8).toInt
    def codecOf(item: Long): Option[String] = propsOf(item).collectFirst {
      case ("av1C", _, _) => "av01"
      case ("hvcC", _, _) => "hvc1"
      case ("vvcC", _, _) => "vvc1"
      case ("jpgC", _, _) => "jpeg"
    }
    // a `grid`/`iden`/`iovl` derived primary (Apple HEICs are 512x512
    // hvc1 grids) carries its codec on the dimg-referenced tiles
    val codec = codecOf(primary)
      .orElse(dimg.get(primary).flatMap(_.headOption).flatMap(codecOf))
      .getOrElse(itemTypes.getOrElse(primary, "unknown"))
    val bitDepth = pProps.collectFirst { case ("pixi", s, _) =>
      val n = p(s + 4) & 0xff
      if (n > 0) p(s + 5) & 0xff else 8
    }.getOrElse(8)
    // alpha: an item auxl-referencing the primary whose auxC names
    // alpha; for a derived (grid) aux item the auxC may sit on its
    // dimg tiles instead, and tiles may auxl-reference the primary's
    // tiles rather than the grid item itself
    val primaryFamily = primary +: dimg.getOrElse(primary, Seq.empty)
    def hasAlphaAuxC(item: Long): Boolean =
      (propsOf(item) ++ dimg.getOrElse(item, Seq.empty).flatMap(propsOf)).exists {
        case (t, s, e) =>
          t == "auxC" && {
            val str = new String(p, s + 4, math.max(0, e - (s + 4)), "US-ASCII")
            // MIAF/AVIF alpha urn names it; HEVC's is auxid:1 (2=depth)
            str.contains("alpha") || str.contains("urn:mpeg:hevc:2015:auxid:1")
          }
      }
    val alpha = auxl.exists { case (from, tos) =>
      tos.exists(primaryFamily.contains) && hasAlphaAuxC(from)
    }
    val hasExif = itemTypes.valuesIterator.contains("Exif")
    HeifInfo(id, brand, codec, w, hgt, alpha, bitDepth, itemTypes.size, hasExif, null)
  }

  // ------------------------------------------------------- pixel decode

  /** Decoded still image: packed 0xAARRGGBB pixels (alpha 0xff when the
    * file has no alpha aux plane), engine-deterministic BT.601
    * limited-range YUV→RGB with nearest-neighbor chroma (the same
    * presentation convention as [[graft.operators.Vp8.yuvToRgb]]). */
  final case class HeifPixels(width: Int, height: Int, rgb: Array[Int], hasAlpha: Boolean)

  /** Decode the primary item of an AVIF (av01 codec, single or
    * grid-tiled, optional alpha aux) to pixels via the in-repo AV1
    * intra decoder ([[graft.operators.Av1Decoder]], bit-exact vs
    * libdav1d). HEVC/VVC primaries refuse loudly by codec name. */
  def decodePrimary(p: Array[Byte]): HeifPixels = {
    @inline def u16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    @inline def u32(i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) | ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    @inline def fourcc(i: Int): String = new String(p, i, 4, "US-ASCII")

    def walk(from: Int, until: Int)(f: (String, Int, Int) => Unit): Unit = {
      var at = from
      while (at + 8 <= until) {
        var size = u32(at)
        var hdr = 8
        val typ = fourcc(at + 4)
        if (size == 1) {
          require(at + 16 <= until, "heif: truncated largesize box")
          val ls = (u32(at + 8) << 32) | u32(at + 12)
          require(ls >= 16 && ls <= Int.MaxValue, "heif: largesize out of range")
          size = ls; hdr = 16
        } else if (size == 0) size = until - at
        require(size >= hdr && at + size <= until, s"heif: box '$typ' overruns container")
        f(typ, at + hdr, at + size.toInt)
        at += size.toInt
      }
    }

    require(isHeif(p), "heif: not a HEIF/AVIF file (ftyp brand)")
    var primary = -1L
    val itemTypes = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    val props = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    val assoc = scala.collection.mutable.HashMap.empty[Long, Seq[Int]]
    val auxl = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val dimg = scala.collection.mutable.HashMap.empty[Long, Seq[Long]]
    // itemId -> (constructionMethod, extents as (offset,len) pairs, baseOffset)
    val iloc = scala.collection.mutable.HashMap.empty[Long, (Int, Long, Seq[(Long, Long)])]
    var idatStart = -1

    walk(0, p.length) {
      case ("meta", ms, me) =>
        walk(ms + 4, me) {
          case ("pitm", s, _) =>
            val v = p(s) & 0xff
            primary = if (v == 0) u16(s + 4).toLong else u32(s + 4)
          case ("idat", s, _) => idatStart = s
          case ("iloc", s, _) =>
            val v = p(s) & 0xff
            var i = s + 4
            val osz = (p(i) & 0xff) >> 4; val lsz = p(i) & 0x0f; i += 1
            val bsz = (p(i) & 0xff) >> 4; val isz = p(i) & 0x0f; i += 1
            val cnt = if (v < 2) { val x = u16(i); i += 2; x } else { val x = u32(i).toInt; i += 4; x }
            def rd(n: Int): Long = {
              var v2 = 0L
              var k = 0
              while (k < n) { v2 = (v2 << 8) | (p(i) & 0xffL); i += 1; k += 1 }
              v2
            }
            var k = 0
            while (k < cnt) {
              val itemId = if (v < 2) { val x = u16(i); i += 2; x.toLong } else { val x = u32(i); i += 4; x }
              var cm = 0
              if (v == 1 || v == 2) { cm = u16(i) & 0x0f; i += 2 }
              i += 2 // data_reference_index
              val base = rd(bsz)
              val ec = u16(i); i += 2
              val exts = (0 until ec).map { _ =>
                if ((v == 1 || v == 2) && isz > 0) rd(isz)
                val off = rd(osz); val len = rd(lsz)
                (off, len)
              }
              iloc(itemId) = (cm, base, exts)
              k += 1
            }
          case ("iinf", s, e) =>
            val v = p(s) & 0xff
            val skip = if (v == 0) 2 else 4
            walk(s + 4 + skip, e) {
              case ("infe", is, _) =>
                val iv = p(is) & 0xff
                require(iv >= 2, s"heif: infe version $iv unsupported")
                val itemId = if (iv == 2) u16(is + 4).toLong else u32(is + 4)
                val typOff = if (iv == 2) is + 8 else is + 10
                itemTypes(itemId) = fourcc(typOff)
              case _ => ()
            }
          case ("iprp", s, e) =>
            walk(s, e) {
              case ("ipco", cs, ce) =>
                walk(cs, ce)((t, ps, pe) => props += ((t, ps, pe)))
              case ("ipma", ms2, _) =>
                val v = p(ms2) & 0xff
                val flags = u32(ms2) & 0xffffff
                var at = ms2 + 4
                val n = u32(at); at += 4
                var k = 0L
                while (k < n) {
                  val itemId = if (v < 1) { val x = u16(at); at += 2; x.toLong }
                               else { val x = u32(at); at += 4; x }
                  val cnt = p(at) & 0xff; at += 1
                  val ids = (0 until cnt).map { _ =>
                    if ((flags & 1) != 0) { val x = u16(at) & 0x7fff; at += 2; x }
                    else { val x = p(at) & 0x7f; at += 1; x }
                  }
                  assoc(itemId) = ids
                  k += 1
                }
              case _ => ()
            }
          case ("iref", s, e) =>
            val v = p(s) & 0xff
            walk(s + 4, e) { (rt, rs, _) =>
              val (from, base) =
                if (v == 0) (u16(rs).toLong, rs + 2) else (u32(rs), rs + 4)
              val cnt = u16(base)
              val tos = (0 until cnt).map { j =>
                if (v == 0) u16(base + 2 + 2 * j).toLong else u32(base + 2 + 4 * j)
              }
              if (rt == "auxl") auxl += ((from, tos))
              if (rt == "dimg") dimg(from) = tos
            }
          case _ => ()
        }
      case _ => ()
    }
    require(primary >= 0, "heif: no primary item (pitm)")

    def propsOf(item: Long): Seq[(String, Int, Int)] =
      assoc.getOrElse(item, Seq.empty).flatMap(i => props.lift(i - 1))
    def isAv01(item: Long): Boolean = propsOf(item).exists(_._1 == "av1C")

    def itemBytes(item: Long): Array[Byte] = {
      val (cm, base, exts) = iloc.getOrElse(item,
        throw new IllegalArgumentException(s"heif: item $item has no iloc entry"))
      val out = new java.io.ByteArrayOutputStream()
      exts.foreach { case (off, len) =>
        val from = cm match {
          case 0 => base + off
          case 1 =>
            require(idatStart >= 0, "heif: construction_method=1 but no idat box")
            idatStart + base + off
          case m => throw new IllegalArgumentException(s"heif: iloc construction_method $m unsupported")
        }
        require(from >= 0 && from + len <= p.length && len >= 0, "heif: iloc extent out of range")
        out.write(p, from.toInt, len.toInt)
      }
      out.toByteArray
    }

    /** Decode an av01 item: config OBUs from its av1C (if any) prepended
      * to the item payload. */
    def decodeAv01(item: Long): graft.operators.Av1Decoder.Decoded = {
      require(isAv01(item), {
        val c = propsOf(item).collectFirst {
          case ("hvcC", _, _) => "hvc1 (HEVC)"
          case ("vvcC", _, _) => "vvc1 (VVC)"
        }.getOrElse(itemTypes.getOrElse(item, "unknown"))
        s"heif: pixel decode for codec '$c' unsupported (av01 only)"
      })
      val cfg = propsOf(item).collectFirst { case ("av1C", s, e) if e - s > 4 =>
        java.util.Arrays.copyOfRange(p, s + 4, e)
      }
      val data = itemBytes(item)
      graft.operators.Av1Decoder.decode(cfg.fold(data)(c => c ++ data))
    }

    val ptype = itemTypes.getOrElse(primary, "")
    // composed YUV planes + geometry
    var width = 0; var height = 0
    var subX = 0; var subY = 0; var mono = false
    var bitDepth = 8
    var planesY: Array[Short] = null
    var planesU: Array[Short] = null
    var planesV: Array[Short] = null

    def composeFrom(items: Seq[Long], gridW: Int, gridH: Int, cols: Int): Unit = {
      val first = decodeAv01(items.head)
      subX = first.subX; subY = first.subY; mono = first.monochrome
      bitDepth = first.bitDepth
      val tw = first.width; val th = first.height
      width = if (gridW > 0) gridW else tw
      height = if (gridH > 0) gridH else th
      val outW = width; val outH = height
      val cw = (outW + subX) >> subX; val ch = (outH + subY) >> subY
      planesY = new Array[Short](outW * outH)
      if (!mono) { planesU = new Array[Short](cw * ch); planesV = new Array[Short](cw * ch) }
      items.zipWithIndex.foreach { case (it, idx) =>
        val d = if (idx == 0) first else decodeAv01(it)
        require(d.width == tw && d.height == th, "heif: grid tiles differ in size")
        require(d.subX == subX && d.subY == subY && d.monochrome == mono &&
          d.bitDepth == bitDepth, "heif: grid tiles differ in chroma format")
        val r0 = (idx / cols) * th; val c0 = (idx % cols) * tw
        // luma
        var y = 0
        while (y < th && r0 + y < outH) {
          var x = 0
          while (x < tw && c0 + x < outW) {
            planesY((r0 + y) * outW + c0 + x) = d.planes(0)(y * tw + x)
            x += 1
          }
          y += 1
        }
        if (!mono) {
          val tcw = (tw + subX) >> subX; val tch = (th + subY) >> subY
          val cr0 = r0 >> subY; val cc0 = c0 >> subX
          var cy = 0
          while (cy < tch && cr0 + cy < ch) {
            var cx = 0
            while (cx < tcw && cc0 + cx < cw) {
              planesU((cr0 + cy) * cw + cc0 + cx) = d.planes(1)(cy * tcw + cx)
              planesV((cr0 + cy) * cw + cc0 + cx) = d.planes(2)(cy * tcw + cx)
              cx += 1
            }
            cy += 1
          }
        }
      }
    }

    if (ptype == "grid") {
      val tiles = dimg.getOrElse(primary,
        throw new IllegalArgumentException("heif: grid primary has no dimg tiles"))
      val g = itemBytes(primary)
      require(g.length >= 8, "heif: truncated grid descriptor")
      val flags = g(1) & 0xff
      val rows = (g(2) & 0xff) + 1
      val cols = (g(3) & 0xff) + 1
      val (ow, oh) =
        if ((flags & 1) != 0)
          (((g(4) & 0xff) << 24 | (g(5) & 0xff) << 16 | (g(6) & 0xff) << 8 | (g(7) & 0xff)),
           ((g(8) & 0xff) << 24 | (g(9) & 0xff) << 16 | (g(10) & 0xff) << 8 | (g(11) & 0xff)))
        else (((g(4) & 0xff) << 8) | (g(5) & 0xff), ((g(6) & 0xff) << 8) | (g(7) & 0xff))
      require(tiles.size == rows * cols,
        s"heif: grid ${rows}x$cols expects ${rows * cols} tiles, has ${tiles.size}")
      composeFrom(tiles, ow, oh, cols)
    } else {
      composeFrom(Seq(primary), -1, -1, 1)
    }

    // alpha: an auxl item targeting the primary (or its tiles) whose
    // auxC aux-type URN names the alpha plane — a depth map or other
    // auxiliary image must NOT be composited as alpha. For a derived
    // (grid) aux item the auxC may sit on its dimg tiles instead.
    val family = primary +: dimg.getOrElse(primary, Seq.empty)
    def auxTypeIsAlpha(item: Long): Boolean =
      (propsOf(item) ++ dimg.getOrElse(item, Seq.empty).flatMap(propsOf)).exists {
        case (t, s, e) =>
          t == "auxC" && {
            val str = new String(p, s + 4, math.max(0, e - (s + 4)), "US-ASCII")
            str.contains("urn:mpeg:mpegB:cicp:systems:auxiliary:alpha") ||
              str.contains("urn:mpeg:hevc:2015:auxid:1")
          }
      }
    val alphaItem = auxl.collectFirst {
      case (from, tos) if tos.exists(family.contains) && isAv01(from) &&
        auxTypeIsAlpha(from) => from
    }
    val alphaPlane: Array[Byte] = alphaItem.map { ai =>
      @inline def a8(d: graft.operators.Av1Decoder.Decoded, v: Short): Byte =
        (((v & 0xffff) >> (d.bitDepth - 8)) & 0xff).toByte
      if (dimg.contains(ai)) {
        // alpha grid mirrors the color grid geometry
        val sub = new Array[Byte](width * height)
        val tiles = dimg(ai)
        val first = decodeAv01(tiles.head)
        val tw = first.width; val th = first.height
        val cols = math.max(1, (width + tw - 1) / tw)
        tiles.zipWithIndex.foreach { case (it, idx) =>
          val d = if (idx == 0) first else decodeAv01(it)
          val r0 = (idx / cols) * th; val c0 = (idx % cols) * tw
          var y = 0
          while (y < d.height && r0 + y < height) {
            var x = 0
            while (x < d.width && c0 + x < width) {
              sub((r0 + y) * width + c0 + x) = a8(d, d.planes(0)(y * d.width + x))
              x += 1
            }
            y += 1
          }
        }
        sub
      } else {
        val d = decodeAv01(ai)
        require(d.width == width && d.height == height, "heif: alpha plane dims differ")
        d.planes(0).map(v => a8(d, v))
      }
    }.orNull

    // deterministic BT.601 limited-range conversion, nearest chroma
    val rgb = new Array[Int](width * height)
    val cw = (width + subX) >> subX
    @inline def clip(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var yy = 0
    while (yy < height) {
      var xx = 0
      while (xx < width) {
        val yv = (planesY(yy * width + xx) & 0xffff) >> (bitDepth - 8)
        val a = if (alphaPlane != null) alphaPlane(yy * width + xx) & 0xff else 0xff
        val (rr, gg, bb) =
          if (mono) {
            // monochrome: neutral chroma (128) through the same transform
            val yS = (yv * 19077) >> 8
            val v0 = clip((yS + ((128 * 26149) >> 8) - 14234) >> 6)
            val v1 = clip((yS - ((128 * 6419) >> 8) - ((128 * 13320) >> 8) + 8708) >> 6)
            val v2 = clip((yS + ((128 * 33050) >> 8) - 17685) >> 6)
            (v0, v1, v2)
          } else {
            val uv = (planesU((yy >> subY) * cw + (xx >> subX)) & 0xffff) >> (bitDepth - 8)
            val vv = (planesV((yy >> subY) * cw + (xx >> subX)) & 0xffff) >> (bitDepth - 8)
            val yS = (yv * 19077) >> 8
            (clip((yS + ((vv * 26149) >> 8) - 14234) >> 6),
             clip((yS - ((uv * 6419) >> 8) - ((vv * 13320) >> 8) + 8708) >> 6),
             clip((yS + ((uv * 33050) >> 8) - 17685) >> 6))
          }
        rgb(yy * width + xx) = (a << 24) | (rr << 16) | (gg << 8) | bb
        xx += 1
      }
      yy += 1
    }
    HeifPixels(width, height, rgb, alphaPlane != null)
  }

  /** Map-only triage; corrupt files quarantine to a marker row under
    * `keepCorrupt` (same contract as [[Archives.entries]]). */
  def infos(files: Dataset[HeifFile], keepCorrupt: Boolean = false): Dataset[HeifInfo] = {
    import files.sparkSession.implicits._
    files.map { f =>
      try triage(f.id, f.bytes)
      catch {
        case scala.util.control.NonFatal(e) if keepCorrupt =>
          HeifInfo(f.id, null, null, -1, -1, alpha = false, -1, -1, hasExif = false,
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }
}
