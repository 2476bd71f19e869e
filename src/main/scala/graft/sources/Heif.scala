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
  * Pixel DECODE is out of scope by design: AV1/HEVC intra decoding is
  * a multi-thousand-line lift with no in-container golden for
  * bit-exactness at the needed granularity — triage routes them
  * today, the loud-refusal contract covers the rest. */
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
