package graft.sources

/** MP4 / ISO Base Media File Format (ISO/IEC 14496-12) — the modern
  * video container. Two tiers, both pure JVM:
  *
  *  1. **Metadata triage without decode** ([[tracks]]): box walk to
  *     per-track (handler, codec fourcc, dims, timescale, duration,
  *     sample count, sync-sample count, media bytes). At 100 TB this
  *     is the operation that matters first — curation pipelines filter
  *     by codec/resolution/duration/keyframe-cadence BEFORE paying for
  *     any decode, and it reads only the `moov` tree (a few KB of a
  *     multi-GB file; with `faststart` layouts the walk never touches
  *     `mdat` at all).
  *  2. **Frame decode for decodable codecs** ([[mp4Frames]]): the
  *     sample tables (`stsc`/`stsz`/`stco`/`stss`) resolve every video
  *     sample to its byte range; `jpeg` sample entries (the
  *     QuickTime-era Motion-JPEG codec, ISO 14496-12 §12.1 visual
  *     sample entry) decode through [[graft.operators.Jpeg]] — the
  *     third container chain (after MJPEG-in-AVI and VP8L-in-ANMF)
  *     feeding the frames→shots→keyframes→clip-dedup pipeline.
  *     AVC/HEVC/VP9 tracks refuse loudly BY NAME, so a curation job
  *     can route them to the metadata tier instead of silently
  *     dropping them.
  *
  * Box grammar facts encoded here (all §ISO 14496-12): 32-bit BE
  * `size` + fourcc, `size==1` → 64-bit largesize follows, `size==0` →
  * box runs to the end of its container; FullBox = 1 version byte +
  * 3 flag bytes; `mvhd`/`tkhd`/`mdhd` shift field widths between
  * version 0 (32-bit times) and 1 (64-bit); `stss` absent means EVERY
  * sample is a sync sample (§8.6.2); `stsc` runs are
  * (first_chunk, samples_per_chunk) with the last run open-ended.
  *
  * Validation: encoder↔decoder round-trip (the container ships no
  * system MP4 tooling for external goldens — the AVI/WebP chains'
  * shared-oracle gate pins the pixel path instead: three unrelated
  * containers must hash identically).
  *
  * Spark shape: like [[Warc]]/[[Archives]] — per-file parse is
  * independent, so every entry point is map-only over file rows. */
object Mp4 {

  /** Per-track metadata from the `moov` tree only — no sample data
    * read. `nSync` = `stss` entry count, or `nSamples` when `stss` is
    * absent (spec: all-sync). `mediaBytes` = Σ `stsz`. */
  case class Mp4Track(trackId: Long, handler: String, codec: String,
      width: Int, height: Int, timescale: Long, duration: Long,
      nSamples: Long, nSync: Long, mediaBytes: Long)

  // ------------------------------------------------------------ walk

  private def u16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
  private def u32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
      ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
  private def u64(p: Array[Byte], i: Int): Long = (u32(p, i) << 32) | u32(p, i + 4)
  private def fcc(p: Array[Byte], i: Int): String = new String(p, i, 4, "US-ASCII")

  /** Walk the boxes in `[from, until)`, calling `f(type, bodyFrom,
    * bodyUntil)` for each. Handles largesize and size-0 (to-end). */
  private def walkBoxes(p: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= until) {
      val size32 = u32(p, i)
      val typ = fcc(p, i + 4)
      val (bodyFrom, end) =
        if (size32 == 1L) {
          require(i + 16 <= until, s"mp4: box '$typ' truncated largesize")
          val ls = u64(p, i + 8)
          require(ls >= 16 && i + ls <= until, s"mp4: box '$typ' overruns its container")
          (i + 16, i + ls.toInt)
        } else if (size32 == 0L) (i + 8, until)
        else {
          require(size32 >= 8 && i + size32 <= until, s"mp4: box '$typ' overruns its container")
          (i + 8, i + size32.toInt)
        }
      f(typ, bodyFrom, end)
      i = end
    }
  }

  private def findBox(p: Array[Byte], from: Int, until: Int, typ: String): Option[(Int, Int)] = {
    var res: Option[(Int, Int)] = None
    walkBoxes(p, from, until)((t, f, e) => if (t == typ && res.isEmpty) res = Some((f, e)))
    res
  }

  private def requireMp4(p: Array[Byte]): Unit =
    require(p.length >= 12 && fcc(p, 4) == "ftyp", "not an MP4 payload (no ftyp)")

  // ------------------------------------------------------- track meta

  /** All tracks' metadata — the decode-free triage tier. */
  def tracks(p: Array[Byte]): Seq[Mp4Track] = {
    requireMp4(p)
    val (moovF, moovE) = findBox(p, 0, p.length, "moov")
      .getOrElse(throw new IllegalArgumentException("mp4: no moov box"))
    val out = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    walkBoxes(p, moovF, moovE) { (t, f, e) => if (t == "trak") out += parseTrak(p, f, e) }
    require(out.nonEmpty, "mp4: moov has no trak")
    out.toSeq
  }

  private def parseTrak(p: Array[Byte], from: Int, until: Int): Mp4Track = {
    val (tkF, tkE) = findBox(p, from, until, "tkhd")
      .getOrElse(throw new IllegalArgumentException("mp4: trak without tkhd"))
    val tkV = p(tkF) & 0xff
    // v0: cre(4) mod(4) id(4) …; v1: cre(8) mod(8) id(4) …
    val trackId = if (tkV == 1) u32(p, tkF + 4 + 16) else u32(p, tkF + 4 + 8)
    val (mdF, mdE) = findBox(p, from, until, "mdia")
      .getOrElse(throw new IllegalArgumentException("mp4: trak without mdia"))
    val (mhF, _) = findBox(p, mdF, mdE, "mdhd")
      .getOrElse(throw new IllegalArgumentException("mp4: mdia without mdhd"))
    val mhV = p(mhF) & 0xff
    val (timescale, duration) =
      if (mhV == 1) (u32(p, mhF + 4 + 16), u64(p, mhF + 4 + 20))
      else (u32(p, mhF + 4 + 8), u32(p, mhF + 4 + 12))
    val handler = findBox(p, mdF, mdE, "hdlr")
      .map { case (f, _) => fcc(p, f + 8) }.getOrElse("????")
    val (miF, miE) = findBox(p, mdF, mdE, "minf")
      .getOrElse(throw new IllegalArgumentException("mp4: mdia without minf"))
    val (sbF, sbE) = findBox(p, miF, miE, "stbl")
      .getOrElse(throw new IllegalArgumentException("mp4: minf without stbl"))
    // stsd: first sample entry's fourcc is the codec; visual entries carry dims
    val (sdF, sdE) = findBox(p, sbF, sbE, "stsd")
      .getOrElse(throw new IllegalArgumentException("mp4: stbl without stsd"))
    require(u32(p, sdF + 4) >= 1, "mp4: stsd with zero entries")
    val entF = sdF + 8 // first sample entry box
    val codec = fcc(p, entF + 4)
    // VisualSampleEntry: 6 reserved + 2 dref idx + 16 predefined/reserved, then w(2) h(2)
    val (w, h) =
      if (handler == "vide") (u16(p, entF + 8 + 8 + 16), u16(p, entF + 8 + 8 + 18))
      else (0, 0)
    val nSamples = findBox(p, sbF, sbE, "stsz").map { case (f, _) => u32(p, f + 8) }
      .getOrElse(throw new IllegalArgumentException("mp4: stbl without stsz"))
    val mediaBytes = sampleSizes(p, sbF, sbE).map(_.toLong).sum
    val nSync = findBox(p, sbF, sbE, "stss")
      .map { case (f, _) => u32(p, f + 4) }.getOrElse(nSamples)
    Mp4Track(trackId, handler, codec, w, h, timescale, duration, nSamples, nSync, mediaBytes)
  }

  // -------------------------------------------------- sample resolve

  private def sampleSizes(p: Array[Byte], sbF: Int, sbE: Int): Array[Int] = {
    val (f, _) = findBox(p, sbF, sbE, "stsz")
      .getOrElse(throw new IllegalArgumentException("mp4: stbl without stsz"))
    val uniform = u32(p, f + 4).toInt
    val n = u32(p, f + 8).toInt
    if (uniform != 0) Array.fill(n)(uniform)
    else Array.tabulate(n)(i => u32(p, f + 12 + 4 * i).toInt)
  }

  /** Resolve the sample tables of ONE `stbl` to absolute file ranges:
    * (fileOffset, size, isSync) in sample order. */
  private def resolveSamples(p: Array[Byte], sbF: Int, sbE: Int): Seq[(Int, Int, Boolean)] = {
    val sizes = sampleSizes(p, sbF, sbE)
    val chunkOffsets: Array[Long] = findBox(p, sbF, sbE, "stco") match {
      case Some((f, _)) => Array.tabulate(u32(p, f + 4).toInt)(i => u32(p, f + 8 + 4 * i))
      case None =>
        val (f, _) = findBox(p, sbF, sbE, "co64")
          .getOrElse(throw new IllegalArgumentException("mp4: stbl without stco/co64"))
        Array.tabulate(u32(p, f + 4).toInt)(i => u64(p, f + 8 + 8 * i))
    }
    val (scF, _) = findBox(p, sbF, sbE, "stsc")
      .getOrElse(throw new IllegalArgumentException("mp4: stbl without stsc"))
    val nRuns = u32(p, scF + 4).toInt
    val runs = Array.tabulate(nRuns)(i =>
      (u32(p, scF + 8 + 12 * i).toInt, u32(p, scF + 12 + 12 * i).toInt)) // (firstChunk, perChunk)
    val sync: Set[Int] = findBox(p, sbF, sbE, "stss") match {
      case Some((f, _)) =>
        (0 until u32(p, f + 4).toInt).map(i => u32(p, f + 8 + 4 * i).toInt).toSet
      case None => (1 to sizes.length).toSet // absent => all sync (§8.6.2)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Boolean)]
    var sample = 0
    var chunk = 0 // 0-based
    while (sample < sizes.length && chunk < chunkOffsets.length) {
      // samples_per_chunk of the run this chunk falls in (runs are 1-based, open-ended)
      var perChunk = runs(0)._2
      var r = 0
      while (r < nRuns && runs(r)._1 <= chunk + 1) { perChunk = runs(r)._2; r += 1 }
      var off = chunkOffsets(chunk)
      var s = 0
      while (s < perChunk && sample < sizes.length) {
        require(off + sizes(sample) <= p.length, s"mp4: sample ${sample + 1} overruns the file")
        out += ((off.toInt, sizes(sample), sync.contains(sample + 1)))
        off += sizes(sample)
        sample += 1; s += 1
      }
      chunk += 1
    }
    require(sample == sizes.length, "mp4: chunk tables cover fewer samples than stsz")
    out.toSeq
  }

  /** Video samples of the FIRST `vide` track as (payload, isSync),
    * sample order. Decode-codec-agnostic: callers get the raw access
    * units (for `jpeg` tracks these are complete JPEG streams). */
  def videoSamples(p: Array[Byte]): (String, Seq[(Array[Byte], Boolean)]) = {
    requireMp4(p)
    val (moovF, moovE) = findBox(p, 0, p.length, "moov")
      .getOrElse(throw new IllegalArgumentException("mp4: no moov box"))
    var found: Option[(String, Seq[(Array[Byte], Boolean)])] = None
    walkBoxes(p, moovF, moovE) { (t, f, e) =>
      if (t == "trak" && found.isEmpty) {
        val meta = parseTrak(p, f, e)
        if (meta.handler == "vide") {
          val (mdF, mdE) = findBox(p, f, e, "mdia").get
          val (miF, miE) = findBox(p, mdF, mdE, "minf").get
          val (sbF, sbE) = findBox(p, miF, miE, "stbl").get
          val samples = resolveSamples(p, sbF, sbE).map { case (off, len, sy) =>
            (java.util.Arrays.copyOfRange(p, off, off + len), sy)
          }
          found = Some((meta.codec, samples))
        }
      }
    }
    found.getOrElse(throw new IllegalArgumentException("mp4: no video track"))
  }

  /** Frame decoder for [[graft.operators.Media.pdqFrames]]: the first
    * video track's samples decoded per codec. `jpeg` decodes (with the
    * Annex-K splice for DHT-less streams, as in AVI); compressed
    * codecs we cannot decode pure-JVM refuse BY NAME so the error
    * routes the file to the metadata tier, not silence. */
  val mp4Frames: Array[Byte] => Seq[(Int, Int, Array[Int])] = p => {
    val (codec, samples) = videoSamples(p)
    codec match {
      case "jpeg" | "mjpa" =>
        samples.map { case (bytes, _) =>
          graft.operators.Jpeg.decode(graft.operators.Jpeg.withStdHuffmanIfMissing(bytes))
        }
      case other =>
        throw new IllegalArgumentException(
          s"mp4: codec '$other' needs an external decoder (only 'jpeg'/'mjpa' decode pure-JVM); " +
            "route via Mp4.tracks for metadata triage")
    }
  }

  // --------------------------------------------------------- encoder

  /** Minimal-but-valid MP4 writer — one `jpeg`-codec video track, the
    * synthesis half of the round-trip. Samples pack two per chunk (so
    * the `stsc`/`stco` resolver is actually exercised), `stss` marks
    * every `syncEvery`-th frame (1 = all sync, as MJPEG truly is;
    * larger values synthesize keyframe-cadence fixtures for the
    * metadata tier). Timescale is `fps * 1000`, delta 1000. */
  def encodeMp4Jpeg(w: Int, h: Int, jpegFrames: Seq[Array[Byte]], fps: Int = 10,
      syncEvery: Int = 1): Array[Byte] = {
    require(jpegFrames.nonEmpty, "an MP4 needs at least one frame")
    require(fps >= 1 && syncEvery >= 1, s"bad fps=$fps syncEvery=$syncEvery")
    def box(typ: String, bodies: Array[Byte]*): Array[Byte] = {
      val inner = bodies.map(_.length).sum
      val b = java.nio.ByteBuffer.allocate(8 + inner)
      b.putInt(8 + inner).put(typ.getBytes("US-ASCII"))
      bodies.foreach(b.put)
      b.array()
    }
    def be32(vs: Long*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(v => b.putInt(v.toInt))
      b.array()
    }
    def be16(vs: Int*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(2 * vs.length)
      vs.foreach(v => b.putShort(v.toShort))
      b.array()
    }
    val n = jpegFrames.length
    val timescale = fps.toLong * 1000L
    val duration = n.toLong * 1000L
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isommp41".getBytes("US-ASCII"))
    val mdatBody = jpegFrames.toArray.flatten
    // sample file offsets: ftyp + mdat header precede the payloads
    val base = ftyp.length + 8
    val offs = jpegFrames.scanLeft(base)((o, f) => o + f.length).init
    // two samples per chunk → chunk offsets are every other sample's offset
    val chunkOffs = offs.zipWithIndex.collect { case (o, i) if i % 2 == 0 => o.toLong }
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0),
      be32(0, 0, timescale, duration, 0x00010000L), be16(0x0100, 0),
      be32(0, 0), be32(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L),
      be32(0, 0, 0, 0, 0, 0), be32(2))
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 3),
      be32(0, 0, 1, 0, duration), be32(0, 0), be16(0, 0, 0, 0),
      be32(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L),
      be32(w.toLong << 16, h.toLong << 16))
    val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0),
      be32(0, 0, timescale, duration), be16(0x55c4, 0))
    val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
      "vide".getBytes("US-ASCII"), be32(0, 0, 0), Array[Byte](0))
    val stsd = {
      // VisualSampleEntry 'jpeg': 6 reserved + dref(2) + 16 pre/res + w h + res(4+4+4) + framecount + name(32) + depth + -1
      val entry = box("jpeg", new Array[Byte](6), be16(1),
        be16(0, 0), be32(0, 0, 0), be16(w, h), be32(0x00480000L, 0x00480000L, 0),
        be16(1), new Array[Byte](32), be16(24), be16(0xffff))
      box("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
    }
    val stts = box("stts", Array[Byte](0, 0, 0, 0), be32(1, n, 1000))
    val stsc = box("stsc", Array[Byte](0, 0, 0, 0), be32(1, 1, 2, 1))
    val stsz = box("stsz", Array[Byte](0, 0, 0, 0),
      be32((0L +: n.toLong +: jpegFrames.map(_.length.toLong)): _*))
    val stco = box("stco", Array[Byte](0, 0, 0, 0),
      be32((chunkOffs.length.toLong +: chunkOffs): _*))
    val syncs = (1 to n).filter(s => (s - 1) % syncEvery == 0)
    val stss =
      if (syncEvery == 1) Array.emptyByteArray // absent = all sync, the spec default
      else box("stss", Array[Byte](0, 0, 0, 0),
        be32((syncs.length.toLong +: syncs.map(_.toLong)): _*))
    val stblKids = Seq(stsd, stts, stsc, stsz, stco) ++
      (if (stss.isEmpty) Seq.empty else Seq(stss))
    val stbl = box("stbl", stblKids: _*)
    val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1), be16(0, 0, 0, 0))
    val dinf = box("dinf", box("dref", Array[Byte](0, 0, 0, 0), be32(1),
      box("url ", Array[Byte](0, 0, 0, 1))))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val out = java.nio.ByteBuffer.allocate(ftyp.length + 8 + mdatBody.length + moov.length)
    out.put(ftyp).putInt(8 + mdatBody.length).put("mdat".getBytes("US-ASCII"))
      .put(mdatBody).put(moov)
    out.array()
  }
}
