package graft.tools

import graft.operators.Av1Decoder

/** Dev loop for the AV1 decoder: decode fixture .obu files and diff
  * against the libdav1d .golden planes. Usage:
  *   runMain graft.tools.Av1Debug [fixtureName ...]
  */
object Av1Debug {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(sys.env.getOrElse("AV1_DIR", "src/test/resources/av1"))
    val names =
      if (args.nonEmpty) args.toSeq
      else dir.listFiles().filter(_.getName.endsWith(".obu")).map(_.getName.stripSuffix(".obu")).sorted.toSeq
    var pass = 0
    names.foreach { name =>
      val obu = java.nio.file.Files.readAllBytes(new java.io.File(dir, name + ".obu").toPath)
      val golden = java.nio.file.Files.readAllBytes(new java.io.File(dir, name + ".golden").toPath)
      val bb = java.nio.ByteBuffer.wrap(golden).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val gw = bb.getShort() & 0xffff
      val gh = bb.getShort() & 0xffff
      val layoutRaw = bb.get() & 0xff
      val layout = layoutRaw & 0x7f
      val wide = (layoutRaw & 0x80) != 0 // bit 7: planes stored as LE u16 (hbd)
      try {
        val d = Av1Decoder.decode(obu)
        require(d.width == gw && d.height == gh, s"dims ${d.width}x${d.height} vs ${gw}x$gh")
        sys.env.get("AV1_DUMP").foreach { dir =>
          val out = new java.io.FileOutputStream(new java.io.File(dir, name + ".mine"))
          d.planes.foreach { pl =>
            if (wide) pl.foreach { v => out.write(v & 0xff); out.write((v >> 8) & 0xff) }
            else pl.foreach(v => out.write(v & 0xff))
          }
          out.close()
        }
        var off = 5
        var ok = true
        var p = 0
        @inline def want(k: Int): Int =
          if (wide) (golden(off + 2 * k) & 0xff) | ((golden(off + 2 * k + 1) & 0xff) << 8)
          else golden(off + k) & 0xff
        while (p < d.planes.length) {
          val pl = d.planes(p)
          var firstBad = -1
          var bad = 0
          var i = 0
          while (i < pl.length) {
            if ((pl(i) & 0xffff) != want(i)) { bad += 1; if (firstBad < 0) firstBad = i }
            i += 1
          }
          if (bad > 0) {
            ok = false
            val w = if (p == 0) gw else (gw + d.subX) >> d.subX
            println(f"  $name plane $p: $bad/${pl.length} px differ; first at ${firstBad % w},${firstBad / w} got ${pl(firstBad)}%d want ${want(firstBad)}%d")
          }
          off += pl.length * (if (wide) 2 else 1)
          p += 1
        }
        if (ok) { println(s"PASS $name"); pass += 1 }
        else println(s"FAIL $name (layout=$layout)")
      } catch {
        case e: Exception =>
          println(s"ERR  $name: ${e.getMessage}")
          if (sys.env.contains("AV1_STACK")) e.printStackTrace()
      }
    }
    println(s"$pass/${names.size} fixtures bit-exact")
  }
}
