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
      val layout = bb.get() & 0xff
      try {
        val d = Av1Decoder.decode(obu)
        require(d.width == gw && d.height == gh, s"dims ${d.width}x${d.height} vs ${gw}x$gh")
        sys.env.get("AV1_DUMP").foreach { dir =>
          val out = new java.io.FileOutputStream(new java.io.File(dir, name + ".mine"))
          d.planes.foreach(out.write)
          out.close()
        }
        var off = 5
        var ok = true
        var p = 0
        while (p < d.planes.length) {
          val pl = d.planes(p)
          var firstBad = -1
          var bad = 0
          var i = 0
          while (i < pl.length) {
            if (pl(i) != golden(off + i)) { bad += 1; if (firstBad < 0) firstBad = i }
            i += 1
          }
          if (bad > 0) {
            ok = false
            val w = if (p == 0) gw else (gw + d.subX) >> d.subX
            println(f"  $name plane $p: $bad/${pl.length} bytes differ; first at ${firstBad % w},${firstBad / w} got ${pl(firstBad)}%d want ${golden(off + firstBad)}%d")
          }
          off += pl.length
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
