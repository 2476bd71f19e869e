package graft.tools

import graft.sources.Heif

/** Dev loop for the AVIF pixel decode path: decode every .avif/.heic in
  * a directory via [[Heif.decodePrimary]] and print dims + an RGB
  * digest (and quadrant samples for grid checks). Usage:
  *   AVIF_DIR=/tmp/avifx runMain graft.tools.HeifDebug
  */
object HeifDebug {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(sys.env.getOrElse("AVIF_DIR", "/tmp/avifx"))
    dir.listFiles().filter(f => f.getName.endsWith(".avif") || f.getName.endsWith(".heic"))
      .sortBy(_.getName).foreach { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        try {
          val d = Heif.decodePrimary(bytes)
          val md = java.security.MessageDigest.getInstance("MD5")
          d.rgb.foreach { v =>
            md.update((v >> 24).toByte); md.update((v >> 16).toByte)
            md.update((v >> 8).toByte); md.update(v.toByte)
          }
          val hex = md.digest().map(b => f"$b%02x").mkString
          val q = Seq((d.width / 4, d.height / 4), (3 * d.width / 4, d.height / 4),
            (d.width / 4, 3 * d.height / 4), (3 * d.width / 4, 3 * d.height / 4))
            .map { case (x, y) => f"${d.rgb(y * d.width + x)}%08x" }.mkString(",")
          println(s"OK   ${f.getName} ${d.width}x${d.height} alpha=${d.hasAlpha} md5=$hex q=$q")
        } catch {
          case e: Exception => println(s"ERR  ${f.getName}: ${e.getMessage}")
        }
      }
  }
}
