package graft.tools

import graft.operators.Av1Decoder

/** Dev tool: pin the loop-restoration unit-type CDF values by sweeping
  * candidates against a dav1d golden of a header-forced LR stream.
  * Usage: runMain graft.tools.Av1LrPin <dir> <name> <slot 0|1|2|3>
  * Sweeps the chosen slot's icdf over all 6-bit-effective values while
  * holding the others at the current defaults; prints candidates whose
  * decode is bit-exact vs the golden. */
object Av1LrPin {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    if (args(2) == "diff") { // dev: compare decodes across two candidate values
      val obu = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, name + ".obu"))
      def dec(cdf: String): Array[Short] = {
        sys.props("av1.lr.cdf") = cdf
        Av1Decoder.decode(obu).planes.flatMap(identity[Array[Short]])
      }
      val a = dec(args(3)); val b = dec(args(4))
      println(s"equal: ${java.util.Arrays.equals(a, b)}")
      return
    }
    val obu = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, name + ".obu"))
    val golden = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, name + ".golden"))
    if (args(2) == "tapsolve") {
      // sweep wiener icdf buckets x recenter variants, print decoded taps
      for (v6 <- Seq(165, 330, 331); rc <- Seq("se", "sl", "de", "dl")) {
        sys.props("av1.lr.cdf") = s"${(v6 << 6) | 32},15913,23355,10187"
        sys.props("av1.lr.recenter") = rc
        sys.props("av1.lr.trace") = "1"
        sys.props.remove("av1.lr.lasttaps")
        try Av1Decoder.decode(obu)
        catch { case _: Exception => () }
        println(s"v6=$v6 rc=$rc taps=${sys.props.getOrElse("av1.lr.lasttaps", "?")}")
      }
      return
    }
    if (args(2) == "sweepsync") {
      // sweep slot-0..3 values x subexp variants; score = CHROMA
      // mismatch count (use on a stream whose frame-level chroma LR is
      // NONE: chroma equals post-CDEF, so chroma-bad == 0 iff the LR
      // reads consumed exactly the right bits)
      val slot2 = args(3).toInt
      val base = sys.props.getOrElse("av1.lr.cdf", "24382,20546,28092,8794")
        .split(",").map(_.toInt)
      for (se <- Seq("le", "lt")) {
        sys.props("av1.lr.subexp") = se
        var v6 = 0
        while (v6 < 512) {
          val cand = base.clone()
          cand(slot2) = (v6 << 6) | 32
          sys.props("av1.lr.cdf") = cand.mkString(",")
          try {
            val d = Av1Decoder.decode(obu)
            val lumaLen = d.planes(0).length
            val cLen = d.planes(1).length
            var badC = 0
            var i = 0
            while (i < cLen) {
              if ((d.planes(1)(i) & 0xff) != (golden(5 + lumaLen + i) & 0xff)) badC += 1
              if ((d.planes(2)(i) & 0xff) != (golden(5 + lumaLen + cLen + i) & 0xff)) badC += 1
              i += 1
            }
            var badY = 0
            i = 0
            while (i < lumaLen) { if ((d.planes(0)(i) & 0xff) != (golden(5 + i) & 0xff)) badY += 1; i += 1 }
            if (badC == 0) println(s"SYNC se=$se v6=$v6 badY=$badY badC=$badC")
          } catch { case _: Exception => () }
          v6 += 1
        }
      }
      println("sweep done")
      return
    }
    val slot = args(2).toInt
    val base = sys.props.getOrElse("av1.lr.cdf", "24382,20546,28092,8794")
      .split(",").map(_.toInt)
    var hits = List.empty[Int]
    var v6 = 0
    while (v6 < 512) {
      val cand = base.clone()
      cand(slot) = (v6 << 6) | 32 // mid of the 6-bit bucket
      sys.props("av1.lr.cdf") = cand.mkString(",")
      val ok =
        try {
          val d = Av1Decoder.decode(obu)
          val flat = d.planes.flatMap(identity[Array[Short]])
          flat.length == golden.length - 5 &&
            flat.indices.forall(i => (flat(i) & 0xff) == (golden(5 + i) & 0xff))
        } catch { case _: Exception => false }
      if (ok) hits ::= v6
      v6 += 1
    }
    println(s"slot $slot bit-exact candidates (icdf>>6): ${hits.reverse.mkString(", ")}")
  }
}
