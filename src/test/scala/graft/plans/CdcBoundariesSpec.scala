package graft.plans

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class CdcBoundariesSpec extends SparkTestBase {
  import spark.implicits._

  private def bounds(s: String, w: Int = 8, maskBits: Int = 4): Seq[Int] =
    Seq(s).toDF("t").select(CdcBoundaries(col("t"), w, maskBits).as("b"))
      .collect().head.getSeq[Int](0)

  private val rng = new scala.util.Random(7)
  private def randText(n: Int): String =
    Seq.fill(n)("abcdefgh ij"(rng.nextInt(11))).mkString

  test("boundaries are sorted, end at length, and chunks tile the text") {
    val s = randText(2000)
    val b = bounds(s)
    assert(b.nonEmpty && b.last == s.length)
    assert(b == b.sorted && b.distinct == b)
    val chunks = (0 +: b).sliding(2).map { case Seq(a, e) => s.substring(a, e) }.toSeq
    assert(chunks.mkString == s)
    // maskBits=4 -> expected chunk ~16 chars: the rule actually fires
    assert(b.length > s.length / 64, s"suspiciously few boundaries: ${b.length}")
  }

  test("edit locality: a prefix insertion preserves almost all chunk hashes") {
    val s = randText(4000)
    def hashes(t: String): Seq[String] = {
      val b = bounds(t)
      (0 +: b).sliding(2).map { case Seq(a, e) => t.substring(a, e) }.toSeq
        .map(c => java.security.MessageDigest.getInstance("MD5")
          .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
    val orig = hashes(s)
    val edited = hashes("Zq#" + s) // misaligning 3-char insertion
    val shared = orig.toSet.intersect(edited.toSet).size
    assert(shared >= orig.size * 8 / 10,
      s"only $shared of ${orig.size} chunks survived a prefix edit")
    // a FIXED-size chunker keeps ~zero after a misaligning edit:
    // demonstrates why CDC exists
    def fixedHashes(t: String) = t.grouped(16).toSeq
    val fs = fixedHashes(s).toSet.intersect(fixedHashes("Zq#" + s).toSet).size
    assert(fs <= orig.size / 10, s"fixed chunking unexpectedly stable: $fs")
  }

  test("edges: empty text, text shorter than the window, null, unicode code points") {
    assert(bounds("") == Seq.empty)
    assert(bounds("abc", w = 8) == Seq(3)) // no full window -> one chunk
    val n = Seq(Option.empty[String]).toDF("t")
      .select(CdcBoundaries(col("t"), 8, 4).as("b")).collect().head
    assert(n.isNullAt(0))
    // positions are code points, not UTF-16 units or bytes
    val uni = "héllo→ wörld ♥" * 40
    assert(bounds(uni).last == uni.codePointCount(0, uni.length))
  }

  test("cdcChunks operator: chunk relation tiles each doc; SQL surface registers") {
    val df = Seq((1L, randText(500)), (2L, ""), (3L, "tiny")).toDF("id", "text")
    val got = Dedup.cdcChunks(df, "id", "text", w = 8, maskBits = 4)
      .orderBy("id", "chunk_no").collect()
    val byId = got.groupBy(_.getLong(0))
    assert(!byId.contains(2L)) // empty doc -> no chunks
    assert(byId(3L).length == 1 && byId(3L).head.getInt(3) == 4)
    val lens = byId(1L).map(_.getInt(3)).sum
    assert(lens == 500) // tiling
    assert(byId(1L).map(_.getInt(1)).toSeq == byId(1L).indices.toSeq)
    val (id, info, builder) = GraftExtensions.cdcBoundariesDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val viaSql = Seq("abcdefgh" * 30).toDF("t")
      .selectExpr("cdc_boundaries(t, 8, 4) AS b").collect().head.getSeq[Int](0)
    assert(viaSql == bounds("abcdefgh" * 30))
  }
}
