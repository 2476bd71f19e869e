package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MediaSpec extends SparkTestBase {
  import spark.implicits._

  private def items = Seq(
    Media.MediaItem(1L, "image", "payload-one".getBytes("UTF-8")),
    Media.MediaItem(2L, "image", "payload-two".getBytes("UTF-8")),
    Media.MediaItem(3L, "video", Array.emptyByteArray)
  ).toDS()

  test("imageMeta: deterministic stub dims, byte counts real") {
    val r = Media.imageMeta(items).collect().map(m => m.id -> m).toMap
    assert(r(1L).n_bytes == 11L)
    assert(r(3L).n_bytes == 0L)
    val again = Media.imageMeta(items).collect().map(m => m.id -> m).toMap
    assert(r(1L).width == again(1L).width && r(2L).height == again(2L).height)
    assert(r.values.forall(m => m.width >= 64 && m.channels == 3))
  }

  test("frameSamples: n frames per item, flat relation") {
    val r = Media.frameSamples(items, 3).collect()
    assert(r.length == 9)
    assert(r.map(_.frame_no).toSet == Set(0, 1, 2))
    // identical payload -> identical frame hashes
    val byId = r.groupBy(_.id)
    assert(byId(1L).map(_.frame_hash).toSeq != byId(2L).map(_.frame_hash).toSeq)
  }

  test("binaryMeta: byte length and hex prefix") {
    val df = Seq((1L, "abc")).toDF("id0", "text")
      .select(col("id0"), col("text").cast("binary").as("payload"))
    val r = Media.binaryMeta(df, "id0", "payload").collect().head
    assert(r.getLong(1) == 3L)
    assert(r.getString(2) == "616263")
  }
}
