package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns with typed metadata, processed partition-wise so decode
  * libraries initialize once per partition (the Scala analogue of a
  * batched Pandas UDF: amortized setup, streaming iterator, no
  * per-row JNI/process churn).
  *
  * The decode kernels themselves are STUBS — this container ships no
  * image/audio codecs. Each stub is deterministic (derived from the
  * payload bytes) so plumbing tests are stable; swap the marked
  * functions for real decoders (e.g. javacv/ffmpeg) in production.
  * Everything around the stubs — schema, encoders, partition batching,
  * pushdown-friendly projections — is real and tested.
  */
object Media {

  case class MediaItem(id: Long, kind: String, payload: Array[Byte])

  case class ImageMeta(id: Long, width: Int, height: Int, channels: Int, n_bytes: Long)

  case class FrameSample(id: Long, frame_no: Int, frame_hash: Long)

  /** STUB decoder: deterministic fake dimensions from the payload. A
    * real implementation parses the container header. */
  private def decodeImageMetaStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    (64 + math.abs(h % 1024), 64 + math.abs((h / 1024) % 1024), 3)
  }

  /** STUB frame sampler: emits `n` deterministic pseudo-frame hashes. A
    * real implementation seeks keyframes and perceptual-hashes them.
    * The fake is a modular rolling hash (seed 7, base 31, mod 1e9+7) —
    * overflow-free, so the correctness oracle can replay it in SQL. */
  val FrameHashMod = 1000000007L
  private def sampleFramesStub(payload: Array[Byte], n: Int): Seq[(Int, Long)] = {
    var acc = 7L
    payload.foreach(b => acc = (acc * 31 + (b & 0xff)) % FrameHashMod)
    val h = acc
    (0 until n).map(i => (i, h * (i + 1) % FrameHashMod))
  }

  /** Image metadata extraction, partition-batched. */
  def imageMeta(items: Dataset[MediaItem]): Dataset[ImageMeta] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition decoder init would go here (once, not per row)
      it.map { m =>
        val (w, h, c) = decodeImageMetaStub(m.payload)
        ImageMeta(m.id, w, h, c, m.payload.length.toLong)
      }
    }
  }

  /** Keyframe sampling → flat (id, frame_no, frame_hash) relation,
    * ready for the PDQ similarity join. */
  def frameSamples(items: Dataset[MediaItem], framesPerItem: Int): Dataset[FrameSample] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.flatMap { m =>
        sampleFramesStub(m.payload, framesPerItem).map { case (no, fh) =>
          FrameSample(m.id, no, fh)
        }
      }
    }
  }

  /** Column-level binary metadata (no decode needed): byte length and a
    * hex prefix — expressible natively, pushdown-friendly, and
    * oracle-replayable. */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      length(col(binCol)).cast("bigint").as("n_bytes"),
      // hex the payload then slice (first 8 bytes = 16 hex chars):
      // string-side slicing is portable, BLOB slicing is not
      substring(lower(hex(col(binCol))), 1, 16).as("prefix_hex")
    )
}
