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
  * image/audio codecs — but they sit behind an injectable seam: pass a
  * custom [[Media.ImageDecoder]] / [[Media.FrameSampler]] (e.g.
  * javacv/ffmpeg-backed) to [[Media.imageMeta]] / [[Media.frameSamples]]
  * and everything around the kernel — schema, encoders, partition
  * batching, pushdown-friendly projections — is unchanged. The default
  * stubs are deterministic (derived from the payload bytes) so plumbing
  * tests and DuckDB oracles are stable. Decoder functions must be
  * serializable (plain lambdas/objects; no captured JNI handles —
  * initialize native state lazily inside the function, it runs once per
  * executor classload).
  */
object Media {

  case class MediaItem(id: Long, kind: String, payload: Array[Byte])

  case class ImageMeta(id: Long, width: Int, height: Int, channels: Int, n_bytes: Long)

  case class FrameSample(id: Long, frame_no: Int, frame_hash: Long)

  /** Decoder seam: payload bytes → (width, height, channels). */
  type ImageDecoder = Array[Byte] => (Int, Int, Int)

  /** Sampler seam: (payload bytes, frames wanted) → (frame_no, frame
    * perceptual hash) pairs. */
  type FrameSampler = (Array[Byte], Int) => Seq[(Int, Long)]

  /** STUB decoder (the default [[ImageDecoder]]): deterministic fake
    * dimensions from the payload. A real implementation parses the
    * container header. */
  val stubImageDecoder: ImageDecoder = payload => {
    val h = java.util.Arrays.hashCode(payload)
    (64 + math.abs(h % 1024), 64 + math.abs((h / 1024) % 1024), 3)
  }

  /** STUB frame sampler (the default [[FrameSampler]]): emits `n`
    * deterministic pseudo-frame hashes. A real implementation seeks
    * keyframes and perceptual-hashes them. The fake is a modular rolling
    * hash (seed 7, base 31, mod 1e9+7) — overflow-free, so the
    * correctness oracle can replay it in SQL. */
  val FrameHashMod = 1000000007L
  val stubFrameSampler: FrameSampler = (payload, n) => {
    var acc = 7L
    payload.foreach(b => acc = (acc * 31 + (b & 0xff)) % FrameHashMod)
    val h = acc
    (0 until n).map(i => (i, h * (i + 1) % FrameHashMod))
  }

  /** Image metadata extraction, partition-batched. Swap `decode` for a
    * real codec without touching the operator. */
  def imageMeta(items: Dataset[MediaItem], decode: ImageDecoder = stubImageDecoder): Dataset[ImageMeta] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition decoder init would go here (once, not per row)
      it.map { m =>
        val (w, h, c) = decode(m.payload)
        ImageMeta(m.id, w, h, c, m.payload.length.toLong)
      }
    }
  }

  /** Keyframe sampling → flat (id, frame_no, frame_hash) relation,
    * ready for the PDQ similarity join. Swap `sample` for a real
    * keyframe extractor without touching the operator. */
  def frameSamples(items: Dataset[MediaItem], framesPerItem: Int,
      sample: FrameSampler = stubFrameSampler): Dataset[FrameSample] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.flatMap { m =>
        sample(m.payload, framesPerItem).map { case (no, fh) =>
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
