package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed by per-partition batch kernels.
 *
 * The Spark-side machinery here is real and tested — schema, partitioning,
 * batched iteration shape, null handling. The *codec* step is a STUB: this
 * container has no image/audio libraries, so `decodeStub` derives
 * deterministic pseudo-features from the bytes (length, content hash,
 * hash-seeded feature vector). Swapping in a real decoder changes only the
 * body of the `decode*` functions — the operator contracts stay.
 */
object MultimodalOps {

  /** Canonical media schema: (media_id, kind, bytes, meta). */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),           // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Build a deterministic synthetic media table from the documents table —
    * a stand-in for `spark.read.format("binaryFile")` over an object store
    * (text bytes play the blob role; ids/kinds/metadata are real columns). */
  def syntheticMedia(documents: DataFrame, idCol: String, textCol: String): DataFrame =
    documents.select(
      col(idCol).cast(LongType).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        // pmod: a negative id under `%` would yield element_at index 0/-1
        (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("kind"),
      col(textCol).cast(BinaryType).as("bytes"),
      struct(
        (col(idCol) % 640 + 32).cast(IntegerType).as("width"),
        (col(idCol) % 480 + 32).cast(IntegerType).as("height"),
        lit(16000).cast(IntegerType).as("sample_rate"),
        (col(idCol) % 300 + 1).cast(IntegerType).as("n_frames")).as("meta"))

  /** STUB decode: deterministic pseudo-feature vector from the blob bytes
    * (xxhash-free: plain polynomial rolling hash so any engine can
    * reproduce it). Replace with a real codec in production. */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    if (bytes == null) return out
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % dim) += (h & 0xffffL).toDouble / 65535.0
      i += 1
    }
    out
  }

  /**
   * Feature extraction over media blobs: mapPartitions in fixed-size batches
   * (the shape a real vectorized decoder wants — decode `batchSize` blobs at
   * a time, emit one feature row each). Output: (media_id, kind, feat
   * array<double>, n_bytes).
   */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("feat", ArrayType(DoubleType)),
      StructField("n_bytes", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would run one vectorized call
        batch.iterator.map { r =>
          val bytes = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
          Row(r.getLong(idIdx), r.getString(kindIdx),
            decodeStub(bytes, dim).toIndexedSeq,
            if (bytes == null) 0L else bytes.length.toLong)
        }
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index from the
    * metadata (pure expressions — the heavy decode happens downstream only
    * for sampled frames, which is the 100 TB-relevant property). */
  def sampleFrames(media: DataFrame, stride: Int = 30): DataFrame =
    media.filter(col("kind") === "video" && col("meta.n_frames") > 0)
      .select(col("media_id"),
        // n_frames <= 0 would make sequence(0, -1, stride) throw mid-job
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride)))
          .as("frame_idx"))
}
