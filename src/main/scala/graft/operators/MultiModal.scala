package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support: media payloads are opaque `binary` columns
  * with typed metadata travelling alongside. The Spark-side plumbing —
  * schema, batch shape, partition-level decode loop — is real; the codec
  * itself is a clearly-marked deterministic STUB (this container has no
  * image/audio libraries; a production build swaps `decodeStub` for a
  * jpeg/png/ffmpeg binding with the same signature).
  */
object MultiModal {

  /** Typed decode result carried next to the payload. */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      checksum: String)

  /** Magic-number sniff on raw bytes (mirror of F16's detectMime). */
  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else "bin"

  /** STUB decode: deterministic pseudo-dimensions derived from content
    * bytes. A real implementation decodes the header (e.g. PNG IHDR);
    * the call shape — bytes in, (format, w, h) out, pure function, safe
    * to run per partition — is exactly what the real codec uses. */
  private def decodeStub(bytes: Array[Byte]): (String, Int, Int) = {
    val fmt = sniffFormat(bytes)
    val h = java.util.Arrays.hashCode(bytes)
    (fmt, 64 + math.abs(h % 1024), 64 + math.abs((h >> 10) % 1024))
  }

  /** Partition-level decode: one pass over each partition's payload rows,
    * emitting typed metadata. At scale this is the pattern for any
    * per-item native decode (image resize, audio resample, frame
    * sampling): no shuffle, codec state reused across a partition, rows
    * stream through without materializing the partition. */
  def decodeMeta(df: DataFrame, idCol: String, blobCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val (fmt, w, h) = decodeStub(b)
          digest.reset()
          val sum = digest.digest(b).take(8).map("%02x".format(_)).mkString
          MediaMeta(id, fmt, w, h, b.length.toLong, sum)
        }
      }
  }

  /** Deterministic frame-sampling plan for video-like payloads: given a
    * per-item frame count, emit (doc_id, frame_idx) rows for every k-th
    * frame — the explode shape a real frame extractor feeds. */
  def sampleFrames(meta: DataFrame, idCol: String, nFramesCol: String, everyK: Int): DataFrame = {
    require(everyK >= 1, s"frame stride must be >= 1, got $everyK")
    // zero-frame items (corrupt/audio-only payloads) emit NO rows — a
    // greatest(n-1, 0) clamp would fabricate a phantom frame 0
    meta.select(col(idCol), col(nFramesCol))
      .filter(col(nFramesCol) > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col(nFramesCol) - 1, lit(everyK))))
      .select(col(idCol), col("frame_idx"))
  }

  /** Resized payload row: binary in, binary out, plus the recorded target
    * dimensions — the image-thumbnailing batch shape. */
  final case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** STUB resize: binary → binary partition-level transform. The stub
    * emits a deterministic payload (8-byte target-dim header + SHA-256 of
    * the source bytes) so tests can assert determinism and size bounds;
    * a real build swaps in an image library call with the same
    * (bytes, w, h) → bytes signature. Shape properties that are real and
    * carried by the plan: no shuffle, output size independent of input
    * size (thumbnails don't grow with originals), codec state reused
    * across each partition. */
  def resizeTo(df: DataFrame, idCol: String, blobCol: String,
      w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          digest.reset()
          val body = digest.digest(b)
          val out = java.nio.ByteBuffer.allocate(8 + body.length)
            .putInt(w).putInt(h).put(body).array()
          ResizedMedia(id, w, h, out)
        }
      }
  }

  /** Media feature row: the binary → dense-vector bridge into the ANN
    * operators (D family) — decode, then embed. */
  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** STUB feature extraction: binary payload → unit-norm Float vector,
    * deterministic (seeded from content bytes — the same contract as
    * enrich.HashEmbedder for text). The output column is directly
    * consumable by cosineSim / the LSH–IVF ANN paths, which is the point:
    * multimodal payloads enter the SAME vector-search operators as text
    * embeddings, no special-casing downstream. */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String,
      dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          digest.reset()
          val seedBytes = digest.digest(b)
          val seed = java.nio.ByteBuffer.wrap(seedBytes.take(8)).getLong
          val rnd = new java.util.Random(seed)
          val v = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
          val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
          val unit =
            if (norm == 0.0) v else v.map(x => (x / norm).toFloat)
          MediaFeatures(id, unit)
        }
      }
  }
}
