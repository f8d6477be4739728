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
  def sampleFrames(meta: DataFrame, idCol: String, nFramesCol: String, everyK: Int): DataFrame =
    meta.select(col(idCol), col(nFramesCol))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(everyK))))
      .select(col(idCol), col("frame_idx"))
}
