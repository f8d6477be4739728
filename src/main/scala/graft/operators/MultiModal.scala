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

  /** 16-bit dHash-style perceptual hash over an opaque binary payload —
    * the row-local bridge between the multimodal family and the dedup
    * family: hash here, band/verify with exactly the SimHash machinery
    * (4×4-bit blocks, Hamming ≤ 3 lossless by pigeonhole).
    *
    * Geometry (the "resize" a real dHash does with an image library,
    * expressed over the deterministic byte surface so it is oracle-able):
    * the payload is downsampled to a 4×5 grid of CELL SUMS, each cell the
    * sum of [[PHashProbes]] bytes probed on an evenly spaced
    * [[PHashPoints]]-point grid (integer positions, exact on both
    * engines); each of the 16 bits is the sign of one horizontal
    * adjacent-cell gradient — 4 gradients per row × 4 rows, dHash's
    * "is the left cell darker than the right" rule. Local byte edits
    * move one cell sum by at most ±255·probes-hit, so near-identical
    * payloads land within a few Hamming bits while any byte-level
    * checksum (multimodal_meta's sha256) scatters. All arithmetic is
    * integer compare/sum over hex-probe parses: whole-stage codegen,
    * zero shuffle, identical semantics in DuckDB for the oracle row.
    *
    * The Spark path reads the bytes DIRECTLY in the codegen'd
    * [[graft.functions.PHash16Expression]] (80 array reads in one
    * WholeStageCodegen loop — no hex string 2× the payload per row); the
    * DuckDB oracle keeps the hex-probe spelling via [[pHashCellExprs]],
    * and MultiModalSpec pins the two byte-identical.
    */
  val PHashRows = 4
  val PHashCols = 5
  val PHashProbes = 4
  val PHashCells: Int = PHashRows * PHashCols
  val PHashPoints: Int = PHashCells * PHashProbes

  /** Engine-neutral cell-sum projections. `byteAt(g)` spells "unsigned
    * byte value at 0-indexed position (g·nm1) div (points−1)" given
    * columns `hx` (lowercase hex of the payload) and `nm1`
    * (octet_length − 1, BIGINT). */
  def pHashCellExprs(byteAt: Int => String): Seq[String] =
    (0 until PHashCells).map { k =>
      (0 until PHashProbes).map(j => byteAt(k * PHashProbes + j))
        .mkString("(", " + ", s") AS c$k")
    }

  /** Engine-neutral 16-bit assembly from the cell columns c0..c19. */
  def pHashBitsExpr: String =
    (for { r <- 0 until PHashRows; c <- 0 until PHashCols - 1 } yield {
      val bit = r * (PHashCols - 1) + c
      s"(CASE WHEN c${r * PHashCols + c} < c${r * PHashCols + c + 1} THEN ${1L << bit} ELSE 0 END)"
    }).mkString("CAST(", " + ", " AS BIGINT)")


  /** (doc_id, phash) for every non-empty payload; empty payloads have no
    * pixel surface and are excluded (the same unscorable-row rule the
    * text scorers apply). */
  def pHash16(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.PHashExpression.pHash16Col(col(blobCol).cast("binary"))
          .as("phash"))
      .where(col("phash").isNotNull)

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
