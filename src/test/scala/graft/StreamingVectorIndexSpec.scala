package graft

import graft.streaming.StreamingVectorIndex
import org.apache.spark.sql.functions._

/** The ANN index's incremental form: streaming bucket-assigned ingest
  * with semantic dup screening against the accumulated index, exactly-
  * once re-drain, bucket-partitioned layout, and serving-time probes
  * that agree with brute force. */
class StreamingVectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vec(id: Long, label: Int, xs: Double*): String =
    s"""{"vec_id": $id, "label": $label, "embedding": [${xs.mkString(", ")}]}"""

  test("ingest buckets and partitions; dup screen drops near-dups in-batch and vs store; re-drain appends nothing") {
    val landing = tmpDir("vix-landing")
    val index = tmpDir("vix-index") + "/index"
    val ckpt = tmpDir("vix-ckpt")

    // batch 1: two orthogonal vectors (cos 0 — both kept)
    java.nio.file.Files.write(java.nio.file.Paths.get(landing, "b1.json"),
      Seq(vec(1, 0, 1.0, 0.0, 0.0, 0.0), vec(2, 1, 0.0, 1.0, 0.0, 0.0))
        .mkString("\n").getBytes("UTF-8"))
    // batch 2: 3 ≈ stored 1 (vs-store dup), 4 novel, 5 ≈ 4 (in-batch dup,
    // higher id — keep-first must keep 4 and drop 5)
    java.nio.file.Files.write(java.nio.file.Paths.get(landing, "b2.json"),
      Seq(vec(3, 0, 0.999, 0.001, 0.0, 0.0),
        vec(4, 2, 0.0, 0.0, 1.0, 0.0),
        vec(5, 2, 0.001, 0.0, 0.999, 0.0))
        .mkString("\n").getBytes("UTF-8"))

    StreamingVectorIndex.drainToIndex(spark, landing, index, ckpt, screenDups = true)
    val stored = spark.read.parquet(index)
    assert(stored.select("vec_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    // physical layout: bucket is a partition directory, not a data column scan
    val dirs = new java.io.File(index).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("bucket=")))

    // exactly-once: a re-drain over the same checkpoint appends nothing
    StreamingVectorIndex.drainToIndex(spark, landing, index, ckpt, screenDups = true)
    assert(spark.read.parquet(index).count() == 3)

    // a NEW landing file on the same checkpoint ingests incrementally
    java.nio.file.Files.write(java.nio.file.Paths.get(landing, "b3.json"),
      Seq(vec(6, 3, 0.0, 0.0, 0.0, 1.0)).mkString("\n").getBytes("UTF-8"))
    StreamingVectorIndex.drainToIndex(spark, landing, index, ckpt, screenDups = true)
    assert(spark.read.parquet(index).select("vec_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 4L, 6L))
  }

  test("knnFromIndex: planted same-direction vectors dominate the probed top-k") {
    val landing = tmpDir("vix2-landing")
    val index = tmpDir("vix2-index") + "/index"
    val ckpt = tmpDir("vix2-ckpt")
    val rnd = new scala.util.Random(7)
    val q = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    // three scaled copies of q: same sign pattern on every hyperplane ⇒
    // guaranteed home-bucket residents with cosine ≈ 1 — the serving
    // path MUST retrieve them regardless of where the random fill lands
    // (LSH recall over random vectors is a measured ~0.2 — see
    // ann_recall — so no test may assume random neighbors are probed)
    val planted = Seq(100L -> 1.0, 101L -> 0.5, 102L -> 0.25).map {
      case (id, s) => vec(id, 9, q.map(x => x * s).map(_.toDouble).toIndexedSeq: _*)
    }
    val rows = (0L until 40L).map { i =>
      val xs = Array.fill(8)(rnd.nextDouble() * 2 - 1)
      vec(i, (i % 4).toInt, xs.toIndexedSeq: _*)
    } ++ planted
    java.nio.file.Files.write(java.nio.file.Paths.get(landing, "all.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    StreamingVectorIndex.drainToIndex(spark, landing, index, ckpt)
    assert(spark.read.parquet(index).count() == 43)

    val got = StreamingVectorIndex.knnFromIndex(spark, index, q, k = 3)
      .select($"vec_id", $"sim").as[(Long, Double)].collect()
    assert(got.map(_._1).toSet == Set(100L, 101L, 102L),
      s"planted copies must be the top-3, got ${got.toSeq}")
    got.foreach { case (id, sim) =>
      assert(sim > 0.999, s"vec $id sim $sim")
    }
    // ordering contract: descending sim, id tie-break
    assert(got.map(_._2).toSeq == got.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }
}
