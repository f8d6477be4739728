package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
  private lazy val qvec: Seq[Float] = emb.filter($"vec_id" === 0L)
    .select("embedding").as[Seq[Float]].collect()(0)

  test("full-probe IVF search == brute-force top-k (correctness anchor)") {
    val m = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val assigned = IvfIndex.assign(emb, "vec_id", "embedding", m).cache()
    // every vector lands in exactly one of k partitions
    assert(assigned.count() == emb.count())
    assert(assigned.select("centroid_id").distinct().count() <= 8)

    val full = IvfIndex.search(assigned, "vec_id", "embedding", m, qvec,
      topK = 10, nprobe = 8)
      .as[(Long, Double)].collect().toSeq
    val brute = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.cosineSim(col("embedding"), typedlit(qvec)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .as[(Long, Double)].collect().toSeq
    assert(full == brute)
  }

  test("narrow probe returns ranked subset from probed partitions only") {
    val m = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val assigned = IvfIndex.assign(emb, "vec_id", "embedding", m).cache()
    val hits = IvfIndex.search(assigned, "vec_id", "embedding", m, qvec,
      topK = 10, nprobe = 2).collect()
    assert(hits.length == 10)
    val sims = hits.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
    val probes = m.rank(qvec.map(_.toDouble)).take(2).toSet
    val hitIds = hits.map(_.getLong(0)).toSet
    val allowed = assigned.filter(col("centroid_id").isin(probes.toSeq: _*))
      .select("vec_id").as[Long].collect().toSet
    assert(hitIds.subsetOf(allowed))
  }
}
