package graft

import graft.operators.PqIndex
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
  private lazy val qvec: Seq[Float] = emb.filter($"vec_id" === 0L)
    .select("embedding").as[Seq[Float]].collect()(0)

  private def brute10: Seq[Long] = emb
    .select(col("vec_id"),
      graft.functions.VectorFunctions.cosineSim(col("embedding"), typedlit(qvec)).as("sim"))
    .orderBy(col("sim").desc, col("vec_id")).limit(10)
    .select("vec_id").as[Long].collect().toSeq

  // Lossless anchor: K >= number of vectors means the seeding covers every
  // subvector, every reconstruction is exact, and PQ search == brute-force
  // cosine top-k — the same degeneracy anchor as IVF's nprobe = k.
  test("K >= n: PQ search with full rerank == brute-force top-k") {
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 24L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2f - 1f)))
    val tiny = vecs.toDF("vec_id", "embedding")
    val m = PqIndex.train(tiny, "vec_id", "embedding",
      numSubspaces = 4, codebookSize = 24, iters = 1)
    val enc = PqIndex.encode(tiny, "vec_id", "embedding", m).cache()
    val q = vecs.head._2
    val pq = PqIndex.search(enc, "vec_id", "embedding", m, q, topK = 5, rerank = 5)
      .as[(Long, Double)].collect().toSeq
    val brute = tiny.select(col("vec_id"),
        graft.functions.VectorFunctions.cosineSim(col("embedding"), typedlit(q)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(pq == brute)
  }

  test("training is deterministic: same data -> same codebooks") {
    def train() = PqIndex.train(emb, "vec_id", "embedding",
      numSubspaces = 8, codebookSize = 16, iters = 2)
    val (a, b) = (train(), train())
    assert(a.codebooks.length == 8 && a.codebooks.forall(_.length == 16))
    a.codebooks.zip(b.codebooks).foreach { case (sa, sb) =>
      sa.zip(sb).foreach { case (ca, cb) => assert(ca.toSeq == cb.toSeq) }
    }
  }

  test("codes are well-formed: length M, values in [0, K)") {
    val m = PqIndex.train(emb, "vec_id", "embedding",
      numSubspaces = 8, codebookSize = 16, iters = 1)
    val enc = PqIndex.encode(emb, "vec_id", "embedding", m)
    val bad = enc.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
    assert(enc.count() == emb.count())
  }

  // Lossy regime on the fixture corpus: the ADC-pruned + reranked search
  // must keep most of the exact top-10. The floor is set ~20% under the
  // measured value so a real recall regression (codebook or ADC bug)
  // fails while run-to-run float jitter does not.
  test("lossy-regime recall@10 vs exact cosine >= 0.7 with rerank=50") {
    val m = PqIndex.train(emb, "vec_id", "embedding",
      numSubspaces = 8, codebookSize = 16, iters = 2)
    val enc = PqIndex.encode(emb, "vec_id", "embedding", m).cache()
    val hits = PqIndex.search(enc, "vec_id", "embedding", m, qvec,
      topK = 10, rerank = 50)
      .select("vec_id").as[Long].collect().toSet
    val recall = brute10.count(hits.contains) / 10.0
    assert(recall >= 0.7, s"recall@10 = $recall")
  }

  // IVF-PQ composition: encode preserves IVF's centroid_id, the probe
  // filter bounds the candidate set to the probed partitions, and with
  // every partition probed the stack degrades to plain PQ (the scan-
  // fraction knob and the bandwidth knob are independent).
  test("IVF-PQ stack: hits come from probed partitions; full probe == plain PQ") {
    val ivf = graft.operators.IvfIndex.train(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val pq = PqIndex.train(emb, "vec_id", "embedding",
      numSubspaces = 8, codebookSize = 16, iters = 2)
    val indexed = PqIndex.encode(
      graft.operators.IvfIndex.assign(emb, "vec_id", "embedding", ivf),
      "vec_id", "embedding", pq).cache()
    val probes = ivf.rank(qvec.map(_.toDouble)).take(2)
    val narrow = PqIndex.search(
      indexed.filter(col("centroid_id").isin(probes: _*)),
      "vec_id", "embedding", pq, qvec, topK = 10, rerank = 50)
      .select("vec_id").as[Long].collect().toSeq
    val allowed = indexed.filter(col("centroid_id").isin(probes: _*))
      .select("vec_id").as[Long].collect().toSet
    assert(narrow.toSet.subsetOf(allowed))
    val fullProbe = PqIndex.search(indexed, "vec_id", "embedding", pq, qvec,
      topK = 10, rerank = 50).select("vec_id").as[Long].collect().toSeq
    val plainPq = PqIndex.search(
      PqIndex.encode(emb, "vec_id", "embedding", pq),
      "vec_id", "embedding", pq, qvec, topK = 10, rerank = 50)
      .select("vec_id").as[Long].collect().toSeq
    assert(fullProbe == plainPq)
  }

  test("zero-norm and null vectors neither crash encode nor surface in top-k") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 12L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2f - 1f))) ++
      Seq((12L, Seq.fill(16)(0f)))
    val tiny = vecs.toDF("vec_id", "embedding")
      .unionAll(Seq((13L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val nonNull = tiny.filter(col("embedding").isNotNull)
    val m = PqIndex.train(nonNull, "vec_id", "embedding",
      numSubspaces = 4, codebookSize = 8, iters = 1)
    val enc = PqIndex.encode(nonNull, "vec_id", "embedding", m)
    assert(enc.count() == 13)
    val hits = PqIndex.search(enc, "vec_id", "embedding", m, vecs.head._2,
      topK = 5, rerank = 13).as[(Long, Double)].collect()
    assert(hits.length == 5)
    // the zero vector scores cosine 0 by the engine-wide convention
    assert(hits.forall { case (id, sim) => id != 13L && !sim.isNaN })
  }
}
