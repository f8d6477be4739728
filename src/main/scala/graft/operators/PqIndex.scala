package graft.operators

import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) ANN index (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * compression rung of the ANN ladder (reference vector search surface:
  * src/vector_search.py — the reference stores full float vectors in
  * pgvector; PQ is the 100 TB-scale alternative this engine adds).
  *
  * The D-dim embedding is split into M contiguous subvectors; each
  * subspace gets its own K-centroid codebook (Lloyd-trained, same
  * deterministic seeding as [[IvfIndex]]); a vector is stored as M small
  * codes. At K ≤ 256 a 64-dim float vector (256 bytes) becomes M bytes —
  * a 32× scan-bandwidth cut at M = 8 that is the difference between
  * "embeddings fit on the cluster" and "they don't" at 100 TB.
  *
  * Search is the standard two stage: an ADC (asymmetric distance
  * computation) scan scores every row against a query-side M×K lookup
  * table of exact partial dot products — per row it is M array lookups
  * and adds, no float vector is read — then the top `rerank` survivors
  * are re-scored with exact cosine on the full vectors and the final
  * top-k comes from that. Vectors are L2-normalized before encoding, so
  * inner product against the reconstruction approximates cosine, and the
  * exact rerank uses the engine-wide [[cosineSim]] (zero-norm → 0).
  *
  * Distributed shape: training shuffles one (subspace, cluster) partial
  * mean per partition — K×D doubles total, independent of row count; the
  * M×K×(D/M) codebook (= K×D doubles) and the M×K ADC table are driver
  * objects broadcast as literals, tiny by construction. Encoding and the
  * ADC scan are row-local single-pass expressions. `codes` would be the
  * persisted index column at scale; the ADC scan reads ONLY it.
  *
  * Correctness anchor (PqIndexSpec): with K ≥ the number of distinct
  * subvectors per subspace the codebook reconstructs every vector
  * exactly, and PQ search == brute-force cosine top-k — the same
  * degeneracy anchor as IVF's nprobe = k. Lossy-regime recall@10 is
  * spec-pinned on the fixture corpus.
  */
object PqIndex {

  /** codebooks(m)(c) = centroid c of subspace m, length D/M each. */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def numSubspaces: Int = codebooks.length
    def codebookSize: Int = codebooks.headOption.map(_.length).getOrElse(0)
    def subDim: Int = codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

    /** ADC lookup table for a (normalized) query: lut(m)(c) = q_m · c. */
    def adcTable(qNorm: Array[Double]): Array[Array[Double]] =
      Array.tabulate(numSubspaces) { m =>
        Array.tabulate(codebookSize) { c =>
          val cent = codebooks(m)(c)
          var dot = 0.0
          var i = 0
          while (i < cent.length) { dot += qNorm(m * subDim + i) * cent(i); i += 1 }
          dot
        }
      }
  }

  /** L2-normalize an array<float|double> column; zero/null norm → zero
    * vector (matches the engine's cosine convention: zero-norm sims to 0,
    * and a zero query LUT scores every row 0 — harmless, never NaN). */
  private def l2normalize(vec: Column): Column = {
    val nrm = sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(nrm > 0.0, transform(vec, x => x.cast("double") / nrm))
      .otherwise(transform(vec, _ => lit(0.0)))
  }

  private def l2normalizeLocal(q: Seq[Double]): Array[Double] = {
    val n = math.sqrt(q.map(x => x * x).sum)
    if (n > 0.0) q.map(_ / n).toArray else Array.fill(q.length)(0.0)
  }

  /** Train M codebooks of K centroids with `iters` Lloyd rounds.
    * Deterministic: subspace m is seeded with the m-th subvectors of the
    * K lowest-id vectors; every round is one partial+final aggregation
    * (shuffle = one subDim-length buffer per (partition, subspace,
    * cluster)); the K×D-double codebook updates driver-side. The
    * normalize + assign pass per round is the codegen'd
    * [[graft.functions.PqEncodeDetail]] expression — one flat
    * M·K·(D/M)-multiply loop per row, not interpreted nested HOFs. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      numSubspaces: Int, codebookSize: Int, iters: Int): Model = {
    val nonNull = emb.filter(col(vecCol).isNotNull)
    val dim = nonNull.select(size(col(vecCol))).head.getInt(0)
    require(dim % numSubspaces == 0,
      s"dim $dim not divisible into $numSubspaces subspaces")
    val sub = dim / numSubspaces

    val seed = nonNull.orderBy(col(idCol)).limit(codebookSize)
      .select(l2normalize(col(vecCol)).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    var model = Model(Array.tabulate(numSubspaces, codebookSize) { (m, c) =>
      // fewer rows than K: pad by cycling the seed set (never empty — a
      // degenerate corpus still yields a well-formed codebook)
      seed(c % math.max(1, seed.length)).slice(m * sub, (m + 1) * sub)
    })

    for (_ <- 0 until iters) {
      val means = nonNull
        .select(posexplode(graft.functions.PqCodes.pqEncodeDetail(
          col(vecCol), model.codebooks)).as(Seq("m", "d")))
        .select(col("m"), col("d.sv").as("sv"), col("d.code").as("cid"))
        .groupBy(col("m"), col("cid"))
        .agg(graft.functions.VectorAvgAggregator.vectorAvg(sub, col("sv")).as("mean"))
        .collect()
      val next = Array.tabulate(numSubspaces, codebookSize)(
        (m, c) => model.codebooks(m)(c).clone())
      means.foreach { r =>
        next(r.getAs[Int]("m"))(r.getAs[Int]("cid")) = r.getSeq[Double](2).toArray
      }
      model = Model(next)
    }
    model
  }

  /** Row-local encode: appends `codes` (array<int> of length M) to the
    * input columns — composes with [[IvfIndex.assign]]'s centroid_id for
    * the IVF-PQ stack. At scale (id, centroid_id, codes) is the persisted
    * index — M bytes of payload per row. The code assignment is the
    * codegen'd [[graft.functions.PqCodes]] expression (scan-speed). */
  def encode(emb: DataFrame, idCol: String, vecCol: String, m: Model): DataFrame =
    emb.withColumn("codes",
      graft.functions.PqCodes.pqCodes(col(vecCol), m.codebooks))

  /** ADC scan + exact rerank: score every row by M table lookups over its
    * codes (the float vector is untouched), keep the `rerank` best, then
    * exact cosine on just those rows decides the final top-k. */
  def search(encoded: DataFrame, idCol: String, vecCol: String, m: Model,
      q: Seq[Float], topK: Int, rerank: Int): DataFrame = {
    val lut = typedlit(m.adcTable(l2normalizeLocal(q.map(_.toDouble))).map(_.toSeq).toSeq)
    val adc = aggregate(sequence(lit(0), lit(m.numSubspaces - 1)), lit(0.0),
      (acc, mi) => acc +
        element_at(element_at(lut, mi + 1), element_at(col("codes"), mi + 1) + 1))
    encoded
      .select(col(idCol), col(vecCol), adc.as("adc_score"))
      .orderBy(col("adc_score").desc, col(idCol))
      .limit(math.max(topK, rerank))
      .select(col(idCol), cosineSim(col(vecCol), typedlit(q)).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(topK)
  }
}
