package graft

import graft.tools.ScaleUp
import org.apache.spark.sql.functions._

/** The ScaleUp fixtures are the evidence behind SCALE.md's measured
  * rehearsal, so the statistical invariants the measurements rely on are
  * pinned here — if an edit to the generator silently broke one, every
  * scale ratio would measure a different (wrong) workload.
  */
class ScaleUpSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma delta", "en", "web", 22L),
      (1L, "alpha beta gamma delta", "en", "web", 22L), // exact dup of 0
      (2L, "epsilon zeta eta theta", "en", "web", 22L),
      (3L, "epsilon zeta eta iota", "en", "news", 21L)  // near-dup of 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // adaptive stride (round 9): next power of 10 above the source's max id
  // — for these 4-row fixtures that is 10
  private val stride = 10L

  test("documents: copy 0 verbatim, ids strided, per-copy dup structure preserved, cross-copy disjoint") {
    val out = ScaleUp.inflateDocuments(docs, 3).cache()
    assert(out.count() == 12)
    // copy 0 is the original byte-for-byte
    val c0 = out.filter(col("doc_id") < stride).orderBy("doc_id")
      .select("text").collect().map(_.getString(0))
    assert(c0.toSeq == docs.orderBy("doc_id").select("text").collect().map(_.getString(0)).toSeq)
    // exact-dup ROWS scale exactly with the factor: 1 dup row per copy
    val dupRows = out.groupBy(md5(col("text"))).count()
      .agg(sum(col("count") - 1)).collect()(0).getLong(0)
    assert(dupRows == 3, s"expected 3 exact-dup rows (1 per copy), got $dupRows")
    // cross-copy: no shingle (here: no word) collides between copies
    val words = out.select(explode(split(col("text"), " ")).as("w"),
      (col("doc_id") / stride).cast("int").as("copy"))
    val collisions = words.groupBy("w").agg(countDistinct("copy").as("nc"))
      .filter(col("nc") > 1).count()
    assert(collisions == 0, "salted copies must share no token")
    // the salt is a bijection per copy: within-copy word-level equality
    // structure is identical to the original in every copy
    (0 until 3).foreach { k =>
      val c = out.filter(col("doc_id") >= k * stride &&
        col("doc_id") < (k + 1) * stride)
      val d = c.groupBy(md5(col("text"))).count()
        .filter(col("count") === 2).count()
      assert(d == 1, s"copy $k must contain exactly the original's one dup pair")
    }
    out.unpersist()
  }

  private def embs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 2.0f, -1.0f), 0),
      (1L, Array(0.5f, 0.5f, -0.5f, 0.5f), 1),
      (2L, Array(-2.0f, 1.0f, 0.0f, 3.0f), 0)
    ).toDF("vec_id", "embedding", "label")
  }

  test("embeddings: orthogonal per-copy transform preserves norms and within-copy inner products exactly") {
    val out = ScaleUp.inflateEmbeddings(embs, 4).cache()
    assert(out.count() == 12)
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val byCopy = out.collect()
      .map(r => (r.getLong(0) / stride, r.getLong(0) % stride,
        r.getSeq[Float](1)))
      .groupBy(_._1)
    val base = byCopy(0L).sortBy(_._2).map(_._3)
    (0L until 4L).foreach { k =>
      val vs = byCopy(k).sortBy(_._2).map(_._3)
      for (i <- base.indices; j <- base.indices) {
        val d0 = dot(base(i), base(j))
        val dk = dot(vs(i), vs(j))
        assert(math.abs(d0 - dk) < 1e-4,
          s"copy $k perturbed inner product ($i,$j): $d0 vs $dk")
      }
    }
    // copies are genuinely transformed (not verbatim clones): copy 1
    // differs from copy 0 in at least one vector
    val changed = byCopy(1L).sortBy(_._2).map(_._3).zip(base)
      .exists { case (a, b) => a != b }
    assert(changed, "copy 1 must not be a verbatim clone")
    out.unpersist()
  }

  test("lineitem/events: key offsets make copies disjoint (graph components never bridge)") {
    import spark.implicits._
    val li = Seq((1L, 10L, "x"), (2L, 20L, "y"))
      .toDF("l_orderkey", "l_partkey", "other")
    val out = ScaleUp.inflateLineitem(li, 3)
    assert(out.count() == 6)
    assert(out.columns.toSeq == li.columns.toSeq, "schema preserved, no copy column")
    val ok = out.select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    val pk = out.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(ok == 6 && pk == 6, "every copy's keys must be globally unique")
  }

  test("documents_nosalt mode: verbatim duplication keeps vocabulary constant") {
    val out = ScaleUp.inflateDocuments(docs, 5, salt = false)
    val vocabBase = docs.select(explode(split(col("text"), " "))).distinct().count()
    val vocabOut = out.select(explode(split(col("text"), " "))).distinct().count()
    assert(vocabBase == vocabOut, s"no-salt vocab must not grow: $vocabBase vs $vocabOut")
    assert(out.count() == 20)
  }

  test("adaptive stride: ids stay unique even under (forbidden) chaining — the round-9 collision regression") {
    // The fixed 10^6 stride collided ids when ScaleUp was chained over its
    // own output (id + (a+b)·stride; a 500k-row chained "100×" held 95k
    // distinct doc_ids and measured a bogus 3.25×-linear decade). The
    // stride now derives from the source's actual max id, so even a
    // chained second pass — still forbidden for the SALT (copy paths
    // (1,0) and (0,1) share the token suffix "1") — can no longer
    // collide ids.
    val once = ScaleUp.inflateDocuments(docs, 3)
    val twice = ScaleUp.inflateDocuments(once, 3)
    val n = twice.count()
    val nd = twice.select(countDistinct(col("doc_id"))).collect()(0).getLong(0)
    assert(n == 36 && nd == 36, s"chained ids must stay unique: $nd of $n")
  }
}
