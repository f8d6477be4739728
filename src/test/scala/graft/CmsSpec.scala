package graft

import graft.functions.CountMinSketchAggregator
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Count–Min Sketch properties over the sf0.001 document corpus. */
class CmsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val tokCounts: Map[String, Long] =
    Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def sketchOf(w: Int, d: Int): Array[Long] =
    Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("tok"))
      .agg(CountMinSketchAggregator.countMinSketch(w, d, col("tok")))
      .head().getSeq[Long](0).toArray

  test("estimate never under-counts, at any width") {
    Seq((64, 3), (512, 4), (16384, 5)).foreach { case (w, d) =>
      val sk = sketchOf(w, d)
      tokCounts.foreach { case (t, n) =>
        assert(CountMinSketchAggregator.estimate(sk, t, w, d) >= n,
          s"under-count for '$t' at w=$w d=$d")
      }
    }
  }

  test("total over-estimate shrinks as width grows") {
    val errs = Seq(64, 512, 16384).map { w =>
      val sk = sketchOf(w, 4)
      tokCounts.map { case (t, n) =>
        CountMinSketchAggregator.estimate(sk, t, w, 4) - n
      }.sum
    }
    assert(errs(0) >= errs(1) && errs(1) >= errs(2))
  }

  test("production params are exact on every token of the test corpus") {
    val (w, d) = (16384, 5)
    val sk = sketchOf(w, d)
    tokCounts.foreach { case (t, n) =>
      assert(CountMinSketchAggregator.estimate(sk, t, w, d) == n)
    }
  }

  test("sketchPartitioned (treeAggregate hot path) == udaf sketch, bit for bit") {
    import spark.implicits._
    Seq((64, 3), (16384, 5)).foreach { case (w, d) =>
      val viaUdaf = sketchOf(w, d)
      val viaTree = CountMinSketchAggregator.sketchPartitioned(
        Tables.documents(spark, sf)
          .select(explode(tokens(col("text"))).as("tok")).as[String],
        w, d)
      assert(viaTree.sameElements(viaUdaf), s"sketch divergence at w=$w d=$d")
    }
  }

  test("absent key estimates zero (or pure collision mass) and sketch sums are row-consistent") {
    val (w, d) = (16384, 5)
    val sk = sketchOf(w, d)
    val total = tokCounts.values.sum
    // each CMS row independently sums to the stream length
    (0 until d).foreach { r =>
      assert(sk.slice(r * w, (r + 1) * w).sum == total)
    }
    assert(CountMinSketchAggregator.estimate(sk, "⟂-not-a-token-⟂", w, d) == 0L)
  }
}
