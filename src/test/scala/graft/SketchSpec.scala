package graft

import org.apache.spark.sql.functions._

/** HLL and Bloom sketch properties at sf0.001. */
class SketchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("hll estimate lands within the lgK=12 error envelope of exact") {
    val rows = SparkEntry.queries("hll_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      // HLL lgK=12 rse ~= 1.04/sqrt(2^12) ~ 1.6%; allow 5 sigma
      assert(math.abs(approx - exact) <= math.max(2.0, exact * 0.09),
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("bloom pre-filter passes every true key and prunes most others") {
    val buyers = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey"))
    val bloom = buyers.stat.bloomFilter("o_custkey", 10000L, 0.01)
    val trueKeys = buyers.distinct().collect().map(_.getLong(0)).toSet
    trueKeys.foreach(k => assert(bloom.mightContain(k), s"false negative $k"))
    val all = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0))
    val passed = all.count(bloom.mightContain(_))
    // fpp 1%: passers should be close to the true-key count, far below all
    assert(passed <= trueKeys.size + math.max(5, all.length / 20))
  }

  test("bloom-pruned semi-join equals plain semi-join") {
    val pruned = SparkEntry.queries("b10_bloom_prefilter")(spark, sf).collect().toSeq
    val buyers = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000.0).select(col("o_custkey"))
    val plain = Tables.customer(spark, sf)
      .join(buyers, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")).collect().toSeq
    assert(pruned == plain)
  }
}
