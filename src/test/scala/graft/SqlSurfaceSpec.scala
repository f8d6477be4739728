package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.graftbridge.SparkBridge

class SqlSurfaceSpec extends SparkSpec {

  test("cosine_sim callable from SQL text after registration") {
    SparkBridge.registerFunction(spark, "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    val got = spark.sql(
      """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS same,
        |       cosine_sim(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS orth,
        |       cosine_sim(array(0.0F, 0.0F), array(1.0F, 1.0F)) AS zero""".stripMargin)
      .collect()(0)
    assert(got.getDouble(0) == 1.0)
    assert(got.getDouble(1) == 0.0)
    assert(got.getDouble(2) == 0.0) // zero-norm guard
  }

  test("registered function participates in full SQL queries over views") {
    SparkBridge.registerFunction(spark, "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("emb")
    val top = spark.sql(
      """SELECT e.vec_id,
        |       cosine_sim(e.embedding, q.embedding) AS sim
        |FROM emb e CROSS JOIN (SELECT embedding FROM emb WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin).collect()
    assert(top.length == 5)
    assert(top.forall(r => math.abs(r.getDouble(1)) <= 1.0))
    // same result as the DataFrame D1 path
    val d1 = SparkEntry.queries("d1_knn")(spark, "/root/testdata/sf0.001")
      .collect().take(5).map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq == d1)
  }
}
