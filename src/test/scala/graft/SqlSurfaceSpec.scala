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

  test("every engine expression is callable from SQL via GraftExtensions") {
    // GraftExtensions wires these same builders at session build time; on
    // the shared live test session, register through the bridge instead
    // (same builder lambdas, same names).
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    import graft.functions._
    SparkBridge.registerFunction(spark, "ts_tokens", cs => TsTokens(cs(0)))
    SparkBridge.registerFunction(spark, "simhash16", cs => SimHash16(cs(0)))
    SparkBridge.registerFunction(spark, "minhash_signature",
      cs => MinHashSignature(cs(0),
        cs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]))
    SparkBridge.registerFunction(spark, "hashed_shingles",
      cs => HashedShingles(cs(0),
        cs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]))
    SparkBridge.registerFunction(spark, "sorted_intersect_size",
      cs => SortedIntersectSize(cs(0), cs(1)))
    SparkBridge.registerFunction(spark, "gram_stats",
      cs => GramStats(cs(0),
        cs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]))
    val r = spark.sql(
      """SELECT ts_tokens('The Running dogs') AS tt,
        |  simhash16(array('a', 'b')) AS sh,
        |  minhash_signature(array('a b c'), 4) AS ms,
        |  hashed_shingles(array('a', 'b', 'c'), 2) AS hs,
        |  sorted_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS sis,
        |  gram_stats(array('a', 'b', 'a', 'b'), 2) AS gs""".stripMargin)
      .collect()(0)
    val gs = r.getAs[org.apache.spark.sql.Row]("gs")
    assert(gs.getLong(0) == 3 && gs.getLong(1) == 2 && gs.getLong(2) == 2)
    assert(r.getAs[scala.collection.Seq[String]]("tt") == Seq("runn", "dog"))
    assert(r.getAs[scala.collection.Seq[String]]("ms").length == 4)
    assert(r.getAs[scala.collection.Seq[Long]]("hs").length == 2)
    assert(r.getAs[Int]("sis") == 2)
    // minhash_signature NULL parity: SQL registration carries the same
    // coalesce wrapper as TextFunctions.minhashSignature (m nulls, not NULL)
    SparkBridge.registerFunction(spark, "minhash_signature_wrapped",
      cs => {
        import org.apache.spark.sql.catalyst.expressions.{Coalesce, CreateArray, Literal}
        import org.apache.spark.sql.types.StringType
        val m = cs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]
        Coalesce(Seq(MinHashSignature(cs(0), m),
          CreateArray(Seq.fill(m)(Literal.create(null, StringType)))))
      })
    val nullSig = spark.sql(
      "SELECT minhash_signature_wrapped(CAST(NULL AS ARRAY<STRING>), 4) AS s")
      .collect()(0).getAs[scala.collection.Seq[String]]("s")
    assert(nullSig != null && nullSig.length == 4 && nullSig.forall(_ == null))

    // simhash16 from SQL == the Column helper
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaCol = Seq("a b").toDF("t")
      .select(SimHash16.simhash16(split(col("t"), " "))).collect()(0).getLong(0)
    val viaSql = spark.sql("SELECT simhash16(array('a', 'b'))").collect()(0).getLong(0)
    assert(viaCol == viaSql)
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
