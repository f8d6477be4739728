package graft

import graft.functions.VectorFunctions.cosineSim
import graft.plans.AnnBucketRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The opt-in ANN optimizer rule: plan shape and result equivalence. */
class AnnRuleSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def exactKnn(): DataFrame = {
    val emb = Tables.embeddings(spark, sf)
    val q: Seq[Double] = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toSeq.map(_.toDouble)
    emb.filter(col("vec_id") =!= 0L && col("embedding").isNotNull)
      .select(col("vec_id"), cosineSim(col("embedding"), typedlit(q)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  private def withFlag[A](on: Boolean)(f: => A): A = {
    AnnBucketRewrite.install(spark)
    val prev = spark.conf.getOption(AnnBucketRewrite.Flag)
    spark.conf.set(AnnBucketRewrite.Flag, on.toString)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(AnnBucketRewrite.Flag, v)
      case None    => spark.conf.unset(AnnBucketRewrite.Flag)
    }
  }

  test("flag off: plan untouched, results are the exact scan") {
    withFlag(on = false) {
      val df = exactKnn()
      assert(!df.queryExecution.optimizedPlan.toString.contains("hyperplane_bucket"))
      assert(df.count() == 10)
    }
  }

  test("flag on: bucket filter injected at optimization time") {
    withFlag(on = true) {
      val df = exactKnn()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("hyperplane_bucket"),
        s"expected injected bucket filter in:\n$plan")
    }
  }

  test("rewritten results equal the hand-written LSH bucket query") {
    val expected = SparkEntry.queries("ann_lsh_knn")(spark, sf).collect().toSeq
    val got = withFlag(on = true)(exactKnn().collect().toSeq)
    assert(got == expected)
  }

  test("rule is fixed-point safe: exactly one bucket filter") {
    withFlag(on = true) {
      val plan = exactKnn().queryExecution.optimizedPlan
      var n = 0
      plan.foreach(p => p.expressions.foreach(_.foreach {
        case _: graft.functions.HyperplaneBucket => n += 1
        case _ => ()
      }))
      assert(n == 1, s"expected exactly one bucket expression, got $n")
    }
  }

  private def thresholdScan(): DataFrame = {
    val emb = Tables.embeddings(spark, sf)
    val q: Seq[Double] = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toSeq.map(_.toDouble)
    emb.filter(col("vec_id") =!= 0L && col("embedding").isNotNull)
      .select(col("vec_id"), cosineSim(col("embedding"), typedlit(q)).as("sim"))
      .filter(col("sim") >= 0.2)
      .orderBy(col("sim").desc, col("vec_id"))
  }

  test("threshold shape: bucket conjunct appended with flag on, absent with flag off") {
    withFlag(on = false) {
      assert(!thresholdScan().queryExecution.optimizedPlan.toString
        .contains("hyperplane_bucket"))
    }
    withFlag(on = true) {
      val plan = thresholdScan().queryExecution.optimizedPlan.toString
      assert(plan.contains("hyperplane_bucket"),
        s"expected bucket conjunct in:\n$plan")
    }
  }

  test("threshold rewrite equals the hand-written bucket + threshold query") {
    import graft.queries.VectorSearchQueries
    val emb = Tables.embeddings(spark, sf).filter(col("embedding").isNotNull)
      .withColumn("bucket", VectorSearchQueries.bucketCol(col("embedding")))
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qv"), col("bucket").as("qb")).head()
    val qv = q.getSeq[Float](0).toSeq.map(_.toDouble)
    val expected = emb.filter(col("vec_id") =!= 0L && col("bucket") === q.getString(1))
      .select(col("vec_id"), cosineSim(col("embedding"), typedlit(qv)).as("sim"))
      .filter(col("sim") >= 0.2)
      .orderBy(col("sim").desc, col("vec_id")).collect().toSeq
    val got = withFlag(on = true)(thresholdScan().collect().toSeq)
    assert(got == expected && got.nonEmpty)
  }

  test("a cosine threshold under an OR is left alone (not a top-level conjunct)") {
    withFlag(on = true) {
      val emb = Tables.embeddings(spark, sf)
      val q: Seq[Double] = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).toSeq.map(_.toDouble)
      val df = emb.filter(col("embedding").isNotNull)
        .filter(cosineSim(col("embedding"), typedlit(q)) >= 0.2 || col("label") === 2)
      assert(!df.queryExecution.optimizedPlan.toString.contains("hyperplane_bucket"),
        "bucket conjunct under an OR would wrongly restrict the other branch")
    }
  }

  private def withProbes[A](n: Int)(f: => A): A = {
    val prev = spark.conf.getOption(AnnBucketRewrite.ProbesFlag)
    spark.conf.set(AnnBucketRewrite.ProbesFlag, n.toString)
    try withFlag(on = true)(f)
    finally prev match {
      case Some(v) => spark.conf.set(AnnBucketRewrite.ProbesFlag, v)
      case None    => spark.conf.unset(AnnBucketRewrite.ProbesFlag)
    }
  }

  test("probes=N injects bucket IN (home + N Hamming-1 flips)") {
    withProbes(4) {
      val plan = exactKnn().queryExecution.optimizedPlan
      val inSets = plan.collect { case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case in: org.apache.spark.sql.catalyst.expressions.In
              if in.value.isInstanceOf[graft.functions.HyperplaneBucket] => in.list
        }
      }.flatten
      assert(inSets.nonEmpty, "expected an IN-probe bucket predicate")
      val buckets = inSets.head.map(
        _.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.toString)
      assert(buckets.size == 5, s"home + 4 flips expected, got $buckets")
      assert(buckets.distinct.size == 5, "probe buckets must be distinct")
      val home = buckets.head
      assert(buckets.tail.forall(b =>
        b.zip(home).count { case (x, y) => x != y } == 1),
        s"every probe must be Hamming-1 from home: $buckets")
    }
  }

  test("probes=full ball: rewritten results equal the hand-written multiprobe query") {
    val expected = SparkEntry.queries("ann_lsh_multiprobe")(spark, sf).collect().toSeq
    val got = withProbes(4)(exactKnn().collect().toSeq)
    assert(got == expected && got.nonEmpty)
  }

  test("probes malformed or zero: falls back to home-bucket equality") {
    val prev = spark.conf.getOption(AnnBucketRewrite.ProbesFlag)
    spark.conf.set(AnnBucketRewrite.ProbesFlag, "not-a-number")
    try withFlag(on = true) {
      val expected = SparkEntry.queries("ann_lsh_knn")(spark, sf).collect().toSeq
      assert(exactKnn().collect().toSeq == expected)
    } finally prev match {
      case Some(v) => spark.conf.set(AnnBucketRewrite.ProbesFlag, v)
      case None    => spark.conf.unset(AnnBucketRewrite.ProbesFlag)
    }
  }

  test("registry ann_rule_knn leaves the flag unset afterwards") {
    val before = spark.conf.getOption(AnnBucketRewrite.Flag)
    SparkEntry.queries("ann_rule_knn")(spark, sf).collect()
    assert(spark.conf.getOption(AnnBucketRewrite.Flag) == before)
  }

  test("codegen'd bucket expression equals its declarative spec") {
    import graft.queries.VectorSearchQueries
    val emb = Tables.embeddings(spark, sf).filter(col("embedding").isNotNull)
    val both = emb.select(
      VectorSearchQueries.bucketCol(col("embedding")).as("fast"),
      VectorSearchQueries.bucketColSpec(col("embedding")).as("spec"))
    assert(both.filter(col("fast") =!= col("spec")).count() == 0)
  }
}
