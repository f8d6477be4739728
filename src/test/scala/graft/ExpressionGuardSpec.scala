package graft

import graft.functions.FfdPackFunctions.ffdPack
import graft.functions.WinnowFunctions.winnowSelect
import org.apache.spark.sql.functions._

/** Input-contract guards on the native expressions: malformed inputs must
  * fail LOUDLY at eval (null elements, position envelope) — never NPE
  * opaquely or silently corrupt hashes — while nullable-TYPED but
  * null-free inputs (every parquet round-trip) are accepted. */
class ExpressionGuardSpec extends SparkSpec {
  import spark.implicits._

  test("ffd_pack: a null element in a nullable-typed manifest fails loudly at eval, not with an NPE") {
    val df = Seq(1).toDF("x").select(expr(
      "array(named_struct('k', -3L, 'doc_id', 1L, 'n_tok', 3L), " +
        "cast(null as struct<k:bigint,doc_id:bigint,n_tok:bigint>))").as("items"))
    val e = intercept[Exception] {
      df.select(explode(ffdPack(col("items"), 256L))).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("null element"),
      s"expected the runtime null guard message, got: $msg")
  }

  test("ffd_pack accepts a parquet round-tripped manifest (nullable-typed but null-free)") {
    // parquet reads every array back as containsNull=true — the analysis
    // check must not bar persisted manifests (r11 ADVICE)
    val dir = tmpDir("ffdpq")
    Seq((1L, 3L), (2L, 2L)).toDF("doc_id", "n_tok")
      .agg(sort_array(collect_list(struct(
        (-col("n_tok")).as("k"), col("doc_id"), col("n_tok")))).as("items"))
      .write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir)
      .select(explode(ffdPack(col("items"), 4L)).as("a"))
      .select($"a.doc_id", $"a.bid").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("ffd_pack still accepts the collect_list shape (containsNull=false)") {
    val got = Seq((1L, 3L), (2L, 2L)).toDF("doc_id", "n_tok")
      .agg(sort_array(collect_list(struct(
        (-col("n_tok")).as("k"), col("doc_id"), col("n_tok")))).as("items"))
      .select(explode(ffdPack(col("items"), 4L)).as("a"))
      .select($"a.doc_id", $"a.bid").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L)) // 3 fills bin1 past 4-2, 2 opens bin2
  }

  test("winnow_select: a null token in a nullable-typed array fails loudly at eval, not with an NPE") {
    val df = Seq(1).toDF("x")
      .select(array(lit("a"), lit(null).cast("string"), lit("b")).as("tk"))
    val e = intercept[Exception] {
      df.select(winnowSelect(col("tk"), 2, 2)).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("null token"),
      s"expected the runtime null guard message, got: $msg")
  }

  test("winnow_select accepts parquet round-tripped token arrays (nullable-typed but null-free)") {
    val dir = tmpDir("winpq")
    Seq("a b c d e f g h").toDF("text")
      .select(split(col("text"), " ").as("tk"))
      .write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir)
      .select(size(winnowSelect(col("tk"), 4, 4))).as[Int].collect()
    assert(got.head >= 1)
  }

  test("winnow_select still accepts split() output (containsNull=false)") {
    val got = Seq("a b c d e f g h").toDF("text")
      .select(winnowSelect(split(col("text"), " "), 4, 4).as("h"))
      .select(size(col("h"))).as[Int].collect()
    assert(got.head >= 1)
  }

  test("winnow_select fails loudly past the 2^20 gram position envelope instead of corrupting hashes") {
    // 2^20 + 4 tokens -> 2^20 + 1 grams at k=4: one past the envelope
    val n = (1 << 20) + 4
    val text = Array.tabulate(n)(i => "t" + (i % 97)).mkString(" ")
    val e = intercept[Exception] {
      Seq(text).toDF("text")
        .select(winnowSelect(split(col("text"), " "), 4, 4)).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("position envelope"),
      s"expected the envelope guard message, got: $msg")
  }

  test("winnow_select accepts exactly 2^20 grams (the envelope boundary)") {
    val n = (1 << 20) + 3 // exactly 2^20 grams at k=4
    val text = Array.tabulate(n)(i => "t" + (i % 97)).mkString(" ")
    val got = Seq(text).toDF("text")
      .select(size(winnowSelect(split(col("text"), " "), 4, 4))).as[Int].collect()
    assert(got.head >= 1)
  }

  test("nearest_centroid: a null element in a nullable-typed query vector fails loudly, not silently as 0") {
    import graft.functions.NearestCentroidExpression.nearestCentroid
    val bad = Seq(1).toDF("x").select(
      expr("array(1L, cast(null as bigint))").as("qv"),
      expr("array(0L, 0L)").as("cm"))
    val e = intercept[Exception] {
      bad.select(nearestCentroid(col("qv"), col("cm"), 2)).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("null element"), s"got: $msg")
    // a nullable STATIC type with non-null values still computes (the
    // guard costs a scan, never a wrong answer)
    val ok = Seq(1).toDF("x").select(
      expr("transform(array(3, 4), v -> cast(v as bigint))").as("qv"),
      expr("array(0L, 0L, 3L, 4L)").as("cm"))
      .select(nearestCentroid(col("qv"), col("cm"), 2).as("nc"))
      .select(col("nc.idx")).as[Int].collect()
    assert(ok.head == 1)
  }

  test("sorted_intersect_size: a null element in a nullable-typed array fails loudly (long and string)") {
    import graft.functions.ArrayFunctions.sortedIntersectSize
    val longBad = Seq(1).toDF("x").select(
      expr("array(1L, cast(null as bigint))").as("a"),
      expr("array(1L, 2L)").as("b"))
    val e1 = intercept[Exception] {
      longBad.select(sortedIntersectSize(col("a"), col("b"))).collect()
    }
    assert((Option(e1.getCause).map(_.getMessage).getOrElse("") + e1.getMessage)
      .contains("null element"))
    val strBad = Seq(1).toDF("x").select(
      expr("array('a', cast(null as string))").as("a"),
      expr("array('a', 'b')").as("b"))
    val e2 = intercept[Exception] {
      strBad.select(sortedIntersectSize(col("a"), col("b"))).collect()
    }
    assert((Option(e2.getCause).map(_.getMessage).getOrElse("") + e2.getMessage)
      .contains("null element"))
    // tight-typed inputs (the caller contract) still codegen with NO guard
    val ok = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
      .select(sortedIntersectSize(col("a"), col("b"))).as[Int].collect()
    assert(ok.head == 2)
  }

  test("cosine_sim: a null element in a nullable-typed vector fails loudly, not as silent garbage") {
    import graft.functions.VectorFunctions.cosineSim
    val bad = Seq(1).toDF("x").select(
      expr("array(1.0F, cast(null as float))").as("a"),
      expr("array(1.0F, 2.0F)").as("b"))
    val e = intercept[Exception] {
      bad.select(cosineSim(col("a"), col("b"))).collect()
    }
    assert((Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage)
      .contains("null element"))
    // nullable STATIC type with non-null values still scores identically
    val ok = Seq(1).toDF("x").select(
      expr("array(3.0F, cast(4.0F as float))").as("a"),
      expr("array(3.0F, 4.0F)").as("b"))
      .select(cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(ok.head - 1.0) < 1e-12)
  }
}
