package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension that exposes the engine's custom expressions to SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT cosine_sim(embedding, query_vec) FROM emails")
  * }}}
  *
  * Registration also works on a live session via
  * [[org.apache.spark.sql.graftbridge.SparkBridge.registerFunction]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    // Opt-in ANN rewrite: inert unless spark.graft.ann.rewrite=true
    // (see graft.plans.AnnBucketRewrite).
    ext.injectOptimizerRule(_ => graft.plans.AnnBucketRewrite())
  }
}
