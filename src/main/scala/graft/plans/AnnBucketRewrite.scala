package graft.plans

import graft.functions.{CosineSimilarity, HyperplaneBucket}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Opt-in ANN rewrite (the "optional rule" of SURVEY §4): turns an EXACT
  * cosine retrieval over a *literal* query vector into the deterministic
  * hyperplane-LSH bucket search. Two shapes are recognized:
  *
  * {{{ ORDER BY cosine_sim(embedding, <literal q>) DESC ... LIMIT k }}}
  *
  * gets `WHERE hyperplane_bucket(embedding) = <bucket(q)>` injected
  * beneath the projection (bucket computed at optimization time), and a
  * threshold scan
  *
  * {{{ WHERE ... AND cosine_sim(embedding, <literal q>) >= <τ > 0> }}}
  *
  * gets the same bucket equality appended as one more conjunct — in both
  * cases the scan then reads ~2⁻ᵖˡᵃⁿᵉˢ of the rows before the exact
  * compare. This trades recall for scan volume, so it NEVER fires unless
  * the session explicitly opts in with `spark.graft.ann.rewrite=true`;
  * with the flag set, results equal the explicit LSH-bucket queries
  * (`ann_lsh_knn` / `ann_rule_threshold`'s oracle) bit-for-bit, because
  * planes and bucketing are the same deterministic spec.
  *
  * Scope guards: top-k only fires on a Sort whose PRIMARY key is the
  * cosine alias, descending, directly under a limit; threshold only
  * fires on a TOP-LEVEL conjunct (a cosine comparison under an OR must
  * not constrain the other branch); both need a literal query vector (a
  * DataFrame-sourced query column means the caller composed their own
  * plan — leave it alone), a positive threshold where applicable, and
  * fire only once (a bucket predicate already present stops
  * re-application, which also makes the rule fixed-point-safe).
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) or on a live session through
  * `spark.experimental.extraOptimizations` ([[AnnBucketRewrite.install]]).
  */
case class AnnBucketRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString(AnnBucketRewrite.Flag, "false") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_,
          sort @ Sort(order, true, proj @ Project(projList, child), _)))
          if !AnnBucketRewrite.alreadyBucketed(child) =>
        rewrite(order, projList, child) match {
          case Some(filtered) =>
            gl.copy(child = ll.copy(child =
              sort.copy(child = proj.copy(child = filtered))))
          case None => gl
        }
      case f @ Filter(cond, child)
          if !cond.exists(_.isInstanceOf[HyperplaneBucket]) =>
        thresholdBucket(cond, child) match {
          case Some(bucketPred) => f.copy(condition = And(cond, bucketPred))
          case None => f
        }
    }

  /** Threshold shape: one TOP-LEVEL conjunct comparing
    * cosine_sim(vec, literal) against a positive literal lower bound
    * (either operand order). Returns the bucket-equality predicate to
    * conjoin. */
  private def thresholdBucket(
      cond: Expression, child: LogicalPlan): Option[Expression] =
    splitConjunctivePredicates(cond).iterator.flatMap {
      case GreaterThanOrEqual(cs: CosineSimilarity, Literal(t: Double, DoubleType))
          if t > 0 => vecAndQuery(cs, child)
      case GreaterThan(cs: CosineSimilarity, Literal(t: Double, DoubleType))
          if t > 0 => vecAndQuery(cs, child)
      case LessThanOrEqual(Literal(t: Double, DoubleType), cs: CosineSimilarity)
          if t > 0 => vecAndQuery(cs, child)
      case LessThan(Literal(t: Double, DoubleType), cs: CosineSimilarity)
          if t > 0 => vecAndQuery(cs, child)
      case _ => None
    }.map { case (vec, q) => bucketPredicate(vec, q) }
      .nextOption()

  /** Match: primary sort key descending and bound to a projected alias of
    * cosine_sim(vec, literal) (either argument order). */
  private def rewrite(
      order: Seq[SortOrder],
      projList: Seq[NamedExpression],
      child: LogicalPlan): Option[Filter] = {
    val primary = order.headOption match {
      case Some(SortOrder(a: AttributeReference, Descending, _, _)) => Some(a)
      case _ => None
    }
    primary.flatMap { simAttr =>
      projList.collectFirst {
        case al @ Alias(cs: CosineSimilarity, _) if al.exprId == simAttr.exprId => cs
      }.flatMap(vecAndQuery(_, child))
        .map { case (vec, q) => Filter(bucketPredicate(vec, q), child) }
    }
  }

  /** The corpus-vector side and the literal query vector of a cosine
    * call, provided the corpus side is actually computable from `child`. */
  private def vecAndQuery(
      cs: CosineSimilarity, child: LogicalPlan): Option[(Expression, Seq[Double])] =
    (cs.left, cs.right) match {
      case (vec, QueryVecLiteral(q)) if vec.references.subsetOf(child.outputSet) =>
        Some((vec, q))
      case (QueryVecLiteral(q), vec) if vec.references.subsetOf(child.outputSet) =>
        Some((vec, q))
      case _ => None
    }

  /** `hyperplane_bucket(vec) = <bucket(q)>` with the bucket folded at
    * optimization time. */
  private def bucketPredicate(vec: Expression, q: Seq[Double]): Expression = {
    val planes = graft.queries.VectorSearchQueries.planesPublic
    val bucket = HyperplaneBucket.bucketOf(q, planes)
    EqualTo(HyperplaneBucket(vec, planes),
      Literal(UTF8String.fromString(bucket), StringType))
  }

  /** Extractor: a foldable array<float|double> literal as Seq[Double]. */
  private object QueryVecLiteral {
    def unapply(e: Expression): Option[Seq[Double]] = e match {
      case Literal(a: ArrayData, ArrayType(FloatType, _)) =>
        Some(a.toFloatArray().toSeq.map(_.toDouble))
      case Literal(a: ArrayData, ArrayType(DoubleType, _)) =>
        Some(a.toDoubleArray().toSeq)
      case _ => None
    }
  }
}

object AnnBucketRewrite {
  val Flag = "spark.graft.ann.rewrite"

  private[plans] def alreadyBucketed(plan: LogicalPlan): Boolean = plan match {
    case Filter(cond, _) => cond.exists(_.isInstanceOf[HyperplaneBucket])
    case _ => false
  }

  /** Idempotently add the rule to a live session (no extensions needed). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[AnnBucketRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AnnBucketRewrite()
}
