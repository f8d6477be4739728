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
  * Recall is tunable without touching the query text:
  * `spark.graft.ann.probes = N` widens the injected predicate to
  * `bucket IN (home + first N Hamming-1 flips)` — at N = planes the
  * rewrite reproduces the hand-written `ann_lsh_multiprobe`
  * (recall@10 0.8 on the fixture vs 0.2 home-only) for (1+N)× the
  * bucket scan volume.
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

  /** Multiprobe width: how many Hamming-1 neighbour buckets to add to the
    * injected predicate (0 = home bucket only, the minimum-scan /
    * minimum-recall point; NPlanes = the full Hamming-1 ball, matching
    * the hand-written `ann_lsh_multiprobe`). Malformed values read as 0
    * — the rewrite must never throw at optimization time. */
  private def probeCount: Int =
    try math.max(0, conf.getConfString(AnnBucketRewrite.ProbesFlag, "0").toInt)
    catch { case _: NumberFormatException => 0 }

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
    * optimization time — or, with `spark.graft.ann.probes = N`,
    * `hyperplane_bucket(vec) IN (<bucket(q)>, <flip₀>, …, <flip_{N-1}>)`:
    * the query bucket plus its first N Hamming-1 neighbours (plane-index
    * order, the same probe sequence as the hand-written
    * `ann_lsh_multiprobe`). Probing trades scan volume (1+N buckets
    * instead of 1) for recall — measured on the sf fixture: recall@10
    * 0.2 home-only vs 0.8 at the full Hamming-1 ball. */
  private def bucketPredicate(vec: Expression, q: Seq[Double]): Expression = {
    val planes = graft.queries.VectorSearchQueries.planesPublic
    val home = HyperplaneBucket.bucketOf(q, planes)
    def strLit(s: String) = Literal(UTF8String.fromString(s), StringType)
    val flips = (0 until math.min(probeCount, planes.size)).map { i =>
      home.updated(i, if (home.charAt(i) == '0') '1' else '0')
    }
    if (flips.isEmpty) EqualTo(HyperplaneBucket(vec, planes), strLit(home))
    else In(HyperplaneBucket(vec, planes), (home +: flips).map(strLit))
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
  val ProbesFlag = "spark.graft.ann.probes"

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
