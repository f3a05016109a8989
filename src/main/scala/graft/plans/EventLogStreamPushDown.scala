package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{EventLogSkipWhere, EventLogTable}

/** Automatic streaming filter pushdown for the eventlog source.
  *
  * Spark's micro-batch planner builds a streaming DSv2 scan as
  * `newScanBuilder(options).build()` — `V2ScanRelationPushDown`
  * matches BATCH relations only (verified against Spark 4.1's
  * `MicroBatchExecution`), so a `filter(...)` over a streaming
  * relation never reaches the source through the usual pushdown
  * surface. This RESOLUTION rule closes that gap for the eventlog
  * source specifically: when a `Filter` sits directly on the log
  * relation (or on a pure-attribute `Project` of it), the conjuncts
  * expressible as simple column-vs-literal predicates are rendered
  * into the relation's `skipWhere` option, which the source's scan
  * builder turns into statistics-only row-group skipping inside every
  * micro-batch ([[graft.sources.EventLogSkipWhere]]).
  *
  * Soundness: the `Filter` node is left in place (the rule only
  * rewrites the leaf's options), so the skip hint is implied by a
  * predicate Spark still evaluates — skipping can drop page IO, never
  * rows. Idempotent: a relation that already carries `skipWhere`
  * (from this rule on a previous analysis pass, or set by hand — the
  * user's hint wins) is left untouched.
  *
  * Registered via [[graft.GraftExtensions]] (`injectResolutionRule`);
  * analysis runs when the streaming DataFrame is built, before
  * `MicroBatchExecution` snapshots the plan, which is what makes an
  * analyzer rule (not an optimizer rule — those run per-batch, after
  * the scan exists) the one extension point that can do this.
  */
object EventLogStreamPushDown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rel: StreamingRelationV2) if eligible(rel) =>
      rewrite(cond, rel).map(r => f.copy(child = r)).getOrElse(f)
    case f @ Filter(cond, p @ Project(projList, rel: StreamingRelationV2))
        if eligible(rel) && projList.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(cond, rel).map(r => f.copy(child = p.copy(child = r))).getOrElse(f)
  }

  private def eligible(rel: StreamingRelationV2): Boolean =
    rel.table.isInstanceOf[EventLogTable] &&
      !rel.extraOptions.containsKey("skipWhere")

  private def rewrite(cond: Expression, rel: StreamingRelationV2): Option[StreamingRelationV2] = {
    val schema = rel.table.schema()
    val v1 = EventLogSkipWhere.conjuncts(cond)
      .flatMap(EventLogSkipWhere.toV1(_, schema))
    if (v1.isEmpty) None
    else {
      val m = new java.util.HashMap[String, String](rel.extraOptions.asCaseSensitiveMap())
      m.put("skipWhere", EventLogSkipWhere.render(v1))
      Some(rel.copy(extraOptions = new CaseInsensitiveStringMap(m)))
    }
  }
}
