package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Composite-key RUNTIME filters, made translatable (X109).
  *
  * Spark's row-level runtime group filtering
  * (`RowLevelOperationRuntimeGroupFiltering`) hands a V2 scan ONE dynamic
  * pruning condition over ALL of its `filterAttributes` — for a table
  * declaring more than one (a partition column plus a stats/bloom-stamped
  * key, the normal graft shape) that is a multi-column
  * `(a, b) IN <matched-keys subquery>`, which physical planning renders as
  * `named_struct(...) IN subquery`. Neither of Spark's runtime-filter
  * translators (`translateRuntimeFilter`/`translateRuntimeFilterV2`)
  * handles a struct key, so the scan receives NOTHING: a copy-on-write
  * DELETE/UPDATE/MERGE loses ALL runtime file pruning the moment a second
  * filter attribute exists — at 100 TB that is the difference between
  * rewriting a handful of files and scanning every statically-admitted one.
  *
  * This rule splits the tuple-membership test into per-column membership
  * tests over the same build plan:
  *
  *   `(a, b) IN (SELECT k1, k2 FROM matched)`
  *     -> `a IN (SELECT k1 FROM matched) AND b IN (SELECT k2 FROM matched)`
  *
  * a strict RELAXATION (superset of the tuple semantics) — safe here by
  * construction, because a `DynamicPruningExpression` on a V2 relation is
  * consumed ONLY as a scan runtime filter (`BatchScanExec.runtimeFilters`;
  * the planner never row-evaluates it), and the source's pruning contract
  * is conservative may-match anyway: Spark re-applies the real predicate.
  * Each single-column conjunct then translates to `sources.In` and reaches
  * [[graft.sources.OcfDataSource]]'s `filter()` — partition pruning on the
  * partition key, stats/bloom refutation on the data key.
  *
  * Runs in the user-provided optimizer batch, which Spark places AFTER the
  * `PartitionPruning` batch that plants the composite condition. Gated to
  * Filters sitting directly on OUR scans: other sources keep Spark's stock
  * behavior.
  *
  * Cost trade at scale: the N per-column subqueries each run the same
  * matched-rows build plan (Spark reuses only IDENTICAL subqueries, and
  * these differ in their final projection), so the build side — the DML
  * predicate's matching rows, small by construction — executes N times.
  * That buys file pruning on the probe side, which is the whole table:
  * at 100 TB, re-running a kilobyte-scale key scan twice to avoid reading
  * every statically-admitted file is the right side of the trade by many
  * orders of magnitude. */
object RuntimeFilterSplit extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, r: DataSourceV2ScanRelation)
        if r.scan.isInstanceOf[graft.sources.OcfScan] && hasMultiKey(cond) =>
      f.copy(condition = split(cond))
  }

  private def hasMultiKey(e: Expression): Boolean = e.exists {
    case DynamicPruningExpression(InSubquery(values, _)) => values.length > 1
    case _ => false
  }

  private def split(e: Expression): Expression = e.transformUp {
    case DynamicPruningExpression(InSubquery(values, lq: ListQuery))
        if values.length > 1 && values.forall(_.isInstanceOf[Attribute]) &&
          lq.plan.output.length == values.length && lq.joinCond.isEmpty =>
      values.zipWithIndex.map { case (v, i) =>
        val proj = Project(Seq(lq.plan.output(i)), lq.plan)
        DynamicPruningExpression(InSubquery(Seq(v),
          ListQuery(proj, lq.outerAttrs, NamedExpression.newExprId, 1,
            lq.joinCond, lq.hint))): Expression
      }.reduce(And)
  }

  /** Install on a session (idempotent), same packaging as
    * [[AvroDecodePruning.install]]. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RuntimeFilterSplit))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RuntimeFilterSplit
}
