package graft.plans

import graft.avro.{ARecord, AvroSchemaParser}
import graft.spark.{AvroDecode, AvroRuntime}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Expression, GetStructField, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Decode-time column pruning: when a query consumes only some fields of an
  * [[AvroDecode]] result (`decoded.a`, `decoded.b`), rewrite the decode with
  * a reader schema restricted to those fields. The resolution engine then
  * SKIPS the dropped writer fields on the wire (type-directed skip,
  * reference python-udf/avro/io.py:793-822) instead of materializing them —
  * the Avro analog of parquet nested-schema pruning, and the Catalyst-wired
  * form of SURVEY §7.3's "readerSchema option" baseline.
  *
  * Two passes:
  *  1. INLINE — a decode consumed directly inside one node's expressions
  *     (Project list, Filter condition, Aggregate grouping/aggregates);
  *  2. ALIASED — a decode bound to an attribute by `Alias` in some Project
  *     and consumed ANYWHERE above it (post-CollapseProject Projects,
  *     Filters, Aggregates, join keys …). The pass counts every reference
  *     to the attribute across the WHOLE plan, so the consumer's operator
  *     shape is irrelevant.
  *
  * Conservative by construction: a decode is pruned only when every use is
  * a `GetStructField`; any whole-struct use keeps the full schema, and a
  * plan carrying subquery expressions (whose inner references this pass
  * does not see) is left untouched. Ordinals of surviving fields are
  * remapped. */
object AvroDecodePruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val local = plan.transformUp {
      case p: Project =>
        pruneInline(p.projectList)
          .map(l => p.copy(projectList = l.asInstanceOf[Seq[NamedExpression]]))
          .getOrElse(p)
      case f: Filter =>
        pruneInline(Seq(f.condition)).map(l => f.copy(condition = l.head)).getOrElse(f)
      case a: Aggregate =>
        val n = a.groupingExpressions.size
        pruneInline(a.groupingExpressions ++ a.aggregateExpressions)
          .map(l => a.copy(groupingExpressions = l.take(n),
            aggregateExpressions = l.drop(n).asInstanceOf[Seq[NamedExpression]]))
          .getOrElse(a)
    }
    pruneAliased(local)
  }

  /** Install on a session (idempotent); rules added this way run in the
    * user-provided optimizer batch after the built-in batches. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(AvroDecodePruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AvroDecodePruning

  /** Prune a reader record to the kept ordinals; None when nothing prunable. */
  private def prunedDecode(d: AvroDecode, ordinals: Seq[Int]): Option[(AvroDecode, Map[Int, Int])] =
    AvroRuntime.parse(d.readerSchemaJson.getOrElse(d.writerSchemaJson)) match {
      case reader: ARecord if ordinals.distinct.size < reader.fields.size =>
        val keep = ordinals.distinct.sorted
        val pruned = reader.copy(fields = keep.map(reader.fields(_)))
        Some((d.copy(readerSchemaJson = Some(AvroSchemaParser.toJson(pruned))),
          keep.zipWithIndex.toMap))
      case _ => None
    }

  /** Pass 1: decode and every field access inside ONE node's expression
    * list. Returns the rewritten list, or None if nothing changed. */
  private def pruneInline(exprs: Seq[Expression]): Option[Seq[Expression]] = {
    val decodes = exprs.flatMap(_.collect { case d: AvroDecode => d }).distinct
    var changed = false
    val out = decodes.foldLeft(exprs) { (es, d) =>
      val totalUses = es.map(_.collect { case e if e == d => e }.size).sum
      val fieldUses = es.flatMap(_.collect {
        case g @ GetStructField(d2: AvroDecode, _, _) if d2 == d => g.ordinal
      })
      if (totalUses != fieldUses.size || fieldUses.isEmpty) es
      else prunedDecode(d, fieldUses) match {
        case Some((newDecode, ordinalMap)) =>
          changed = true
          es.map(_.transform {
            case GetStructField(d2: AvroDecode, ord, name) if d2 == d =>
              GetStructField(newDecode, ordinalMap(ord), name)
          })
        case None => es
      }
    }
    if (changed) Some(out) else None
  }

  /** Pass 2: decodes bound by `Alias` in a Project and consumed anywhere
    * above, through any operator shape. */
  private def pruneAliased(plan: LogicalPlan): LogicalPlan = {
    val aliasDefs: Map[ExprId, Alias] = plan.collect {
      case p: Project => p.projectList.collect { case al @ Alias(_: AvroDecode, _) => al }
    }.flatten.map(al => al.exprId -> al).toMap
    if (aliasDefs.isEmpty) return plan

    // count every reference to each alias across the whole plan: a field
    // access contributes one GetStructField AND one child AttributeReference
    // visit, so an alias is prunable iff total == fields.size (every
    // reference sits under a GetStructField)
    val total = scala.collection.mutable.Map.empty[ExprId, Int]
    val fields = scala.collection.mutable.Map.empty[ExprId, Vector[Int]]
    var hasSubquery = false
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case _: PlanExpression[_] => hasSubquery = true
        case g @ GetStructField(ar: AttributeReference, _, _) if aliasDefs.contains(ar.exprId) =>
          fields.update(ar.exprId, fields.getOrElse(ar.exprId, Vector.empty) :+ g.ordinal)
        case ar: AttributeReference if aliasDefs.contains(ar.exprId) =>
          total.update(ar.exprId, total.getOrElse(ar.exprId, 0) + 1)
        case _ =>
      })
    }
    if (hasSubquery) return plan // inner-plan references are invisible here

    val rewrites: Map[ExprId, (AvroDecode, Map[Int, Int])] = aliasDefs.flatMap {
      case (id, al) =>
        val f = fields.getOrElse(id, Vector.empty)
        if (f.nonEmpty && total.getOrElse(id, 0) == f.size)
          prunedDecode(al.child.asInstanceOf[AvroDecode], f).map(id -> _)
        else None
    }
    if (rewrites.isEmpty) plan
    else plan.transformAllExpressions {
      case al @ Alias(_: AvroDecode, _) if rewrites.contains(al.exprId) =>
        al.withNewChildren(Seq(rewrites(al.exprId)._1))
      case GetStructField(ar: AttributeReference, ord, name) if rewrites.contains(ar.exprId) =>
        val (newDecode, ordinalMap) = rewrites(ar.exprId)
        GetStructField(
          AttributeReference(ar.name, newDecode.dataType, ar.nullable,
            ar.metadata)(ar.exprId, ar.qualifier),
          ordinalMap(ord), name)
    }
  }
}
