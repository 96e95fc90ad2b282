package graft.plans

import graft.avro.{ARecord, AvroSchemaParser}
import graft.spark.{AvroDecode, AvroRuntime}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, GetStructField, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Decode-time column pruning: when a query consumes only some fields of an
  * [[AvroDecode]] result (`decoded.a`, `decoded.b`), rewrite the decode with
  * a reader schema restricted to those fields. The resolution engine then
  * SKIPS the dropped writer fields on the wire (type-directed skip,
  * reference python-udf/avro/io.py:793-822) instead of materializing them —
  * the Avro analog of parquet nested-schema pruning, and the Catalyst-wired
  * form of SURVEY §7.3's "readerSchema option" baseline.
  *
  * Two shapes are handled:
  *  1. `GetStructField(AvroDecode(...), i)` directly inside one Project;
  *  2. the post-CollapseProject shape `Project(GetStructField(attr, i), ...)
  *     over Project(Alias(AvroDecode(...), attr))` — CollapseProject keeps
  *     the decode behind an attribute precisely when it is consumed more
  *     than once, so this is the common case.
  *
  * Conservative by construction: a decode is pruned only when every use is
  * a `GetStructField`; any whole-struct use keeps the full schema. Ordinals
  * of surviving fields are remapped. */
object AvroDecodePruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case outer @ Project(_, _: Project) =>
      val p = prunePair(outer)
      pruneProject(p)
    case p: Project => pruneProject(p)
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

  /** Shape 1: decode and field accesses inside one Project. */
  private def pruneProject(p: Project): Project = {
    val decodes = p.projectList.flatMap(_.collect { case d: AvroDecode => d }).distinct
    decodes.foldLeft(p) { (proj, d) =>
      val totalUses = proj.projectList.map(_.collect { case e if e == d => e }.size).sum
      val fieldUses = proj.projectList.flatMap(_.collect {
        case g @ GetStructField(d2: AvroDecode, _, _) if d2 == d => g.ordinal
      })
      if (totalUses != fieldUses.size || fieldUses.isEmpty) proj
      else prunedDecode(d, fieldUses) match {
        case Some((newDecode, ordinalMap)) =>
          proj.copy(projectList = proj.projectList.map(_.transform {
            case g @ GetStructField(d2: AvroDecode, ord, name) if d2 == d =>
              GetStructField(newDecode, ordinalMap(ord), name)
          }.asInstanceOf[NamedExpression]))
        case None => proj
      }
    }
  }

  /** Shape 2: outer Project consumes fields of an attribute aliased to a
    * decode in the inner Project. */
  private def prunePair(outer: Project): Project = outer.child match {
    case inner: Project =>
      val aliases = inner.projectList.collect { case al @ Alias(_: AvroDecode, _) => al }
      val (newOuterList, newInnerList) =
        aliases.foldLeft((outer.projectList, inner.projectList)) {
          case ((outList, inList), al) =>
            val d = al.child.asInstanceOf[AvroDecode]
            val totalUses = outList.map(_.collect {
              case ar: AttributeReference if ar.exprId == al.exprId => ar }.size).sum
            val fieldUses = outList.flatMap(_.collect {
              case g @ GetStructField(ar: AttributeReference, _, _) if ar.exprId == al.exprId =>
                g.ordinal
            })
            if (totalUses != fieldUses.size || fieldUses.isEmpty) (outList, inList)
            else prunedDecode(d, fieldUses) match {
              case Some((newDecode, ordinalMap)) =>
                val newAlias = al.withNewChildren(Seq(newDecode)).asInstanceOf[NamedExpression]
                val newIn = inList.map(ne => if (ne eq al) newAlias else ne)
                val newOut = outList.map(_.transform {
                  case GetStructField(ar: AttributeReference, ord, name) if ar.exprId == al.exprId =>
                    GetStructField(
                      AttributeReference(ar.name, newDecode.dataType, ar.nullable,
                        ar.metadata)(ar.exprId, ar.qualifier),
                      ordinalMap(ord), name)
                }.asInstanceOf[NamedExpression])
                (newOut, newIn)
              case None => (outList, inList)
            }
        }
      if ((newOuterList eq outer.projectList) && (newInnerList eq inner.projectList)) outer
      else outer.copy(projectList = newOuterList, child = inner.copy(projectList = newInnerList))
    case _ => outer
  }
}
