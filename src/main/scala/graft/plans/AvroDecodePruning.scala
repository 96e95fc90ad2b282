package graft.plans

import graft.avro.{ARecord, ANull, AUnion, AvroSchema, AvroSchemaParser}
import graft.spark.{AvroDecode, AvroRuntime}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Expression, GetStructField, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Decode-time column pruning: when a query consumes only some fields of an
  * [[AvroDecode]] result (`decoded.a`, `decoded.meta.ts`), rewrite the decode
  * with a reader schema restricted to those fields — at ANY nesting depth.
  * The resolution engine then SKIPS the dropped writer fields on the wire
  * (type-directed skip, reference python-udf/avro/io.py:793-822) instead of
  * materializing them — the Avro analog of parquet nested-schema pruning,
  * and the Catalyst-wired form of SURVEY §7.3's "readerSchema option".
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
  * Uses are collected as `GetStructField` chains (access PATHS): `r.a.b`
  * prunes the nested record `a` down to `{b}`. A use that stops at a struct
  * keeps that whole subtree; a bare whole-struct use keeps the full schema;
  * a plan carrying subquery expressions (whose inner references this pass
  * cannot see) is left untouched. Ordinals at every chain level are
  * remapped against the pruned schema. Nesting is pruned through plain
  * records and nullable `["null", record]` unions; refs/general unions/
  * containers conservatively keep their subtree. */
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

  // ---- access-path machinery ----------------------------------------------

  /** Trie of access paths; `terminal` = some use stops here (keep subtree). */
  private final case class PathTrie(terminal: Boolean, children: Map[Int, PathTrie])

  private def buildTrie(paths: Seq[Seq[Int]]): Map[Int, PathTrie] = {
    def insert(nodes: Map[Int, PathTrie], path: Seq[Int]): Map[Int, PathTrie] = {
      val head = path.head
      val node = nodes.getOrElse(head, PathTrie(terminal = false, Map.empty))
      val updated =
        if (path.tail.isEmpty) node.copy(terminal = true)
        else node.copy(children = insert(node.children, path.tail))
      nodes.updated(head, updated)
    }
    paths.foldLeft(Map.empty[Int, PathTrie])(insert)
  }

  /** Old ordinal → new ordinal at one record level, plus nested remaps for
    * fields pruned deeper. A field absent from `children` kept its whole
    * subtree, so deeper ordinals pass through unchanged. */
  private final case class Remap(ord: Map[Int, Int], children: Map[Int, Remap])

  /** View a schema as a record if it is one, or a nullable union of one —
    * with a rebuilder that re-wraps the pruned record the same way. */
  private def recordView(s: AvroSchema): Option[(ARecord, ARecord => AvroSchema)] = s match {
    case r: ARecord => Some((r, identity))
    case u: AUnion => u.branches.filterNot(_ == ANull) match {
      case Seq(r: ARecord) =>
        Some((r, pruned => AUnion(u.branches.map {
          case _: ARecord => pruned
          case other => other
        })))
      case _ => None
    }
    case _ => None
  }

  /** Prune `record` to the trie's accessed fields, recursing into children
    * that are records (or nullable records) and not terminally used. */
  private def pruneRecord(record: ARecord, trie: Map[Int, PathTrie]): (ARecord, Remap) = {
    val keep = trie.keys.toSeq.sorted
    val (fields, childRemaps) = keep.map { old =>
      val f = record.fields(old)
      val node = trie(old)
      if (node.terminal || node.children.isEmpty) (f, None)
      else recordView(f.schema) match {
        case Some((sub, rebuild)) =>
          val (prunedSub, subRemap) = pruneRecord(sub, node.children)
          (f.copy(schema = rebuild(prunedSub)), Some(subRemap))
        case None => (f, None) // not a prunable shape: keep whole subtree
      }
    }.unzip
    val ordMap = keep.zipWithIndex.toMap
    (record.copy(fields = fields),
      Remap(ordMap, keep.zip(childRemaps).collect { case (o, Some(r)) => o -> r }.toMap))
  }

  private def prunedDecode(d: AvroDecode, paths: Seq[Seq[Int]]): Option[(AvroDecode, Remap)] =
    // corrupt-record (quarantine) decodes are never pruned: their sql struct
    // carries a trailing field with no Avro counterpart (ordinals would
    // misalign), and narrowing the reader schema would change WHICH
    // corruptions are even detected — the full-record decode IS the contract
    if (d.corruptRecordCol.isDefined) None
    else AvroRuntime.parse(d.readerSchemaJson.getOrElse(d.writerSchemaJson)) match {
      case reader: ARecord =>
        val (pruned, remap) = pruneRecord(reader, buildTrie(paths))
        if (pruned == reader) None
        else Some((d.copy(readerSchemaJson = Some(AvroSchemaParser.toJson(pruned))), remap))
      case _ => None
    }

  /** The access path of a GetStructField chain bottoming out at `isRoot`,
    * outermost record level first; None if the chain roots elsewhere. */
  private def chainPath(g: GetStructField, isRoot: Expression => Boolean): Option[List[Int]] =
    g.child match {
      case r if isRoot(r) => Some(List(g.ordinal))
      case inner: GetStructField => chainPath(inner, isRoot).map(_ :+ g.ordinal)
      case _ => None
    }

  /** Collect chain paths and bare-root uses without descending into
    * recognized chains (so inner nodes are not double-counted). */
  private def collectUses(e: Expression, isRoot: Expression => Boolean,
                          paths: scala.collection.mutable.Buffer[Seq[Int]],
                          bare: () => Unit): Unit = e match {
    case g: GetStructField =>
      chainPath(g, isRoot) match {
        case Some(path) => paths += path
        case None => g.children.foreach(collectUses(_, isRoot, paths, bare))
      }
    case r if isRoot(r) => bare()
    case other => other.children.foreach(collectUses(_, isRoot, paths, bare))
  }

  /** Rebuild a chain against the pruned schema: remap the ordinal at each
    * level it was pruned, splice `newRoot` at the bottom. */
  private def rebuildChain(g: GetStructField, isRoot: Expression => Boolean,
                           newRoot: Expression, remap: Remap): Expression = {
    def go(cur: GetStructField): (Expression, Option[Remap], Int) = cur.child match {
      case r if isRoot(r) =>
        val newOrd = remap.ord(cur.ordinal)
        (GetStructField(newRoot, newOrd, cur.name), remap.children.get(cur.ordinal), cur.ordinal)
      case inner: GetStructField =>
        val (rebuilt, subRemap, _) = go(inner)
        subRemap match {
          case Some(rm) =>
            (GetStructField(rebuilt, rm.ord(cur.ordinal), cur.name),
              rm.children.get(cur.ordinal), cur.ordinal)
          case None => // this level kept its whole subtree: ordinal unchanged
            (GetStructField(rebuilt, cur.ordinal, cur.name), None, cur.ordinal)
        }
      case other => throw new IllegalStateException(s"not a chain: $other")
    }
    go(g)._1
  }

  /** Rewrite every recognized chain in `e`, leaving other subtrees alone. */
  private def rewriteChains(e: Expression, isRoot: Expression => Boolean,
                            newRoot: Expression, remap: Remap): Expression = e match {
    case g: GetStructField if chainPath(g, isRoot).isDefined =>
      rebuildChain(g, isRoot, newRoot, remap)
    case other => other.mapChildren(rewriteChains(_, isRoot, newRoot, remap))
  }

  // ---- pass 1: inline decodes ---------------------------------------------

  private def pruneInline(exprs: Seq[Expression]): Option[Seq[Expression]] = {
    val decodes = exprs.flatMap(_.collect { case d: AvroDecode => d }).distinct
    var changed = false
    val out = decodes.foldLeft(exprs) { (es, d) =>
      val isRoot = (e: Expression) => e == d
      val paths = scala.collection.mutable.Buffer.empty[Seq[Int]]
      var bare = 0
      es.foreach(collectUses(_, isRoot, paths, () => bare += 1))
      if (bare > 0 || paths.isEmpty) es
      else prunedDecode(d, paths.toSeq) match {
        case Some((newDecode, remap)) =>
          changed = true
          es.map(rewriteChains(_, isRoot, newDecode, remap))
        case None => es
      }
    }
    if (changed) Some(out) else None
  }

  // ---- pass 2: aliased decodes, any consumer shape ------------------------

  private def pruneAliased(plan: LogicalPlan): LogicalPlan = {
    val aliasDefs: Map[ExprId, Alias] = plan.collect {
      case p: Project => p.projectList.collect { case al @ Alias(_: AvroDecode, _) => al }
    }.flatten.map(al => al.exprId -> al).toMap
    if (aliasDefs.isEmpty) return plan

    val paths = scala.collection.mutable.Map.empty[ExprId, scala.collection.mutable.Buffer[Seq[Int]]]
    val bare = scala.collection.mutable.Map.empty[ExprId, Int]
    var hasSubquery = false
    plan.foreach { node =>
      node.expressions.foreach { e =>
        if (e.exists(_.isInstanceOf[PlanExpression[_]])) hasSubquery = true
        aliasDefs.keys.foreach { id =>
          val isRoot = (x: Expression) => x match {
            case ar: AttributeReference => ar.exprId == id
            case _ => false
          }
          // skip the defining Alias itself (its child is the decode, not a ref)
          if (!e.isInstanceOf[Alias] || e.asInstanceOf[Alias].exprId != id)
            collectUses(e, isRoot,
              paths.getOrElseUpdate(id, scala.collection.mutable.Buffer.empty),
              () => bare.update(id, bare.getOrElse(id, 0) + 1))
        }
      }
    }
    if (hasSubquery) return plan // inner-plan references are invisible here

    val rewrites: Map[ExprId, (AvroDecode, Remap)] = aliasDefs.flatMap { case (id, al) =>
      val p = paths.getOrElse(id, scala.collection.mutable.Buffer.empty)
      if (p.nonEmpty && bare.getOrElse(id, 0) == 0)
        prunedDecode(al.child.asInstanceOf[AvroDecode], p.toSeq).map(id -> _)
      else None
    }
    if (rewrites.isEmpty) return plan

    plan.transformUp {
      case node =>
        node.mapExpressions { e =>
          rewrites.foldLeft(e) { case (cur, (id, (newDecode, remap))) =>
            val withAlias = cur match {
              case al @ Alias(_: AvroDecode, _) if al.exprId == id =>
                al.withNewChildren(Seq(newDecode))
              case other => other
            }
            val isRoot = (x: Expression) => x match {
              case ar: AttributeReference => ar.exprId == id
              case _ => false
            }
            val newAttr = (old: Expression) => {
              val ar = old.asInstanceOf[AttributeReference]
              AttributeReference(ar.name, newDecode.dataType, ar.nullable,
                ar.metadata)(ar.exprId, ar.qualifier)
            }
            rewriteChainsWithRoot(withAlias, isRoot, newAttr, remap)
          }
        }
    }
  }

  /** Like [[rewriteChains]] but the new root is derived from the old root
    * expression (the attribute keeps its exprId, its dataType changes). */
  private def rewriteChainsWithRoot(e: Expression, isRoot: Expression => Boolean,
                                    newRoot: Expression => Expression,
                                    remap: Remap): Expression = e match {
    case g: GetStructField if chainPath(g, isRoot).isDefined =>
      val oldRoot = {
        def bottom(x: GetStructField): Expression = x.child match {
          case inner: GetStructField => bottom(inner)
          case r => r
        }
        bottom(g)
      }
      rebuildChain(g, isRoot, newRoot(oldRoot), remap)
    case other => other.mapChildren(rewriteChainsWithRoot(_, isRoot, newRoot, remap))
  }
}
