package graft.avro

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Avro schema AST.
  *
  * Mirrors the schema algebra of the reference's vendored Avro library
  * (reference: python-udf/avro/schema.py:172-1191) re-expressed as a Scala ADT.
  * Logical types wrap their physical type; invalid logical parameters degrade
  * to the physical type with a warning, never an error
  * (reference: python-udf/avro/schema.py:1213-1246).
  */
sealed trait AvroSchema {
  def typeName: String

  /** Physical type for wire purposes (logical types delegate). */
  def physical: AvroSchema = this

  /** Parsing Canonical Form (Avro spec) — used for fingerprints/equality.
    * (reference: python-udf/avro/schema.py:224-235)
    */
  def canonical: String = AvroSchemaParser.toCanonical(this)

  def fingerprint: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

case object ANull    extends AvroSchema { val typeName = "null" }
case object ABoolean extends AvroSchema { val typeName = "boolean" }
case object AInt     extends AvroSchema { val typeName = "int" }
case object ALong    extends AvroSchema { val typeName = "long" }
case object AFloat   extends AvroSchema { val typeName = "float" }
case object ADouble  extends AvroSchema { val typeName = "double" }
case object ABytes   extends AvroSchema { val typeName = "bytes" }
case object AString  extends AvroSchema { val typeName = "string" }

sealed trait NamedSchema extends AvroSchema {
  def name: String
  def namespace: Option[String]
  def fullName: String = namespace.filter(_.nonEmpty).map(ns => s"$ns.$name").getOrElse(name)
  def aliases: Seq[String]
}

final case class AFixed(name: String, namespace: Option[String], size: Int,
                        aliases: Seq[String] = Nil) extends NamedSchema {
  val typeName = "fixed"
}

final case class AEnum(name: String, namespace: Option[String], symbols: Seq[String],
                       enumDefault: Option[String] = None,
                       aliases: Seq[String] = Nil) extends NamedSchema {
  val typeName = "enum"
  private val index = symbols.zipWithIndex.toMap
  def indexOf(symbol: String): Int = index.getOrElse(symbol, -1)
}

final case class AField(name: String, schema: AvroSchema,
                        default: Option[JsonNode] = None,
                        order: Option[String] = None,
                        aliases: Seq[String] = Nil)

final case class ARecord(name: String, namespace: Option[String], fields: Seq[AField],
                         aliases: Seq[String] = Nil) extends NamedSchema {
  val typeName = "record"
}

final case class AArray(items: AvroSchema) extends AvroSchema { val typeName = "array" }
final case class AMap(values: AvroSchema) extends AvroSchema { val typeName = "map" }

final case class AUnion(branches: Seq[AvroSchema]) extends AvroSchema {
  val typeName = "union"
  /** index of first branch matching the given type name (fullname for named types) */
  def indexOfTypeName(tn: String): Int = branches.indexWhere {
    case n: NamedSchema => n.fullName == tn || n.typeName == tn
    case b              => b.typeName == tn
  }
  def isNullable: Boolean = branches.contains(ANull)
  def nonNullBranches: Seq[AvroSchema] = branches.filterNot(_ == ANull)
}

/** A named-type forward reference resolved during parse; after parse all refs
  * are replaced by the actual schema, so decode never sees this. */
final case class ARef(fullName: String, resolved: () => AvroSchema) extends AvroSchema {
  val typeName = "ref"
  lazy val target: AvroSchema = resolved()
  override def physical: AvroSchema = target.physical
}

// ---- logical types ------------------------------------------------------
sealed trait LogicalSchema extends AvroSchema { def underlying: AvroSchema
  override def physical: AvroSchema = underlying }

final case class ADecimal(precision: Int, scale: Int, underlying: AvroSchema)
    extends LogicalSchema { val typeName = "decimal" }
final case class ADate(underlying: AvroSchema = AInt) extends LogicalSchema { val typeName = "date" }
final case class ATimeMillis(underlying: AvroSchema = AInt) extends LogicalSchema { val typeName = "time-millis" }
final case class ATimeMicros(underlying: AvroSchema = ALong) extends LogicalSchema { val typeName = "time-micros" }
final case class ATimestampMillis(underlying: AvroSchema = ALong) extends LogicalSchema { val typeName = "timestamp-millis" }
final case class ATimestampMicros(underlying: AvroSchema = ALong) extends LogicalSchema { val typeName = "timestamp-micros" }
final case class AUuid(underlying: AvroSchema = AString) extends LogicalSchema { val typeName = "uuid" }

final class AvroSchemaParseException(msg: String) extends RuntimeException(msg)

/** Name-matching rules shared by decode-time resolution and the
  * compatibility checker.
  * (reference: python-udf/avro/name.py:50-200 for fullname rules;
  * python-udf/avro/compatibility.py:376-395 for alias lookup.) */
object AvroNames {
  /** An unqualified alias lives in the namespace of the schema that declares
    * it (Avro spec "Aliases"). */
  def qualify(alias: String, ns: Option[String]): String =
    if (alias.contains('.')) alias
    else ns.filter(_.nonEmpty).map(n => s"$n.$alias").getOrElse(alias)

  /** Decode-time named-type match: fullname equality, or one of the READER's
    * aliases names the writer type. No bare simple-name fallback — schemas
    * differing only by namespace must not silently resolve. */
  def nameMatches(writer: NamedSchema, reader: NamedSchema): Boolean =
    writer.fullName == reader.fullName ||
      reader.aliases.exists(a => qualify(a, reader.namespace) == writer.fullName)

  /** Writer-field-index → reader-field-index assignment honoring reader-field
    * aliases (a renamed reader field declares its old writer name as an
    * alias). Direct name matches claim slots first; alias matches only fill
    * slots no direct match claimed. A slot claimed twice (two writer fields
    * resolving to one reader field via aliases, or a duplicated alias) is an
    * ambiguity and throws — silently letting the last-decoded writer field
    * win would corrupt data. Returns -1 for writer fields no reader field
    * consumes (skipped, not materialized). */
  def assignReaderSlots(writer: ARecord, reader: ARecord): Array[Int] = {
    val direct = reader.fields.zipWithIndex.map { case (f, i) => f.name -> i }.toMap
    val byAlias: Map[String, Seq[Int]] = reader.fields.zipWithIndex
      .flatMap { case (f, i) => f.aliases.map(_ -> i) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap

    val slots = Array.fill(writer.fields.length)(-1)
    // -1 = free; otherwise writer-field index that claimed the slot
    val claimedBy = Array.fill(reader.fields.length)(-1)

    // pass 1: direct name matches always win their slot
    writer.fields.zipWithIndex.foreach { case (wf, wi) =>
      direct.get(wf.name).foreach { slot => slots(wi) = slot; claimedBy(slot) = wi }
    }
    // pass 2: alias matches fill remaining slots only. A slot already taken
    // by a DIRECT match just shadows the alias (the writer field is skipped);
    // two writer fields alias-matching one reader slot is a genuine
    // ambiguity and throws — last-write-wins would corrupt data.
    writer.fields.zipWithIndex.foreach { case (wf, wi) =>
      if (slots(wi) < 0) byAlias.get(wf.name).foreach { candidates =>
        val free = candidates.filter(claimedBy(_) < 0)
        free match {
          case Seq() =>
            val aliasClash = candidates.find(s => claimedBy(s) >= 0 &&
              writer.fields(claimedBy(s)).name != reader.fields(s).name)
            aliasClash.foreach { s =>
              throw new AvroResolutionException(
                s"ambiguous resolution for reader field '${reader.fields(s).name}' of " +
                  s"${reader.fullName}: writer fields '${writer.fields(claimedBy(s)).name}' " +
                  s"and '${wf.name}' both resolve to it via aliases")
            } // else: slot held by a direct match — alias is shadowed, field skipped
          case Seq(slot) => slots(wi) = slot; claimedBy(slot) = wi
          case several =>
            throw new AvroResolutionException(
              s"ambiguous resolution for writer field '${wf.name}' of ${writer.fullName}: " +
                s"reader fields " + several.map(reader.fields(_).name).mkString("(", ", ", ")") +
                " all declare it as an alias")
        }
      }
    }
    slots
  }
}

/** `.avsc` JSON → [[AvroSchema]] parser with name/namespace resolution.
  *
  * (reference: python-udf/avro/schema.py:1249-1394 `make_avsc_object`/`parse`,
  * python-udf/avro/name.py:50-200 for name rules.)
  */
object AvroSchemaParser {
  private val mapper = new ObjectMapper()

  private val PrimitiveNames: Map[String, AvroSchema] = Map(
    "null" -> ANull, "boolean" -> ABoolean, "int" -> AInt, "long" -> ALong,
    "float" -> AFloat, "double" -> ADouble, "bytes" -> ABytes, "string" -> AString)

  private val NameRegex = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Primitive type names are reserved — a named type may not shadow them
    * (reference: python-udf/avro/name.py:186-189). */
  private def checkReserved(fullName: String): Unit =
    if (PrimitiveNames.contains(fullName))
      throw new AvroSchemaParseException(s"$fullName is a reserved type name")

  def parse(json: String): AvroSchema = {
    val node = try mapper.readTree(json) catch {
      case e: Exception => throw new AvroSchemaParseException(s"invalid schema JSON: ${e.getMessage}")
    }
    build(node, None, new mutable.HashMap[String, AvroSchema])
  }

  private def validName(n: String): Boolean = NameRegex.matches(n)

  /** Resolve (name, namespace-attr, enclosing-namespace) → (simpleName, namespace). */
  private def resolveName(name: String, nsAttr: Option[String], enclosing: Option[String]):
      (String, Option[String]) = {
    if (name.contains('.')) {
      val i = name.lastIndexOf('.')
      val (ns, simple) = (name.substring(0, i), name.substring(i + 1))
      if (!validName(simple)) throw new AvroSchemaParseException(s"invalid name: $simple")
      (simple, Some(ns))
    } else {
      if (!validName(name)) throw new AvroSchemaParseException(s"invalid name: $name")
      (name, nsAttr.orElse(enclosing).filter(_.nonEmpty))
    }
  }

  private def fullName(simple: String, ns: Option[String]): String =
    ns.filter(_.nonEmpty).map(n => s"$n.$simple").getOrElse(simple)

  private def build(node: JsonNode, enclosingNs: Option[String],
                    names: mutable.HashMap[String, AvroSchema]): AvroSchema = node match {
    case t: TextNode =>
      val tn = t.asText()
      PrimitiveNames.getOrElse(tn, {
        // named-type reference; try fullname then enclosing-namespace-qualified
        val candidates = Seq(tn) ++ enclosingNs.map(ns => s"$ns.$tn")
        candidates.flatMap(names.get).headOption.getOrElse {
          // forward reference: lazily resolved (recursive schemas)
          val key = candidates.find(_.contains('.')).getOrElse(tn)
          ARef(key, () => names.getOrElse(key,
            names.getOrElse(tn,
              throw new AvroSchemaParseException(s"undefined named type: $tn"))))
        }
      })
    case a: ArrayNode => AUnion(a.elements().asScala.map(build(_, enclosingNs, names)).toSeq)
    case o: ObjectNode =>
      val tNode = o.get("type")
      if (tNode == null) throw new AvroSchemaParseException(s"missing 'type' in $o")
      val logical = Option(o.get("logicalType")).map(_.asText())
      val base: AvroSchema = tNode match {
        case tt: TextNode => tt.asText() match {
          case "record" | "error" => buildRecord(o, enclosingNs, names)
          case "enum"             => buildEnum(o, enclosingNs, names)
          case "fixed"            => buildFixed(o, enclosingNs, names)
          case "array" =>
            AArray(build(Option(o.get("items")).getOrElse(
              throw new AvroSchemaParseException("array missing items")), enclosingNs, names))
          case "map" =>
            AMap(build(Option(o.get("values")).getOrElse(
              throw new AvroSchemaParseException("map missing values")), enclosingNs, names))
          case prim if PrimitiveNames.contains(prim) => PrimitiveNames(prim)
          case other =>
            // {"type": "SomeNamed"} form
            build(new TextNode(other), enclosingNs, names)
        }
        case _ => build(tNode, enclosingNs, names) // nested schema object/array as type
      }
      logical.map(applyLogical(_, base, o)).getOrElse(base)
    case other => throw new AvroSchemaParseException(s"cannot parse schema from: $other")
  }

  /** Warn-and-fallback on invalid logical params
    * (reference: python-udf/avro/schema.py:1213-1246). */
  private def applyLogical(lt: String, base: AvroSchema, o: ObjectNode): AvroSchema = {
    def warn(msg: String): AvroSchema = { // fall back to physical type
      System.err.println(s"[graft-avro] ignoring invalid logical type '$lt': $msg"); base
    }
    (lt, base) match {
      case ("decimal", ABytes) | ("decimal", _: AFixed) =>
        val prec = Option(o.get("precision")).map(_.asInt(-1)).getOrElse(-1)
        val scale = Option(o.get("scale")).map(_.asInt(0)).getOrElse(0)
        val maxPrec = base match {
          case AFixed(_, _, size, _) => math.floor(math.log10(2) * (8L * size - 1)).toInt
          case _ => Int.MaxValue
        }
        if (prec <= 0) warn(s"invalid precision $prec")
        else if (scale < 0 || scale > prec) warn(s"invalid scale $scale for precision $prec")
        else if (prec > maxPrec) warn(s"precision $prec exceeds fixed capacity $maxPrec")
        else ADecimal(prec, scale, base)
      case ("date", AInt)              => ADate(base)
      case ("time-millis", AInt)       => ATimeMillis(base)
      case ("time-micros", ALong)      => ATimeMicros(base)
      case ("timestamp-millis", ALong) => ATimestampMillis(base)
      case ("timestamp-micros", ALong) => ATimestampMicros(base)
      case ("uuid", AString)           => AUuid(base)
      case _ => warn(s"not applicable to physical type ${base.typeName}")
    }
  }

  private def buildRecord(o: ObjectNode, enclosingNs: Option[String],
                          names: mutable.HashMap[String, AvroSchema]): ARecord = {
    val rawName = reqText(o, "name")
    val nsAttr = Option(o.get("namespace")).map(_.asText())
    val (simple, ns) = resolveName(rawName, nsAttr, enclosingNs)
    val fn = fullName(simple, ns)
    checkReserved(fn)
    if (names.contains(fn)) throw new AvroSchemaParseException(s"redefined named type: $fn")
    val fieldsNode = Option(o.get("fields")).collect { case a: ArrayNode => a }
      .getOrElse(throw new AvroSchemaParseException(s"record $fn missing fields"))
    // register a placeholder for recursive references before building fields
    var rec: ARecord = null
    names(fn) = ARef(fn, () => rec)
    val fields = fieldsNode.elements().asScala.map { fo =>
      val fname = reqText(fo.asInstanceOf[ObjectNode], "name")
      val fschema = build(Option(fo.get("type")).getOrElse(
        throw new AvroSchemaParseException(s"field $fname missing type")), ns, names)
      AField(fname, fschema,
        default = Option(fo.get("default")),
        order = Option(fo.get("order")).map(_.asText()),
        aliases = textArray(fo, "aliases"))
    }.toSeq
    rec = ARecord(simple, ns, fields, aliases = textArray(o, "aliases"))
    names(fn) = rec
    rec
  }

  private def buildEnum(o: ObjectNode, enclosingNs: Option[String],
                        names: mutable.HashMap[String, AvroSchema]): AEnum = {
    val (simple, ns) = resolveName(reqText(o, "name"),
      Option(o.get("namespace")).map(_.asText()), enclosingNs)
    val symbols = textArray(o, "symbols")
    if (symbols.isEmpty) throw new AvroSchemaParseException(s"enum $simple has no symbols")
    if (symbols.distinct.size != symbols.size)
      throw new AvroSchemaParseException(s"enum $simple has duplicate symbols")
    val e = AEnum(simple, ns, symbols, Option(o.get("default")).map(_.asText()),
      aliases = textArray(o, "aliases"))
    val fn = e.fullName
    checkReserved(fn)
    if (names.contains(fn)) throw new AvroSchemaParseException(s"redefined named type: $fn")
    names(fn) = e
    e
  }

  private def buildFixed(o: ObjectNode, enclosingNs: Option[String],
                         names: mutable.HashMap[String, AvroSchema]): AFixed = {
    val (simple, ns) = resolveName(reqText(o, "name"),
      Option(o.get("namespace")).map(_.asText()), enclosingNs)
    val size = Option(o.get("size")).map(_.asInt(-1)).getOrElse(-1)
    if (size < 0) throw new AvroSchemaParseException(s"fixed $simple invalid size")
    val f = AFixed(simple, ns, size, aliases = textArray(o, "aliases"))
    val fn = f.fullName
    checkReserved(fn)
    if (names.contains(fn)) throw new AvroSchemaParseException(s"redefined named type: $fn")
    names(fn) = f
    f
  }

  private def reqText(o: JsonNode, field: String): String =
    Option(o.get(field)).map(_.asText()).getOrElse(
      throw new AvroSchemaParseException(s"missing '$field' in $o"))

  private def textArray(o: JsonNode, field: String): Seq[String] = Option(o.get(field)) match {
    case Some(a: ArrayNode) => a.elements().asScala.map(_.asText()).toSeq
    case _ => Nil
  }

  // ---- canonical form ----------------------------------------------------
  /** Parsing Canonical Form per the Avro spec: strip docs/aliases/defaults,
    * fullnames, fixed field order name,type,fields|symbols|items|values|size.
    * (reference: python-udf/avro/schema.py:85-93,161-169,224-235) */
  def toCanonical(s: AvroSchema, seen: Set[String] = Set.empty): String = s match {
    case p @ (ANull | ABoolean | AInt | ALong | AFloat | ADouble | ABytes | AString) =>
      "\"" + p.typeName + "\""
    case l: LogicalSchema => toCanonical(l.physical, seen)
    case r: ARef => if (seen.contains(r.fullName)) "\"" + r.fullName + "\""
                    else toCanonical(r.target, seen)
    case AUnion(bs) => bs.map(toCanonical(_, seen)).mkString("[", ",", "]")
    case AArray(items) => s"""{"type":"array","items":${toCanonical(items, seen)}}"""
    case AMap(values) => s"""{"type":"map","values":${toCanonical(values, seen)}}"""
    case f: AFixed =>
      if (seen.contains(f.fullName)) "\"" + f.fullName + "\""
      else s"""{"name":"${f.fullName}","type":"fixed","size":${f.size}}"""
    case e: AEnum =>
      if (seen.contains(e.fullName)) "\"" + e.fullName + "\""
      else s"""{"name":"${e.fullName}","type":"enum","symbols":[${e.symbols.map("\"" + _ + "\"").mkString(",")}]}"""
    case r: ARecord =>
      if (seen.contains(r.fullName)) "\"" + r.fullName + "\""
      else {
        val seen2 = seen + r.fullName
        val fs = r.fields.map(f =>
          s"""{"name":"${f.name}","type":${toCanonical(f.schema, seen2)}}""").mkString(",")
        s"""{"name":"${r.fullName}","type":"record","fields":[$fs]}"""
      }
  }

  // ---- schema → avsc JSON (round-trip; used by OCF writer metadata) ------
  def toJson(s: AvroSchema): String = {
    val sb = new StringBuilder
    writeJson(s, sb, Set.empty, None)
    sb.toString
  }

  /** Declaration-site name attributes: when a named type's namespace matches
    * the enclosing one it inherits (fullname form for roots), otherwise an
    * explicit "namespace" attribute is written — "" encodes the NULL
    * namespace per the spec, so a null-namespaced type nested inside a
    * namespaced record survives the round-trip. */
  private def nameAttrs(n: NamedSchema, enclosing: Option[String]): String = {
    val name =
      if (n.namespace == enclosing || (enclosing.isEmpty && n.namespace.nonEmpty))
        s""""name":"${n.fullName}""""
      else s""""name":"${n.name}","namespace":"${n.namespace.getOrElse("")}""""
    name + aliasAttr(n.aliases)
  }

  /** Evolution metadata must survive serialization: a schema stored or
    * transported via toJson that silently dropped aliases/defaults would
    * change resolution and compatibility results downstream. */
  private def aliasAttr(aliases: Seq[String]): String =
    if (aliases.isEmpty) ""
    else aliases.map("\"" + _ + "\"").mkString(""","aliases":[""", ",", "]")

  private def writeJson(s: AvroSchema, sb: StringBuilder, seen: Set[String],
                        enclosing: Option[String]): Unit = s match {
    case p @ (ANull | ABoolean | AInt | ALong | AFloat | ADouble | ABytes | AString) =>
      sb.append('"').append(p.typeName).append('"')
    case ADecimal(p, sc, u) =>
      u match {
        case f: AFixed =>
          sb.append(s"""{"type":"fixed",${nameAttrs(f, enclosing)},"size":${f.size},"logicalType":"decimal","precision":$p,"scale":$sc}""")
        case _ =>
          sb.append(s"""{"type":"bytes","logicalType":"decimal","precision":$p,"scale":$sc}""")
      }
    case l: LogicalSchema =>
      sb.append(s"""{"type":"${l.physical.typeName}","logicalType":"${l.typeName}"}""")
    case r: ARef => writeJson(r.target, sb, seen, enclosing)
    case AUnion(bs) =>
      sb.append('[')
      bs.zipWithIndex.foreach { case (b, i) =>
        if (i > 0) sb.append(','); writeJson(b, sb, seen, enclosing) }
      sb.append(']')
    case AArray(items) =>
      sb.append("""{"type":"array","items":"""); writeJson(items, sb, seen, enclosing); sb.append('}')
    case AMap(values) =>
      sb.append("""{"type":"map","values":"""); writeJson(values, sb, seen, enclosing); sb.append('}')
    case f: AFixed =>
      if (seen.contains(f.fullName)) sb.append('"').append(f.fullName).append('"')
      else sb.append(s"""{"type":"fixed",${nameAttrs(f, enclosing)},"size":${f.size}}""")
    case e: AEnum =>
      if (seen.contains(e.fullName)) sb.append('"').append(e.fullName).append('"')
      else {
        val dflt = e.enumDefault.map(d => s""","default":"$d"""").getOrElse("")
        sb.append(s"""{"type":"enum",${nameAttrs(e, enclosing)},"symbols":[${e.symbols.map("\"" + _ + "\"").mkString(",")}]$dflt}""")
      }
    case r: ARecord =>
      if (seen.contains(r.fullName)) sb.append('"').append(r.fullName).append('"')
      else {
        val seen2 = seen + r.fullName
        sb.append(s"""{"type":"record",${nameAttrs(r, enclosing)},"fields":[""")
        r.fields.zipWithIndex.foreach { case (f, i) =>
          if (i > 0) sb.append(',')
          sb.append(s"""{"name":"${f.name}","type":""")
          writeJson(f.schema, sb, seen2, r.namespace)
          f.default.foreach(d => sb.append(s""","default":${d.toString}"""))
          f.order.foreach(o => sb.append(s""","order":"$o""""))
          sb.append(aliasAttr(f.aliases))
          sb.append('}')
        }
        sb.append("]}")
      }
  }
}
