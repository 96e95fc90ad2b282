package graft.avro

import scala.collection.mutable

/** Reader/writer schema compatibility checker ("can a reader with schema R
  * read data written with schema W?") with typed incompatibility results and
  * memoized recursion so recursive schemas terminate.
  *
  * Semantics mirror the reference checker
  * (reference: python-udf/avro/compatibility.py:57-395): six typed
  * incompatibility kinds, JSON-pointer-ish locations, full-result
  * accumulation (every incompatibility is reported, not just the first),
  * numeric/string promotions on the reader side, enum-default forgiveness
  * for removed symbols, and union branch-by-branch checking.
  */
object Compatibility {

  sealed abstract class Kind(val name: String) { override def toString: String = name }
  case object NameMismatch                  extends Kind("name_mismatch")
  case object FixedSizeMismatch             extends Kind("fixed_size_mismatch")
  case object MissingEnumSymbols            extends Kind("missing_enum_symbols")
  case object ReaderFieldMissingDefaultValue extends Kind("reader_field_missing_default_value")
  case object TypeMismatch                  extends Kind("type_mismatch")
  case object MissingUnionBranch            extends Kind("missing_union_branch")

  final case class Incompatibility(kind: Kind, message: String, location: String)

  final case class Result(incompatibilities: Seq[Incompatibility]) {
    def isCompatible: Boolean = incompatibilities.isEmpty
    def ++(that: Result): Result = Result(incompatibilities ++ that.incompatibilities)
  }
  val Compatible: Result = Result(Nil)

  /** One-shot check. For many checks over a schema registry, instantiate a
    * [[Checker]] and reuse it — the memo table then also caches across
    * pairs (the reference's ReaderWriterCompatibilityChecker pattern,
    * compatibility.py:140-164). */
  def check(reader: AvroSchema, writer: AvroSchema): Result =
    new Checker().check(reader, writer)

  def canRead(writer: AvroSchema, reader: AvroSchema): Boolean =
    check(reader, writer).isCompatible

  final class Checker {
    /** Memo keyed by (reader, writer) object identity; an in-progress entry
      * marks a recursion cycle and reads as compatible (the cycle's result
      * is determined by the rest of the traversal). */
    private val memo = mutable.HashMap.empty[(IdKey, IdKey), Option[Result]]

    private final class IdKey(val s: AvroSchema) {
      override def hashCode: Int = System.identityHashCode(s)
      override def equals(o: Any): Boolean = o match {
        case k: IdKey => k.s eq s
        case _ => false
      }
    }

    def check(reader: AvroSchema, writer: AvroSchema): Result =
      compat(reader, writer, "/", Nil)

    /** Strip forward references and logical wrappers: compatibility is
      * decided on physical types, as in the reference (logical schemas
      * report their physical `type`). */
    private def deref(s: AvroSchema): AvroSchema = s match {
      case r: ARef          => deref(r.target)
      case l: LogicalSchema => deref(l.underlying)
      case other            => other
    }

    private def compat(reader0: AvroSchema, writer0: AvroSchema,
                       token: String, location: List[String]): Result = {
      val reader = deref(reader0)
      val writer = deref(writer0)
      val key = (new IdKey(reader), new IdKey(writer))
      memo.get(key) match {
        case Some(Some(result)) => result
        case Some(None)         => Compatible // recursion in progress: cycle breaks as compatible
        case None =>
          memo(key) = None
          val result = calculate(reader, writer, location :+ token)
          memo(key) = Some(result)
          result
      }
    }

    private def calculate(reader: AvroSchema, writer: AvroSchema,
                          location: List[String]): Result = (reader, writer) match {
      // ---- same-shape pairs -------------------------------------------------
      case _ if reader.typeName == writer.typeName && isPrimitive(reader) => Compatible
      case (AArray(ri), AArray(wi)) => compat(ri, wi, "items", location)
      case (AMap(rv), AMap(wv))     => compat(rv, wv, "values", location)
      case (rf: AFixed, wf: AFixed) =>
        checkNames(rf, wf, location) ++ checkFixedSize(rf, wf, location)
      case (re: AEnum, we: AEnum) =>
        checkNames(re, we, location) ++ checkEnumSymbols(re, we, location)
      case (rr: ARecord, wr: ARecord) =>
        checkNames(rr, wr, location) ++ checkRecordFields(rr, wr, location)
      case (ru: AUnion, wu: AUnion) =>
        // every writer branch must be readable by the reader union; branch
        // checks restart at the root location (reference behavior,
        // compatibility.py:218-229)
        wu.branches.zipWithIndex.foldLeft(Compatible) { case (acc, (wb, i)) =>
          if (compat(ru, wb, "/", Nil).isCompatible) acc
          else acc ++ incompatible(MissingUnionBranch,
            s"reader union lacking writer type: ${wb.typeName.toUpperCase}",
            location :+ i.toString)
        }

      // ---- writer union vs non-union reader: all branches must be readable --
      case (_, wu: AUnion) =>
        wu.branches.foldLeft(Compatible)((acc, wb) => acc ++ compat(reader, wb, "/", Nil))

      // ---- reader union vs non-union writer: some branch must accept --------
      case (ru: AUnion, _) =>
        if (ru.branches.exists(rb => compat(rb, writer, "/", Nil).isCompatible)) Compatible
        else incompatible(MissingUnionBranch,
          s"reader union lacking writer type ${writer.typeName}", location)

      // ---- reader-side promotions (reference: compatibility.py:237-258) -----
      case (ALong, AInt)                      => Compatible
      case (AFloat, AInt | ALong)             => Compatible
      case (ADouble, AInt | ALong | AFloat)   => Compatible
      case (ABytes, AString)                  => Compatible
      case (AString, ABytes)                  => Compatible

      case _ => typeMismatch(reader, writer, location)
    }

    /** Per reader field: find the writer field by name or reader-field alias;
      * absent writer field needs a reader default. The enum-with-enum-default
      * special case recurses against the writer record, matching the
      * reference exactly (compatibility.py:287-314). */
    private def checkRecordFields(rr: ARecord, wr: ARecord, location: List[String]): Result =
      rr.fields.zipWithIndex.foldLeft(Compatible) { case (acc, (rf, i)) =>
        lookupWriterField(wr, rf) match {
          case None =>
            if (rf.default.isDefined) acc
            else deref(rf.schema) match {
              case e: AEnum if e.enumDefault.isDefined =>
                acc ++ compat(rf.schema, wr, "type", location ++ List("fields", i.toString))
              case _ =>
                acc ++ incompatible(ReaderFieldMissingDefaultValue, rf.name,
                  location ++ List("fields", i.toString))
            }
          case Some(wf) =>
            acc ++ compat(rf.schema, wf.schema, "type", location ++ List("fields", i.toString))
        }
      }

    private def lookupWriterField(wr: ARecord, rf: AField): Option[AField] =
      wr.fields.find(_.name == rf.name)
        .orElse(rf.aliases.iterator.flatMap(a => wr.fields.find(_.name == a)).nextOption())

    private def checkNames(reader: NamedSchema, writer: NamedSchema,
                           location: List[String]): Result =
      if (schemaNameEquals(reader, writer)) Compatible
      else incompatible(NameMismatch, s"expected: ${writer.fullName}", location :+ "name")

    /** Simple-name equality or reader alias naming the writer's fullname
      * (reference: compatibility.py:381-383). */
    private def schemaNameEquals(reader: NamedSchema, writer: NamedSchema): Boolean =
      reader.name == writer.name || reader.aliases.contains(writer.fullName)

    private def checkFixedSize(rf: AFixed, wf: AFixed, location: List[String]): Result =
      if (rf.size == wf.size) Compatible
      else incompatible(FixedSizeMismatch,
        s"expected: ${wf.size}, found: ${rf.size}", location :+ "size")

    /** Writer symbols missing from the reader are an error unless the reader
      * declares a valid enum default to absorb them. */
    private def checkEnumSymbols(re: AEnum, we: AEnum, location: List[String]): Result = {
      val extra = we.symbols.filterNot(re.symbols.contains)
      if (extra.isEmpty) Compatible
      else re.enumDefault match {
        case Some(d) if re.symbols.contains(d) => Compatible
        case _ => incompatible(MissingEnumSymbols,
          extra.mkString("{", ", ", "}"), location :+ "symbols")
      }
    }

    private def isPrimitive(s: AvroSchema): Boolean = s match {
      case ANull | ABoolean | AInt | ALong | AFloat | ADouble | ABytes | AString => true
      case _ => false
    }

    private def typeMismatch(reader: AvroSchema, writer: AvroSchema,
                             location: List[String]): Result =
      incompatible(TypeMismatch,
        s"reader type: ${reader.typeName} not compatible with writer type: ${writer.typeName}",
        location)

    /** Location rendering matches the reference: tokens joined with '/', and
      * the doubled root slash collapsed (compatibility.py:367-374). */
    private def incompatible(kind: Kind, message: String, location: List[String]): Result = {
      val joined = location.mkString("/")
      val loc = if (location.length > 1) joined.drop(1) else joined
      Result(Seq(Incompatibility(kind, message, loc)))
    }
  }
}
