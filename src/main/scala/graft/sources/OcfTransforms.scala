package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hidden partition transforms for `graft-ocf` tables (the Iceberg
  * `years`/`months`/`days`/`hours`/`truncate` partition-spec family):
  * `PARTITIONED BY (days(ts))` routes every row into a synthetic
  * `_p_days_ts=2024-03-01/` directory level computed FROM the row's `ts` —
  * the source column itself stays an ordinary DATA column inside the files
  * (exactly the bucket-transform convention, [[OcfBucket]]).
  *
  * Why this matters at 100 TB: time-range queries are the dominant scan
  * shape over landed event data, but identity-partitioning a timestamp is
  * impossible (a directory per microsecond). The transform folds the
  * column to a coarse, boundable ordinal — and because every transform
  * here is MONOTONE in its source ordering, a predicate on the RAW column
  * (`WHERE ts >= X AND ts < Y`) prunes directories exactly:
  * `t(x) ∈ [t(X), t(Y)]` is implied by `x ∈ [X, Y]`. That is "hidden
  * partitioning": users query the data column; the layout serves the prune;
  * no one has to remember a derived `ts_day` column exists.
  *
  * Ordinal domains (UTC, the Iceberg convention — layout must not depend
  * on a session timezone):
  *  - `years(c)`   → Long year-1970          rendered `yyyy`
  *  - `months(c)`  → Long 12*(y-1970)+(m-1)  rendered `yyyy-MM`
  *  - `days(c)`    → Long epoch days         rendered `yyyy-MM-dd`
  *  - `hours(c)`   → Long epoch hours        rendered `yyyy-MM-dd-HH`
  *  - `truncate(w,c)` → Long floor(v/w)*w for integrals; String first-w-chars
  *    for strings — rendered as the truncated value itself. */
private[graft] object OcfTransforms {

  val Kinds: Set[String] = Set("years", "months", "days", "hours", "truncate")

  /** One declared transform: kind, source DATA column, truncate width. The
    * synthetic directory level is `_p_<kind>_<col>` (`_p_truncate_<w>_<col>`
    * for truncate — the width is layout, so it must be readable back). */
  final case class Spec(kind: String, col: String, width: Int = 0) {
    def dirCol: String =
      if (kind == "truncate") s"_p_truncate_${width}_$col" else s"_p_${kind}_$col"
    def render: String =
      if (kind == "truncate") s"truncate($width,$col)" else s"$kind($col)"
  }

  /** Inverse of [[Spec.dirCol]]: reconstruct the transform a synthetic
    * `_p_*` directory level encodes — the levels are SELF-DESCRIBING, which
    * is what makes partition-spec evolution (X100) work without spec
    * history: the scan prunes each file through whatever transform levels
    * its own path carries, current spec or a former one. Returns None for
    * names that don't parse (admitted conservatively by callers). */
  def specOfDirCol(name: String): Option[Spec] = {
    if (!name.startsWith("_p_")) return None
    val rest = name.drop(3)
    if (rest.startsWith("truncate_")) {
      val r2 = rest.drop("truncate_".length)
      val us = r2.indexOf('_')
      if (us <= 0 || us == r2.length - 1) None
      else r2.take(us).toIntOption.filter(_ > 0)
        .map(w => Spec("truncate", r2.drop(us + 1), w))
    } else {
      val us = rest.indexOf('_')
      if (us <= 0 || us == rest.length - 1) None
      else {
        val kind = rest.take(us)
        if (Kinds(kind) && kind != "truncate") Some(Spec(kind, rest.drop(us + 1)))
        else None
      }
    }
  }

  /** Parse the `transformPartitions` option: `days(ts),truncate(4,name)`.
    * Entries are whole `kind(args)` groups — the split respects parens
    * (a truncate's width/column comma is not a list separator). */
  def parseList(s: String): Seq[Spec] = {
    val entry = """\w+\([^)]*\)""".r
    val entries = entry.findAllIn(s).toSeq
    require(entries.mkString(",").replaceAll("\\s", "") == s.replaceAll("\\s", ""),
      s"graft-ocf: malformed transformPartitions '$s'")
    entries.map { one =>
      val m = """(\w+)\(([^)]*)\)""".r
      one match {
        case m("truncate", args) =>
          val parts = args.split(",").map(_.trim)
          require(parts.length == 2 && parts(0).toIntOption.isDefined,
            s"graft-ocf: bad truncate transform '$one' (want truncate(width,col))")
          val w = parts(0).toInt
          require(w > 0, s"graft-ocf: truncate width must be positive in '$one'")
          Spec("truncate", parts(1), w)
        case m(kind, col) if Kinds(kind) && kind != "truncate" =>
          require(!col.contains(","),
            s"graft-ocf: transform '$one' takes exactly one column")
          Spec(kind, col.trim)
        case _ => throw new IllegalArgumentException(
          s"graft-ocf: unsupported partition transform '$one' " +
            s"(supported: ${Kinds.toSeq.sorted.mkString(", ")})")
      }
    }
  }

  /** Source types a spec accepts. */
  def supportedType(kind: String, dt: DataType): Boolean = (kind, dt) match {
    case ("years" | "months" | "days", TimestampType | DateType) => true
    case ("hours", TimestampType) => true
    case ("truncate", ByteType | ShortType | IntegerType | LongType | StringType) => true
    case _ => false
  }

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  private def localDateOf(v: Any, dt: DataType): java.time.LocalDate = dt match {
    case DateType => java.time.LocalDate.ofEpochDay(toDays(v))
    case TimestampType =>
      java.time.LocalDate.ofEpochDay(Math.floorDiv(toMicros(v), MicrosPerDay))
    case other => throw new IllegalArgumentException(
      s"graft-ocf transform: no calendar for ${other.simpleString}")
  }

  /** Catalyst-internal or external (pushed-filter literal) value → micros. */
  private def toMicros(v: Any): Long = v match {
    case l: java.lang.Long => l
    case t: java.sql.Timestamp =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case i: java.time.Instant =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
    case other => throw new IllegalArgumentException(
      s"graft-ocf transform: cannot read ${other.getClass.getName} as a timestamp")
  }

  private def toDays(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l
    case d: java.sql.Date =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong
    case d: java.time.LocalDate => d.toEpochDay
    case other => throw new IllegalArgumentException(
      s"graft-ocf transform: cannot read ${other.getClass.getName} as a date")
  }

  private def toLong(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue
    case other => throw new IllegalArgumentException(
      s"graft-ocf transform: cannot read ${other.getClass.getName} as integral")
  }

  private def toStr(v: Any): String = v match {
    case u: UTF8String => u.toString
    case s: String => s
    case other => throw new IllegalArgumentException(
      s"graft-ocf transform: cannot read ${other.getClass.getName} as string")
  }

  /** The transform ordinal of one NON-NULL value (internal or external
    * form): Long for the calendar kinds and integral truncate, String for
    * string truncate. Monotone in the source ordering by construction. */
  def ordinalOf(spec: Spec, v: Any, dt: DataType): Any = spec.kind match {
    case "days" => dt match {
      case DateType => toDays(v)
      case _ => Math.floorDiv(toMicros(v), MicrosPerDay)
    }
    case "hours" => Math.floorDiv(toMicros(v), MicrosPerHour)
    case "months" =>
      val ld = localDateOf(v, dt)
      12L * (ld.getYear - 1970L) + (ld.getMonthValue - 1)
    case "years" => localDateOf(v, dt).getYear - 1970L
    case "truncate" => dt match {
      case StringType =>
        // truncate by CODE POINTS, not UTF-16 chars: cutting inside a
        // surrogate pair leaves a lone surrogate that UTF-8-encodes as
        // '?', breaking the prefix property the directory-pruning proof
        // relies on (cmp is UTF-8 byte order — the ordinal must stay a
        // true prefix to stay monotone). Iceberg truncates the same way.
        val s = toStr(v)
        if (s.codePointCount(0, s.length) <= spec.width) s
        else s.substring(0, s.offsetByCodePoints(0, spec.width))
      case _ =>
        val x = toLong(v)
        x - Math.floorMod(x, spec.width.toLong)
    }
  }

  private val HourFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd-HH").withZone(java.time.ZoneOffset.UTC)

  /** Directory rendering of an ordinal (unescaped; callers escape). */
  def renderOrdinal(spec: Spec, ord: Any): String = spec.kind match {
    case "days" => java.time.LocalDate.ofEpochDay(ord.asInstanceOf[Long]).toString
    case "hours" => HourFmt.format(
      java.time.Instant.ofEpochSecond(ord.asInstanceOf[Long] * 3600L))
    case "months" =>
      val m = ord.asInstanceOf[Long]
      f"${1970 + Math.floorDiv(m, 12L)}%04d-${Math.floorMod(m, 12L) + 1}%02d"
    case "years" => f"${1970 + ord.asInstanceOf[Long]}%04d"
    case "truncate" => ord match {
      case l: java.lang.Long => l.toString
      case s: String => s
    }
  }

  /** Inverse of [[renderOrdinal]] (directory value → ordinal), for pruning.
    * `stringTruncate` tells the parse which truncate domain applies. */
  def parseOrdinal(spec: Spec, dirValue: String, stringTruncate: Boolean): Any =
    spec.kind match {
      case "days" => java.time.LocalDate.parse(dirValue).toEpochDay
      case "hours" =>
        java.time.LocalDateTime.parse(dirValue, java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd-HH")).toEpochSecond(java.time.ZoneOffset.UTC) / 3600L
      case "months" =>
        val Array(y, m) = dirValue.split("-").map(_.toInt)
        12L * (y - 1970L) + (m - 1)
      case "years" => dirValue.toLong - 1970L
      case "truncate" => if (stringTruncate) dirValue else dirValue.toLong
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) =>
      // UTF-8 byte order — the ordering Spark's string comparisons use
      val ab = x.getBytes("UTF-8"); val bb = y.getBytes("UTF-8")
      val n = math.min(ab.length, bb.length)
      var i = 0
      while (i < n) {
        val d = (ab(i) & 0xff) - (bb(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      ab.length - bb.length
    case _ => throw new IllegalArgumentException(
      s"graft-ocf transform: incomparable ordinals $a / $b")
  }

  /** Whether `v` is the FIRST source value of its ordinal — the boundary
    * case where a strict `x < v` excludes ordinal t(v) entirely (Iceberg's
    * strict-projection tightening): `ts < '2024-03-06 00:00'` must not
    * scan the 03-06 directory. */
  private def atOrdinalStart(spec: Spec, v: Any, dt: DataType): Boolean =
    spec.kind match {
      case "days" => dt match {
        case DateType => true // a date IS a whole day
        case _ => Math.floorMod(toMicros(v), MicrosPerDay) == 0L
      }
      case "hours" => Math.floorMod(toMicros(v), MicrosPerHour) == 0L
      case "months" => dt match {
        case DateType => localDateOf(v, dt).getDayOfMonth == 1
        case _ => localDateOf(v, dt).getDayOfMonth == 1 &&
          Math.floorMod(toMicros(v), MicrosPerDay) == 0L
      }
      case "years" => dt match {
        case DateType => localDateOf(v, dt).getDayOfYear == 1
        case _ => localDateOf(v, dt).getDayOfYear == 1 &&
          Math.floorMod(toMicros(v), MicrosPerDay) == 0L
      }
      case "truncate" => dt match {
        case StringType =>
          val s = toStr(v)
          s.codePointCount(0, s.length) <= spec.width
        case _ => Math.floorMod(toLong(v), spec.width.toLong) == 0L
      }
    }

  /** Whether a file whose directory carries `fileOrd` (null = the NULL
    * directory) can hold rows matching `filters` on the SOURCE column —
    * hidden-partition pruning. Sound because every transform is monotone:
    * `v {=,<,>} bound` implies `t(v) {=,<=,>=} t(bound)`; strict upper
    * bounds additionally exclude t(v) itself when v sits exactly on a
    * transform boundary. Conservative on every shape it doesn't
    * understand. */
  def mayMatch(spec: Spec, dt: DataType, fileOrd: Any,
               filters: Seq[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f => admits(spec, dt, fileOrd, f))

  private def admits(spec: Spec, dt: DataType, fileOrd: Any,
                     f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    def ord(v: Any): Option[Any] =
      try Some(ordinalOf(spec, v, dt)) catch { case _: IllegalArgumentException => None }
    f match {
      case And(l, r) => admits(spec, dt, fileOrd, l) && admits(spec, dt, fileOrd, r)
      case Or(l, r) => admits(spec, dt, fileOrd, l) || admits(spec, dt, fileOrd, r)
      case EqualTo(c, v) if c == spec.col && v != null =>
        if (fileOrd == null) false else ord(v).forall(o => cmp(fileOrd, o) == 0)
      case EqualNullSafe(c, v) if c == spec.col =>
        if (v == null) fileOrd == null
        else if (fileOrd == null) false
        else ord(v).forall(o => cmp(fileOrd, o) == 0)
      case In(c, vs) if c == spec.col =>
        if (fileOrd == null) vs.contains(null)
        else vs.exists(v => v != null && ord(v).forall(o => cmp(fileOrd, o) == 0))
      case GreaterThan(c, v) if c == spec.col && v != null =>
        if (fileOrd == null) false else ord(v).forall(o => cmp(fileOrd, o) >= 0)
      case GreaterThanOrEqual(c, v) if c == spec.col && v != null =>
        if (fileOrd == null) false else ord(v).forall(o => cmp(fileOrd, o) >= 0)
      case LessThan(c, v) if c == spec.col && v != null =>
        if (fileOrd == null) false
        else ord(v).forall { o =>
          val strict =
            try atOrdinalStart(spec, v, dt)
            catch { case _: IllegalArgumentException => false }
          if (strict) cmp(fileOrd, o) < 0 else cmp(fileOrd, o) <= 0
        }
      case LessThanOrEqual(c, v) if c == spec.col && v != null =>
        if (fileOrd == null) false else ord(v).forall(o => cmp(fileOrd, o) <= 0)
      case IsNull(c) if c == spec.col => fileOrd == null
      case IsNotNull(c) if c == spec.col => fileOrd != null
      case _ => true
    }
  }
}

/** The catalog's V2 transform functions (`FunctionCatalog`, empty
  * namespace): `years`/`months`/`days`/`hours` over timestamp/date and
  * `truncate(width, col)` — the SAME ordinals the writer renders into
  * directory names, so Spark's required write distribution (clustering
  * rows by transform before the tasks) routes rows exactly where the
  * layout says they belong. */
private[sources] final case class GraftTimeTransformFunction(kind: String)
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = kind
  override def description(): String = s"$kind(col): graft-ocf partition transform"

  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 1,
      s"$kind expects one column, got ${inputType.simpleString}")
    val dt = inputType.fields(0).dataType
    require(OcfTransforms.supportedType(kind, dt),
      s"$kind: unsupported type ${dt.simpleString}")
    Bound(dt)
  }

  private final case class Bound(dt: DataType)
      extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType = LongType
    override def name(): String = kind
    override def canonicalName(): String = s"graft.$kind"
    override def isResultNullable: Boolean = true
    override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Long = {
      if (input.isNullAt(0)) return null
      val v: Any = dt match {
        case TimestampType => java.lang.Long.valueOf(input.getLong(0))
        case DateType => java.lang.Integer.valueOf(input.getInt(0))
        case _ => throw new IllegalStateException(s"unbindable $dt")
      }
      java.lang.Long.valueOf(
        OcfTransforms.ordinalOf(OcfTransforms.Spec(kind, "c"), v, dt)
          .asInstanceOf[Long])
    }
  }
}

private[sources] object GraftTruncateFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(width, col): graft-ocf partition transform"

  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"truncate expects (width INT, col), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"truncate: width must be INT, got ${inputType.fields(0).dataType.simpleString}")
    val dt = inputType.fields(1).dataType
    require(OcfTransforms.supportedType("truncate", dt),
      s"truncate: unsupported type ${dt.simpleString}")
    Bound(dt)
  }

  private final case class Bound(dt: DataType)
      extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = dt match {
      case StringType => StringType
      case _ => LongType
    }
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate"
    override def isResultNullable: Boolean = true
    override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      if (input.isNullAt(1)) return null
      val w = input.getInt(0)
      val spec = OcfTransforms.Spec("truncate", "c", w)
      dt match {
        case StringType =>
          UTF8String.fromString(OcfTransforms
            .ordinalOf(spec, input.getUTF8String(1), dt).asInstanceOf[String])
        case _ =>
          val v: Any = dt match {
            case ByteType => java.lang.Long.valueOf(input.getByte(1).toLong)
            case ShortType => java.lang.Long.valueOf(input.getShort(1).toLong)
            case IntegerType => java.lang.Long.valueOf(input.getInt(1).toLong)
            case LongType => java.lang.Long.valueOf(input.getLong(1))
            case _ => throw new IllegalStateException(s"unbindable $dt")
          }
          java.lang.Long.valueOf(
            OcfTransforms.ordinalOf(spec, v, dt).asInstanceOf[Long])
      }
    }
  }
}
