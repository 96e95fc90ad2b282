package graft.spark

import graft.avro._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import scala.collection.mutable.ArrayBuffer

/** Avro wire bytes → Catalyst values, as a closure tree compiled once per
  * (writer, reader) schema pair on the driver and shipped to executors inside
  * the decode expression — the Spark-native analog of the reference's
  * recursive-descent `DatumReader` (python-udf/avro/io.py:637-1100) with
  * schema resolution (promotions, field matching, skip, defaults) folded into
  * closure construction instead of per-row dispatch.
  *
  * Output representation matches [[SchemaConverters.toSqlType]]: records →
  * [[GenericInternalRow]], strings/enums → [[UTF8String]], arrays →
  * [[GenericArrayData]], maps → [[ArrayBasedMapData]], decimals →
  * [[Decimal]], date → int days, timestamps → long micros.
  */
object CatalystAvroReader {
  type Reader = AvroBinaryReader => Any

  def compile(writer: AvroSchema, reader: AvroSchema): Reader = new Compiler().make(writer, reader)

  def forSchema(schema: AvroSchema): Reader = compile(schema, schema)

  private def deref(s: AvroSchema): AvroSchema = s match {
    case r: ARef => deref(r.target); case o => o
  }

  private def matches(w: AvroSchema, r: AvroSchema): Boolean = (deref(w), deref(r)) match {
    case (a, b) if a.typeName == b.typeName => (a, b) match {
      case (x: NamedSchema, y: NamedSchema) => AvroNames.nameMatches(x, y)
      case _ => true
    }
    case (AInt, ALong | AFloat | ADouble) => true
    case (ALong, AFloat | ADouble) => true
    case (AFloat, ADouble) => true
    case (AString, ABytes) | (ABytes, AString) => true
    case (_, u: AUnion) => u.branches.exists(matches(w, _))
    case (_: AUnion, _) => true
    case (lw: LogicalSchema, rr) => matches(lw.physical, rr)
    case (ww, lr: LogicalSchema) => matches(ww, lr.physical)
    case _ => false
  }

  /** Stateful compiler: the record memo breaks cycles in recursive schemas. */
  private final class Compiler {
    private val recordCache = scala.collection.mutable.HashMap.empty[(String, String), Reader]

  def make(w0: AvroSchema, r0: AvroSchema): Reader = {
    val w = deref(w0)
    val r = deref(r0)
    (w, r) match {
      case (ww, ru: AUnion) if !ww.isInstanceOf[AUnion] =>
        // resolve the writer against the matching reader branch, then inject
        // into the reader union's Catalyst representation
        ru.nonNullBranches match {
          case Seq(single) => // nullable-T union: value decodes as plain T
            make(ww, single)
          case many =>
            val idx = many.indexWhere(matches(ww, _))
            if (idx < 0) throw new AvroResolutionException(
              s"writer ${ww.typeName} matches no reader union branch")
            val inner = make(ww, many(idx))
            val width = many.length
            in => {
              val row = new GenericInternalRow(width)
              row.update(idx, inner(in))
              row
            }
        }
      case (wu: AUnion, rr) =>
        val ruNonNull = rr match {
          case u: AUnion => u.nonNullBranches
          case other     => Seq(other)
        }
        val general = ruNonNull.length > 1
        val branchReaders: Array[Reader] = wu.branches.map { wb =>
          val wbd = deref(wb)
          if (wbd == ANull) { (_: AvroBinaryReader) => null }
          else {
            val ri = ruNonNull.indexWhere(matches(wbd, _))
            if (ri < 0) { (_: AvroBinaryReader) =>
              throw new AvroResolutionException(
                s"writer union branch ${wbd.typeName} not readable by reader")
            } else {
              val inner = make(wbd, ruNonNull(ri))
              if (!general) inner
              else {
                val width = ruNonNull.length
                (in: AvroBinaryReader) => {
                  val row = new GenericInternalRow(width)
                  row.update(ri, inner(in))
                  row
                }
              }
            }
          }
        }.toArray
        in => {
          val idx = in.readLong().toInt
          if (idx < 0 || idx >= branchReaders.length)
            throw new AvroResolutionException(s"union branch index $idx out of range")
          branchReaders(idx)(in)
        }
      case _ => makeNonUnion(w, r)
    }
  }

  private def makeNonUnion(w: AvroSchema, r: AvroSchema): Reader = (w, r) match {
    case (ANull, _)    => _ => null
    case (ABoolean, _) => in => in.readBoolean()
    case (AInt, rr) => rr match {
      case AInt    => in => in.readInt()
      case ALong   => in => in.readLong()
      case AFloat  => in => in.readInt().toFloat
      case ADouble => in => in.readInt().toDouble
      case ADate(_) => in => in.readInt()
      case ATimeMillis(_) => in => in.readInt()
      case _ => in => in.readInt()
    }
    case (ALong, rr) => rr match {
      case AFloat  => in => in.readLong().toFloat
      case ADouble => in => in.readLong().toDouble
      case ATimestampMillis(_) => in => in.readLong() * 1000L // ms → µs (TimestampType)
      case _ => in => in.readLong()
    }
    case (AFloat, ADouble) => in => in.readFloat().toDouble
    case (AFloat, _)   => in => in.readFloat()
    case (ADouble, _)  => in => in.readDouble()
    case (AString, ABytes) => in => in.readBytes()
    case (AString, _)  => in => UTF8String.fromBytes(in.readBytes())
    case (ABytes, AString | AUuid(_)) => in => UTF8String.fromBytes(in.readBytes())
    case (ABytes, ADecimal(p, s, _)) =>
      in => Decimal(new JBigDecimal(new BigInteger(in.readBytes()), s), p, s)
    case (ABytes, _)   => in => in.readBytes()
    case (lw: LogicalSchema, rr) => (lw, rr) match {
      case (ADecimal(_, s0, u), _) =>
        val (p, s) = rr match {
          case ADecimal(rp, rs, _) => (rp, rs)
          case _ => (DecimalType.MAX_PRECISION, s0)
        }
        deref(u) match {
          case AFixed(_, _, size, _) =>
            in => Decimal(new JBigDecimal(new BigInteger(in.readFixed(size)), s0), p, s)
          case _ =>
            in => Decimal(new JBigDecimal(new BigInteger(in.readBytes()), s0), p, s)
        }
      case (ADate(_), _) => in => in.readInt()
      case (ATimeMillis(_), _) => in => in.readInt()
      case (ATimeMicros(_), _) => in => in.readLong()
      case (ATimestampMillis(_), _) => in => in.readLong() * 1000L
      case (ATimestampMicros(_), _) => in => in.readLong()
      case (AUuid(_), _) => in => UTF8String.fromBytes(in.readBytes())
      case _ => make(lw.physical, rr)
    }
    case (f: AFixed, ADecimal(p, s, _)) =>
      in => Decimal(new JBigDecimal(new BigInteger(in.readFixed(f.size)), s), p, s)
    case (f: AFixed, _) => in => in.readFixed(f.size)
    case (we: AEnum, re: AEnum) =>
      val mapped: Array[UTF8String] = we.symbols.map { sym =>
        if (re.symbols.contains(sym)) UTF8String.fromString(sym)
        else re.enumDefault.map(UTF8String.fromString).orNull
      }.toArray
      in => {
        val i = in.readInt()
        val s = mapped(i)
        if (s == null) throw new AvroResolutionException(
          s"enum symbol ${we.symbols(i)} not in reader enum ${re.fullName}")
        s
      }
    case (we: AEnum, _) =>
      val syms = we.symbols.map(UTF8String.fromString).toArray
      in => syms(in.readInt())
    case (AArray(wi), rr) =>
      val ri = rr match { case AArray(x) => x; case other => other }
      val item = make(wi, ri)
      in => {
        val out = new ArrayBuffer[Any](16)
        var count = in.readLong()
        while (count != 0) {
          if (count < 0) { count = -count; in.skipLong() }
          var i = 0L
          while (i < count) { out += item(in); i += 1 }
          count = in.readLong()
        }
        new GenericArrayData(out.toArray)
      }
    case (AMap(wv), rr) =>
      val rv = rr match { case AMap(x) => x; case other => other }
      val value = make(wv, rv)
      in => {
        val keys = new ArrayBuffer[Any](16)
        val values = new ArrayBuffer[Any](16)
        var count = in.readLong()
        while (count != 0) {
          if (count < 0) { count = -count; in.skipLong() }
          var i = 0L
          while (i < count) {
            keys += UTF8String.fromBytes(in.readBytes())
            values += value(in)
            i += 1
          }
          count = in.readLong()
        }
        new ArrayBasedMapData(new GenericArrayData(keys.toArray), new GenericArrayData(values.toArray))
      }
    case (wr: ARecord, rr: ARecord) =>
      recordCache.get((wr.fullName, rr.fullName)) match {
        case Some(fn) => fn
        case None =>
          var real: Reader = null
          val forwarder: Reader = in => real(in)
          recordCache((wr.fullName, rr.fullName)) = forwarder
          real = makeRecord(wr, rr)
          forwarder
      }
    case (wr: ARecord, _) => make(wr, wr) // reader is not a record: ignore reader
    case _ => throw new AvroResolutionException(
      s"cannot resolve writer ${w.typeName} against reader ${r.typeName}")
  }

  private def makeRecord(wr: ARecord, rr: ARecord): Reader = {
      val slots = AvroNames.assignReaderSlots(wr, rr)
      val steps: Array[(Int, Reader)] = wr.fields.zipWithIndex.map { case (wf, wi) =>
        slots(wi) match {
          case -1 =>
            val sk = AvroSkipper.compile(wf.schema)
            (-1, (in: AvroBinaryReader) => { sk(in); null })
          case ri => (ri, make(wf.schema, rr.fields(ri).schema))
        }
      }.toArray
      val written = steps.map(_._1).filter(_ >= 0).toSet
      val defaults: Array[(Int, Any)] = rr.fields.zipWithIndex.collect {
        case (rf, i) if !written.contains(i) =>
          rf.default match {
            case Some(d) =>
              (i, toCatalyst(AvroDefaults.materialize(d, rf.schema), rf.schema))
            case None => throw new AvroResolutionException(
              s"reader field ${rf.name} of ${rr.fullName} absent from writer and has no default")
          }
      }.toArray
      val width = rr.fields.length
      in => {
        val row = new GenericInternalRow(width)
        var i = 0
        while (i < steps.length) {
          val (slot, fn) = steps(i)
          val v = fn(in)
          if (slot >= 0) row.update(slot, v)
          i += 1
        }
        i = 0
        while (i < defaults.length) {
          row.update(defaults(i)._1, defaults(i)._2)
          i += 1
        }
        row
      }
  }
  } // end Compiler

  /** Generic datum (from [[AvroDefaults]]/[[AvroDatumReader]]) → Catalyst value. */
  def toCatalyst(v: Any, s0: AvroSchema): Any = {
    val s = deref(s0)
    (v, s) match {
      case (null, _) => null
      case (x, u: AUnion) => u.nonNullBranches match {
        case Seq(single) => toCatalyst(x, single)
        case many =>
          val idx = many.indexWhere(b => new AvroDatumWriter(b).validates(b, x))
          val row = new GenericInternalRow(many.length)
          if (idx >= 0) row.update(idx, toCatalyst(x, many(idx)))
          row
      }
      case (x: String, _) => UTF8String.fromString(x)
      case (x: JBigDecimal, ADecimal(p, sc, _)) => Decimal(x, p, sc)
      case (x: java.time.LocalDate, _) => x.toEpochDay.toInt
      case (x: java.time.LocalTime, ATimeMillis(_)) => (x.toNanoOfDay / 1000000L).toInt
      case (x: java.time.LocalTime, _) => x.toNanoOfDay / 1000L
      case (x: java.time.Instant, _) => x.getEpochSecond * 1000000L + x.getNano / 1000L
      case (x: Seq[_], AArray(items)) => new GenericArrayData(x.map(toCatalyst(_, items)).toArray)
      case (x: scala.collection.Map[_, _], AMap(values)) =>
        val keys = x.keys.map(k => UTF8String.fromString(k.toString)).toArray[Any]
        val vals = x.values.map(toCatalyst(_, values)).toArray
        new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
      case (x: AvroRecord, r: ARecord) =>
        val row = new GenericInternalRow(r.fields.length)
        r.fields.zipWithIndex.foreach { case (f, i) => row.update(i, toCatalyst(x.values(i), f.schema)) }
        row
      case (x, _) => x
    }
  }
}

/** Catalyst values → Avro wire bytes (`to_avro`), compiled once per
  * (DataType, AvroSchema) pair — the encode mirror of [[CatalystAvroReader]].
  * (reference: python-udf/avro/io.py:1125-1337 DatumWriter.)
  */
object CatalystAvroWriter {
  type Writer = (Any, AvroBinaryWriter) => Unit

  def compile(dt: DataType, avro: AvroSchema): Writer =
    nullGuarded("<value>", avro, make(dt, avro))

  /** Fused per-ordinal field encoder for the OCF sink: reads column `ord`
    * of an [[InternalRow]] and writes its Avro bytes in one step — flat
    * primitives never box through `Any`, strings copy straight from the
    * UTF8String's memory into the output buffer. Complex or resolution-
    * heavy leaves (records, arrays, maps, enums, decimals, fixed, general
    * unions) fall back to the boxed [[Writer]] + getter pair, so the bytes
    * and every error message are identical to the boxed path by
    * construction (pinned by OcfV2WriteSpec's byte-identity test). */
  type FieldEncoder = (InternalRow, AvroBinaryWriter) => Unit

  def compileField(dt: DataType, avro: AvroSchema, ord: Int): FieldEncoder = {
    // boxed fallback: exactly the pair the previous sink hot loop used
    def boxed: FieldEncoder = {
      val w = compile(dt, avro)
      val g = InternalRowGetters.forType(dt)
      (row, out) => w(if (row.isNullAt(ord)) null else g(row, ord), out)
    }
    deref(avro) match {
      case AUnion(branches) =>
        val nullIdx = branches.indexOf(ANull)
        val valueBranches = branches.zipWithIndex.filter(_._1 != ANull)
        if (nullIdx >= 0 && valueBranches.length == 1) {
          primField(dt, valueBranches.head._1, ord) match {
            case Some(prim) =>
              val nIdx = nullIdx.toLong
              val vIdx = valueBranches.head._2.toLong
              (row, out) =>
                if (row.isNullAt(ord)) out.writeLong(nIdx)
                else { out.writeLong(vIdx); prim(row, out) }
            case None => boxed
          }
        } else boxed
      case nonUnion =>
        primField(dt, nonUnion, ord) match {
          case Some(prim) =>
            // a null into a non-nullable schema must fail with the same
            // typed error the boxed path raises — route it there
            val onNull = compile(dt, avro)
            (row, out) =>
              if (row.isNullAt(ord)) onNull(null, out) else prim(row, out)
          case None => boxed
        }
    }
  }

  /** Non-null flat-primitive encoders (the write mirror of the X91 read
    * lanes); None = not a flat primitive, caller falls back to boxed. */
  private def primField(dt: DataType, s0: AvroSchema, ord: Int): Option[FieldEncoder] =
    (deref(s0), dt) match {
      case (ABoolean, BooleanType) =>
        Some((r, o) => o.writeBoolean(r.getBoolean(ord)))
      case (AInt, ByteType) => Some((r, o) => o.writeInt(r.getByte(ord).toInt))
      case (AInt, ShortType) => Some((r, o) => o.writeInt(r.getShort(ord).toInt))
      case (AInt, IntegerType | DateType) => Some((r, o) => o.writeInt(r.getInt(ord)))
      case (ALong, IntegerType) => Some((r, o) => o.writeLong(r.getInt(ord).toLong))
      case (ALong, LongType | TimestampType | TimestampNTZType) =>
        Some((r, o) => o.writeLong(r.getLong(ord)))
      case (AFloat, FloatType) => Some((r, o) => o.writeFloat(r.getFloat(ord)))
      case (ADouble, DoubleType) => Some((r, o) => o.writeDouble(r.getDouble(ord)))
      case (AString, StringType) => Some((r, o) => writeUtf8(r.getUTF8String(ord), o))
      case (AUuid(_), StringType) => Some((r, o) => writeUtf8(r.getUTF8String(ord), o))
      case (ABytes, BinaryType) => Some((r, o) => o.writeBytes(r.getBinary(ord)))
      case (ADate(_), DateType) => Some((r, o) => o.writeInt(r.getInt(ord)))
      case (ATimeMillis(_), IntegerType) => Some((r, o) => o.writeInt(r.getInt(ord)))
      case (ATimeMicros(_), LongType) => Some((r, o) => o.writeLong(r.getLong(ord)))
      case (ATimestampMillis(_), TimestampType) =>
        Some((r, o) => o.writeLong(r.getLong(ord) / 1000L))
      case (ATimestampMicros(_), TimestampType) =>
        Some((r, o) => o.writeLong(r.getLong(ord)))
      case _ => None
    }

  /** Length-prefixed UTF-8 copy straight from the UTF8String's backing
    * memory — no intermediate `getBytes` array. */
  private def writeUtf8(u: UTF8String, out: AvroBinaryWriter): Unit = {
    val n = u.numBytes
    out.writeLong(n.toLong)
    val arr = out.reserve(n)
    u.writeToMemory(arr, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + out.position)
    out.advance(n)
  }

  private def deref(s: AvroSchema): AvroSchema = s match {
    case r: ARef => deref(r.target); case o => o
  }

  private def allowsNull(s: AvroSchema): Boolean = deref(s) match {
    case ANull => true
    case AUnion(branches) => branches.exists(b => deref(b) == ANull)
    case _ => false
  }

  /** A null routed into a schema with no null branch must fail as a TYPED
    * [[AvroResolutionException]] naming the location — the raw scalar
    * writers would otherwise throw a bare executor-side NPE (e.g.
    * `asInstanceOf[UTF8String].getBytes`), inconsistent with the union
    * path's error and nearly undiagnosable from a task failure. */
  private def nullGuarded(where: String, s: AvroSchema, w: Writer): Writer =
    if (allowsNull(s)) w
    else (v, out) =>
      if (v == null) throw new AvroResolutionException(
        s"null value for non-nullable Avro ${deref(s).typeName} at $where; " +
          "add a [\"null\", ...] union branch or filter nulls upstream")
      else w(v, out)

  private def make(dt: DataType, s0: AvroSchema): Writer = deref(s0) match {
    case AUnion(branches) =>
      val nullIdx = branches.indexOf(ANull)
      val valueBranches = branches.zipWithIndex.filter(_._1 != ANull)
      if (valueBranches.isEmpty) (_, out) => out.writeLong(nullIdx.toLong)
      else if (valueBranches.length == 1) {
        // nullable-style ["null", T] union: Catalyst nullability IS the tag
        val (branch, valueIdx) = valueBranches.head
        val inner = make(dt, branch)
        (v, out) =>
          if (v == null) {
            if (nullIdx < 0) throw new AvroResolutionException("null for non-nullable Avro union")
            out.writeLong(nullIdx.toLong)
          } else {
            out.writeLong(valueIdx.toLong)
            inner(v, out)
          }
      } else dt match {
        // general union: the struct-of-members Catalyst form (the decode
        // mirror of SchemaConverters — member_i ↔ i-th non-null branch).
        // The set member's POSITION selects the branch, which is the
        // deterministic Catalyst equivalent of the reference writer's
        // first-validating-branch rule (io.py:1306-1322): exactly one
        // member is expected non-null; with several set, the first wins.
        case st: StructType if st.length == valueBranches.length =>
          val members = valueBranches.zipWithIndex.map { case ((b, branchIdx), mi) =>
            (branchIdx, make(st.fields(mi).dataType, b),
              InternalRowGetters.forType(st.fields(mi).dataType))
          }.toArray
          (v, out) => {
            val row = if (v == null) null else v.asInstanceOf[InternalRow]
            var mi = 0
            var chosen = -1
            while (chosen < 0 && row != null && mi < members.length) {
              if (!row.isNullAt(mi)) chosen = mi else mi += 1
            }
            if (chosen < 0) {
              if (nullIdx < 0) throw new AvroResolutionException(
                "no non-null member for non-nullable Avro union")
              out.writeLong(nullIdx.toLong)
            } else {
              val (branchIdx, w, g) = members(chosen)
              out.writeLong(branchIdx.toLong)
              w(g(row, chosen), out)
            }
          }
        case other => throw new AvroResolutionException(
          s"general Avro union with ${valueBranches.length} branches expects a " +
          s"struct of as many members; got ${other.sql}")
      }
    case ANull    => (_, _) => ()
    case ABoolean => (v, out) => out.writeBoolean(v.asInstanceOf[Boolean])
    case AInt => dt match {
      case ByteType  => (v, out) => out.writeInt(v.asInstanceOf[Byte].toInt)
      case ShortType => (v, out) => out.writeInt(v.asInstanceOf[Short].toInt)
      case _         => (v, out) => out.writeInt(v.asInstanceOf[Int])
    }
    case ALong => dt match {
      case IntegerType => (v, out) => out.writeLong(v.asInstanceOf[Int].toLong)
      case _           => (v, out) => out.writeLong(v.asInstanceOf[Long])
    }
    case AFloat  => (v, out) => out.writeFloat(v.asInstanceOf[Float])
    case ADouble => (v, out) => out.writeDouble(v.asInstanceOf[Double])
    case AString => (v, out) => out.writeBytes(v.asInstanceOf[UTF8String].getBytes)
    case ABytes  => (v, out) => out.writeBytes(v.asInstanceOf[Array[Byte]])
    case f: AFixed => (v, out) => {
      val b = v.asInstanceOf[Array[Byte]]
      if (b.length != f.size) throw new AvroResolutionException(
        s"fixed ${f.fullName} expects ${f.size} bytes, got ${b.length}")
      out.writeFixed(b)
    }
    case e: AEnum => (v, out) => {
      val i = e.indexOf(v.asInstanceOf[UTF8String].toString)
      if (i < 0) throw new AvroResolutionException(s"symbol $v not in enum ${e.fullName}")
      out.writeInt(i)
    }
    case ADecimal(p, s, u) => (v, out) => {
      val bd = v.asInstanceOf[Decimal].toJavaBigDecimal.setScale(s)
      val unscaled = bd.unscaledValue().toByteArray
      deref(u) match {
        case AFixed(_, _, size, _) =>
          val padded = new Array[Byte](size)
          val sign: Byte = if (bd.signum() < 0) -1 else 0
          java.util.Arrays.fill(padded, 0, size - unscaled.length, sign)
          System.arraycopy(unscaled, 0, padded, size - unscaled.length, unscaled.length)
          out.writeFixed(padded)
        case _ => out.writeBytes(unscaled)
      }
    }
    case ADate(_) => (v, out) => out.writeInt(v.asInstanceOf[Int])
    case ATimeMillis(_) => (v, out) => out.writeInt(v.asInstanceOf[Int])
    case ATimeMicros(_) => (v, out) => out.writeLong(v.asInstanceOf[Long])
    case ATimestampMillis(_) => (v, out) => out.writeLong(v.asInstanceOf[Long] / 1000L)
    case ATimestampMicros(_) => (v, out) => out.writeLong(v.asInstanceOf[Long])
    case AUuid(_) => (v, out) => out.writeBytes(v.asInstanceOf[UTF8String].getBytes)
    case AArray(items) =>
      val elType = dt match {
        case ArrayType(e, _) => e
        case other => throw new AvroResolutionException(s"array schema for ${other.sql}")
      }
      val item = nullGuarded("array item", items, make(elType, items))
      (v, out) => {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val n = arr.numElements()
        if (n > 0) {
          out.writeLong(n.toLong)
          var i = 0
          val getter = InternalRowGetters.forType(elType)
          while (i < n) { item(getter(arr, i), out); i += 1 }
        }
        out.writeLong(0)
      }
    case AMap(values) =>
      val vType = dt match {
        case MapType(_, v, _) => v
        case other => throw new AvroResolutionException(s"map schema for ${other.sql}")
      }
      val value = nullGuarded("map value", values, make(vType, values))
      (v, out) => {
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val n = m.numElements()
        if (n > 0) {
          out.writeLong(n.toLong)
          val keys = m.keyArray()
          val vals = m.valueArray()
          val getter = InternalRowGetters.forType(vType)
          var i = 0
          while (i < n) {
            out.writeBytes(keys.getUTF8String(i).getBytes)
            value(getter(vals, i), out)
            i += 1
          }
        }
        out.writeLong(0)
      }
    case r: ARecord =>
      val st = dt match {
        case s: StructType => s
        case other => throw new AvroResolutionException(s"record schema for ${other.sql}")
      }
      val fieldWriters: Array[Writer] = r.fields.zipWithIndex.map { case (f, i) =>
        nullGuarded(s"field '${f.name}' of record ${r.fullName}", f.schema,
          make(st.fields(i).dataType, f.schema))
      }.toArray
      val getters = st.fields.map(f => InternalRowGetters.forType(f.dataType))
      (v, out) => {
        val row = v.asInstanceOf[InternalRow]
        var i = 0
        while (i < fieldWriters.length) {
          val fv = if (row.isNullAt(i)) null else getters(i)(row, i)
          fieldWriters(i)(fv, out)
          i += 1
        }
      }
    case other => throw new AvroResolutionException(s"cannot encode ${other.typeName}")
  }
}

/** Type-directed element access over Catalyst containers (rows/arrays share
  * the [[org.apache.spark.sql.catalyst.expressions.SpecializedGetters]] API). */
object InternalRowGetters {
  import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
  type Getter = (SpecializedGetters, Int) => Any

  def forType(dt: DataType): Getter = dt match {
    case BooleanType => (g, i) => if (g.isNullAt(i)) null else g.getBoolean(i)
    case ByteType    => (g, i) => if (g.isNullAt(i)) null else g.getByte(i)
    case ShortType   => (g, i) => if (g.isNullAt(i)) null else g.getShort(i)
    case IntegerType | DateType => (g, i) => if (g.isNullAt(i)) null else g.getInt(i)
    case LongType | TimestampType | TimestampNTZType => (g, i) => if (g.isNullAt(i)) null else g.getLong(i)
    case FloatType   => (g, i) => if (g.isNullAt(i)) null else g.getFloat(i)
    case DoubleType  => (g, i) => if (g.isNullAt(i)) null else g.getDouble(i)
    case StringType  => (g, i) => if (g.isNullAt(i)) null else g.getUTF8String(i)
    case BinaryType  => (g, i) => if (g.isNullAt(i)) null else g.getBinary(i)
    case d: DecimalType => (g, i) => if (g.isNullAt(i)) null else g.getDecimal(i, d.precision, d.scale)
    case s: StructType => (g, i) => if (g.isNullAt(i)) null else g.getStruct(i, s.length)
    case _: ArrayType => (g, i) => if (g.isNullAt(i)) null else g.getArray(i)
    case _: MapType   => (g, i) => if (g.isNullAt(i)) null else g.getMap(i)
    case _ => (g, i) => if (g.isNullAt(i)) null else g.get(i, dt)
  }
}
