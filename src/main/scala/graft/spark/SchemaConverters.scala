package graft.spark

import graft.avro._
import org.apache.spark.sql.types._

/** Avro schema AST ⇄ Spark SQL [[DataType]].
  *
  * Union policy (SURVEY §7.4): `["null", T]` → nullable `T`; general unions →
  * `struct<member0…memberN>` with exactly one non-null member (the spark-avro
  * convention). `enum` → string, `fixed` → binary, `time-millis` → int,
  * `time-micros` → long (Spark has no TIME type).
  * (reference type table: python-udf/avro/io.py:235-392, schema.py:172-1191.)
  */
object SchemaConverters {

  final case class SqlType(dataType: DataType, nullable: Boolean)

  def toSqlType(avro: AvroSchema): SqlType = avro match {
    case ANull    => SqlType(NullType, nullable = true)
    case ABoolean => SqlType(BooleanType, nullable = false)
    case AInt     => SqlType(IntegerType, nullable = false)
    case ALong    => SqlType(LongType, nullable = false)
    case AFloat   => SqlType(FloatType, nullable = false)
    case ADouble  => SqlType(DoubleType, nullable = false)
    case ABytes   => SqlType(BinaryType, nullable = false)
    case AString  => SqlType(StringType, nullable = false)
    case _: AEnum => SqlType(StringType, nullable = false)
    case f: AFixed => SqlType(BinaryType, nullable = false)
    case ADecimal(p, s, _) => SqlType(DecimalType(p, s), nullable = false)
    case ADate(_) => SqlType(DateType, nullable = false)
    case ATimeMillis(_) => SqlType(IntegerType, nullable = false)
    case ATimeMicros(_) => SqlType(LongType, nullable = false)
    case ATimestampMillis(_) | ATimestampMicros(_) => SqlType(TimestampType, nullable = false)
    case AUuid(_) => SqlType(StringType, nullable = false)
    case r: ARef  => toSqlType(r.target)
    case AArray(items) =>
      val el = toSqlType(items)
      SqlType(ArrayType(el.dataType, el.nullable), nullable = false)
    case AMap(values) =>
      val v = toSqlType(values)
      SqlType(MapType(StringType, v.dataType, v.nullable), nullable = false)
    case r: ARecord =>
      val fields = r.fields.map { f =>
        val t = toSqlType(f.schema)
        StructField(f.name, t.dataType, t.nullable)
      }
      SqlType(StructType(fields), nullable = false)
    case u: AUnion =>
      u.nonNullBranches match {
        case Seq() => SqlType(NullType, nullable = true)
        case Seq(single) =>
          val t = toSqlType(single)
          SqlType(t.dataType, nullable = t.nullable || u.isNullable)
        case many =>
          val fields = many.zipWithIndex.map { case (b, i) =>
            val t = toSqlType(b)
            StructField(s"member$i", t.dataType, nullable = true)
          }
          SqlType(StructType(fields), nullable = u.isNullable)
      }
  }

  def toStructType(avro: AvroSchema): StructType = toSqlType(avro).dataType match {
    case s: StructType => s
    case other => StructType(Seq(StructField("value", other)))
  }

  /** Spark SQL type → Avro schema (encode side, `to_avro`). Nullable fields
    * become `["null", T]` unions; records are named `recordN.graft` by nesting. */
  def toAvroType(dt: DataType, nullable: Boolean = false, recordName: String = "topLevelRecord",
                 namespace: String = "graft"): AvroSchema = {
    val base: AvroSchema = dt match {
      case BooleanType => ABoolean
      case ByteType | ShortType | IntegerType => AInt
      case LongType => ALong
      case FloatType => AFloat
      case DoubleType => ADouble
      case StringType => AString
      case BinaryType => ABytes
      case d: DecimalType => ADecimal(d.precision, d.scale, ABytes)
      case DateType => ADate()
      case TimestampType => ATimestampMicros()
      case TimestampNTZType => ATimestampMicros()
      case ArrayType(el, containsNull) =>
        AArray(toAvroType(el, containsNull, recordName + "_item", namespace))
      case MapType(StringType, v, valueContainsNull) =>
        AMap(toAvroType(v, valueContainsNull, recordName + "_value", namespace))
      case s: StructType =>
        ARecord(recordName, Some(namespace), s.fields.toSeq.map { f =>
          AField(f.name, toAvroType(f.dataType, f.nullable, f.name, namespace + "." + recordName))
        })
      case NullType => ANull
      case other => throw new IllegalArgumentException(
        s"cannot derive an Avro schema for Spark type ${other.sql}")
    }
    if (nullable && base != ANull) AUnion(Seq(ANull, base)) else base
  }
}
