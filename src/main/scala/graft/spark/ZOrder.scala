package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `zorder_key(c1, c2, …)` → binary: the Morton (Z-order) interleave of the
  * columns' order-preserving 64-bit encodings. Sorting / range-partitioning
  * on this key clusters rows so that EVERY participating column's values are
  * locally compact — per-file and per-block min/max stamps stay tight on all
  * of them simultaneously, where a lexicographic `sortColumns` only tightens
  * the leading column. At 100 TB this is the difference between file-level
  * skipping working for one predicate column and working for all of them.
  *
  * Encodings (order-preserving into an unsigned 64-bit word, nulls → 0, the
  * smallest key — clustering choice only, never a correctness input: read-
  * side skipping consults the real min/max stamps, not this key):
  *  - integral / date / timestamp: value with the sign bit flipped
  *  - float / double: IEEE-754 bits with the standard total-order transform
  *    (negatives bit-complemented, positives sign-flipped)
  *  - string: the first 8 UTF-8 bytes, big-endian (unsigned lexicographic on
  *    the prefix; ties beyond 8 bytes cluster together, which is exactly
  *    what a space-filling curve wants)
  *
  * Output comparison relies on Spark's unsigned-lexicographic BinaryType
  * ordering. The interleave walks bit 63→0 round-robin across columns, so
  * the key's byte length is `8 × numColumns`.
  */
case class ZOrderKey(children: Seq[Expression]) extends Expression {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zorder_key"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty)
      return TypeCheckResult.TypeCheckFailure("zorder_key needs at least one column")
    children.map(_.dataType).find(dt => ZOrderKey.tagOf(dt) < 0) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key does not support ${bad.simpleString}: use integral, " +
          "float/double, string, date, or timestamp columns")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  @transient private lazy val tags: Array[Int] =
    children.map(c => ZOrderKey.tagOf(c.dataType)).toArray

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val words = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      words(i) =
        if (v == null) 0L
        else tags(i) match {
          case 0 => ZOrderKey.encodeLong(v.asInstanceOf[Number].longValue)
          case 1 => ZOrderKey.encodeDouble(v.asInstanceOf[Number].doubleValue)
          case _ => ZOrderKey.encodeUtf8(v.asInstanceOf[UTF8String])
        }
      i += 1
    }
    ZOrderKey.interleave(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val words = ctx.freshName("zWords")
    val evals = children.zip(tags).zipWithIndex.map { case ((child, tag), i) =>
      val c = child.genCode(ctx)
      val enc = tag match {
        case 0 => s"graft.spark.ZOrderKey.encodeLong((long) ${c.value})"
        case 1 => s"graft.spark.ZOrderKey.encodeDouble((double) ${c.value})"
        case _ => s"graft.spark.ZOrderKey.encodeUtf8(${c.value})"
      }
      code"""
            |${c.code}
            |$words[$i] = ${if (child.nullable) s"${c.isNull} ? 0L : $enc" else enc};
          """.stripMargin
    }
    val assembled =
      evals.foldLeft(code"long[] $words = new long[${children.length}];")(_ + _) +
        code"byte[] ${ev.value} = graft.spark.ZOrderKey.interleave($words);"
    ev.copy(code = assembled, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey = copy(children = newChildren)
}

object ZOrderKey {
  /** 0 = integral-backed (byte/short/int/long/date/timestamp), 1 = floating,
    * 2 = string, -1 = unsupported. */
  private[graft] def tagOf(dt: DataType): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => 0
    case FloatType | DoubleType => 1
    case StringType => 2
    case _ => -1
  }

  /** Signed long → order-preserving unsigned word. */
  def encodeLong(v: Long): Long = v ^ Long.MinValue

  /** IEEE-754 total-order transform: negatives complemented (more negative →
    * smaller), positives sign-flipped above them. -0.0 and +0.0 land
    * adjacent; NaN clusters at the top — ordering quirks only ever affect
    * clustering quality, never query results. */
  def encodeDouble(v: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(v)
    bits ^ ((bits >> 63) | Long.MinValue)
  }

  /** First 8 UTF-8 bytes, big-endian, zero-padded: the unsigned word whose
    * order is the unsigned-lexicographic order of the prefix. */
  def encodeUtf8(s: UTF8String): Long = {
    val b = s.getBytes
    var w = 0L
    var i = 0
    val m = math.min(8, b.length)
    while (i < m) { w |= (b(i) & 0xffL) << ((7 - i) << 3); i += 1 }
    w
  }

  /** Morton interleave: output bit `b*n + c` (MSB-first) is bit `63-b` of
    * word `c` — round-robin across columns from the most significant bit. */
  def interleave(words: Array[Long]): Array[Byte] = {
    val n = words.length
    if (n == 1) {
      val w = words(0)
      val out = new Array[Byte](8)
      var i = 0
      while (i < 8) { out(i) = (w >>> ((7 - i) << 3)).toByte; i += 1 }
      return out
    }
    val out = new Array[Byte](8 * n)
    var b = 0
    while (b < 64) {
      var c = 0
      while (c < n) {
        if (((words(c) >>> (63 - b)) & 1L) != 0L) {
          val pos = b * n + c
          out(pos >> 3) = (out(pos >> 3) | (1 << (7 - (pos & 7)))).toByte
        }
        c += 1
      }
      b += 1
    }
    out
  }
}
