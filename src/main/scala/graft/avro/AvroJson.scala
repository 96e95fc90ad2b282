package graft.avro

import scala.collection.mutable

/** Render generic datums as JSON text matching Python `json.dumps` defaults:
  * `", "` and `": "` separators, insertion (writer-field) key order, unions
  * unwrapped to their value.
  * (reference: avro-file-udf/lambda_function.py:14-22, python-udf/udf.py:9,
  * glue-schema-per-stream-udf/lambda_function.py:42 — all `json.dumps` sites.)
  */
object AvroJson {
  def render(datum: Any): String = {
    val sb = new StringBuilder
    write(datum, sb)
    sb.toString
  }

  def renderAll(datums: Seq[Any]): String =
    datums.map(render).mkString("[", ", ", "]")

  private def write(v: Any, sb: StringBuilder): Unit = v match {
    case null            => sb.append("null")
    case b: Boolean      => sb.append(if (b) "true" else "false")
    case i: Int          => sb.append(i)
    case l: Long         => sb.append(l)
    case f: Float        => writeDouble(f.toDouble, sb)
    case d: Double       => writeDouble(d, sb)
    case s: String       => writeString(s, sb)
    case bd: java.math.BigDecimal => sb.append(bd.toPlainString)
    case d: java.time.LocalDate   => writeString(d.toString, sb)
    case t: java.time.LocalTime   => writeString(t.toString, sb)
    case t: java.time.Instant     => writeString(t.toString, sb)
    case b: Array[Byte]  =>
      // Python json.dumps would raise on bytes; reference fixtures avoid it
      // (SURVEY §7.4 n.5). We render ISO-8859-1-escaped for debuggability.
      writeString(new String(b, java.nio.charset.StandardCharsets.ISO_8859_1), sb)
    case r: AvroRecord =>
      sb.append('{')
      var first = true
      r.schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!first) sb.append(", ")
        first = false
        writeString(f.name, sb)
        sb.append(": ")
        write(r.values(i), sb)
      }
      sb.append('}')
    case m: mutable.LinkedHashMap[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, mv) =>
        if (!first) sb.append(", ")
        first = false
        writeString(k.toString, sb)
        sb.append(": ")
        write(mv, sb)
      }
      sb.append('}')
    case m: scala.collection.Map[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, mv) =>
        if (!first) sb.append(", ")
        first = false
        writeString(k.toString, sb)
        sb.append(": ")
        write(mv, sb)
      }
      sb.append('}')
    case seq: Seq[_] =>
      sb.append('[')
      var first = true
      seq.foreach { e =>
        if (!first) sb.append(", ")
        first = false
        write(e, sb)
      }
      sb.append(']')
    case other => writeString(other.toString, sb)
  }

  private def writeDouble(d: Double, sb: StringBuilder): Unit = {
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) { sb.append(d.toLong); sb.append(".0") }
    else sb.append(d)
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
