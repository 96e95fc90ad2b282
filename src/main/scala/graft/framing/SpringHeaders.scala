package graft.framing

import java.nio.charset.StandardCharsets

/** spring-cloud-stream embedded-header framing.
  *
  * Layout: magic `0xFF`, header count (1 byte), then per header:
  * key length (1 byte), key, value length (4 bytes big-endian), JSON-encoded
  * value; the remainder is the message body.
  * (reference: springcloud-lambda-udf/lambda_function.py:72-139
  * `SpringEmbeddedMessageUtils.get_message_headers`.)
  */
object SpringHeaders {
  final case class Extracted(headers: Map[String, String], body: Array[Byte])

  val Magic: Int = 0xff

  def extract(payload: Array[Byte]): Extracted = {
    if (payload.isEmpty || (payload(0) & 0xff) != Magic)
      return Extracted(Map.empty, payload) // no embedded headers → whole payload is body
    var pos = 1
    val count = payload(pos) & 0xff
    pos += 1
    val headers = Map.newBuilder[String, String]
    var i = 0
    while (i < count) {
      val keyLen = payload(pos) & 0xff; pos += 1
      val key = new String(payload, pos, keyLen, StandardCharsets.UTF_8); pos += keyLen
      val valLen = ((payload(pos) & 0xff) << 24) | ((payload(pos + 1) & 0xff) << 16) |
        ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      pos += 4
      val rawVal = new String(payload, pos, valLen, StandardCharsets.UTF_8); pos += valLen
      // values are JSON-encoded strings, e.g. "bar" (reference: lambda_function.py:131-133)
      val v = if (rawVal.length >= 2 && rawVal.head == '"' && rawVal.last == '"')
        rawVal.substring(1, rawVal.length - 1) else rawVal
      headers += key -> v
      i += 1
    }
    Extracted(headers.result(), java.util.Arrays.copyOfRange(payload, pos, payload.length))
  }

  /** Build a framed payload (test fixtures; inverse of [[extract]]). */
  def frame(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    out.write(headers.size)
    headers.foreach { case (k, v) =>
      val kb = k.getBytes(StandardCharsets.UTF_8)
      val vb = ("\"" + v + "\"").getBytes(StandardCharsets.UTF_8)
      out.write(kb.length)
      out.write(kb, 0, kb.length)
      out.write((vb.length >> 24) & 0xff); out.write((vb.length >> 16) & 0xff)
      out.write((vb.length >> 8) & 0xff); out.write(vb.length & 0xff)
      out.write(vb, 0, vb.length)
    }
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Content-type `application/vnd.{name}.{version}+{format}` → (name, format, version).
    * (reference: springcloud-lambda-udf/lambda_function.py:28-59 — registry URL
    * `…/services/avro-schema-registry/{schema}/{format}/{version}`.) */
  def parseContentType(contentType: String): Option[(String, String, String)] = {
    val Re = """application/vnd\.([^.]+)\.([^+]+)\+(.+)""".r
    contentType match {
      case Re(name, version, format) => Some((name, format, version))
      case _ => None
    }
  }

  def registryUrl(host: String, contentType: String): Option[String] =
    parseContentType(contentType).map { case (name, format, version) =>
      s"https://$host/services/avro-schema-registry/$name/$format/$version"
    }
}
