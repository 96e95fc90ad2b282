package graft.framing

import graft.avro.{AvroSchema, AvroSchemaParser}
import scala.collection.concurrent.TrieMap

/** Schema registry abstraction: schema-id → writer schema.
  *
  * The reference has two live registries — AWS Glue keyed by stream name with
  * an LRU(32) cache (glue-schema-per-stream-udf/lambda_function.py:14-27) and a
  * Spring Cloud REST registry keyed by content type with a dict cache
  * (springcloud-lambda-udf/lambda_function.py:18-69). This environment is
  * zero-egress, so the trait ships with in-memory and directory-backed
  * implementations; the content-type → registry-key parsing is ported verbatim
  * in [[SpringHeaders.parseContentType]].
  */
trait SchemaRegistry extends Serializable {
  /** Fetch the (latest) writer schema for a stream / content-type key. */
  def get(key: String): AvroSchema
}

/** Broadcast-friendly in-memory registry: resolve once on the driver, ship the
  * map with the closure — the Spark analog of the reference's per-container
  * LRU cache. */
final class InMemorySchemaRegistry(schemas: Map[String, String]) extends SchemaRegistry {
  @transient private lazy val cache = TrieMap.empty[String, AvroSchema] // per-executor cache
  def get(key: String): AvroSchema = cache.getOrElseUpdate(key,
    AvroSchemaParser.parse(schemas.getOrElse(key,
      throw new NoSuchElementException(s"no schema registered for '$key'"))))
  def keys: Iterable[String] = schemas.keys
}

/** Directory-backed registry: `<dir>/<key>.avsc` files (offline stand-in for
  * the Glue/Spring HTTP fetch). */
final class DirectorySchemaRegistry(dir: String) extends SchemaRegistry {
  @transient private lazy val cache = TrieMap.empty[String, AvroSchema]
  def get(key: String): AvroSchema = cache.getOrElseUpdate(key, {
    val p = java.nio.file.Paths.get(dir, s"$key.avsc")
    AvroSchemaParser.parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
  })
}

object SchemaRegistry {
  def inMemory(schemas: (String, String)*): InMemorySchemaRegistry =
    new InMemorySchemaRegistry(schemas.toMap)
}
