package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.avro.Ocf
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem whose `open` dwells long enough for overlapping calls
  * to be observable — registered under the `slowfs:` scheme so the driver's
  * header-resolution pool can be proven CONCURRENT, not just present.
  * Hadoop instantiates it reflectively (public no-arg constructor). */
class SlowLocalFileSystem extends RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("slowfs:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val now = SlowLocalFileSystem.inFlight.incrementAndGet()
    SlowLocalFileSystem.maxInFlight.updateAndGet(m => math.max(m, now))
    try {
      Thread.sleep(30)
      super.open(f, bufferSize)
    } finally { SlowLocalFileSystem.inFlight.decrementAndGet(); () }
  }
}
object SlowLocalFileSystem {
  val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)
}

/** Plan-time header resolution is the first real-cluster bottleneck at
  * 10⁵-file listings: one positioned pread per file against a remote store
  * is pure round-trip latency. [[OcfDataSource.fetchMetas]] hides it behind
  * a bounded pool; this spec proves the preads actually OVERLAP (≥4 in
  * flight over a 16-file listing) and that every header still resolves. */
class HeaderFetchConcurrencySpec extends AnyFunSuite {

  private val schemaJson =
    """{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}"""

  test("fetchMetas overlaps header preads across files (bounded pool)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slowfs").toFile
    dir.deleteOnExit()
    // header-only OCF files (zero blocks): resolution needs nothing more
    val meta = scala.collection.mutable.LinkedHashMap(
      "avro.schema" -> schemaJson.getBytes("UTF-8"),
      "avro.codec" -> "null".getBytes("UTF-8"))
    val bytes = Ocf.headerBytes(meta, new Array[Byte](16))
    val files = (0 until 16).map { i =>
      val f = new java.io.File(dir, f"part-$i%02d.avro")
      java.nio.file.Files.write(f.toPath, bytes)
      OcfDataSource.FileSlice("slowfs://" + f.getAbsolutePath, bytes.length.toLong)
    }
    val conf = new Configuration(false)
    conf.set("fs.slowfs.impl", classOf[SlowLocalFileSystem].getName)
    conf.setBoolean("fs.slowfs.impl.disable.cache", true)

    SlowLocalFileSystem.maxInFlight.set(0)
    val metas = OcfDataSource.fetchMetas(conf, files)
    assert(metas.length == 16)
    assert(metas.forall(_.writerSchemaJson == schemaJson))
    assert(metas.forall(_.codecName == "null"))
    val peak = SlowLocalFileSystem.maxInFlight.get()
    assert(peak >= 4,
      s"header preads must overlap (driver-side pool); peak in-flight was $peak")
  }
}
